package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-bit packing kernel for binary quantization (the 1-bit embedding
  * compression behind `v_bq_ann`): bit i of the result is set iff
  * vec[start+i] > 0, for i in [0, count). Packing 32 dims per word keeps
  * every value positive and well inside BIGINT, so the DuckDB oracle can
  * rebuild the identical word with a plain `list_sum` of `1 << i` terms
  * (a 64-bit word would overflow the oracle's sum at bit 63).
  *
  * One codegen'd pass per row — the whole signature build stays inside
  * whole-stage codegen, same discipline as the int8 kernels (VecQuant).
  */
case class VecSignPack(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sign_pack"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val start = b.asInstanceOf[Int]
    val count = c.asInstanceOf[Int]
    var acc = 0L
    var i = 0
    while (i < count) {
      if (x.getDouble(start + i) > 0.0) acc |= (1L << i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c; $i++) {
         |  if ($a.getDouble($b + $i) > 0.0) $acc |= (1L << $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VecSignPack =
    copy(first = newFirst, second = newSecond, third = newThird)
}
