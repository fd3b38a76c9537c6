package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Int8-quantization kernels (VERDICT r4/r5 item: `quantizeInt8`'s output
  * aggregates ran interpreted `aggregate()` HOF lambdas — the exact cost
  * class the repo bans from full-corpus paths; at 100 TB this is a
  * per-row pass over every embedding).
  *
  * Quantization semantics are pinned to the previous HOF formulation so
  * the DuckDB oracle hash is unchanged: q_i = cast(round(x_i*127.0/mx) AS
  * int), where round is Spark's Round on DoubleType — which routes every
  * value (eval AND codegen) through BigDecimal.valueOf(x).setScale(0,
  * HALF_UP). These kernels call the same API per element, so they are
  * bit-identical to the HOF path while the loop itself stays inside
  * whole-stage codegen (no interpreted lambda dispatch per element).
  */
private[functions] object VecQuant {
  /** Spark Round(DoubleType, scale 0) semantics, shared by eval+codegen. */
  def roundHalfUp(x: Double): Int =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).intValue()
}

/** max(abs(x_i)) over array<double> — the symmetric-quantization range. */
case class VecAbsMax(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_abs_max"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { val v = math.abs(x.getDouble(i)); if (v > mx) mx = v; i += 1 }
    mx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs($a.getDouble($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |${ev.value} = $mx;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecAbsMax =
    copy(child = newChild)
}

/** Σ |q_i| over the int8 codes of (v, mx) — quantize and reduce in one
  * codegen'd pass; the int[] codes are never materialized. */
case class VecQuantAbsSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_quant_abs_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mx = b.asInstanceOf[Double]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(VecQuant.roundHalfUp(x.getDouble(i) * 127.0 / mx)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.abs(
         |    graft.functions.VecQuant.roundHalfUp($a.getDouble($i) * 127.0 / $b));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecQuantAbsSum =
    copy(left = newLeft, right = newRight)
}

/** Σ q_i² over the int8 codes of (v, mx) — the quantized self dot. */
case class VecQuantSelfDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_quant_self_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mx = b.asInstanceOf[Double]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val q = VecQuant.roundHalfUp(x.getDouble(i) * 127.0 / mx).toLong
      acc += q * q
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) graft.functions.VecQuant.roundHalfUp(
         |    $a.getDouble($i) * 127.0 / $b);
         |  $acc += $q * $q;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecQuantSelfDot =
    copy(left = newLeft, right = newRight)
}
