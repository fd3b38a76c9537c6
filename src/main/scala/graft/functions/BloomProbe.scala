package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long key against a pre-built Bloom filter.
  *
  * The sketch-side of a 100 TB decontamination/anti-join: the bounded set
  * (benchmark shingle hashes) compresses into a few MB of bit array that
  * rides to every executor once (`ctx.addReferenceObj` — the filter is a
  * plan constant, broadcast with the task binary), and the unbounded
  * corpus side streams through this predicate INSIDE whole-stage codegen
  * — no shuffle, no deserialization wall, no per-row virtual dispatch
  * beyond the one `mightContainLong` call. Guarantee: no false negatives
  * (every true member passes), false positives at the filter's configured
  * fpp — so it is a PREFILTER; an exact confirm join downstream removes
  * the false positives and the composed result is exactly the
  * unfiltered join (D6c leans on this to stay hash-matched).
  */
case class BloomProbe(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
