package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline
import graft.operators.Dedup

class PipelineSpec extends SparkSpecBase {

  test("corpus pipeline: no near-dup pair survives, chunks reassemble") {
    val out = CorpusPipeline.corpusClean(spark, sfDir).cache()
    val survivors = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty)
    // of every Jaccard>=0.5 pair, at most one side survived
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(!(survivors(a) && survivors(b)), s"both of near-dup pair ($a,$b) survived")
    }
    // chunking preserved content for survivors
    val noChunk = out.groupBy("doc_id").count().filter(col("count") < 1).count()
    assert(noChunk == 0)
  }

  test("train mix: every stage's filter holds on the packed output") {
    import spark.implicits._
    val out = CorpusPipeline.trainMix(spark, sfDir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // packing invariant: bins respect the token budget (oversized docs
    // open their own bin, so a bin may exceed only when it has one doc)
    val byBin = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"), r.getAs[Long]("bin_id")))
    byBin.foreach { case (k, ds) =>
      val tot = ds.map(_.getAs[Long]("tokens")).sum
      assert(tot <= 200 || ds.length == 1, s"bin $k over budget with ${ds.length} docs")
    }
    val packed = rows.map(_.getAs[Long]("doc_id")).toSet
    // source-mix cap honored by the survivor set
    val docs = Tables.documents(spark, sfDir).cache()
    val n = docs.count(); val k = docs.select("source").distinct().count()
    val cap = math.ceil(0.6 * n / k).toLong
    val bySource = docs.filter($"doc_id".isInCollection(packed))
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(bySource.forall(_ <= cap))
    // exact-dedup keep-one: no two packed docs share a text
    val texts = docs.filter($"doc_id".isInCollection(packed))
      .select("text").collect().map(_.getString(0))
    assert(texts.distinct.length == texts.length, "packed set contains exact clones")
    docs.unpersist(); out.unpersist()
  }
}
