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
}
