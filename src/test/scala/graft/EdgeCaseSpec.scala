package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.operators.{Dedup, TextOps, VectorOps}

/** Degenerate-input behavior: a library operator on an empty or
  * single-row corpus must return an empty/trivial relation, never throw
  * (an empty partition or freshly-truncated table is normal at 100 TB). */
class EdgeCaseSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(java.util.List.of[Row](), docSchema)
      .write.parquet(s"$dir/documents.parquet")
    spark.createDataFrame(java.util.List.of[Row](), embSchema)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val oneRowDir: String = {
    val dir = Files.createTempDirectory("graft-one").toString
    import spark.implicits._
    Seq((0L, "just one document here", "en", "unit", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Array.fill(8)(0.5f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("text + dedup operators return empty relations on an empty corpus") {
    assert(TextOps.langId(spark, emptyDir).count() == 0)
    assert(TextOps.tokenCount(spark, emptyDir).count() == 0)
    assert(Dedup.exactDedup(spark, emptyDir).count() == 0)
    assert(Dedup.minhashLsh(spark, emptyDir).count() == 0)
    assert(Dedup.simhash(spark, emptyDir).count() == 0)
    assert(Dedup.ngramJaccard(spark, emptyDir).count() == 0)
    assert(Dedup.ngramJaccardLsh(spark, emptyDir).count() == 0)
    Caches.clearAll()
  }

  test("vector operators return empty relations on an empty corpus") {
    assert(VectorOps.cosineTopK(spark, emptyDir).count() == 0)
    assert(VectorOps.lshAnn(spark, emptyDir).count() == 0)
    assert(VectorOps.quantizeInt8(spark, emptyDir).count() == 0)
    assert(Dedup.embeddingNearDup(spark, emptyDir).count() == 0)
    assert(Dedup.embeddingNearDupLsh(spark, emptyDir).count() == 0)
    assert(VectorOps.ivfAnn(spark, emptyDir).count() == 0)
    Caches.clearAll()
  }

  test("pair operators yield no pairs on a single-document corpus") {
    assert(Dedup.minhashLsh(spark, oneRowDir).count() == 0)
    assert(Dedup.ngramJaccard(spark, oneRowDir).count() == 0)
    assert(Dedup.embeddingNearDup(spark, oneRowDir).count() == 0)
    assert(Dedup.exactDedup(spark, oneRowDir).count() == 1)
    // top-k against the only vector: nothing else to rank
    assert(VectorOps.cosineTopK(spark, oneRowDir).count() == 0)
    Caches.clearAll()
  }

  test("r4 operators behave on empty and single-row corpora") {
    assert(Dedup.decontaminate(spark, emptyDir).count() == 0)
    assert(TextOps.repetition(spark, emptyDir).count() == 0)
    assert(TextOps.piiRedact(spark, emptyDir).count() == 0)
    assert(TextOps.vocab(spark, emptyDir).count() == 0)
    assert(VectorOps.maxSim(spark, emptyDir).count() == 0)
    assert(VectorOps.mmrRerank(spark, emptyDir).count() == 0)
    assert(TextOps.bm25(spark, emptyDir).count() == 0)
    assert(Dedup.dupClusters(spark, emptyDir).count() == 0)
    Caches.clearAll()
    // one doc: no train/bench overlap possible (doc 0 IS the bench slice);
    // repetition/vocab still produce their one-row stats
    assert(Dedup.decontaminate(spark, oneRowDir).count() == 0)
    assert(TextOps.repetition(spark, oneRowDir).count() == 1)
    assert(TextOps.vocab(spark, oneRowDir).count() == 4) // 4 distinct words
    // the single vector is the query itself: nothing to rank
    assert(VectorOps.mmrRerank(spark, oneRowDir).count() == 0)
    // the lone doc is its own cluster
    val c = Dedup.dupClusters(spark, oneRowDir).collect()
    assert(c.length == 1 && c(0).getLong(0) == c(0).getLong(1))
    Caches.clearAll()
  }
}
