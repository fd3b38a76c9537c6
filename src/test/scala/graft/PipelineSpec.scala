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

  test("leakproof split: clusters never straddle splits, near-dup pairs co-split") {
    import spark.implicits._
    val out = CorpusPipeline.splitLeakproof(spark, sfDir).cache()
    // total = corpus, every doc labeled
    assert(out.count() == Tables.documents(spark, sfDir).count())
    // the defining invariant: one split per cluster
    val mixed = out.groupBy("cluster_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(mixed == 0, "a near-dup cluster straddles a split boundary")
    // hence every MinHash near-dup pair is co-split (leakage-free)
    val splitOf = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLsh(spark, sfDir).select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(splitOf(r.getLong(0)) == splitOf(r.getLong(1)),
        s"near-dup pair (${r.getLong(0)},${r.getLong(1)}) split across splits")
    }
    // all three splits materialize at this corpus size
    assert(out.select("split").distinct().count() == 3)
    out.unpersist()
  }

  test("data card: rollup total row is consistent with the per-source rows") {
    import spark.implicits._
    val out = CorpusPipeline.dataCard(spark, sfDir).collect()
    val (all, per) = out.partition(_.getString(0) == "ALL")
    assert(all.length == 1 && per.nonEmpty)
    val t = all.head
    assert(t.getAs[Long]("n_docs") == per.map(_.getAs[Long]("n_docs")).sum)
    assert(t.getAs[Long]("n_tokens") == per.map(_.getAs[Long]("n_tokens")).sum)
    // distinct hashes are NOT additive across sources when clones span
    // sources — the total can only be <= the per-source sum
    assert(t.getAs[Long]("n_unique") <= per.map(_.getAs[Long]("n_unique")).sum)
    // dup_frac consistent with its own row's counts
    out.foreach { r =>
      val expect = BigDecimal(1.0 - r.getAs[Long]("n_unique").toDouble / r.getAs[Long]("n_docs"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("dup_frac") - expect) < 1e-9)
    }
  }
}
