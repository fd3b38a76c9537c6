package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, VectorOps}
import graft.functions.GraftFunctions.{vecNorm, vecScale, vecToDouble}

/** r8 wave-9 operators: IVF-PQ ANN, incremental MV maintenance. */
class Wave9Spec extends SparkSpecBase {

  // ---------------------------------------------------------------- R28

  test("mv incremental: base+delta partial merge ≡ full recompute, bit for bit") {
    val s = spark
    import s.implicits._
    val full = Relational.revenueByCategory(s, sfDir).collect().toSeq
    val inc = Relational.revenueByCategoryIncremental(s, sfDir).collect().toSeq
    assert(inc == full)
    // the split really is a split: per-category line counts decompose
    val li = Tables.lineitem(s, sfDir)
    val nDelta = li.filter($"l_orderkey" % 10 === 0).count()
    val nBase = li.filter($"l_orderkey" % 10 =!= 0).count()
    assert(nDelta > 0 && nBase > 0) // both legs carry real rows
    assert(inc.map(_.getLong(3)).sum == nBase + nDelta)
  }

  // ---------------------------------------------------------------- V16

  test("ivfpq: planted clone of the query survives cells, codes, and rerank") {
    val s = spark
    import s.implicits._
    val base = Array(0.3f, -0.9f, 0.4f, 0.1f, 0.7f, -0.2f, 0.05f, 0.6f)
    def jitter(k: Int) = base.zipWithIndex.map { case (x, i) =>
      x + 0.31f * ((i * 7 + k * 13) % 11 - 5) }
    val planted = ((0L, base) +: (1L, base.clone) +:
        (2L to 40L).map(k => (k, jitter(k.toInt))))
      .toDF("vec_id", "embedding")
      .withColumn("v", vecToDouble(col("embedding")))
      .withColumn("nrm", vecNorm(col("v")))
      .withColumn("u", vecScale(col("v"), col("nrm")))
    // the clone shares the query's unit vector → same cell (probed
    // first) → identical codes → top ADC score → survives rerank
    val top = VectorOps.ivfpqAnnOn(planted, queryId = 0L, k = 3,
      nCells = 4, nProbe = 2, kmIters = 3, m = 4, ksub = 8, pqIters = 2,
      rerank = 10).collect()
    assert(top.head.getLong(0) == 1L, s"clone not first: ${top.toSeq}")
    assert(top.head.getDouble(3) == 1.0) // exact cosine with itself
  }

  test("ivfpq: full probe + full rerank degrade to exact top-k") {
    val s = spark
    import s.implicits._
    val exact = VectorOps.cosineTopK(s, sfDir, 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    Caches.clearAll()
    val e = VectorOps.normed(s, sfDir)
    val got = VectorOps.ivfpqAnnOn(e, queryId = 0L, k = 5, nCells = 4,
      nProbe = 4, kmIters = 3, m = 16, ksub = 16, pqIters = 2,
      rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // every cell probed + everything reranked exactly ⇒ the approximate
    // machinery cannot lose a candidate
    assert(got == exact)
  }

  test("ivfpq: corpus recall beats the rerank-budget baseline") {
    val s = spark
    val exact = VectorOps.cosineTopK(s, sfDir, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    Caches.clearAll()
    val got = VectorOps.ivfpqAnn(s, sfDir, 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    // rerank=50 of ~100 vectors at random would land ~50% of the exact
    // set only by luck of the draw; demand a real signal
    assert((exact & got).size >= 3, s"recall ${(exact & got).size}/10")
  }
}
