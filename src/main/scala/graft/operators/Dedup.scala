package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps.h64
import graft.functions.GraftFunctions.{vecDot, vecNorm}

/** Deduplication operators for LLM-pipeline data prep, over `documents`
  * (reference analogue: the retrieval dedup in db_service.get_formatted_chunks
  * plus the dedup stages any 100 TB corpus pipeline needs).
  *
  * Scale design: no operator ever does a blind cross join. Candidates come
  * from an inverted index (shared shingle) or LSH band buckets — both
  * shuffle on a high-cardinality key and are AQE-skew-tolerant. The
  * inverted-index variants cap fanout with a document-frequency stop list
  * at real scale (see SURVEY §5); MinHash-LSH (D2) is the path that stays
  * near-linear at 100 TB.
  *
  * All hashing derives from md5 (TextOps.h64) so the DuckDB oracle computes
  * the identical buckets and fingerprints.
  */
object Dedup {

  private def wordsOf(c: Column): Column = split(lower(c), " ")

  /** doc_id + distinct word-n-gram shingles, one row per (doc, shingle). */
  private def shingles(s: SparkSession, dir: String, n: Int): DataFrame = {
    import s.implicits._
    val parts = (0 until n).map(k => s"element_at(w, i + $k)").mkString(", ")
    Tables.documents(s, dir)
      .select($"doc_id", wordsOf($"text").as("w"))
      .filter(size($"w") >= n) // sequence(1, size-k) descends when size < k
      .select($"doc_id", explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', $parts))")).as("s"))
      .distinct()
  }

  // D1 — exact dedup: content-hash groups, keep the smallest doc_id.
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  // D2 — MinHash + LSH near-dup: word-3-gram shingles → 16 minhash perms →
  // 4 bands of 4 → pairs sharing ≥1 band bucket. Output: candidate pair +
  // how many of the 4 bands collided.
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = 1000000007L
    val h = shingles(s, dir, 3)
      .select($"doc_id", (h64($"s") % M).as("hv"))
    val mh = h
      .select($"doc_id", $"hv", explode(sequence(lit(0), lit(15))).as("j"))
      .groupBy($"doc_id", $"j")
      .agg(min(((lit(2) * $"j" + 1) * $"hv" + lit(17) * $"j" + 3) % M).as("m"))
    def slot(k: Int): Column = max(when($"j" % 4 === k, $"m")).cast("string")
    // persisted: the self-join below would otherwise recompute the whole
    // shingle->minhash->band pipeline for each side
    val bands = mh
      .groupBy($"doc_id", expr("j div 4").as("band"))
      .agg(concat_ws(",", slot(0), slot(1), slot(2), slot(3)).as("sig"))
      .persist()
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, $"a.band" === $"b.band" && $"a.sig" === $"b.sig" &&
        $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy($"doc_a", $"doc_b")
  }

  // D3 — SimHash near-dup: 48-bit tf-weighted fingerprint (classical
  // Charikar simhash: every word OCCURRENCE votes, so documents sharing a
  // vocabulary but differing in frequencies still separate — distinct-set
  // voting collapsed this corpus's fingerprints to hamming 0);
  // candidates via 4 12-bit bands; emit pairs with Hamming distance ≤ 6.
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wd = Tables.documents(s, dir)
      .select($"doc_id", explode(wordsOf($"text")).as("wrd"))
      .withColumn("h", conv(substring(md5($"wrd"), 1, 12), 16, 10).cast("long"))
    val votes = wd
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(47))).as("i"))
      .groupBy($"doc_id", $"i")
      .agg(sum(when(expr("(h div shiftleft(1L, i)) % 2") === 1, 1).otherwise(-1)).as("vote"))
    val fp = votes
      .groupBy($"doc_id")
      .agg(sum(when($"vote" > 0, expr("shiftleft(1L, i)")).otherwise(0L)).as("fp"))
    val banded = fp.select($"doc_id", $"fp",
      explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("bv", expr("(fp div shiftleft(1L, 12*k)) % 4096"))
      .persist() // self-joined below
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, $"a.k" === $"b.k" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("bit_count(a.fp ^ b.fp)").cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= 6)
      .orderBy($"doc_a", $"doc_b")
  }

  // D4 — n-gram Jaccard near-dup: word-bigram sets, inverted-index join
  // for |∩|, Jaccard ≥ 0.5 — the exact baseline MinHash (D2) approximates.
  // Shingles present in > 20% of documents are stop-shingles: they carry no
  // near-dup signal but dominate the inverted index's pair fanout (the
  // quadratic term), so they are dropped from the shingle sets on BOTH
  // engines — at 100 TB this cap is what keeps the join near-linear.
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = shingles(s, dir, 2)
    val nDocs = Tables.documents(s, dir).count().toDouble
    val rare = all.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" <= nDocs * 0.2)
      .select($"s")
    val sh = all.join(rare, "s").persist() // read 3x: both join sides + sizes
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a")
    val b = sh.as("b")
    val inter = a.join(b, $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jacc_raw", $"ni".cast("double") / ($"na" + $"nb" - $"ni"))
      .filter($"jacc_raw" >= 0.5)
      .select($"doc_a", $"doc_b", round($"jacc_raw", 6).as("jacc"))
      .orderBy($"doc_a", $"doc_b")
  }

  // D5 — embedding-cosine near-dup on `embeddings`: exact pairwise baseline
  // (the LSH-bucketed scale path is VectorOps.lshAnn's bucketing applied
  // pairwise). Threshold tuned to the synthetic data's tail (≥ 0.35).
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", vecNorm($"v"))
      .persist() // self-joined below
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, $"a.vec_id" < $"b.vec_id")
      .withColumn("sim", vecDot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .withColumn("sim_r", round($"sim", 6))
      .filter($"sim_r" >= 0.35)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"), $"sim_r".as("sim"))
      .orderBy($"vec_a", $"vec_b")
  }
}
