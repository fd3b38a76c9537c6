package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.{vecDot, vecNorm}

/** Vector-retrieval surface of the reference's Chroma collections
  * (backend/src/api/services/db_service.py: enterprise_data top-k=5
  * retrieval + chunking + content dedup; semantic_cache.py: top-1 cosine
  * with threshold).
  *
  * Cosine runs on the native `vec_dot` codegen kernel (graft.functions.
  * VecDot) — no UDFs, no interpreted lambdas. Exact top-k is the
  * correctness baseline; `lshAnn` (multi-probe sign-bit buckets) and
  * `ivfAnn` (centroid cells) are the 100 TB paths: candidates are a
  * bucket, not the corpus.
  */
object VectorOps {

  /** embedding → double vector + its L2 norm, computed once per row. */
  private def normed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", vecNorm($"v"))
      .persist() // each operator reads it twice (query side + candidate side)
  }

  private def dot(a: Column, b: Column): Column = vecDot(a, b)

  // V1 — brute-force cosine top-k against a query vector (Chroma
  // similarity retrieval, k=5). Query row is broadcast; ranking happens
  // as TakeOrderedAndProject, so no global sort at scale.
  def cosineTopK(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 5): DataFrame = {
    import s.implicits._
    val e = normed(s, dir)
    val q = e.filter($"vec_id" === queryId)
      .select($"v".as("qv"), $"nrm".as("qnrm"))
    e.filter($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", round(dot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .select($"vec_id", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // V2 — semantic cache: per query, the single best cache entry, returned
  // only above the similarity threshold (semantic_cache.check_semantic_cache;
  // its 0.85 threshold scaled to this corpus's cosine range).
  def semanticCache(s: SparkSession, dir: String, threshold: Double = 0.25): DataFrame = {
    import s.implicits._
    val e = normed(s, dir)
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val cache = e.filter($"vec_id" >= 5)
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")
    cache.crossJoin(broadcast(queries))
      .withColumn("sim", round(dot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"sim" >= threshold)
      .select($"query_id", $"vec_id".as("cache_id"), $"sim")
      .orderBy($"query_id")
  }

  // V3 — per-collection kNN: top-3 neighbours per (query, label) — Chroma's
  // per-collection retrieval shape (collections ≈ labels).
  def knnPerLabel(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val e = normed(s, dir)
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val cands = e.filter($"vec_id" >= 10)
    val w = Window.partitionBy($"query_id", $"label").orderBy($"sim".desc, $"vec_id")
    cands.crossJoin(broadcast(queries))
      .withColumn("sim", round(dot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"query_id", $"label", $"vec_id", $"sim", $"rn")
      .orderBy($"query_id", $"label", $"rn")
  }

  /** Fixed pseudo-random hyperplanes, derived from md5 so every engine and
    * every executor agrees without shipping state. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdVal = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, i) =>
      val hex = mdVal.digest(s"$p:$i".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      (h % 2001L) / 1000.0 - 1.0
    }
  }

  // V4 — LSH ANN (the scale path for V1): 4 sign-bit hyperplane buckets;
  // multi-probe widens candidates to buckets within Hamming distance
  // `probeRadius` of the query's bucket (radius 1 ≈ 5× candidates, large
  // recall gain on near-uniform corpora). Rows-only check; recall vs V1
  // asserted in the ScalaTest spec.
  def lshAnn(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 5,
      probeRadius: Int = 1): DataFrame = {
    import s.implicits._
    val planes = hyperplanes(4, 64)
    val e = normed(s, dir)
    val bucketed = e.withColumn("bucket",
      planes.zipWithIndex.map { case (hp, p) =>
        when(dot($"v", typedLit(hp.toSeq)) >= 0, 1 << p).otherwise(0)
      }.reduce(_ + _))
    val q = bucketed.filter($"vec_id" === queryId)
      .select($"v".as("qv"), $"nrm".as("qnrm"), $"bucket".as("qbucket"))
    bucketed.filter($"vec_id" =!= queryId)
      .join(broadcast(q),
        expr(s"bit_count(bucket ^ qbucket) <= $probeRadius"))
      .withColumn("sim", round(dot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .select($"vec_id", $"bucket", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // V4b — IVF ANN (the other scale path): coarse-quantize every vector to
  // its nearest centroid cell; the query probes only the nProbe nearest
  // cells and re-ranks exactly inside them. Centroids here are a fixed
  // deterministic subset (a k-means fit would drop in unchanged).
  def ivfAnn(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import s.implicits._
    val e = normed(s, dir)
    val cents = e.filter($"vec_id" < nCells)
      .select($"vec_id".as("cell"), $"v".as("cv"), $"nrm".as("cnrm"))
    val wA = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cell")
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("csim", dot($"v", $"cv") / ($"nrm" * $"cnrm"))
      .withColumn("arn", row_number().over(wA))
      .filter($"arn" === 1)
      .select($"vec_id", $"v", $"nrm", $"cell")
    val q = e.filter($"vec_id" === queryId)
      .select($"v".as("qv"), $"nrm".as("qnrm"))
    val probeCells = cents.crossJoin(broadcast(q))
      .withColumn("csim", dot($"cv", $"qv") / ($"cnrm" * $"qnrm"))
      .orderBy($"csim".desc, $"cell")
      .limit(nProbe)
      .select($"cell")
    assigned.filter($"vec_id" =!= queryId)
      .join(broadcast(probeCells), "cell")
      .crossJoin(broadcast(q))
      .withColumn("sim", round(dot($"v", $"qv") / ($"nrm" * $"qnrm"), 6))
      .select($"vec_id", $"cell", $"sim")
      .orderBy($"sim".desc, $"vec_id")
      .limit(k)
  }

  // V5 — text chunking for RAG ingestion: 200-char windows, 50-char overlap
  // (db_service.py:209 RecursiveCharacterTextSplitter(1000, 200), sized to
  // this corpus's 100–500-char docs).
  def chunkText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("chunk_id",
        explode(expr("sequence(0, (length(text) - 1) div 150)")))
      .withColumn("chunk_text", expr("substring(text, chunk_id * 150 + 1, 200)"))
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"), $"chunk_text")
      .orderBy($"doc_id", $"chunk_id")
  }

  // V6 — retrieval dedup by normalized content (db_service.py:371
  // get_formatted_chunks: seen_contents keyed on content.strip().lower()).
  def dedupChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5(lower(trim($"text"))).as("norm_h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }
}
