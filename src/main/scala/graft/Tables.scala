package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central parquet loaders for the scale-factor table dirs (TESTDATA.md).
  *
  * Single entry point for every scan so Catalyst's column pruning and
  * predicate pushdown reach the parquet reader of every operator; at
  * cluster scale these would be catalog tables with partitioning metadata.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  // NOT widened (measured, r4): most fact-table consumers shuffle by a
  // key within one stage of the scan (orderkey/partkey groupBys, the
  // fold shuffles), so a blind repartition only ADDS an exchange —
  // copurchase and place_order regressed ~20% under it, while only the
  // pure broadcast-join-then-agg queries gained. The under-split-scan
  // fix stays where every consumer is pre-shuffle compute-heavy
  // (documents, embeddings).
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long, truncate to µs) and
    * as plain TIMESTAMP(MICROS)/NTZ, depending on the generator run.
    * Normalize every form to session-tz TimestampType so downstream
    * operators and the DuckDB oracle's CAST(ts AS TIMESTAMP) see the
    * same µs values (session tz is pinned to UTC ⇒ the NTZ cast is a
    * pure dtype change). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = table(s, d, "events")
    t.schema("ts").dataType match {
      case LongType => t.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => t.withColumn("ts", col("ts").cast(TimestampType))
      case _ => t
    }
  }
  /** documents arrives as one small parquet file = ONE input split, and
    * the expensive per-row work (shingle explosion, md5 hashing) happens
    * BEFORE any shuffle — on a single core unless the scan is widened.
    * The table is tiny per row, so the widening shuffle is negligible;
    * at real scale the store is pre-split and this is a no-op. */
  def documents(s: SparkSession, d: String): DataFrame = {
    val t = table(s, d, "documents")
    val p = s.sparkContext.defaultParallelism
    if (t.rdd.getNumPartitions < p) t.repartition(p) else t
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
