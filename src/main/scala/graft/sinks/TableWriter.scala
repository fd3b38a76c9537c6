package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet layout writers for downstream scale:
  *
  *  - `writePartitioned`: hive-style partition dirs → partition pruning at
  *    read (a filter on the partition column never touches other dirs),
  *    with sortWithinPartitions for row-group min/max skipping.
  *  - `writeBucketed`: pre-shuffled bucket layout → joins/aggregations on
  *    the bucket key read co-located data and skip the shuffle entirely
  *    (SortMergeJoin with zero Exchange — the 100 TB repeated-join answer).
  *  - `compact`: small-file compaction — streaming/incremental ingestion
  *    leaves thousands of KB-sized files per partition; re-reading them
  *    dominates task-scheduling overhead at scale. Rewrites a directory
  *    to ~`targetRowsPerFile` rows per file with an optional locality
  *    sort (row-group min/max skipping survives compaction).
  */
object TableWriter {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Rewrite `inPath` (parquet, possibly thousands of small files) to
    * `outPath` with files of ~targetRowsPerFile rows. Row count, not
    * bytes, keys the split so the file count is deterministic; a byte
    * target divides by the table's average row width upstream. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetRowsPerFile: Long, sortCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val re = df.repartition(files)
    (if (sortCols.nonEmpty) re.sortWithinPartitions(sortCols.map(col): _*) else re)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Exactly-once streaming sink body for `writeStream.foreachBatch`:
    * every micro-batch lands in its own `batch=<id>` directory with
    * overwrite, so an at-least-once replay of a batch (post-crash
    * recovery re-delivers the last uncommitted batch) rewrites the same
    * path instead of appending duplicates — idempotence from layout, no
    * transaction log needed. */
  def idempotentBatchSink(path: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** SCD1 batch MERGE (keyed upsert) into a hive-partitioned parquet
    * table — the batch twin of streaming.ProductSync for the daily
    * re-ingestion loop (a re-scraped catalog arrives as a delta frame;
    * matched keys take the new row, unmatched keys insert, untouched
    * rows survive). Parquet has no row-level transaction log, so the
    * merge is DELETE-AND-INSERT AT PARTITION GRANULARITY under dynamic
    * partition overwrite: only the partitions the delta actually
    * touches are rewritten — work scales with the delta's partition
    * footprint, never the table (the 100 TB contract; a Delta/Iceberg
    * MERGE INTO does exactly this under copy-on-write). Per merge: one
    * bounded collect of the delta's distinct partition values (dims of
    * a partition column, not data), one keyed left_anti join of the
    * affected slice against the delta, one dynamic-overwrite write.
    * Re-merging the same delta rewrites the same partitions with the
    * same bytes — idempotent. `updates` must be key-unique (a delta
    * with two rows per key has no well-defined SCD1 winner; dedupe
    * upstream with an ordering).
    *
    * Cost of the default path (measured, ProbeMerge r12 — interleaved
    * reps, pinned heap): the host-partition semi-join scan prices at
    * ~37% of a 200×-ratio merge (20M-row table, 100K-row delta:
    * default 3.4 s vs stable-keys 2.1 s min-of-3; same ~35% ratio as
    * the r11 reading at 12.4/8.1 s pre-heap-pin); it is column-pruned
    * to keyCols + partitionCol, so it scales with TABLE ROWS, not
    * table bytes. Callers whose partition key provably never changes
    * for an existing key (the daily re-scrape where partition = a
    * stable category) should pass `assumeStablePartitionKeys = true`
    * and skip that scan. */
  def mergeInto(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], partitionCol: String,
      assumeStablePartitionKeys: Boolean = false): Unit = {
    val exists =
      try { spark.read.parquet(path).schema; true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!exists) {
      updates.write.partitionBy(partitionCol).parquet(path)
      return
    }
    val target = spark.read.parquet(path)
    // r11 (ADVICE r10, medium): partition values are collected AS THE
    // WRITER-ENCODED STRING — cast(partitionCol as string) under the
    // session timezone is exactly the string the dynamic-partition
    // writer feeds to getPartitionPathString, so timestamps render
    // "…00:00:00" (not java.sql.Timestamp's "…00:00:00.0") and the
    // emptied-dir names below reproduce the on-disk layout. NULL is kept
    // as a real null (String.valueOf would bake the literal "null"):
    // getPartitionPathString maps it to __HIVE_DEFAULT_PARTITION__.
    val partStr = col(partitionCol).cast("string")
    // r12 (ADVICE r11, low): EMPTY STRING is normalized to null at
    // collect time — getPartitionPathString maps BOTH ('' and null) to
    // __HIVE_DEFAULT_PARTITION__ (its test is `value == null ||
    // value.isEmpty`) and read-back re-infers the dir as null, so the
    // two values are ONE partition class on disk. Keeping them distinct
    // here let a footprint containing both list the shared default dir
    // as 'emptied' for one class while the overwrite had just written
    // the other class's rows into it — fs.delete then removed fresh
    // rows. One class in, one class out, everywhere below.
    def collectParts(df: DataFrame): Array[String] =
      df.collect().map(r =>
        if (r.isNullAt(0) || r.getString(0).isEmpty) null else r.getString(0))
    val deltaParts = collectParts(
      updates.select(partStr).distinct()) // bounded: the delta's footprint
    // ADVICE r9 (medium): an update may MOVE a key to a new partition
    // value — the stale row then lives in a partition the delta never
    // names, and rewriting only the delta's partitions would leave two
    // rows for one key. The partitions hosting the delta's keys TODAY
    // come from one column-pruned keyed semi-join over the table (the
    // scan reads keyCols + partitionCol only — the same matching scan a
    // Delta/Iceberg MERGE pays under copy-on-write); the REWRITE stays
    // scoped to the true affected footprint. Callers that guarantee
    // partition-stable keys (the common daily re-scrape: partition = a
    // stable category) can skip the scan explicitly.
    val hostParts =
      if (assumeStablePartitionKeys) Array.empty[String]
      else collectParts(target
        .join(updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
        .select(partStr).distinct())
    val parts = (deltaParts ++ hostParts).distinct
    // isin never matches NULL (three-valued logic) — a delta touching the
    // null partition would otherwise leave it out of `affected`, and the
    // dynamic overwrite would then DROP that partition's unmatched rows
    // (the write replaces the dir with only the delta's rows). Filter on
    // the same cast-to-string expression the values were collected from,
    // with an explicit isNull leg when the footprint includes null.
    val nonNullParts = parts.filter(_ != null)
    val inNonNull = partStr.isin(nonNullParts: _*)
    // the default-class leg must match every row the writer sends to
    // __HIVE_DEFAULT_PARTITION__: null AND empty string (see collectParts)
    val defaultClass = partStr.isNull || partStr === ""
    val partFilter =
      if (!parts.contains(null)) inNonNull
      else if (nonNullParts.isEmpty) defaultClass
      else inNonNull || defaultClass
    val affected = target.filter(partFilter)
    val survivors = affected.join(
      updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    // the rewrite READS the same files the overwrite deletes, so the
    // merged slice is materialized (spillable checkpoint) before the
    // commit — bounded by the affected partitions, not the table
    val merged = survivors.unionByName(updates.select(target.columns.map(col): _*))
      .localCheckpoint(true)
    // r11 (ADVICE r10, low): the overwrite mode rides a WRITE-SCOPED
    // option instead of a set/restore on the shared session conf — the
    // same concurrent-planning race partitionedCheckpoint eliminated for
    // the AQE flag (a concurrent thread's overwrite could plan under
    // "dynamic", and two overlapping mergeInto calls could race the
    // restore). DataFrameWriter options shadow the SQL conf per write.
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
    // dynamic overwrite only replaces partitions it WRITES — an affected
    // partition whose every row moved away or was superseded gets no new
    // file and would keep its stale directory. Drop those explicitly,
    // with dir names encoded exactly as the writer encodes them (see
    // partStr above: cast-to-string value, null → DEFAULT_PARTITION_NAME
    // via getPartitionPathString).
    val kept = collectParts(merged.select(partStr).distinct()).toSet
    val emptied = parts.filterNot(kept)
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      emptied.foreach { v =>
        val dir = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partitionCol, v)
        fs.delete(new org.apache.hadoop.fs.Path(path, dir), true)
      }
    }
  }

  /** Requires a session with a warehouse dir; registers `table`. */
  def writeBucketed(df: DataFrame, table: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
