package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parquet layout writers for downstream scale:
  *
  *  - `writePartitioned`: hive-style partition dirs → partition pruning at
  *    read (a filter on the partition column never touches other dirs),
  *    with sortWithinPartitions for row-group min/max skipping.
  *  - `writeBucketed`: pre-shuffled bucket layout → joins/aggregations on
  *    the bucket key read co-located data and skip the shuffle entirely
  *    (SortMergeJoin with zero Exchange — the 100 TB repeated-join answer).
  */
object TableWriter {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Requires a session with a warehouse dir; registers `table`. */
  def writeBucketed(df: DataFrame, table: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
