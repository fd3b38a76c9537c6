package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming catalog upsert — the reference's real-time admin sync
  * (neo4j_service.sync_single_product / seed_sql_db upsert loop): a stream
  * of product mutations folds into latest-state-per-SKU.
  *
  * mapGroupsWithState keyed by sku keeps exactly one row of state per
  * product (bounded by catalog size, not stream length) and emits the
  * updated row on every change — the MERGE/upsert shape without a mutable
  * store. The batch form is a window argmax, same result on a static frame.
  */
object ProductSync {

  case class ProductUpdate(sku: String, name: String, price: Double,
      stock_quantity: Int, seq: Long)
  case class ProductState(sku: String, name: String, price: Double,
      stock_quantity: Int, last_seq: Long)

  def updateState(sku: String, updates: Iterator[ProductUpdate],
      state: GroupState[ProductState]): ProductState = {
    val latest = (state.getOption.map(s =>
      ProductUpdate(s.sku, s.name, s.price, s.stock_quantity, s.last_seq)).iterator ++ updates)
      .maxBy(_.seq)
    val next = ProductState(sku, latest.name, latest.price, latest.stock_quantity, latest.seq)
    state.update(next)
    next
  }

  /** Streaming: latest state per sku, re-emitted on each mutation. */
  def apply(updates: Dataset[ProductUpdate]): Dataset[ProductState] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.sku)
      .mapGroupsWithState[ProductState, ProductState](
        GroupStateTimeout.NoTimeout())(updateState)
  }

  /** Batch equivalent on a static mutation log: argmax by seq per sku. */
  def latestSnapshot(updates: DataFrame): DataFrame = {
    import updates.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"sku").orderBy($"seq".desc)
    updates
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"sku", $"name", $"price", $"stock_quantity", $"seq".as("last_seq"))
      .orderBy($"sku")
  }
}
