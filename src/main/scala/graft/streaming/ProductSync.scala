package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming catalog upsert + delete propagation — the reference's
  * real-time admin sync (neo4j_service.sync_single_product /
  * seed_sql_db upsert loop; db_service.py:120
  * delete_product_from_db_by_sku + neo4j_service.py:305
  * delete_product_node DETACH DELETE): a stream of product mutations
  * folds into latest-state-per-SKU, where a delete mutation clears the
  * keyed state and emits a tombstone row (deleted=true) so downstream
  * sinks can propagate the removal; a later upsert re-creates the SKU.
  *
  * mapGroupsWithState keyed by sku keeps at most one row of state per
  * product (bounded by catalog size, not stream length) and emits the
  * updated row on every change — the MERGE/upsert/DETACH-DELETE shape
  * without a mutable store. The batch form is a window argmax, same
  * result on a static frame.
  */
object ProductSync {

  case class ProductUpdate(sku: String, name: String, price: Double,
      stock_quantity: Int, seq: Long, op: String = "upsert")
  case class ProductState(sku: String, name: String, price: Double,
      stock_quantity: Int, last_seq: Long, deleted: Boolean = false)

  def updateState(sku: String, updates: Iterator[ProductUpdate],
      state: GroupState[ProductState]): ProductState = {
    val prior = state.getOption.map(s => ProductUpdate(
      s.sku, s.name, s.price, s.stock_quantity, s.last_seq,
      if (s.deleted) "delete" else "upsert"))
    val latest = (prior.iterator ++ updates).maxBy(_.seq)
    val next = ProductState(sku, latest.name, latest.price,
      latest.stock_quantity, latest.seq, latest.op == "delete")
    if (next.deleted) state.remove() else state.update(next)
    next
  }

  /** Streaming: latest state per sku, re-emitted on each mutation;
    * deletes emit a tombstone and drop the keyed state. */
  def apply(updates: Dataset[ProductUpdate]): Dataset[ProductState] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.sku)
      .mapGroupsWithState[ProductState, ProductState](
        GroupStateTimeout.NoTimeout())(updateState)
  }

  /** Batch equivalent on a static mutation log: argmax by seq per sku,
    * tombstones included (deleted=true rows). */
  def latestSnapshot(updates: DataFrame): DataFrame = {
    import updates.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"sku").orderBy($"seq".desc)
    updates
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"sku", $"name", $"price", $"stock_quantity",
        $"seq".as("last_seq"), ($"op" === "delete").as("deleted"))
      .orderBy($"sku")
  }

  /** Live catalog view: the snapshot minus tombstoned SKUs. */
  def liveSnapshot(updates: DataFrame): DataFrame = {
    import updates.sparkSession.implicits._
    latestSnapshot(updates).filter(!$"deleted").drop("deleted")
  }
}
