package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.ProductSync
import graft.streaming.ProductSync.ProductUpdate

class ProductSyncSpec extends SparkSpecBase {

  private val ups = Seq(
    ProductUpdate("SKU-1", "Tedi Robot", 4990.0, 12, 1),
    ProductUpdate("SKU-2", "Tenda F3", 2790.0, 7, 2),
    ProductUpdate("SKU-1", "Tedi Robot v2", 5290.0, 10, 3), // upsert over seq 1
    ProductUpdate("SKU-1", "Tedi Robot v2", 5290.0, 9, 4),  // stock decrement
    ProductUpdate("SKU-3", "Cable", 90.0, 99, 5),
    ProductUpdate("SKU-3", "Cable", 90.0, 99, 6, op = "delete"), // tombstone
    ProductUpdate("SKU-2", "Tenda F3 AC", 2990.0, 7, 7))    // post-dup upsert

  test("streaming upsert: last mutation per sku wins, matches batch snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[ProductUpdate]
    mem.addData(ups.take(3): _*)
    mem.addData(ups.drop(3): _*)
    val q = ProductSync(mem.toDS())
      .writeStream.format("memory").queryName("sync_out").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()

    // final state = last emission per sku
    val finalState = s.table("sync_out")
      .groupBy("sku").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("name", "price", "stock_quantity", "last_seq", "deleted"),
        org.apache.spark.sql.functions.col("last_seq")).as("st"))
      .select("sku", "st.*")
      .orderBy("sku").collect().toSeq

    val batch = ProductSync.latestSnapshot(ups.toDF()).collect().toSeq
    assert(finalState.map(_.toString) == batch.map(_.toString))
    val sku1 = batch.find(_.getString(0) == "SKU-1").get
    assert(sku1.getInt(3) == 9 && sku1.getLong(4) == 4L) // latest mutation won
  }

  test("delete tombstones drop the SKU from the live view and clear keyed state") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val batch = ProductSync.latestSnapshot(ups.toDF()).collect()
    assert(batch.find(_.getString(0) == "SKU-3").get.getAs[Boolean]("deleted"))
    val live = ProductSync.liveSnapshot(ups.toDF()).collect().map(_.getString(0)).toSeq
    assert(live == Seq("SKU-1", "SKU-2")) // DETACH-DELETE propagated

    // re-creation after delete: a later upsert revives the SKU
    val revived = ups :+ ProductUpdate("SKU-3", "Cable v2", 95.0, 10, 8)
    val live2 = ProductSync.liveSnapshot(revived.toDF()).collect()
      .map(_.getString(0)).toSeq
    assert(live2 == Seq("SKU-1", "SKU-2", "SKU-3"))

    // streaming: the tombstone emission is flagged deleted
    val mem = MemoryStream[ProductUpdate]
    mem.addData(ups: _*)
    val q = ProductSync(mem.toDS())
      .writeStream.format("memory").queryName("sync_del").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    val sku3 = s.table("sync_del").filter($"sku" === "SKU-3")
      .orderBy($"last_seq".desc).collect()
    assert(sku3.head.getAs[Boolean]("deleted"))
  }
}
