package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.ProductSync
import graft.streaming.ProductSync.ProductUpdate

class ProductSyncSpec extends SparkSpecBase {

  test("streaming upsert: last mutation per sku wins, matches batch snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ups = Seq(
      ProductUpdate("SKU-1", "Tedi Robot", 4990.0, 12, 1),
      ProductUpdate("SKU-2", "Tenda F3", 2790.0, 7, 2),
      ProductUpdate("SKU-1", "Tedi Robot v2", 5290.0, 10, 3), // upsert over seq 1
      ProductUpdate("SKU-1", "Tedi Robot v2", 5290.0, 9, 4))  // stock decrement

    val mem = MemoryStream[ProductUpdate]
    mem.addData(ups.take(2): _*)
    mem.addData(ups.drop(2): _*)
    val q = ProductSync(mem.toDS())
      .writeStream.format("memory").queryName("sync_out").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()

    // final state = last emission per sku
    val finalState = s.table("sync_out")
      .groupBy("sku").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("name", "price", "stock_quantity", "last_seq"),
        org.apache.spark.sql.functions.col("last_seq")).as("st"))
      .select("sku", "st.*")
      .orderBy("sku").collect().toSeq

    val batch = ProductSync.latestSnapshot(ups.toDF()).collect().toSeq
    assert(finalState.map(_.toString) == batch.map(_.toString))
    val sku1 = batch.find(_.getString(0) == "SKU-1").get
    assert(sku1.getInt(3) == 9 && sku1.getLong(4) == 4L) // latest mutation won
  }
}
