package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.OrderFold
import graft.streaming.OrderFold.{OrderStatusState, StatusEvent, StockRequest}

/** The transactional write-path folds (reference tools.py:96
  * place_order_logic; db_service.py:136/:158 status updates): greedy
  * stock deduction and legality-checked status transitions, batch and
  * streaming forms. */
class OrderFoldSpec extends SparkSpecBase {

  private def req(pk: Long, okey: Long, qty: Double, stock: Double) =
    StockRequest(pk, okey, 1, qty, stock)

  test("place_order fold: accepts iff qty fits remaining stock, rejects consume nothing") {
    val s = spark
    import s.implicits._
    // part 1, stock 10: 4 (acc, 6 left) / 8 (rej) / 6 (acc, 0) / 1 (rej)
    val log = Seq(req(1, 10, 4, 10), req(1, 11, 8, 10), req(1, 12, 6, 10), req(1, 13, 1, 10))
    val d = OrderFold.decisionsOf(log.toDS()).collect().sortBy(_.okey)
    assert(d.map(_.accepted).toSeq == Seq(true, false, true, false))
    assert(d.map(_.stock_after).toSeq == Seq(6.0, 6.0, 0.0, 0.0))
  }

  test("place_order fold on the corpus: stock conservation per part") {
    val s = spark
    import s.implicits._
    val stock = Tables.part(s, sfDir)
      .select($"p_partkey".as("part"), ($"p_size" * 10).cast("double").as("stock"))
    val bad = OrderFold.placeOrderQuery(s, sfDir)
      .join(stock, "part")
      .filter($"stock_left" < 0 || $"qty_accepted" =!= $"stock" - $"stock_left" ||
        $"n_accepted" + $"n_rejected" =!= $"n_requests")
      .count()
    assert(bad == 0)
  }

  test("place_order streaming twin equals the batch fold across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val log = Seq(
      req(1, 10, 4, 10), req(1, 11, 8, 10), req(2, 10, 3, 5),
      req(1, 12, 6, 10), req(2, 11, 3, 5), req(2, 12, 2, 5))
    val mem = MemoryStream[StockRequest]
    mem.addData(log.take(3): _*) // arrival order == (okey, lineno) order per key
    mem.addData(log.drop(3): _*)
    val q = OrderFold.placeOrderStream(mem.toDS())
      .writeStream.format("memory").queryName("po_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("po_out")
      .orderBy("part", "okey").collect().map(_.toString).toSeq
    val batch = OrderFold.decisionsOf(log.toDS()).toDF()
      .orderBy("part", "okey").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("status fold: only O/P orders transition; terminal states reject updates") {
    val s = spark
    import s.implicits._
    val evs = Seq(
      StatusEvent(1, "P", 1), StatusEvent(1, "F", 2), StatusEvent(1, "C", 3), // C illegal: F terminal
      StatusEvent(2, "C", 1), StatusEvent(2, "P", 2)) // P illegal: C terminal
    val got = OrderFold.statusSnapshot(evs.toDS()).collect()
      .map(st => st.order_id -> st).toMap
    assert(got(1L) == OrderStatusState(1, "F", 2, 1))
    assert(got(2L) == OrderStatusState(2, "C", 1, 1))
  }

  test("status streaming twin equals batch snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val evs = Seq(
      StatusEvent(1, "P", 1), StatusEvent(1, "F", 2),
      StatusEvent(2, "C", 1), StatusEvent(2, "P", 2), StatusEvent(1, "C", 3))
    val mem = MemoryStream[StatusEvent]
    mem.addData(evs.take(3): _*)
    mem.addData(evs.drop(3): _*)
    val q = OrderFold.statusStream(mem.toDS())
      .writeStream.format("memory").queryName("st_out")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    // final streamed state = last emission per order
    val streamed = s.table("st_out")
      .groupBy("order_id")
      .agg(max_by(struct("status", "n_applied", "n_rejected"), col("n_applied") + col("n_rejected")).as("st"))
      .select(col("order_id"), col("st.*"))
      .orderBy("order_id").collect().map(_.toString).toSeq
    val batch = OrderFold.statusSnapshot(evs.toDS()).toDF()
      .orderBy("order_id").collect().map(_.toString).toSeq
    assert(streamed == batch)
  }
}
