package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** The reference agent's transactional write paths, re-expressed as
  * event-log folds.
  *
  *  - `place_order` (reference backend tools.py:96 place_order_logic):
  *    validate user → check stock → create order → deduct stock. Here the
  *    order-request log folds per product: a request is ACCEPTED iff its
  *    quantity fits the remaining stock at its position in the log, and
  *    acceptance deducts; rejected requests consume nothing. The fold is
  *    inherently sequential per key but keys are independent, so it
  *    parallelizes as a shuffle by product: per-key group sizes are
  *    bounded by per-product order counts (~dozens regardless of SF in a
  *    TPC-H-shaped corpus), never the table size — scale-safe at 100 TB.
  *
  *  - `update_order_status` / cancel (db_service.py:136, :158): a status
  *    mutation log folds per order under the legality rule that only
  *    PENDING/PROCESSING ('O'/'P' — the R8 cancel-eligibility predicate)
  *    orders may transition; terminal states reject all further updates.
  *
  * Each fold ships as a batch Dataset fold plus a Structured Streaming
  * twin (flatMapGroupsWithState / mapGroupsWithState) whose state is one
  * row per key; specs assert stream ≡ batch on fixtures.
  */
object OrderFold {

  // ── place_order: stock check + deduction ────────────────────────────

  case class StockRequest(pk: Long, okey: Long, lineno: Int, qty: Double,
      stock: Double)
  case class OrderDecision(part: Long, okey: Long, lineno: Int, qty: Double,
      accepted: Boolean, stock_after: Double)

  /** Greedy fold over one product's requests in (okey, lineno) order.
    * Group sizes are bounded (per-product request count), so the sort is
    * in-memory-safe per key. */
  private def decide(pk: Long, reqs: Iterator[StockRequest]): Iterator[OrderDecision] = {
    val rs = reqs.toArray.sortBy(r => (r.okey, r.lineno))
    var avail = rs.head.stock
    rs.iterator.map { r =>
      val acc = r.qty <= avail
      if (acc) avail -= r.qty
      OrderDecision(pk, r.okey, r.lineno, r.qty, acc, avail)
    }
  }

  /** The order-request log: every lineitem is a request for its part,
    * sequenced by (orderkey, linenumber); initial stock = p_size*10 (the
    * R5 check_stock convention). */
  private[graft] def requests(s: SparkSession, dir: String): Dataset[StockRequest] = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_partkey".as("pk"), $"l_orderkey".as("okey"),
        $"l_linenumber".as("lineno"), $"l_quantity".as("qty"))
      .join(broadcast(Tables.part(s, dir)
        .select($"p_partkey".as("pk"),
          ($"p_size" * 10).cast("double").as("stock"))), "pk")
      .as[StockRequest]
  }

  /** Batch decision log on any request log: one accept/reject per request. */
  private[graft] def decisionsOf(reqs: Dataset[StockRequest]): Dataset[OrderDecision] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.pk).flatMapGroups(decide _)
  }

  private[graft] def decisions(s: SparkSession, dir: String): Dataset[OrderDecision] =
    decisionsOf(requests(s, dir))

  /** queries entry `s_place_order`: per-part placement summary, hash-
    * matched against a DuckDB recursive-CTE fold of the same log. */
  def placeOrderQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decisions(s, dir).toDF()
      .groupBy($"part")
      .agg(
        count(lit(1)).as("n_requests"),
        sum(when($"accepted", 1L).otherwise(0L)).as("n_accepted"),
        sum(when(!$"accepted", 1L).otherwise(0L)).as("n_rejected"),
        sum(when($"accepted", $"qty").otherwise(0.0).cast("decimal(18,6)"))
          .cast("double").as("qty_accepted"),
        min($"stock_after").cast("double").as("stock_left"))
      .orderBy($"part")
  }

  /** Streaming twin: state = remaining stock per product; requests are
    * decided in arrival order (within a batch, (okey, lineno) order for
    * determinism), state persists across micro-batches. */
  private def updateStock(pk: Long, reqs: Iterator[StockRequest],
      state: GroupState[Double]): Iterator[OrderDecision] = {
    val rs = reqs.toArray.sortBy(r => (r.okey, r.lineno))
    var avail = state.getOption.getOrElse(rs.head.stock)
    val out = rs.map { r =>
      val acc = r.qty <= avail
      if (acc) avail -= r.qty
      OrderDecision(pk, r.okey, r.lineno, r.qty, acc, avail)
    }
    state.update(avail)
    out.iterator
  }

  def placeOrderStream(reqs: Dataset[StockRequest]): Dataset[OrderDecision] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.pk)
      .flatMapGroupsWithState[Double, OrderDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateStock)
  }

  // ── update_order_status: legality-checked transition fold ───────────

  case class StatusEvent(order_id: Long, to_status: String, seq: Long)
  case class OrderStatusState(order_id: Long, status: String,
      n_applied: Long, n_rejected: Long)

  /** Only open-ish orders mutate: 'O' (pending) and 'P' (processing) may
    * transition anywhere; 'F' (fulfilled) and 'C' (cancelled) are
    * terminal (db_service.py:136 status guard; :158 cancel writes C). */
  private[graft] def transitionLegal(cur: String): Boolean =
    cur == "O" || cur == "P"

  private def foldStatus(id: Long, initial: String,
      evs: Seq[StatusEvent]): OrderStatusState = {
    var cur = initial
    var applied = 0L
    var rejected = 0L
    evs.sortBy(_.seq).foreach { e =>
      if (transitionLegal(cur)) { cur = e.to_status; applied += 1 }
      else rejected += 1
    }
    OrderStatusState(id, cur, applied, rejected)
  }

  /** Batch: final status per order after replaying its mutation log. */
  def statusSnapshot(evs: Dataset[StatusEvent], initial: String = "O"): Dataset[OrderStatusState] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.order_id)
      .mapGroups((id, it) => foldStatus(id, initial, it.toSeq))
  }

  /** Streaming twin: one OrderStatusState row of state per order, updated
    * per micro-batch, re-emitted on every change. */
  private def updateStatus(id: Long, evs: Iterator[StatusEvent],
      state: GroupState[OrderStatusState]): OrderStatusState = {
    val prev = state.getOption.getOrElse(OrderStatusState(id, "O", 0L, 0L))
    var cur = prev.status
    var applied = prev.n_applied
    var rejected = prev.n_rejected
    evs.toSeq.sortBy(_.seq).foreach { e =>
      if (transitionLegal(cur)) { cur = e.to_status; applied += 1 }
      else rejected += 1
    }
    val next = OrderStatusState(id, cur, applied, rejected)
    state.update(next)
    next
  }

  def statusStream(evs: Dataset[StatusEvent]): Dataset[OrderStatusState] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.order_id)
      .mapGroupsWithState[OrderStatusState, OrderStatusState](
        GroupStateTimeout.NoTimeout())(updateStatus)
  }
}
