package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{GraftFunctions, Node2VecPick}
import org.apache.spark.sql.catalyst.expressions.Literal

class Node2VecPickSpec extends SparkSpecBase {

  // independent reference: the G18b cumulative-interval contract as a
  // plain Scala fold (set-membership common test, no merge-walk)
  private def ref(nbrs: Seq[Long], nprev: Seq[Long], prev: Long, h: Long,
      wr: Long, wc: Long, wo: Long): Long = {
    val np = nprev.toSet
    def w(e: Long) = if (e == prev) wr else if (np(e)) wc else wo
    val tot = nbrs.map(w).sum
    if (tot == 0) nbrs((h % nbrs.length).toInt)
    else {
      val r = h % tot
      var cum = 0L
      nbrs.find { e => cum += w(e); r < cum }.get
    }
  }

  private val rnd = new scala.util.Random(7)
  private val rows = (1 to 300).map { _ =>
    val nbrs = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(40).toLong).distinct.sorted
    val nprev = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(40).toLong).distinct.sorted
    val prev = rnd.nextInt(40).toLong
    val h = rnd.nextInt(1 << 30).toLong
    (nbrs, nprev, prev, h)
  }

  test("node2vec_pick: codegen kernel ≡ reference fold on random sorted arrays") {
    val s = spark
    import s.implicits._
    val df = rows.toDF("nbrs", "nprev", "prev", "h")
    val got = df.select(GraftFunctions.node2vecPick(
      $"nbrs", $"nprev", $"prev", $"h", 1L, 4L, 16L)).collect().map(_.getLong(0))
    val want = rows.map { case (a, b, p, h) => ref(a, b, p, h, 1L, 4L, 16L) }
    assert(got.toSeq == want)
    // all-zero class weights: every row takes the uniform dead-end
    // fallback (h mod n over the full array)
    val g0 = df.select(GraftFunctions.node2vecPick(
      $"nbrs", $"nprev", $"prev", $"h", 0L, 0L, 0L)).collect().map(_.getLong(0))
    val w0 = rows.map { case (a, _, _, h) => a((h % a.length).toInt) }
    assert(g0.toSeq == w0)
  }

  test("node2vec_pick: interpreted eval agrees with the reference (merge-walk ≡ set test)") {
    for ((a, b, p, h) <- rows) {
      val e = Node2VecPick(Literal(1L), Literal(1L), Literal(1L), Literal(1L), 1L, 4L, 16L)
      val got = e.nullSafeEval(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray),
        p, h)
      assert(got == ref(a, b, p, h, 1L, 4L, 16L), s"nbrs=$a nprev=$b prev=$p h=$h")
    }
    // empty adjacency: null, never a division by zero
    val e = Node2VecPick(Literal(1L), Literal(1L), Literal(1L), Literal(1L), 1L, 4L, 16L)
    assert(e.nullSafeEval(new GenericArrayData(Array.empty[Long]),
      new GenericArrayData(Array(1L)), 1L, 5L) == null)
  }
}
