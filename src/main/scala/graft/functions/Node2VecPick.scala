package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** The node2vec per-step transition, as one codegen'd kernel over the
  * walker's SORTED adjacency array.
  *
  * Semantics are byte-identical to the G18b candidate-expansion form
  * (and therefore to its DuckDB oracle): scan `nbrs` in ascending
  * order, class each element return (== prev, weight wReturn), common
  * (∈ nprev, wCommon) or outward (wOut), and return the element whose
  * cumulative-weight interval [cum−w, cum) contains h mod Σw; Σw = 0
  * (a dead end under zero class weights) falls back to uniform — the
  * element at h mod n. All BIGINT arithmetic, no allocation.
  *
  * Why an expression and not the expansion join: the expansion
  * materializes |frontier|·deg candidate rows per hop and pays two
  * (start, walk)-keyed sort windows plus a (prev, dst)-keyed
  * membership shuffle over them (~88M rows/hop at sf1 — measured
  * 134.8 s). Here the frontier rows (|V|·nWalks) pick in place: the
  * common-class test is a merge-walk of the two sorted arrays
  * (both ascending ⇒ one O(deg) co-scan, no per-element search), and
  * the only per-hop shuffles are the two node-keyed adjacency joins.
  * A higher-order-function formulation would express the same scan but
  * evaluates its lambdas interpreted per element (the VecDot
  * rationale); this kernel stays inside whole-stage codegen. */
case class Node2VecPick(nbrs: Expression, nprev: Expression,
    prev: Expression, h: Expression,
    wReturn: Long, wCommon: Long, wOut: Long)
    extends QuaternaryExpression {

  override def first: Expression = nbrs
  override def second: Expression = nprev
  override def third: Expression = prev
  override def fourth: Expression = h
  override def dataType: DataType = LongType
  override def prettyName: String = "node2vec_pick"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val ns = a.asInstanceOf[ArrayData]
    val np = b.asInstanceOf[ArrayData]
    val pv = c.asInstanceOf[Long]
    val hh = d.asInstanceOf[Long]
    val n = ns.numElements()
    val m = np.numElements()
    if (n == 0) return null
    var tot = 0L
    var i = 0
    var j = 0
    while (i < n) {
      val e = ns.getLong(i)
      while (j < m && np.getLong(j) < e) j += 1
      tot += (if (e == pv) wReturn
        else if (j < m && np.getLong(j) == e) wCommon
        else wOut)
      i += 1
    }
    if (tot == 0L) ns.getLong((hh % n).toInt)
    else {
      val r = hh % tot
      var cum = 0L
      var res = ns.getLong(n - 1)
      i = 0
      j = 0
      var found = false
      while (i < n && !found) {
        val e = ns.getLong(i)
        while (j < m && np.getLong(j) < e) j += 1
        cum += (if (e == pv) wReturn
          else if (j < m && np.getLong(j) == e) wCommon
          else wOut)
        if (r < cum) { res = e; found = true }
        i += 1
      }
      res
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ns, np, pv, hh) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val tot = ctx.freshName("tot"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val w = ctx.freshName("w"); val r = ctx.freshName("r")
      val cum = ctx.freshName("cum")
      s"""
         |int $n = $ns.numElements();
         |int $m = $np.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $tot = 0L;
         |  int $j = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $e = $ns.getLong($i);
         |    while ($j < $m && $np.getLong($j) < $e) $j++;
         |    $tot += ($e == $pv) ? ${wReturn}L
         |      : ($j < $m && $np.getLong($j) == $e) ? ${wCommon}L : ${wOut}L;
         |  }
         |  if ($tot == 0L) {
         |    ${ev.value} = $ns.getLong((int)($hh % $n));
         |  } else {
         |    long $r = $hh % $tot;
         |    long $cum = 0L;
         |    ${ev.value} = $ns.getLong($n - 1);
         |    $j = 0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $e = $ns.getLong($i);
         |      while ($j < $m && $np.getLong($j) < $e) $j++;
         |      long $w = ($e == $pv) ? ${wReturn}L
         |        : ($j < $m && $np.getLong($j) == $e) ? ${wCommon}L : ${wOut}L;
         |      $cum += $w;
         |      if ($r < $cum) { ${ev.value} = $e; break; }
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(first: Expression,
      second: Expression, third: Expression, fourth: Expression): Node2VecPick =
    copy(nbrs = first, nprev = second, prev = third, h = fourth)
}
