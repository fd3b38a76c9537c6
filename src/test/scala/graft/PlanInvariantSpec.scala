package graft

/** Physical-plan invariants for the headline queries: the properties the
  * 100 TB design depends on (dims broadcast, filters pushed to the scan,
  * top-k as TakeOrderedAndProject, no nested-loop joins where an
  * equi-join is intended) are asserted so a regression fails the suite
  * rather than surfacing in a plan audit. Pinned to Spark 4.1.2 operator
  * names (the build's fixed runtime). */
class PlanInvariantSpec extends SparkSpecBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_region_revenue: every dimension hop broadcasts, nothing sort-merges") {
    val p = plan("q_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "a dim join fell back to SMJ")
  }

  test("q_user_orders: customer filter reaches the parquet scan") {
    val p = plan("q_user_orders")
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)]")
      || p.contains("EqualTo(o_custkey,42)"), s"filter not pushed:\n$p")
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_top_customers", "q_top_products", "v_cosine_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost its top-k plan")
    }
  }

  test("pairwise candidates join on keys: no nested loop in the dedup plans") {
    // tree-based: the pair-join pipeline itself must be free of nested
    // loops. (The df-capped shingle build hides ONE single-row scalar
    // broadcast inside its cached subtree — a scalar attachment, not a
    // pair join — which correctly does not appear in the join pipeline.)
    for (q <- Seq("d_minhash_lsh", "d_simhash", "d_ngram_jaccard",
        "d_ngram_jaccard_lsh", "d_embedding_neardup",
        "d_embedding_neardup_lsh", "j_range_promo")) {
      val bad = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.collect {
          case p if p.nodeName.contains("BroadcastNestedLoopJoin") ||
            p.nodeName.contains("CartesianProduct") => p.nodeName
        }
      assert(bad.isEmpty, s"$q plans $bad")
    }
  }

  test("projection pruning: q1 scans only the columns it aggregates") {
    val p = plan("q1_pricing_summary")
    // ReadSchema must not include the wide comment/address columns
    assert(!p.contains("l_comment"), s"q1 reads l_comment:\n$p")
  }
}
