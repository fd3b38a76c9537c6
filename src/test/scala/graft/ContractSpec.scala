package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: a typo'd key in `oracleSql` would silently
  * demote a query to the weaker rows-only check (the driver matches by
  * key) — so the rows-only set is pinned to exactly the documented set,
  * and orphan oracles are an error. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("the rows-only set is exactly the seventeen documented non-SQL-expressible ops") {
    // r4: triangle counting (3-way join) and landmark BFS (bounded
    // recursive CTE) turned out to be SQL-expressible after all; r6:
    // pagerank and connected components followed (window-aggregation in
    // the recursive term); r7: the three deterministic LSH paths (md5-
    // derived bands/planes replay exactly in SQL, including v_lsh_ann's
    // multi-probe); r8d: v_bq_ann joined the hash-matched side (sign
    // bits are a pure function of the store). What remains is genuinely
    // seeded/approximate, stubbed, or list-stateful — sketches, trained
    // (k-means-seeded) ANN, the codec-less frame sampler, and the three
    // entries whose defining state has no scalar recursive-CTE form
    // (SemDeDup's k-means cells, BFD's open-bins vector, BPE's per-word
    // symbol lists).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set(
      "m_frame_sample",          // decode stub, no SQL analogue
      "q_approx_distinct",       // sketch; exact count + error bound specced
      "q_approx_percentiles",    // sketch; exact quantiles ride along, error specced
      "v_ivf_ann",               // ANN; recall spec vs exact top-k (k-means-seeded)
      "v_pq_ann",                // ADC is approximate; recall spec vs exact top-k
      "d_semdedup",              // k-means-seeded cell scope; planted-fixture spec
      "p_pack_bestfit",          // vector fold state; ScalaCheck reference fold
      "t_bpe_merges",            // iterative symbol-list state; reference fold spec
      "t_bpe_encode",            // applies T15's merge table; reference encode spec
      "v_pca",                   // float-fitted eigensolve; identity specs
      "s_rolling_actives_hll",   // DataSketches HLL binaries; error/merge specs
      "m_phash_dedup",           // byte-loop perceptual hash; planted-edit specs
      "v_ivfpq_ann",             // k-means + PQ-codebook seeded; degradation spec
      "g_reach_profile",         // HLL ball sketches (r13); coupon-exact + closure specs
      "g_harmonic_all",          // HyperBall centrality (r14); same sketches, per-node floats
      "v_ann_recall_family",     // k-means-seeded IVF/PQ legs (r14); full-probe ≡ exact spec
      "p_tokenize_shards")       // token-ARRAY rows (r15); reassembly-identity + packing specs
    assert(rowsOnly == documented,
      s"missing oracle: ${rowsOnly -- documented}; stale doc: ${documented -- rowsOnly}")
  }
}
