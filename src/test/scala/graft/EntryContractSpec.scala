package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the correctness gate silently
  * weakens when these drift (an oracle keyed to a misspelled query name is
  * never compared — the query demotes to rows-only with no error). */
class EntryContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL keyed to no query (typo would silently drop the check): $orphans")
  }

  test("rows-only queries are the documented closed set") {
    // adding a query without an oracle is a DELIBERATE choice (inherently
    // randomized output + in-query probes); this list makes it explicit so
    // an accidentally-missing oracle fails here instead of passing silently
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "dedup_minhash", "dedup_simhash", "dedup_embedding_lsh",
      "dedup_semantic", "dedup_semantic_windowed",
      "sim_lsh_topk", "sim_ivf_topk", "sim_pq_topk", "sim_ivfpq_topk",
      "text_fingerprint", "text_bpe", "tune_params",
      "approx_distinct_users", "approx_sketch_union", "approx_heavy_hitters",
      "mm_frame_sample")
    assert((rowsOnly -- expected).isEmpty,
      s"queries missing an oracle that are not in the documented rows-only set: " +
        s"${rowsOnly -- expected}")
    assert((expected -- rowsOnly).isEmpty,
      s"documented rows-only names that are gone or now oracled: ${expected -- rowsOnly}")
  }
}
