package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the correctness gate silently
  * weakens when these drift (an oracle keyed to a misspelled query name is
  * never compared — the query demotes to rows-only with no error). */
class EntryContractSpec extends AnyFunSuite {

  test("tier query maps are disjoint (a cross-tier name collision would silently shadow)") {
    val tiers: Seq[(String, Map[String, _], Map[String, _])] = Seq(
      ("DP", EntryDP.queries, EntryDP.oracleSql),
      ("Dataflow", EntryDataflow.queries, EntryDataflow.oracleSql),
      ("Text", EntryText.queries, EntryText.oracleSql),
      ("Dedup", EntryDedup.queries, EntryDedup.oracleSql),
      ("Sim", EntrySim.queries, EntrySim.oracleSql),
      ("Corpus", EntryCorpus.queries, EntryCorpus.oracleSql),
      ("Stream", EntryStream.queries, EntryStream.oracleSql),
      ("Events", EntryEvents.queries, EntryEvents.oracleSql))
    assert(tiers.map(_._2.size).sum == SparkEntry.queries.size,
      "tier queries overlap: ++ dropped a shadowed entry")
    assert(tiers.map(_._3.size).sum == SparkEntry.oracleSql.size,
      "tier oracles overlap: ++ dropped a shadowed entry")
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle SQL keyed to no query (typo would silently drop the check): $orphans")
  }

  /** Per rows-only query: the in-query probe columns its output MUST carry
    * and/or the oracle-exact twin/anchor query that pins its semantics.
    * This is the self-checking contract the gate relies on for queries the
    * driver cannot hash-compare: losing a probe column (or renaming the
    * twin away) silently weakens the gate, so it fails HERE instead. */
  private val rowsOnlyContract: Map[String, (Seq[String], Option[String])] = Map(
    // FD shrink history is partition/merge-order dependent; the theorem
    // bound rides every row (bound_ok) and the no-shrink anchor is exact
    "emb_fd_sketch" -> (Seq("bound_ok", "frob_in_e6") -> Some("emb_fd_exact")),
    "dedup_minhash" -> (Seq("jaccard") -> Some("dedup_minhash_md5")),
    "dedup_simhash" -> (Seq("hamming") -> Some("dedup_simhash_md5")),
    "dedup_embedding_lsh" ->
      (Seq("n_planted_found", "n_exact_found") -> Some("dedup_embedding")),
    "dedup_semantic" ->
      (Seq("n_planted", "n_planted_caught") -> Some("dedup_semantic_exact")),
    "dedup_semantic_windowed" ->
      (Seq("n_planted", "n_planted_caught") -> Some("dedup_semantic_exact")),
    "sim_lsh_topk" -> (Seq("planted_found", "n_both", "n_exact") -> Some("sim_topk")),
    "sim_ivf_topk" -> (Seq("n_both", "n_exact") -> Some("sim_ivf_exact")),
    "sim_pq_topk" -> (Seq("planted_found", "n_both", "n_exact") -> Some("sim_topk")),
    "sim_ivfpq_topk" -> (Seq("planted_found", "n_both", "n_exact") -> Some("sim_topk")),
    "emb_kmeans" ->
      (Seq("n_total", "trained_beats_fixed") -> Some("emb_kmeans_assign")),
    "emb_pca" ->
      (Seq("probe_ortho_e9", "probe_resid_e9") -> Some("emb_covariance")),
    // NOTE: constructing this query's frame performs its real export write
    // (the exportShards write-then-read-manifest shape), so the probe-schema
    // test below pays a small sf0.001 export — same accepted cost as
    // tune_params / text_bpe construction
    // r19: the explicit-boundary twin replays the whole write/roll/
    // read-back chain from orders alone; only boundary PLACEMENT
    // (RangePartitioner sampling) stays engine-internal here
    "io_range_export" ->
      (Seq("overlap_violations", "n_total", "rows_missing")
        -> Some("io_range_export_bounds")),
    "text_fingerprint" ->
      (Seq("probe_fp_collisions", "probe_text_splits")
        -> Some("text_fingerprint_md5")),
    "text_bpe" -> (Seq("n_roundtrip_violations") -> Some("text_bpe_apply")),
    "tune_params" ->
      (Seq("probe_best_gap_vs_min", "probe_gap_vs_single") -> Some("tune_candidates")),
    "approx_distinct_users" ->
      (Seq("exact_users", "rel_err") -> Some("approx_distinct_md5")),
    "approx_sketch_union" ->
      (Seq("sum_day_exact") -> Some("approx_sketch_union_md5")),
    "approx_heavy_hitters" -> (Seq("exact_count", "abs_err") -> Some("approx_heavy_hitters_exact")),
    // (mm_frame_sample left this set in r19: codepoint quartering made
    // the sampled indices + decoded dims replay from documents.text)
    // r16: distributed Adagrad logreg training — float gradient sums are
    // partition-order dependent; the probes pin that training actually
    // LEARNS (loss improves AND accuracy beats the majority class on the
    // planted-marker fixture). r19: the anchor twin is the fixed-point
    // trainer, which replays the full featurize -> gradient -> update ->
    // eval machinery iteration-by-iteration in SQL
    "ml_train_logreg" ->
      (Seq("probe_loss_improved", "probe_beats_majority")
        -> Some("ml_train_logreg_exact")),
    // r18: the rebuild decision's inputs (share, counts) are exact and
    // ride as probes; the retrain itself is Lloyd's (sample-dependent).
    // NOTE: constructing this frame performs the real build + drifted
    // append + rebuild at sf0.001 (the io_range_export accepted cost)
    "sim_ivf_rebuild" ->
      (Seq("rebuilt", "append_share", "n_appended")
        -> Some("sim_ivf_index_append")))

  test("rows-only queries are the documented closed set") {
    // adding a query without an oracle is a DELIBERATE choice (inherently
    // randomized output + in-query probes); this list makes it explicit so
    // an accidentally-missing oracle fails here instead of passing silently
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = rowsOnlyContract.keySet
    assert((rowsOnly -- expected).isEmpty,
      s"queries missing an oracle that are not in the documented rows-only set: " +
        s"${rowsOnly -- expected}")
    assert((expected -- rowsOnly).isEmpty,
      s"documented rows-only names that are gone or now oracled: ${expected -- rowsOnly}")
  }

  test("every rows-only query still carries its probe columns and twin") {
    val spark = graft.spark.SparkTestSession.spark
    rowsOnlyContract.foreach { case (name, (probeCols, twin)) =>
      assert(probeCols.nonEmpty || twin.nonEmpty,
        s"$name: a rows-only query needs probe columns or an exact twin")
      twin.foreach { t =>
        assert(SparkEntry.oracleSql.contains(t),
          s"$name: its anchor twin $t is no longer oracle-verified")
      }
      if (probeCols.nonEmpty) {
        // builds each query's frame against the real sf0.001 tables and
        // reads the resolved schema. For most queries that is plan-only;
        // tune_params and text_bpe run their (small, sf0.001) driver-side
        // training loops as a side effect of construction — a few seconds,
        // accepted as the price of checking the REAL output schema rather
        // than a hand-maintained copy.
        val fields = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .schema.fieldNames.toSet
        val missing = probeCols.filterNot(fields)
        assert(missing.isEmpty,
          s"$name: lost in-query probe columns $missing (has $fields)")
      }
    }
  }

  test("no query output carries a top-level Array/Map/Struct column") {
    // The driver harness loads each result into pandas and sorts every
    // column before hashing; an ArrayType/MapType/StructType column makes
    // that sort throw ("unhashable numpy.ndarray") and the gate row comes
    // back `err` with NO correctness signal at all — not even the probe
    // columns get checked (r8's emb_pca). Vector-valued results must be
    // flattened before returning (posexplode to (id, j, value) rows, the
    // mm_embed/emb_pca convention). This walks the REAL resolved schema of
    // every registered query at sf0.001 so the harness's implicit scalar-
    // columns contract is machine-enforced.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val spark = graft.spark.SparkTestSession.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val complex = mk(spark, "/root/testdata/sf0.001").schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        complex
    }
    assert(offenders.isEmpty,
      s"queries returning harness-unhashable complex columns (flatten via posexplode): $offenders")
  }
}
