package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** similarity-search / embedding / multimodal tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntrySim {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_kmeans_assign" -> ((s, dir) => {
      // nearest-center assignment against FIXED centroids (the first 8
      // vectors): on 1024x-floor-quantized dyadic inputs every difference/
      // square/partial sum is exact, so d2 and the argmin (ties to lowest
      // cluster) replay bit-exactly in SQL — the oracle-exact anchor for
      // emb_kmeans' trained path. Bounded collect: 8 centroid rows.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val cRows = e.filter(col("vec_id") < 8).sort("vec_id")
        .select("vec_id", "emb").collect()
      val centers = cRows.map(_.getSeq[Double](1).toArray)
      // label clusters by the centroid's vec_id, not its position in the
      // collected array: the oracle labels by vec_id, and the two only
      // coincide positionally while ids happen to be dense 0-based —
      // id-labeling keeps the contract under sparse/offset id generators.
      // (centers sorted by vec_id => lowest index == lowest vec_id, so the
      // argmin tiebreak agrees with the oracle's ORDER BY d2, cluster.)
      val ids = cRows.map(_.getLong(0))
      Similarity.assignToCenters(e, "vec_id", "emb", centers)
        .select(col("id").as("vec_id"),
          element_at(typedLit(ids.toSeq), col("cluster").cast("int") + 1)
            .as("cluster"),
          col("d2"))
    }),
    "emb_kmeans" -> ((s, dir) => {
      // trained k-means topic clustering (sample-capped Lloyd's + map-only
      // assignment): per-cluster sizes and inertia. Rows-only (Lloyd's is
      // RNG-path-dependent); probes: n_total must cover the corpus, and
      // the trained clustering must beat the fixed-first-8 assignment
      // that emb_kmeans_assign verifies oracle-exactly (10 Lloyd's
      // iterations vs 0 — deterministic for fixed data+seed).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
        .localCheckpoint(false) // trained path + fixed-anchor path
      val assigned = Similarity.kmeansCluster(e, "vec_id", "emb", k = 8)
        .localCheckpoint(false) // rollup + total
      val roll = assigned.groupBy("cluster").agg(
        count(lit(1)).as("n_vecs"), sum(col("d2")).as("inertia"))
      val tot = assigned.agg(count(lit(1)).as("n_total"),
        sum(col("d2")).as("__ti"))
      val centers = e.filter(col("vec_id") < 8).sort("vec_id")
        .select("emb").collect().map(_.getSeq[Double](0).toArray)
      val fixed = Similarity.assignToCenters(e, "vec_id", "emb", centers)
        .agg(sum(col("d2")).as("__fi"))
      roll.crossJoin(broadcast(tot)).crossJoin(broadcast(fixed))
        .withColumn("trained_beats_fixed", col("__ti") <= col("__fi"))
        .select("cluster", "n_vecs", "inertia", "n_total", "trained_beats_fixed")
    }),
    "emb_centroid" -> ((s, dir) => {
      // exact per-label embedding centroid: quantized-integer partial sums
      // (order-independent => independently verifiable), one shuffle
      // carrying a long[64] per (label, task)
      Similarity.centroidByKey(
        readParquet(s, s"$dir/embeddings.parquet"), "label", "embedding")
        .select(col("key").as("label"), posexplode(col("centroid")), col("n"))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          col("col").as("c"), col("n"))
    }),
    "emb_outliers" -> ((s, dir) => {
      // semantic outlier scoring: cosine of each embedding to its label
      // centroid (broadcast join + map-only codegen cosine); per-row dot is
      // a sequential index-order sum => independently verifiable
      Similarity.centroidOutliers(
        readParquet(s, s"$dir/embeddings.parquet"), "label", "embedding",
        threshold = 0.1)
        .select(col("vec_id"), col("label"),
          col("cos_to_centroid"), col("is_outlier"))
    }),
    "sim_topk" -> ((s, dir) => {
      // brute-force cosine top-5 for the first 20 vectors against the corpus
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val queries = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("emb"))
      Similarity.bruteForceTopK(e, "vec_id", "emb", queries, "qid", "emb", k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_topk_int8" -> ((s, dir) => {
      // brute-force top-5 over the int8-QUANTIZED corpus: the 4x-smaller
      // representation is what a corpus-scale ANN keeps resident; scoring
      // dequantizes on the fly. Quantize + score are deterministic
      // arithmetic end-to-end => oracle-exact, same ranking tiebreak as
      // sim_topk (which doubles as its float-exact anchor).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
        .withColumn("qz", Similarity.quantizeInt8(col("emb")))
        .withColumn("dq", expr("transform(qz.q, q -> CAST(q AS DOUBLE) * qz.scale)"))
      val queries = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("dq"))
      Similarity.bruteForceTopK(e, "vec_id", "dq", queries, "qid", "dq", k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_hard_negatives" -> ((s, dir) => {
      // hard-negative mining (contrastive-training prep): per anchor
      // (first 20 vectors), the highest-cosine DIFFERENT-label corpus
      // vector (the hard negative) and the highest-cosine same-label
      // non-self vector (the positive). Quantized inputs => the codegen
      // cosine replays bit-exactly; ties to the highest neighbor id (the
      // single-pass max(struct) rule, mirrored in the oracle's ORDER BY).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val anchors = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("emb"), col("label"))
      Similarity.hardNegatives(e, "vec_id", "emb", "label",
        anchors, "qid", "emb", "label")
    }),
    "sim_lsh_topk" -> ((s, dir) => {
      // LSH-bucketed approximate top-k with IN-QUERY recall probes (the
      // dedup_embedding_lsh pattern): one row per query carrying
      // (a) planted_found — a near-copy of the query vector (cosine ~0.9999,
      //     id = -(qid+1); NEGATIVE ids can never collide with real vec_ids
      //     at any corpus size) planted in the corpus, 1 if the LSH top-k
      //     recovered it;
      // (b) n_both/n_exact — overlap of the LSH top-k with the exact brute-
      //     force top-k over the same corpus (per-query recall@k).
      // Hash-dependent => rows-only, but the driver's row check now sees a
      // fixed 20 rows whose counters make silent recall collapse visible;
      // SimilaritySpec keeps the aggregate >= 0.8 bound.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val planted = queries.select((-(col("qid") + lit(1L))).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + 0.02 * cos(CAST(i AS DOUBLE)))")
          .as("embedding"))
      val corpus = e.unionByName(planted)
      topkRecallProbe(
        Similarity.lshTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5, planes = 5, bands = 12),
        Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5),
        approxName = "lsh")
    }),
    "sim_projected_topk" -> ((s, dir) => {
      // two-stage ANN through the deterministic JL projection: 16-dim
      // shortlist (100 per query), exact 64-dim re-rank to top-5.
      // Deterministic matrix + id tiebreaks at both stages => the ONE
      // approximate ANN path that is oracle-exact end-to-end. Recall is
      // data-dependent: ~0.65 vs brute force on THIS weakly-clustered
      // synthetic corpus (measured; shortlist is the knob), >= 0.8 on
      // clustered data (SimilaritySpec).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val queries = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("emb"))
      Similarity.projectedTopK(e, "vec_id", "emb", queries, "qid", "emb",
          k = 5, shortlist = 100, inDim = 64, outDim = 16)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_ivfpq_topk" -> ((s, dir) => {
      // IVF-PQ (coarse cells + residual product codes, m+4 bytes/vector
      // scanned, ~nprobe/nlist of the corpus touched per query) — the
      // corpus-scale ANN capstone. Clustering+quantization-dependent =>
      // rows-only with the standard probe row per query: planted-copy
      // recovery + overlap with exact brute force.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val planted = queries.select((-(col("qid") + lit(1L))).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + (CAST(i % 3 AS DOUBLE) - 1.0D) / 256.0D)")
          .as("embedding"))
      val corpus = e.unionByName(planted)
      topkRecallProbe(
        Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5),
        Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5),
        approxName = "pq")
    }),
    "sim_pq_topk" -> ((s, dir) => {
      // product-quantization ADC top-k (m one-byte codes per vector — the
      // memory-bounded scan representation at corpus scale). Quantization-
      // distortion-dependent => rows-only, with the sim_lsh_topk probe
      // pattern: per query one row counting (a) recovery of a planted
      // near-copy (dyadic perturbation, negative id) and (b) overlap with
      // the exact brute-force top-k; SimilaritySpec pins the recall bound.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val planted = queries.select((-(col("qid") + lit(1L))).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + (CAST(i % 3 AS DOUBLE) - 1.0D) / 256.0D)")
          .as("embedding"))
      val corpus = e.unionByName(planted)
      topkRecallProbe(
        Similarity.pqTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5),
        Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5),
        approxName = "pq")
    }),
    "emb_project" -> ((s, dir) => {
      // Johnson-Lindenstrauss 64 -> 16 projection with the deterministic
      // portable +-1 matrix (md5-derived signs, dyadic 1/4 scale) — every
      // output coordinate bit-reproducible => oracle-exact. Distance
      // preservation is pinned in SimilaritySpec. Output flattened to one
      // (vec_id, idx, coord) row per coordinate — scalar columns only, the
      // dp_vector_sum convention the gate's column sort requires.
      readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
        .select(col("vec_id"),
          posexplode(Similarity.randomProject(col("emb"), inDim = 64, outDim = 16))
            .as(Seq("idx", "coord")))
        .select(col("vec_id"), col("idx").cast("long").as("idx"), col("coord"))
    }),
    "emb_quantize" -> ((s, dir) => {
      // symmetric int8 quantization per embedding (4x storage cut for ANN),
      // verified via per-vector roundtrip stats: the quantized L1 mass and
      // the max dequantization error (bounded by scale/2 by construction).
      // All-native deterministic arithmetic => oracle-exact.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("qz", Similarity.quantizeInt8(col("v")))
      e.select(col("vec_id"),
        col("qz.scale").as("scale"),
        aggregate(transform(col("qz.q"), q => abs(q.cast("long"))),
          lit(0L), (a, x) => a + x).as("q_l1"),
        aggregate(zip_with(col("v"), col("qz.q"),
            (x, q) => abs(x - q.cast("double") * col("qz.scale"))),
          lit(0.0), (a, x) => greatest(a, x)).as("max_abs_err"))
    }),
    "retrieval_metrics" -> ((s, dir) => {
      // ranking-quality evaluation (recall@k counts, MRR, nDCG) of the
      // brute-force cosine retriever against LABEL relevance (same-label
      // vectors, self excluded) — the IR-metrics layer over the retrieval
      // stack. Exact integers end-to-end: counts, 1e6 div rank, and nDCG
      // from the LITERAL discount table both engines share (no log() in
      // either plan).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("emb"), col("label").as("qlabel"))
      val results = Similarity.bruteForceTopK(e, "vec_id", "emb",
        queries, "qid", "emb", k = 10)
      val relevant = queries.select(col("qid"), col("qlabel"))
        .join(e.select(col("vec_id"), col("label")), col("qlabel") === col("label"))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))
      Retrieval.rankingMetrics(results, relevant,
        "query_id", "neighbor_id", "rank", k = 10)
    }),
    "decon_semantic" -> ((s, dir) => {
      // EMBEDDING decontamination: every corpus vector's max cosine to the
      // 20-vector eval set + the drop flag — the paraphrase-leak check the
      // string-overlap arms miss. 1024x-floor quantization keeps every
      // dot/norm replayable; max over a fixed set is order-free.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      Similarity.semanticDecontaminate(
        e, "vec_id", "emb",
        e.filter(col("vec_id") < 20), "vec_id", "emb",
        threshold = 0.9)
    }),
    "sim_ivf_exact" -> ((s, dir) => {
      // IVF with nprobe == nlist probes EVERY cell, so candidates = the full
      // corpus per query and the result is provably identical to brute
      // force — while still driving the entire IVF machinery (sampled
      // training, Lloyd's quantizer, cell assignment, probed cell join,
      // bounded-heap top-k). The oracle-verified anchor for sim_ivf_topk;
      // same SQL oracle as sim_topk.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val queries = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("emb"))
      Similarity.ivfTopK(e, "vec_id", "emb", queries, "qid", "emb",
        k = 5, nlist = 16, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_ivf_index" -> ((s, dir) => {
      // the PERSISTED index path: build (train + assign + write
      // cell-partitioned postings) into per-process scratch, reload,
      // probe ALL cells — provably brute force, same oracle as
      // sim_ivf_exact, but the scores now round-trip through parquet and
      // the probed scan reads partition-pruned files. The build-once /
      // query-many production layout inside the gate.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val idx = scratchDir("sim_ivf_index")
      Similarity.buildIvfIndex(e, "vec_id", "emb", idx, nlist = 16)
      val queries = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("emb"))
      Similarity.ivfTopKFromIndex(s, idx, queries, "qid", "emb",
        k = 5, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_ivf_index_append" -> ((s, dir) => {
      // INCREMENTAL index maintenance (r17): build the index on the
      // even-id HALF of the corpus, APPEND the odd-id half (assignment
      // under the FROZEN centroids, new parquet files only — cost
      // proportional to the increment), then probe ALL cells — the
      // all-cells probe over the appended index is provably brute force
      // over the UNION, so the oracle is the same brute-force SQL as
      // sim_ivf_index. The append ∪ build ≡ same-centroid-rebuild
      // identity and the drift report are spec-pinned.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val idx = scratchDir("sim_ivf_index_append")
      Similarity.buildIvfIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "emb", idx, nlist = 16)
      Similarity.appendIvfIndex(e.filter(col("vec_id") % 2 === 1),
        "vec_id", "emb", idx).collect() // the report drives the write
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("emb"))
      Similarity.ivfTopKFromIndex(s, idx, queries, "qid", "emb",
        k = 5, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_ivf_rebuild" -> ((s, dir) => {
      // DRIFT-TRIGGERED REBUILD (r18 — the maintenance loop that
      // CONSUMES the append drift report): index built on the even-id
      // half, then the odd half appends SHIFTED +0.5 per dim — planted
      // distribution drift, so the appended rows' pooled cosine to the
      // frozen centroids sags AND the append share (~0.5) crosses the
      // 0.25 ceiling; the decision must come back rebuilt = true and
      // the index retrains over the union in place. Lloyd's retrain is
      // sample-dependent => rows-only; the probe columns pin the
      // decision inputs (rebuilt, append_share, n_appended) and recall
      // recovery on planted drift is spec-pinned in SimilaritySpec.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> CAST(x AS DOUBLE))"))
      val idx = scratchDir("sim_ivf_rebuild")
      Similarity.buildIvfIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "emb", idx, nlist = 16)
      val report = Similarity.appendIvfIndex(
        e.filter(col("vec_id") % 2 === 1)
          .withColumn("emb", expr("transform(emb, x -> x + 0.5)")),
        "vec_id", "emb", idx).localCheckpoint(false)
      Similarity.rebuildIvfIndexIfDrifted(s, idx, report,
        meanCosFloor = 0.75, appendShareCeil = 0.25, nlist = 16)
    }),
    "sim_ivf_index_query" -> ((s, dir) => {
      // the AMORTIZED read path of the persisted index: the build (train +
      // assign + write) runs ONCE per (process, sf dir) via the memoized
      // fixture below, so bench reps measure ONLY what a production query
      // pays — centroid reload, probe, partition-pruned postings scan,
      // re-rank. All-cells probe keeps it provably brute force (same
      // oracle); sim_ivf_index remains the build-cost row.
      val idx = prebuiltIvfIndex(s, dir)
      val queries = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
        .filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("emb"))
      Similarity.ivfTopKFromIndex(s, idx, queries, "qid", "emb",
        k = 5, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))
    }),
    "sim_ivf_topk" -> ((s, dir) => {
      // IVF approximate top-k: k-means cells + probed-cell exact re-rank.
      // Clustering-dependent output => rows-only; SimilaritySpec measures
      // recall >= 0.8 against brute force on clustered data. nlist/nprobe
      // auto-size inside ivfTopK from the corpus count its sampling step
      // already takes (sqrt(corpus), clamped) — no extra driver job here.
      // IN-QUERY PROBES (the sim_lsh_topk pattern): every result row
      // carries its query's recall counters vs the exact brute-force
      // top-k over the same corpus — n_both (overlap) and n_exact — so
      // the driver's row check sees silent recall collapse.
      val e = readParquet(s, s"$dir/embeddings.parquet")
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5)
        .localCheckpoint(false) // consumed by the recall agg + the row join
      val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
          queries, "qid", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__in_exact"))
      val recall = ivf
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__in_ivf"))
        .join(exact, Seq("query_id", "neighbor_id"), "full_outer")
        .groupBy("query_id")
        .agg(sum(when(col("__in_exact").isNotNull &&
            col("__in_ivf").isNotNull, 1L).otherwise(0L)).as("n_both"),
          sum(coalesce(col("__in_exact"), lit(0L))).as("n_exact"))
      ivf.join(broadcast(recall), Seq("query_id"))
    }),
    "emb_pca" -> ((s, dir) => {
      // learned projection: top-8 principal components from the
      // oracle-exact integer covariance moments (emb_covariance is the
      // anchor twin), deterministic Jacobi eigensolve, map-only
      // projection of the quantized vectors. Float eigenvectors =>
      // rows-only; every row carries probe_ortho_e9 (max |W^T W - I| in
      // 1e-9 units) and probe_resid_e9 (eigen-residual vs the untouched
      // covariance — fails loud if the Jacobi solve is broken).
      // The array-valued `pc` is posexploded to flat (id, j, pc_j) rows —
      // the driver harness sorts/hashes scalar columns only (mm_embed
      // sets the same convention for its feature_vec). posexplode_OUTER,
      // deliberately: plain posexplode triggers InferFiltersFromGenerate,
      // which clones the entire projection-UDF + quantize expression into
      // an inferred size()>0 && isnotnull() filter — tripling the per-row
      // cost (measured 1.7 -> 2.9 s isolated). pc is total (fixed k, no
      // nulls), so outer generates identical rows without the filter.
      Similarity.pcaProject(
          readParquet(s, s"$dir/embeddings.parquet"), "vec_id", "embedding", k = 8)
        .select(col("id"), posexplode_outer(col("pc")).as(Seq("j", "pc_j")),
          col("probe_ortho_e9"), col("probe_resid_e9"))
        .select(col("id"), col("j").cast("int").as("j"), col("pc_j"),
          col("probe_ortho_e9"), col("probe_resid_e9"))
    }),
    "mm_features" -> ((s, dir) => {
      // multimodal payload plumbing: text bytes as the opaque binary payload
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("media", col("text").cast("binary"))
      docs.select(col("doc_id"), Multimodal.payloadFeatures(col("media")).as("f"))
        .select(col("doc_id"), col("f.n_bytes").as("n_bytes"), col("f.sha256").as("sha256"))
    }),
    "mm_embed" -> ((s, dir) => {
      // model feature extraction END-TO-END: each embedding's int8
      // quantization is the opaque binary payload (the bytes a feature
      // store holds), pushed through the real batched mapPartitions
      // inference boundary — weights materialize once per partition, rows
      // flow in batches — where the "model" is the fixed-weight integer
      // network (sum-pool + the portable +-1 linear layer). All-integer
      // forward pass => every feature coordinate hashes exactly against
      // the oracle's replay of the same linear algebra.
      val toBytes = udf((q: Seq[Byte]) => q.toArray)
      val payload = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          toBytes(Similarity.quantizeInt8(col("embedding")).getField("q"))
            .as("media"))
      Multimodal.extractFeaturesBatched(payload, "media", inDim = 64, outDim = 8)
        .select(col("vec_id"),
          posexplode(col("feature_vec")).as(Seq("j", "feature")))
        .select(col("vec_id"), col("j").cast("int").as("j"), col("feature"))
    }),
    "mm_frame_sample" -> ((s, dir) => {
      // video-shaped frame sampling: each doc becomes a 4-frame GFTV
      // container of real PNGs (frame i = PNG of the i-th codepoint
      // quarter of the text), 2 evenly-spaced frames are sampled (only
      // those bytes materialize) and REAL-decoded with ImageIO. ORACLE-
      // EXACT (r19): quartering by CODEPOINTS matches DuckDB substr
      // semantics, so the sampled index set ({0, 2} of 4), each frame's
      // text length, and hence the decoded PNG dimensions (the
      // mm_decode_resize construction formula) all replay from
      // documents.text alone — the decoded dims coming back from the
      // real container-parse + PNG decode must equal the construction
      // arithmetic. Luminance roundtrip stays pinned in MultimodalSpec
      // (pixel bytes are not economically SQL-replayable).
      val mkVideo = udf((text: String) => {
        val t = if (text == null) "" else text
        val cps = t.codePointCount(0, t.length)
        val q = math.max(cps / 4, 1)
        val frames = (0 until 4).map { i =>
          val a = math.min(i * q, cps)
          val b = math.min((i + 1) * q, cps)
          Multimodal.syntheticPng(t.substring(
            t.offsetByCodePoints(0, a), t.offsetByCodePoints(0, b)))
        }
        Multimodal.syntheticVideo(frames)
      })
      // The probe columns (all must be 0, oracle constants):
      //   probe_idx_unexpected — 1 if this frame_idx is NOT in the sampled-
      //     index set computed INDEPENDENTLY by the Column-expression
      //     formula sampleFrameIndices (two implementations of the
      //     evenly-spaced rule cross-check each other);
      //   probe_missing_frames — per-doc gap between expected sampled-index
      //     count and rows that actually materialized;
      //   probe_decode_failed — 1 if the PNG decode returned null;
      //   probe_docs_lost — count of corpus docs with ZERO surviving
      //     sampled rows (total per-doc loss would otherwise be invisible;
      //     rides every row via a broadcast one-row crossJoin).
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), mkVideo(col("text")).as("media"))
      val sampled = Multimodal.sampleFrames(docs, "media", n = 2)
        .localCheckpoint(false) // consumed by the rows + the lost-docs probe
      val perDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val lost = docs.join(sampled.select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("probe_docs_lost"))
      Multimodal.decodeImage(sampled, "frame")
        .withColumn("__want", Multimodal.sampleFrameIndices(col("n_frames"), 2))
        .select(col("doc_id"), col("frame_idx"), col("n_frames").cast("long").as("n_frames"),
          col("decoded.width").as("width"), col("decoded.height").as("height"),
          when(!array_contains(col("__want"), col("frame_idx")), 1L).otherwise(0L)
            .as("probe_idx_unexpected"),
          (size(col("__want")).cast("long") - count(lit(1)).over(perDoc))
            .as("probe_missing_frames"),
          when(col("decoded").isNull, 1L).otherwise(0L).as("probe_decode_failed"))
        .crossJoin(broadcast(lost))
    }),
    "mm_phash_neardup" -> ((s, dir) => {
      // IMAGE near-dup via perceptual hash (the multimodal dedup arm):
      // ASCII-projected text renders to a REAL PNG, ImageIO decodes it,
      // the 8x8 nearest-pixel average-hash fingerprints it, and an
      // 8-band Hamming bucket join releases pairs at distance <= 7
      // (pigeonhole-exact recall at that radius). The whole derivation —
      // projection, dims, grid pixels, integer luminances, bits, bands,
      // Hamming — replays in SQL because the grid sample is nearest-
      // pixel integer arithmetic over the deterministic payload (the
      // mm_decode_resize construction convention); the DECODE itself
      // runs for real through ImageIO. The rendered payload is the
      // 64-char CANONICAL PREFIX of the ASCII projection (the thumbnail
      // stand-in: near-dup docs share their opening, so their rendered
      // covers match — byte-tiling the WHOLE text would amplify any
      // token edit into Hamming >> radius); projections shorter than 16
      // chars are excluded (an effectively-empty image has no
      // perceptual content — every one would alias to the same uniform
      // fingerprint).
      val toPng = udf((t: String) => Multimodal.syntheticPng(t))
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 64)
            .as("c"))
        .filter(length(col("c")) >= 16)
        .withColumn("media", toPng(col("c")))
      val hashed = Multimodal.imageAHash(docs, "media")
        .filter(col("phash").isNotNull)
      Multimodal.phashNearDupPairs(hashed, "doc_id", "phash",
        maxHamming = 7, bands = 8)
    }),
    "mm_decode_resize" -> ((s, dir) => {
      // REAL image pipeline: synthesize a PNG per document (dims derived
      // from the text length), decode it with ImageIO, plan the resize.
      // The decoded dimensions equal the construction formula, so the whole
      // encode->decode->plan roundtrip is oracle-exact.
      val toPng = udf((text: String) => Multimodal.syntheticPng(text))
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).withColumn("media", toPng(col("text")))
      val decoded = Multimodal.decodeImage(docs, "media")
      decoded.select(col("doc_id"),
        col("decoded.width").as("width"), col("decoded.height").as("height"),
        Multimodal.resizePlan(col("decoded"), 8).as("p"))
        .select(col("doc_id"), col("width"), col("height"),
          col("p.target_width").as("target_width"),
          col("p.target_height").as("target_height"))
    }),
    "mm_audio_decode" -> ((s, dir) => {
      // REAL audio decode: synthesize an 8-bit mono WAV per document (one
      // frame per UTF-8 byte), parse it back via javax.sound. Frame count
      // equals the byte length => oracle-exact.
      val toWav = udf((text: String) => Multimodal.syntheticWav(text))
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).withColumn("media", toWav(col("text")))
      Multimodal.decodeAudio(docs, "media")
        .select(col("doc_id"),
          col("decoded_audio.sample_rate").as("sample_rate"),
          col("decoded_audio.channels").as("channels"),
          col("decoded_audio.n_frames").as("n_frames"),
          round(col("decoded_audio.duration_seconds"), 9).as("duration_seconds"))
    }),
    "emb_fd_exact" -> ((s, dir) => {
      // FREQUENT DIRECTIONS, the oracle-exact NO-SHRINK anchor (r15):
      // with at most ell input vectors the buffer never shrinks and the
      // sketch IS the input set (lexicographically sorted rows) — the
      // whole aggregate path (insert, merge across partitions, canonical
      // finish) runs for real and must reproduce the quantized inputs
      // bit-for-bit. 100 vectors, ell = 128.
      graft.ops.Sketches.frequentDirections(
        readParquet(s, s"$dir/embeddings.parquet")
          .filter(col("vec_id") < 100)
          .withColumn("emb",
            expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)")),
        "emb", ell = 128)
    }),
    "emb_fd_sketch" -> ((s, dir) => {
      // the SHRINK regime (rows-only by design: sketch values depend on
      // the partition/merge order) with the FD theorem checked IN-QUERY:
      // bound_ok = (delta_sum <= frob_in / ell) rides every row, and the
      // oracle-exact anchor twin is emb_fd_exact + the exact-moment
      // relative emb_covariance. ell = 8 over the full embeddings table
      // => many shrinks, mergeable partials across all tasks.
      graft.ops.Sketches.frequentDirections(
        readParquet(s, s"$dir/embeddings.parquet")
          .withColumn("emb",
            expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)")),
        "emb", ell = 8)
    }),
    "emb_covariance" -> ((s, dir) => {
      // whitening/PCA prep: the exact upper-triangle covariance moments of
      // the int8-quantized embedding coordinates — one pass, one mergeable
      // integer state (d + d(d+1)/2 longs) per task, pair rows generated
      // from the single result row. Integer moments over the deterministic
      // quantization are what make a covariance matrix hash-verifiable.
      Similarity.covarianceMoments(
        readParquet(s, s"$dir/embeddings.parquet"), "embedding")
    }),
    "sim_bm25_topk" -> ((s, dir) => {
      // Okapi BM25 lexical top-5 (exact integer arithmetic: log2-floor
      // IDF, one scaled integral division for the k1=1.2/b=0.75 tf
      // factor — cross-engine exact). Query fixture: vocabulary df-ranks
      // 10..29, 4 terms per query => 5 queries of mid/high-df terms, so
      // every query matches many docs and the dl normalization and the
      // idf=0 saturation arm (terms in more than half the corpus) both
      // run for real.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "text")
      Retrieval.bm25TopK(docs, "doc_id", "text",
        bm25QueryFixture(docs), "query_id", "term", k = 5)
    }),
    "sim_rrf_fusion" -> ((s, dir) => {
      // hybrid retrieval: the BM25 lexical top-20 and the dense cosine
      // top-20 (query vector = the anchor embedding with vec_id ==
      // query_id) fused by integerized reciprocal-rank fusion. The two
      // arms rank the same 0-based id space (doc_id == vec_id in the
      // fixtures); fusion semantics — multi-list membership outranking
      // single-list rows, score-tie item-id tiebreak — are what is under
      // test, and both arms are independently oracle-anchored
      // (sim_bm25_topk, sim_topk).
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "text")
      val lex = Retrieval.bm25TopK(docs, "doc_id", "text",
        bm25QueryFixture(docs), "query_id", "term", k = 20)
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val qv = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb"))
      val dense = Similarity.bruteForceTopK(e, "vec_id", "emb",
        qv, "qid", "emb", k = 20)
      Retrieval.rrfFuse(Seq(
        lex.select(col("query_id"), col("doc_id").as("item_id"), col("rk")),
        dense.select(col("query_id"), col("neighbor_id").as("item_id"),
          col("rank").as("rk"))),
        "query_id", "item_id", "rk", k = 10)
    })
  )

  /** Query-term fixture for the BM25/fusion gate rows: vocabulary
    * df-ranks 10..29 (ties by term asc), 4 terms per query. The global
    * row_number over the vocabulary is FIXTURE construction (bounded by
    * the corpus vocabulary; single-partition window), not part of the
    * operator — real callers bring their own query frame. */
  /** Build-once IVF index per (process, sf dir): the first call pays the
    * build (train + assign + cell-partitioned postings write), every later
    * call — including bench reps 2..n of sim_ivf_index_query — reuses the
    * directory, so that row's MEDIAN is the amortized production read path
    * (probe + re-rank), not the build. sim_ivf_index deliberately keeps
    * rebuilding per call: it is the build-cost row. */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def prebuiltIvfIndex(s: SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent(dir, _ => {
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .withColumn("emb", expr(
          "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      // key the scratch by the full SANITIZED dir (not a hash, which could
      // collide and silently cross-wire two dirs' indexes via the cache)
      val idx = scratchDir(
        "sim_ivf_prebuilt_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      Similarity.buildIvfIndex(e, "vec_id", "emb", idx, nlist = 16)
      idx
    })

  private def bm25QueryFixture(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dfreq").desc, col("term").asc)
    dfreq.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") >= 10 && col("r") < 30)
      .select(expr("CAST((r - 10) div 4 AS BIGINT)").as("query_id"),
        col("term"))
      // bm25TopK references the query frame twice (term semi-join +
      // query_id attach); without a checkpoint the full-corpus df
      // aggregation behind this fixture would run twice
      .localCheckpoint(false)
  }

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    Map(
      // sign = low bit of the 60-bit md5 value of "i:j" (i row 0-based,
      // j out-dim 0-based); * 0.25 AFTER the index-ascending sum. Flattened
      // to one row per coordinate (unnest + generate_subscripts), mirroring
      // the engine's posexplode.
      "emb_project" ->
        """WITH p AS (
             SELECT vec_id,
                    list_transform(range(0, 16), j ->
                      list_sum(list_transform(range(0, 64), i ->
                        emb[i + 1] *
                        (CASE WHEN CAST(CONCAT('0x', substr(md5(
                                  CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))
                                AS BIGINT) % 2 = 1
                              THEN 1.0 ELSE -1.0 END))) * 0.25) AS proj
             FROM (SELECT vec_id,
                          list_transform(embedding,
                            x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
                   FROM embeddings))
           SELECT vec_id, CAST(gs - 1 AS BIGINT) AS idx, c AS coord
           FROM (SELECT vec_id, unnest(proj) AS c,
                        generate_subscripts(proj, 1) AS gs
                 FROM p)""",
      // two-stage: row_number over projected cosine (same tiebreak as the
      // bounded-heap aggregate), then exact re-rank of the shortlist
      "sim_projected_topk" ->
        """WITH e AS (
             SELECT vec_id,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings),
           p AS (
             SELECT vec_id, emb,
                    list_transform(range(0, 16), j ->
                      list_sum(list_transform(range(0, 64), i ->
                        emb[i + 1] *
                        (CASE WHEN CAST(CONCAT('0x', substr(md5(
                                  CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))
                                AS BIGINT) % 2 = 1
                              THEN 1.0 ELSE -1.0 END))) * 0.25) AS proj
             FROM e),
           s1 AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    CASE WHEN sqrt(list_sum(list_transform(q.proj, x -> x * x))) = 0
                           OR sqrt(list_sum(list_transform(c.proj, x -> x * x))) = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 17), i -> q.proj[i] * c.proj[i]))
                              / (sqrt(list_sum(list_transform(q.proj, x -> x * x)))
                                 * sqrt(list_sum(list_transform(c.proj, x -> x * x))))
                    END AS pcos
             FROM p q CROSS JOIN p c WHERE q.vec_id < 20),
           short AS (
             SELECT query_id, neighbor_id FROM s1
             QUALIFY row_number() OVER (PARTITION BY query_id
                       ORDER BY pcos DESC, neighbor_id) <= 100),
           r AS (
             SELECT s.query_id, s.neighbor_id,
                    CASE WHEN sqrt(list_sum(list_transform(q.emb, x -> x * x))) = 0
                           OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
                              / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                                 * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                    END AS cosine
             FROM short s
             JOIN e q ON q.vec_id = s.query_id
             JOIN e c ON c.vec_id = s.neighbor_id)
           SELECT query_id, neighbor_id, cosine,
                  CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
           FROM r
           QUALIFY rank <= 5""",
      "sim_topk" -> bruteTopKSql,
      // hard-negative triplets: the brute scored frame restricted per
      // side (different-label / same-label-non-self), best per
      // (anchor, side) with ties to the HIGHEST neighbor id
      "sim_hard_negatives" ->
        """WITH e AS (
             SELECT vec_id, label,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings),
           scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    CASE WHEN c.label = q.label AND c.vec_id != q.vec_id
                         THEN 'positive'
                         WHEN c.label != q.label THEN 'negative' END AS side,
                    CASE WHEN sqrt(list_sum(list_transform(q.emb, x -> x * x))) = 0
                           OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
                              / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                                 * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                    END AS cosine
             FROM e q CROSS JOIN e c WHERE q.vec_id < 20)
           SELECT query_id, side, neighbor_id, cosine
           FROM scored
           WHERE side IS NOT NULL
           QUALIFY row_number() OVER (PARTITION BY query_id, side
                     ORDER BY cosine DESC, neighbor_id DESC) = 1""",
      "sim_bm25_topk" -> bm25SqlFor(5),
      // both arms generated from the same fragment builders their anchor
      // queries use (bm25SqlFor, bruteTopKSqlFor) — the arms cannot drift
      // from sim_bm25_topk / sim_topk; fusion is the integerized
      // reciprocal-rank sum floor(1e6/(60+rank)) with (score desc,
      // item_id asc) final ranking
      "sim_rrf_fusion" ->
        s"""WITH bm AS (SELECT * FROM (${bm25SqlFor(20)}) __bm),
           cs AS (SELECT * FROM (${bruteTopKSqlFor(maxQid = 5, k = 20)}) __cs),
           u AS (
             SELECT query_id, doc_id AS item_id, rk FROM bm
             UNION ALL
             SELECT query_id, neighbor_id AS item_id, rank AS rk FROM cs),
           a AS (
             SELECT query_id, item_id,
                    CAST(sum(1000000 // (60 + rk)) AS BIGINT) AS rrf_score,
                    CAST(count(*) AS BIGINT) AS n_lists,
                    CAST(min(rk) AS BIGINT) AS best_rank
             FROM u GROUP BY query_id, item_id)
           SELECT query_id, item_id, rrf_score, n_lists, best_rank,
                  CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY rrf_score DESC, item_id ASC) AS BIGINT) AS rk
           FROM a QUALIFY rk <= 10""",
      // the same brute-force ranking over the int8-quantized-then-
      // dequantized corpus (quantization replicated from emb_quantize)
      "sim_topk_int8" ->
        """WITH e0 AS (
             SELECT vec_id,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings),
           s AS (
             SELECT vec_id, emb,
                    CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 1.0
                         ELSE list_max(list_transform(emb, x -> abs(x))) / 127.0
                    END AS scale
             FROM e0),
           e AS (
             SELECT vec_id,
                    list_transform(emb, x ->
                      least(greatest(round(x / scale), -127.0), 127.0) * scale) AS emb
             FROM s),
           scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    CASE WHEN sqrt(list_sum(list_transform(q.emb, x -> x * x))) = 0
                           OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
                              / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                                 * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                    END AS cosine
             FROM e q CROSS JOIN e c WHERE q.vec_id < 20)
           SELECT query_id, neighbor_id, cosine,
                  CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored
           QUALIFY rank <= 5""",
      // exact centroid: the same floor(x*1000) integer quantization summed
      // per (label, dimension), one double division at the end
      // cosine to centroid: dot and norms accumulate index-ascending from
      // +0.0 exactly like the CosineSim loop, so the floats agree bit-wise
      "emb_outliers" ->
        """WITH x AS (
             SELECT label, u.i,
                    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
             FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) u(i)),
           cent AS (
             SELECT label, i, CAST(sum(q) AS DOUBLE) / (count(*) * 1000.0) AS c
             FROM x GROUP BY label, i),
           cl AS (SELECT label, list(c ORDER BY i) AS cent FROM cent GROUP BY label),
           j AS (
             SELECT e.vec_id, e.label,
                    list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS v, cl.cent
             FROM embeddings e JOIN cl USING (label)),
           sc AS (
             SELECT vec_id, label,
                    list_sum(list_transform(range(1, len(v) + 1),
                      i -> v[i] * cent[i])) AS d,
                    sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
                    sqrt(list_sum(list_transform(cent, x -> x * x))) AS nb
             FROM j)
           SELECT vec_id, label,
                  CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE d / (na * nb) END
                    AS cos_to_centroid,
                  (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE d / (na * nb) END) < 0.1
                    AS is_outlier
           FROM sc""",
      "emb_centroid" ->
        """WITH x AS (
             SELECT label, u.i,
                    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
             FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) u(i))
           SELECT label, CAST(i AS BIGINT) AS dim,
                  CAST(sum(q) AS DOUBLE) / (count(*) * 1000.0) AS c,
                  CAST(count(*) AS BIGINT) AS n
           FROM x GROUP BY label, i""",
      "sim_ivf_exact" -> bruteTopKSql,
      // the metric layer replayed: brute top-10 (the shared fragment),
      // label relevance, the SAME literal discount/idcg tables (generated
      // from Retrieval.ndcgDiscounts — the shared-constants convention)
      "retrieval_metrics" -> {
        val disc = graft.ops.Retrieval.ndcgDiscounts(10)
        val idcg = disc.scanLeft(0L)(_ + _).tail
        s"""WITH res AS (${bruteTopKSqlFor(maxQid = 20, k = 10)}),
            rel AS (
              SELECT q.vec_id AS query_id, c.vec_id AS item_id
              FROM embeddings q JOIN embeddings c ON q.label = c.label
              WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
            rc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
                   FROM rel GROUP BY 1),
            hits AS (
              SELECT res.query_id,
                     CAST(count(*) AS BIGINT) AS n_found_at_k,
                     min(res.rank) AS first_rk,
                     CAST(sum(([${disc.mkString(",")}])[res.rank]) AS BIGINT) AS dcg
              FROM res JOIN rel
                ON rel.query_id = res.query_id AND rel.item_id = res.neighbor_id
              GROUP BY 1)
            SELECT rc.query_id, rc.n_relevant,
                   CAST(coalesce(hits.n_found_at_k, 0) AS BIGINT) AS n_found_at_k,
                   CAST(coalesce(1000000 // hits.first_rk, 0) AS BIGINT) AS mrr_ppm,
                   CAST(coalesce(1000000 * hits.dcg //
                     ([${idcg.mkString(",")}])[least(rc.n_relevant, 10)], 0)
                     AS BIGINT) AS ndcg_ppm
            FROM rc LEFT JOIN hits ON hits.query_id = rc.query_id"""
      },
      // per-corpus-vector max cosine over the eval subset + the flag
      "decon_semantic" ->
        """WITH e AS (
             SELECT vec_id,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings),
           scored AS (
             SELECT c.vec_id AS doc_id,
                    CASE WHEN sqrt(list_sum(list_transform(q.emb, x -> x * x))) = 0
                           OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
                              / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                                 * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                    END AS cosine
             FROM e c CROSS JOIN e q WHERE q.vec_id < 20)
           SELECT doc_id, max(cosine) AS max_eval_cosine,
                  max(cosine) >= 0.9 AS contaminated
           FROM scored GROUP BY doc_id""",
      // all-cells probe over the persisted index == brute force
      "sim_ivf_index" -> bruteTopKSql,
      // all-cells probe over the appended (build-half + append-half)
      // index == brute force over the union == the full corpus
      "sim_ivf_index_append" -> bruteTopKSql,
      // same pipeline over the PREBUILT index (read path only) == brute force
      "sim_ivf_index_query" -> bruteTopKSql,
      // fixed-centroid nearest-center assignment: dyadic-exact d2, argmin
      // ties to the lowest cluster id — emb_kmeans' oracle anchor
      "emb_kmeans_assign" ->
        """WITH e AS (
             SELECT vec_id,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings),
           c AS (SELECT vec_id AS cluster, emb AS cemb FROM e WHERE vec_id < 8),
           d AS (
             SELECT e.vec_id, c.cluster,
                    list_sum(list_transform(range(1, len(e.emb) + 1),
                      i -> (e.emb[i] - c.cemb[i]) * (e.emb[i] - c.cemb[i]))) AS d2
             FROM e, c),
           r AS (
             SELECT vec_id, cluster, d2,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
             FROM d)
           SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, d2
           FROM r WHERE rk = 1""",
      "emb_quantize" ->
        """WITH q AS (
             SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
           s AS (
             SELECT vec_id, v,
                    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                         THEN 1.0
                         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
                    END AS scale
             FROM q),
           z AS (
             SELECT vec_id, scale, v,
                    list_transform(v, x ->
                      least(greatest(round(x / scale), -127.0), 127.0)) AS qd
             FROM s)
           SELECT vec_id, scale,
                  CAST(list_sum(list_transform(qd, t -> abs(CAST(t AS BIGINT)))) AS BIGINT) AS q_l1,
                  list_max(list_transform(range(1, len(v) + 1),
                    i -> abs(v[i] - qd[i] * scale))) AS max_abs_err
           FROM z""",
      // the aHash derivation replayed end-to-end: ASCII projection, the
      // syntheticPng dims/pixel formula, nearest-pixel 8x8 grid, integer
      // luminance, above-average bits, 8-bit band buckets, exact Hamming
      "mm_phash_neardup" ->
        """WITH d AS (
             SELECT doc_id,
                    substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64) AS c
             FROM documents),
           e AS (
             SELECT doc_id, c, CAST(length(c) AS BIGINT) AS len
             FROM d WHERE length(c) >= 16),
           dims AS (
             SELECT doc_id, c, len, 4 + len % 13 AS w, 4 + (len // 13) % 11 AS h
             FROM e),
           cells AS (
             SELECT doc_id, g.k,
                    ascii(substr(c,
                      CAST((((g.k // 8) * h // 8) * w
                            + ((g.k % 8) * w // 8)) % len AS INT) + 1,
                      1)) AS v
             FROM dims, (SELECT unnest(range(0, 64)) AS k) g),
           lums AS (
             SELECT doc_id, k,
                    299 * v + 587 * (255 - v) + 114 * ((v * 7) % 256) AS lum
             FROM cells),
           bits AS (
             SELECT doc_id, k,
                    CASE WHEN lum * 64 > sum(lum) OVER (PARTITION BY doc_id)
                         THEN '1' ELSE '0' END AS b
             FROM lums),
           ph AS (
             SELECT doc_id, string_agg(b, '' ORDER BY k) AS phash
             FROM bits GROUP BY 1),
           banded AS (
             SELECT doc_id, bd.b AS band,
                    substr(phash, CAST(bd.b * 8 + 1 AS INT), 8) AS bucket
             FROM ph, (SELECT unnest(range(0, 8)) AS b) bd),
           cand AS (
             SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id),
           pairs AS (
             SELECT c.id_a, c.id_b,
                    CAST(list_sum(list_transform(range(1, 65),
                      i -> CASE WHEN substr(pa.phash, CAST(i AS INT), 1)
                                  != substr(pb.phash, CAST(i AS INT), 1)
                                THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
             FROM cand c
             JOIN ph pa ON pa.doc_id = c.id_a
             JOIN ph pb ON pb.doc_id = c.id_b)
           SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 7""",
      "mm_decode_resize" ->
        """WITH d AS (
             SELECT doc_id,
                    CAST(4 + len(text) % 13 AS INT) AS width,
                    CAST(4 + (len(text) // 13) % 11 AS INT) AS height
             FROM documents)
           SELECT doc_id, width, height,
             CAST(round(width * least(1.0, 8.0 / greatest(width, height))) AS INT) AS target_width,
             CAST(round(height * least(1.0, 8.0 / greatest(width, height))) AS INT) AS target_height
           FROM d""",
      "mm_frame_sample" ->
        """WITH d AS (
             SELECT doc_id, coalesce(text, '') AS t,
                    greatest(len(coalesce(text, '')) // 4, 1) AS q,
                    len(coalesce(text, '')) AS n
             FROM documents),
           f AS (
             SELECT doc_id,
                    CAST(i AS BIGINT) AS frame_idx,
                    least((i + 1) * q, n) - least(i * q, n) AS flen
             FROM d, (SELECT unnest([0, 2]) AS i))
           SELECT doc_id, frame_idx, CAST(4 AS BIGINT) AS n_frames,
                  CAST(4 + flen % 13 AS INT) AS width,
                  CAST(4 + (flen // 13) % 11 AS INT) AS height,
                  CAST(0 AS BIGINT) AS probe_idx_unexpected,
                  CAST(0 AS BIGINT) AS probe_missing_frames,
                  CAST(0 AS BIGINT) AS probe_decode_failed,
                  CAST(0 AS BIGINT) AS probe_docs_lost
           FROM f""",
      "mm_audio_decode" ->
        """SELECT doc_id, 16000.0 AS sample_rate, 1 AS channels,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
              round(CAST(octet_length(encode(text)) AS DOUBLE) / 16000.0, 9) AS duration_seconds
           FROM documents""",
      "mm_features" ->
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              sha256(text) AS sha256
           FROM documents""",
      "mm_embed" ->
        """WITH q AS (
             SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
           s AS (
             SELECT vec_id, v,
                    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                         THEN 1.0
                         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
                    END AS scale
             FROM q),
           z AS (
             SELECT vec_id,
                    list_transform(v, x -> CAST(least(greatest(round(x / scale),
                      -127.0), 127.0) AS BIGINT)) AS qd
             FROM s),
           e AS (SELECT vec_id, i, qd[CAST(i + 1 AS INT)] AS x
                 FROM z, range(0, 64) t(i)),
           w AS (SELECT ii.i AS i, jj.j AS j,
                   CASE WHEN CAST(CONCAT('0x', substr(md5(ii.i || ':' || jj.j), 1, 15))
                             AS BIGINT) % 2 = 1
                        THEN 1 ELSE -1 END AS w
                 FROM range(0, 64) ii(i), range(0, 8) jj(j))
           SELECT e.vec_id, CAST(w.j AS INT) AS j,
                  CAST(sum(e.x * w.w) AS BIGINT) AS feature
           FROM e JOIN w ON e.i = w.i
           GROUP BY 1, 2""",
      // the no-shrink FD anchor: sketch rows == the quantized input
      // vectors, sorted lexicographically (DuckDB list comparison IS
      // lexicographic); the Frobenius mass is a sum of dyadic k^2/2^20
      // terms — exact in double under ANY accumulation order, so the
      // e6-floored scalar replays despite the float type
      "emb_fd_exact" ->
        """WITH q AS (
             SELECT list_transform(embedding,
                      x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings WHERE vec_id < 100),
           ranked AS (
             SELECT emb, row_number() OVER (ORDER BY emb) - 1 AS r FROM q),
           tot AS (
             SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                    CAST(floor(sum(list_sum(list_transform(emb, x -> x * x)))
                      * 1000000) AS BIGINT) AS frob_e6
             FROM q)
           SELECT e.r, CAST(e.gs - 1 AS BIGINT) AS idx, e.c AS coord,
                  t.n_vectors, t.frob_e6 AS frob_in_e6,
                  t.frob_e6 AS frob_sketch_e6, TRUE AS bound_ok
           FROM (SELECT r, unnest(emb) AS c,
                        generate_subscripts(emb, 1) AS gs
                 FROM ranked) e
           CROSS JOIN tot t""",
      "emb_covariance" ->
        """WITH q AS (
             SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
           s AS (
             SELECT vec_id, v,
                    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                         THEN 1.0
                         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
                    END AS scale
             FROM q),
           z AS (
             SELECT vec_id,
                    list_transform(v, x -> CAST(least(greatest(round(x / scale),
                      -127.0), 127.0) AS BIGINT)) AS qd
             FROM s),
           e AS (SELECT vec_id, i, qd[CAST(i + 1 AS INT)] AS x
                 FROM z, range(0, 64) t(i)),
           m AS (SELECT i, sum(x) AS sx FROM e GROUP BY 1),
           nn AS (SELECT count(*) AS n FROM z),
           p AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
                 FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
                 GROUP BY 1, 2)
           SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j, nn.n,
                  CAST(ma.sx AS BIGINT) AS sx, CAST(mb.sx AS BIGINT) AS sy,
                  CAST(p.sxy AS BIGINT) AS sxy,
                  CAST(nn.n * p.sxy - ma.sx * mb.sx AS BIGINT) AS cov_e
           FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i
           CROSS JOIN nn"""
    )
  }
}
