package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** text-analysis tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntryText {
  import EntryHelpers._

  /** Fixed BPE merge table for the text_bpe_apply oracle twin. TRAINING-
    * CONSISTENT by construction: every operand is a single char, </w>, or
    * the product of a strictly earlier merge. That property is what makes
    * rank-greedy application (the real [[Bpe.applyMerges]] loop) equal to
    * applying each merge exhaustively in list order — applying a later
    * merge can never create an adjacency for an earlier one, because the
    * earlier merge's operands cannot contain a later product — which is
    * exactly the form a SQL oracle can replay as a replace chain. */
  val fixedBpeMerges: Seq[(String, String)] = Seq(
    ("e", "</w>"), ("d", "</w>"), ("s", "</w>"), ("t", "h"),
    ("th", "e</w>"), ("i", "n"), ("a", "n"), ("an", "d</w>"),
    ("e", "r"), ("o", "n"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- training-data pipeline operators (graft.ops) ----
    "text_token_stats" -> ((s, dir) => {
      // BPE-ish pre-tokenizer token budget per document (token count, UTF-8
      // bytes, bytes/token) — the corpus-sizing pass before sequence
      // packing. The pattern is restricted to java.regex ∩ RE2 syntax so
      // the oracle runs it verbatim.
      TextAnalysis.withTokenStats(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"), "text")
        .drop("text")
    }),
    "text_url_domains" -> ((s, dir) => {
      // per-domain URL rollup (n_urls, distinct docs per domain). The
      // fixture corpus carries no URLs, so the query plants a deterministic
      // two-URL footer per doc (48 synthetic domains) and runs the REAL
      // extraction+aggregation over it — construction replicated by the
      // oracle, extraction exercised for real (same pattern as the
      // synthesized-payload mm_ queries).
      // coalesce: Spark's concat null-propagates while DuckDB's skips null
      // arguments — pin both to empty-string semantics
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", concat(coalesce(col("text"), lit("")),
          lit(" see https://site-"), (col("doc_id") % 37).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string"),
          lit(" or http://cdn-"), (col("doc_id") % 11).cast("string"),
          lit(".example.org/a/"), col("doc_id").cast("string")))
      TextAnalysis.urlDomainStats(docs, "doc_id", "body")
    }),
    "text_quality" -> ((s, dir) => {
      TextAnalysis.withQualityFeatures(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"), "text")
        .drop("text")
    }),
    "text_langid" -> ((s, dir) => {
      // stopword-profile language ID — the scoring fold (distinct-stopword
      // intersections, earliest-language argmax, CJK override) is recomputed
      // independently by the DuckDB oracle; accuracy on genuine multilingual
      // sentences is covered by TextAnalysisSpec.
      readParquet(s, s"$dir/documents.parquet")
        .withColumn("__toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          TextAnalysis.langIdFromTokens(col("text"), col("__toks"))
            .as("predicted_lang"))
    }),
    "text_fingerprint" -> ((s, dir) => {
      // xxhash64-based rolling sketch; engine-specific hash => rows-only.
      // IN-QUERY PROBES (the rows-only convention): per row,
      //   probe_fp_collisions — OTHER distinct texts sharing this row's
      //     fingerprint (expect 0: a fingerprint maps to one text);
      //   probe_text_splits — OTHER distinct fingerprints on this row's
      //     exact text (expect 0: exact duplicates must fingerprint
      //     equal, the property dedup relies on).
      // Texts ride the two windows as md5 keys, not full strings.
      import org.apache.spark.sql.expressions.Window
      readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), md5(col("text")).as("__t"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .withColumn("probe_fp_collisions",
          (size(collect_set(col("__t")).over(Window.partitionBy("fingerprint")))
            - 1).cast("long"))
        .withColumn("probe_text_splits",
          (size(collect_set(col("fingerprint")).over(Window.partitionBy("__t")))
            - 1).cast("long"))
        .select("doc_id", "fingerprint", "probe_fp_collisions", "probe_text_splits")
    }),
    "text_fingerprint_md5" -> ((s, dir) => {
      // bottom-k winnowing fingerprint with PORTABLE hashing: md5-derived
      // 60-bit gram hashes, fingerprint = md5 of the sorted sketch — the
      // hash-independent twin of text_fingerprint, oracle-verified
      // end-to-end (sketch construction recomputed in SQL).
      readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextAnalysis.fingerprintPortable(col("text")).as("fingerprint"))
    }),
    "text_pii_scrub" -> ((s, dir) => {
      // PII redaction + per-kind counts. The corpus carries no PII, so the
      // query appends DETERMINISTIC synthetic PII derived from doc_id (one
      // email, IP, SSN, phone each) and the oracle replays the same
      // construction — regexes restricted to Java/RE2-identical syntax.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
          lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-2244")).as("text"))
      CorpusOps.piiScrub(docs, "text").drop("text")
    }),
    "text_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality filters: top-token / top-2-gram
      // fractions, duplicate 2-/3-gram fractions. Pure per-row projections;
      // every count is recomputed by the DuckDB oracle with list lambdas.
      CorpusOps.repetitionFeatures(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"), "text")
        .drop("text")
    }),
    "text_contamination" -> ((s, dir) => {
      // benchmark-contamination check: docs with doc_id % 20 == 0 act as the
      // "eval set"; every other doc reports how many of its distinct word
      // 3-grams appear in it. Corpus side is a zero-shuffle map-only scan
      // against the broadcast benchmark gram set.
      val docs = readParquet(s, s"$dir/documents.parquet").select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 20 === 0)
      val corpus = docs.filter(col("doc_id") % 20 =!= 0)
      CorpusOps.ngramContamination(corpus, "text", bench, "text", n = 3)
        .drop("text")
    }),
    "text_neardup_decontaminate" -> ((s, dir) => {
      // fuzzy benchmark decontamination (GPT-3/Llama rule): corpus docs
      // whose best portable-MinHash match against the benchmark set
      // (doc_id % 10 == 0, signed once as a store) clears Jaccard 0.6 are
      // dropped; per-source kept/dropped rollup. Whole pipeline replays
      // in the oracle via the shared portable pair SQL's cross-set
      // restriction (the dedup_incremental construction).
      val docs = readParquet(s, s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val sigs = Dedup.minHashWithSigPortable(bench, "doc_id", "text",
        shingleSize = 3, numHashes = 128)
      CorpusOps.nearDupDecontaminate(corpus, sigs,
        "doc_id", "source", "n_chars", "text")
    }),
    "text_containment_decontaminate" -> ((s, dir) => {
      // containment decontamination: drop corpus docs that CONTAIN a
      // benchmark doc (fraction of the benchmark's shingles present
      // >= 0.8) — the quoted-benchmark case Jaccard structurally misses.
      // Same benchmark split and signature store as the Jaccard variant
      // (one store serves both banding grids).
      val docs = readParquet(s, s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val sigs = Dedup.minHashWithSigPortable(bench, "doc_id", "text",
        shingleSize = 3, numHashes = 128)
      CorpusOps.containmentDecontaminate(corpus, sigs,
        "doc_id", "source", "n_chars", "text")
    }),
    "text_decontaminate" -> ((s, dir) => {
      // document-level exact decontamination: drop corpus docs whose
      // NORMALIZED text exactly matches an eval-set doc (doc_id % 20 == 0
      // split, like text_contamination's n-gram variant). The eval side is
      // tiny => broadcast anti-join on md5 of the normalized text; one
      // corpus scan total.
      val docs = TextAnalysis.normalizeText(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text", "source"),
        "text")
        .withColumn("h", md5(col("norm_text")))
      val evalSet = docs.filter(col("doc_id") % 20 === 0).select(col("h").as("eh"))
      docs.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(evalSet.distinct()), col("h") === col("eh"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"))
    }),
    "text_bloom_decontaminate" -> ((s, dir) => {
      // Bloom-filter decontamination: text_decontaminate's broadcast-set
      // pattern with the eval set compressed to a PORTABLE 1024-bit /
      // 4-hash Bloom filter — the shape that still works when the held-out
      // side is millions of documents (the bits frame is <= mBits rows no
      // matter how large the set; an exact hash set grows without bound).
      // Zero false negatives ever (exact_match => bloom_positive); the
      // deterministic md5 bit positions make false positives REPRODUCIBLE,
      // so the oracle replays the whole filter bit-for-bit and the
      // false_positive column itself is hash-verified.
      val docs = TextAnalysis.normalizeText(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text", "source"),
        "text")
        .withColumn("h", md5(col("norm_text")))
      val evalSet = docs.filter(col("doc_id") % 20 === 0).select("h").distinct()
      val bits = Sketches.bloomBits(evalSet, "h", d = 4, mBits = 1024)
      val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        .select("doc_id", "source", "h")
      Sketches.bloomContains(corpus, "h", bits, d = 4, mBits = 1024)
        .join(broadcast(evalSet.select(col("h").as("eh"))),
          col("h") === col("eh"), "left")
        .select(col("doc_id"), col("source"), col("bloom_positive"),
          col("eh").isNotNull.as("exact_match"),
          (col("bloom_positive") && col("eh").isNull).as("false_positive"))
    }),
    "text_normalize" -> ((s, dir) => {
      // canonical normalization (NFC + lower + whitespace collapse), ASCII
      // fast path fully codegen; oracle recomputes with DuckDB's
      // nfc_normalize — both implement the same Unicode normal form
      TextAnalysis.normalizeText(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"), "text")
        .select(col("doc_id"), col("norm_text"), col("changed"))
    }),
    "text_chunks" -> ((s, dir) => {
      // overlapping token-window chunking (RAG/embedding prep): 32-token
      // windows every 24 tokens, last window clipped; map-only explode
      TextAnalysis.chunkDocuments(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"),
        "doc_id", "text", window = 32, stride = 24)
    }),
    "text_tfidf" -> ((s, dir) => {
      // top-3 TF-IDF keywords per doc with integer log2-floor IDF
      // (transcendental-free => cross-engine exact); broadcast df table
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "text")
      TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"),
          col("dfreq"), col("score"), col("rk"))
    }),
    "text_collocations" -> ((s, dir) => {
      // PMI collocation mining: corpus top-25 adjacent bigrams by
      // pointwise mutual information, ranked transcendental-free via the
      // exact integer ratio floor(1e6·N·c_xy / (c_x·c_y)) in
      // DECIMAL(38,0) — cross-engine exact, ties by (w1, w2) asc.
      // minCount=5 floors hapax pairs (part of the operator: raw PMI
      // ranks a once-seen typo pair above every real collocation).
      TextAnalysis.collocations(
        readParquet(s, s"$dir/documents.parquet").select("text"),
        "text", k = 25, minCount = 5)
    }),
    "text_cooccurrence" -> ((s, dir) => {
      // GloVe X_ij builder: unordered token pairs within a 4-token
      // window, 1/distance weights integerized as 1000000 div d (exact
      // BIGINT sums), pairs canonicalized by binary string order,
      // corpus top-25 by weighted mass.
      TextAnalysis.cooccurrence(
        readParquet(s, s"$dir/documents.parquet").select("text"),
        "text", window = 4, k = 25, minCount = 5)
    }),
    "text_lm_surprisal" -> ((s, dir) => {
      // CCNet quality scoring: corpus-trained add-one bigram LM, per-doc
      // mean surprisal in integer-quantized bits (floor-log2, the tfidf
      // convention => transcendental-free, cross-engine exact), corpus
      // head/middle/tail terciles by distributed rank. minCount=2 prunes
      // singleton bigrams so the unseen-bigram scoring path runs for real.
      LmScore.surprisalScores(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        minCount = 2)
    }),
    "text_pack_sequences" -> ((s, dir) => {
      // sequence packing for training rows: distributed prefix sum of token
      // counts in doc order (bucketed local cumsums + broadcast offsets),
      // then 512-token pack boundaries
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("n_toks", TextAnalysis.tokenCount(col("text")))
      CorpusOps.packSequences(docs, "doc_id", "n_toks",
        seqLen = 512L, bucketWidth = 64L)
        .select(col("id").as("doc_id"), col("len"), col("pack_id"),
          col("pack_offset"))
    }),
    "text_bpe" -> ((s, dir) => {
      // BPE merge training (bounded driver loop over the distributed
      // top-vocab table — the IVF training pattern) + distributed apply.
      // Iterative training is not SQL-expressible => rows-only, with the
      // roundtrip probe in-query: every word must reconstruct exactly from
      // its subwords (violations column must read 0), and the subword/word
      // ratio makes merge quality visible. BpeSpec pins the reference
      // algorithm on the classic fixture.
      val docs = readParquet(s, s"$dir/documents.parquet").select("doc_id", "text")
      val merges = ops.Bpe.train(docs, "text", nMerges = 50, vocabCap = 10000)
      docs.select(col("doc_id"),
          explode(ops.Bpe.applyMerges(col("text"), merges)).as("bw"))
        .agg(
          // explode drops token-less docs, so this counts docs WITH tokens
          countDistinct(col("doc_id")).as("n_docs_with_tokens"),
          count(lit(1)).as("n_words"),
          sum(size(col("bw.tokens"))).cast("long").as("n_subword_tokens"),
          sum(when(concat_ws("", col("bw.tokens")) =!=
              concat(col("bw.word"), lit(ops.Bpe.EndOfWord)), 1L)
            .otherwise(0L)).as("n_roundtrip_violations"))
    }),
    "text_bpe_apply" -> ((s, dir) => {
      // oracle-exact APPLY twin for text_bpe: the same real
      // [[Bpe.applyMerges]] rank-greedy loop, but over the hand-pinned
      // training-consistent merge table [[fixedBpeMerges]] (training — the
      // one genuinely non-SQL-expressible half — is skipped), on the
      // corpus's top-200 words (count desc, word asc: a strict total
      // order). The oracle replays the apply as a bracket-encoded replace
      // chain: each symbol rides as {sym}, so a pair merge is one
      // disjoint-match string replace, and training-consistency makes
      // sequential-exhaustive == rank-greedy (see fixedBpeMerges doc).
      val words = readParquet(s, s"$dir/documents.parquet")
        .select(explode(expr(
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("word").asc).limit(200)
      words.select(col("word"), col("n_occurrences"),
          explode(Bpe.applyMerges(col("word"), fixedBpeMerges)).as("bw"))
        .select(col("word"), col("n_occurrences"),
          concat_ws(" ", col("bw.tokens")).as("tokens"),
          size(col("bw.tokens")).cast("long").as("n_tokens"))
    }),
    "text_html_strip" -> ((s, dir) => {
      // boilerplate removal on synthesized HTML (the mm_* pattern: build a
      // deterministic artifact in-query, run the REAL operator, verify the
      // roundtrip): nav/footer/script/style content must vanish, body text
      // must survive verbatim. Java∩RE2 regexes so the oracle runs the
      // same patterns; clean text compared as md5.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("html", concat(
          lit("<html><head><title>doc-"), col("doc_id"),
          lit("</title><style>body{margin:0}</style></head><body><nav>home | about | login</nav><h1>doc-"),
          col("doc_id"), lit("</h1><p>"), col("text"),
          lit("</p><script>var t=1;</script><footer>copyright corp</footer></body></html>")))
      docs.select(col("doc_id"),
        TextAnalysis.htmlTitle(col("html")).as("title"),
        TextAnalysis.htmlStrip(col("html")).as("__clean"))
        .select(col("doc_id"), col("title"),
          length(col("__clean")).cast("long").as("n_chars_clean"),
          md5(col("__clean")).as("clean_md5"))
    }),
    "text_quality_model" -> ((s, dir) => {
      // hashed-n-gram linear classifier scoring (fastText-shaped model
      // filter plumbing): hash unigrams+bigrams into 1024 buckets, average
      // deterministic integer-thousandth weights, threshold at 0. Exact
      // integer sum + one division => oracle-exact; swap weightMillis for
      // a broadcast trained-weight array to run a real model.
      readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), ops.LinearTextModel.score(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_features").as("n_features"),
          col("q.score").as("score"), col("q.keep").as("keep"))
    }),
    "ml_train_logreg" -> ((s, dir) => {
      // TRAIN the quality-filter model in-engine (closing the loop the
      // fixed-weight scorer stubs): full-batch logistic regression with
      // momentum over the hashed n-gram features — one tokenize pass,
      // then 15 map-side-combined dense-gradient aggregations over the
      // checkpointed feature frame. The fixture plants a LEARNABLE
      // signal (the synthesized-payload convention — the corpus's lang
      // column is provably independent of its text, so no model can
      // learn it; measured: accuracy == majority exactly): every
      // doc_id % 3 == 0 doc carries quality-marker tokens, the rest
      // spam markers, and the trainer must find those buckets. Float
      // sums are partition-order dependent => rows-only, with the probe
      // columns carrying the contract (Adagrad steps): final loss < initial and trained
      // accuracy > the 2/3 majority baseline (a diverging lr or a
      // broken gradient sign flips them false and fails the row check);
      // ml_pr_curve / ml_calibration are the oracle-exact anchor twins
      // (the same feature hashing, fixed weights).
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" careful review polished thorough"))
            .otherwise(lit(" clickbait spammy freebie winner"))))
      graft.ops.ModelTraining.trainTextLogReg(docs, col("body"),
        col("doc_id") % 3 === 0, iters = 15)._1
    }),
    "ml_train_logreg_exact" -> ((s, dir) => {
      // the ORACLE-EXACT twin of ml_train_logreg (r19): fixed-point
      // class-balanced full-batch GD with a hard sigmoid over the same
      // planted fixture — all-long arithmetic with truncated division,
      // so the per-iteration losses, the final weights and the final
      // accuracy replay iteration by iteration in the generated SQL
      // (the oracle unrolls the same 3 updates). Anchors the trainer
      // MACHINERY — featurize -> per-iteration dense-gradient aggregate
      // -> weight update -> final eval — while the Adagrad float row
      // keeps the production optimizer under its probe contract.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" careful review polished thorough"))
            .otherwise(lit(" clickbait spammy freebie winner"))))
      graft.ops.ModelTraining.trainTextLogRegExact(docs, col("body"),
        col("doc_id") % 3 === 0, iters = 3, lrNum = 50L)
    }),
    "ml_cv_exact" -> ((s, dir) => {
      // K-FOLD cross-validation over the exact trainer (r19): fold
      // membership by portable md5 hash of doc_id (the hashSplit
      // convention), each fold trained on the other two with the shared
      // fixed-point loop and evaluated held-out — the model-selection
      // machinery of a corpus filter, every number an integer function
      // of the corpus, replayed fold-by-fold in the generated SQL.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" careful review polished thorough"))
            .otherwise(lit(" clickbait spammy freebie winner"))))
      graft.ops.ModelTraining.crossValidateExact(docs, col("body"),
        col("doc_id") % 3 === 0, col("doc_id"), folds = 3, iters = 2,
        lrNum = 50L)
    }),
    "ml_pr_curve" -> ((s, dir) => {
      // threshold-sweep PR points for a corpus filter model: the hashed-
      // n-gram quality score (milli-units, the text_quality_model
      // scorer) swept at 9 thresholds against an is-English label —
      // exact confusion counts + floor-scaled integer ratios, all
      // thresholds in ONE aggregation pass.
      val scored = readParquet(s, s"$dir/documents.parquet")
        .select(ops.LinearTextModel.score(col("text")).as("q"),
          (col("lang") === "en").as("label"))
        .select(floor(col("q.score") * lit(1000.0)).cast("long")
          .as("score_milli"), col("label"))
      ops.ModelEval.prCurve(scored, col("score_milli"), col("label"),
        Seq(-300L, -200L, -100L, -50L, 0L, 50L, 100L, 200L, 300L))
    }),
    "ml_calibration" -> ((s, dir) => {
      // score-calibration bins (the reliability diagram's table): 8
      // equal-width integer bins over the public milli-score range
      // [-1000, 1000), exact counts + floor-scaled positive rate + mean
      // score per bin. Same scorer and label as ml_pr_curve.
      val scored = readParquet(s, s"$dir/documents.parquet")
        .select(ops.LinearTextModel.score(col("text")).as("q"),
          (col("lang") === "en").as("label"))
        .select(floor(col("q.score") * lit(1000.0)).cast("long")
          .as("score_milli"), col("label"))
      ops.ModelEval.calibrationBins(scored, col("score_milli"),
        col("label"), lo = -1000L, hi = 1000L, nBins = 8)
    }),
    "text_length_quantiles" -> ((s, dir) => {
      // per-source corpus length profile: EXACT interpolated percentiles
      // (the numbers a quality-filter pipeline thresholds against). Exact
      // percentile is a sort-based agg per group; at 100 TB swap in
      // percentile_approx (same query shape) — the oracle anchors exactness
      // here.
      readParquet(s, s"$dir/documents.parquet")
        .groupBy("source")
        .agg(expr("percentile(CAST(n_chars AS DOUBLE), array(0.5D, 0.9D, 0.99D))").as("q"),
          count(lit(1)).as("n_docs"))
        .select(col("source"), element_at(col("q"), 1).as("p50"),
          element_at(col("q"), 2).as("p90"), element_at(col("q"), 3).as("p99"),
          col("n_docs"))
    }),
    "text_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking, rolled up to oracle-exact facts: the
      // chunks must PARTITION each document exactly (reassembled md5 ==
      // md5(text)) and respect [min, max] sizing (only the last chunk may
      // run short; violations column must read 0). Boundary positions are
      // deterministic but not SQL-recomputable, so the partition property
      // IS the verification — a dropped, duplicated, or overlapping chunk
      // breaks the hash.
      val ch = TextAnalysis.cdcChunks(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        minSize = 32, avgSize = 128, maxSize = 512)
      ch.groupBy("doc_id")
        .agg(
          md5(concat_ws("", transform(
            array_sort(collect_list(struct(col("chunk_idx").as("i"),
              col("chunk_text").as("t")))),
            c => c.getField("t")))).as("reassembled_md5"),
          sum(when(col("length") > 512 ||
              (col("length") < 32 && !col("is_last")), 1L)
            .otherwise(0L)).as("size_violations"))
        .select(col("doc_id"), col("reassembled_md5"), col("size_violations"))
    }),
    "text_vocab_topk" -> ((s, dir) => {
      // corpus vocabulary: 50 most frequent tokens (tokenizer-training prep).
      // Explode feeds a map-side-combined hash aggregate; final top-k is
      // TakeOrderedAndProject (bounded per-partition heaps), never a sort.
      CorpusOps.vocabTopK(
        readParquet(s, s"$dir/documents.parquet").select("text"), "text", 50)
    })
  )

  /** The hashed-n-gram linear-model scorer as shared CTEs producing
    * `s(doc_id, n_features, millis)` — one definition so the
    * text_quality_model / ml_pr_curve / ml_calibration oracles replay
    * the identical feature hashing and weight table (drift here would
    * silently decouple the evaluation rows from the scorer row). */
  private val ltmScoreSql =
    """t AS (
         SELECT doc_id,
                coalesce(regexp_extract_all(lower(text), '[a-z0-9]+'),
                         CAST([] AS VARCHAR[])) AS toks
         FROM documents),
       f AS (
         SELECT doc_id,
                list_concat(toks,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])
                       ELSE CAST([] AS VARCHAR[]) END) AS feats
         FROM t),
       s AS (
         SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_features,
                list_sum(list_transform(feats,
                  g -> (CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT)
                        % 1024 * 2654435761) % 2001 - 1000)) AS millis
         FROM f)"""

  /** Generated oracle for ml_train_logreg_exact: the SAME fixed-point
    * class-balanced hard-sigmoid GD unrolled `iters` times in SQL —
    * built by a Scala loop from one iteration template (the bpeChain
    * convention) so the replay and the trainer cannot drift on iteration
    * count or constants. All arithmetic is BIGINT with `//` (truncates
    * toward zero, same as Scala Long division — verified) and the md5
    * 60-bit bucket convention shared with ltmScoreSql. */
  /** The shared tokenize/bigram/hash/label fixture CTEs of BOTH exact-
    * trainer oracles (`t`/`f`/`docs`/`o`/`fm`) — ONE definition so the
    * single-frame and CV replays cannot drift on the tokenization or
    * the md5-60-bit bucket convention (the ltmScoreSql rationale). The
    * CV variant adds the portable fold column to `docs`. */
  private def logregFixtureSql(foldsOpt: Option[Int]): String = {
    val foldCol = foldsOpt.map(fo =>
      ",\n                  CAST(CONCAT('0x', substr(md5(CAST(doc_id AS " +
        s"VARCHAR)), 1, 15)) AS BIGINT) % $fo AS fold").getOrElse("")
    s"""t AS (
           SELECT doc_id,
                  coalesce(regexp_extract_all(lower(coalesce(text, '') ||
                    CASE WHEN doc_id % 3 = 0
                         THEN ' careful review polished thorough'
                         ELSE ' clickbait spammy freebie winner' END),
                    '[a-z0-9]+'), CAST([] AS VARCHAR[])) AS toks
           FROM documents),
         f AS (
           SELECT doc_id,
                  list_concat(toks,
                    CASE WHEN len(toks) >= 2
                         THEN list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i + 1])
                         ELSE CAST([] AS VARCHAR[]) END) AS feats
           FROM t),
         docs AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y$foldCol
           FROM f),
         o AS (
           SELECT doc_id,
                  CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) % 1024 AS b
           FROM (SELECT doc_id, unnest(feats) AS g FROM f)),
         fm AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
                FROM o GROUP BY 1, 2)"""
  }

  private def logregExactSql(iters: Int, lrNum: Long): String = {
    val fixture =
      s"""${logregFixtureSql(None)},
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(y) AS BIGINT) AS npos FROM docs),
         w0 AS (SELECT CAST(j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
                FROM range(0, 1025) r(j))"""
    val steps = (0 to iters).map { k =>
      val pass =
        s"""z$k AS (
             SELECT d.doc_id, d.y, coalesce(s.zn, 0) + b.bw AS z
             FROM docs d
             LEFT JOIN (SELECT fm.doc_id, CAST(sum(fm.c * w.w) AS BIGINT) AS zn
                        FROM fm JOIN w$k w ON fm.b = w.j GROUP BY 1) s
               ON s.doc_id = d.doc_id
             CROSS JOIN (SELECT w AS bw FROM w$k WHERE j = 1024) b),
           e$k AS (
             SELECT doc_id, y, z,
                    least(greatest(500 + z // 4000, 0), 1000) - y * 1000 AS err,
                    (least(greatest(500 + z // 4000, 0), 1000) - y * 1000)
                      * nd.n * 1000
                      // (2 * CASE WHEN y = 1 THEN nd.npos
                                   ELSE nd.n - nd.npos END) AS werr
             FROM z$k, nd)"""
      val update = if (k < iters)
        s""",
           g$k AS (
             SELECT wj.j,
                    CAST(coalesce(sum(fm.c * e.werr), 0) AS BIGINT)
                      + CASE WHEN wj.j = 1024
                             THEN (SELECT CAST(sum(werr) AS BIGINT) FROM e$k)
                             ELSE 0 END AS g
             FROM w$k wj
             LEFT JOIN fm ON fm.b = wj.j
             LEFT JOIN e$k e ON e.doc_id = fm.doc_id
             GROUP BY wj.j),
           w${k + 1} AS (
             SELECT wj.j, wj.w - $lrNum * gk.g // (nd.n * 1000) AS w
             FROM w$k wj JOIN g$k gk ON wj.j = gk.j, nd)"""
      else ""
      pass + update
    }.mkString(",\n")
    val lossSelects = (0 to iters).map(k =>
      s"SELECT 'loss' AS kind, CAST($k AS BIGINT) AS k, " +
        s"CAST(sum(err * err) AS BIGINT) AS v FROM e$k")
    val finals = Seq(
      s"SELECT 'acc', 0, CAST(count(*) FILTER ((z > 0) = (y = 1)) AS BIGINT) " +
        s"FROM e$iters",
      "SELECT 'acc', 1, n FROM nd",
      "SELECT 'acc', 2, npos FROM nd",
      s"SELECT 'w', j, w FROM w$iters WHERE w != 0")
    s"WITH $fixture,\n$steps\n" + (lossSelects ++ finals).mkString("\nUNION ALL\n")
  }

  /** Generated oracle for ml_cv_exact: [[logregExactSql]]'s unrolled
    * fixed-point GD, repeated per fold over the fold's TRAIN side (fold
    * membership = the portable md5-60-bit doc_id hash mod `folds`, the
    * hashSplit convention) with a held-out evaluation CTE per fold. */
  private def logregCvSql(folds: Int, iters: Int, lrNum: Long): String = {
    val fixture =
      s"""${logregFixtureSql(Some(folds))},
         wz AS (SELECT CAST(j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
                FROM range(0, 1025) r(j))"""
    val perFold = (0 until folds).map { fd =>
      val nd = s"nd$fd"
      def wName(k: Int) = if (k == 0) "wz" else s"w${fd}_$k"
      val ndCte =
        s"""$nd AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(y) AS BIGINT) AS npos
                FROM docs WHERE fold <> $fd)"""
      val passes = (0 to iters).map { k =>
        val pass =
          s"""z${fd}_$k AS (
               SELECT d.doc_id, d.y, coalesce(s.zn, 0) + b.bw AS z
               FROM docs d
               LEFT JOIN (SELECT fm.doc_id, CAST(sum(fm.c * w.w) AS BIGINT) AS zn
                          FROM fm JOIN ${wName(k)} w ON fm.b = w.j GROUP BY 1) s
                 ON s.doc_id = d.doc_id
               CROSS JOIN (SELECT w AS bw FROM ${wName(k)} WHERE j = 1024) b
               WHERE d.fold <> $fd),
             e${fd}_$k AS (
               SELECT doc_id, y, z,
                      least(greatest(500 + z // 4000, 0), 1000) - y * 1000 AS err,
                      (least(greatest(500 + z // 4000, 0), 1000) - y * 1000)
                        * $nd.n * 1000
                        // (2 * CASE WHEN y = 1 THEN $nd.npos
                                     ELSE $nd.n - $nd.npos END) AS werr
               FROM z${fd}_$k, $nd)"""
        val update = if (k < iters)
          s""",
             g${fd}_$k AS (
               SELECT wj.j,
                      CAST(coalesce(sum(fm.c * e.werr), 0) AS BIGINT)
                        + CASE WHEN wj.j = 1024
                               THEN (SELECT CAST(sum(werr) AS BIGINT) FROM e${fd}_$k)
                               ELSE 0 END AS g
               FROM ${wName(k)} wj
               LEFT JOIN fm ON fm.b = wj.j
               LEFT JOIN e${fd}_$k e ON e.doc_id = fm.doc_id
               GROUP BY wj.j),
             ${wName(k + 1)} AS (
               SELECT wj.j, wj.w - $lrNum * gk.g // ($nd.n * 1000) AS w
               FROM ${wName(k)} wj JOIN g${fd}_$k gk ON wj.j = gk.j, $nd)"""
        else ""
        pass + update
      }.mkString(",\n")
      val evalCte =
        s"""ev$fd AS (
             SELECT d.doc_id, d.y, coalesce(s.zn, 0) + b.bw AS z
             FROM docs d
             LEFT JOIN (SELECT fm.doc_id, CAST(sum(fm.c * w.w) AS BIGINT) AS zn
                        FROM fm JOIN ${wName(iters)} w ON fm.b = w.j GROUP BY 1) s
               ON s.doc_id = d.doc_id
             CROSS JOIN (SELECT w AS bw FROM ${wName(iters)} WHERE j = 1024) b
             WHERE d.fold = $fd)"""
      (Seq(ndCte, passes, evalCte).mkString(",\n"),
        s"""SELECT CAST($fd AS BIGINT) AS fold, $nd.n AS n_train,
               $nd.npos AS n_train_pos,
               (SELECT CAST(count(*) AS BIGINT) FROM ev$fd) AS n_test,
               (SELECT CAST(count(*) FILTER ((z > 0) = (y = 1)) AS BIGINT)
                FROM ev$fd) AS n_test_correct,
               (SELECT CAST(sum(err * err) AS BIGINT) FROM e${fd}_$iters)
                 AS train_loss_final
            FROM $nd""")
    }
    s"WITH $fixture,\n${perFold.map(_._1).mkString(",\n")}\n" +
      perFold.map(_._2).mkString("\nUNION ALL\n")
  }

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    // the text_bpe_apply replace chain, generated from the SAME merge
    // table the Spark side applies so the two cannot drift
    val bpeChain = fixedBpeMerges.foldLeft("s") { case (acc, (a, b)) =>
      s"replace($acc, '{$a}{$b}', '{$a$b}')"
    }
    Map(
      "text_bpe_apply" ->
        s"""WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
              FROM documents),
            top AS (
              SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
              FROM toks GROUP BY 1
              ORDER BY n_occurrences DESC, word ASC LIMIT 200),
            enc AS (
              SELECT word, n_occurrences,
                     regexp_replace(word, '(.)', '{\\1}', 'g') || '{</w>}' AS s
              FROM top),
            m AS (SELECT word, n_occurrences, $bpeChain AS s2 FROM enc)
            SELECT word, n_occurrences,
                   trim(replace(s2, '}{', ' '), '{}') AS tokens,
                   CAST(len(string_split(trim(replace(s2, '}{', ' '), '{}'), ' '))
                     AS BIGINT) AS n_tokens
            FROM m""",
      "text_quality" ->
        """SELECT doc_id,
              CAST(len(text) AS BIGINT) AS n_chars,
              CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
              CASE WHEN len(text) > 0 THEN
                CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                  / CAST(len(text) AS DOUBLE) ELSE 0.0 END AS digit_ratio,
              CASE WHEN len(text) > 0 THEN
                CAST(len(text) - len(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                  / CAST(len(text) AS DOUBLE) ELSE 0.0 END AS upper_ratio,
              CASE WHEN len(text) > 0 THEN
                CAST(len(text) - len(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
                  / CAST(len(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
              CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0 THEN
                CAST(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> len(t))) AS DOUBLE)
                  / CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) ELSE 0.0 END AS mean_token_len,
              CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0 THEN
                CAST(len(list_distinct(list_intersect(regexp_extract_all(lower(text), '[a-z0-9]+'),
                  ['the','of','and','to','in','is','that','it','for','was','on','are','as','with','his','they','at','be','this','have','from','or','had','by','not','but','what','all','were','when','we','there','can','an','your','which','their','said','if','will','way','about','many','then','them','would','like','so','these','her','him','has','more','could','did','been','who']))) AS DOUBLE)
                  / CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) ELSE 0.0 END AS stopword_ratio
           FROM documents""",
      "text_token_stats" ->
        """WITH t AS (
             SELECT doc_id,
                    CAST(len(regexp_extract_all(text,
                      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+')) AS BIGINT)
                      AS n_bpe_tokens,
                    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             FROM documents)
           SELECT doc_id, n_bpe_tokens, n_bytes,
                  CASE WHEN n_bpe_tokens > 0
                       THEN CAST(n_bytes AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE)
                       ELSE 0.0 END AS bytes_per_token
           FROM t""",
      "text_url_domains" ->
        """WITH b AS (
             SELECT doc_id,
                    concat(text, ' see https://site-', CAST(doc_id % 37 AS VARCHAR),
                           '.example.com/p/', CAST(doc_id AS VARCHAR),
                           ' or http://cdn-', CAST(doc_id % 11 AS VARCHAR),
                           '.example.org/a/', CAST(doc_id AS VARCHAR)) AS body
             FROM documents),
           u AS (SELECT doc_id, unnest(regexp_extract_all(body, 'https?://[^ \t\n\f\r]+')) AS url
                 FROM b)
           SELECT regexp_extract(url, 'https?://([^/ \t\n\f\r]+)', 1) AS domain,
                  CAST(count(*) AS BIGINT) AS n_urls,
                  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM u GROUP BY 1""",
      "text_langid" ->
        s"""WITH t AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents),
            s AS (SELECT doc_id, text,
                    ${langScores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n                    ")}
                  FROM t),
            x AS (SELECT *, $langMax AS m,
                         len(text) - len(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
                  FROM s)
            SELECT doc_id,
                   CASE WHEN cjk * 2 > len(text) THEN 'zh'
                        WHEN m <= 0 THEN 'und' $langArms ELSE 'und' END AS predicted_lang
            FROM x""",
      // near-dup decontamination: the SAME cross-set restriction of the
      // portable pair set (benchmark = doc_id % 10 == 0), rolled up as
      // per-source kept/dropped over the corpus side
      "text_neardup_decontaminate" ->
        s"""WITH pairs AS ($minhashMd5Sql),
            dropped AS (
              SELECT DISTINCT CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id
              FROM pairs WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)),
            corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0)
            SELECT source,
                   CAST(count(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
                   CAST(count(*) FILTER (WHERE d.id IS NOT NULL) AS BIGINT) AS n_dropped,
                   CAST(coalesce(sum(n_chars) FILTER (WHERE d.id IS NULL), 0) AS BIGINT)
                     AS chars_kept
            FROM corpus c LEFT JOIN dropped d ON d.id = c.doc_id
            GROUP BY source""",
      "text_containment_decontaminate" ->
        s"""WITH cpairs AS (
              ${minhashPrefixSql(2)}SELECT id_a, id_b, inter, sz_a, sz_b FROM v),
            dropped AS (
              SELECT DISTINCT CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id
              FROM cpairs
              WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
                AND (CASE WHEN id_a % 10 = 0
                          THEN (CASE WHEN sz_a = 0 THEN 0.0 ELSE inter / sz_a END)
                          ELSE (CASE WHEN sz_b = 0 THEN 0.0 ELSE inter / sz_b END)
                     END) >= 0.8),
            corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0)
            SELECT source,
                   CAST(count(*) FILTER (WHERE d.id IS NULL) AS BIGINT) AS n_kept,
                   CAST(count(*) FILTER (WHERE d.id IS NOT NULL) AS BIGINT) AS n_dropped,
                   CAST(coalesce(sum(n_chars) FILTER (WHERE d.id IS NULL), 0) AS BIGINT)
                     AS chars_kept
            FROM corpus c LEFT JOIN dropped d ON d.id = c.doc_id
            GROUP BY source""",
      // Portable winnowing fingerprint: md5-derived 5-gram hashes, bottom-16
      // sorted sketch, fingerprint = md5 of the comma-joined sketch.
      "text_fingerprint_md5" ->
        """SELECT doc_id,
              md5(array_to_string(list_transform(
                (list_sort(list_transform(range(1, greatest(len(text) - 4, 1) + 1),
                  i -> CAST(CONCAT('0x', substr(md5(text[i:i+4]), 1, 15)) AS BIGINT))))[1:16],
                v -> CAST(v AS VARCHAR)), ',')) AS fingerprint
           FROM documents""",
      "text_html_strip" ->
        s"""WITH h AS (
              SELECT doc_id,
                     '<html><head><title>doc-' || CAST(doc_id AS VARCHAR) ||
                     '</title><style>body{margin:0}</style></head><body><nav>home | about | login</nav><h1>doc-' ||
                     CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
                     '</p><script>var t=1;</script><footer>copyright corp</footer></body></html>' AS html
              FROM documents)
            SELECT doc_id,
                   regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
                   CAST(length($htmlStripSql) AS BIGINT) AS n_chars_clean,
                   md5($htmlStripSql) AS clean_md5
            FROM h""",
      "text_quality_model" ->
        s"""WITH $ltmScoreSql
           SELECT doc_id, n_features,
                  CASE WHEN n_features > 0
                       THEN CAST(millis AS DOUBLE) / (n_features * 1000)
                       ELSE 0.0 END AS score,
                  (CASE WHEN n_features > 0
                        THEN CAST(millis AS DOUBLE) / (n_features * 1000)
                        ELSE 0.0 END) > 0.0 AS keep
           FROM s""",
      "ml_train_logreg_exact" -> logregExactSql(iters = 3, lrNum = 50L),
      "ml_cv_exact" -> logregCvSql(folds = 3, iters = 2, lrNum = 50L),
      "ml_pr_curve" ->
        s"""WITH $ltmScoreSql,
            m AS (
              SELECT CAST(floor((CASE WHEN n_features > 0
                       THEN CAST(millis AS DOUBLE) / (n_features * 1000)
                       ELSE 0.0 END) * 1000.0) AS BIGINT) AS sc,
                     d.lang = 'en' AS l
              FROM s JOIN documents d USING (doc_id)),
            r(threshold) AS (
              VALUES (-300), (-200), (-100), (-50), (0), (50), (100),
                     (200), (300)),
            c AS (
              SELECT r.threshold,
                     count(*) FILTER (m.sc >= r.threshold AND m.l) AS tp,
                     count(*) FILTER (m.sc >= r.threshold AND NOT m.l) AS fp,
                     count(*) FILTER (m.sc < r.threshold AND m.l) AS fn,
                     count(*) FILTER (m.sc < r.threshold AND NOT m.l) AS tn
              FROM m CROSS JOIN r GROUP BY 1)
           SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn, tn,
                  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
                       ELSE -1 END AS precision_e6,
                  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
                       ELSE -1 END AS recall_e6,
                  CASE WHEN 2 * tp + fp + fn > 0
                       THEN 2 * tp * 1000000 // (2 * tp + fp + fn)
                       ELSE -1 END AS f1_e6
           FROM c""",
      "ml_calibration" ->
        s"""WITH $ltmScoreSql,
            m AS (
              SELECT CAST(floor((CASE WHEN n_features > 0
                       THEN CAST(millis AS DOUBLE) / (n_features * 1000)
                       ELSE 0.0 END) * 1000.0) AS BIGINT) AS sc,
                     d.lang = 'en' AS l
              FROM s JOIN documents d USING (doc_id))
           SELECT least(greatest((sc - (-1000)) * 8 // 2000, 0), 7) AS bin,
                  count(*) AS n,
                  count(*) FILTER (l) AS n_pos,
                  count(*) FILTER (l) * 1000000 // count(*) AS pos_rate_e6,
                  CAST(sum(sc) AS BIGINT) // count(*) AS mean_score
           FROM m GROUP BY 1""",
      "text_pii_scrub" ->
        s"""WITH d AS (
             SELECT doc_id,
                    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                      || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-2244' AS text
             FROM documents)
           SELECT doc_id, $piiCountsSql, $piiScrubSql AS scrubbed
           FROM d""",
      "text_repetition" ->
        """WITH t AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           g AS (
             SELECT doc_id, toks,
                    list_transform(range(1, len(toks)),
                      i -> array_to_string(toks[i:i+1], ' ')) AS g2,
                    list_transform(range(1, len(toks) - 1),
                      i -> array_to_string(toks[i:i+2], ' ')) AS g3
             FROM t)
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                  CASE WHEN len(toks) > 0 THEN
                      CAST(list_max(list_transform(list_distinct(toks),
                        d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)
                    ELSE 0.0 END AS top_token_frac,
                  CASE WHEN len(g2) > 0 THEN
                      CAST(list_max(list_transform(list_distinct(g2),
                        d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE)
                        / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END AS top_2gram_frac,
                  CASE WHEN len(g2) > 0 THEN
                      CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                        / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END AS dup_2gram_frac,
                  CASE WHEN len(g3) > 0 THEN
                      CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                        / CAST(len(g3) AS DOUBLE)
                    ELSE 0.0 END AS dup_3gram_frac
           FROM g""",
      "text_contamination" ->
        """WITH t AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           g AS (
             SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                      i -> array_to_string(toks[i:i+2], ' '))) AS grams
             FROM t),
           bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
           corpus AS (SELECT doc_id, grams FROM g WHERE doc_id % 20 <> 0),
           hits AS (
             SELECT doc_id, count(*) AS n_hit
             FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) cg
             JOIN bench USING (gram) GROUP BY doc_id)
           SELECT c.doc_id, CAST(len(c.grams) AS BIGINT) AS n_grams,
                  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_contaminated,
                  CASE WHEN len(c.grams) > 0 THEN
                      CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(len(c.grams) AS DOUBLE)
                    ELSE 0.0 END AS contamination_frac
           FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id""",
      "text_decontaminate" ->
        """WITH n AS (
             SELECT doc_id, source,
                    md5(nfc_normalize(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))))) AS h
             FROM documents),
           ev AS (SELECT DISTINCT h FROM n WHERE doc_id % 20 = 0)
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept
           FROM n
           WHERE doc_id % 20 <> 0
             AND NOT EXISTS (SELECT 1 FROM ev WHERE ev.h = n.h)
           GROUP BY source""",
      // portable Bloom replay: the text_decontaminate normalization+md5
      // arms, then the 4 Kirsch-Mitzenmacher positions ((h1 + j*h2) mod
      // 1024 from ONE md5's 60-bit/56-bit halves) — membership = all 4
      // bits set, false_positive = member minus exact
      "text_bloom_decontaminate" ->
        """WITH n AS (
              SELECT doc_id, source,
                     md5(nfc_normalize(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))))) AS h
              FROM documents),
            ev AS (SELECT DISTINCT h FROM n WHERE doc_id % 20 = 0 AND h IS NOT NULL),
            js AS (SELECT unnest([0, 1, 2, 3]) AS j),
            bits AS (
              SELECT DISTINCT
                     (CAST(CONCAT('0x', substr(md5(h), 1, 15)) AS BIGINT)
                      + j * CAST(CONCAT('0x', substr(md5(h), 16, 14)) AS BIGINT))
                     % 1024 AS pos
              FROM ev CROSS JOIN js),
            corpus AS (SELECT doc_id, source, h FROM n WHERE doc_id % 20 <> 0),
            probe AS (
              SELECT c.doc_id, c.source, c.h, js.j,
                     CASE WHEN c.h IS NULL THEN NULL
                          ELSE (CAST(CONCAT('0x', substr(md5(c.h), 1, 15)) AS BIGINT)
                                + js.j * CAST(CONCAT('0x', substr(md5(c.h), 16, 14)) AS BIGINT))
                               % 1024
                     END AS pos
              FROM corpus c CROSS JOIN js),
            bp AS (
              SELECT p.doc_id, p.source, p.h,
                     count(b.pos) = 4 AS bloom_positive
              FROM probe p LEFT JOIN bits b ON b.pos = p.pos
              GROUP BY 1, 2, 3)
            SELECT bp.doc_id, bp.source, bp.bloom_positive,
                   EXISTS (SELECT 1 FROM ev WHERE ev.h = bp.h) AS exact_match,
                   bp.bloom_positive AND NOT EXISTS (
                     SELECT 1 FROM ev WHERE ev.h = bp.h) AS false_positive
            FROM bp""",
      "text_normalize" ->
        """SELECT doc_id,
              nfc_normalize(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))))
                AS norm_text,
              nfc_normalize(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))))
                <> text AS changed
           FROM documents""",
      "text_chunks" ->
        """WITH t AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
           c AS (
             SELECT doc_id, toks, n, u.c AS chunk_idx
             FROM n, unnest(range(0, least(
               1 + greatest(n - 32 + 24 - 1, 0) // 24,
               1 + (n - 1) // 24))) u(c))
           SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                  CAST(chunk_idx * 24 AS BIGINT) AS first_token,
                  CAST(least(chunk_idx * 24 + 32, n) - chunk_idx * 24 AS BIGINT) AS n_tokens,
                  array_to_string(toks[chunk_idx * 24 + 1 : least(chunk_idx * 24 + 32, n)], ' ')
                    AS chunk_text
           FROM c""",
      // the full PMI pipeline replayed: unigram/bigram counts over the
      // same token regex, minCount floor, HUGEINT ratio floor, top-25
      "text_collocations" ->
        """WITH tok AS (
             SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents WHERE text IS NOT NULL),
           uni AS (
             SELECT w, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w),
           n AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_tokens FROM uni),
           bg AS (
             SELECT toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                   FROM tok WHERE len(toks) >= 2)),
           bc AS (
             SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
             FROM bg GROUP BY w1, w2 HAVING count(*) >= 5),
           s AS (
             SELECT bc.w1, bc.w2, bc.c_xy, u1.c AS c_x, u2.c AS c_y,
                    CAST((CAST(1000000 AS HUGEINT) * (SELECT n_tokens FROM n) * bc.c_xy)
                       // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS score
             FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w),
           r AS (
             SELECT *, CAST(row_number() OVER (
                    ORDER BY score DESC, w1 ASC, w2 ASC) AS BIGINT) AS rk
             FROM s)
           SELECT w1, w2, c_xy, c_x, c_y, score, rk FROM r WHERE rk <= 25""",
      // pair generation replayed: positions i, distances d in
      // [1, least(4, len-i)], canonical (least, greatest), 1000000 // d
      "text_cooccurrence" ->
        """WITH tok AS (
             SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents WHERE text IS NOT NULL),
           p1 AS (
             SELECT toks, unnest(range(1, len(toks))) AS i
             FROM tok WHERE len(toks) >= 2),
           p2 AS (
             SELECT least(toks[i], toks[i + d]) AS w1,
                    greatest(toks[i], toks[i + d]) AS w2,
                    1000000 // d AS w
             FROM (SELECT toks, i,
                          unnest(range(1, least(4, len(toks) - i) + 1)) AS d
                   FROM p1)),
           agg AS (
             SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(sum(w) AS BIGINT) AS wsum
             FROM p2 GROUP BY w1, w2 HAVING count(*) >= 5),
           r AS (
             SELECT *, CAST(row_number() OVER (
                    ORDER BY wsum DESC, w1 ASC, w2 ASC) AS BIGINT) AS rk
             FROM agg)
           SELECT w1, w2, n_pairs, wsum, rk FROM r WHERE rk <= 25""",
      "text_tfidf" ->
        """WITH tf AS (
             SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                   FROM documents)
             GROUP BY doc_id, tok),
           dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tf GROUP BY term),
           n AS (SELECT count(*) AS n FROM documents),
           s AS (
             SELECT tf.doc_id, tf.term, tf.tf, dfq.dfreq,
                    tf.tf * CAST(length(bin((SELECT n FROM n) // dfq.dfreq)) - 1 AS BIGINT) AS score
             FROM tf JOIN dfq USING (term)),
           r AS (
             SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term ASC) AS BIGINT) AS rk
             FROM s)
           SELECT doc_id, term, tf, dfreq, score, rk FROM r WHERE rk <= 3""",
      // the full bigram-LM pipeline replayed: unigram/bigram counts,
      // min-count pruning, add-one integer-bit surprisal, tercile ranks
      "text_lm_surprisal" ->
        """WITH tok AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents WHERE text IS NOT NULL),
           uni AS (
             SELECT w, CAST(count(*) AS BIGINT) AS c1
             FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w),
           voc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
           bg AS (
             SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
                   FROM tok WHERE len(toks) >= 2)),
           model AS (
             SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
             FROM bg GROUP BY w1, w2 HAVING count(*) >= 2),
           sb AS (
             SELECT bg.doc_id,
                    length(bin((uni.c1 + (SELECT v FROM voc))
                               // (coalesce(model.c2, 0) + 1))) - 1 AS bits
             FROM bg
             JOIN uni ON uni.w = bg.w1
             LEFT JOIN model ON model.w1 = bg.w1 AND model.w2 = bg.w2),
           pd AS (
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                    CAST(sum(bits) AS BIGINT) AS total_bits
             FROM sb GROUP BY doc_id),
           s AS (
             SELECT d.doc_id,
                    coalesce(pd.n_bigrams, 0) AS n_bigrams,
                    coalesce(pd.total_bits, 0) AS total_bits,
                    CASE WHEN coalesce(pd.n_bigrams, 0) > 0
                         THEN CAST(pd.total_bits AS DOUBLE) / pd.n_bigrams
                    END AS mean_bits
             FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
           r AS (
             SELECT doc_id, CAST(row_number() OVER
                      (ORDER BY mean_bits, doc_id) AS BIGINT) AS rnk
             FROM s WHERE mean_bits IS NOT NULL),
           n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r)
           SELECT s.doc_id, s.n_bigrams, s.total_bits, s.mean_bits, r.rnk,
                  CASE WHEN r.rnk IS NULL THEN 'unscored'
                       WHEN r.rnk * 3 <= (SELECT n FROM n) THEN 'head'
                       WHEN r.rnk * 3 <= 2 * (SELECT n FROM n) THEN 'middle'
                       ELSE 'tail' END AS bucket
           FROM s LEFT JOIN r ON r.doc_id = s.doc_id""",
      // the packing layout is a single global cumsum in doc order — the
      // oracle computes it directly; the engine reproduces it exactly via
      // the two-phase bucketed prefix sum
      "text_pack_sequences" ->
        """WITH t AS (
             SELECT doc_id,
                    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS len
             FROM documents),
           c AS (
             SELECT doc_id, len,
                    sum(len) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM t)
           SELECT doc_id, len,
                  CAST((cum - len) // 512 AS BIGINT) AS pack_id,
                  CAST((cum - len) % 512 AS BIGINT) AS pack_offset
           FROM c""",
      // CDC boundaries are content-local and deterministic but not
      // SQL-recomputable; the partition property is: reassembling the
      // ordered chunks must give back EXACTLY the document, and sizes must
      // hold by construction
      "text_cdc_chunks" ->
        """SELECT doc_id, md5(text) AS reassembled_md5,
                  CAST(0 AS BIGINT) AS size_violations
           FROM documents
           WHERE text IS NOT NULL AND length(text) > 0""",
      "text_vocab_topk" ->
        """SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                 FROM documents)
           GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 50""",
      "text_length_quantiles" ->
        """SELECT source,
              quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS p50,
              quantile_cont(CAST(n_chars AS DOUBLE), 0.9) AS p90,
              quantile_cont(CAST(n_chars AS DOUBLE), 0.99) AS p99,
              CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1"""
    )
  }
}
