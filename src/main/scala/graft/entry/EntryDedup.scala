package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** deduplication tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntryDedup {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => {
      Dedup.duplicateGroups(readParquet(s, s"$dir/documents.parquet"), "text", "doc_id")
    }),
    "er_link_pairs" -> ((s, dir) => {
      // blocked record linkage (Fellegi-Sunter, integer weights): the
      // fixture plants one perturbed copy per c_custkey%28 ∈ {3,10,17,24}
      // — only the %28==3 class (1-char name edit, in-tolerance balance,
      // same segment) clears threshold 45; each other class fails on
      // exactly one field (2-edit name / +5.0 balance / altered segment),
      // so every rule's disagree arm decides real pairs. Construction is
      // replicated by the oracle; blocking, levenshtein agreement and
      // integer scoring are exercised for real (the synthesized-payload
      // convention). Accidental base-base matches (lev-1 sequential
      // names + same segment + balance within a cent) are deterministic
      // on both sides, so they verify too if they occur. Blocking is the
      // COMPOSITE (nation, segment): with threshold 45 only full
      // agreement (60) clears, so a segment-disagreeing pair (<= 35) can
      // never match and the composite block provably emits the identical
      // match set at 1/5 the candidate volume — the blocking-design
      // lesson the candidate-volume guard teaches at scale.
      RecordLinkage.linkPairs(erFixture(s, dir), "rec_id",
        Seq(col("c_nationkey"), col("c_mktsegment")), erRules, threshold = 45L)
    }),
    "er_multipass_pairs" -> ((s, dir) => {
      // multi-pass blocking coverage: nulling c_nationkey for the
      // rec-id%56==3 half of the matched class hides those records from
      // the (nation, segment) pass entirely (null block keys never
      // pair); the second pass on (segment, floor(balance)) recovers
      // them — the planted copy shifts balance by +0.005, so the pair
      // shares a floor bucket unless it straddles an integer boundary
      // (deterministic on both sides). Pairs found by both passes
      // dedupe to ONE scored row; the oracle replays both passes,
      // the union-distinct, and the scoring.
      val fx = erFixture(s, dir).withColumn("c_nationkey",
        when(pmod(col("rec_id") % 1000000000L, lit(56L)) === 3L,
          lit(null).cast("int")).otherwise(col("c_nationkey")))
      RecordLinkage.linkPairsMultiPass(fx, "rec_id",
        Seq(Seq(col("c_nationkey"), col("c_mktsegment")),
          Seq(col("c_mktsegment"), floor(col("c_acctbal")))),
        erRules, threshold = 45L)
    }),
    "er_canonical" -> ((s, dir) => {
      // golden-record materialization: each entity keeps its
      // highest-balance record (the dirty copies are +0.005, so a
      // matched entity keeps the copy — deterministic, no tie), ties by
      // min id. Full pipeline: block -> score -> CC -> rank -> keep.
      val fx = erFixture(s, dir)
      RecordLinkage.canonicalizeEntities(fx, "rec_id",
        RecordLinkage.linkPairs(fx, "rec_id",
          Seq(col("c_nationkey"), col("c_mktsegment")), erRules,
          threshold = 45L),
        preferBy = col("c_acctbal"))
    }),
    "ss_er" -> ((s, dir) => {
      // ingest-time (streaming) record linkage: the fixture arrives as
      // THREE ordered micro-batches (two base slices, then the dirty
      // copies as the increment) and the driver-side fold of
      // linkPairs / linkPairsIncremental steps must hash-equal the
      // ONE-SHOT blocked scoring — the oracle IS er_link_pairs' SQL.
      // Pair semantics are order-free (each pair scores once, in the
      // step its later member arrives), so any split works; the real
      // foreachBatch drive parity is pinned in StreamOpsSpec.
      val fx = erFixture(s, dir)
      graft.streaming.StreamOps.onlineLinkIngest(
        Seq(fx.filter(col("rec_id") < 750),
          fx.filter(col("rec_id") >= 750 && col("rec_id") < 1000000000L),
          fx.filter(col("rec_id") >= 1000000000L)),
        "rec_id", Seq(col("c_nationkey"), col("c_mktsegment")),
        erRules, threshold = 45L)
    }),
    "er_patterns" -> ((s, dir) => {
      // the Fellegi-Sunter sufficient statistic: agreement-pattern
      // histogram over the blocked pairs (<= 3^3 rows here) — what the
      // EM weight estimator consumes (estimateWeights is driver math
      // over this frame, spec-pinned on a planted mixture).
      RecordLinkage.agreementPatterns(erFixture(s, dir), "rec_id",
        Seq(col("c_nationkey"), col("c_mktsegment")), erRules)
    }),
    "er_incremental_pairs" -> ((s, dir) => {
      // ingest-time linkage: the dirty copies (rec_id >= 1e6) arrive as
      // the increment; only new-vs-existing and new-vs-new pairs are
      // scored (increment-proportional cost), never the settled
      // existing-vs-existing set. The oracle is the full blocked scoring
      // restricted to pairs touching a new id — the same set by the
      // spec-pinned incremental identity.
      RecordLinkage.linkPairsIncremental(erFixture(s, dir), "rec_id",
        isNew = col("rec_id") >= 1000000000L,
        Seq(col("c_nationkey"), col("c_mktsegment")), erRules, threshold = 45L)
    }),
    "er_ab_pairs" -> ((s, dir) => {
      // cross-TABLE linkage: the base customers as source A, the dirty
      // copies as source B with their ORIGINAL ids (idOffset = 0) — the
      // colliding-id-space setting the self-join form can only dodge with
      // the +1e6 offset hack. The matched class releases the pair (k, k)
      // across sources (legal here: id_a is A's namespace, id_b is B's);
      // A-A and B-B pairs are structurally impossible. Same mutation arms
      // and rules as er_link_pairs, so the released classes replay
      // identically.
      val base = erBase(s, dir)
      RecordLinkage.linkPairsAB(base, erDirtyCopies(base, 0L), "rec_id",
        Seq(col("c_nationkey"), col("c_mktsegment")), erRules, threshold = 45L)
    }),
    "er_lsh_pairs" -> ((s, dir) => {
      // banded-LSH blocking over a NOISY STRING key — the scale-safe arm
      // for string keys with no exact block value and no orderable proxy
      // (equi-blocks wall on skew, SNM needs order). The fixture derives a
      // high-entropy address-like key (md5 hex of the base name) and gives
      // every dirty copy a 1-char edit of its BASE's key, so true pairs
      // share ~29/31 char trigrams (J≈0.94 — banded buckets collide with
      // prob ~1) while unrelated keys share ~none (J≈0.004). The whole
      // pipeline — char shingles, md5 shingle hashes, linear-congruential
      // permutation minima, 16x4 band buckets, candidate distinct, the
      // Fellegi-Sunter scoring — is exact integer arithmetic the oracle
      // replays end-to-end (the dedup_minhash_md5 convention).
      RecordLinkage.lshLinkPairs(erLshFixture(s, dir), "rec_id",
        blockString = col("c_addr"), erRules, threshold = 45L)
    }),
    "er_lsh_capped" -> ((s, dir) => {
      // the mass-duplicate escape: the fixture plants one shared literal
      // key on the rec_id%28==5 class (~3.5% of the base — placeholder
      // addresses, bulk registrations), whose band buckets go quadratic
      // uncapped; maxBucket=8 routes them through the star collapse
      // (n-1 rep-member pairs per hot bucket), the guard accounts the
      // POST-collapse volume, and every stage — bucket histogram, min-id
      // representative, star + small-bucket pair union, FS scoring — is
      // deterministic integer arithmetic the oracle replays end-to-end.
      // (Hot-class star pairs score name disagree -20 + balance disagree
      // -10 and drop below threshold; the typo'd true pairs ride their
      // other, small buckets exactly as in er_lsh_pairs.)
      RecordLinkage.lshLinkPairs(erLshHotFixture(s, dir), "rec_id",
        blockString = col("c_addr"), erRules, threshold = 45L,
        maxBucket = 8)
    }),
    "er_snm_pairs" -> ((s, dir) => {
      // sorted-neighborhood blocking: global rank by (balance, id) —
      // distributed via floor(balance/100) buckets + one driver prefix
      // sum, alignment VERIFIED — then every pair within 10 ranks is
      // scored. The planted copies shift balance by +0.005, so true
      // pairs sort adjacently; candidate volume is exactly 10n (linear,
      // skew-immune — the blocking arm for keys where equi-blocks go
      // quadratic). The oracle replays the rank as one SQL row_number.
      RecordLinkage.sortedNeighborhoodPairs(erFixture(s, dir), "rec_id",
        sortKey = col("c_acctbal"),
        bucket = floor(col("c_acctbal") / 100).cast("long"),
        windowSize = 10, rules = erRules, threshold = 45L)
    }),
    "er_entities" -> ((s, dir) => {
      // entity resolution over the same pair set: matched records carry
      // their connected component's min id, singletons themselves; the
      // oracle replays CC as a recursive reachability CTE
      val fx = erFixture(s, dir)
      RecordLinkage.resolveEntities(fx, "rec_id",
        RecordLinkage.linkPairs(fx, "rec_id",
          Seq(col("c_nationkey"), col("c_mktsegment")), erRules, threshold = 45L))
    }),
    "dedup_minhash" -> ((s, dir) => {
      // LSH candidate generation is hash-dependent => rows-only; DedupSpec
      // verifies planted near-dups are found. The corpus has real near-dups.
      Dedup.minHashLSH(readParquet(s, s"$dir/documents.parquet"),
        "doc_id", "text", threshold = 0.6)
    }),
    "dedup_minhash_md5" -> ((s, dir) => {
      // the minhash+LSH pipeline with PORTABLE hashing (md5 shingle hashes,
      // linear-congruential permutations mod 2^31-1, string band buckets) —
      // the hash-independent twin of dedup_minhash, verified END-TO-END
      // against the DuckDB oracle: shingling, one-hash signatures, band
      // blocking, and the exact-Jaccard verify are all recomputed in SQL.
      Dedup.minHashLSHPortable(readParquet(s, s"$dir/documents.parquet"),
        "doc_id", "text", threshold = 0.6)
    }),
    "dedup_leakage_split" -> ((s, dir) => {
      // leakage-safe train/val/test split: whole near-dup clusters (CC
      // over the oracle-verified portable minhash pairs) routed 80/10/10
      // by the salted hash of the cluster representative — near-copies
      // can never straddle the train/test boundary. Fully deterministic
      // => oracle-exact end-to-end (pairs, components, hash, thresholds).
      val docs = readParquet(s, s"$dir/documents.parquet")
      val pairs = Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6)
      CorpusOps.leakageSafeSplit(docs, "doc_id", pairs,
        Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
    }),
    "dedup_funnel" -> ((s, dir) => {
      // the dedup FUNNEL a release review reads: sequential stage
      // attrition — input -> exact text dedup (min-id survivor) ->
      // near-dup collapse (minhash CC over the exact survivors, keep the
      // min-label member) — one row per stage with in/dropped/out. The
      // three stage counts are 1-value driver actions (bounded by
      // construction); each stage's machinery is the already-gate-checked
      // operator, so the funnel is the composition, oracle-replayed
      // end-to-end over the SAME survivor subset.
      import s.implicits._
      val docs = readParquet(s, s"$dir/documents.parquet")
      val n0 = docs.count()
      val surv = Dedup.dedupExact(docs, Seq("text"), "doc_id")
        .localCheckpoint(false) // consumed by count + the near stage
      val n1 = surv.count()
      val pairs = Dedup.minHashLSHPortable(surv, "doc_id", "text", threshold = 0.6)
      val nd = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .filter(col("id") =!= col("comp")).count()
      Seq(
        ("input", n0, 0L, n0),
        ("exact_dedup", n0, n0 - n1, n1),
        ("near_dup", n1, nd, n1 - nd))
        .toDF("stage", "n_in", "n_dropped", "n_out")
    }),
    "dedup_incremental_components" -> ((s, dir) => {
      // daily-ingest label maintenance: the label store built from the
      // "yesterday" half of the pair set (id_b < 250) is folded forward
      // with the increment (pairs touching docs >= 250) WITHOUT corpus-
      // wide CC — rep-graph CC + broadcast relabel, work proportional to
      // the increment. The result must be indistinguishable from the
      // from-scratch labeling, so the oracle is the full-CC replay.
      val pairs = Dedup.minHashLSHPortable(
          readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
          threshold = 0.6)
        .localCheckpoint(false) // consumed by both the store and increment branches
      val labels = Dedup.connectedComponents(
        pairs.filter(col("id_b") < 250).select("id_a", "id_b"))
      Dedup.incrementalComponents(labels,
          pairs.filter(col("id_b") >= 250).select("id_a", "id_b"))
        .select(col("id"), col("comp").as("component"))
    }),
    "dedup_components" -> ((s, dir) => {
      // duplicate clusters: connected components (min-label propagation)
      // over the oracle-verified portable-minhash pair set — the step that
      // turns near-dup pairs into per-cluster keep decisions
      val pairs = Dedup.minHashLSHPortable(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text", threshold = 0.6)
      Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .select(col("id"), col("comp").as("component"))
    }),
    "dedup_url" -> ((s, dir) => {
      // URL-LEVEL dedup (the crawl-dedup stage before content hashing):
      // canonicalize — lower scheme/host, strip default port, www.,
      // fragment, tracking params, trailing slash — then group. The
      // fixture carries no URLs, so three deterministic messy variants are
      // planted per doc (the text_url_domains pattern): u1/u2 differ only
      // in canonicalization-removable noise — userinfo, lowercase escape
      // hex (%2f vs %2F, %4a vs %4A), an encoded unreserved char (%7e vs
      // ~) — and MUST collapse; the raw non-escape '%zz' must pass
      // through untouched on both engines (the escape grammar boundary).
      // u3 collides across docs sharing (id mod 11, id mod 100). Pure
      // string algebra => oracle-exact end-to-end.
      val d = col("doc_id")
      val u1 = concat(lit("HTTPS://User:Pw@WWW.Site-"), (d % 37).cast("string"),
        lit(".Example.com:443/p%7e/"), d.cast("string"),
        lit("/?utm_source=feed&ref=r"), (d % 5).cast("string"),
        lit("%2fx&q=a%4a%zz#sec"))
      val u2 = concat(lit("https://site-"), (d % 37).cast("string"),
        lit(".example.com/p~/"), d.cast("string"),
        lit("?ref=r"), (d % 5).cast("string"), lit("%2Fx&q=a%4A%zz"))
      val u3 = concat(lit("http://other-"), (d % 11).cast("string"),
        lit(".example.org:80/a/"), (d % 100).cast("string"))
      TextAnalysis.urlDedup(
        readParquet(s, s"$dir/documents.parquet").select("doc_id")
          .select(d, explode(array(u1, u2, u3)).as("url")),
        "doc_id", "url")
    }),
    "dedup_containment" -> ((s, dir) => {
      // doc-inside-doc detection: the same portable banded candidates
      // verified by CONTAINMENT (|A∩B| / min(|A|,|B|)) instead of Jaccard
      // — the signal that catches quotes/concatenations whose Jaccard is
      // diluted by the containing document's length. Exact on every
      // candidate and SQL-replayed end-to-end (recall caveat for
      // extreme-size-ratio pairs documented on the operator).
      Dedup.containmentPortable(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        threshold = 0.8)
    }),
    "dedup_cluster_sizes" -> ((s, dir) => {
      // duplicate-cluster size histogram — the rollup an operator reads
      // BEFORE materializing a dedup (one giant cluster usually means a
      // boilerplate/template pathology, many pairs means near-dup spam):
      // clusters per size, docs tied up per size. Same oracle-verified
      // portable pair set + components as dedup_components.
      val pairs = Dedup.minHashLSHPortable(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text", threshold = 0.6)
      Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .groupBy("comp").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"))
    }),
    "dedup_best_of_cluster" -> ((s, dir) => {
      // canonical selection by QUALITY, not crawl order: each dup
      // cluster keeps its longest member (n_chars as the quality proxy,
      // tie -> min id) — what a production dedup materializes. One row
      // per doc with (cluster_rep, keep); fully deterministic =>
      // oracle-exact end-to-end.
      val docs = readParquet(s, s"$dir/documents.parquet")
      val pairs = Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6)
      Dedup.bestOfCluster(docs, "doc_id", "n_chars", pairs)
    }),
    "dedup_materialize" -> ((s, dir) => {
      // APPLY the dedup decision: non-canonical cluster members (id != its
      // component's min-label) are dropped via LEFT ANTI join, and the
      // surviving corpus is profiled per source. The drop list is tiny
      // relative to the corpus, so at scale the anti-join broadcasts —
      // the whole materialization costs one corpus scan.
      val docs = readParquet(s, s"$dir/documents.parquet")
      val pairs = Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6)
      val comp = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      val drops = comp.filter(col("id") =!= col("comp"))
      docs.join(broadcast(drops), docs("doc_id") === drops("id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_chars")).as("chars_kept"))
    }),
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simHashPairs(readParquet(s, s"$dir/documents.parquet"),
        "doc_id", "text", maxHamming = 3)
    }),
    "dedup_simhash_md5" -> ((s, dir) => {
      // the simhash pipeline with PORTABLE md5-derived token hashes — the
      // hash-independent twin of dedup_simhash, verified END-TO-END against
      // the DuckDB oracle (bit-majority signature, pigeonhole chunk
      // blocking, exact Hamming verify).
      Dedup.simHashPairsPortable(readParquet(s, s"$dir/documents.parquet"),
        "doc_id", "text", maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
    }),
    "dedup_incremental" -> ((s, dir) => {
      // ingest-time dedup: a new batch (doc_id % 10 == 0) checked against
      // the existing corpus (the rest). Candidates pair increment x corpus
      // buckets only — never corpus x corpus — so a daily batch costs
      // increment-proportional work at any corpus size. Portable md5
      // hashing end-to-end => oracle replicates the full pair set and the
      // best-match argmax.
      val docs = readParquet(s, s"$dir/documents.parquet")
      Dedup.incrementalNearDupsPortable(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", threshold = 0.6)
    }),
    "dedup_incremental_sigs" -> ((s, dir) => {
      // the signature-STORE workflow: stage-1 corpus signatures are persisted
      // ONCE (parquet store, built on first invocation), and each ingest
      // batch then runs increment-only work against the stored frame — the
      // thing that makes incremental dedup actually incremental at corpus
      // scale (the plain dedup_incremental re-signs the corpus every batch
      // and pays O(corpus) md5 per call). Same batch split, same output,
      // same oracle as dedup_incremental; the bench delta between the two
      // queries IS the stored-signature saving.
      val docs = readParquet(s, s"$dir/documents.parquet")
      // store key = dir + source-data fingerprint + PID: a fixture refresh
      // changes the fingerprint (no stale signatures), and two concurrent
      // graft JVMs never race on one store path
      val srcMeta = new java.io.File(s"$dir/documents.parquet")
      val fp = java.lang.Long.toHexString(
        srcMeta.lastModified() ^ (srcMeta.length() * 1099511628211L))
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_sig_store_v1_${Integer.toHexString(dir.hashCode)}_" +
          s"${fp}_${ProcessHandle.current().pid()}")
      // completeness gate, not mere existence: a write that died mid-job
      // leaves a directory WITHOUT _SUCCESS, and trusting it would
      // silently shrink every later invocation's pair set in this JVM —
      // rebuild over any store that didn't commit
      if (!new java.io.File(store, "_SUCCESS").exists()) {
        Dedup.minHashWithSigPortable(docs.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", shingleSize = 3, numHashes = 128)
          .write.mode("overwrite").parquet(store.getAbsolutePath)
      }
      Dedup.incrementalNearDupsFromSigs(
        docs.filter(col("doc_id") % 10 === 0),
        s.read.parquet(store.getAbsolutePath),
        "doc_id", "text", threshold = 0.6)
    }),
    "dedup_ngram_jaccard" -> ((s, dir) => {
      // exact char-3-gram jaccard on the first 100 chars, blocked by lang
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("head", lower(substring(col("text"), 1, 100)))
      Dedup.ngramJaccardPairs(docs, "doc_id", "head", "lang", n = 3, threshold = 0.8)
    }),
    "dedup_embedding" -> ((s, dir) => {
      // exact cosine near-dup pairs — BOUNDED oracle anchor: the all-pairs
      // join is quadratic by nature, so the exact variant runs on a fixed
      // subset (vec_id < 500, constant work at any sf). The corpus-scale
      // path is dedup_embedding_lsh, which asserts recall against this
      // exact pair set in-query. Embeddings quantized to 1/1024 so all
      // arithmetic is order-independent (oracle parity).
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 500)
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
      val l = e.select(col("label"), col("vec_id").as("id_a"), col("emb").as("v_a"))
      val r = e.select(col("label"), col("vec_id").as("id_b"), col("emb").as("v_b"))
      l.join(r, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.3)
        .select("id_a", "id_b", "cosine")
    }),
    "dedup_embedding_lsh" -> ((s, dir) => {
      // banded-LSH near-dup — the CORPUS-SCALE headline (bucketed ids-only
      // candidates, never an unblocked n^2). Two in-query quality probes:
      // (a) 200 planted near-copies (cosine ~0.9999, id = -(orig+1) —
      //     NEGATIVE ids never collide with real vec_ids at any corpus
      //     size) must be recovered;
      // (b) recall against the EXACT all-pairs result on the bounded anchor
      // subset (id < 500 + its planted copies — the dedup_embedding set).
      // Hash-dependent => rows-only; DedupSpec asserts recall >= 0.95.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      val planted = e.filter(col("id") < 200)
        .select((-(col("id") + lit(1L))).as("id"),
          expr("transform(vec, (x, i) -> x + 0.02 * cos(CAST(i AS DOUBLE)))").as("vec"))
      val corpus = e.unionByName(planted)
      val lsh = Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95)
        .select(col("id_a"), col("id_b"), lit(1L).as("in_lsh"))
      val sub = corpus.filter(col("id") < 500)
      val la = sub.select(col("id").as("id_a"), col("vec").as("v_a"))
      val rb = sub.select(col("id").as("id_b"), col("vec").as("v_b"))
      // explicit broadcast: the bounded side has no stats after union+filter,
      // so Spark would otherwise plan a 32x32-partition CartesianProduct
      // whose task overhead dwarfs the 245k-pair compute
      val exact = la.join(broadcast(rb), col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.95)
        .select(col("id_a"), col("id_b"), lit(1L).as("in_exact"))
      // single pass: a full-outer join on the pair key feeds every probe
      // counter from one aggregate, so the LSH and exact pipelines each run
      // exactly once (no checkpoint barriers, no re-reads)
      lsh.join(exact, Seq("id_a", "id_b"), "full_outer")
        .agg(
          // the planted pair orders as (copy, original): -(x+1) < x always
          sum(when(col("in_lsh").isNotNull &&
              col("id_a") === -(col("id_b") + lit(1L)), 1L).otherwise(0L))
            .as("n_planted_found"),
          sum(when(col("in_lsh").isNotNull, 1L).otherwise(0L)).as("n_pairs_total"),
          sum(when(col("in_exact").isNotNull, 1L).otherwise(0L)).as("n_exact_pairs"),
          sum(when(col("in_exact").isNotNull && col("in_lsh").isNotNull, 1L)
            .otherwise(0L)).as("n_exact_found"))
        .select(lit(200L).as("n_planted"), col("n_planted_found"),
          col("n_pairs_total"), col("n_exact_pairs"), col("n_exact_found"))
    }),
    "dedup_segments" -> ((s, dir) => {
      // sub-document exact dedup with reassembly (Lee et al. ExactSubstr at
      // 10-word-segment granularity): only the globally FIRST occurrence of
      // a repeated segment survives; docs reassemble from their kept
      // segments in position order. No hashing in the dedup key =>
      // deterministic end-to-end; the reassembled text is compared as md5
      // to keep the gate compact.
      Dedup.dedupSegments(readParquet(s, s"$dir/documents.parquet"),
          "doc_id", "text", segmentWords = 10)
        .select(col("doc_id"), col("n_segs"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
    }),
    "dedup_freq_segments" -> ((s, dir) => {
      // boilerplate removal (MassiveText/RefinedWeb line-dedup rule):
      // segments occurring > 2 times corpus-wide drop from EVERY doc —
      // first copies included — because cross-doc repetition at that rate
      // is template boilerplate, not content. Deterministic end-to-end
      // (no hashing in the decision), md5 of reassembled text for the gate.
      Dedup.removeFrequentSegments(readParquet(s, s"$dir/documents.parquet"),
          "doc_id", "text", segmentWords = 10, maxFreq = 2)
        .select(col("doc_id"), col("n_segs"), col("n_kept"),
          md5(col("text_kept")).as("kept_md5"))
    }),
    "dedup_semantic_exact" -> ((s, dir) => {
      // SemDeDup with nlist=1 — exact all-pairs over a BOUNDED subset, the
      // oracle anchor driving the full machinery (pairwise cosine ->
      // threshold -> connected components -> min-id representative) with
      // clustering disabled. Duplicate structure is planted: 100 copies
      // (id = -(orig+1)) perturbed by the DYADIC (i%3 - 1)/256 per
      // coordinate — exactly representable in doubles, so both engines
      // compute identical vectors (a cos(i)-style perturbation would risk
      // 1-ulp libm-vs-Java drift); planted cosine ~0.9998, max natural
      // pairwise cosine in the subset is 0.513 -> clean separation at 0.98.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 400)
        .withColumn("emb", expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024)"))
        .select("vec_id", "emb")
      val planted = e.filter(col("vec_id") < 100)
        .select((-(col("vec_id") + lit(1L))).as("vec_id"),
          expr("transform(emb, (x, i) -> x + (CAST(i % 3 AS DOUBLE) - 1.0D) / 256.0D)").as("emb"))
      Dedup.semanticDedup(e.unionByName(planted), "vec_id", "emb",
        threshold = 0.98, nlist = 1)
    }),
    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup headline: k-means cells (auto-sized), exact pairwise
      // within cells only. Clustering-dependent => rows-only, with the
      // in-query probe pattern: 200 planted near-copies (dyadic
      // perturbation, negative ids) are caught iff copy and original land
      // in the same cell AND connect — the one-row output counts them, so
      // silent recall collapse (e.g. a quantizer regression splitting
      // near-identical vectors across cells) is visible to the row check;
      // DedupSpec pins the bound.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      val planted = e.filter(col("id") < 200)
        .select((-(col("id") + lit(1L))).as("id"),
          expr("transform(vec, (x, i) -> x + (CAST(i % 3 AS DOUBLE) - 1.0D) / 256.0D)").as("vec"))
      plantedSemanticProbe(
        Dedup.semanticDedup(e.unionByName(planted), "id", "vec",
          threshold = 0.98))
    }),
    "dedup_semantic_windowed" -> ((s, dir) => {
      // the LINEAR-cost semantic-dedup mode: members sort by centroid
      // distance within each cell and compare only to their next `window`
      // neighbors — |corpus|*window cosine evals, immune to hot-cell
      // quadratic blowup (THE 100 TB mode; the exact-within-cell pass is
      // the quality anchor). Same probe row as dedup_semantic.
      val e = readParquet(s, s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      val planted = e.filter(col("id") < 200)
        .select((-(col("id") + lit(1L))).as("id"),
          expr("transform(vec, (x, i) -> x + (CAST(i % 3 AS DOUBLE) - 1.0D) / 256.0D)").as("vec"))
      plantedSemanticProbe(
        Dedup.semanticDedup(e.unionByName(planted), "id", "vec",
          threshold = 0.98, window = 8))
    }),
    "dedup_dup_spans" -> ((s, dir) => {
      // cross-doc duplicated 5-gram span stats (exact-substring dedup
      // signal); portable md5 gram hashes => END-TO-END oracle-verifiable
      Dedup.duplicatedSpanStats(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text", n = 5)
    }),
    "dedup_remove_spans" -> ((s, dir) => {
      // the REMOVAL step over the same signal (Lee et al.): drop every
      // token covered by a cross-doc duplicated 5-gram, reassemble, and
      // fingerprint the surviving token stream — the rewrite itself is
      // hash-verified (kept_md5), not just its statistics
      Dedup.removeDuplicatedSpans(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text", n = 5)
    }),
    "dedup_exact_substr" -> ((s, dir) => {
      // CHARACTER-granular ExactSubstr (the full Lee et al. mechanism at
      // arbitrary boundaries, r15): every char covered by a non-first
      // occurrence of a duplicated 30-char window scrubs, the globally
      // first occurrence survives — the suffix-array removal set via
      // portable 60-bit window fingerprints (one per char position).
      // The oracle replays the WHOLE derivation: per-position window
      // md5s, first-occurrence keying, coverage union, per-char
      // reassembly, kept-text md5.
      Dedup.exactSubstrDedup(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        minLen = 30)
    })
  )

  /** DuckDB replay of TextAnalysis.normalizePercentEncoding, generated
    * from the same letter list / decode table (TextAnalysis.unreservedPunct)
    * as the Column fold so the two chains cannot drift. DuckDB's
    * backreference syntax is `\1` where Spark's replacement is `$1` — the
    * only textual divergence, and it is syntax, not semantics. */
  private def pctChainSql(inner: String): String = {
    val letters = "abcdef"
    var e = inner
    for (l <- letters)
      e = s"regexp_replace($e, '%$l([0-9A-Fa-f])', '%${l.toUpper}\\1', 'g')"
    for (l <- letters)
      e = s"regexp_replace($e, '%([0-9A-F])$l', '%\\1${l.toUpper}', 'g')"
    for ((hex, ch) <- graft.ops.TextAnalysis.unreservedPunct)
      e = s"regexp_replace($e, '%$hex', '$ch', 'g')"
    e
  }

  /** Dirty-copy ER fixture over customer: one perturbed copy per
    * c_custkey%28 ∈ {3,10,17,24} at rec_id + 1000000000. Perturbations per
    * class: 3 = all fields agree (1-char name edit, +0.005 balance, same
    * segment); 10 = 2-char name edit; 17 = +5.0 balance; 24 = segment
    * replaced. Replayed verbatim by [[erFixtureSql]]. */
  /** The guarded base customer projection shared by every ER fixture:
    * the dirty-copy id space starts at 1000000000 and er_multipass (%1000000000
    * un-mask), er_incremental/ss_er (rec_id >= 1000000000 == "new") all rely
    * on base ids staying BELOW it — a scale-ladder replica set large
    * enough to cross 1e6 (>~66 replicas at sf0.01) would silently collide,
    * so fail loud in-plan instead (no extra action; the filter arm only
    * evaluates on rows that would actually collide). `withAddr` adds the
    * LSH fixture's high-entropy address-shaped key (md5 hex of the name). */
  private def erBase(s: SparkSession, dir: String,
      withAddr: Boolean = false): DataFrame = {
    val base = readParquet(s, s"$dir/customer.parquet")
      .select(
        when(col("c_custkey").cast("long") >= 1000000000L,
          raise_error(lit("erBase: base rec_id >= 1000000000 collides with " +
            "the dirty-copy id space — shrink the input or rebase the " +
            "offset")).cast("long"))
          .otherwise(col("c_custkey").cast("long")).as("rec_id"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    if (withAddr) base.withColumn("c_addr", md5(col("c_name"))) else base
  }

  /** THE dirty-copy mutation arms — one definition for all three ER
    * fixtures (self-join, LSH, cross-table), so the arms the oracles
    * replay verbatim cannot drift between fixtures. One perturbed copy per
    * rec_id%28 ∈ {3,10,17,24}: 3 = all fields agree (1-char name edit,
    * +0.005 balance, same segment); 10 = 2-char name edit; 17 = +5.0
    * balance; 24 = segment replaced. `idOffset` = 1000000000 for the
    * self-join fixtures (disjoint id space), 0 for the cross-table one
    * (colliding id spaces are the POINT there). A base carrying `c_addr`
    * gets the 1-char key edit (the LSH typo'd-key shape). */
  private def erDirtyCopies(base: DataFrame, idOffset: Long): DataFrame = {
    val m = col("rec_id") % 28
    val cols = Seq(
      (col("rec_id") + idOffset).as("rec_id"),
      when(m === 10L,
        concat(expr("substring(c_name, 1, length(c_name) - 2)"), lit("XY")))
        .otherwise(
          concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X")))
        .as("c_name"),
      col("c_nationkey"),
      when(m === 17L, col("c_acctbal") + 5.0)
        .otherwise(col("c_acctbal") + 0.005).as("c_acctbal"),
      when(m === 24L, lit("ALTERED")).otherwise(col("c_mktsegment"))
        .as("c_mktsegment")) ++
      (if (base.columns.contains("c_addr"))
        Seq(concat(expr("substring(c_addr, 1, 31)"), lit("X")).as("c_addr"))
      else Nil)
    base.filter(m.isin(3L, 10L, 17L, 24L)).select(cols: _*)
  }

  private def erFixture(s: SparkSession, dir: String): DataFrame = {
    val base = erBase(s, dir)
    base.unionByName(erDirtyCopies(base, 1000000000L))
  }

  /** [[erFixture]] plus the synthesized noisy STRING key for the LSH
    * blocking arm: base records carry `c_addr` = md5 hex of their name (32
    * high-entropy chars — the address-shaped key the base tables lack);
    * each dirty copy carries its BASE's key with the last char replaced by
    * 'X' (a 1-char edit — the realistic typo'd-key shape). Same guarded
    * base + shared mutation arms as every ER fixture; replayed verbatim by
    * the er_lsh_pairs oracle. */
  private def erLshFixture(s: SparkSession, dir: String): DataFrame = {
    val base = erBase(s, dir, withAddr = true)
    base.unionByName(erDirtyCopies(base, 1000000000L))
  }

  /** [[erLshFixture]] with a planted MASS-DUPLICATE key: every base record
    * with rec_id%28 == 5 (a class disjoint from the dirty-copy classes)
    * gets the same 32-char placeholder address — the "N/A" / bulk-
    * registration shape that puts ~1/28 of the corpus into ONE set of band
    * buckets and goes quadratic without a cap. Deterministic, so the
    * er_lsh_capped oracle replays the star collapse bit-for-bit. */
  private def erLshHotFixture(s: SparkSession, dir: String): DataFrame = {
    val base = erBase(s, dir, withAddr = true)
      .withColumn("c_addr",
        when(col("rec_id") % 28 === 5L,
          lit("00000000000000000000000000000000"))
          .otherwise(col("c_addr")))
    base.unionByName(erDirtyCopies(base, 1000000000L))
  }

  /** The gate's field rules: agree/disagree weights chosen so the maximum
    * score is 60 and ANY single disagreement drops below threshold 45. */
  private def erRules = Seq(
    FuzzyStringField("name", col("c_name"), maxEdit = 1, 30L, -20L),
    ExactField("segment", col("c_mktsegment"), 10L, -15L),
    NumericField("balance", col("c_acctbal"), 0.01, 20L, -10L))

  /** The fixture + blocking + scoring replayed in SQL — shared by both er_
    * oracle arms so they cannot drift from each other. */
  private def erScoredSql: String =
    """base AS (
         SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name, c_nationkey,
                c_acctbal, c_mktsegment
         FROM customer),
       dirty AS (
         SELECT b.rec_id + 1000000000 AS rec_id,
                CASE WHEN b.rec_id % 28 = 10
                     THEN substring(b.c_name, 1, length(b.c_name) - 2) || 'XY'
                     ELSE substring(b.c_name, 1, length(b.c_name) - 1) || 'X'
                END AS c_name,
                b.c_nationkey,
                CASE WHEN b.rec_id % 28 = 17 THEN b.c_acctbal + 5.0
                     ELSE b.c_acctbal + 0.005 END AS c_acctbal,
                CASE WHEN b.rec_id % 28 = 24 THEN 'ALTERED'
                     ELSE b.c_mktsegment END AS c_mktsegment
         FROM base b WHERE b.rec_id % 28 IN (3, 10, 17, 24)),
       recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
       weighted AS (
         SELECT a.rec_id AS id_a, b.rec_id AS id_b,
                CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
                     WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30
                     ELSE -20 END AS name_w,
                CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
                     WHEN a.c_mktsegment = b.c_mktsegment THEN 10
                     ELSE -15 END AS segment_w,
                CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
                     WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.01 THEN 20
                     ELSE -10 END AS balance_w
         FROM recs a JOIN recs b
           ON a.c_nationkey = b.c_nationkey
          AND a.c_mktsegment = b.c_mktsegment AND a.rec_id < b.rec_id),
       scored AS (
         SELECT id_a, id_b, CAST(name_w AS BIGINT) AS name_w,
                CAST(segment_w AS BIGINT) AS segment_w,
                CAST(balance_w AS BIGINT) AS balance_w,
                CAST(name_w + segment_w + balance_w AS BIGINT) AS score
         FROM weighted WHERE name_w + segment_w + balance_w >= 45)"""

  /** The LSH-linkage oracle, parameterized by the two er_lsh variation
    * points — the planted shared-literal key (er_lsh_capped's fixture) and
    * the bucket cap (0 = plain full bucket join) — so both gate rows
    * replay ONE pipeline definition and cannot drift. The capped arm
    * replays the star collapse exactly: per-(band, bucket) histogram,
    * min-id representative, full join for small buckets UNION star pairs
    * for over-cap ones, then the same distinct + FS scoring. */
  private def erLshOracleSql(hotKey: Boolean, maxBucket: Int): String = {
    import OracleFragments._
    val addrExpr =
      if (hotKey)
        """CASE WHEN CAST(c_custkey AS BIGINT) % 28 = 5
                THEN '00000000000000000000000000000000'
                ELSE md5(c_name) END"""
      else "md5(c_name)"
    val candSql =
      if (maxBucket <= 0)
        """cand AS (
              SELECT DISTINCT a.rec_id AS id_a, b.rec_id AS id_b
              FROM sig a JOIN sig b
                ON a.band = b.band AND a.bucket = b.bucket
               AND a.rec_id < b.rec_id)"""
      else
        s"""stats AS (
              SELECT band, bucket, count(*) AS bn, min(rec_id) AS rep
              FROM sig GROUP BY band, bucket),
            cand AS (
              SELECT DISTINCT id_a, id_b FROM (
                SELECT a.rec_id AS id_a, b.rec_id AS id_b
                FROM sig a JOIN sig b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.rec_id < b.rec_id
                JOIN stats s
                  ON s.band = a.band AND s.bucket = a.bucket
                WHERE s.bn <= $maxBucket
                UNION ALL
                SELECT s.rep AS id_a, g.rec_id AS id_b
                FROM sig g JOIN stats s
                  ON s.band = g.band AND s.bucket = g.bucket
                WHERE s.bn > $maxBucket AND g.rec_id <> s.rep))"""
    s"""WITH base AS (
          SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name, c_nationkey,
                 c_acctbal, c_mktsegment, $addrExpr AS c_addr
          FROM customer),
        dirty AS (
          SELECT b.rec_id + 1000000000 AS rec_id,
                 CASE WHEN b.rec_id % 28 = 10
                      THEN substring(b.c_name, 1, length(b.c_name) - 2) || 'XY'
                      ELSE substring(b.c_name, 1, length(b.c_name) - 1) || 'X'
                 END AS c_name,
                 b.c_nationkey,
                 CASE WHEN b.rec_id % 28 = 17 THEN b.c_acctbal + 5.0
                      ELSE b.c_acctbal + 0.005 END AS c_acctbal,
                 CASE WHEN b.rec_id % 28 = 24 THEN 'ALTERED'
                      ELSE b.c_mktsegment END AS c_mktsegment,
                 substring(b.c_addr, 1, 31) || 'X' AS c_addr
          FROM base b WHERE b.rec_id % 28 IN (3, 10, 17, 24)),
        recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
        sh AS (
          SELECT rec_id, list_distinct(list_transform(
                   range(1, greatest(length(c_addr) - 2, 1) + 1),
                   i -> substr(c_addr, CAST(i AS INTEGER), 3))) AS grams
          FROM recs WHERE c_addr IS NOT NULL AND length(c_addr) > 0),
        h AS (
          SELECT rec_id,
                 CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) % 2147483647 AS h
          FROM (SELECT rec_id, unnest(grams) AS g FROM sh)),
        mh AS (
          SELECT rec_id, p,
                 min((($permAList)[p + 1] * h + ($permBList)[p + 1]) % 2147483647) AS mv
          FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS p)
          GROUP BY rec_id, p),
        sig AS (
          SELECT rec_id, p // 4 AS band,
                 string_agg(CAST(mv AS VARCHAR), '_' ORDER BY p) AS bucket
          FROM mh GROUP BY rec_id, p // 4),
        $candSql,
        mw AS (
          SELECT id_a, id_b,
                 CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
                      WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30
                      ELSE -20 END AS name_w,
                 CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
                      WHEN a.c_mktsegment = b.c_mktsegment THEN 10
                      ELSE -15 END AS segment_w,
                 CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
                      WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.01 THEN 20
                      ELSE -10 END AS balance_w
          FROM cand JOIN recs a ON a.rec_id = id_a
                    JOIN recs b ON b.rec_id = id_b)
        SELECT id_a, id_b, CAST(name_w AS BIGINT) AS name_w,
               CAST(segment_w AS BIGINT) AS segment_w,
               CAST(balance_w AS BIGINT) AS balance_w,
               CAST(name_w + segment_w + balance_w AS BIGINT) AS score
        FROM mw WHERE name_w + segment_w + balance_w >= 45"""
  }

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    Map(
      "dedup_exact" ->
        "SELECT text, min(doc_id) AS keep_id, count(*) AS group_size FROM documents GROUP BY text",
      "er_link_pairs" ->
        s"""WITH $erScoredSql
            SELECT id_a, id_b, name_w, segment_w, balance_w, score FROM scored""",
      // the full pipeline replayed: scoring, recursive CC, singleton
      // fill-in, then the keep-rank window
      "er_canonical" ->
        s"""WITH RECURSIVE $erScoredSql,
            e AS (SELECT id_a AS src, id_b AS dst FROM scored
                  UNION ALL SELECT id_b, id_a FROM scored),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            ent AS (SELECT recs.*,
                           COALESCE(comp.component, recs.rec_id) AS entity_id
                    FROM recs LEFT JOIN comp ON recs.rec_id = comp.id),
            ranked AS (
              SELECT *,
                     CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
                       AS cluster_size,
                     row_number() OVER (PARTITION BY entity_id
                       ORDER BY c_acctbal DESC NULLS LAST, rec_id ASC) AS rk
              FROM ent)
            SELECT rec_id, c_name, c_nationkey, c_acctbal, c_mktsegment,
                   entity_id, cluster_size
            FROM ranked WHERE rk = 1""",
      // the ingest fold must equal the one-shot scoring — same oracle
      "ss_er" ->
        s"""WITH $erScoredSql
            SELECT id_a, id_b, name_w, segment_w, balance_w, score FROM scored""",
      // the agreement-code CASEs replayed, grouped into the pattern
      // histogram
      "er_patterns" ->
        s"""WITH $erScoredSql,
            pat AS (
              SELECT CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN -1
                          WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 1
                          ELSE 0 END AS name_c,
                     CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN -1
                          WHEN a.c_mktsegment = b.c_mktsegment THEN 1
                          ELSE 0 END AS segment_c,
                     CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN -1
                          WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.01 THEN 1
                          ELSE 0 END AS balance_c
              FROM recs a JOIN recs b
                ON a.c_nationkey = b.c_nationkey
               AND a.c_mktsegment = b.c_mktsegment AND a.rec_id < b.rec_id)
            SELECT CAST(name_c AS BIGINT) AS name_c,
                   CAST(segment_c AS BIGINT) AS segment_c,
                   CAST(balance_c AS BIGINT) AS balance_c,
                   CAST(count(*) AS BIGINT) AS n
            FROM pat GROUP BY 1, 2, 3""",
      // the full blocked scoring restricted to pairs touching a new id
      "er_incremental_pairs" ->
        s"""WITH $erScoredSql
            SELECT id_a, id_b, name_w, segment_w, balance_w, score
            FROM scored
            WHERE id_a >= 1000000000 OR id_b >= 1000000000""",
      // the A x B blocked scoring replayed: base as A, UNOFFSET dirty
      // copies as B, same weight arms, no id canonicalization
      "er_ab_pairs" ->
        """WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name, c_nationkey,
                     c_acctbal, c_mktsegment
              FROM customer),
            dirty AS (
              SELECT b.rec_id,
                     CASE WHEN b.rec_id % 28 = 10
                          THEN substring(b.c_name, 1, length(b.c_name) - 2) || 'XY'
                          ELSE substring(b.c_name, 1, length(b.c_name) - 1) || 'X'
                     END AS c_name,
                     b.c_nationkey,
                     CASE WHEN b.rec_id % 28 = 17 THEN b.c_acctbal + 5.0
                          ELSE b.c_acctbal + 0.005 END AS c_acctbal,
                     CASE WHEN b.rec_id % 28 = 24 THEN 'ALTERED'
                          ELSE b.c_mktsegment END AS c_mktsegment
              FROM base b WHERE b.rec_id % 28 IN (3, 10, 17, 24)),
            mw AS (
              SELECT a.rec_id AS id_a, b.rec_id AS id_b,
                     CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
                          WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30
                          ELSE -20 END AS name_w,
                     CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
                          WHEN a.c_mktsegment = b.c_mktsegment THEN 10
                          ELSE -15 END AS segment_w,
                     CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
                          WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.01 THEN 20
                          ELSE -10 END AS balance_w
              FROM base a JOIN dirty b
                ON a.c_nationkey = b.c_nationkey
               AND a.c_mktsegment = b.c_mktsegment)
            SELECT id_a, id_b, CAST(name_w AS BIGINT) AS name_w,
                   CAST(segment_w AS BIGINT) AS segment_w,
                   CAST(balance_w AS BIGINT) AS balance_w,
                   CAST(name_w + segment_w + balance_w AS BIGINT) AS score
            FROM mw WHERE name_w + segment_w + balance_w >= 45""",
      // the whole LSH blocking pipeline replayed: the fixture's md5-hex
      // key + 1-char dirty edit, char trigrams, md5 shingle hashes,
      // linear-congruential permutation minima (the same fixed literals),
      // 16x4 band buckets, distinct candidates, then the scoring arms
      "er_lsh_pairs" -> erLshOracleSql(hotKey = false, maxBucket = 0),
      "er_lsh_capped" -> erLshOracleSql(hotKey = true, maxBucket = 8),
      // the distributed rank replayed as ONE row_number over
      // (balance, id), the 10-rank window as a rank-range join, then the
      // same scoring
      "er_snm_pairs" ->
        s"""WITH $erScoredSql,
            ranked AS (
              SELECT rec_id, c_name, c_acctbal, c_mktsegment,
                     CAST(row_number() OVER (ORDER BY c_acctbal, rec_id)
                       AS BIGINT) AS rnk
              FROM recs),
            cand AS (
              SELECT least(a.rec_id, b.rec_id) AS id_a,
                     greatest(a.rec_id, b.rec_id) AS id_b,
                     a.c_name AS name_a, b.c_name AS name_b,
                     a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
                     a.c_acctbal AS bal_a, b.c_acctbal AS bal_b
              FROM ranked a JOIN ranked b
                ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10),
            mw AS (
              SELECT id_a, id_b,
                     CASE WHEN name_a IS NULL OR name_b IS NULL THEN 0
                          WHEN levenshtein(name_a, name_b) <= 1 THEN 30
                          ELSE -20 END AS name_w,
                     CASE WHEN seg_a IS NULL OR seg_b IS NULL THEN 0
                          WHEN seg_a = seg_b THEN 10 ELSE -15 END AS segment_w,
                     CASE WHEN bal_a IS NULL OR bal_b IS NULL THEN 0
                          WHEN abs(bal_a - bal_b) <= 0.01 THEN 20
                          ELSE -10 END AS balance_w
              FROM cand)
            SELECT id_a, id_b, CAST(name_w AS BIGINT) AS name_w,
                   CAST(segment_w AS BIGINT) AS segment_w,
                   CAST(balance_w AS BIGINT) AS balance_w,
                   CAST(name_w + segment_w + balance_w AS BIGINT) AS score
            FROM mw WHERE name_w + segment_w + balance_w >= 45""",
      // both blocking passes + union-distinct + single scoring replayed;
      // recsm applies the same null-nation mask as the query
      "er_multipass_pairs" ->
        s"""WITH $erScoredSql,
            recsm AS (
              SELECT rec_id, c_name,
                     CASE WHEN (rec_id % 1000000000) % 56 = 3 THEN NULL
                          ELSE c_nationkey END AS c_nationkey,
                     c_acctbal, c_mktsegment
              FROM recs),
            cand AS (
              SELECT DISTINCT id_a, id_b FROM (
                SELECT a.rec_id AS id_a, b.rec_id AS id_b
                FROM recsm a JOIN recsm b
                  ON a.c_nationkey = b.c_nationkey
                 AND a.c_mktsegment = b.c_mktsegment AND a.rec_id < b.rec_id
                UNION ALL
                SELECT a.rec_id, b.rec_id
                FROM recsm a JOIN recsm b
                  ON a.c_mktsegment = b.c_mktsegment
                 AND floor(a.c_acctbal) = floor(b.c_acctbal)
                 AND a.rec_id < b.rec_id)),
            mw AS (
              SELECT c.id_a, c.id_b,
                     CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN 0
                          WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 30
                          ELSE -20 END AS name_w,
                     CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL THEN 0
                          WHEN a.c_mktsegment = b.c_mktsegment THEN 10
                          ELSE -15 END AS segment_w,
                     CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN 0
                          WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.01 THEN 20
                          ELSE -10 END AS balance_w
              FROM cand c JOIN recsm a ON c.id_a = a.rec_id
                          JOIN recsm b ON c.id_b = b.rec_id)
            SELECT id_a, id_b, CAST(name_w AS BIGINT) AS name_w,
                   CAST(segment_w AS BIGINT) AS segment_w,
                   CAST(balance_w AS BIGINT) AS balance_w,
                   CAST(name_w + segment_w + balance_w AS BIGINT) AS score
            FROM mw WHERE name_w + segment_w + balance_w >= 45""",
      "er_entities" ->
        s"""WITH RECURSIVE $erScoredSql,
            e AS (SELECT id_a AS src, id_b AS dst FROM scored
                  UNION ALL SELECT id_b, id_a FROM scored),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            ent AS (SELECT recs.rec_id,
                           COALESCE(comp.component, recs.rec_id) AS entity_id
                    FROM recs LEFT JOIN comp ON recs.rec_id = comp.id)
            SELECT rec_id, entity_id,
                   CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
                     AS cluster_size
            FROM ent""",
      // the canonicalization chain replayed step-for-step (DuckDB needs
      // the explicit 'g' flag where Spark's regexp_replace is global);
      // the percent-encoding chain is GENERATED from the same tables the
      // Column expression folds over (pctChainSql) so they cannot drift
      "dedup_url" ->
        s"""WITH raw AS (
             SELECT doc_id, unnest([
               'HTTPS://User:Pw@WWW.Site-' || CAST(doc_id % 37 AS VARCHAR) ||
                 '.Example.com:443/p%7e/' || CAST(doc_id AS VARCHAR) ||
                 '/?utm_source=feed&ref=r' || CAST(doc_id % 5 AS VARCHAR) ||
                 '%2fx&q=a%4a%zz#sec',
               'https://site-' || CAST(doc_id % 37 AS VARCHAR) ||
                 '.example.com/p~/' || CAST(doc_id AS VARCHAR) ||
                 '?ref=r' || CAST(doc_id % 5 AS VARCHAR) || '%2Fx&q=a%4A%zz',
               'http://other-' || CAST(doc_id % 11 AS VARCHAR) ||
                 '.example.org:80/a/' || CAST(doc_id % 100 AS VARCHAR)]) AS url
             FROM documents),
           nf AS (SELECT doc_id, url,
                         regexp_replace(url, '#.*$$', '') AS nofrag
                  FROM raw),
           parts AS (
             SELECT doc_id, url,
                    lower(regexp_extract(nofrag,
                      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                    regexp_replace(lower(regexp_extract(nofrag,
                      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                      '^.*@', '') AS hostport,
                    regexp_replace(regexp_extract(nofrag,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                      '/$$', '') AS path,
                    regexp_replace(regexp_replace(
                      '&' || regexp_extract(nofrag, '\\?([^#]*)', 1),
                      '&(?:utm_[A-Za-z0-9_]*|gclid|fbclid)(=[^&]*)?', '', 'g'),
                      '^&', '') AS q
             FROM nf),
           hp AS (
             SELECT *, CASE
               WHEN scheme = 'http' THEN
                 regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$$', '')
               WHEN scheme = 'https' THEN
                 regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$$', '')
               ELSE regexp_replace(hostport, '^www\\.', '') END AS host
             FROM parts),
           c AS (
             SELECT doc_id, url,
                    CASE WHEN scheme = '' THEN trim(url)
                         ELSE ${pctChainSql("scheme || '://' || host || path || " +
                           "(CASE WHEN q = '' THEN '' ELSE '?' || q END)")}
                    END AS canonical
             FROM hp)
           SELECT canonical,
                  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants,
                  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                  min(doc_id) AS first_doc
           FROM c GROUP BY 1""",
      // Portable simhash: md5-derived 60-bit token hashes, bit-majority
      // signature, 16-bit-chunk pigeonhole blocking, exact Hamming verify —
      // the full pipeline recomputed independently.
      "dedup_simhash_md5" ->
        s"""WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
              FROM documents),
            h AS (
              SELECT doc_id, CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
              FROM tok),
            sig AS (SELECT doc_id, $simhashBits AS sig FROM h GROUP BY doc_id),
            k AS (
              SELECT doc_id, sig, c, (sig >> (c * 16)) & 65535 AS key
              FROM sig, (SELECT unnest([0, 1, 2, 3]) AS c)),
            p AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
              FROM k a JOIN k b ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
            FROM p WHERE bit_count(xor(sa, sb)) <= 3""",
      // Portable minhash+LSH: md5-derived shingle hashes, 128 linear-
      // congruential permutations mod 2^31-1 (fixed constants), 16 bands x 8
      // rows with plain string band buckets, exact-Jaccard verify — the full
      // pipeline recomputed independently.
      "dedup_minhash_md5" -> minhashMd5Sql,
      "dedup_containment" -> containmentMd5Sql,
      // Incremental dedup = the cross-set restriction of the SAME portable
      // pair set (pairs where exactly one side is an increment doc), best
      // match per new doc by (jaccard desc, corpus id asc).
      "dedup_incremental" -> incrementalBestMatchSql,
      // identical semantics by construction (stored signatures are the same
      // bit-exact portable frame) — the oracle is shared
      "dedup_incremental_sigs" -> incrementalBestMatchSql,
      // Duplicate clusters from the portable-minhash pair set: connected
      // components as a recursive reachability CTE (component = min
      // reachable id), over the SAME independently-recomputed pipeline.
      "dedup_funnel" ->
        s"""WITH RECURSIVE
            surv AS (SELECT d.doc_id, d.text FROM documents d
                     JOIN (SELECT min(doc_id) AS k FROM documents GROUP BY text) m
                       ON d.doc_id = m.k),
            pairs AS (${minhashMd5SqlFor("surv")}),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            c AS (SELECT (SELECT count(*) FROM documents) AS n0,
                         (SELECT count(*) FROM surv) AS n1,
                         (SELECT count(*) FROM comp WHERE id <> component) AS nd)
            SELECT 'input' AS stage, n0 AS n_in,
                   CAST(0 AS BIGINT) AS n_dropped, n0 AS n_out FROM c
            UNION ALL SELECT 'exact_dedup', n0, n0 - n1, n1 FROM c
            UNION ALL SELECT 'near_dup', n1, nd, n1 - nd FROM c""",
      "dedup_incremental_components" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach)
            SELECT id, min(reach) AS component FROM r GROUP BY id""",
      "dedup_best_of_cluster" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            mem AS (SELECT c.id, c.component, d.n_chars AS sc
                    FROM comp c JOIN documents d ON d.doc_id = c.id),
            mx AS (SELECT component, max(sc) AS ms FROM mem GROUP BY 1),
            ch AS (SELECT m.component, min(m.id) AS champ
                   FROM mem m JOIN mx ON m.component = mx.component
                                     AND m.sc = mx.ms
                   GROUP BY 1),
            fl AS (SELECT m.id, m.component AS cluster_rep,
                          CASE WHEN m.id = ch.champ THEN 1 ELSE 0 END AS keep
                   FROM mem m JOIN ch ON m.component = ch.component)
            SELECT d.doc_id AS id,
                   coalesce(fl.cluster_rep, d.doc_id) AS cluster_rep,
                   CAST(coalesce(fl.keep, 1) AS BIGINT) AS keep
            FROM documents d LEFT JOIN fl ON d.doc_id = fl.id""",
      "dedup_leakage_split" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            rep AS (SELECT d.doc_id AS id,
                           coalesce(c.component, d.doc_id) AS cluster_rep
                    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
            bkt AS (SELECT id, cluster_rep,
                           CAST(CONCAT('0x', substr(md5(CAST(cluster_rep AS VARCHAR)
                             || '#split'), 1, 15)) AS BIGINT) % 1000000 AS b
                    FROM rep)
            SELECT id, cluster_rep,
                   CASE WHEN b < 800000 THEN 'train'
                        WHEN b < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM bkt""",
      "dedup_components" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach)
            SELECT id, min(reach) AS component FROM r GROUP BY id""",
      "dedup_cluster_sizes" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                   FROM comp GROUP BY component)
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(sum(cluster_size) AS BIGINT) AS n_docs
            FROM sz GROUP BY cluster_size""",
      "dedup_materialize" ->
        s"""WITH RECURSIVE pairs AS ($minhashMd5Sql),
            e AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            n AS (SELECT DISTINCT src AS id FROM e),
            r AS (
              SELECT id, id AS reach FROM n
              UNION
              SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
            comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id),
            drops AS (SELECT id FROM comp WHERE id <> component)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
                   CAST(sum(n_chars) AS BIGINT) AS chars_kept
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.id = d.doc_id)
            GROUP BY source""",
      "dedup_ngram_jaccard" ->
        """WITH g AS (
             SELECT doc_id, lang,
                    list_distinct(list_transform(
                      range(1, greatest(len(substr(lower(text), 1, 100)) - 2, 1) + 1),
                      i -> substr(lower(text), 1, 100)[i:i+2])) AS grams
             FROM documents),
           s AS (SELECT doc_id, lang, grams, len(grams) AS sz FROM g),
           p AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS inter,
                    CAST(a.sz + b.sz AS DOUBLE) AS szsum
             FROM s a JOIN s b
               ON a.lang = b.lang AND a.doc_id < b.doc_id
              AND b.sz * 0.8 <= a.sz AND a.sz * 0.8 <= b.sz)
           SELECT id_a, id_b,
                  CASE WHEN szsum - inter = 0 THEN 0.0 ELSE inter / (szsum - inter) END AS jaccard
           FROM p
           WHERE (CASE WHEN szsum - inter = 0 THEN 0.0 ELSE inter / (szsum - inter) END) >= 0.8""",
      "dedup_embedding" ->
        """WITH e AS (
             SELECT vec_id, label,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings WHERE vec_id < 500),
           p AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                    list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i])) AS dot,
                    sqrt(list_sum(list_transform(a.emb, x -> x * x))) AS na,
                    sqrt(list_sum(list_transform(b.emb, x -> x * x))) AS nb
             FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
           SELECT id_a, id_b, dot / (na * nb) AS cosine
           FROM p WHERE na <> 0 AND nb <> 0 AND dot / (na * nb) >= 0.3""",
      // 10-word segments; list slice toks[a:b] is 1-based inclusive =
      // Spark slice(toks, a, 10); // is floor division
      "dedup_segments" ->
        """WITH t AS (
             SELECT doc_id, string_split(text, ' ') AS toks
             FROM documents WHERE text IS NOT NULL AND len(text) > 0),
           s AS (
             SELECT doc_id,
                    unnest(range(0, (len(toks) - 1) // 10 + 1)) AS pos, toks
             FROM t),
           g AS (
             SELECT doc_id, pos,
                    array_to_string(toks[pos * 10 + 1 : pos * 10 + 10], ' ') AS seg
             FROM s),
           k AS (
             SELECT doc_id, pos, seg,
                    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
             FROM g),
           p AS (
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                    CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
                    string_agg(seg, ' ' ORDER BY pos) FILTER (rn = 1) AS text_kept
             FROM k GROUP BY doc_id)
           SELECT d.doc_id,
                  coalesce(p.n_segs, 0) AS n_segs,
                  coalesce(p.n_kept, 0) AS n_kept,
                  md5(coalesce(p.text_kept, '')) AS kept_md5
           FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id""",
      // same segmentation CTEs; keep = corpus-wide frequency <= 2 (every
      // copy of an over-frequent segment drops, first included)
      "dedup_freq_segments" ->
        """WITH t AS (
             SELECT doc_id, string_split(text, ' ') AS toks
             FROM documents WHERE text IS NOT NULL AND len(text) > 0),
           s AS (
             SELECT doc_id,
                    unnest(range(0, (len(toks) - 1) // 10 + 1)) AS pos, toks
             FROM t),
           g AS (
             SELECT doc_id, pos,
                    array_to_string(toks[pos * 10 + 1 : pos * 10 + 10], ' ') AS seg
             FROM s),
           k AS (
             SELECT doc_id, pos, seg,
                    count(*) OVER (PARTITION BY seg) AS freq
             FROM g),
           p AS (
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                    CAST(count(*) FILTER (freq <= 2) AS BIGINT) AS n_kept,
                    string_agg(seg, ' ' ORDER BY pos) FILTER (freq <= 2) AS text_kept
             FROM k GROUP BY doc_id)
           SELECT d.doc_id,
                  coalesce(p.n_segs, 0) AS n_segs,
                  coalesce(p.n_kept, 0) AS n_kept,
                  md5(coalesce(p.text_kept, '')) AS kept_md5
           FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id""",
      // SemDeDup anchor: planted dyadic-perturbation copies, all-pairs
      // cosine at 0.98, recursive-CTE components, min-id representative
      "dedup_semantic_exact" ->
        """WITH RECURSIVE base AS (
             SELECT vec_id,
                    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
             FROM embeddings WHERE vec_id < 400),
           corpus AS (
             SELECT vec_id, emb FROM base
             UNION ALL
             SELECT -(vec_id + 1) AS vec_id,
                    list_transform(range(0, 64),
                      i -> emb[i + 1] + (CAST(i % 3 AS DOUBLE) - 1.0) / 256.0) AS emb
             FROM base WHERE vec_id < 100),
           sc AS (
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                    list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i])) AS dot,
                    sqrt(list_sum(list_transform(a.emb, x -> x * x))) AS na,
                    sqrt(list_sum(list_transform(b.emb, x -> x * x))) AS nb
             FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id),
           p AS (
             SELECT id_a, id_b FROM sc
             WHERE na <> 0 AND nb <> 0 AND dot / (na * nb) >= 0.98),
           e AS (SELECT id_a AS src, id_b AS dst FROM p
                 UNION ALL SELECT id_b, id_a FROM p),
           n AS (SELECT DISTINCT src AS id FROM e),
           r AS (
             SELECT id, id AS reach FROM n
             UNION
             SELECT r.id, e.dst AS reach FROM r JOIN e ON e.src = r.reach),
           comp AS (SELECT id, min(reach) AS component FROM r GROUP BY id)
           SELECT c.vec_id AS id, coalesce(m.component, c.vec_id) AS component,
                  (coalesce(m.component, c.vec_id) = c.vec_id) AS keep
           FROM corpus c LEFT JOIN comp m ON m.id = c.vec_id""",
      // Duplicated-span stats: gram hash = leading 60 bits of md5 of the
      // space-joined 5-gram, identical to the engine's portable hash, so
      // frequencies, fractions and coverage reproduce exactly.
      "dedup_dup_spans" ->
        """WITH t AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           g AS (
             SELECT doc_id, i AS pos,
                    CAST(CONCAT('0x', substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))
                      AS BIGINT) AS h
             FROM t, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) u(i)),
           c AS (SELECT h, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
           j AS (SELECT g.doc_id, g.pos, c.nd FROM g JOIN c USING (h)),
           cov AS (
             SELECT doc_id, count(DISTINCT p) AS n_cov
             FROM (SELECT doc_id, pos + o AS p FROM j, unnest(range(0, 5)) v(o)
                   WHERE nd >= 2)
             GROUP BY 1)
           SELECT j.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
                  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                    AS dup_gram_frac,
                  CAST(coalesce(any_value(n_cov), 0) AS DOUBLE) / (count(*) + 4)
                    AS covered_token_frac
           FROM j LEFT JOIN cov ON j.doc_id = cov.doc_id
           GROUP BY j.doc_id""",
      // same gram-hash + coverage arms as dedup_dup_spans (1-based list
      // indices in DuckDB vs 0-based positions in the engine — the
      // coverage set is over the SAME token indices either way), then the
      // reassembly: keep tokens whose index is uncovered, join by one
      // space, md5 the result
      "dedup_remove_spans" ->
        """WITH t AS (
             SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
           g AS (
             SELECT doc_id, i AS pos,
                    CAST(CONCAT('0x', substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))
                      AS BIGINT) AS h
             FROM t, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) u(i)),
           c AS (SELECT h, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
           cov AS (
             SELECT doc_id, list(DISTINCT p) AS cov
             FROM (SELECT g.doc_id, g.pos + o AS p
                   FROM g JOIN c USING (h), unnest(range(0, 5)) v(o)
                   WHERE c.nd >= 2)
             GROUP BY 1),
           k AS (
             SELECT t.doc_id, t.toks, coalesce(cov.cov, []) AS cov
             FROM t LEFT JOIN cov USING (doc_id)),
           r AS (
             SELECT doc_id, len(toks) AS n_tokens,
                    list_transform(
                      list_filter(range(1, len(toks) + 1),
                                  i -> NOT list_contains(cov, i)),
                      i -> toks[i]) AS kept
             FROM k)
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                  CAST(len(kept) AS BIGINT) AS n_tokens_kept,
                  md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
           FROM r""",
      // the character-granular ExactSubstr derivation end-to-end:
      // per-position 30-char window fingerprints (the engine-wide
      // conv(substr(md5,1,15)) 60-bit convention), first occurrence =
      // lexicographic min (doc_id, pos) — encoded as doc_id*2^20+pos,
      // order-identical while positions stay under 2^20 — coverage union
      // of non-first duplicated windows, per-character reassembly
      "dedup_exact_substr" ->
        """WITH elig AS (
             SELECT doc_id, text, len(text) AS n FROM documents
             WHERE text IS NOT NULL AND len(text) >= 30),
           w AS (
             SELECT doc_id, i AS pos,
                    CAST(CONCAT('0x',
                      substr(md5(substr(text, CAST(i AS INT) + 1, 30)), 1, 15))
                      AS BIGINT) AS h
             FROM elig, unnest(range(0, n - 29)) u(i)),
           f AS (SELECT h, count(*) AS nh,
                        min(doc_id * 1048576 + pos) AS fkey
                 FROM w GROUP BY 1),
           cov AS (
             SELECT doc_id, list(DISTINCT p) AS cov
             FROM (SELECT w.doc_id, w.pos + o AS p
                   FROM w JOIN f USING (h), unnest(range(0, 30)) v(o)
                   WHERE f.nh >= 2 AND w.doc_id * 1048576 + w.pos <> f.fkey)
             GROUP BY 1),
           k AS (
             SELECT d.doc_id, coalesce(d.text, '') AS text, len(d.text) AS n,
                    coalesce(cov.cov, []) AS cov
             FROM documents d LEFT JOIN cov USING (doc_id)),
           r AS (
             SELECT doc_id, n,
                    list_transform(
                      list_filter(range(0, len(text)),
                                  p -> NOT list_contains(cov, p)),
                      p -> substr(text, CAST(p AS INT) + 1, 1)) AS kept
             FROM k)
           SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
                  CAST(len(kept) AS BIGINT) AS n_chars_kept,
                  md5(coalesce(array_to_string(kept, ''), '')) AS kept_md5
           FROM r"""
    )
  }
}
