package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval and rank fusion — the search-side complement of the
  * embedding ANN tier ([[Similarity]]): Okapi BM25 scoring over the
  * corpus and reciprocal-rank fusion of independently produced rankings
  * (the standard hybrid-retrieval combiner for lexical + dense lists).
  *
  * Both operators are exact integer arithmetic end-to-end — BM25's
  * rational term weight is evaluated as one scaled integral division and
  * its log2-floor IDF reuses the [[TextAnalysis.tfIdfTopTerms]] bin-length
  * convention — so results replay bit-exactly in any SQL engine
  * (transcendental-free; the deliberate deviation from the textbook
  * ln-based weights, which are not cross-engine reproducible).
  *
  * Beyond-reference capability (the reference engine has no retrieval
  * surface); the RAG/eval-set-selection side of a training-data pipeline.
  */
object Retrieval {

  /** k1 = 12/10 and b = 3/4: the standard Okapi defaults as exact
    * rationals. Fixed (not parameters) because every downstream constant
    * in the scaled integral division below is derived from them; a
    * different operating point is a one-line fork with its own constants. */
  private val K1Num = 12L // k1 = K1Num / 10
  private val BNum = 3L // b = BNum / 4

  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** Okapi BM25 top-k document retrieval.
    *
    * `queries` is a (queryId, term) frame — one row per query term,
    * repeated terms deduplicated. Scoring is the classic
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with
    * k1=1.2, b=0.75, except both factors are integerized for
    * cross-engine exactness:
    *
    *   - `idf(t) = floor(log2(N div df(t)))` (bin-length, the tfidf
    *     convention; a term in more than half the corpus scores 0);
    *   - the tf factor is evaluated as ONE integral division after
    *     clearing denominators (multiply through by `10*totlen`, with
    *     `avgdl = totlen/N` substituted):
    *     `contrib = (scale*idf*22*totlen*tf) div
    *                (10*totlen*tf + 3*totlen + 9*dl*N)`,
    *     so `score = sum(contrib)` is an exact BIGINT in units of
    *     `1/scale`. Products run in DECIMAL(38,0) (the crossDeviation
    *     convention — BIGINT wraps once `totlen` passes ~1e9 tokens);
    *     the quotient is ≤ `2.2*scale*idf`, comfortably BIGINT.
    *
    * Returns `(query_id, doc_id, score, n_terms, rk)`, `rk <= k`, rank
    * ties broken by ascending doc id.
    *
    * Scale layout: tokens are bound ONCE per doc (dl rides along the
    * explode), and postings are restricted to query terms by a broadcast
    * semi-join BEFORE the (doc, term) aggregation — the shuffle carries
    * only query-term postings, never the vocabulary. df comes from the
    * restricted postings (term-level filtering cannot change a surviving
    * term's document frequency) and broadcasts back. Corpus-level N and
    * totlen are a bounded one-row collect embedded as literals (the
    * zorder pattern: no crossJoin in the full-data projection). The
    * final per-query top-k is a row_number window; Spark's
    * WindowGroupLimit plants a partial per-partition top-k BEFORE the
    * exchange, so only ~k rows per task shuffle to the final rank.
    *
    * `queries` is referenced TWICE in the plan (term semi-join +
    * query_id attach): a caller whose query frame is itself an
    * expensive computation should checkpoint it first.
    *
    * `materializeTokens` (default true) checkpoints the tokenized corpus
    * so the regex tokenization runs ONCE — the eager stats aggregate and
    * the postings plan would otherwise each tokenize the full corpus. The
    * tokenized corpus occupies executor-local storage for the job's
    * duration; at 100 TB that storage-vs-recompute trade is the caller's:
    * pass false to keep the scan streaming and pay the second tokenize
    * pass instead. Results are identical either way. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k: Int, scale: Long = 1000000L,
      materializeTokens: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(scale > 0 && scale <= 1000000000L,
      s"scale must be in [1, 1e9], got $scale")
    val tokenized = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("dl", coalesce(size(col("__toks")).cast("long"), lit(0L)))
    val base = if (materializeTokens) tokenized.localCheckpoint(false)
      else tokenized
    val statsRow = base
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("totlen")).head()
    val nDocs = statsRow.getLong(0)
    val totLen = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    require(nDocs > 0 && totLen > 0,
      "bm25TopK needs a non-empty corpus with at least one token")
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("term"))
      .distinct()
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(q.select("term").distinct()), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    // Clearing denominators in tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    // by 10*totlen (avgdl = totlen/N): with k1 = 12/10, b = 3/4,
    //   num = (10+K1Num) * totlen * tf            (k1+1 = 22/10)
    //   den = 10*totlen*tf
    //       + (K1Num*(4-BNum)/4) * totlen         (k1*(1-b)*10 = 3)
    //       + (K1Num*BNum*10/40) * dl * N         (k1*b*10 = 9)
    val k1p1TimesScale = (10L + K1Num) * scale // 22 * scale
    val denConstTot = K1Num * (4L - BNum) / 4L // 3
    val denConstDl = K1Num * BNum * 10L / 40L // 9
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(q), Seq("term")) // fan out to every query using the term
      .withColumn("idf",
        (length(bin(expr(s"$nDocs div dfreq"))) - 1).cast("long"))
      .withColumn("__num",
        d38(col("idf") * lit(k1p1TimesScale)) * d38(lit(totLen)) * d38(col("tf")))
      .withColumn("__den",
        d38(lit(10L * totLen)) * d38(col("tf"))
          + d38(lit(denConstTot * totLen))
          + d38(lit(denConstDl * nDocs)) * d38(col("dl")))
      .withColumn("contrib", expr("CAST(__num div __den AS BIGINT)"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "score", "n_terms", "rk")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09): fuse any
    * number of independently produced per-query rankings into one list by
    * `score(d) = sum_lists floor(scale / (rrfK + rank_list(d)))` —
    * integerized (exact BIGINT) with the same tiebreak convention as
    * every ranked operator here (score desc, item id asc). The classic
    * hybrid-retrieval combiner: it needs only ranks, so lexical BM25 and
    * dense cosine lists fuse without score calibration.
    *
    * Each input frame must carry (queryCol, itemCol, rankCol) with ranks
    * >= 1; a NULL or non-positive rank fails loud (a silently skipped
    * NULL would drop a retrieved item from the fused list with no
    * signal). A duplicate (query, item) row WITHIN one ranking frame
    * also fails loud: it would silently inflate rrf_score and n_lists
    * (the fused aggregation cannot tell "retrieved by two lists" from
    * "listed twice by one"). The check rides the same aggregation —
    * count per group vs distinct source lists — so it costs one
    * count-distinct over the already top-k-bounded union, no extra pass.
    * Returns `(query_id, item_id, rrf_score, n_lists, best_rank, rk)`,
    * `rk <= k`.
    *
    * Scale layout: union-all of the (already small, top-k-bounded)
    * ranked lists, one map-side-combined aggregation keyed by
    * (query, item), one row_number window per query over at most
    * `lists × k` candidates — nothing corpus-sized anywhere. */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, itemCol: String,
      rankCol: String, k: Int, rrfK: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    require(scale > 0, s"scale must be positive, got $scale")
    val normed = rankings.zipWithIndex.map { case (r, i) => r.select(
      col(queryCol).as("query_id"), col(itemCol).as("item_id"),
      col(rankCol).cast("long").as("__rk"), lit(i).as("__list")) }
    val unioned = normed.reduce(_.unionByName(_))
    val contrib = when(col("__rk").isNull || col("__rk") < 1L,
      raise_error(lit("rrfFuse: rank must be a positive integer — a NULL " +
        "or non-positive rank would silently drop a retrieved item from " +
        "the fused list")).cast("long"))
      .otherwise(expr(s"CAST($scale div ($rrfK + __rk) AS BIGINT)"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("item_id").asc)
    unioned
      .withColumn("__c", contrib)
      .groupBy("query_id", "item_id")
      .agg(sum(col("__c")).as("__score"), count(lit(1)).as("__n"),
        countDistinct(col("__list")).as("n_lists"),
        min(col("__rk")).as("best_rank"))
      // the check is fused into the SORT KEY (not a bystander column), so
      // it provably evaluates for every aggregated group — a bystander
      // column could be projection-deferred past the rk <= k filter and
      // skip duplicates that only occur below the fused top-k
      .withColumn("rrf_score",
        when(col("__n") =!= col("n_lists"),
          raise_error(concat(lit("rrfFuse: duplicate (query, item) row " +
            "within one ranking frame for query_id="), col("query_id").cast("string"),
            lit(", item_id="), col("item_id").cast("string"),
            lit(" — a duplicate silently inflates rrf_score and n_lists; " +
              "deduplicate the ranking upstream"))).cast("long"))
          .otherwise(col("__score")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "item_id", "rrf_score", "n_lists", "best_rank",
        "rk")
  }

  /** The 1e6-scaled nDCG discount table `floor(1e6 / log2(i + 1))` for
    * ranks 1..k — computed ONCE driver-side and baked into the plan (and,
    * by the shared-constants convention, into the SQL oracle) as LITERALS:
    * every engine's log() differs in the last ulps, and a flipped floor
    * would silently diverge the metric. Public so the oracle fragment is
    * GENERATED from the same values. */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Ranking-quality metrics — the evaluation half every retrieval stack
    * needs next to its retrievers (BM25 / dense / fused): per query with
    * at least one relevant item,
    *   `n_found_at_k`  exact count of relevant items in the top k,
    *   `n_relevant`    exact relevant-set size,
    *   `mrr_ppm`       floor(1e6 / rank of the first relevant item) (0 if
    *                   none retrieved) — exact integer division,
    *   `ndcg_ppm`      floor(1e6 * DCG@k / IDCG@k) with binary gains and
    *                   the [[ndcgDiscounts]] LITERAL table, so DCG/IDCG
    *                   are exact integer sums and the ratio is one
    *                   integer division — engine-replayable bit-for-bit.
    * `results` carries (queryCol, itemCol, rankCol 1-based); rows past
    * rank k are ignored. `relevant` carries (queryCol, itemCol) binary
    * relevance; duplicates are deduplicated. Queries with NO relevant
    * item have no defined metrics and are omitted (the standard IR
    * convention); retrieved-but-irrelevant-only queries emit zeros.
    *
    * Scale layout: the relevance set deduplicates once (checkpointed,
    * consumed twice), hits come from one left-semi join of top-k-bounded
    * results, and both aggregations are map-side-combined — nothing
    * corpus-sized anywhere. */
  def rankingMetrics(results: DataFrame, relevant: DataFrame,
      queryCol: String, itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val disc = ndcgDiscounts(k)
    val idcgPrefix = disc.scanLeft(0L)(_ + _).tail // idcg at n_relevant = i
    val res = results.select(col(queryCol).as("query_id"),
        col(itemCol).as("item_id"),
        when(col(rankCol).isNull || col(rankCol) < 1, raise_error(lit(
          "rankingMetrics: rank must be a positive integer — a NULL/" +
            "non-positive rank has no discount")).cast("long"))
          .otherwise(col(rankCol).cast("long")).as("__rk"))
      .filter(col("__rk") <= k)
    val rel = relevant.select(col(queryCol).as("query_id"),
        col(itemCol).as("item_id")).distinct()
      .localCheckpoint(false) // hit join + per-query relevant counts
    val relCounts = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_relevant"))
    val hits = res.join(rel, Seq("query_id", "item_id"), "left_semi")
      .groupBy("query_id")
      .agg(count(lit(1)).as("__n_hit_rows"),
        countDistinct(col("item_id")).as("__n_hit_items"),
        min(col("__rk")).as("__first"),
        sum(element_at(array(disc.map(lit): _*), col("__rk").cast("int")))
          .as("__dcg"))
      // a duplicate (query, item) row in `results` silently inflates
      // n_found_at_k and DCG — fail loud like rrfFuse's duplicate guard
      // (r15 review); fused into the released count so it provably
      // evaluates for every query
      .withColumn("n_found_at_k",
        when(col("__n_hit_rows") =!= col("__n_hit_items"),
          raise_error(concat(lit("rankingMetrics: duplicate (query, item) " +
            "rows in results for query_id="), col("query_id").cast("string"),
            lit(" — duplicates silently inflate n_found_at_k and DCG; " +
              "deduplicate the ranking upstream"))).cast("long"))
          .otherwise(col("__n_hit_rows")))
    relCounts.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        coalesce(col("n_found_at_k"), lit(0L)).as("n_found_at_k"),
        coalesce(expr("CAST(1000000 div __first AS BIGINT)"), lit(0L))
          .as("mrr_ppm"),
        coalesce(expr(s"CAST(1000000 * __dcg div element_at(" +
          s"array(${idcgPrefix.mkString(",")}), " +
          s"CAST(least(n_relevant, $k) AS INT)) AS BIGINT)"), lit(0L))
          .as("ndcg_ppm"))
  }
}
