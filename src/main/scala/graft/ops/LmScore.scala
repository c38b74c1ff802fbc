package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality scoring (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data",
  * arXiv:1911.00359): train an n-gram LM on the corpus itself, score every
  * document by its mean per-token surprisal under that LM, and split the
  * corpus into head / middle / tail terciles by score — CCNet keeps the
  * low-perplexity head as training data. The reference engine has no LM
  * tier at all (self-set bar); this is the quality-filtering step a
  * large-scale training-data pipeline runs between language id and the
  * final mixture.
  *
  * Numeric contract: surprisal is integer-quantized. With add-one
  * smoothing p(w2|w1) = (c2+1)/(c1+V), the per-bigram bit cost here is
  * floor(log2((c1+V) div (c2+1))) computed as `length(bin(x)) - 1` over
  * an INTEGER division — the `text_tfidf` convention — so the whole
  * model + scoring pipeline is transcendental-free and replays bit-exactly
  * in any engine. The only floats are one division per doc (mean bits,
  * two longs -> IEEE-exact) and the monotone 1024x quantization used to
  * bucket the rank pass.
  *
  * Scale shape: two map-side-combined counting passes (unigrams, bigrams)
  * train the model; `minCount` prunes the bigram table WITHOUT a global
  * sort (a count threshold, the standard n-gram pruning rule) — pruned-away
  * and unseen bigrams score through the same add-one path as count 0.
  * Scoring joins exploded bigrams against the model; `broadcastModel`
  * picks the join layout: true (one map-only pass) is right while the
  * pruned model fits a broadcast — the usual case, since aggressive
  * min-count pruning is exactly how production n-gram LMs are kept small —
  * but a web-scale vocabulary can outgrow it even pruned, so false routes
  * the same joins through shuffle-hash instead (identical scores, spec'd).
  * The corpus-wide tercile
  * rank reuses the [[CorpusOps.packSequences]] layout: quantized-score
  * buckets (bounded: mean bits <= 64, so <= ~65k buckets regardless of
  * corpus size), a bucket histogram to the driver, broadcast prefix
  * offsets, and a per-bucket window — no single-task global sort.
  */
object LmScore {

  /** Per-document surprisal under a corpus-trained add-one bigram LM.
    * Returns one row per input doc:
    * `(doc_id, n_bigrams, total_bits, mean_bits, rnk, bucket)` where
    * `rnk` is the 1-based corpus rank by (mean_bits, doc_id) ascending
    * and `bucket` is the CCNet tercile (`head` = lowest surprisal /
    * `middle` / `tail`), or `unscored` for docs with fewer than two
    * tokens (null mean_bits and rnk). */
  def surprisalScores(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1, broadcastModel: Boolean = true): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def modelSide(m: DataFrame) =
      if (broadcastModel) broadcast(m) else m.hint("shuffle_hash")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val toks = base
      .filter(col("__text").isNotNull)
      .select(col("doc_id"), TextAnalysis.tokens(col("__text")).as("toks"))
      .localCheckpoint(false) // unigram pass + bigram pass share one scan
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false) // vocab count + the scoring join
    val vocab = uni.agg(count(lit(1)).as("v"))
    val docBigrams = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), expr(
        "inline(transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2)))"))
      .localCheckpoint(false) // model count + the scoring pass
    val model = docBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    // c2 <= c1 and V >= 1 guarantee (c1 + v) div (c2 + 1) >= 1, so the
    // bit cost is always defined and >= 0
    val scoredBigrams = docBigrams
      .join(modelSide(model), Seq("w1", "w2"), "left")
      .join(modelSide(uni), col("w1") === col("w"))
      .crossJoin(broadcast(vocab)) // always one row
      .withColumn("__bits", (length(bin(
        expr("(c1 + v) div (coalesce(c2, CAST(0 AS BIGINT)) + 1)"))) - 1)
        .cast("long"))
    val perDoc = scoredBigrams.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), sum(col("__bits")).as("total_bits"))
    val scored = base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("total_bits", coalesce(col("total_bits"), lit(0L)))
      .withColumn("mean_bits", when(col("n_bigrams") > 0,
        col("total_bits").cast("double") / col("n_bigrams")))
      // floor(mean * 1024) is monotone in mean, so bucket order agrees
      // with the (mean_bits, doc_id) rank order and equal means can never
      // straddle a bucket boundary
      .withColumn("__q", when(col("mean_bits").isNotNull,
        floor(col("mean_bits") * lit(1024.0)).cast("long")))
      .localCheckpoint(false) // histogram pass + rank pass
    val (offCol, nScored) = graft.ops.CorpusOps.prefixOffsetsByBucket(
      scored.filter(col("__q").isNotNull), "__q", count(lit(1)),
      ascending = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__q").orderBy(col("mean_bits").asc, col("doc_id").asc)
    scored
      .withColumn("rnk", when(col("__q").isNotNull,
        offCol + row_number().over(w).cast("long")))
      .withColumn("bucket",
        when(col("rnk").isNull, lit("unscored"))
          .when(col("rnk") * 3 <= nScored, lit("head"))
          .when(col("rnk") * 3 <= 2L * nScored, lit("middle"))
          .otherwise(lit("tail")))
      .select("doc_id", "n_bigrams", "total_bits", "mean_bits", "rnk", "bucket")
  }
}
