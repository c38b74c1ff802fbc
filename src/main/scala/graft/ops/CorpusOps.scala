package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF struct results — top-level so their encoders stay codegen-compiled
  * (a case class nested in an object becomes an inner class whose accessors
  * Janino cannot bind, silently dropping the projection to interpreted). */
private[ops] final case class ContamStats(n_grams: Long, n_contaminated: Long)

private[ops] final case class RepetitionStats(
    n_tokens: Long, top_token_frac: Double, top_2gram_frac: Double,
    dup_2gram_frac: Double, dup_3gram_frac: Double)

/** One stratified-sample candidate: portable sort key + row id. */
final case class StratItem(skey: String, id: Long)

/** Bounded bottom-k state: parallel arrays sorted ascending by (skey, id),
  * length <= k. Product type so buffer ser/de stays Tungsten. */
final case class BottomKBuf(keys: Array[String], ids: Array[Long])

/** Partial bottom-k aggregate: each map task keeps at most k candidates per
  * group, so the exchange carries <= k rows per (stratum, task) — a fixed-size
  * per-stratum sample never sorts the full stratum and never funnels a
  * stratum's whole data through one window task (a `row_number().over(
  * partitionBy(stratum))` caps parallelism at #strata and sorts everything). */
final class BottomKAggregator(k: Int)
    extends Aggregator[StratItem, BottomKBuf, BottomKBuf] {
  require(k > 0, s"k must be positive, got $k")

  def zero: BottomKBuf = BottomKBuf(Array.empty[String], Array.emptyLongArray)

  @inline private def beats(k1: String, i1: Long, k2: String, i2: Long): Boolean = {
    val c = k1.compareTo(k2)
    c < 0 || (c == 0 && i1 < i2)
  }

  def reduce(b: BottomKBuf, a: StratItem): BottomKBuf = {
    val n = b.keys.length
    if (n == k && !beats(a.skey, a.id, b.keys(n - 1), b.ids(n - 1))) b
    else {
      var pos = n
      while (pos > 0 && beats(a.skey, a.id, b.keys(pos - 1), b.ids(pos - 1)))
        pos -= 1
      val m = math.min(n + 1, k)
      val nk = new Array[String](m); val ni = new Array[Long](m)
      System.arraycopy(b.keys, 0, nk, 0, pos)
      System.arraycopy(b.ids, 0, ni, 0, pos)
      nk(pos) = a.skey; ni(pos) = a.id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.keys, pos, nk, pos + 1, tail)
        System.arraycopy(b.ids, pos, ni, pos + 1, tail)
      }
      BottomKBuf(nk, ni)
    }
  }

  def merge(b1: BottomKBuf, b2: BottomKBuf): BottomKBuf = {
    if (b2.keys.isEmpty) b1
    else if (b1.keys.isEmpty) b2
    else {
      val m = math.min(b1.keys.length + b2.keys.length, k)
      val nk = new Array[String](m); val ni = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeLeft = j >= b2.keys.length ||
          (i < b1.keys.length && beats(b1.keys(i), b1.ids(i), b2.keys(j), b2.ids(j)))
        if (takeLeft) { nk(o) = b1.keys(i); ni(o) = b1.ids(i); i += 1 }
        else { nk(o) = b2.keys(j); ni(o) = b2.ids(j); j += 1 }
        o += 1
      }
      BottomKBuf(nk, ni)
    }
  }

  def finish(b: BottomKBuf): BottomKBuf = b
  def bufferEncoder: Encoder[BottomKBuf] = Encoders.product[BottomKBuf]
  def outputEncoder: Encoder[BottomKBuf] = Encoders.product[BottomKBuf]
}

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: PII scrubbing, repetition-based quality filters
  * (the Gopher rules), benchmark-contamination detection, stratified sampling,
  * and mergeable approximate distinct counts.
  *
  * Design rule: everything on the corpus side is a per-row projection or a
  * bounded partial aggregate — no unbounded shuffle, no window over a handful
  * of strata, no collect of anything that grows with the corpus.
  */
object CorpusOps {

  /** Driver-side distributed prefix offsets — the shared skeleton of
    * [[packSequences]], [[budgetSelect]] and
    * [[graft.ops.LmScore.surprisalScores]]'s rank pass: aggregate
    * `totalExpr` per long-typed `bucketCol`, order buckets (ascending or
    * descending), and return the broadcast-backed Column mapping each
    * row's bucket to its EXCLUSIVE prefix total, plus the grand total.
    * Bounded driver state (one row per non-empty bucket); one copy of the
    * collect -> prefix -> broadcast -> UDF plumbing so a guard added here
    * reaches all three operators. */
  private[graft] def prefixOffsetsByBucket(df: DataFrame, bucketCol: String,
      totalExpr: Column, ascending: Boolean): (Column, Long) = {
    val rows = df.groupBy(col(bucketCol)).agg(totalExpr.cast("long").as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = if (ascending) rows.sortBy(_._1) else rows.sortBy(-_._1)
    var acc = 0L
    val offsets = sorted.map { case (b, t) => val o = acc; acc += t; (b, o) }.toMap
    val bOff = df.sparkSession.sparkContext.broadcast(offsets)
    val offUdf = udf((b: Long) => bOff.value(b))
    (offUdf(col(bucketCol)), acc)
  }

  /** (name, java/RE2-portable regex, replacement) — patterns restricted to
    * syntax with identical semantics in Java regex and RE2, so an independent
    * SQL engine reproduces the scrub byte-for-byte. Counts are measured on
    * the ORIGINAL text per pattern independently; replacement is sequential
    * in this order (an IP inside an email is counted as both, but scrubbed
    * as part of the email). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** Adds `n_<kind>` match counts and a `scrubbed` column with all PII
    * patterns redacted. Pure regexp expressions — codegen'd, zero shuffle. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = piiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    withCounts.withColumn("scrubbed", scrubbed)
  }

  /** Word n-grams over the standard token stream, space-joined. Empty array
    * when the document has fewer than n tokens (Spark's `sequence` would
    * otherwise generate a DESCENDING range). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** All four Gopher repetition stats from one pass over the token array.
    * Counts are exact integers (HashMap frequency count), divisions are the
    * single final double op — identical values to the nested-lambda SQL
    * formulation, at O(tokens) per row instead of O(distinct^2 * n): the
    * interpreted `filter(arr, x === d)` per distinct element re-evaluated the
    * whole inlined n-gram transform (including the tokenizer regex) once PER
    * ELEMENT, which the old `.count()` bench action pruned and never timed. */
  private val repetitionStatsUdf = udf((toks: Array[String]) => {
    // (total, distinct, maxCount) of space-joined n-grams; empty when the
    // document has fewer than n tokens (matches wordNgrams semantics)
    def gramStats(n: Int): (Int, Int, Int) = {
      val total = if (toks == null) 0 else toks.length - (n - 1)
      if (total <= 0) (0, 0, 0)
      else {
        val m = new java.util.HashMap[String, Int](total * 2)
        var mx = 0
        var i = 0
        while (i < total) {
          val g =
            if (n == 1) toks(i)
            else {
              val sb = new java.lang.StringBuilder(toks(i))
              var j = 1
              while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
              sb.toString
            }
          val c = m.getOrDefault(g, 0) + 1
          m.put(g, c)
          if (c > mx) mx = c
          i += 1
        }
        (total, m.size, mx)
      }
    }
    def frac(num: Int, den: Int): Double =
      if (den > 0) num.toDouble / den.toDouble else 0.0
    val (t1, _, m1) = gramStats(1)
    val (t2, d2, m2) = gramStats(2)
    val (t3, d3, _) = gramStats(3)
    RepetitionStats(
      n_tokens = t1.toLong,
      top_token_frac = frac(m1, t1),
      top_2gram_frac = frac(m2, t2),
      dup_2gram_frac = frac(t2 - d2, t2),
      dup_3gram_frac = frac(t3 - d3, t3))
  })

  /** Gopher-style repetition filters (Rae et al. 2021, table A1): fraction of
    * tokens in the most frequent token / 2-gram, duplicate 2-/3-gram
    * fractions. All integer-count arithmetic divided as doubles — exact and
    * oracle-reproducible. Pure projections, zero shuffle. */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__rep", repetitionStatsUdf(col("__toks")))
      // null text => NULL token count (len(NULL) is NULL in any engine),
      // while the repetition fractions stay 0.0 like the oracle's ELSE arms
      .withColumn("n_tokens",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(col("__rep.n_tokens")))
      .withColumn("top_token_frac", col("__rep.top_token_frac"))
      .withColumn("top_2gram_frac", col("__rep.top_2gram_frac"))
      .withColumn("dup_2gram_frac", col("__rep.dup_2gram_frac"))
      .withColumn("dup_3gram_frac", col("__rep.dup_3gram_frac"))
      .drop("__toks", "__rep")

  /** Benchmark-contamination check: for each corpus document, how many of its
    * distinct word n-grams appear in the benchmark set.
    *
    * The benchmark side is collected to a driver set and BROADCAST — benchmark
    * suites are bounded by construction (they are hand-curated eval sets), so
    * the corpus side stays a zero-shuffle map-only scan: no explode, no join,
    * no aggregation. This is the plan you want at 100 TB — the alternative
    * (explode corpus grams + join) shuffles the whole corpus's gram stream. */
  def ngramContamination(
      corpus: DataFrame, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n (n-grams of order 0 have no " +
      "tokens to hash; the stats loop would read past the token array)")
    val spark = corpus.sparkSession
    val benchGrams: Set[String] = benchmark
      .select(explode(array_distinct(wordNgrams(col(benchTextCol), n))).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val bset = spark.sparkContext.broadcast(benchGrams)
    // Distinct n-grams AND membership hits in one primitive pass over the
    // token array (the interpreted wordNgrams transform re-evaluated its
    // inlined tokenizer per element; binding tokens + a loop is ~100x).
    val contamStats = udf((toks: Array[String]) => {
      val total = if (toks == null) 0 else toks.length - (n - 1)
      if (total <= 0) ContamStats(0L, 0L)
      else {
        val seen = new java.util.HashSet[String](total * 2)
        val s = bset.value
        var hits = 0L
        var i = 0
        while (i < total) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          val g = sb.toString
          if (seen.add(g) && s.contains(g)) hits += 1
          i += 1
        }
        ContamStats(seen.size.toLong, hits)
      }
    })
    corpus
      .withColumn("__cs", contamStats(TextAnalysis.tokens(col(textCol))))
      // null text => NULL gram count (len(NULL) semantics); hit count stays
      // 0 like the oracle's coalesce
      .withColumn("n_grams",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(col("__cs.n_grams")))
      .withColumn("n_contaminated", col("__cs.n_contaminated"))
      .withColumn("contamination_frac",
        when(col("n_grams") > 0,
          col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__cs")
  }

  /** Corpus vocabulary: global token frequencies, the k most frequent tokens
    * (count desc, token asc on ties — fully deterministic). The plan is the
    * one you want at 100 TB: explode feeds a hash aggregate with MAP-SIDE
    * partial counts (the shuffle carries one row per distinct token per
    * task, not one per token occurrence), and the final top-k is
    * TakeOrderedAndProject — per-partition bounded heaps merged once, never
    * a global sort. This is the vocabulary-building step of tokenizer
    * training (BPE/WordPiece corpus prep). */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(k)

  /** Fused single-pass corpus-prep decision — the filter step a real
    * training-data pipeline runs over every document: ALL quality signals
    * (token stats, Gopher repetition fractions, stopword ratio, language id)
    * computed in ONE scan projection, then a deterministic keep/drop rule
    * with the first failing rule as `drop_reason`. Zero shuffle; at 100 TB
    * this is a map-only pass whose cost is one read of the corpus. */
  def prepPipeline(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val swRatio = when(size(col("__toks")) > 0,
      size(array_intersect(col("__toks"), typedLit(graft.ops.Stopwords.en)))
        .cast("double") / size(col("__toks")).cast("double"))
      .otherwise(lit(0.0))
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__rep", repetitionStatsUdf(col("__toks")))
      .withColumn("n_tokens",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(col("__rep.n_tokens")))
      .withColumn("top_2gram_frac", col("__rep.top_2gram_frac"))
      .withColumn("dup_2gram_frac", col("__rep.dup_2gram_frac"))
      .withColumn("stopword_ratio", swRatio)
      .withColumn("lang",
        TextAnalysis.langIdFromTokens(col(textCol), col("__toks")))
      .withColumn("drop_reason",
        // NULL text pins n_tokens to NULL, and NULL < 20 is NULL — without
        // the explicit first arm a null-text doc would fall through to the
        // language rule and report "non_english", attributing an upstream
        // extraction failure to language filtering in the drop telemetry
        when(col("n_tokens").isNull, "too_short")
          .when(col("n_tokens") < 20, "too_short")
          .when(col("top_2gram_frac") > 0.09, "repetitive_2gram")
          .when(col("dup_2gram_frac") > 0.08, "dup_2gram")
          .when(col("lang") =!= "en", "non_english")
          .when(col("stopword_ratio") < 0.005, "low_stopword")
          .otherwise(lit(null).cast("string")))
      .withColumn("keep", col("drop_reason").isNull)
      .select(col(idCol), col("n_tokens"), col("top_2gram_frac"),
        col("dup_2gram_frac"), col("stopword_ratio"), col("lang"),
        col("keep"), col("drop_reason"))
  }

  /** C4-style line-level cleaning + page-level filtering (Raffel et al.
    * 2020, the rule set behind the C4 corpus), complementing [[prepPipeline]]
    * (Gopher-style token statistics) with the OTHER standard web-cleaning
    * pass: per-LINE retention rules followed by per-PAGE drop rules.
    *
    * Line kept iff it ends in terminal punctuation (`. ! ? " '`), has at
    * least `minLineWords` space-separated words, and does not mention
    * "javascript" (case-insensitive). Page kept iff the cleaned text still
    * has at least `minSentences` sentence-ending marks, and the ORIGINAL
    * text contains neither `{` (code page signal) nor "lorem ipsum"
    * (placeholder-text signal).
    *
    * Every rule is a higher-order array expression or regexp count over
    * RE2-compatible patterns — fully codegen'd, zero shuffle, and an
    * independent SQL engine reproduces the cleaned text byte-for-byte.
    * Emits per-doc counters, the rule flags, the cleaned text, and `keep`. */
  def c4Filter(df: DataFrame, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    val lineOk = (l: Column) =>
      l.rlike("[.!?\"']$") &&
        size(split(trim(l), " +")) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, lineOk)
    val clean = array_join(kept, "\n")
    val nSent = (length(clean) - length(regexp_replace(clean, "[.!?]", "")))
      .cast("long")
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_lines_kept", size(kept).cast("long"))
      .withColumn("clean_text", clean)
      .withColumn("n_sentences", nSent)
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("keep",
        col("n_sentences") >= minSentences &&
          !col("has_brace") && !col("has_lorem"))
  }

  /** Sequence packing (contiguous fill): lay documents end-to-end in id
    * order and cut fixed-length training rows of `seqLen` tokens; each doc
    * reports the pack it STARTS in and its offset there. The global running
    * token count is a DISTRIBUTED PREFIX SUM: ids are bucketed into
    * contiguous ranges (`bucketWidth` ids per bucket), per-bucket totals are
    * collected to the driver (bounded: #buckets = idRange/bucketWidth —
    * pick the width so this stays in the thousands at any corpus size),
    * cumulative bucket offsets broadcast back, and the within-bucket running
    * sum is a window whose parallelism is #buckets. No global sort, no
    * single-task window: the classic two-phase prefix sum.
    *
    * Contract: `idCol` and `lenCol` must be non-null (a null id has no
    * position in the id order; a null length has no token count). Rows
    * violating it fail the job with a clear message instead of surfacing
    * as an opaque driver-side NPE from the collected bucket totals. */
  def packSequences(df: DataFrame, idCol: String, lenCol: String,
      seqLen: Long, bucketWidth: Long): DataFrame = {
    require(seqLen > 0 && bucketWidth > 0)
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"),
        col(lenCol).cast("long").as("len"))
      .withColumn("id", when(col("id").isNull, raise_error(
          lit(s"packSequences: null $idCol — every row needs an id position")))
        .otherwise(col("id")))
      .withColumn("len", when(col("len").isNull || col("len") < 0, raise_error(
          lit(s"packSequences: null/negative $lenCol — every row needs a " +
            "non-negative token length (a negative one would overlap pack " +
            "assignments and desync div/pmod on a negative start)")))
        .otherwise(col("len")))
      .withColumn("bucket", expr(s"id div $bucketWidth"))
    val (offCol, _) = prefixOffsetsByBucket(base, "bucket", sum("len"), ascending = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("id")
      .rowsBetween(Long.MinValue, 0)
    base.withColumn("cum", sum("len").over(w))
      .withColumn("start", offCol + col("cum") - col("len"))
      .withColumn("pack_id", expr(s"start div $seqLen"))
      .withColumn("pack_offset", pmod(col("start"), lit(seqLen)))
      .select(col("id"), col("len"), col("pack_id"), col("pack_offset"))
  }

  /** Deterministic sharded export — the pipeline's LAST step before a
    * training job consumes the corpus: each row lands in shard
    * md5(id) mod `nShards` (the portable convention: engine-independent
    * and growth-stable), every shard's rows are ORDERED by (hash, id) so
    * any engine writes identical shard contents in identical order, the
    * shards go out as hive-partitioned parquet, and the returned MANIFEST
    * is computed from the files just WRITTEN (not from the input): per
    * shard, the row count, total payload, and an ORDER-FREE checksum
    * (bit_xor of the 60-bit id hashes — commutative and mergeable, so the
    * aggregate carries one long per shard no matter how many billion rows
    * a shard holds; an ordered md5 chain would need the whole id list in
    * one place) — the receipt a consumer checks before training. Reading
    * back what was written makes the manifest a write-path verification,
    * not bookkeeping.
    *
    * Scale shape: one hash projection (zero shuffle), one repartition by
    * shard (each output file written by the executor owning the shard),
    * one map-side-combined rollup over the re-read shards. */
  def exportShards(df: DataFrame, idCol: String, sizeCol: String,
      outDir: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hash = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("__h", hash)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    back.withColumn("__h", hash)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sizeCol)).cast("long").as("payload"),
        expr("bit_xor(__h)").as("ids_xor"))
  }

  /** Shared kept/dropped per-source rollup of a decontamination pass: one
    * corpus scan, drop list broadcast. One copy so the Jaccard and
    * containment reports cannot drift. */
  private def decontaminateRollup(corpus: DataFrame, dropped: DataFrame,
      idCol: String, sourceCol: String, sizeCol: String): DataFrame =
    corpus
      .join(broadcast(dropped.select(col("id").as("__drop_id"))),
        corpus(idCol) === col("__drop_id"), "left")
      .groupBy(col(sourceCol).as("source"))
      .agg(
        sum(when(col("__drop_id").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__drop_id").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("__drop_id").isNull, col(sizeCol)).otherwise(lit(0L)))
          .cast("long").as("chars_kept"))

  /** NEAR-DUPLICATE benchmark decontamination — the fuzzy complement of
    * the exact-hash and n-gram paths (the GPT-3 appendix-C / Llama rule:
    * drop training docs that are near-copies of eval data, not just exact
    * ones): each corpus doc's best MinHash-LSH match against the
    * benchmark set decides, and docs at/above `threshold` exact Jaccard
    * drop. Matching is [[Dedup.incrementalNearDupsFromSigs]] with the
    * benchmark as the persisted signature store — the benchmark is signed
    * once and reused across corpus batches, the corpus is signed
    * per-call (it rides the scan anyway), and candidates carry ids only.
    * Returns the per-source rollup (n_kept, n_dropped, chars_kept); the
    * drop list broadcasts (ids only, bounded by corpus-benchmark overlap
    * — a pipeline whose corpus mostly overlaps its benchmarks has bigger
    * problems than a broadcast). */
  def nearDupDecontaminate(corpus: DataFrame, benchmarkSigs: DataFrame,
      idCol: String, sourceCol: String, sizeCol: String, textCol: String,
      shingleSize: Int = 3, numBands: Int = 16, rowsPerBand: Int = 8,
      threshold: Double = 0.6): DataFrame =
    decontaminateRollup(corpus,
      graft.ops.Dedup.incrementalNearDupsFromSigs(
        corpus, benchmarkSigs, idCol, textCol,
        shingleSize, numBands, rowsPerBand, threshold),
      idCol, sourceCol, sizeCol)

  /** Globally-SORTED range-partitioned export — the sorted-lake layout:
    * `repartitionByRange` samples range boundaries on the sort key
    * (Spark's RangePartitioner — at any scale, one sampling pass then a
    * range shuffle, never a single-task global sort), each partition
    * sorts locally, and partition i's key range sits entirely below
    * partition i+1's, so the written files concatenate into one globally
    * ordered dataset (the layout that gives sorted-parquet lakes their
    * min/max-pruned range scans). Returns the per-partition manifest
    * computed from the files just WRITTEN — (part, n_rows, key min/max) —
    * plus two self-check probe columns on every row:
    * `overlap_violations` (adjacent-partition range overlaps; 0 = the
    * concatenation is globally sorted) and `n_total` (rows across all
    * parts; must equal the input). Boundary PLACEMENT is sampling-
    * dependent (RangePartitioner seeds by RDD id), so per-partition
    * contents are not engine-replayable — the probes plus totals are the
    * contract, the rows-only gate convention. Ties on the sort key may
    * straddle a boundary; `overlap_violations` therefore compares with
    * strict inequality (sorted concatenation still holds). */
  def exportRangeSorted(df: DataFrame, keyCol: String, outDir: String,
      nParts: Int): DataFrame = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    // sort leads with the partition column (constant within a partition,
    // so within-file order is still keyCol): the dynamic-partition writer
    // REQUIRES child ordering on "part" and would otherwise inject its
    // own part-only sort, which under spill-merge does not preserve the
    // key order this export exists to provide (the exportShards pattern)
    val routed = df.repartitionByRange(nParts, col(keyCol))
      .withColumn("part", spark_partition_id())
    writeRangeManifest(df, routed, keyCol, outDir)
  }

  /** [[exportRangeSorted]] with EXPLICIT equal-width boundaries instead of
    * RangePartitioner sampling: part = clamp(floor((key - lo) / width)).
    * Trades balanced file sizes (sampling adapts to the distribution;
    * fixed boundaries do not) for full engine-replayability — the per-file
    * manifest (part, n_rows, key min/max) is a pure function of the input,
    * so an independent engine verifies the whole write/roll/read-back
    * chain from the source table alone. The scalable sampled variant stays
    * the production path; this is its oracle-exact anchor twin AND the
    * right tool when boundary STABILITY across runs matters more than
    * balance (e.g. re-exports that must produce identical file splits). */
  def exportRangeBounded(df: DataFrame, keyCol: String, outDir: String,
      lo: Double, width: Double, nParts: Int): DataFrame = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    require(width > 0, s"width must be positive, got $width")
    // NULL floors to NULL, which greatest() SKIPS -> part 0; NaN rides
    // greatest to the LAST part (the distributionDrift NaN trap) — either
    // way a broken key hides as edge-bin mass while the null-skipping
    // min/max manifest reads clean. Fail loud instead.
    val keyChecked = when(col(keyCol).isNull ||
        isnan(col(keyCol).cast("double")), raise_error(lit(
        s"exportRangeBounded: NULL/NaN $keyCol — it has no bucket and " +
          "would silently masquerade as edge-bin mass; filter upstream"))
        .cast("double"))
      .otherwise(col(keyCol).cast("double"))
    val part = least(greatest(
      floor((keyChecked - lit(lo)) / lit(width)), lit(0.0)),
      lit((nParts - 1).toDouble)).cast("int")
    // hash-repartition on the bucket id: co-locates each bucket in one
    // task (the dynamic writer then emits one file per bucket dir), and
    // unlike repartitionByRange needs no sampling pass over the input
    val routed = df.withColumn("part", part).repartition(nParts, col("part"))
    writeRangeManifest(df, routed, keyCol, outDir)
  }

  /** Shared write + manifest-read-back + probe machinery of the range
    * exports: writes `routed` (must carry an int `part` column) sorted
    * within partitions, reads the files BACK, and returns the per-part
    * manifest with the overlap/coverage probes. */
  private def writeRangeManifest(df: DataFrame, routed: DataFrame,
      keyCol: String, outDir: String): DataFrame = {
    routed
      .sortWithinPartitions(col("part"), col(keyCol))
      .write.mode("overwrite").partitionBy("part").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    val manifest = back.groupBy(col("part").cast("int").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))
      .localCheckpoint(false) // window pass + totals pass, one file scan
    val w = org.apache.spark.sql.expressions.Window.orderBy("part")
    // the manifest is nParts rows — a driver-sized frame, so the global
    // window and the totals crossJoin cost nothing
    val checked = manifest
      .withColumn("__prev_max", lag(col("key_max"), 1).over(w))
      .withColumn("__overlap",
        when(col("__prev_max").isNotNull && col("key_min") < col("__prev_max"), 1L)
          .otherwise(0L))
    val totals = checked.agg(sum(col("__overlap")).as("overlap_violations"),
      sum(col("n_rows")).as("n_total"))
    // rows_missing pins written-vs-input coverage IN-QUERY (0 = nothing
    // lost in the write): n_total alone could silently shrink with a
    // dropped-rows bug and still read as a clean manifest
    val inTotal = df.agg(count(lit(1)).as("__in_n"))
    checked.crossJoin(broadcast(totals)).crossJoin(broadcast(inTotal))
      .withColumn("rows_missing", col("__in_n") - col("n_total"))
      .select("part", "n_rows", "key_min", "key_max",
        "overlap_violations", "n_total", "rows_missing")
  }

  /** Deterministic train/val/test assignment by PORTABLE hash: bucket =
    * md5(id) leading 60 bits mod 100, split by cumulative percentage
    * boundaries. Any engine reproduces the exact same assignment (no rand(),
    * no seed coordination across a fleet), membership is stable under
    * corpus growth, and the operator is a zero-shuffle projection. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)
  ): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100L))
    val expr = splits.tail.foldLeft(
      (when(bucket < splits.head._2, splits.head._1), splits.head._2)) {
      case ((acc, cum), (name, pct)) =>
        (acc.when(bucket < cum + pct, name), cum + pct)
    }._1
    df.withColumn("split", expr)
  }

  /** Deterministic data-mixture application: per-group keep rates (e.g. a
    * DoReMi / temperature-scaled pretraining mixture computed offline)
    * applied via a PORTABLE salted hash — keep iff
    * md5(id # "#mix") mod 1e6 < round(rate * 1e6). Any engine reproduces
    * the exact membership, membership is stable under corpus growth (a
    * kept row stays kept as new data arrives — resampling a growing corpus
    * never churns the downsampled set), and the plan is a broadcast join
    * of the bounded rate table + a filter: zero shuffle at any scale.
    *
    * The hash is SALTED ("#mix") so mixture membership is independent of
    * [[hashSplit]]'s buckets — the unsalted hash would keep exactly the
    * rows that land in 'train', biasing every split downstream. Thresholds
    * are integerized driver-side (round(rate*1e6)), so engines never
    * compare floats. Groups absent from `rates` keep `defaultRate`. */
  def applyMixture(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      s"keep rates must be in [0,1]")
    val grid = 1000000L
    val thr = rates.toSeq.map { case (g, r) => (g, math.round(r * grid)) }
    val rdf = broadcast(df.sparkSession.createDataFrame(thr)
      .toDF("__mix_g", "__mix_thr"))
    val bucket = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit("#mix"))), 1, 15), 16, 10)
        .cast("long"),
      lit(grid))
    df.join(rdf, df(groupCol) === col("__mix_g"), "left")
      .filter(bucket < coalesce(col("__mix_thr"), lit(math.round(defaultRate * grid))))
      .drop("__mix_g", "__mix_thr")
  }

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows per
    * stratum, chosen as the k smallest md5(id) — a portable hash order any
    * engine reproduces, unlike rand(). One shuffle carrying <= k rows per
    * (stratum, map task) via the bounded bottom-k partial aggregate.
    * Emits (stratum, id, rk) with rk in [1, k] in hash order. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String, k: Int
  ): DataFrame = {
    val bk = udaf(new BottomKAggregator(k), Encoders.product[StratItem])
    df.select(col(stratumCol).as("stratum"), col(idCol).cast("long").as("id"))
      .withColumn("skey", md5(col("id").cast("string")))
      .groupBy("stratum")
      .agg(bk(col("skey"), col("id")).as("s"))
      .select(col("stratum"), posexplode(arrays_zip(col("s.keys"), col("s.ids"))))
      .select(col("stratum"), col("col.ids").as("id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** EXACT-SIZE stratified sample with quota spill — the eval-set builder:
    * `totalK` rows overall, split across strata by integer WATERFILLING
    * (equal shares, but a stratum smaller than its share is taken whole
    * and its unused quota redistributes to the others), so the sample
    * always hits exactly `min(totalK, corpus)` rows — the property the
    * fixed-k [[stratifiedSample]] cannot give when strata are uneven.
    *
    * The waterfill is computed IN-PLAN with window functions over the
    * per-stratum counts (strata ordered by (size, name) ascending; a
    * stratum is CAPPED iff size * strataRemaining <= quotaRemaining —
    * capped strata form a prefix of that order, so the first uncapped row
    * fixes the water level L = rem div avail and remainder r, and the
    * first r uncapped strata get L+1). Every step is integer arithmetic
    * over counts, so an independent SQL engine replays the quotas —
    * and the membership — exactly. Within a stratum, rows are chosen as
    * the smallest md5(id) (the portable hash order of
    * [[stratifiedSample]]). Returns (stratum, quota, id, rk).
    * Counts are stratum-cardinality rows; the corpus is scanned once for
    * counts and once for the per-stratum rank. The rank is a per-stratum
    * window sort — at corpus scales where that sort dominates, run
    * [[stratifiedSample]]'s bounded bottom-k aggregate with
    * k = max(quota) and apply the quota filter to its ranks; the window
    * form is kept here because it is the shape the SQL oracle replays
    * verbatim. NULL strata fold to the sentinel stratum `"__null"` (the
    * categoricalDrift convention): a genuine stratum literally named
    * `__null` merges with NULL-keyed rows. */
  def quotaSample(df: DataFrame, stratumCol: String, idCol: String,
      totalK: Long): DataFrame = {
    require(totalK > 0, s"totalK must be positive, got $totalK")
    import org.apache.spark.sql.expressions.Window
    // the stratum key is folded to a string with NULL -> '__null' on BOTH
    // the size table and the row frame: the quota join on "stratum" never
    // matches NULL = NULL, so an unfolded null stratum would consume quota
    // in the waterfill yet read quota = null per row — and the corpus-
    // smaller-than-totalK coalesce below would then keep EVERY null-stratum
    // row, blowing past totalK
    val stratumKey = coalesce(col(stratumCol).cast("string"), lit("__null"))
    val sizes = df.groupBy(stratumKey.as("stratum"))
      .agg(count(lit(1)).as("sz"))
      .localCheckpoint(false) // stratum-cardinality rows, consumed twice
    val ord = Window.orderBy(col("sz"), col("stratum"))
    val ranked = sizes
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("prefix", sum("sz").over(ord))
      .crossJoin(broadcast(sizes.agg(count(lit(1)).as("m"))))
      .withColumn("rem", lit(totalK) - (col("prefix") - col("sz")))
      .withColumn("avail", col("m") - col("rn") + 1L)
      .withColumn("capped", col("sz") * col("avail") <= col("rem"))
    val level = ranked.filter(!col("capped"))
      .orderBy("rn").limit(1)
      .select(expr("rem div avail").as("__lvl"),
        pmod(col("rem"), col("avail")).as("__r"), col("rn").as("__t"))
    val quotas = ranked.crossJoin(broadcast(level))
      .select(col("stratum"),
        when(col("capped"), col("sz"))
          .otherwise(col("__lvl") +
            when(col("rn") - col("__t") < col("__r"), 1L).otherwise(0L))
          .as("quota"))
    val w = Window.partitionBy("stratum")
      .orderBy(col("skey"), col("id"))
    df.select(stratumKey.as("stratum"), col(idCol).cast("long").as("id"))
      .withColumn("skey", md5(col("id").cast("string")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("stratum"), "left")
      // a corpus smaller than totalK has no uncapped row: quota is null
      // for nothing (every stratum capped), so coalesce to sz-take-all
      .filter(col("rk") <= coalesce(col("quota"), col("rk")))
      .select(col("stratum"), coalesce(col("quota"), lit(-1L)).as("quota"),
        col("id"), col("rk"))
  }

  /** Deterministic weighted sample without replacement — PRIORITY SAMPLING
    * (Duffield-Lund-Thorup, JACM 2007): each row gets priority w/u with u a
    * portable md5-uniform in (0,1], and the k highest-priority rows are the
    * sample. Two properties make this the corpus-scale choice over the
    * ln-based Efraimidis-Spirakis keys:
    *  - the priority is ONE int-to-double conversion, one power-of-two
    *    scale, and one division — every step correctly rounded in any IEEE
    *    engine, so the emitted priority is bit-reproducible cross-engine
    *    (a transcendental key is not: Math.log vs libm ln differ in the
    *    last ulp on arbitrary arguments — see the HLL parity note);
    *  - top-k by priority is TakeOrderedAndProject: bounded per-partition
    *    heaps, no global sort, no shuffle of the corpus.
    * Contract: weights must be positive (a non-positive weight has no
    * inclusion probability — fails loud). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // isnan too (the distributionDrift convention): NaN passes every
    // comparison guard AND sorts above every real priority, so one
    // 0.0/0.0 weight upstream would otherwise fill the sample
    val w = when(col(weightCol).isNull || isnan(col(weightCol)) ||
        col(weightCol) <= 0, raise_error(
        lit(s"weightedSample: $weightCol must be positive — a " +
          "non-positive/NaN weight has no inclusion probability")))
      .otherwise(col(weightCol))
    val hv = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    // u = (hv+1) / 2^60 in (0,1]: the 60-bit int fits a correctly-rounded
    // double conversion; the divisor is a power of two (exact scale)
    val u = (hv + lit(1L)).cast("double") / lit(1.152921504606846976e18)
    df.select(col(idCol), w.cast("double").as(weightCol))
      .withColumn("priority", col(weightCol) / u)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Quality-ranked token-budget selection: rank the corpus by
    * (`scoreCol` desc, id), and keep the longest PREFIX of that ranking
    * whose cumulative `lenCol` stays within `budget` — "fill the training
    * budget with the best data first", the step after scoring in every
    * data-mixing pipeline. Prefix semantics (no back-fill past the first
    * overflow) keep the output deterministic and order-independent.
    *
    * Scale shape: the global running sum is the packSequences two-phase
    * prefix sum transposed onto the score order — per-SCORE-BIN totals
    * (bounded driver list, `nBins` entries), cumulative bin offsets
    * broadcast back, and a within-bin window whose parallelism is #bins.
    * No global sort, no single-task window over the corpus.
    *
    * Contract: scores in [0,1] (the bin layout depends on it), lengths
    * non-negative, both non-null — violations fail loud. */
  def budgetSelect(df: DataFrame, idCol: String, lenCol: String,
      scoreCol: String, budget: Long, nBins: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val spark = df.sparkSession
    val len = when(col(lenCol).isNull || col(lenCol) < 0, raise_error(
        lit(s"budgetSelect: $lenCol must be a non-negative token count")))
      .otherwise(col(lenCol)).cast("long")
    val score = when(col(scoreCol).isNull || isnan(col(scoreCol)) ||
        col(scoreCol) < 0 || col(scoreCol) > 1, raise_error(
        lit(s"budgetSelect: $scoreCol must be in [0,1] and not NaN")))
      .otherwise(col(scoreCol)).cast("double")
    val base = df.select(col(idCol).as("id"), len.as("len"),
        score.as("score"))
      .withColumn("bin", least(floor(col("score") * nBins),
        lit((nBins - 1).toLong)).cast("long"))
    // bounded driver assembly: one (bin, total) row per non-empty bin
    val (offCol, _) =
      prefixOffsetsByBucket(base, "bin", sum("len"), ascending = false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bin").orderBy(col("score").desc, col("id"))
      .rowsBetween(Long.MinValue, 0)
    base.withColumn("cum_tokens", offCol + sum("len").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("id"), col("len"), col("score"), col("cum_tokens"))
  }

  /** CDC merge (upsert + tombstone): apply an update batch to a base
    * snapshot, last-writer-wins by `versionCol`, with rows whose winning
    * record is a tombstone (`deleteCol` true) dropped from the output —
    * the ingest-time compaction every continuously-updated corpus needs.
    *
    * Winner selection is `max(struct(version, source, payload…))` under one
    * `groupBy(key)` — an argmax aggregate, NOT a `row_number()` window: the
    * aggregate partial-combines map-side (each task forwards one candidate
    * row per key it saw), so the exchange carries at most one row per
    * (key, task) instead of every duplicate, and there is no per-partition
    * sort. On a version tie the update batch wins over the base (`__src` is
    * the struct's second field); remaining payload fields make any further
    * tie deterministic rather than first-seen.
    *
    * Contract: both frames share one schema; `versionCol` must be non-null
    * (a versionless row has no place in last-writer-wins order — fails loud
    * per the repo convention). */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "mergeUpsert: at least one key column")
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeUpsert: schemas differ: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    require(!base.columns.contains("__src"), "mergeUpsert: __src is reserved")
    val guarded = (df: DataFrame, src: Int) => df
      .withColumn(versionCol, when(col(versionCol).isNull, raise_error(
          lit(s"mergeUpsert: null $versionCol — last-writer-wins needs a version")))
        .otherwise(col(versionCol)))
      .withColumn("__src", lit(src))
    val all = guarded(base, 0).unionByName(guarded(updates, 1))
    val payload = all.columns.filterNot(c => keyCols.contains(c) || c == "__src")
    val ordered = struct(
      col(versionCol) +: col("__src") +:
        payload.filterNot(_ == versionCol).map(col): _*)
    val merged = all.groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("__w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
    // a NULL delete flag is a plain upsert, not a tombstone: !NULL = NULL
    // and filter would silently DROP the winning row — coalesce to false
    // (CDC sources commonly set the flag only on delete ops)
    deleteCol.fold(merged)(d => merged.filter(!coalesce(col(d), lit(false))))
  }

  /** The added/removed/changed/unchanged classification shared by
    * [[snapshotDiff]] and [[tableDiff]] — ONE definition so the two
    * full-outer diff operators cannot drift on NULL-safety semantics
    * (r19 review). A side is "added" when absent from the OLD/base
    * snapshot, "changed" on any non-NULL-safe-equal payload. */
  private def diffClass(oldSide: Column, newSide: Column): Column =
    when(oldSide.isNull, "added")
      .when(newSide.isNull, "removed")
      .when(!(oldSide <=> newSide), "changed")
      .otherwise("unchanged")

  /** SNAPSHOT DIFF (r18) — the dataset-versioning complement of
    * [[mergeUpsert]]: given two snapshots of a corpus, one row per id
    * with its `diff_status` — `added` (new only), `removed` (old only),
    * `changed` (any compared column differs, NULL-safe), `unchanged` —
    * the audit a pipeline runs between ingest versions ("what did this
    * refresh actually do") and the input to incremental reprocessing
    * (recompute only added ∪ changed). ONE full-outer join on the id —
    * both sides shuffle once on the same key; the per-side duplicate
    * guard is a window over that same partitioning (no extra shuffle),
    * because duplicate ids would silently MULTIPLY join rows and
    * misstate every count. NULL ids fail loud (they would collapse
    * into one join group). Compared columns are the caller's choice —
    * compare a content hash, not the payload, when bytes are large. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: at least one compare column")
    (compareCols :+ idCol).foreach { c =>
      require(old.columns.contains(c) && neu.columns.contains(c),
        s"snapshotDiff: column '$c' missing from a snapshot " +
          s"(old: ${old.columns.toSeq}, new: ${neu.columns.toSeq})")
    }
    def side(df: DataFrame, name: String) = df
      .select(
        when(col(idCol).isNull, raise_error(lit(
            s"snapshotDiff: NULL $idCol in the $name snapshot — ids " +
              "key the diff; fix upstream")).cast(df.schema(idCol).dataType))
          .otherwise(col(idCol)).as("__id"),
        struct(compareCols.map(col): _*).as(s"__$name"))
      .withColumn("__c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))))
      // the guard is a FILTER, not an id-rewriting projection: wrapping
      // __id in a when() makes it a fresh expression Catalyst cannot
      // prove co-partitioned, forcing a SECOND per-side exchange before
      // the join (plan-audited); the filter keeps the window's
      // hashpartitioning(__id) alive so the join reuses it
      .filter(when(col("__c") > 1, raise_error(concat(lit(
          s"snapshotDiff: duplicate $idCol '"), col("__id").cast("string"),
          lit(s"' in the $name snapshot — duplicates would multiply " +
            "join rows and misstate every count; dedupe upstream")))
          .cast("boolean"))
        .otherwise(lit(true)))
      .select(col("__id"), col(s"__$name"))
    side(old, "old").join(side(neu, "new"), Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        diffClass(col("__old"), col("__new")).as("diff_status"),
        col("__old"), col("__new"))
  }

  /** TEMPERATURE-scaled mixture thresholds (the alpha=0.5 pretraining
    * reweighting of Llama / multilingual-LM data recipes: sampling weight
    * proportional to sqrt of a source's share, so rare sources are
    * up-weighted relative to their raw mass). Fully declarative — the
    * per-group table is computed in-plan (one map-side-combined count,
    * one one-row total, one broadcast-sized crossJoin), no driver math:
    *
    *   w_g   = floor(sqrt(scale * n_g))          [integer; sqrt of an
    *           integer < 2^40 is correctly rounded far from the integer
    *           boundary, so floor is bit-identical in any IEEE engine]
    *   B     = N * budgetPpm div 1e6             [target output rows]
    *   thr_g = min(grid, B * w_g * grid div (Z * n_g))  [per-group keep
    *           threshold on the salted-hash grid; Z = sum w_g]
    *
    * All products run in decimal(38,0), so the arithmetic never overflows
    * at any corpus scale (the DuckDB oracle replays it in HUGEINT).
    * Returns one row per group: (group, n_docs, w, thr). Expected output
    * size is B rows distributed as p_g = w_g/Z per group, each group
    * capped at its own mass (thr caps at grid = keep everything). */
  def temperatureThresholds(df: DataFrame, groupCol: String,
      budgetPpm: Long, scale: Long = 100L): DataFrame = {
    // scale = 0 would zero every sqrt weight -> z_tot = 0 -> the threshold
    // division yields NULL, least() skips it, and every group silently
    // keeps 100% regardless of budgetPpm
    require(scale >= 1, s"scale must be >= 1, got $scale")
    require(budgetPpm >= 0 && budgetPpm <= 1000000L,
      s"budgetPpm must be in [0, 1e6], got $budgetPpm")
    val grid = 1000000L
    // names are deliberately collision-free under Spark's case-insensitive
    // resolution (a `zt` total next to a `Zt` per-group column would be
    // AMBIGUOUS_REFERENCE)
    val counts = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n") * lit(scale))).cast("long"))
    val tot = counts.agg(sum("w").as("z_tot"), sum("n").as("n_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("b_tgt",
        expr(s"CAST(n_tot AS DECIMAL(38,0)) * $budgetPpm div ${grid}"))
      .withColumn("thr", least(lit(grid),
        expr(s"CAST(b_tgt AS DECIMAL(38,0)) * w * $grid div (CAST(z_tot AS DECIMAL(38,0)) * n)")
          .cast("long")))
      .select(col("g").as(groupCol), col("n").as("n_docs"), col("w"),
        col("thr"))
  }

  /** Apply per-group integer keep thresholds on the salted portable hash
    * grid: keep iff md5(id # salt) mod 1e6 < thr(group). The
    * [[applyMixture]] selection rule with the threshold table computed
    * upstream (e.g. [[temperatureThresholds]]) instead of passed as
    * literals — broadcast join + filter, zero shuffle on the corpus.
    *
    * EXPLICIT-MIXTURE-ONLY contract (deliberate, spec-pinned): a group
    * absent from `thresholds` keeps ZERO rows — absent means "not in the
    * mixture", the same semantics as a mixture spec that omits the group
    * (thr = 0), NOT an error. This intentionally diverges from
    * [[weightedInterleave]]'s fail-loud missing-weight rule: there a
    * missing weight has no zero-meaning (every interleaved stream must be
    * weighted), here thr = 0 is a first-class value the threshold
    * computation itself can emit. Callers who consider a missing group a
    * bug should anti-join their corpus against `thresholds` first. */
  def applyThresholds(df: DataFrame, groupCol: String, idCol: String,
      thresholds: DataFrame, salt: String = "#mix"): DataFrame = {
    val grid = 1000000L
    val t = broadcast(thresholds.select(col(groupCol).as("__tg"),
      col("thr").as("__thr")))
    val bucket = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 15), 16, 10)
        .cast("long"),
      lit(grid))
    df.join(t, df(groupCol) === col("__tg"), "left")
      .filter(bucket < coalesce(col("__thr"), lit(0L)))
      .drop("__tg", "__thr")
  }

  /** DATA-CONSTRAINED epoch repetition (the Muennighoff et al. 2023
    * "Scaling Data-Constrained Language Models" recipe shape): each group
    * is replayed toward `targetTokens`, as full epochs plus a
    * deterministic fractional epoch, capped at `maxEpochs` (repeating
    * data beyond ~4 epochs stops buying loss — the cap is the operative
    * knob). Per group with token mass T_g:
    *
    *   full     = min(maxEpochs, targetTokens div T_g)
    *   frac_ppm = 0 if capped, else (targetTokens mod T_g) * 1e6 div T_g
    *
    * Every doc appears `full` times (explode of a generated sequence — no
    * driver loop), and once more iff md5(id # "#epoch") mod 1e6 <
    * frac_ppm (hash-uniform doc selection ≈ token-proportional in
    * expectation, deterministic and growth-stable). Emits one row per
    * (doc instance): (id, group, tokens, epoch). */
  def epochRepeat(df: DataFrame, idCol: String, tokenCol: String,
      groupCol: String, targetTokens: Long, maxEpochs: Int): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val grid = 1000000L
    // token counts must be non-negative non-null: a zero/NULL group mass
    // makes `targetTokens div __T` NULL, which least() SKIPS — the group
    // would silently replay maxEpochs times; a negative mass would make
    // the group vanish. Fail loud at the mass level (covers both).
    val masses = df.groupBy(col(groupCol).as("__eg"))
      .agg(sum(when(col(tokenCol).isNull || col(tokenCol) < 0, raise_error(
          lit(s"epochRepeat: null/negative $tokenCol — every doc needs a " +
            "non-negative token count")))
        .otherwise(col(tokenCol))).as("__T"))
      .withColumn("__T", when(col("__T") <= 0, raise_error(lit(
          s"epochRepeat: a group's total $tokenCol mass is zero — its " +
            "epoch count is undefined; filter empty groups upstream")))
        .otherwise(col("__T")))
      .withColumn("__full",
        least(lit(maxEpochs.toLong), expr(s"$targetTokens div __T")))
      .withColumn("__frac_ppm",
        when(expr(s"$targetTokens div __T") >= maxEpochs.toLong, lit(0L))
          // the remainder * 1e6 product runs in DECIMAL(38,0): in BIGINT it
          // wraps past ~9.2e12 remainder tokens (real pretraining targets
          // are 1e13+), going negative and silently zeroing the fractional
          // epoch — the temperatureThresholds overflow convention. `div`
          // keeps the original floor-division semantics (decimal `/` would
          // round at scale); its result is in [0, 1e6), always BIGINT-safe
          .otherwise(expr(s"CAST((CAST($targetTokens AS DECIMAL(38,0)) % __T)" +
            s" * $grid div CAST(__T AS DECIMAL(38,0)) AS BIGINT)")))
    val base = df.select(col(idCol).as("id"), col(groupCol).as("g"),
        col(tokenCol).as("tokens"))
      .join(broadcast(masses), col("g") === col("__eg"))
    // Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty (unlike
    // DuckDB's generate_series) — an unguarded explode would emit two
    // spurious epochs for every group whose mass already exceeds the
    // target, so zero-full-epoch groups are filtered out before the explode
    val fullEpochs = base.filter(col("__full") >= 1L)
      .select(col("id"), col("g"), col("tokens"),
        explode(expr("sequence(1, __full)")).as("epoch"))
    val fracBucket = pmod(
      conv(substring(md5(concat(col("id").cast("string"), lit("#epoch"))), 1, 15), 16, 10)
        .cast("long"),
      lit(grid))
    val fracEpoch = base.filter(col("__frac_ppm") > 0L && fracBucket < col("__frac_ppm"))
      .select(col("id"), col("g"), col("tokens"),
        (col("__full") + 1L).as("epoch"))
    fullEpochs.unionByName(fracEpoch)
      .select(col("id"), col("g").as(groupCol), col("tokens"),
        col("epoch").cast("long").as("epoch"))
  }

  /** CONTAINMENT benchmark decontamination — drops corpus docs that
    * CONTAIN a benchmark document (directional |S_bench ∩ S_doc| /
    * |S_bench| >= threshold), the rule that catches benchmark questions
    * quoted inside long training documents, which the Jaccard variant
    * ([[nearDupDecontaminate]]) structurally misses (the document's
    * length dilutes Jaccard below any dedup threshold). Same per-source
    * kept/dropped rollup; the signature store is the SAME persisted frame
    * the Jaccard path uses. */
  def containmentDecontaminate(corpus: DataFrame, benchmarkSigs: DataFrame,
      idCol: String, sourceCol: String, sizeCol: String, textCol: String,
      shingleSize: Int = 3, numBands: Int = 64, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame =
    decontaminateRollup(corpus,
      graft.ops.Dedup.containmentFromSigs(
        corpus, benchmarkSigs, idCol, textCol,
        shingleSize, numBands, rowsPerBand, threshold),
      idCol, sourceCol, sizeCol)

  /** TABLE DIFF — the data-ops reconciliation operator: classify every key
    * across two versions of a table as added / removed / changed /
    * unchanged. One full-outer shuffle join on the key; the payload
    * comparison packs all non-key columns into one struct and uses the
    * null-safe equality operator, so a one-sided-null column counts as a
    * change (the class a naive `=!=` would silently skip). Both frames
    * must share a schema — a diff across different schemas has no right
    * silent answer — and keys must be UNIQUE per side (a duplicate key
    * fails the job loudly: the full-outer join would otherwise
    * cross-product it into double-counted classes). Returns (keyCols*,
    * diff_class), one row per key present in either version. */
  def tableDiff(base: DataFrame, revised: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "tableDiff: at least one key column")
    require(base.columns.sorted.sameElements(revised.columns.sorted),
      s"tableDiff: schemas differ: ${base.columns.toSeq} vs ${revised.columns.toSeq}")
    val payload = base.columns.filterNot(keyCols.contains)
    require(payload.nonEmpty, "tableDiff: no non-key columns to compare")
    // the per-key aggregate doubles as the uniqueness guard: a duplicate
    // key raises instead of silently cross-producting through the join
    def packed(df: DataFrame, as: String) =
      df.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__c"),
          max(struct(payload.map(col): _*)).as(as))
        .withColumn(as, when(col("__c") > 1L, raise_error(concat(
            lit("tableDiff: duplicate key — keys must be unique per side: "),
            concat_ws(",", keyCols.map(k => col(k).cast("string")): _*))))
          .otherwise(col(as)))
        .drop("__c")
    packed(base, "__bv").join(packed(revised, "__rv"), keyCols, "full_outer")
      .withColumn("diff_class", diffClass(col("__bv"), col("__rv")))
      .select(keyCols.map(col) :+ col("diff_class"): _*)
  }

  /** SMALL-FILE COMPACTION — the lakehouse maintenance op: rewrite a
    * directory of many undersized files into files of `targetRows` rows,
    * preserving global `idCol` order, and return a read-back manifest
    * with before/after file counts and a row-preservation check. The bin
    * assignment is a DETERMINISTIC global rank (the [[packSequences]]
    * two-phase prefix sum with unit lengths — per-bucket totals are a
    * bounded driver collect, never a single-task window), so bin
    * membership replays in any engine, unlike a coalesce()-based
    * compaction whose file boundaries are scheduler-dependent.
    *
    * Returns one row per output bin: (bin, n_rows, id_min, id_max,
    * files_before, files_after, rows_missing) — rows_missing must read 0. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, idCol: String, targetRows: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val in = spark.read.parquet(inDir)
    // input_file_name() cannot sit inside an aggregate (non-deterministic
    // per Catalyst); project it to a column first
    val before = in.withColumn("__f", input_file_name())
      .agg(countDistinct(col("__f")).as("files_before"),
        count(lit(1)).as("__n_in"))
    val binned = packSequences(
        in.withColumn("__one", lit(1L)), idCol, "__one",
        seqLen = targetRows, bucketWidth = bucketWidth)
      .select(col("id").as("__bid"), col("pack_id").as("bin"))
    // join the bin assignment back onto the FULL rows: a compaction that
    // rewrote only the id column would silently lose every payload column
    in.join(binned, col(idCol).cast("long") === col("__bid"))
      .drop("__bid")
      .repartition(col("bin"))
      .sortWithinPartitions(col("bin"), col(idCol))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    val back = spark.read.parquet(outDir)
    val manifest = back.groupBy(col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("id_min"), max(col(idCol)).as("id_max"))
    val after = back.withColumn("__f", input_file_name())
      .agg(countDistinct(col("__f")).as("files_after"),
        count(lit(1)).as("__n_out"))
    manifest.crossJoin(broadcast(before)).crossJoin(broadcast(after))
      .select(col("bin"), col("n_rows"), col("id_min"), col("id_max"),
        col("files_before"), col("files_after"),
        (col("__n_in") - col("__n_out")).as("rows_missing"))
  }

  /** Deterministic WEIGHTED INTERLEAVE of sources into one training order
    * (the scheduling half of a data mixture — [[applyMixture]] decides
    * membership, this decides ORDER): row r of source s gets virtual time
    * vt = rank_s(r) * grid div w_s (integerized inverse-weight pacing), and
    * the global order is (vt, source, id). A weight-2 source appears twice
    * as often as a weight-1 source in any prefix — the standard
    * heterogeneous-mixture batch schedule, reproducible in any engine.
    * Within-source rank follows the portable md5 hash (a fresh shuffle per
    * `seed`). Emits every row: (id, source, weight, vt) — a group ABSENT
    * from `weights` fails the job loudly (the repo's fail-loud
    * convention: silently dropping an unweighted source from the training
    * order is the worst possible default). One keyed shuffle (the
    * per-source rank window); consumers range-partition by vt to
    * materialize the order — no global sort here. */
  def weightedInterleave(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Long], seed: String = "interleave"): DataFrame = {
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    val grid = 1000000L
    val wdf = broadcast(df.sparkSession
      .createDataFrame(weights.toSeq).toDF("__wg", "__w"))
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), col(groupCol))
      .join(wdf, col(groupCol) === col("__wg"), "left")
      .withColumn("__w", when(col("__w").isNull, raise_error(concat(
          lit("weightedInterleave: no weight for group "), col(groupCol))))
        .otherwise(col("__w")))
      .withColumn("__h", md5(concat(lit(seed), lit("#"), col(idCol).cast("string"))))
      .withColumn("__rk", row_number().over(byGroup).cast("long"))
      .select(col(idCol), col(groupCol), col("__w").as("weight"),
        expr(s"__rk * $grid div __w").as("vt"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment: shard(id) =
    * argmax over s in [0, nShards) of md5(id # "#hrw#" # s). The property
    * mod-hashing lacks: growing nShards -> nShards+1 moves ONLY the keys
    * whose new hash wins — an expected 1/(nShards+1) of them, and every
    * moved key lands on the NEW shard (its argmax among the old shards is
    * unchanged). That is the stable-resharding contract a growing 100 TB
    * store needs: adding capacity never reshuffles data between existing
    * shards. Ties are impossible in practice (128-bit hashes) but broken
    * deterministically toward the lower shard id anyway.
    *
    * The argmax runs as array_max over a generated per-row struct array —
    * a higher-order expression (interpreted per element, see the
    * ARCHITECTURE UDF ladder) which is fine at typical nShards; a
    * thousand-shard deployment would swap in a primitive-loop UDF, same
    * contract. */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // struct comparison is field-order lexicographic: (hash desc) via
    // array_max on (h, -s) then negate — max h, tie to LOWER s
    array_max(transform(
      sequence(lit(0), lit(nShards - 1)),
      s => struct(
        md5(concat(id.cast("string"), lit("#hrw#"), s.cast("string"))).as("h"),
        (s * -1).as("neg_s"))))
      .getField("neg_s") * -1
  }

  /** Deterministic seeded GLOBAL SHUFFLE for training-data ordering: every
    * row gets a shard and a position, both functions of md5(seed # id)
    * only — any engine (and any rerun) reproduces the identical order, and
    * changing the seed is a fresh independent permutation. One shuffle
    * (partition by shard) + per-shard sort; shard count is the
    * parallelism knob that keeps per-shard sorts in memory at any corpus
    * size. Emits (id, shard, pos) with pos 1-based within shard. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = md5(concat(lit(seed), lit("#"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 15), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** DISTRIBUTION DRIFT between two corpus snapshots — the monitoring pass
    * a training pipeline runs on every ingest (has this week's value/
    * length/score distribution moved against the reference corpus?).
    * Equal-width histogram over [lo, hi) with `buckets` bins (out-of-range
    * values clamp into the edge bins, so nothing silently drops); emits
    * the DENSE grid — one row per bin, zero-filled — with both sides'
    * counts, totals, and the cross-multiplied absolute deviation
    * `dev_x = |n_a * tot_b - n_b * tot_a|`, an exact BIGINT (total
    * variation distance = sum(dev_x) / (2 * tot_a * tot_b), computed by
    * the caller, so the released frame itself carries no
    * engine-dependent float math beyond the shared bucket floor).
    * Integer cross-multiplication instead of PSI because PSI's ln() is
    * not bit-reproducible across engines; TV distance ranks drift the
    * same way for alerting. Plan: two map-side-combined aggregates over
    * scans, one generated grid, one broadcast one-row total — no
    * corpus-sized shuffle at any scale. */
  /** The exact cross-multiplied deviation |n_a*tot_b - n_b*tot_a| shared by
    * every drift monitor ([[distributionDrift]], [[categoricalDrift]],
    * [[graft.streaming.StreamOps.windowedMixDrift]]). Products run in
    * DECIMAL(38,0): two BIGINT counts multiply past 2^63 once both
    * snapshot totals exceed ~3e9 rows, and a silently wrapped dev_x would
    * rank drift essentially at random. The released column stays BIGINT;
    * a deviation that genuinely exceeds the BIGINT range fails loud
    * (pre-bucket or sample the snapshots) instead of wrapping. */
  private[graft] def crossDeviation(
      nA: Column, totB: Column, nB: Column, totA: Column): Column = {
    def d38(c: Column) = c.cast("decimal(20,0)")
    val dev = abs(d38(nA) * d38(totB) - d38(nB) * d38(totA))
    when(dev > lit(Long.MaxValue).cast("decimal(38,0)"),
      raise_error(lit("drift deviation exceeds BIGINT — snapshots this " +
        "large need pre-bucketed or sampled counts")).cast("long"))
      .otherwise(dev.cast("long"))
  }

  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / buckets
    def bucketed(df: DataFrame, n: String) = df
      // fail loud on NULL/NaN: greatest/least skip nulls and order NaN
      // largest, so either would silently masquerade as edge-bin mass —
      // the monitor would report "low-edge drift" for what is actually
      // an upstream extraction regression (and engines disagree on the
      // coercion, breaking the exact-replay contract)
      .select(when(col(valueCol).isNull || isnan(col(valueCol).cast("double")),
          raise_error(lit(s"distributionDrift: NULL/NaN in $valueCol — " +
            "a missing value is an upstream bug, not lo-edge mass; " +
            "filter or impute first")).cast("long"))
        .otherwise(least(lit(buckets - 1L), greatest(lit(0L),
          floor((col(valueCol) - lo) / width)))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(n))
    val grid = a.sparkSession.range(buckets).select(col("id").as("bucket"))
    val joined = grid
      .join(bucketed(a, "n_a"), Seq("bucket"), "left")
      .join(bucketed(b, "n_b"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      // `buckets` rows, consumed twice (totals + output): pin it, or the
      // totals branch re-runs both corpus scans (plan-audit finding)
      .localCheckpoint(false)
    val totals = joined.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"), col("tot_a"), col("tot_b"),
        crossDeviation(col("n_a"), col("tot_b"), col("n_b"), col("tot_a"))
          .as("dev_x"))
  }

  /** CATEGORICAL drift — [[distributionDrift]] keyed by a discrete column
    * (language mix, source mix, label mix: the canonical corpus alerts).
    * The key grid is the UNION of categories observed on either side
    * (full-outer join of the two count aggregates), so a category that
    * appears or vanishes between snapshots — the loudest drift signal —
    * surfaces as a row with one zero side rather than silently dropping.
    * NULL keys fold to the sentinel category `"__null"` BEFORE the join —
    * a genuine category literally named `__null` merges with NULL keys
    * (accepted trade-off for a plain string join key).
    * Same exact BIGINT cross deviation; same no-corpus-shuffle plan (two
    * map-side-combined aggregates, one category-cardinality join). */
  def categoricalDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    // NULL keys fold to a sentinel category BEFORE the join: a full_outer
    // join never matches NULL = NULL, so a null-keyed category present in
    // both snapshots would emit TWO rows (one side zeroed each) and read
    // as simultaneously vanished AND appeared instead of one compared row.
    def counted(df: DataFrame, n: String) = df
      .select(coalesce(col(keyCol).cast("string"), lit("__null")).as("category"))
      .groupBy("category").agg(count(lit(1)).as(n))
    val joined = counted(a, "n_a")
      .join(counted(b, "n_b"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      // category-cardinality rows, consumed twice (totals + output): pin
      // it, or the totals branch re-runs both corpus scans
      .localCheckpoint(false)
    val totals = joined.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    joined.crossJoin(broadcast(totals))
      .select(col("category"), col("n_a"), col("n_b"), col("tot_a"), col("tot_b"),
        crossDeviation(col("n_a"), col("tot_b"), col("n_b"), col("tot_a"))
          .as("dev_x"))
  }

  /** LEAKAGE-SAFE train/val/test split: a random per-document split leaks
    * near-duplicates across the train/test boundary (the classic eval
    * contamination bug — test docs whose near-copies were trained on), so
    * the unit of assignment here is the NEAR-DUP CLUSTER: connected
    * components over `pairs` (any (id_a, id_b) frame — minhash, simhash,
    * embedding LSH), singleton docs as their own cluster, and the whole
    * cluster routed by the salted portable hash of its representative
    * (min id) on the ppm grid — the [[applyMixture]] convention, so the
    * split is deterministic, engine-reproducible, and stable under corpus
    * growth (adding docs never moves an existing cluster). `splits` are
    * (name, ppm) in threshold order and must total 1e6.
    * Returns (id, cluster_rep, split). Expected split sizes are
    * ppm-proportional in CLUSTERS, not docs — a giant dup cluster lands
    * whole, which is exactly the point. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Long)], salt: String = "#split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000000L,
      s"split ppm must total 1e6, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0), "every split needs positive ppm")
    val comps = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    val withRep = df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster_rep"))
    val bucket = pmod(
      conv(substring(md5(concat(col("cluster_rep").cast("string"), lit(salt))),
        1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val arms = splits.map(_._1).zip(splits.scanLeft(0L)(_ + _._2).tail)
    val splitExpr = arms.init
      .foldLeft(Option.empty[Column]) { case (acc, (name, hi)) =>
        Some(acc.fold(when(bucket < hi, name))(_.when(bucket < hi, name)))
      }
      .fold(lit(arms.last._1))(_.otherwise(arms.last._1))
    withRep.select(col("id"), col("cluster_rep"), splitExpr.as("split"))
  }
}
