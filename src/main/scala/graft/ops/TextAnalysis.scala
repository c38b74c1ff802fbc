package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, fingerprinting.
  *
  * Everything is a per-row projection — zero shuffles, linear over a 100 TB
  * corpus. Cheap features are native Catalyst expressions (regexp, arrays);
  * the per-position hot loops (fingerprints, chunking) are primitive-loop
  * UDFs per ARCHITECTURE.md's measured ladder, each bit-identical to an
  * expression formulation kept for the parity specs.
  */

/** One overlapping token-window chunk of a document — top-level so the UDF
  * result encoder stays codegen-compiled. */
final case class DocChunk(chunk_idx: Long, first_token: Long,
    n_tokens: Long, chunk_text: String)

/** One content-defined chunk — top-level for the codegen-compiled encoder. */
final case class CdcChunk(chunk_idx: Long, start: Long, length: Long,
    is_last: Boolean, chunk_md5: String, chunk_text: String)

object TextAnalysis {

  /** Word tokens: maximal runs of letters/digits (BPE-ish boundary regex). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** The same token regex compiled for UDF-side loops (identical engine:
    * java.util.regex either way, so tokenizations cannot diverge). */
  private[ops] val tokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Elements whose CONTENT is boilerplate — dropped wholesale before tag
    * stripping. One alternation-free pattern per element because RE2 (the
    * oracle's engine) has no backreferences; `(?is)` so blocks span lines
    * and match real-world uppercase/mixed-case tags.
    * Patterns restricted to Java∩RE2 syntax+semantics, the same
    * portability convention as [[CorpusOps.piiPatterns]]. */
  val htmlDropBlocks: Seq[String] =
    Seq("script", "style", "nav", "footer").map(t => s"(?is)<$t[^>]*>.*?</$t>")

  /** The standard named/numeric entities, decoded AFTER tag stripping;
    * `&amp;` must come last or it would manufacture new entities. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&")

  /** HTML -> clean text (the boilerplate-removal pass of a web-corpus
    * pipeline): drop script/style/nav/footer elements with their content,
    * strip remaining tags, decode standard entities, collapse whitespace.
    * Map-only native regexes end-to-end. */
  def htmlStrip(html: Column): Column = {
    val noBlocks = htmlDropBlocks.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** First <title> content (raw — entities/whitespace as-is). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Whitespace token count (the cheap variant). */
  def whitespaceTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** GPT-2-style pre-tokenizer boundary pattern: apostrophe contractions,
    * optional-space letter runs, optional-space digit runs, optional-space
    * symbol runs. Deliberately restricted to syntax AND semantics shared by
    * java.util.regex (Spark) and RE2 (DuckDB/the oracle): the upstream
    * pattern's `\s+(?!\S)` lookahead branch is dropped (only changes how
    * TRAILING whitespace tokenizes), and whitespace is the EXPLICIT class
    * `[ \t\n\f\r]` rather than `\s` — Java's `\s` includes vertical tab
    * (\x0B) while RE2's does not, so `\s` would diverge on it. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+"

  /** BPE-ish token count: the number of pre-tokenizer segments, the standard
    * proxy for "how many tokens will the tokenizer emit" when sizing corpora
    * and packing sequences without shipping a vocab file. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Per-document token-budget stats: BPE-ish token count, UTF-8 byte
    * length, and bytes/token (the compression-rate signal used to spot
    * pathological documents — binary junk tokenizes near 1 byte/token,
    * natural language near 4). */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    df.withColumn("n_bpe_tokens", bpeTokenCount(col(textCol)).cast("long"))
      .withColumn("n_bytes", octet_length(col(textCol)).cast("long"))
      .withColumn("bytes_per_token",
        ratio(col("n_bytes"), col("n_bpe_tokens")))
  }

  /** URLs in a document: maximal non-whitespace runs after http(s)://.
    * RE2-compatible (no lookarounds, explicit whitespace class — Java's
    * `\s` includes \x0B, RE2's does not) so oracles replicate it verbatim. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^ \\t\\n\\f\\r]+"), lit(0))

  /** Per-domain URL statistics over a corpus: one row per registrable host
    * with its URL count and distinct-document count — the "which domains
    * dominate my crawl" rollup that gates domain-level filtering. Explodes
    * ids+urls only (no full-text shuffle); the aggregate is a plain
    * hash-partitioned groupBy with map-side partial counts. */
  def urlDomainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), explode(extractUrls(col(textCol))).as("url"))
      .withColumn("domain",
        regexp_extract(col("url"), "https?://([^/ \\t\\n\\f\\r]+)", 1))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("__id")).as("n_docs"))

  /** URL canonicalization — the dedup key for URL-LEVEL corpus dedup (the
    * crawl-dedup stage that runs before any content hashing: the same page
    * fetched as `HTTP://WWW.Site.com:80/x/?utm_source=feed#top` and
    * `http://site.com/x` must collapse). Steps, each deterministic string
    * algebra in java∩RE2 regex so an independent SQL engine replays the
    * chain byte-for-byte:
    *
    *  1. strip the fragment (`#...` — never sent to the server);
    *  2. lowercase scheme and host[:port] ONLY (paths are case-sensitive);
    *  3. drop a leading `www.` and the scheme's default port
    *     (`:80` http / `:443` https);
    *  4. strip userinfo (`user:pw@host` — never part of the resource
    *     identity, and a phishing-style obfuscation in crawl data);
    *  5. drop tracking query params (`utm_*`, `gclid`, `fbclid`) — the
    *     `&`-sentinel trick handles first-position params without
    *     reordering the survivors;
    *  6. drop one trailing slash from the path (`/x/` == `/x`, `/` == ``);
    *  7. normalize percent-encoding: uppercase the two hex digits of every
    *     escape (`%2f` == `%2F`, RFC 3986 §6.2.2.1) and decode escapes of
    *     the UNRESERVED punctuation (`%7E` == `~`, `%2D` `-`, `%2E` `.`,
    *     `%5F` `_`, §6.2.2.2) — reserved escapes (`%2F` etc.) stay
    *     encoded, they are NOT the same resource as their literal.
    *
    * Documented out of scope (kept java∩RE2/oracle-replayable): IDN/
    * punycode host equivalence, decoding alphanumeric escapes (`%41`=='A'
    * — rare in real crawls, and the replace chain stays bounded), and
    * path-segment `..` resolution. Inputs without a `scheme://` prefix
    * pass through trimmed (no right canonical form to guess). Pure
    * `Column` expression — whole-stage codegen'd, usable on a raw crawl
    * frame of any size. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(
      noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // greedy ^.*@ strips through the LAST @ — RFC 3986 delimits the host
    // at the final @ of the authority (hostPort cannot contain '/')
    val noUser = regexp_replace(hostPort, "^.*@", "")
    val noWww = regexp_replace(noUser, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(regexp_extract(
      noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/$", "")
    val q = regexp_replace(
      regexp_replace(concat(lit("&"), regexp_extract(noFrag, "\\?([^#]*)", 1)),
        "&(?:utm_[A-Za-z0-9_]*|gclid|fbclid)(=[^&]*)?", ""),
      "^&", "")
    when(scheme === "", trim(url)).otherwise(
      normalizePercentEncoding(concat(scheme, lit("://"), host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q)))))
  }

  /** The unreserved-punctuation decode table of [[canonicalizeUrl]] step 7
    * — shared with the SQL-oracle generator so the two cannot drift. */
  private[graft] val unreservedPunct: Seq[(String, String)] =
    Seq("2D" -> "-", "2E" -> ".", "5F" -> "_", "7E" -> "~")

  /** Percent-encoding normalization (canonicalizeUrl step 7): a bounded
    * regexp_replace chain, no case-converting captures (regex replacement
    * cannot change case in any engine). First-digit pass: `%<letter>` is
    * uppercased only when ANOTHER hex char follows, so raw text like
    * `%ax` — not parseable as an escape — passes through untouched. A
    * raw `%` that does precede two hex chars (`...50%fall...`) is
    * grammatically indistinguishable from an escape and normalizes as
    * one: RFC 3986 requires a literal percent to be sent as `%25`, and
    * browser URL normalizers make the same call on malformed input.
    * Second-digit pass keys on the now-normalized (uppercase-or-digit)
    * first digit via one capture. Then the four unreserved punctuation
    * escapes decode to their literals. */
  private def normalizePercentEncoding(c: Column): Column = {
    val letters = "abcdef"
    val firstUp = letters.foldLeft(c)((x, l) =>
      regexp_replace(x, s"%$l([0-9A-Fa-f])", s"%${l.toUpper}" + "$1"))
    val bothUp = letters.foldLeft(firstUp)((x, l) =>
      regexp_replace(x, s"%([0-9A-F])$l", "%$1" + l.toUpper))
    unreservedPunct.foldLeft(bothUp) { case (x, (hex, ch)) =>
      regexp_replace(x, s"%$hex", ch)
    }
  }

  /** URL-level dedup rollup over [[canonicalizeUrl]]: one row per canonical
    * URL with its raw-variant count, distinct-document count and first
    * (min-id) document — the keep decision a crawl dedup materializes.
    * Map-side-combined hash aggregate; nothing but (id, url) shuffles. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(urlCol).as("__u"))
      .withColumn("canonical", canonicalizeUrl(col("__u")))
      .groupBy("canonical")
      .agg(countDistinct(col("__u")).as("n_raw_variants"),
        countDistinct(col("__id")).as("n_docs"),
        min(col("__id")).as("first_doc"))

  private def charCount(text: Column, charClassRegex: String): Column =
    length(text) - length(regexp_replace(text, charClassRegex, ""))

  /** Adds per-document quality-signal columns (length, punctuation/digit/
    * upper ratios, mean token length, stopword ratio) — the standard
    * text-quality features for corpus filtering. Ratios are exact
    * integer/integer divisions (oracle-reproducible). */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val feats = Seq(
      "n_chars" -> length(col(textCol)).cast("long"),
      "n_tokens" -> tokenCount(col(textCol)).cast("long"),
      "digit_ratio" -> ratio(charCount(col(textCol), "[0-9]"), length(col(textCol))),
      "upper_ratio" -> ratio(charCount(col(textCol), "[A-Z]"), length(col(textCol))),
      "punct_ratio" -> ratio(charCount(col(textCol), """[!-/:-@\[-`{-~]"""), length(col(textCol))),
      "mean_token_len" -> ratio(
        aggregate(tokens(col(textCol)), lit(0L), (acc, t) => acc + length(t)),
        tokenCount(col(textCol))),
      "stopword_ratio" -> ratio(
        size(array_intersect(tokens(col(textCol)), typedLit(Stopwords.en))),
        tokenCount(col(textCol)))
    )
    feats.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  /** Language identification by stopword-profile scoring + CJK detection.
    * Deterministic, pure-expression: per language, score = number of distinct
    * profile words present; CJK-dominant text short-circuits to 'zh'.
    *
    * NOTE: prefer [[langIdFromTokens]] with a pre-bound token column — this
    * overload inlines the tokenizer regex into every per-language
    * `array_intersect`, so Catalyst's interpreter re-tokenizes the document
    * once per profile. */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** [[langId]] scoring a pre-bound token array column (tokenize once, score
    * N profiles against the bound attribute). */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    val cjk = charCount(text, "[\\x{4e00}-\\x{9fff}]")
    val scores = Stopwords.profiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, typedLit(words)))
    }
    // argmax over profile scores; ties resolve in profile order (en first)
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(cjk * 2 > length(text), lit("zh")).otherwise(best._1)
  }

  /** Canonical text normalization for corpus prep: Unicode NFC, lowercase,
    * whitespace runs collapsed to single spaces, trimmed. The NFC pass is a
    * UDF (java.text.Normalizer) applied ONLY to rows that contain
    * non-ASCII — the ASCII fast path (the overwhelming majority of most
    * corpora) stays entirely inside whole-stage codegen. Emits `norm_text`
    * and a `changed` flag for normalization-rate monitoring. */
  def normalizeText(df: DataFrame, textCol: String): DataFrame = {
    val nfc = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    // explicit class, NOT \s: Java's \s includes vertical tab \x0B while
    // RE2/DuckDB's does not (the extractUrls/bpePattern portability rule) —
    // an unshared \s would silently diverge norm_text, and with it every
    // downstream md5 dedup key, on the first \x0B in a corpus
    val collapsed = lower(trim(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", " ")))
    df.withColumn("norm_text",
        when(col(textCol).rlike("[^\\x00-\\x7f]"), nfc(collapsed))
          .otherwise(collapsed))
      .withColumn("changed", col("norm_text") =!= col(textCol))
  }

  /** Split each document into overlapping token-window chunks (the
    * RAG/embedding prep step): windows of `window` tokens starting every
    * `stride` tokens, last window clipped, zero chunks for an empty token
    * stream. One primitive pass per row; output explodes to one row per
    * chunk with (chunk_idx, first_token, n_tokens, chunk_text). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val f = udf((toks: Array[String]) => {
      val n = if (toks == null) 0 else toks.length
      if (n == 0) Array.empty[DocChunk]
      else {
        // starts are 0, stride, 2*stride ... : enough to reach the end
        // (ceil((n-window)/stride) extra starts), but never a start >= n —
        // with stride > window (spaced sampling) the first bound alone
        // would emit a phantom chunk past the array
        val nChunks = math.min(
          1 + math.max(n - window + stride - 1, 0) / stride,
          1 + (n - 1) / stride)
        val out = new Array[DocChunk](nChunks)
        var c = 0
        while (c < nChunks) {
          val start = c * stride
          val end = math.min(start + window, n)
          val sb = new java.lang.StringBuilder
          var i = start
          while (i < end) {
            if (i > start) sb.append(' ')
            sb.append(toks(i))
            i += 1
          }
          out(c) = DocChunk(c.toLong, start.toLong, (end - start).toLong, sb.toString)
          c += 1
        }
        out
      }
    })
    df.withColumn("__chunk", explode(f(tokens(col(textCol)))))
      .select(col(idCol), col("__chunk.chunk_idx").as("chunk_idx"),
        col("__chunk.first_token").as("first_token"),
        col("__chunk.n_tokens").as("n_tokens"),
        col("__chunk.chunk_text").as("chunk_text"))
  }

  /** Content-defined chunking (Gear rolling hash, the FastCDC family:
    * Muthitacharoen et al. LBFS SOSP'01; Xia et al. FastCDC ATC'16): cut
    * where the rolling hash's low log2(avgSize) bits are zero, subject to
    * [minSize, maxSize] (cut forced at maxSize; a boundary is only
    * CONSIDERED once minSize chars accumulated, so only a document's last
    * chunk can run short). Boundaries depend on LOCAL content only — an
    * edit resynchronizes within ~avgSize chars, so exact dedup over the
    * chunk hashes dedups SHIFTED copies that fixed windows cannot (the
    * storage-dedup primitive; fixed-window chunking misaligns after one
    * inserted character). The 256-entry gear table derives from the
    * engine-wide portable md5 convention (gear[b] = leading 60 bits of
    * md5 of the byte's decimal string), so any engine reproduces
    * identical boundaries.
    *
    * Output: one row per chunk — (id, chunk_idx, start, length, is_last,
    * chunk_md5, chunk_text). Map-only, one primitive pass per document;
    * chunks partition the text exactly (spec + gate verify reassembly). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      minSize: Int = 64, avgSize: Int = 256, maxSize: Int = 1024): DataFrame = {
    require(minSize > 0 && minSize <= avgSize && avgSize <= maxSize,
      s"need 0 < minSize <= avgSize <= maxSize, got $minSize/$avgSize/$maxSize")
    require((avgSize & (avgSize - 1)) == 0, s"avgSize must be a power of 2, got $avgSize")
    val gear: Array[Long] = Array.tabulate(256) { b =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L; var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v >>> 4
    }
    val mask = (avgSize - 1).toLong
    val f = udf((t: String) => {
      if (t == null || t.isEmpty) Array.empty[CdcChunk]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val out = scala.collection.mutable.ArrayBuffer.empty[CdcChunk]
        val n = t.length
        var start = 0; var i = 0; var h = 0L; var idx = 0L
        while (i < n) {
          h = (h << 1) + gear(t.charAt(i) & 0xFF)
          i += 1
          val len = i - start
          if ((len >= minSize && (h & mask) == 0L) || len >= maxSize || i == n) {
            val chunk = t.substring(start, i)
            md.reset()
            val dig = md.digest(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val hex = {
              val sb = new java.lang.StringBuilder(32)
              var j = 0
              while (j < 16) { sb.append(f"${dig(j)}%02x"); j += 1 }
              sb.toString
            }
            out += CdcChunk(idx, start.toLong, len.toLong, i == n, hex, chunk)
            idx += 1; start = i; h = 0L
          }
        }
        out.toArray
      }
    })
    df.select(col(idCol), explode(f(col(textCol))).as("c"))
      .select(col(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.start").as("start"), col("c.length").as("length"),
        col("c.is_last").as("is_last"), col("c.chunk_md5").as("chunk_md5"),
        col("c.chunk_text").as("chunk_text"))
  }

  /** Top-k TF-IDF keywords per document, with a QUANTIZED IDF: idf_q =
    * floor(log2(N / df)) computed in PURE INTEGER arithmetic
    * (`length(bin(N div df)) - 1`, the high-bit position of the integer
    * quotient). A float `ln` here would hinge the ranking on last-ulp libm
    * behavior and break cross-engine verification; the log2-floor keeps the
    * classic rare-term weighting (documented coarsening) and is exact in
    * any engine. Plan shape: one map-side-combined (doc, term) count, a
    * BROADCAST join against the document-frequency table (the vocabulary is
    * bounded — prune by min-df / top-V at extreme scale), and a per-doc
    * window whose parallelism is the number of documents. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = df.count()
    val tf = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .withColumn("score",
        col("tf") * (length(bin(expr(s"$n div dfreq"))) - 1).cast("long"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("id"), col("term"), col("tf"), col("dfreq"),
        col("score"), col("rk"))
  }

  /** PMI collocation mining: the corpus's top-k adjacent-token bigrams by
    * pointwise mutual information — the classic phrase-mining /
    * tokenizer-vocabulary signal (reference analog: none — the reference
    * has no text tier; the measure is Church & Hanks 1990, the counting
    * convention NLTK's `BigramAssocMeasures.pmi`):
    * `pmi(x,y) = log(p(x,y) / (p(x) p(y))) = log(N·c_xy / (c_x·c_y))`
    * with `c_x`/`c_y` corpus token counts, `c_xy` adjacent-bigram counts
    * and `N` the corpus token total. `log` is monotone, so the RANKING
    * needs no transcendental: `score = floor(scale·N·c_xy / (c_x·c_y))`
    * computed in DECIMAL(38,0) (BIGINT products wrap once `scale·N·c_xy`
    * passes ~9e18 — i.e. at millions of tokens already; DECIMAL holds to
    * ~1e37, beyond a 100 TB corpus at the default scale). Cross-engine
    * exact: integer division on exact integers, ties broken by
    * `(w1, w2)` ascending.
    *
    * `minCount` floors `c_xy` BEFORE ranking — raw PMI famously explodes
    * on hapax pairs (a once-seen typo pair scores above every real
    * collocation), so a floor is part of the operator, not a knob bolted
    * on. Docs with < 2 tokens contribute unigrams (they shape `p(x)`)
    * but no bigrams.
    *
    * Returns `(w1, w2, c_xy, c_x, c_y, score, rk)`, `rk <= k`.
    *
    * Scale shape: one tokenize pass shared by the unigram and bigram
    * counting aggregations (localCheckpoint, the [[LmScore]] pattern —
    * `materializeTokens=false` trades storage for a second scan); both
    * counts are map-side-combined; `N` rides a one-row broadcast cross
    * join (no driver collect); the unigram table joins in twice BY
    * BROADCAST (vocabulary-bounded, the tfIdfTopTerms dfreq argument);
    * the global top-k is orderBy+limit = TakeOrderedAndProject (bounded
    * per-task heaps, never a full sort) and the rank window touches only
    * those k rows. */
  def collocations(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 2, scale: Long = 1000000L,
      materializeTokens: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(scale > 0 && scale <= 1000000000L,
      s"scale must be in [1, 1e9], got $scale")
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val tokenized = df.select(tokens(col(textCol)).as("__toks"))
      .filter(col("__toks").isNotNull)
    val toks = if (materializeTokens) tokenized.localCheckpoint(false)
      else tokenized
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // total-token count + two scoring joins
    val tot = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n_tokens"))
    val bigrams = toks
      .filter(size(col("__toks")) >= 2)
      .select(expr(
        "inline(transform(sequence(0, size(__toks) - 2), " +
          "i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2)))"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val u1 = uni.select(col("w").as("w1"), col("c").as("c_x"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c_y"))
    val scored = bigrams
      .join(broadcast(u1), "w1")
      .join(broadcast(u2), "w2")
      .crossJoin(broadcast(tot)) // always one row
      .withColumn("score", expr(
        s"CAST((CAST($scale AS DECIMAL(38,0)) * n_tokens * c_xy)" +
          " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"))
    val top = scored
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("w1").asc, col("w2").asc))
        .cast("long"))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "score", "rk")
  }

  /** Windowed co-occurrence counts — the GloVe `X_ij` builder (Pennington
    * et al. EMNLP'14) and the word2vec context-pair statistic: every
    * unordered token pair within `window` positions of each other, with
    * the classic 1/distance weighting integerized as `floor(scale / d)`
    * (exact in any engine; distances are 1..window, so per-pair weight
    * sums are exact BIGINTs). Pairs are canonicalized `(least, greatest)`
    * by binary string order — tokens are `[a-z0-9]+`, so Spark's UTF8
    * comparison and any SQL engine's binary collation agree.
    *
    * Returns the global top-k by `(wsum desc, w1 asc, w2 asc)`:
    * `(w1, w2, n_pairs, wsum, rk)`. `minCount` floors raw pair counts.
    *
    * Scale shape: one tokenize pass; the pair generator is a single
    * `inline(flatten(transform(...)))` — each position emits at most
    * `window` pairs, so the exploded volume is `window * tokens`, linear;
    * one map-side-combined (w1, w2) aggregation; global top-k via
    * orderBy+limit = TakeOrderedAndProject; rank window over k rows (the
    * [[collocations]] tail). `sequence` bounds are guarded: the inner
    * `sequence(1, least(window, n-1-i))` never sees an empty range
    * (Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty). */
  def cooccurrence(df: DataFrame, textCol: String, window: Int, k: Int,
      minCount: Long = 2, scale: Long = 1000000L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(scale > 0 && scale <= 1000000000L,
      s"scale must be in [1, 1e9], got $scale")
    val pairs = df.select(tokens(col(textCol)).as("__toks"))
      .filter(col("__toks").isNotNull && size(col("__toks")) >= 2)
      .select(expr(
        s"""inline(flatten(transform(sequence(0, size(__toks) - 2), i ->
           |  transform(sequence(1, least($window, size(__toks) - 1 - i)), d ->
           |    struct(least(__toks[i], __toks[i + d]) AS w1,
           |           greatest(__toks[i], __toks[i + d]) AS w2,
           |           CAST($scale AS BIGINT) div d AS w)))))""".stripMargin))
    val agg = pairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("wsum"))
      .filter(col("n_pairs") >= minCount)
    val top = agg
      .orderBy(col("wsum").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("wsum").desc, col("w1").asc, col("w2").asc))
        .cast("long"))
      .select("w1", "w2", "n_pairs", "wsum", "rk")
  }

  /** 64-bit document fingerprint: hash of the bottom-k sketch of rolling
    * 5-gram hashes (winnowing-style). Two documents collide iff their k
    * smallest shingle hashes coincide — robust to token order, sensitive to
    * content.
    *
    * Fused into ONE primitive UDF pass; bit-identical to the expression
    * form ([[fingerprintExpr]], kept for the parity spec) for NON-NULL
    * text — null text yields null here, where the expression form's
    * concat_ws would silently skip the null array and hash "" (a
    * deliberate deviation: a constant fingerprint for null docs would
    * collide them all into one dedup group). Grams are
    * code-point substrings exactly like Spark's `substring`, gram hashes
    * reuse Spark's own XXH64 with the `xxhash64` seed, the sketch is the
    * ascending signed sort's first k values (duplicates kept, like
    * `array_sort` + `slice`), and the final hash covers the same
    * comma-joined decimal rendering `concat_ws` produced. The interpreted
    * per-position transform/sort chain this replaces cost ~2 s at sf0.1. */
  def fingerprint(text: Column, gram: Int = 5, k: Int = 16): Column = {
    val f = udf((s: String) => {
      if (s == null) null.asInstanceOf[java.lang.Long]
      else {
        val hs = gramHashesRange(s, gram,
          (b, off, len) => org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(b,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
              len, 42L))
        java.util.Arrays.sort(hs)
        val sb = new java.lang.StringBuilder
        var i = 0
        val kk = math.min(k, hs.length)
        while (i < kk) {
          if (i > 0) sb.append(',')
          sb.append(hs(i))
          i += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L))
      }
    })
    f(text)
  }

  /** The original pure-expression [[fingerprint]] — retained as the
    * independent formulation the parity spec checks the UDF against. */
  private[graft] def fingerprintExpr(text: Column, gram: Int = 5, k: Int = 16): Column =
    xxhash64(concat_ws(",", bottomKSketch(text, k, gram)))

  /** Rolling-hash shingle sketch: the k smallest 5-gram hashes (a bottom-k
    * sketch usable for containment estimation). */
  def bottomKSketch(text: Column, k: Int = 16, gram: Int = 5): Column =
    slice(array_sort(transform(
      transform(sequence(lit(1), greatest(length(text) - (gram - 1), lit(1))),
        i => substring(text, i, lit(gram))),
      g => xxhash64(g))), 1, k)

  /** Code-point-exact rolling gram hashes: one hash per position
    * 1..max(cp - gram + 1, 1), each over the UTF-8 bytes of the gram —
    * the same gram boundaries Spark's `substring(text, i, gram)` yields
    * (code points, not UTF-16 units; trailing short gram only when the
    * whole text is shorter than one gram). */
  private[ops] def gramHashes(s: String, gram: Int, h: Array[Byte] => Long): Array[Long] =
    gramHashesRange(s, gram, (b, off, len) => h(java.util.Arrays.copyOfRange(b, off, off + len)))

  /** [[gramHashes]] with a RANGE callback (r19 optimization): the string
    * encodes to UTF-8 ONCE and each window hashes a (bytes, off, len)
    * slice of that one buffer — the per-position substring + re-encode of
    * the old shape allocated two objects per character of every document,
    * the dominant cost of the character-granular dedup family. The hashed
    * byte sequences are identical, so every fingerprint (and the oracle
    * replay) is unchanged. */
  private[ops] def gramHashesRange(s: String, gram: Int,
      h: (Array[Byte], Int, Int) => Long): Array[Long] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val nChars = s.length
    // code-point start BYTE offsets (ascii fast path: identity)
    var cp = 0
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var bo = 0
    while (i < nChars) {
      offs(cp) = bo
      val code = s.codePointAt(i)
      i += Character.charCount(code)
      bo += utf8Len(code)
      cp += 1
    }
    offs(cp) = bytes.length
    val total = math.max(cp - (gram - 1), 1)
    val out = new Array[Long](total)
    var p = 0
    while (p < total) {
      val end = offs(math.min(p + gram, cp))
      out(p) = h(bytes, offs(p), end - offs(p))
      p += 1
    }
    out
  }

  /** UTF-8 encoded length of one code point (the offsets walk above). An
    * UNPAIRED surrogate (codePointAt returns the bare unit) encodes as the
    * one-byte replacement '?' under String.getBytes — the offsets must
    * match that, or malformed input silently shifts every window. */
  @inline private def utf8Len(code: Int): Int =
    if (code < 0x80) 1 else if (code < 0x800) 2
    else if (code >= 0xD800 && code <= 0xDFFF) 1 // unpaired surrogate -> '?'
    else if (code < 0x10000) 3 else 4

  /** [[fingerprint]] with PORTABLE hashing: gram hashes are the leading 15
    * hex digits of md5 (60-bit values reproducible in any engine) and the
    * final fingerprint is md5 of the comma-joined sorted sketch — so the
    * whole construction is verifiable against an independent SQL oracle.
    * Same one-pass UDF fusion as [[fingerprint]]; the md5 values are
    * computed by MessageDigest and rendered exactly like `md5()` /
    * `conv(..., 16, 10)` did, so the DuckDB oracle reproduces the output
    * unchanged. */
  def fingerprintPortable(text: Column, gram: Int = 5, k: Int = 16): Column = {
    val f = udf((s: String) => {
      if (s == null) null.asInstanceOf[String]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = gramHashesRange(s, gram, { (b, off, len) =>
          md.reset()
          md.update(b, off, len)
          val d = md.digest()
          // leading 15 hex digits = high 60 bits: 7.5 bytes
          var v = 0L
          var j = 0
          while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          (v << 4) | ((d(7) & 0xf0L) >> 4)
        })
        java.util.Arrays.sort(hs)
        val sb = new java.lang.StringBuilder
        var i = 0
        val kk = math.min(k, hs.length)
        while (i < kk) {
          if (i > 0) sb.append(',')
          sb.append(hs(i))
          i += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new java.lang.StringBuilder(32)
        d.foreach(b => hex.append(f"${b & 0xff}%02x"))
        hex.toString
      }
    })
    f(text)
  }

  /** The original pure-expression [[fingerprintPortable]] — retained for
    * the parity spec. */
  private[graft] def fingerprintPortableExpr(text: Column, gram: Int = 5, k: Int = 16): Column =
    md5(concat_ws(",",
      slice(array_sort(transform(
        sequence(lit(1), greatest(length(text) - (gram - 1), lit(1))),
        i => conv(substring(md5(substring(text, i, lit(gram))), 1, 15), 16, 10)
          .cast("long"))), 1, k).cast("array<string>")))
}

/** Minimal stopword profiles for language ID (top function words; public
  * common knowledge, small on purpose — broadcast as literals). */
object Stopwords {
  val en: Seq[String] = Seq("the", "of", "and", "to", "in", "is", "that", "it",
    "for", "was", "on", "are", "as", "with", "his", "they", "at", "be", "this",
    "have", "from", "or", "had", "by", "not", "but", "what", "all", "were",
    "when", "we", "there", "can", "an", "your", "which", "their", "said", "if",
    "will", "way", "about", "many", "then", "them", "would", "like", "so",
    "these", "her", "him", "has", "more", "could", "did", "been", "who")
  val de: Seq[String] = Seq("der", "die", "und", "in", "den", "von", "zu",
    "das", "mit", "sich", "des", "auf", "für", "ist", "im", "dem", "nicht",
    "ein", "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
    "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind", "noch",
    "wie", "einem", "über", "einen", "so", "zum", "war", "haben", "nur", "oder",
    "aber", "vor", "zur", "bis", "mehr", "durch", "man", "sein", "wurde")
  val fr: Seq[String] = Seq("de", "la", "le", "et", "les", "des", "en", "un",
    "du", "une", "que", "est", "dans", "qui", "par", "pour", "sur", "au",
    "plus", "pas", "ce", "ne", "se", "son", "avec", "il", "sont", "ont", "mais",
    "comme", "ou", "si", "leur", "elle", "aux", "être", "cette", "tout", "nous",
    "sa", "ses", "fait", "été", "aussi", "bien", "où", "sans", "peut", "dont")
  val es: Seq[String] = Seq("de", "la", "que", "el", "en", "y", "a", "los",
    "del", "se", "las", "por", "un", "para", "con", "no", "una", "su", "al",
    "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    "esta", "entre", "cuando", "muy", "sin", "sobre", "también", "me", "hasta",
    "hay", "donde", "quien", "desde", "todo", "nos", "durante", "todos", "uno",
    "les", "ni", "contra", "otros", "ese", "eso", "ante", "ellos")
  /** Scored in this order; ties keep the earlier language. */
  val profiles: Seq[(String, Seq[String])] =
    Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es)
}

/** Hashed-n-gram linear text classifier — the fastText-shaped scoring
  * plumbing of a model-based quality filter (CCNet / Llama-style corpus
  * filtering runs exactly this: hash unigrams+bigrams into a bounded
  * feature space, average the bucket weights, threshold), with every stage
  * a NATIVE Column expression: tokenize -> hash (portable md5-prefix mod
  * dim, the engine-wide convention) -> weight lookup -> mean. Map-only,
  * zero shuffle, whole-stage codegen — the shape a real trained linear
  * model drops into by replacing [[LinearTextModel.weightMillis]] with a
  * broadcast weight array.
  *
  * Weights here are DETERMINISTIC pseudo-weights derived from the bucket
  * index by integer arithmetic (Knuth multiplicative constant mod a prime
  * window), in integer THOUSANDTHS: the score is an exact integer sum
  * divided once, so an independent engine reproduces every float bit —
  * the plumbing is oracle-verified even though the weights are synthetic.
  * To run a REAL model, replace the `sum += ...` weight derivation inside
  * [[score]]'s loop with a lookup into a broadcast Array[Float](dim) —
  * everything else (tokenize, hash, mean, threshold) is the production
  * shape already. */
object LinearTextModel {

  /** (n_features, score, keep): score = mean bucket weight over hashed
    * unigrams + bigrams, keep = score > 0. Empty/null text scores 0.0 and
    * drops.
    *
    * One primitive-loop UDF, NOT a native transform/aggregate chain: md5
    * inside a higher-order lambda evaluates INTERPRETED per element (the
    * ladder in ARCHITECTURE "hot-path expression engineering"), which
    * measured 22 s for this query at sf0.1 vs ~0.5 s for this loop — the
    * digest instance is reused across all features of a row, and the
    * 60-bit bucket replicates the conv(substr(md5,1,15),16,10) convention
    * bit-for-bit (leading 8 bytes >>> 4), so the oracle SQL in SparkEntry
    * states the same formula verbatim (the only other statement of it —
    * LinearTextModelSpec re-derives it independently as the test oracle). */
  def score(text: Column, dim: Int = 1024): Column = {
    val f = udf((t: String) => {
      if (t == null) LtmScore(0L, 0.0, keep = false)
      else {
        val m = TextAnalysis.tokenPattern.matcher(t.toLowerCase(java.util.Locale.ROOT))
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) toks += m.group()
        val md = java.security.MessageDigest.getInstance("MD5")
        var sum = 0L
        var n = 0L
        def add(feature: String): Unit = {
          val d = md.digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L; var k = 0
          while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
          sum += Math.floorMod((v >>> 4) % dim * 2654435761L, 2001L) - 1000L
          n += 1
        }
        var i = 0
        while (i < toks.length) { add(toks(i)); i += 1 }
        i = 0
        while (i < toks.length - 1) { add(toks(i) + " " + toks(i + 1)); i += 1 }
        val sc = if (n > 0) sum.toDouble / (n * 1000.0) else 0.0
        LtmScore(n, sc, sc > 0.0)
      }
    })
    f(text)
  }
}

/** top-level so the encoder stays codegen-compiled (Janino rule) */
final case class LtmScore(n_features: Long, score: Double, keep: Boolean)
