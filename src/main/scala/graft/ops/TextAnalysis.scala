package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, fingerprinting.
  *
  * Everything is composed from native Catalyst expressions (regexp, arrays,
  * higher-order functions) — whole-stage codegen applies, no UDFs, so the
  * operators scale linearly over a 100 TB corpus with zero shuffles (all are
  * per-row projections).
  */
object TextAnalysis {

  /** Word tokens: maximal runs of letters/digits (BPE-ish boundary regex). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Whitespace token count (the cheap variant). */
  def whitespaceTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

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

  /** 64-bit document fingerprint: hash of the bottom-k sketch of rolling
    * 5-gram hashes (winnowing-style). Two documents collide iff their k
    * smallest shingle hashes coincide — robust to token order, sensitive to
    * content. Pure expressions. */
  def fingerprint(text: Column, gram: Int = 5, k: Int = 16): Column =
    xxhash64(concat_ws(",", bottomKSketch(text, k, gram)))

  /** Rolling-hash shingle sketch: the k smallest 5-gram hashes (a bottom-k
    * sketch usable for containment estimation). */
  def bottomKSketch(text: Column, k: Int = 16, gram: Int = 5): Column =
    slice(array_sort(transform(
      transform(sequence(lit(1), greatest(length(text) - (gram - 1), lit(1))),
        i => substring(text, i, lit(gram))),
      g => xxhash64(g))), 1, k)

  /** [[fingerprint]] with PORTABLE hashing: gram hashes are the leading 15
    * hex digits of md5 (60-bit values reproducible in any engine) and the
    * final fingerprint is md5 of the comma-joined sorted sketch — so the
    * whole construction is verifiable against an independent SQL oracle.
    * The production variant keeps xxhash64 (native, codegen'd). */
  def fingerprintPortable(text: Column, gram: Int = 5, k: Int = 16): Column =
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
