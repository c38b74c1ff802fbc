package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One applied-BPE row: the word and its merged subword tokens — top-level
  * so the UDF result encoder stays codegen-compiled. */
final case class BpeWord(word: String, tokens: Array[String])

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) with
  * the engine's bounded-driver-training layout (the IVF/PQ pattern):
  *
  *  - the WORD FREQUENCY table is computed distributed (one hash-aggregate
  *    over exploded tokens — map-side combined, linear in the corpus) and
  *    only the top `vocabCap` (word, count) rows are collected, so driver
  *    memory is bounded regardless of corpus size (merge quality needs only
  *    the frequent words — rare words contribute negligible pair mass);
  *  - the merge loop runs driver-side over that bounded table (nMerges
  *    passes over at most vocabCap words), exactly the reference
  *    algorithm: count adjacent symbol pairs weighted by word frequency,
  *    merge the most frequent pair (ties broken lexicographically so the
  *    result is deterministic), repeat;
  *  - applying the learned merges is a broadcast-closure UDF (merges ride
  *    as an indexed rank map), embarrassingly parallel over any corpus.
  *
  * The end-of-word marker `</w>` follows the original paper, so "low" the
  * word and "low" the prefix of "lower" learn distinct units. */
object Bpe {

  /** Learn `nMerges` merge rules from a (word -> count) table. Pure
    * function, deterministic: ties on pair frequency break on the
    * lexicographically smallest pair. */
  def trainFromCounts(
      wordCounts: Seq[(String, Long)], nMerges: Int
  ): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    // each word as its symbol sequence (chars + terminal </w>)
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Distributed word-frequency pass, bounded collect of the `vocabCap`
    * most frequent words (count desc, word asc — deterministic), driver
    * training. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      vocabCap: Int = 50000): Seq[(String, String)] = {
    require(vocabCap > 0, s"vocabCap must be positive, got $vocabCap")
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, nMerges)
  }

  /** Tokenize each word of `text` by the learned merges (standard greedy
    * apply: repeatedly merge the adjacent pair with the LOWEST merge rank
    * until none applies). Returns array<struct<word, tokens>> — one entry
    * per word occurrence, in order. */
  def applyMerges(text: Column, merges: Seq[(String, String)]): Column = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val f = udf((t: String) => {
      if (t == null) Array.empty[BpeWord]
      else {
        val m = TextAnalysis.tokenPattern.matcher(t.toLowerCase(java.util.Locale.ROOT))
        val out = scala.collection.mutable.ArrayBuffer.empty[BpeWord]
        while (m.find()) {
          val w = m.group()
          var syms: Array[String] = w.map(_.toString).toArray :+ EndOfWord
          var continue = true
          while (continue && syms.length > 1) {
            var bestRank = Int.MaxValue; var bestAt = -1
            var i = 0
            while (i < syms.length - 1) {
              rank.get((syms(i), syms(i + 1))).foreach { r =>
                if (r < bestRank) { bestRank = r; bestAt = i }
              }
              i += 1
            }
            if (bestAt < 0) continue = false
            else {
              val ns = new Array[String](syms.length - 1)
              System.arraycopy(syms, 0, ns, 0, bestAt)
              ns(bestAt) = syms(bestAt) + syms(bestAt + 1)
              System.arraycopy(syms, bestAt + 2, ns, bestAt + 1,
                syms.length - bestAt - 2)
              syms = ns
            }
          }
          out += BpeWord(w, syms)
        }
        out.toArray
      }
    })
    f(text)
  }

  val EndOfWord = "</w>"
}
