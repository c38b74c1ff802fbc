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

  /** The broadcast-able compiled merge table: symbols interned to dense int
    * ids, ranks in an open-addressed primitive-long-keyed probe table
    * (key = leftId<<32 | rightId), merged names/ids indexed by rank. One
    * immutable object per executor via broadcast — the hot greedy-apply
    * loop does zero tuple allocation and zero boxing per pair lookup. */
  final class MergeTable private[Bpe] (
      val symIds: java.util.HashMap[String, Integer],
      val keys: Array[Long], val ranks: Array[Int], val mask: Int,
      val mergedName: Array[String], val mergedId: Array[Int])
      extends Serializable {
    @inline def idOf(s: String): Int = {
      val v = symIds.get(s); if (v == null) -1 else v.intValue()
    }
    /** rank of pair (l, r), or Int.MaxValue when the pair never merges */
    @inline def rankOf(l: Int, r: Int): Int = {
      val k = (l.toLong << 32) | (r.toLong & 0xffffffffL)
      var h = java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L) & mask
      while (true) {
        val kk = keys(h)
        if (kk == k) return ranks(h)
        if (kk == -1L) return Int.MaxValue
        h = (h + 1) & mask
      }
      Int.MaxValue // unreachable
    }
  }

  /** Compile merges into the dense-id + probe-table form (driver-side, once). */
  def compileMerges(merges: Seq[(String, String)]): MergeTable = {
    val symIds = new java.util.HashMap[String, Integer]()
    def intern(s: String): Int = {
      val v = symIds.get(s)
      if (v != null) v.intValue()
      else { val n = symIds.size; symIds.put(s, n); n }
    }
    val n = merges.size
    val mergedName = new Array[String](n); val mergedId = new Array[Int](n)
    var cap = 16; while (cap < n * 4) cap <<= 1
    val mask = cap - 1
    val keys = Array.fill[Long](cap)(-1L); val ranks = new Array[Int](cap)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      val k = (intern(a).toLong << 32) | (intern(b).toLong & 0xffffffffL)
      mergedName(r) = a + b; mergedId(r) = intern(a + b)
      var h = java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L) & mask
      var placed = false
      while (!placed) {
        if (keys(h) == -1L) { keys(h) = k; ranks(h) = r; placed = true }
        else if (keys(h) == k) placed = true // dup pair: first (lowest) rank wins
        else h = (h + 1) & mask
      }
    }
    new MergeTable(symIds, keys, ranks, mask, mergedName, mergedId)
  }

  /** Tokenize each word of `text` by the learned merges (standard greedy
    * apply: repeatedly merge the adjacent pair with the LOWEST merge rank
    * until none applies). Returns array<struct<word, tokens>> — one entry
    * per word occurrence, in order.
    *
    * The compiled table ships ONCE per executor as a broadcast (not once
    * per task in the UDF closure — at 50k merges that is megabytes off
    * every task ship), and the per-word loop works on int ids with an
    * in-place shift: no tuple/boxed-key allocation per pair probe, no
    * fresh symbol array per merge step. Measured at sf0.1 (steady-state
    * A/B on the apply stage alone, 50 merges): 0.34 s -> 0.21 s; the
    * full text_bpe query moves little (1.06 -> 1.01 s isolated bench)
    * because per-rep training — the top-vocab wordcount scan — dominates
    * it. The win scales with merge-table size: at a production 50k-merge
    * table the per-task closure ship this removes is the dominant cost. */
  def applyMerges(text: Column, merges: Seq[(String, String)]): Column = {
    val bc = org.apache.spark.sql.SparkSession.active
      .sparkContext.broadcast(compileMerges(merges))
    val f = udf((t: String) => {
      if (t == null) Array.empty[BpeWord]
      else {
        val tab = bc.value
        val eow = tab.idOf(EndOfWord)
        val m = TextAnalysis.tokenPattern.matcher(t.toLowerCase(java.util.Locale.ROOT))
        val out = scala.collection.mutable.ArrayBuffer.empty[BpeWord]
        while (m.find()) {
          val w = m.group()
          var len = w.length + 1
          val names = new Array[String](len)
          val ids = new Array[Int](len)
          var i = 0
          while (i < w.length) {
            val s = String.valueOf(w.charAt(i))
            names(i) = s; ids(i) = tab.idOf(s); i += 1
          }
          names(w.length) = EndOfWord; ids(w.length) = eow
          var continue = true
          while (continue && len > 1) {
            var bestRank = Int.MaxValue; var bestAt = -1
            var j = 0
            while (j < len - 1) {
              val li = ids(j); val ri = ids(j + 1)
              if (li >= 0 && ri >= 0) {
                val r = tab.rankOf(li, ri)
                if (r < bestRank) { bestRank = r; bestAt = j }
              }
              j += 1
            }
            if (bestAt < 0) continue = false
            else {
              names(bestAt) = tab.mergedName(bestRank)
              ids(bestAt) = tab.mergedId(bestRank)
              System.arraycopy(names, bestAt + 2, names, bestAt + 1, len - bestAt - 2)
              System.arraycopy(ids, bestAt + 2, ids, bestAt + 1, len - bestAt - 2)
              len -= 1
            }
          }
          out += BpeWord(w, java.util.Arrays.copyOf(names, len))
        }
        out.toArray
      }
    })
    // lower via Spark's lower() — the SAME path train's tokenizer uses —
    // before the UDF: Spark's non-ASCII slow path lowercases under the
    // JVM default locale while the UDF uses Locale.ROOT, so an unshared
    // first lowering could tokenize the same text differently on the two
    // halves (tr-TR 'I' -> dotless 'ı' vs 'i'). The UDF's own ROOT
    // lowering is a no-op on the already-lowered input.
    f(lower(text))
  }

  val EndOfWord = "</w>"
}
