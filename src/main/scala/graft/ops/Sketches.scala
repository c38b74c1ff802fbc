package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries summary output: at most k (item, weight) counters, ordered
  * (estimate desc, item asc). */
final case class MGBuf(keys: Array[String], counts: Array[Long])

/** Misra-Gries heavy hitters as a partial aggregate: each task keeps at most
  * k counters per group, merge combines counters and subtracts the (k+1)-th
  * largest (the mergeable-summaries construction, Agarwal et al. PODS'12),
  * so the exchange carries <= k rows per (group, task) no matter how many
  * distinct items stream through — the "dominant domains/users/tokens"
  * analysis that an exact count-distinct-then-sort cannot do at corpus
  * scale. Estimated counts are within n/(k+1) of truth below, and every
  * item with true frequency > n/(k+1) is guaranteed present.
  *
  * The buffer is a hash map (O(1) per input row; the classic all-counter
  * decrement runs only on a miss with k live counters), so per-row cost is
  * independent of k — the buffer lives as a JVM object inside
  * ObjectHashAggregate and is kryo-serialized only when a partial crosses
  * the exchange. The deterministic (estimate desc, item asc) order is
  * imposed at finish. */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, java.util.HashMap[String, Long], MGBuf] {
  require(k > 0, s"k must be positive, got $k")

  def zero: java.util.HashMap[String, Long] = new java.util.HashMap()

  def reduce(b: java.util.HashMap[String, Long], item: String): java.util.HashMap[String, Long] = {
    if (item == null) return b
    val cur = b.getOrDefault(item, 0L)
    if (cur > 0L) b.put(item, cur + 1L)
    else if (b.size < k) b.put(item, 1L)
    else {
      // decrement all; drop zeros (classic MG step)
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - 1L
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b
  }

  def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val add = b2.entrySet().iterator()
    while (add.hasNext) {
      val e = add.next()
      b1.put(e.getKey, b1.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight, keep positive remainder
      val weights = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { weights(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val sub = weights(weights.length - (k + 1))
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - sub
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b1
  }

  def finish(b: java.util.HashMap[String, Long]): MGBuf = {
    // deterministic output: order counters by (estimate desc, item asc)
    val entries = new Array[(String, Long)](b.size)
    var i = 0
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (key, c) => (-c, key) }
    MGBuf(sorted.map(_._1), sorted.map(_._2))
  }
  def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}

object Sketches {

  /** Per-group heavy hitters: top items by estimated count from a k-counter
    * Misra-Gries summary. Emits (group, item, est_count) rows; the summary
    * is sorted (estimate desc, item asc) at finish, so posexplode emits
    * each group's items in that deterministic order. */
  def heavyHitters(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAggregator(k), Encoders.STRING)
    df.groupBy(col(groupCol).as("group"))
      .agg(mg(col(itemCol).cast("string")).as("s"))
      .select(col("group"), posexplode(arrays_zip(col("s.keys"), col("s.counts"))))
      .select(col("group"), col("col.keys").as("item"),
        col("col.counts").as("est_count"))
  }
}
