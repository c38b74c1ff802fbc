package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries summary state: at most k (item, weight) counters. */
final case class MGBuf(keys: Array[String], counts: Array[Long])

/** Misra-Gries heavy hitters as a partial aggregate: each task keeps at most
  * k counters per group, merge combines counters and subtracts the (k+1)-th
  * largest (the mergeable-summaries construction, Agarwal et al. PODS'12),
  * so the exchange carries <= k rows per (group, task) no matter how many
  * distinct items stream through — the "dominant domains/users/tokens"
  * analysis that an exact count-distinct-then-sort cannot do at corpus
  * scale. Estimated counts are within n/(k+1) of truth below, and every
  * item with true frequency > n/(k+1) is guaranteed present. */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MGBuf, MGBuf] {
  require(k > 0, s"k must be positive, got $k")

  def zero: MGBuf = MGBuf(Array.empty[String], Array.emptyLongArray)

  def reduce(b: MGBuf, item: String): MGBuf = {
    if (item == null) return b
    val i = b.keys.indexOf(item)
    if (i >= 0) { b.counts(i) += 1; b }
    else if (b.keys.length < k)
      MGBuf(b.keys :+ item, b.counts :+ 1L)
    else {
      // decrement all; drop zeros (classic MG step)
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
      val keep = b.counts.zipWithIndex.filter(_._1 > 0)
      MGBuf(keep.map(x => b.keys(x._2)), keep.map(_._1))
    }
  }

  def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
    if (b2.keys.isEmpty) return b1
    if (b1.keys.isEmpty) return b2
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < b1.keys.length) { m(b1.keys(i)) = b1.counts(i); i += 1 }
    i = 0
    while (i < b2.keys.length) {
      m(b2.keys(i)) = m.getOrElse(b2.keys(i), 0L) + b2.counts(i)
      i += 1
    }
    if (m.size <= k) {
      val arr = m.toArray
      MGBuf(arr.map(_._1), arr.map(_._2))
    } else {
      // subtract the (k+1)-th largest weight, keep positive remainder
      val weights = m.values.toArray.sorted(Ordering[Long].reverse)
      val sub = weights(k)
      val kept = m.toArray.map { case (key, c) => (key, c - sub) }
        .filter(_._2 > 0)
      MGBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  def finish(b: MGBuf): MGBuf = {
    // deterministic output: order counters by (estimate desc, item asc)
    val order = b.keys.indices.sortBy(i => (-b.counts(i), b.keys(i)))
    MGBuf(order.map(b.keys).toArray, order.map(b.counts).toArray)
  }
  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
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
