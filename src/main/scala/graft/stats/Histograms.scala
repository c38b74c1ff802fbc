package graft.stats

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset histograms — the statistics layer feeding parameter tuning
  * (reference: pipeline_dp/dataset_histograms/, ~1490 LoC).
  *
  * Integer histograms (contribution counts) are log-binned: values < 1000 get
  * unit bins, larger values keep their 3 most-significant decimal digits
  * (reference: count_histogram_computation.py:35-54). That bounds the number
  * of distinct bins at ~2700 per decade order, so the per-bin aggregation
  * output stays tiny no matter the dataset size — the whole computation is
  * groupBy chains ending in a driver-side collect of a few thousand rows.
  */
final case class FrequencyBin(
    lower: Double, upper: Double, count: Long, sum: Double, max: Double, min: Double)

final case class Histogram(name: String, bins: Seq[FrequencyBin]) {
  def totalCount: Long = bins.map(_.count).sum
  def totalSum: Double = bins.map(_.sum).sum
  def maxValue: Double = if (bins.isEmpty) 0.0 else bins.last.max

  /** Approximate quantiles: for each q, the lower bound of the first bin such
    * that the ratio of data strictly left of it is <= q (reference:
    * histograms.py:134-166 — same walk from the right). */
  def quantiles(q: Seq[Double]): Seq[Double] = {
    require(q == q.sorted, "Quantiles to compute must be sorted.")
    require(bins.nonEmpty, "Cannot compute quantiles of an empty histogram")
    val total = totalCount
    var countSmaller = total
    val result = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iq = q.length - 1
    for (bin <- bins.reverse) {
      countSmaller -= bin.count
      val ratioSmaller = countSmaller.toDouble / total
      while (iq >= 0 && q(iq) >= ratioSmaller) {
        result += bin.lower
        iq -= 1
      }
    }
    while (iq >= 0) { result += bins.head.lower; iq -= 1 }
    result.reverse.toSeq
  }

  /** Ratio of data dropped for each candidate contribution bound
    * (reference: histograms.py:169-208). */
  def ratioDropped: Seq[(Double, Double)] = {
    if (bins.isEmpty) return Nil
    val total = totalSum
    // a zero or negative total (an all-zero or sign-cancelling SUM value
    // column) has no well-defined "fraction dropped": dividing would put
    // NaN (0/0) or inverted ratios into every downstream RMSE estimate —
    // report "nothing dropped at any bound" instead, which is exactly
    // right for the zero-mass case the estimator can hit in practice.
    // Same ASCENDING shape as the normal path ((0.0,_), bins, (maxValue,_))
    // — interpolate() reads ratios.last._1 as the max bound and walks the
    // list with indexWhere, so an unsorted or 0-terminated list malformed
    if (total <= 0.0) {
      // maxValue can sit BELOW the last lower here (zero-mass bins may
      // carry max = 0.0) — append it only when it genuinely extends the
      // ladder, keeping the list strictly ascending
      val body = ((0.0, 0.0)) +: bins.map(b => (b.lower, 0.0))
      return if (maxValue > bins.last.lower) body :+ ((maxValue, 0.0))
             else body
    }
    var dropped = 0.0
    var elementsLarger = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var previous = bins.last.lower
    if (maxValue != previous) out += ((maxValue, 0.0))
    for (bin <- bins.reverse) {
      val current = bin.lower
      dropped += elementsLarger * (previous - current) + (bin.sum - bin.count * current)
      out += ((current, dropped / total))
      previous = current
      elementsLarger += bin.count
    }
    out += ((0.0, 1.0))
    out.reverse.toSeq
  }
}

final case class DatasetHistograms(
    l0Contributions: Histogram,
    l1Contributions: Histogram,
    linfContributions: Histogram,
    linfSumContributions: Option[Histogram],
    countPerPartition: Histogram,
    privacyIdPerPartition: Histogram,
    sumPerPartition: Option[Histogram]
)

object Histograms {

  /** Lower bound of the log bin holding `value`: keep 3 most-significant
    * decimal digits (123 -> 123, 1234 -> 1230, 12345 -> 12300). Must stay in
    * sync with [[generatePossibleContributionBounds]]
    * (reference: count_histogram_computation.py:35-54). */
  def toBinLower(value: Long): Long = {
    val roundBase = ladderBase(value)
    value / roundBase * roundBase
  }

  /** The 3-significant-digit decade ladder shared by [[toBinLower]] and
    * [[frequencyHistogram]]'s bin-upper arithmetic (one definition — they
    * must agree bin-for-bin). Overflow-safe: the ladder stops at 10^18
    * (the largest power of ten a Long holds), so values past it land in
    * the top decade instead of wrapping the multiplier negative and
    * spinning the old `bound *= 10` loop forever. */
  private[stats] def ladderBase(value: Long): Long = {
    // 19-digit values (> 10^18): the next decade bound would overflow a
    // Long (the old `bound *= 10` loop wrapped negative and spun forever),
    // and keep-3-of-19-digits means base 10^16 — which also matches the
    // string-length arithmetic of binLowerCol at this magnitude
    if (value > 1000000000000000000L) return 10000000000000000L
    var bound = 1000L
    while (value > bound) bound *= 10 // value <= 10^18 bounds the ladder
    bound / 1000
  }

  /** All candidate bounds with at most 3 significant decimal digits up to
    * upperBound: 1..999, 1000, 1010, ..., 9990, 10000, 10100, ...
    * (reference: private_contribution_bounds.py:178-195). */
  def generatePossibleContributionBounds(upperBound: Int): Seq[Int] = {
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var current = 1L
    var power = 10L
    while (current <= upperBound) {
      bounds += current.toInt
      if (current >= power) power *= 10
      current += math.max(1L, power / 1000)
    }
    bounds.toSeq
  }

  /** Column form of [[toBinLower]] — pure codegen'd arithmetic, no UDF, so the
    * histogram hot path (cardinality = #privacy-units) stays inside
    * whole-stage codegen. Keep-3-significant-digits == subtract the remainder
    * modulo 10^(digits-3); `%` on longs is exact integer arithmetic. */
  private[graft] def binLowerCol(v: Column): Column = {
    val digits = length(v.cast("string"))
    val roundBase = pow(lit(10.0), greatest(lit(0), digits - lit(3))).cast("long")
    v - (v % roundBase)
  }

  /** Frequency histogram of an integer-valued column (log bins). The groupBy
    * output is at most a few thousand bins regardless of input size. */
  private def frequencyHistogram(df: DataFrame, valueCol: String, name: String): Histogram = {
    val binned = df
      .withColumn("__bin", binLowerCol(col(valueCol).cast("long")))
      .groupBy("__bin")
      .agg(count(lit(1)).as("count"), sum(col(valueCol)).as("sum"),
        max(col(valueCol)).as("max"), min(col(valueCol)).as("min"))
      .orderBy("__bin")
      .collect()
    val bins = binned.map { r =>
      val lower = r.getLong(0)
      val upper = {
        // bin width = the shared ladder's step at this magnitude; lower is
        // already ladder-aligned, so the >=-vs-> boundary difference only
        // matters exactly AT a decade edge, where stepping from the NEXT
        // decade is the historical geometry — keep it by asking the ladder
        // about lower + 1
        lower + math.max(1L, ladderBase(lower + 1))
      }
      FrequencyBin(lower.toDouble, upper.toDouble, r.getLong(1),
        r.getAs[Number](2).doubleValue(), r.getAs[Number](3).doubleValue(),
        r.getAs[Number](4).doubleValue())
    }
    Histogram(name, bins.toSeq)
  }

  /** Equi-width (1e4 buckets) histogram of a real-valued column
    * (reference: sum_histogram_computation.py:39-104). */
  private def equiWidthHistogram(df: DataFrame, valueCol: String, name: String,
      buckets: Int = 10000): Option[Histogram] = {
    // NULL values are excluded from the binning, consistently with the
    // min/max/sum aggregates below (which skip NULLs): an unfiltered NULL
    // row would bin as least(NULL, buckets-1) = buckets-1 — phantom
    // hi-edge mass skewing the bound tuning — and an all-NULL top bucket
    // would NPE the driver-side Number reads
    val nonNull = df.filter(col(valueCol).isNotNull)
    val mm = nonNull.agg(min(col(valueCol)), max(col(valueCol))).collect().head
    if (mm.isNullAt(0)) return None
    val lo = mm.getAs[Number](0).doubleValue(); val hi = mm.getAs[Number](1).doubleValue()
    // NaN/Infinity have no finite bin geometry: width goes NaN/Inf, every
    // bin expression nulls, and the driver reads NPE far from the cause —
    // fail loud AT the cause instead (19th adversarial pass)
    require(!lo.isNaN && !hi.isNaN && !lo.isInfinity && !hi.isInfinity,
      s"$name: $valueCol contains NaN or Infinite values (range [$lo, $hi])" +
        " — histogram binning has no finite geometry; clean upstream")
    if (lo == hi) {
      val c = nonNull.count()
      return Some(Histogram(name, Seq(FrequencyBin(lo, hi, c, lo * c, lo, lo))))
    }
    val width = (hi - lo) / buckets
    val binned = nonNull
      .withColumn("__bin", least(floor((col(valueCol) - lo) / width), lit(buckets - 1)))
      .groupBy("__bin")
      .agg(count(lit(1)).as("count"), sum(col(valueCol)).as("sum"),
        max(col(valueCol)).as("max"), min(col(valueCol)).as("min"))
      .orderBy("__bin")
      .collect()
    val bins = binned.map { r =>
      val idx = r.getLong(0)
      FrequencyBin(lo + idx * width, lo + (idx + 1) * width, r.getLong(1),
        r.getAs[Number](2).doubleValue(), r.getAs[Number](3).doubleValue(),
        r.getAs[Number](4).doubleValue())
    }
    Some(Histogram(name, bins.toSeq))
  }

  /** Computes the full histogram bundle in a bounded number of driver
    * actions (7-9 small jobs, one per histogram + the min/max probes) over a cached
    * (pid, pk, count, sum) frame (reference: computing_histograms.py:89-138).
    */
  def computeDatasetHistograms(
      df: DataFrame,
      privacyUnit: Column,
      partitionKey: Column,
      value: Option[Column] = None
  ): DatasetHistograms = {
    val base = df.select(privacyUnit.as("pid"), partitionKey.as("pk"),
      value.getOrElse(lit(1.0)).cast("double").as("v"))
    val perPidPk = base.groupBy("pid", "pk")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .cache()
    try {
      val l0 = frequencyHistogram(
        perPidPk.groupBy("pid").agg(count(lit(1)).as("n_partitions")),
        "n_partitions", "l0_contributions")
      val l1 = frequencyHistogram(
        perPidPk.groupBy("pid").agg(sum("n").as("n_rows")), "n_rows", "l1_contributions")
      val linf = frequencyHistogram(perPidPk, "n", "linf_contributions")
      val linfSum = value.flatMap(_ =>
        equiWidthHistogram(perPidPk, "s", "linf_sum_contributions"))
      val countPerPk = frequencyHistogram(
        perPidPk.groupBy("pk").agg(sum("n").as("n_rows")), "n_rows", "count_per_partition")
      val pidPerPk = frequencyHistogram(
        perPidPk.groupBy("pk").agg(count(lit(1)).as("n_pids")),
        "n_pids", "privacy_id_per_partition_count")
      val sumPerPk = value.flatMap(_ =>
        equiWidthHistogram(perPidPk.groupBy("pk").agg(sum("s").as("psum")),
          "psum", "sum_per_partition"))
      DatasetHistograms(l0, l1, linf, linfSum, countPerPk, pidPerPk, sumPerPk)
    } finally perPidPk.unpersist()
  }
}

/** DP choice of max_partitions_contributed (the L0 bound) via the exponential
  * mechanism over the L0 contribution histogram
  * (reference: private_contribution_bounds.py:27-195). Suitable for COUNT and
  * PRIVACY_ID_COUNT. */
final case class CalculatePrivateContributionBoundsParams(
    aggregationNoiseKind: NoiseKind,
    aggregationEps: Double,
    aggregationDelta: Double,
    calculationEps: Double,
    maxPartitionsContributedUpperBound: Int
)

final class L0ScoringFunction(
    params: CalculatePrivateContributionBoundsParams,
    numberOfPartitions: Long,
    l0Histogram: Histogram
) extends ScoringFunction {

  def bestUpperBound: Int =
    math.min(params.maxPartitionsContributedUpperBound.toLong, numberOfPartitions).toInt

  /** score(k) = -0.5 * impact_noise(k) - 0.5 * impact_dropped(k). */
  def score(k: Int): Double = -(0.5 * impactNoise(k) + 0.5 * impactDropped(k))

  /** PARITY NOTE: the score's true sensitivity is 0.5 * bestUpperBound
    * (the 0.5 weight multiplies the only data-dependent term), but the
    * reference deliberately uses the FULL bound
    * (private_contribution_bounds.py:136-142 "= global_sensitivity") —
    * we match it: conservative is privacy-safe (2x the noise the math
    * strictly requires), and diverging would change every selected bound
    * vs the reference. */
  def globalSensitivity: Double = bestUpperBound.toDouble
  def isMonotonic: Boolean = true

  private def impactNoise(k: Int): Double = {
    val std = params.aggregationNoiseKind match {
      case NoiseKind.Laplace =>
        // Laplace std for count with l0=k, linf=1: b = k/eps; std = b*sqrt(2)
        k / params.aggregationEps * math.sqrt(2.0)
      case NoiseKind.Gaussian =>
        DpNoise.gaussianSigma(params.aggregationEps, params.aggregationDelta, math.sqrt(k.toDouble))
    }
    numberOfPartitions * std
  }

  private def impactDropped(k: Int): Double =
    l0Histogram.bins.map { b =>
      math.max(math.min(b.lower, bestUpperBound.toDouble) - k, 0.0) * b.count
    }.sum
}

/** k-anonymity / l-diversity audit — the pre-release check a privacy
  * pipeline runs BEFORE deciding bounds and noise: group by the quasi-
  * identifier columns and report, per candidate threshold k, how many
  * equivalence classes (and how many rows) fall below k members
  * (k-anonymity; Sweeney 2002) and how many classes carry fewer than k
  * distinct sensitive values (l-diversity at l=k; Machanavajjhala 2007).
  *
  * Scale: one hash-aggregate over the QI key (map-side combine), then the
  * per-class frame fans out across the bounded threshold list and
  * re-aggregates to |ks| rows — the class table never collects and the
  * fan-out factor is |ks|, not data-sized. */
object AnonymityAudit {
  def audit(df: DataFrame, quasiIdCols: Seq[String], sensitiveCol: String,
      ks: Seq[Int] = Seq(2, 5, 10, 25)): DataFrame = {
    require(quasiIdCols.nonEmpty,
      "audit needs at least one quasi-identifier column — an empty list " +
        "audits ONE global class and passes every threshold vacuously")
    require(ks.nonEmpty && ks.forall(_ >= 1), s"thresholds must be >= 1: $ks")
    require(ks.distinct.length == ks.length,
      s"duplicate thresholds would double-count every class: $ks")
    val classes = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__ndist"))
    classes
      .select(col("__n"), col("__ndist"),
        explode(lit(ks.toArray)).as("k"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("__n") < col("k"), 1L).otherwise(0L)).as("n_classes_below_k"),
        sum(when(col("__n") < col("k"), col("__n")).otherwise(lit(0L)))
          .as("n_rows_below_k"),
        sum(when(col("__ndist") < col("k"), 1L).otherwise(0L))
          .as("n_classes_ldiv_below_k"))
  }
}

object PrivateL0Calculator {
  /** Chooses the L0 bound in a DP way. Driver-side once the (tiny) histogram
    * is collected. */
  def calculate(
      params: CalculatePrivateContributionBoundsParams,
      numberOfPartitions: Long,
      histograms: DatasetHistograms,
      noise: NoiseSource = NoiseSource.Secure
  ): Int = {
    val scoring = new L0ScoringFunction(params, numberOfPartitions, histograms.l0Contributions)
    val candidates = Histograms.generatePossibleContributionBounds(scoring.bestUpperBound)
    new ExponentialMechanism(scoring).apply(params.calculationEps, candidates, noise)
  }
}
