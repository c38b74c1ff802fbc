package graft.spark

import graft.core._

/** Per-partition accumulator after the final merge: one row per partition key.
  * `cnt` = bounded row count, `sum` = bounded/clipped sum, `nsum` = sum of
  * (clip(v) - mid), `nsq` = sum of (clip(v) - mid)^2, `pidCnt` = number of
  * distinct privacy units (post-bounding).
  * (reference IR: pipeline_dp/combiners.py:269, 425, 488, 571, 780.)
  */
final case class DpAcc(cnt: Long, sum: Double, nsum: Double, nsq: Double, pidCnt: Long)

/** One component of the compound metric computation. Runs worker-side on the
  * merged accumulator of a single partition key; all mechanism parameters are
  * resolved driver-side before the plan is built (two-phase budget lifecycle,
  * reference: budget_accounting.py:448-476).
  */
sealed trait MetricPart extends Serializable {
  def names: Seq[String]
  def compute(acc: DpAcc, noise: NoiseSource): Seq[Double]
  /** One-line explanation for the computation report. */
  def describe: String
}

/** DP count (reference: combiners.py:263-307). */
final case class CountPart(mechanism: AdditiveMechanism, outputStddev: Boolean = false)
    extends MetricPart {
  val names = Seq("count") ++ (if (outputStddev) Seq("count_noise_stddev") else Nil)
  def compute(acc: DpAcc, noise: NoiseSource) =
    Seq(mechanism.addNoise(acc.cnt.toDouble, noise)) ++
      (if (outputStddev) Seq(mechanism.stdDev) else Nil)
  def describe = s"Computed DP count with ${mechanism.describe}"
}

/** DP privacy-id count (reference: combiners.py:310-357). */
final case class PrivacyIdCountPart(mechanism: AdditiveMechanism, outputStddev: Boolean = false)
    extends MetricPart {
  val names = Seq("privacy_id_count") ++
    (if (outputStddev) Seq("privacy_id_count_noise_stddev") else Nil)
  def compute(acc: DpAcc, noise: NoiseSource) =
    Seq(mechanism.addNoise(acc.pidCnt.toDouble, noise)) ++
      (if (outputStddev) Seq(mechanism.stdDev) else Nil)
  def describe = s"Computed DP privacy_id_count with ${mechanism.describe}"
}

/** DP sum (reference: combiners.py:419-476). Clipping already happened in the
  * accumulator stage (per-contribution or per-partition mode). */
final case class SumPart(mechanism: AdditiveMechanism, outputStddev: Boolean = false)
    extends MetricPart {
  val names = Seq("sum") ++ (if (outputStddev) Seq("sum_noise_stddev") else Nil)
  def compute(acc: DpAcc, noise: NoiseSource) =
    Seq(mechanism.addNoise(acc.sum, noise)) ++
      (if (outputStddev) Seq(mechanism.stdDev) else Nil)
  def describe = s"Computed DP sum with ${mechanism.describe}"
}

/** DP mean via the normalized-sum trick; optionally emits count/sum derived
  * from the same noise draws (reference: combiners.py:479-558). */
final case class MeanPart(
    mechanism: MeanMechanism,
    includeCount: Boolean,
    includeSum: Boolean
) extends MetricPart {
  val names: Seq[String] =
    Seq("mean") ++ (if (includeCount) Seq("count") else Nil) ++
      (if (includeSum) Seq("sum") else Nil)
  def compute(acc: DpAcc, noise: NoiseSource) = {
    val (dpCount, dpSum, dpMean) = mechanism.computeMean(acc.cnt.toDouble, acc.nsum, noise)
    Seq(dpMean) ++ (if (includeCount) Seq(dpCount) else Nil) ++
      (if (includeSum) Seq(dpSum) else Nil)
  }
  def describe =
    s"Computed DP mean: count via ${mechanism.countMechanism.describe}" +
      mechanism.sumMechanism
        .map(m => s"; normalized sum via ${m.describe}")
        .getOrElse("; min==max so mean is the exact range endpoint (no noise)")
}

/** DP variance (+ optional mean/count/sum), budget split equally across the
  * three mechanisms driver-side (reference: combiners.py:561-626,
  * dp_computations.py:353-412). */
final case class VariancePart(
    countMechanism: AdditiveMechanism,
    normSumMechanism: Option[AdditiveMechanism], // None iff minValue == maxValue
    normSqMechanism: Option[AdditiveMechanism],  // None iff squares interval is a point
    minValue: Double,
    maxValue: Double,
    includeMean: Boolean,
    includeCount: Boolean,
    includeSum: Boolean
) extends MetricPart {
  val names: Seq[String] =
    Seq("variance") ++ (if (includeMean) Seq("mean") else Nil) ++
      (if (includeCount) Seq("count") else Nil) ++ (if (includeSum) Seq("sum") else Nil)

  private val middle = minValue + (maxValue - minValue) / 2
  private val (sqMin, _) = Mechanisms.squaresInterval(minValue, maxValue)
  private val sqNMid = {
    val halfR = (maxValue - minValue) / 2
    halfR * halfR / 2
  }

  def compute(acc: DpAcc, noise: NoiseSource) = {
    val dpCount = countMechanism.addNoise(acc.cnt.toDouble, noise)
    val denom = math.max(1.0, dpCount)
    // mean of normalized values; when the range collapses the reference
    // returns the range endpoint (reference: dp_computations.py:341-343)
    val dpNormMean =
      if (minValue == maxValue) minValue
      else normSumMechanism.get.addNoise(acc.nsum, noise) / denom
    // center the squares per contribution before noising (sensitivity
    // sqNMid * c instead of 2x that), then restore the offset with the
    // ALREADY-NOISED count — see the nsq sensitivity note in the planner
    val dpSqMean = normSqMechanism match {
      case Some(m) =>
        (m.addNoise(acc.nsq - acc.cnt * sqNMid, noise) + dpCount * sqNMid) / denom
      case None    => sqMin
    }
    val dpVar = dpSqMean - dpNormMean * dpNormMean
    val dpMean = if (minValue != maxValue) dpNormMean + middle else dpNormMean
    Seq(dpVar) ++ (if (includeMean) Seq(dpMean) else Nil) ++
      (if (includeCount) Seq(dpCount) else Nil) ++
      (if (includeSum) Seq(dpMean * dpCount) else Nil)
  }
  def describe =
    s"Computed DP variance (budget split 3 ways): count via ${countMechanism.describe}" +
      normSumMechanism.map(m => s"; normalized sum via ${m.describe}").getOrElse("") +
      normSqMechanism.map(m => s"; normalized sum of squares via ${m.describe}").getOrElse("")
}

/** The compound computer: one object per query, serialized into the final
  * projection UDF (reference CompoundCombiner: combiners.py:748-847). */
final case class CompoundComputer(parts: Seq[MetricPart], noise: NoiseSource)
    extends Serializable {
  val names: Seq[String] = parts.flatMap(_.names)
  require(names.distinct.size == names.size, s"duplicate metric outputs: $names")
  def compute(cnt: Long, sum: Double, nsum: Double, nsq: Double, pidCnt: Long): Array[Double] = {
    val acc = DpAcc(cnt, sum, nsum, nsq, pidCnt)
    parts.iterator.flatMap(_.compute(acc, noise)).toArray
  }
}

object CompoundComputer {

  /** Plans the metric computation: which parts exist, which budgets they use.
    * Mirrors the shared-subexpression logic of the reference's combiner
    * factory — VARIANCE subsumes MEAN/COUNT/SUM, MEAN subsumes COUNT/SUM
    * (reference: combiners.py:914-1003). Returns the budget handles so the
    * caller can resolve them before [[build]] runs.
    */
  final case class Plan(
      params: AggregateParams,
      varianceHandle: Option[Seq[BudgetHandle]],
      meanCountHandle: Option[BudgetHandle],
      meanSumHandle: Option[BudgetHandle],
      countHandle: Option[BudgetHandle],
      sumHandle: Option[BudgetHandle],
      pidCountHandle: Option[BudgetHandle],
      quantileHandle: Option[BudgetHandle] = None,
      vectorHandle: Option[BudgetHandle] = None
  ) {

    /** Percentile computation (separate input: the merged quantile tree). */
    def buildQuantile(): Option[QuantileComputer] = quantileHandle.map { h =>
      val ps = params.metrics.collect { case Metric.Percentile(p) => p }
      // maxContributions (total-L1) mode: the only enforced bound is
      // <= mc rows per unit IN TOTAL, so the sound per-level model is all
      // of them concentrated in one partition/node -> (l0 = 1, c = mc),
      // which upper-bounds both the L1 (1 * mc) and L2 (sqrt(1) * mc)
      // readings; the per-partition parameters are unenforced there and
      // default to 1, which would under-calibrate mc-fold.
      val (qL0, qC) = params.maxContributions match {
        case Some(mc) => (1, mc)
        case None => (params.maxPartitionsContributed,
          params.maxContributionsPerPartition.getOrElse(1))
      }
      QuantileComputer(ps, h.spec, params.minValue.get, params.maxValue.get,
        qL0, qC, params.noiseKind)
    }

    /** Vector-sum noiser (separate input: the merged vector). */
    def buildVector(): Option[VectorOps.VectorNoiser] = vectorHandle.map { h =>
      // L1 mode: a unit may touch up to mc partitions (each partition
      // vector independently norm-clipped), so the vector l0 is mc — the
      // per-partition l0 is unenforced there and defaults to 1
      VectorOps.VectorNoiser(h.spec, params.vectorNormKind, params.vectorMaxNorm,
        params.vectorSize,
        params.maxContributions.getOrElse(params.maxPartitionsContributed),
        params.noiseKind)
    }
    /** Build serializable mechanisms from resolved budgets. Driver-side. */
    def build(noise: NoiseSource): CompoundComputer = {
      import Metric._
      val p = params
      val has = p.metrics.toSet
      val parts = Seq.newBuilder[MetricPart]

      varianceHandle.foreach { hs =>
        // THREE handles (weight w/3 each, requested in plan()) instead of
        // one handle split 3 ways here: the manual equallySplitBudget of
        // a resolved spec broke under PLDBudgetAccountant, whose additive
        // specs resolve to (eps = 0, delta = 0, noiseStdDev = Some(std))
        // — splitting 0 three ways built mechanisms with b = s/0 =
        // INFINITE Laplace noise (or a Gaussian calibration crash). Naive
        // accounting is unchanged: 3 handles at w/3 resolve to exactly
        // the per-mechanism (eps/3, delta/3) the old split produced.
        val Seq(hCnt, hNSum, hNSq) = hs
        val mk = (h: BudgetHandle, s: Sensitivities) =>
          Mechanisms.createAdditive(h.spec, s)
        val countMech = mk(hCnt, Mechanisms.sensitivitiesForCount(p))
        val (minV, maxV) = (p.minValue.get, p.maxValue.get)
        val nsumMech =
          if (minV == maxV) None
          else Some(mk(hNSum, Mechanisms.sensitivitiesForNormalizedSum(p)))
        // Sensitivity of the sum-of-squares statistic. The accumulator is
        // sum((clip(v)-mid)^2), whose per-contribution range is
        // [0, (R/2)^2] with R = max-min — the squares of the NORMALIZED
        // values. (The reference derives this from
        // squares_interval(min, max) of the RAW range, which coincides
        // only for sign-spanning ranges: for [10, 20] it reads [100, 400]
        // while the accumulated statistic lives in [0, 25] — 6x
        // over-noised — and for [-10, 10] its half-width convention
        // under-states the uncentered statistic's sensitivity 2x. Both
        // repaired here; documented as a deviation in ARCHITECTURE.md.)
        // VariancePart releases noise(nsq - cnt*sqNMid) + dpCount*sqNMid,
        // so the noised term is centered per contribution to
        // [-sqNMid, +sqNMid] with sqNMid = (R/2)^2 / 2 — the same
        // centering the normalized-sum path gets from (v - mid).
        val halfR = (maxV - minV) / 2
        val sqNMid = halfR * halfR / 2
        val nsqMech =
          if (minV == maxV) None
          else {
            val sens = p.maxContributions match {
              case Some(mc) =>
                val s2 = sqNMid * mc
                Sensitivities(l1Given = Some(s2), l2Given = Some(s2))
              case None =>
                Sensitivities(l0 = Some(p.maxPartitionsContributed),
                  linf = Some(sqNMid * p.maxContributionsPerPartition.get))
            }
            Some(mk(hNSq, sens))
          }
        parts += VariancePart(countMech, nsumMech, nsqMech, minV, maxV,
          includeMean = has(Mean), includeCount = has(Count), includeSum = has(Sum))
      }

      meanCountHandle.foreach { ch =>
        val countMech = Mechanisms.createAdditive(ch.spec, Mechanisms.sensitivitiesForCount(p))
        // meanSumHandle is None iff minValue == maxValue: the normalized sum
        // is identically 0 and the mean is the exact range endpoint with no
        // noise and no budget spent (reference: dp_computations.py:339-341).
        val sumMech = meanSumHandle.map(sh =>
          Mechanisms.createAdditive(sh.spec, Mechanisms.sensitivitiesForNormalizedSum(p)))
        parts += MeanPart(MeanMechanism(p.rangeMiddle, countMech, sumMech),
          includeCount = has(Count), includeSum = has(Sum))
      }

      countHandle.foreach { h =>
        parts += CountPart(Mechanisms.createAdditive(h.spec, Mechanisms.sensitivitiesForCount(p)),
          p.outputNoiseStddev)
      }
      sumHandle.foreach { h =>
        parts += SumPart(Mechanisms.createAdditive(h.spec, Mechanisms.sensitivitiesForSum(p)),
          p.outputNoiseStddev)
      }
      pidCountHandle.foreach { h =>
        parts += PrivacyIdCountPart(
          Mechanisms.createAdditive(h.spec, Mechanisms.sensitivitiesForPrivacyIdCount(p)),
          p.outputNoiseStddev)
      }
      CompoundComputer(parts.result(), noise)
    }
  }

  /** Request budgets for the metric set (driver-side, pre-resolution).
    * `uses` > 1 models applying every resolved mechanism that many times
    * (e.g. one release per grouping set): each handle carries count = uses,
    * so the naive accountant charges uses-fold and the PLD accountant
    * self-composes each mechanism uses times. */
  def plan(params: AggregateParams, accountant: BudgetAccountant,
      uses: Int = 1): Plan = {
    import Metric._
    val mt = params.noiseKind.mechanismType
    val w = params.budgetWeight
    val has = params.metrics.toSet
    val req = (name: String) =>
      accountant.requestBudget(mt, weight = w, count = uses, name = name)

    val hasPercentiles = params.metrics.exists(_.isInstanceOf[Percentile])
    val quantileH = if (hasPercentiles) Some(req("Quantile")) else None
    val vectorH = if (has(VectorSum)) Some(req("VectorSum")) else None
    // with post-aggregation thresholding the pid count comes from the
    // thresholding mechanism, not a separate additive one
    val pidH =
      if (has(PrivacyIdCount) && !params.postAggregationThresholding) Some(req("PrivacyIdCount"))
      else None

    if (has(Variance))
      // three w/3-weight handles so the accountant (naive OR PLD) resolves
      // each variance mechanism's noise itself — see build()
      Plan(params,
        Some(Seq("VarianceCount", "VarianceNSum", "VarianceNSq").map(n =>
          accountant.requestBudget(mt, weight = w / 3, count = uses, name = n))),
        None, None, None, None, pidH, quantileH, vectorH)
    else if (has(Mean)) {
      // when the value range collapses the normalized sum carries no signal:
      // request no budget for it (reference: dp_computations.py:339-341)
      val sumH =
        if (params.minValue == params.maxValue) None else Some(req("MeanSum"))
      Plan(params, None, Some(req("MeanCount")), sumH, None, None, pidH,
        quantileH, vectorH)
    }
    else
      Plan(params, None, None, None,
        if (has(Count)) Some(req("Count")) else None,
        if (has(Sum)) Some(req("Sum")) else None,
        pidH, quantileH, vectorH)
  }
}
