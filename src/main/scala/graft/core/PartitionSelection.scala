package graft.core

/** DP partition selection — the DP analogue of a HAVING filter: release a
  * partition key only when enough distinct privacy units contribute to it.
  *
  * Three strategies, mirroring the reference surface
  * (reference: pipeline_dp/partition_selection.py:33-138, which delegates the
  * math to the Google DP C++ library; algorithms reimplemented here from the
  * published sources):
  *
  *  - [[TruncatedGeometricSelection]] — the optimal probabilistic mechanism
  *    from Desfontaines, Voss, Gipson, Mandayam, "Differentially private
  *    partition selection" (PoPETs 2022): keep-probability recursion
  *    pi(n) = min(e^eps pi(n-1) + delta, 1 - e^-eps (1 - pi(n-1) - delta), 1).
  *  - [[LaplaceThresholdingSelection]] / [[GaussianThresholdingSelection]] —
  *    noisy-count-vs-threshold, per Google's Delta_For_Thresholding.pdf.
  *
  * All strategies are plain serializable values: `shouldKeep` runs inside a
  * nondeterministic Spark filter over the aggregated per-partition privacy-id
  * counts (one call per surviving partition key — never on the raw data).
  */
sealed trait PartitionSelection extends Serializable {
  /** Number of distinct privacy units -> keep? `n` is post-contribution-bounding. */
  def shouldKeep(numPrivacyUnits: Long, noise: NoiseSource): Boolean
  /** Probability a partition with n units is kept (exact for the geometric
    * strategy, derived for thresholding) — used by tests and utility analysis. */
  def probabilityOfKeep(numPrivacyUnits: Long): Double
  def describe: String
}

/** Thresholding strategies additionally expose the noised count when kept
  * (reference: combiners.py:360-416 PostAggregationThresholding). */
sealed trait ThresholdingSelection extends PartitionSelection {
  def threshold: Double
  def noisedValueIfShouldKeep(numPrivacyUnits: Long, noise: NoiseSource): Option[Double]
  final def shouldKeep(n: Long, noise: NoiseSource): Boolean =
    noisedValueIfShouldKeep(n, noise).isDefined
}

object PartitionSelection {

  /** delta adjusted for releasing up to l0 partitions per unit:
    * 1 - (1-delta)^(1/l0), computed stably. */
  private[core] def adjustedDelta(delta: Double, l0: Int): Double =
    if (delta == 0) 0.0 else -math.expm1(math.log1p(-delta) / l0)

  /** T = 1 + b * LapQuantile(1 - deltaAdj) (+ preThreshold shift): a 1-unit
    * partition survives with probability exactly deltaAdj
    * (Delta_For_Thresholding.pdf). The upper-tail quantile is computed
    * from deltaAdj DIRECTLY — forming 1 - deltaAdj first loses the value
    * to cancellation below ~1.1e-16 (p rounds to 1.0 and the threshold
    * silently becomes +Infinity, suppressing every partition; tiny
    * adjusted deltas are routine once a small total delta is split
    * across mechanisms and l0). */
  private[core] def laplaceThreshold(b: Double, deltaAdj: Double, preThreshold: Int): Double = {
    // Laplace quantile at 1 - d: -log(2d) for d <= 1/2, log(2(1-d)) above
    val q = if (deltaAdj <= 0.5) -math.log(2.0 * deltaAdj)
      else math.log(2.0 * (1.0 - deltaAdj))
    1.0 + b * q + (preThreshold - 1)
  }

  private[core] def gaussianThreshold(sigma: Double, deltaAdj: Double, preThreshold: Int): Double =
    // PhiInverse(1 - d) = -PhiInverse(d) exactly (normal symmetry) —
    // evaluating the lower-tail form keeps full precision at tiny d
    1.0 - sigma * DpNoise.phiInverse(deltaAdj) + (preThreshold - 1)

  /** Thresholding selection from a PLD-resolved noise standard deviation:
    * the noise scale is fixed by the accountant's composition search, and the
    * threshold spends ONLY the reserved thresholding delta — the noise's
    * privacy cost is already accounted in the composed PLD (reference:
    * budget_accounting.py:700-747: 25% of delta reserved for thresholds,
    * noise calibrated against the remaining 75%). `noiseStd` is the ACTUAL
    * std of the noise applied to the privacy-unit count. */
  def fromNoiseStd(
      strategy: PartitionSelectionStrategyKind,
      noiseStd: Double,
      thresholdingDelta: Double,
      maxPartitionsContributed: Int,
      preThreshold: Option[Int] = None
  ): ThresholdingSelection = strategy match {
    case PartitionSelectionStrategyKind.LaplaceThresholding =>
      StdLaplaceThresholdingSelection(noiseStd, thresholdingDelta,
        maxPartitionsContributed, preThreshold.getOrElse(1))
    case PartitionSelectionStrategyKind.GaussianThresholding =>
      StdGaussianThresholdingSelection(noiseStd, thresholdingDelta,
        maxPartitionsContributed, preThreshold.getOrElse(1))
    case other =>
      throw new IllegalArgumentException(s"$other is not a thresholding strategy")
  }

  def create(
      strategy: PartitionSelectionStrategyKind,
      epsilon: Double,
      delta: Double,
      maxPartitionsContributed: Int,
      preThreshold: Option[Int] = None
  ): PartitionSelection = strategy match {
    case PartitionSelectionStrategyKind.TruncatedGeometric =>
      TruncatedGeometricSelection(epsilon, delta, maxPartitionsContributed,
        preThreshold.getOrElse(1))
    case PartitionSelectionStrategyKind.LaplaceThresholding =>
      LaplaceThresholdingSelection(epsilon, delta, maxPartitionsContributed,
        preThreshold.getOrElse(1))
    case PartitionSelectionStrategyKind.GaussianThresholding =>
      GaussianThresholdingSelection(epsilon, delta, maxPartitionsContributed,
        preThreshold.getOrElse(1))
    case PartitionSelectionStrategyKind.WeightedGaussianThresholding =>
      throw new IllegalArgumentException(
        "weighted gaussian operates on weights, use WeightedGaussianSelection directly")
  }
}

/** Weighted Gaussian partition selection: each privacy unit contributes
  * weight 1/sqrt(#its partitions) to each of its partitions, so its weight
  * vector has L2 norm <= 1; Gaussian noise with sigma calibrated for
  * (eps, delta/2) at unit L2 sensitivity thresholds the per-partition weight
  * sums (reference: dp_engine.py:664-714, partition_selection.py:92-100). */
final case class WeightedGaussianSelection(
    epsilon: Double,
    delta: Double,
    maxPartitionsContributed: Int
) extends Serializable {
  require(epsilon > 0 && delta > 0 && maxPartitionsContributed >= 1)
  val sigma: Double = DpNoise.gaussianSigma(epsilon, delta / 2, 1.0)
  private val thrDeltaAdj = PartitionSelection.adjustedDelta(delta / 2, maxPartitionsContributed)
  // PhiInverse(1 - d) = -PhiInverse(d) exactly (normal symmetry) — the
  // lower-tail form keeps full precision at tiny adjusted deltas, where
  // forming 1 - d first rounds to 1.0 and phiInverse(1.0) fails (the
  // gaussianThreshold convention; r15 core review)
  val threshold: Double = 1.0 - sigma * DpNoise.phiInverse(thrDeltaAdj)
  def shouldKeep(weightSum: Double, noise: NoiseSource): Boolean =
    weightSum + noise.gaussian(sigma) >= threshold
  def describe: String =
    f"Weighted Gaussian partition selection (eps=$epsilon%.4g delta=$delta%.4g sigma=$sigma%.3f threshold=$threshold%.2f)"
}

/** Weighted Laplace selection — the Laplace-policy half of DP SET UNION
  * (Gopi, Gulhane, Kulkarni, Shen, Shokouhi, Yekhanin, ICML 2020,
  * "Differentially Private Set Union"; re-implemented from the published
  * algorithm, not translated). Each privacy unit spreads total weight at
  * most 1 over its (bounded) items, so its weight vector has L1 norm
  * <= 1; Laplace(1/eps) noise thresholds the per-item weight sums at
  * rho = 1 + (1/eps) * LapQuantile(1 - delta): a unit introducing a
  * fresh item pushes that item's sum by at most 1, which crosses the
  * threshold with probability at most delta. The Gaussian policy is
  * [[WeightedGaussianSelection]] (L2-normalized weights). */
final case class WeightedLaplaceSelection(
    epsilon: Double,
    delta: Double
) extends Serializable {
  require(epsilon > 0 && delta > 0,
    s"epsilon and delta must be positive, got ($epsilon, $delta)")
  val b: Double = 1.0 / epsilon
  val threshold: Double = PartitionSelection.laplaceThreshold(b, delta, 1)
  def shouldKeep(weightSum: Double, noise: NoiseSource): Boolean =
    weightSum + noise.laplace(b) >= threshold
  def describe: String =
    f"Weighted Laplace set-union selection (eps=$epsilon%.4g delta=$delta%.4g b=$b%.3f threshold=$threshold%.2f)"
}

final case class TruncatedGeometricSelection(
    epsilon: Double,
    delta: Double,
    maxPartitionsContributed: Int,
    preThreshold: Int = 1
) extends PartitionSelection {
  require(epsilon > 0 && delta > 0 && maxPartitionsContributed >= 1 && preThreshold >= 1)

  private val epsPerPartition = epsilon / maxPartitionsContributed
  private val deltaPerPartition =
    PartitionSelection.adjustedDelta(delta, maxPartitionsContributed)

  /** pi(n) table computed until it reaches 1 (the mechanism is "truncated":
    * it provably reaches 1 after finitely many steps). */
  @transient private lazy val keepProbabilities: Array[Double] = {
    val buf = scala.collection.mutable.ArrayBuffer(0.0)
    val e = epsPerPartition
    var prev = 0.0
    var guard = 0
    // 4M steps is ~32 MB of table and covers any sane (eps, delta, l0);
    // if pi(n) has not reached 1 by then, returning 1.0 for larger n
    // would be a DETERMINISTIC release where the mechanism still requires
    // randomization — refuse instead of silently weakening the DP claim
    val cap = 4000000
    while (prev < 1.0 && guard < cap) {
      val up = if (prev == 0.0) deltaPerPartition else math.exp(e) * prev + deltaPerPartition
      val down = 1.0 - math.exp(-e) * (1.0 - prev - deltaPerPartition)
      val next = math.min(1.0, math.min(up, down))
      buf += next
      prev = next
      guard += 1
    }
    require(prev >= 1.0,
      s"truncated-geometric keep probabilities did not reach 1 within $cap " +
        s"steps (eps/partition = $epsPerPartition, delta/partition = " +
        s"$deltaPerPartition) — the budget is too small for this l0; " +
        "raise epsilon/delta or lower maxPartitionsContributed")
    buf.toArray
  }

  def probabilityOfKeep(n: Long): Double = {
    val m = n - (preThreshold - 1)
    if (m <= 0) 0.0
    else if (m >= keepProbabilities.length) 1.0
    else keepProbabilities(m.toInt)
  }

  def shouldKeep(n: Long, noise: NoiseSource): Boolean = {
    val p = probabilityOfKeep(n)
    p >= 1.0 || (p > 0.0 && noise.uniform() < p)
  }

  def describe: String =
    f"Truncated geometric partition selection (eps=$epsilon%.4g delta=$delta%.4g l0=$maxPartitionsContributed preThreshold=$preThreshold)"
}

final case class LaplaceThresholdingSelection(
    epsilon: Double,
    delta: Double,
    maxPartitionsContributed: Int,
    preThreshold: Int = 1
) extends ThresholdingSelection {
  require(epsilon > 0 && delta > 0 && maxPartitionsContributed >= 1 && preThreshold >= 1)

  /** Laplace noise on the privacy-unit count has L1 sensitivity = l0. */
  val b: Double = DpNoise.laplaceB(epsilon, maxPartitionsContributed.toDouble)
  private val deltaAdj = PartitionSelection.adjustedDelta(delta, maxPartitionsContributed)

  val threshold: Double = PartitionSelection.laplaceThreshold(b, deltaAdj, preThreshold)

  def noisedValueIfShouldKeep(n: Long, noise: NoiseSource): Option[Double] = {
    if (n < preThreshold) return None
    val noised = n + noise.laplace(b)
    if (noised >= threshold) Some(noised) else None
  }

  def probabilityOfKeep(n: Long): Double = {
    if (n < preThreshold) return 0.0
    val z = (threshold - n) / b // P(Lap >= z*b)
    if (z <= 0) 1.0 - 0.5 * math.exp(z) else 0.5 * math.exp(-z)
  }

  def describe: String =
    f"Laplace thresholding partition selection (eps=$epsilon%.4g delta=$delta%.4g threshold=$threshold%.2f)"
}

/** Laplace thresholding from a PLD-resolved noise std (see
  * [[PartitionSelection.fromNoiseStd]]): b = noiseStd/sqrt(2); the threshold
  * spends only the reserved thresholding delta. */
final case class StdLaplaceThresholdingSelection(
    noiseStd: Double,
    thresholdingDelta: Double,
    maxPartitionsContributed: Int,
    preThreshold: Int = 1
) extends ThresholdingSelection {
  require(noiseStd > 0 && thresholdingDelta > 0 && maxPartitionsContributed >= 1 &&
    preThreshold >= 1)
  val b: Double = noiseStd / math.sqrt(2.0)
  private val deltaAdj =
    PartitionSelection.adjustedDelta(thresholdingDelta, maxPartitionsContributed)
  val threshold: Double = PartitionSelection.laplaceThreshold(b, deltaAdj, preThreshold)

  def noisedValueIfShouldKeep(n: Long, noise: NoiseSource): Option[Double] = {
    if (n < preThreshold) return None
    val noised = n + noise.laplace(b)
    if (noised >= threshold) Some(noised) else None
  }

  def probabilityOfKeep(n: Long): Double = {
    if (n < preThreshold) return 0.0
    val z = (threshold - n) / b
    if (z <= 0) 1.0 - 0.5 * math.exp(z) else 0.5 * math.exp(-z)
  }

  def describe: String =
    f"Laplace thresholding partition selection (PLD noise_std=$noiseStd%.4g thresholding_delta=$thresholdingDelta%.4g threshold=$threshold%.2f)"
}

/** Gaussian thresholding from a PLD-resolved noise std (see
  * [[PartitionSelection.fromNoiseStd]]): sigma = noiseStd; the threshold
  * spends only the reserved thresholding delta. */
final case class StdGaussianThresholdingSelection(
    noiseStd: Double,
    thresholdingDelta: Double,
    maxPartitionsContributed: Int,
    preThreshold: Int = 1
) extends ThresholdingSelection {
  require(noiseStd > 0 && thresholdingDelta > 0 && maxPartitionsContributed >= 1 &&
    preThreshold >= 1)
  val sigma: Double = noiseStd
  private val deltaAdj =
    PartitionSelection.adjustedDelta(thresholdingDelta, maxPartitionsContributed)
  val threshold: Double = PartitionSelection.gaussianThreshold(sigma, deltaAdj, preThreshold)

  def noisedValueIfShouldKeep(n: Long, noise: NoiseSource): Option[Double] = {
    if (n < preThreshold) return None
    val noised = n + noise.gaussian(sigma)
    if (noised >= threshold) Some(noised) else None
  }

  def probabilityOfKeep(n: Long): Double = {
    if (n < preThreshold) return 0.0
    DpNoise.phi((n - threshold) / sigma)
  }

  def describe: String =
    f"Gaussian thresholding partition selection (PLD noise_std=$noiseStd%.4g thresholding_delta=$thresholdingDelta%.4g threshold=$threshold%.2f)"
}

final case class GaussianThresholdingSelection(
    epsilon: Double,
    delta: Double,
    maxPartitionsContributed: Int,
    preThreshold: Int = 1
) extends ThresholdingSelection {
  require(epsilon > 0 && delta > 0 && maxPartitionsContributed >= 1 && preThreshold >= 1)

  /** Google's split: half of delta calibrates the Gaussian noise, half bounds
    * the probability of releasing a 1-unit partition. */
  private val noiseDelta = delta / 2
  private val thresholdDelta = delta / 2
  val sigma: Double =
    DpNoise.gaussianSigma(epsilon, noiseDelta, math.sqrt(maxPartitionsContributed.toDouble))
  private val thrDeltaAdj =
    PartitionSelection.adjustedDelta(thresholdDelta, maxPartitionsContributed)

  val threshold: Double =
    PartitionSelection.gaussianThreshold(sigma, thrDeltaAdj, preThreshold)

  def noisedValueIfShouldKeep(n: Long, noise: NoiseSource): Option[Double] = {
    if (n < preThreshold) return None
    val noised = n + noise.gaussian(sigma)
    if (noised >= threshold) Some(noised) else None
  }

  def probabilityOfKeep(n: Long): Double = {
    if (n < preThreshold) return 0.0
    DpNoise.phi((n - threshold) / sigma)
  }

  def describe: String =
    f"Gaussian thresholding partition selection (eps=$epsilon%.4g delta=$delta%.4g sigma=$sigma%.3f threshold=$threshold%.2f)"
}
