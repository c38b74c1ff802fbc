package graft.core

/** Parameter model for the DP aggregation engine.
  *
  * Semantics follow the reference engine's parameter surface
  * (reference: pipeline_dp/aggregate_params.py:28-833) re-expressed as
  * immutable Scala ADTs + case classes with eager validation.
  */

/** Distribution of the additive noise (reference: aggregate_params.py:75-96). */
sealed trait NoiseKind {
  def mechanismType: MechanismType = this match {
    case NoiseKind.Laplace  => MechanismType.Laplace
    case NoiseKind.Gaussian => MechanismType.Gaussian
  }
}
object NoiseKind {
  case object Laplace extends NoiseKind
  case object Gaussian extends NoiseKind
}

/** Mechanism used by a budget request (reference: aggregate_params.py:98-133). */
sealed trait MechanismType
object MechanismType {
  case object Laplace extends MechanismType
  case object Gaussian extends MechanismType
  /** Noisy-count thresholding selection modeled as its additive mechanism
    * plus a thresholding delta (used by PLD accounting; reference:
    * aggregate_params.py MechanismType.LAPLACE_THRESHOLDING). */
  case object LaplaceThresholding extends MechanismType
  case object GaussianThresholding extends MechanismType
  /** Truncated-geometric / generic partition selection. */
  case object PartitionSelection extends MechanismType
}

/** Strategy for DP partition selection (reference: aggregate_params.py:136-175). */
sealed trait PartitionSelectionStrategyKind
object PartitionSelectionStrategyKind {
  case object TruncatedGeometric extends PartitionSelectionStrategyKind
  case object LaplaceThresholding extends PartitionSelectionStrategyKind
  case object GaussianThresholding extends PartitionSelectionStrategyKind
  /** Threshold the sum of per-user weights 1/sqrt(#partitions of user) —
    * joint L2 sensitivity 1 (reference: dp_engine.py:664-714). */
  case object WeightedGaussianThresholding extends PartitionSelectionStrategyKind
}

/** Norm used to clip vectors for VECTOR_SUM (reference: aggregate_params.py:166-175). */
sealed trait NormKind
object NormKind {
  case object L1 extends NormKind
  case object L2 extends NormKind
  case object Linf extends NormKind
}

/** Metric ADT (reference: aggregate_params.py:28-72; parametric percentile). */
sealed trait Metric { def name: String }
object Metric {
  case object Count extends Metric { val name = "count" }
  case object PrivacyIdCount extends Metric { val name = "privacy_id_count" }
  case object Sum extends Metric { val name = "sum" }
  case object Mean extends Metric { val name = "mean" }
  case object Variance extends Metric { val name = "variance" }
  final case class Percentile(p: Double) extends Metric {
    require(p >= 0 && p <= 100, s"percentile must be in [0, 100], got $p")
    // reference naming: percentile_50, percentile_99_9 (reference: combiners.py:687-695)
    def name =
      s"percentile_${if (p == p.toLong.toDouble) p.toLong.toString else p.toString.replace('.', '_')}"
  }
  case object VectorSum extends Metric { val name = "vector_sum" }
}

/** Total (epsilon, delta) privacy budget for one accountant scope. */
final case class Budget(epsilon: Double, delta: Double) {
  require(epsilon > 0, s"epsilon must be positive, got $epsilon")
  require(delta >= 0 && delta < 1, s"delta must be in [0, 1), got $delta")
}

/** Parameters of a DP `aggregate` call.
  *
  * Validation mirrors the reference's compatibility matrix
  * (reference: aggregate_params.py:328-439):
  *  - SUM needs either per-contribution bounds [minValue, maxValue] or
  *    per-partition bounds [minSumPerPartition, maxSumPerPartition];
  *  - MEAN / VARIANCE / PERCENTILE need per-contribution bounds and
  *    maxContributionsPerPartition;
  *  - per-partition bounds are incompatible with MEAN/VARIANCE/PERCENTILE;
  *  - maxContributions (total L1 bound) is mutually exclusive with
  *    (maxPartitionsContributed, maxContributionsPerPartition).
  */
final case class AggregateParams(
    metrics: Seq[Metric],
    noiseKind: NoiseKind = NoiseKind.Laplace,
    maxPartitionsContributed: Int = 1,
    maxContributionsPerPartition: Option[Int] = None,
    maxContributions: Option[Int] = None,
    minValue: Option[Double] = None,
    maxValue: Option[Double] = None,
    minSumPerPartition: Option[Double] = None,
    maxSumPerPartition: Option[Double] = None,
    vectorNormKind: NormKind = NormKind.Linf,
    vectorMaxNorm: Double = 0.0,
    vectorSize: Int = 0,
    budgetWeight: Double = 1.0,
    partitionSelectionStrategy: PartitionSelectionStrategyKind =
      PartitionSelectionStrategyKind.TruncatedGeometric,
    preThreshold: Option[Int] = None,
    /** When true, contribution bounding is assumed already enforced upstream
      * and sampling is skipped (reference: aggregate_params.py "
      * contribution_bounds_already_enforced"). */
    contributionBoundsAlreadyEnforced: Boolean = false,
    /** Release partitions by thresholding the *noised* privacy-id count and
      * output that noised count — merges selection and the pid-count metric
      * into one mechanism (reference: combiners.py:360-416). Requires
      * PRIVACY_ID_COUNT in metrics and private partitions. */
    postAggregationThresholding: Boolean = false,
    /** Also emit `<metric>_noise_stddev` columns for count / sum /
      * privacy_id_count (reference: combiners.py:285-290). */
    outputNoiseStddev: Boolean = false
) {
  import Metric._

  require(metrics.nonEmpty, "metrics must not be empty")
  require(maxPartitionsContributed >= 1,
    s"maxPartitionsContributed must be >= 1, got $maxPartitionsContributed")
  maxContributionsPerPartition.foreach(c =>
    require(c >= 1, s"maxContributionsPerPartition must be >= 1, got $c"))
  maxContributions.foreach(c => require(c >= 1, s"maxContributions must be >= 1, got $c"))
  require(maxContributions.isEmpty || maxContributionsPerPartition.isEmpty,
    "maxContributions is mutually exclusive with maxContributionsPerPartition")
  // an explicitly-set partition bound would be SILENTLY ignored in L1 mode
  // (the engine skips L0 sampling entirely when maxContributions is set) —
  // reject the combination loudly like the reference's exclusive modes
  require(maxContributions.isEmpty || maxPartitionsContributed == 1,
    "maxContributions (L1) mode does not enforce maxPartitionsContributed — " +
      "leave it at its default (1) or use the L0/Linf bounding mode")
  // under Mean/Variance the count/sum columns are DERIVED from the shared
  // noise draws, so their noise stddevs are not single-mechanism values —
  // the old behavior silently dropped the promised *_noise_stddev columns
  // depending on which other metrics were requested; fail loud instead
  require(!outputNoiseStddev ||
      !metrics.exists(m => m == Mean || m == Variance),
    "outputNoiseStddev is not available when Mean/Variance subsume count/" +
      "sum (their releases derive from shared noise draws); request the " +
      "stddev-bearing metrics in a separate aggregation")
  require(minValue.isDefined == maxValue.isDefined,
    "minValue and maxValue must both be set or both be unset")
  require(minSumPerPartition.isDefined == maxSumPerPartition.isDefined,
    "minSumPerPartition and maxSumPerPartition must both be set or both unset")
  require(!(minValue.isDefined && minSumPerPartition.isDefined),
    "per-contribution bounds and per-partition sum bounds are mutually exclusive")
  for (lo <- minValue; hi <- maxValue)
    require(lo <= hi, s"minValue ($lo) must be <= maxValue ($hi)")
  for (lo <- minSumPerPartition; hi <- maxSumPerPartition)
    require(lo <= hi, s"minSumPerPartition ($lo) must be <= maxSumPerPartition ($hi)")

  private def needsPerContributionBounds =
    metrics.exists {
      case Mean | Variance | _: Percentile => true
      case _ => false
    }
  if (needsPerContributionBounds) {
    require(minValue.isDefined,
      "MEAN/VARIANCE/PERCENTILE require [minValue, maxValue] bounds")
    require(maxContributionsPerPartition.isDefined || maxContributions.isDefined,
      "MEAN/VARIANCE/PERCENTILE require maxContributionsPerPartition (or maxContributions)")
  }
  if (metrics.contains(Sum))
    require(minValue.isDefined || minSumPerPartition.isDefined,
      "SUM requires per-contribution or per-partition bounds")
  if (metrics.contains(Count))
    require(maxContributionsPerPartition.isDefined || maxContributions.isDefined,
      "COUNT requires maxContributionsPerPartition (or maxContributions)")
  if (postAggregationThresholding)
    require(metrics.contains(PrivacyIdCount),
      "postAggregationThresholding requires PRIVACY_ID_COUNT in metrics")
  if (metrics.contains(VectorSum)) {
    require(vectorSize > 0, "VECTOR_SUM requires vectorSize > 0")
    require(vectorMaxNorm > 0, "VECTOR_SUM requires vectorMaxNorm > 0")
    require(!metrics.exists { case Mean | Variance | Sum | _: Percentile => true; case _ => false },
      "VECTOR_SUM is incompatible with scalar value metrics (SUM/MEAN/VARIANCE/PERCENTILE)")
  }

  def boundsPerContributionAreSet: Boolean = minValue.isDefined
  def boundsPerPartitionAreSet: Boolean = minSumPerPartition.isDefined
  def l0Sensitivity: Int = maxPartitionsContributed
  def rangeMiddle: Double = {
    val lo = minValue.get; val hi = maxValue.get
    lo + (hi - lo) / 2 // overflow-safe midpoint (reference: dp_computations.py:73-77)
  }
}

/** Parameters of `selectPartitions` (reference: aggregate_params.py SelectPartitionsParams). */
final case class SelectPartitionsParams(
    maxPartitionsContributed: Int,
    budgetWeight: Double = 1.0,
    strategy: PartitionSelectionStrategyKind =
      PartitionSelectionStrategyKind.TruncatedGeometric,
    preThreshold: Option[Int] = None
) {
  require(maxPartitionsContributed >= 1, "maxPartitionsContributed must be >= 1")
}

/** Per-item weight policy of DP set union ([[SetUnionParams]]). */
sealed trait SetUnionWeighting
object SetUnionWeighting {
  /** weight = 1/maxItemsPerUnit for every kept item: slightly wasteful
    * when a unit carries fewer items, but the per-item weight sum is
    * count/maxItemsPerUnit — an integer-valued grid, so the zero-noise
    * release replays exactly in any engine (the oracle convention). */
  case object Constant extends SetUnionWeighting
  /** weight = 1/k over the unit's k kept items (the paper's uniform
    * policy): tighter — a unit with few items pushes them harder. */
  case object Uniform extends SetUnionWeighting
}

/** Parameters of `DPEngine.setUnion` — DP SET UNION (Gopi et al. ICML
  * 2020): release the union of items (vocabulary words, n-grams, URLs)
  * contributed by privacy units. Each unit is bounded to
  * `maxItemsPerUnit` items (deterministically: the first by item sort
  * order — a valid item-selection policy per the paper, and the choice
  * that makes releases stable under retries), weights are spread per
  * `weighting`, and per-item weight sums are noise-thresholded
  * (Laplace L1 or Gaussian L2 policy). */
final case class SetUnionParams(
    maxItemsPerUnit: Int,
    noiseKind: NoiseKind = NoiseKind.Laplace,
    weighting: SetUnionWeighting = SetUnionWeighting.Constant,
    budgetWeight: Double = 1.0
) {
  require(maxItemsPerUnit >= 1, "maxItemsPerUnit must be >= 1")
  require(budgetWeight > 0, "budgetWeight must be > 0")
}

/** Parameters of `noisyTopK` — release the k partition keys with the
  * largest noisy privacy-unit counts (the report-noisy-max family).
  * With a public candidate domain this is pure-eps peeling
  * report-noisy-max; over an unknown (data-derived) domain it is a
  * Laplace-thresholding release (delta > 0 required) whose top-k is
  * post-processing. Beyond-reference: the reference's selection
  * strategies threshold ALL partitions and cannot answer "which k
  * partitions are largest". */
final case class NoisyTopKParams(
    k: Int,
    maxPartitionsContributed: Int,
    budgetWeight: Double = 1.0
) {
  require(k >= 1, s"k must be >= 1, got $k")
  require(maxPartitionsContributed >= 1,
    s"maxPartitionsContributed must be >= 1, got $maxPartitionsContributed")
}

/** Parameters of `addDpNoise` — noise-only on pre-aggregated data
  * (reference: dp_engine.py:579-652). Caller vouches for the sensitivities. */
final case class AddDpNoiseParams(
    noiseKind: NoiseKind,
    l0Sensitivity: Option[Int] = None,
    linfSensitivity: Option[Double] = None,
    l1Sensitivity: Option[Double] = None,
    l2Sensitivity: Option[Double] = None,
    budgetWeight: Double = 1.0
)
