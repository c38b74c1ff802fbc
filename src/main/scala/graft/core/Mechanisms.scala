package graft.core

/** Validated sensitivity bundle (reference: dp_computations.py:624-664). */
final case class Sensitivities(
    l0: Option[Int] = None,
    linf: Option[Double] = None,
    l1Given: Option[Double] = None,
    l2Given: Option[Double] = None
) extends Serializable {
  l0.foreach(v => require(v > 0, s"L0 must be positive, got $v"))
  linf.foreach(v => require(v > 0, s"Linf must be positive, got $v"))
  l1Given.foreach(v => require(v > 0, s"L1 must be positive, got $v"))
  l2Given.foreach(v => require(v > 0, s"L2 must be positive, got $v"))
  require(l0.isDefined == linf.isDefined,
    "L0 and Linf must be either both set or both unset")

  /** l1 = l0 * linf (reference: dp_computations.py:80-92). */
  val l1: Option[Double] =
    l1Given.orElse(for (a <- l0; b <- linf) yield a * b)
  /** l2 = sqrt(l0) * linf (reference: dp_computations.py:95-105). */
  val l2: Option[Double] =
    l2Given.orElse(for (a <- l0; b <- linf) yield math.sqrt(a.toDouble) * b)

  for (g <- l1Given; a <- l0; b <- linf)
    require(math.abs(g - a * b) <= 1e-12, s"L1=$g != L0*Linf=${a * b}")
  for (g <- l2Given; a <- l0; b <- linf)
    require(math.abs(g - math.sqrt(a.toDouble) * b) <= 1e-12,
      s"L2=$g != sqrt(L0)*Linf=${math.sqrt(a.toDouble) * b}")
}

/** An additive noise mechanism with fully-resolved parameters; safe to
  * serialize into Spark task closures (pure values + stateless noise source).
  * (reference: dp_computations.py:444-583). */
sealed trait AdditiveMechanism extends Serializable {
  def addNoise(value: Double, noise: NoiseSource): Double
  /** Standard deviation of the noise (for reports / stddev outputs). */
  def stdDev: Double
  def describe: String
}

final case class LaplaceMechanism(b: Double, l1Sensitivity: Double, eps: Double)
    extends AdditiveMechanism {
  /** The value is snapped to the same power-of-2 granularity the secure
    * sampler draws on (Mironov 2012 mitigation) — the released number sits
    * exactly on the grid. Snapping is the identity for values whose
    * representable precision is coarser than b/2^40 (all integer-valued
    * doubles in particular), so zero-noise oracle runs are unaffected. */
  def addNoise(value: Double, noise: NoiseSource): Double = {
    val gran = DpNoise.laplaceGranularity(b)
    math.rint(value / gran) * gran + noise.laplace(b)
  }
  def stdDev: Double = b * math.sqrt(2.0)
  def describe: String =
    f"Laplace mechanism: parameter=$b%.6g l1_sensitivity=$l1Sensitivity eps=$eps"
}
object LaplaceMechanism {
  def fromEpsilon(eps: Double, l1Sensitivity: Double): LaplaceMechanism =
    LaplaceMechanism(DpNoise.laplaceB(eps, l1Sensitivity), l1Sensitivity, eps)
  def fromStdDeviation(std: Double, l1Sensitivity: Double): LaplaceMechanism = {
    val b = std / math.sqrt(2.0)
    LaplaceMechanism(b, l1Sensitivity, l1Sensitivity / b)
  }
}

final case class GaussianMechanism(sigma: Double, l2Sensitivity: Double)
    extends AdditiveMechanism {
  /** Value snapped to the secure sampler's power-of-2 grid (~ 2*sigma/2^57),
    * mirroring the Laplace mechanism; identity for any value representable
    * on a coarser grid (all integer-valued doubles in particular), so
    * zero-noise oracle runs are unaffected. */
  def addNoise(value: Double, noise: NoiseSource): Double = {
    val gran = DpNoise.gaussianGranularity(sigma)
    math.rint(value / gran) * gran + noise.gaussian(sigma)
  }
  def stdDev: Double = sigma
  def describe: String =
    f"Gaussian mechanism: parameter=$sigma%.6g l2_sensitivity=$l2Sensitivity"
}
object GaussianMechanism {
  def fromEpsilonDelta(eps: Double, delta: Double, l2Sensitivity: Double): GaussianMechanism =
    GaussianMechanism(DpNoise.gaussianSigma(eps, delta, l2Sensitivity), l2Sensitivity)
  def fromStdDeviation(std: Double, l2Sensitivity: Double): GaussianMechanism =
    GaussianMechanism(std, l2Sensitivity)
}

/** DP mean = mid + noised(normalized_sum) / max(1, noised(count))
  * (reference: dp_computations.py:586-621). `sumMechanism` is None iff
  * minValue == maxValue: the normalized sum is identically zero and the mean
  * is the range endpoint, exactly, with no noise and no budget spent
  * (reference: dp_computations.py:339-341). */
final case class MeanMechanism(
    rangeMiddle: Double,
    countMechanism: AdditiveMechanism,
    sumMechanism: Option[AdditiveMechanism]
) extends Serializable {
  /** Returns (dpCount, dpSum, dpMean). */
  def computeMean(count: Double, normalizedSum: Double, noise: NoiseSource)
      : (Double, Double, Double) = {
    val dpCount = countMechanism.addNoise(count, noise)
    val dpMean = sumMechanism match {
      case Some(m) =>
        val denominator = math.max(1.0, dpCount)
        rangeMiddle + m.addNoise(normalizedSum, noise) / denominator
      case None => rangeMiddle
    }
    (dpCount, dpMean * dpCount, dpMean)
  }
}

object Mechanisms {

  def createAdditive(spec: MechanismSpec, s: Sensitivities): AdditiveMechanism =
    (spec.noiseKind, spec.noiseStdDev) match {
      // PLD-resolved specs carry the NORMALIZED std (per unit sensitivity);
      // scale by the mechanism's actual sensitivity
      // (reference: dp_computations.py:495-556, 676-688)
      case (NoiseKind.Laplace, Some(nstd)) =>
        val l1 = s.l1.getOrElse(throw new IllegalArgumentException(
          "L1 (or L0+Linf) sensitivity required for Laplace"))
        LaplaceMechanism.fromStdDeviation(nstd * l1, l1)
      case (NoiseKind.Gaussian, Some(nstd)) =>
        val l2 = s.l2.getOrElse(throw new IllegalArgumentException(
          "L2 (or L0+Linf) sensitivity required for Gaussian"))
        GaussianMechanism.fromStdDeviation(nstd * l2, l2)
      case (NoiseKind.Laplace, None) =>
        LaplaceMechanism.fromEpsilon(spec.epsilon,
          s.l1.getOrElse(throw new IllegalArgumentException(
            "L1 (or L0+Linf) sensitivity required for Laplace")))
      case (NoiseKind.Gaussian, None) =>
        GaussianMechanism.fromEpsilonDelta(spec.epsilon, spec.delta,
          s.l2.getOrElse(throw new IllegalArgumentException(
            "L2 (or L0+Linf) sensitivity required for Gaussian")))
    }

  def createMean(rangeMiddle: Double, countSpec: MechanismSpec, countSens: Sensitivities,
      sumSpec: MechanismSpec, sumSens: Sensitivities): MeanMechanism =
    MeanMechanism(rangeMiddle, createAdditive(countSpec, countSens),
      Some(createAdditive(sumSpec, sumSens)))

  /** Equal (eps, delta) split with exact-totals bookkeeping
    * (reference: dp_computations.py:284-312). */
  def equallySplitBudget(eps: Double, delta: Double, n: Int): Seq[(Double, Double)] = {
    require(n > 0, "the number of mechanisms must be a positive integer")
    val head = Seq.fill(n - 1)((eps / n, delta / n))
    val used = head.foldLeft((0.0, 0.0)) { case ((e, d), (e1, d1)) => (e + e1, d + d1) }
    head :+ (eps - used._1, delta - used._2)
  }

  // ---- per-metric sensitivity derivations (reference: dp_computations.py:764-818) ----

  def sensitivitiesForCount(p: AggregateParams): Sensitivities =
    p.maxContributions match {
      case Some(mc) => Sensitivities(l1Given = Some(mc.toDouble), l2Given = Some(mc.toDouble))
      case None => Sensitivities(l0 = Some(p.maxPartitionsContributed),
        linf = Some(p.maxContributionsPerPartition.get.toDouble))
    }

  def sensitivitiesForPrivacyIdCount(p: AggregateParams): Sensitivities =
    p.maxContributions match {
      case Some(mc) =>
        Sensitivities(l1Given = Some(mc.toDouble), l2Given = Some(math.sqrt(mc.toDouble)))
      case None => Sensitivities(l0 = Some(p.maxPartitionsContributed), linf = Some(1.0))
    }

  def sensitivitiesForSum(p: AggregateParams): Sensitivities = {
    if (p.boundsPerContributionAreSet) {
      val maxAbs = math.max(math.abs(p.minValue.get), math.abs(p.maxValue.get))
      p.maxContributions match {
        case Some(mc) =>
          val s = maxAbs * mc
          Sensitivities(l1Given = Some(s), l2Given = Some(s))
        case None =>
          Sensitivities(l0 = Some(p.maxPartitionsContributed),
            linf = Some(maxAbs * p.maxContributionsPerPartition.get))
      }
    } else {
      val linf = math.max(math.abs(p.minSumPerPartition.get), math.abs(p.maxSumPerPartition.get))
      p.maxContributions match {
        // L1 (maxContributions) mode with per-partition SUM bounds: the mc
        // kept rows can land in up to mc distinct partitions, each clipped
        // to linf — the sibling derivations all special-case this mode and
        // this branch silently used l0 = maxPartitionsContributed (default
        // 1, UNENFORCED in L1 mode), under-calibrating noise mc-fold
        case Some(mc) =>
          Sensitivities(l1Given = Some(linf * mc),
            l2Given = Some(linf * math.sqrt(mc.toDouble)))
        case None =>
          Sensitivities(l0 = Some(p.maxPartitionsContributed), linf = Some(linf))
      }
    }
  }

  /** Sensitivity of sum(value - mid): Linf = (max-min)/2 * contributions
    * (reference: dp_computations.py:807-818). */
  def sensitivitiesForNormalizedSum(p: AggregateParams): Sensitivities = {
    val maxAbs = (p.maxValue.get - p.minValue.get) / 2
    p.maxContributions match {
      case Some(mc) =>
        val s = maxAbs * mc
        Sensitivities(l1Given = Some(s), l2Given = Some(s))
      case None =>
        Sensitivities(l0 = Some(p.maxPartitionsContributed),
          linf = Some(maxAbs * p.maxContributionsPerPartition.get))
    }
  }

  /** Bounds of {x^2 : x in [min, max]} (reference: dp_computations.py:65-70).
    * Unlike the reference, the pair is ALWAYS (low, high): for a
    * non-positive range the endpoint squares invert (min^2 >= max^2), and
    * a caller destructuring ._1 as the minimum (VariancePart's degenerate
    * fallback) would otherwise read the MAXIMUM square. */
  def squaresInterval(minValue: Double, maxValue: Double): (Double, Double) =
    if (minValue < 0 && 0 < maxValue)
      (0.0, math.max(minValue * minValue, maxValue * maxValue))
    else {
      val (a, b) = (minValue * minValue, maxValue * maxValue)
      (math.min(a, b), math.max(a, b))
    }
}
