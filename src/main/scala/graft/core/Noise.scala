package graft.core

import org.apache.commons.math3.distribution.NormalDistribution
import org.apache.commons.math3.special.Erf

/** Noise sampling + Gaussian calibration.
  *
  * Calibration follows Balle & Wang, "Improving the Gaussian Mechanism for
  * Differential Privacy" (ICML 2018), Algorithm 1 — the same analytic
  * calibration the reference delegates to
  * (reference: pipeline_dp/dp_computations.py:108-160).
  *
  * Secure samplers draw on power-of-2 granularity grids (snapped geometric
  * Laplace, symmetric-binomial Gaussian) following the Google DP library's
  * constructions against the Mironov 2012 floating-point channel; see
  * [[NoiseSource.Secure]].
  */
object DpNoise {

  private val stdNormal = new NormalDistribution(null, 0.0, 1.0)

  /** Standard normal CDF Φ(x), with a log-space tail so that huge |x| does
    * not under/overflow downstream products. */
  def phi(x: Double): Double = 0.5 * Erf.erfc(-x / math.sqrt(2.0))

  /** ln Φ(x), stable for x << 0 (asymptotic Φ(x) ≈ φ(x)/|x|). */
  def logPhi(x: Double): Double = {
    if (x > -37.0) math.log(phi(x))
    else -0.5 * x * x - 0.5 * math.log(2 * math.Pi) - math.log(-x)
  }

  /** Φ⁻¹(p). Commons-math computes erfInv(2p - 1), where 2p - 1 rounds to
    * ±1 once the tail probability drops below ~1.1e-16 and the quantile
    * becomes ±Infinity — tail probabilities that small are routine for
    * thresholding deltas split across mechanisms and l0. Below 1e-10 the
    * tails switch to Newton iteration on the stable [[logPhi]]
    * (asymptotic start x₀ = -√(-2 ln p); the hazard-rate derivative
    * exp(logφ - logΦ) is well-conditioned there), accurate to ~1e-12
    * through p = 1e-300. Callers needing the extreme UPPER tail should
    * pass the small complement to avoid forming 1 - p themselves. */
  def phiInverse(p: Double): Double = {
    if (p >= 1e-10 && p <= 1.0 - 1e-10) stdNormal.inverseCumulativeProbability(p)
    else if (p < 1e-10) lowerTailPhiInverse(p)
    else -lowerTailPhiInverse(1.0 - p)
  }

  private def lowerTailPhiInverse(p: Double): Double = {
    require(p > 0, s"phiInverse needs p in (0, 1), got $p")
    val lp = math.log(p)
    var x = -math.sqrt(-2.0 * lp)
    var i = 0
    while (i < 8) {
      val f = logPhi(x) - lp
      val deriv = math.exp(-0.5 * x * x - 0.5 * math.log(2 * math.Pi) - logPhi(x))
      x -= f / deriv
      i += 1
    }
    x
  }

  /** Minimum delta such that Gaussian(sigma) with unit L2 sensitivity is
    * (eps, delta)-DP (reference: dp_computations.py:124-135). Computed as
    * delta = Φ(a/2 - eps/a) - e^eps · Φ(-a/2 - eps/a) with a = 1/sigma,
    * using log-space for the second term to survive large eps. */
  def gaussianDelta(sigma: Double, eps: Double): Double = {
    require(sigma > 0, s"sigma must be > 0, got $sigma")
    val a = 1.0 / sigma
    // X ~ N(a^2/2, a); sf(eps) = Φ((a^2/2 - eps)/a); cdf(-eps) = Φ((-eps - a^2/2)/a)
    val sf = phi((a * a / 2 - eps) / a)
    val logSecond = eps + logPhi((-eps - a * a / 2) / a)
    val second = if (logSecond < -745.0) 0.0 else math.exp(logSecond)
    math.max(0.0, sf - second)
  }

  /** Minimum eps such that Gaussian(sigma) is (eps, delta)-DP — binary search
    * on the decreasing map eps -> gaussianDelta (reference:
    * dp_computations.py:138-160). */
  def gaussianEpsilon(sigma: Double, delta: Double): Double = {
    // delta must be strictly interior: at delta = 0 the doubling search
    // never terminates (gaussianDelta underflows to exactly 0 for large
    // eps, so 0 >= 0 doubles forever into NaN territory), and a Gaussian
    // mechanism has no finite pure-DP epsilon anyway; delta = 1 is vacuous
    require(sigma > 0 && delta > 0 && delta < 1,
      s"gaussianEpsilon needs sigma > 0 and delta in (0, 1), got ($sigma, $delta)")
    val f = (e: Double) => gaussianDelta(sigma, e)
    var lo = 0.0; var hi = 1.0
    if (f(0) >= delta) {
      while (f(hi) >= delta) hi *= 2
    } else {
      hi = 0.0; lo = -1.0
      while (f(lo) < delta) lo *= 2
    }
    while (hi - lo > 1e-10) {
      val mid = (hi + lo) / 2
      if (f(mid) >= delta) lo = mid else hi = mid
    }
    (lo + hi) / 2
  }

  /** Minimal sigma for which Gaussian noise with L2 sensitivity `l2` is
    * (eps, delta)-DP. Since gaussianDelta depends only on sigma/l2 (for fixed
    * eps), calibrate at unit sensitivity and scale. */
  def gaussianSigma(eps: Double, delta: Double, l2Sensitivity: Double): Double = {
    require(eps > 0 && delta > 0 && l2Sensitivity > 0)
    // bracket sigma for unit sensitivity
    var hi = 1.0
    while (gaussianDelta(hi, eps) > delta) hi *= 2
    var lo = hi / 2
    while (gaussianDelta(lo, eps) <= delta && lo > 1e-15) lo /= 2
    var i = 0
    while ((hi - lo) / hi > 1e-9 && i < 200) {
      val mid = (hi + lo) / 2
      if (gaussianDelta(mid, eps) > delta) lo = mid else hi = mid
      i += 1
    }
    hi * l2Sensitivity
  }

  /** Laplace scale b for (eps)-DP with L1 sensitivity. */
  def laplaceB(eps: Double, l1Sensitivity: Double): Double = l1Sensitivity / eps

  /** Snapping granularity for secure Laplace noise: the smallest power of 2
    * >= b / 2^40 (the Google DP library's choice). Power-of-2 granularity
    * makes value snapping exact for any value whose representable precision
    * is coarser than the granularity — in particular the identity for
    * integer-valued doubles. */
  def laplaceGranularity(b: Double): Double = {
    require(b > 0)
    nextPowerOfTwo(b / 1099511627776.0) // 2^40
  }

  /** Snapping granularity for secure Gaussian noise: the smallest power of 2
    * >= 2*sigma / 2^57, so the symmetric-binomial trial parameter
    * sqrt(n) = 2*sigma/granularity lands in (2^56, 2^57] — large enough that
    * the centered binomial Bin(n, 1/2) - n/2 approximates N(0, sigma/gran)
    * within negligible statistical distance (the Google DP library's bound;
    * see "Secure Noise Generation", Google 2020). */
  def gaussianGranularity(sigma: Double): Double = {
    require(sigma > 0)
    nextPowerOfTwo(2.0 * sigma / 1.44115188075855872e17) // 2^57
  }

  private def nextPowerOfTwo(target: Double): Double = {
    val e = java.lang.Math.getExponent(target)
    val floorPow = java.lang.Math.scalb(1.0, e)
    if (floorPow == target) floorPow else java.lang.Math.scalb(1.0, e + 1)
  }
}

/** A serializable source of noise draws usable inside Spark tasks.
  * Implementations must be thread-safe (Spark runs many tasks per JVM). */
trait NoiseSource extends Serializable {
  /** Draw Laplace(0, b). */
  def laplace(b: Double): Double
  /** Draw N(0, sigma). */
  def gaussian(sigma: Double): Double
  /** U(0,1) draw — used by probabilistic partition selection. */
  def uniform(): Double
}

object NoiseSource {

  /** Cryptographically seeded noise — the production default. A per-thread
    * SecureRandom (java.security) lives executor-side; the object itself
    * carries no state across serialization.
    *
    * Laplace draws use the SNAPPED sampler (Mironov, "On significance of the
    * least significant bits for differential privacy", CCS 2012; Google DP
    * library's geometric construction): noise is a two-sided geometric on
    * multiples of a power-of-2 granularity r ~ b/2^40 — i.e. the DISCRETE
    * Laplace distribution P(k r) ∝ exp(-|k| r / b) — sampled ENTIRELY in
    * integer arithmetic with exact Bernoulli(e^-x) trials (the
    * Canonne-Kamath-Steinke construction, "The Discrete Gaussian for
    * Differential Privacy", NeurIPS 2020, Alg. 1-2): no floating-point
    * appears anywhere between the random bits and the grid value, so no FP
    * artifact can leak input bits. The integer scale is ceil(b/granularity)
    * (>= the calibrated scale, i.e. never less noise than calibrated; the
    * rounding costs < 2^-40 relative utility).
    *
    * Gaussian draws use the SYMMETRIC-BINOMIAL sampler (the Google DP
    * library's secure construction, "Secure Noise Generation", 2020): noise
    * is Bin(n, 1/2) - n/2 on a power-of-2 granularity grid with
    * sqrt(n) = 2*sigma/granularity in (2^56, 2^57], sampled by exact
    * rejection from a two-sided-geometric proposal — integer arithmetic on
    * the grid, no continuous inverse CDF. */
  object Secure extends NoiseSource {
    // SHA1PRNG explicitly, NOT new SecureRandom() (r16): on Linux the
    // default resolves to NativePRNG, whose nextBytes serializes every
    // instance through ONE JVM-global lock — measured 3.5M draws/s on one
    // thread COLLAPSING to 0.74M/s aggregate across four (negative
    // scaling; this is what made concurrent shard releases slower than
    // serial). SHA1PRNG instances are independent pure-Java CSPRNGs
    // seeded from the OS entropy pool once at creation: 8M draws/s per
    // thread, scaling linearly — still cryptographic (FIPS 186-2
    // construction), so the Mironov/CKS security argument is unchanged.
    @transient private lazy val rng =
      ThreadLocal.withInitial[java.security.SecureRandom](() =>
        java.security.SecureRandom.getInstance("SHA1PRNG"))
    private def r = rng.get()

    /** Bernoulli(num/den) — exact, integer comparison on an unbiased draw. */
    private def bernoulliFrac(num: Long, den: Long): Boolean = uniformLong(den) < num

    /** Bernoulli(exp(-num/den)) for num/den <= 1, exactly (CKS Alg. 1): let
      * K be the first k with Bernoulli(num/(den*k)) = 0; accept iff K is
      * odd. Every trial is an integer comparison. */
    private def bernoulliExpFrac(num: Long, den: Long): Boolean = {
      require(num <= den)
      var k = 1L
      while (bernoulliFrac(num, java.lang.Math.multiplyExact(den, k))) k += 1
      k % 2 == 1
    }

    def laplace(b: Double): Double = {
      val gran = DpNoise.laplaceGranularity(b)
      // integer scale in grid units, rounded UP (never less noise than the
      // calibrated b); t <= 2^41 by the granularity choice
      val t = math.ceil(b / gran).toLong
      // CKS Alg. 2: discrete Laplace with scale t — P(x) ∝ exp(-|x|/t)
      while (true) {
        // U uniform in {0..t-1}, accepted with prob exp(-U/t)
        val u = uniformLong(t)
        if (bernoulliExpFrac(u, t)) {
          // V = number of consecutive Bernoulli(exp(-1)) successes
          var v = 0L
          while (bernoulliExpFrac(1, 1)) v += 1
          val x = u + t * v
          val negative = (r.nextInt() & 1) == 1
          // reject (negative, 0) so zero isn't double-counted
          if (!(negative && x == 0L)) {
            return (if (negative) -x else x) * gran
          }
        }
      }
      0.0 // unreachable
    }

    def gaussian(sigma: Double): Double = {
      val gran = DpNoise.gaussianGranularity(sigma)
      sampleSymmetricBinomial(2.0 * sigma / gran) * gran
    }

    /** Geometric(1/2) over {0,1,...}: the number of leading 0 bits before the
      * first 1 in a secure bit stream — exact, no floating point. */
    private def geometricHalf(): Long = {
      var zeros = 0L
      var bits = r.nextLong()
      while (bits == 0L) { zeros += 64; bits = r.nextLong() }
      zeros + java.lang.Long.numberOfLeadingZeros(bits)
    }

    /** Unbiased uniform draw in [0, bound) by rejection. */
    private def uniformLong(bound: Long): Long = {
      val limit = (Long.MaxValue / bound) * bound
      var v = r.nextLong() >>> 1
      while (v >= limit) v = r.nextLong() >>> 1
      v % bound
    }

    /** Centered binomial Bin(n, 1/2) - n/2 with n = sqrtN^2, sampled by
      * rejection against a two-sided-geometric-by-uniform proposal — the
      * Google DP library's symmetric-binomial construction. For
      * sqrtN > 2^56 the result is within negligible statistical distance of
      * N(0, sqrtN/2). The target pmf uses the continuity-corrected normal
      * approximation with an explicit under-estimate factor, which keeps the
      * acceptance test conservative. */
    private def sampleSymmetricBinomial(sqrtN: Double): Double = {
      val n = sqrtN * sqrtN
      val stepSize = math.round(math.sqrt(2.0) * sqrtN + 1.0)
      val tailBound = sqrtN * math.sqrt(math.log(n) / 2)
      val center = math.sqrt(2.0 / math.Pi) / sqrtN *
        (1 - 0.4 * math.pow(math.log(n), 1.5) / sqrtN)
      while (true) {
        val geom = geometricHalf()
        // geom > 62 would overflow stepSize * twoSided; the tail bound would
        // reject it anyway (P ~ 2^-63), so retry without risking overflow.
        if (geom <= 62) {
          val twoSided = if ((r.nextInt() & 1) == 0) geom else -geom - 1
          val result = stepSize * twoSided + uniformLong(stepSize)
          val rd = result.toDouble
          val resultProb =
            if (math.abs(rd) > tailBound) 0.0
            else center * math.exp(-2.0 * rd * rd / n)
          val rejectProb = r.nextDouble()
          if (resultProb > 0 && rejectProb > 0 &&
              rejectProb < resultProb * stepSize * math.pow(2.0, geom - 2.0))
            return rd
        }
      }
      0.0 // unreachable
    }

    def uniform(): Double = r.nextDouble()
    private def readResolve(): Object = Secure
  }

  /** Zero noise — for tests and oracle verification (the reference's
    * huge-epsilon trick, made exact; reference: tests/dp_engine_test.py:1128-1157). */
  object Zero extends NoiseSource {
    def laplace(b: Double): Double = 0.0
    def gaussian(sigma: Double): Double = 0.0
    def uniform(): Double = 0.5
    private def readResolve(): Object = Zero
  }

  /** Deterministic pseudo-random noise for reproducible statistical tests.
    * Thread-local stream seeded from `seed` + thread id: deterministic on
    * single-threaded local runs, merely reproducible-ish on local[n]. */
  final case class Seeded(seed: Long) extends NoiseSource {
    @transient private lazy val rng =
      ThreadLocal.withInitial[java.util.SplittableRandom](
        () => new java.util.SplittableRandom(seed ^ Thread.currentThread().getId))
    private def r = rng.get()
    def laplace(b: Double): Double = {
      // draw u from (-0.5, 0.5) EXCLUSIVE: nextDouble() can return exactly
      // 0.0 (p = 2^-53 per draw), where log1p(-1) = -Inf would poison any
      // aggregate the draw lands in
      var u = r.nextDouble() - 0.5
      while (u == -0.5) u = r.nextDouble() - 0.5
      -b * math.signum(u) * math.log1p(-2 * math.abs(u))
    }
    def gaussian(sigma: Double): Double = sigma * r.nextGaussian()
    def uniform(): Double = r.nextDouble()
  }
}
