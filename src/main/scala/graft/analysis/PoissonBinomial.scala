package graft.analysis

import graft.core.DpNoise

/** Probability mass function of a finite integer-valued distribution:
  * `probabilities(i)` = P(X = start + i).
  * (reference: analysis/poisson_binomial.py:25-36)
  */
final case class PMF(start: Int, probabilities: Array[Double])

/** Exact and approximate PMF of the Poisson binomial distribution — the sum
  * of independent Bernoulli variables with heterogeneous probabilities. Used
  * to compute the probability that a partition survives DP partition
  * selection, given each contributor's post-L0-bounding keep probability.
  *
  * (reference: analysis/poisson_binomial.py — re-derived from the PGF
  * convolution and the refined normal approximation of Hong, "On computing
  * the distribution function for the Poisson binomial distribution", 2013,
  * ch. 3.3.)
  */
object PoissonBinomial {

  /** Exact PMF via probability-generating-function convolution:
    * PGF(x) = prod_p (1 - p + p x). O(n^2); use only for small n. */
  def computePmf(probabilities: Seq[Double]): PMF = {
    var probs = Array(1.0)
    probabilities.foreach { p =>
      val next = new Array[Double](probs.length + 1)
      var i = 0
      while (i < probs.length) {
        next(i) += probs(i) * (1 - p)
        next(i + 1) += probs(i) * p
        i += 1
      }
      probs = next
    }
    PMF(0, probs)
  }

  /** Moments of the sum of independent Bernoulli(p_i):
    * (count, expectation, variance, third central moment). */
  def moments(probabilities: Seq[Double]): (Int, Double, Double, Double) = {
    var ex = 0.0; var vr = 0.0; var m3 = 0.0
    probabilities.foreach { p =>
      ex += p
      vr += p * (1 - p)
      m3 += p * (1 - p) * (1 - 2 * p)
    }
    (probabilities.length, ex, vr, m3)
  }

  /** Standard normal density. */
  @inline private def pdf(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2 * math.Pi)

  /** Refined (skewness-corrected) normal approximation of the PMF; tails
    * further than 8 sigma (< 1e-15 mass) are dropped. `n` is the number of
    * Bernoulli terms (the maximal attainable value). */
  def computePmfApproximation(mean: Double, sigma: Double, skewness: Double, n: Long): PMF = {
    if (sigma == 0) return PMF(math.round(mean).toInt, Array(1.0))
    def G(x: Double): Double =
      math.min(1.0, math.max(0.0, DpNoise.phi(x) + skewness * (1 - x * x) * pdf(x) / 6))
    val start = math.max(0L, math.floor(mean - 8 * sigma).toLong)
    val end = math.min(n, math.round(mean + 8 * sigma))
    val len = (end - start + 2).toInt
    val out = new Array[Double](len - 1)
    var prev = G((start - 1 + 0.5 - mean) / sigma)
    var i = 0
    while (i < len - 1) {
      val cur = G((start + i + 0.5 - mean) / sigma)
      out(i) = cur - prev
      prev = cur
      i += 1
    }
    PMF(start.toInt, out)
  }

  /** PMF from a sparse/dense accumulator: exact when the probabilities are
    * retained, refined-normal otherwise. */
  def pmfOf(probs: Option[Seq[Double]], count: Long, ex: Double, vr: Double, m3: Double): PMF =
    probs match {
      case Some(ps) => computePmf(ps)
      case None =>
        val std = math.sqrt(vr)
        val skew = if (std == 0) 0.0 else m3 / (std * std * std)
        computePmfApproximation(ex, std, skew, count)
    }
}
