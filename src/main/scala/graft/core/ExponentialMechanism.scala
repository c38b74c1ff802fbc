package graft.core

/** Exponential mechanism: choose a parameter from a candidate list in a DP
  * way, with probability proportional to exp(score * eps / (Δ * factor))
  * where factor is 1 for monotonic scoring functions and 2 otherwise
  * (reference: dp_computations.py:707-761). All in memory (candidate lists
  * are small by construction).
  */
trait ScoringFunction {
  def score(k: Int): Double
  def globalSensitivity: Double
  def isMonotonic: Boolean
}

final class ExponentialMechanism(scoring: ScoringFunction) {

  def probabilities(eps: Double, candidates: Seq[Int]): Seq[Double] = {
    require(candidates.nonEmpty, "candidate list must not be empty")
    require(eps > 0, s"epsilon must be > 0, got $eps")
    require(scoring.globalSensitivity > 0,
      s"globalSensitivity must be > 0, got ${scoring.globalSensitivity} — " +
        "a zero sensitivity yields all-NaN weights and a silently " +
        "deterministic (non-private) selection")
    var denominator = scoring.globalSensitivity
    if (!scoring.isMonotonic) denominator *= 2
    val raw = candidates.map(k => scoring.score(k) * eps / denominator)
    // stabilize: exp can overflow for huge eps; shift by max (softmax trick)
    val mx = raw.max
    val weights = raw.map(s => math.exp(s - mx))
    val total = weights.sum
    weights.map(_ / total)
  }

  def apply(eps: Double, candidates: Seq[Int], noise: NoiseSource): Int = {
    val probs = probabilities(eps, candidates)
    val u = noise.uniform()
    var cum = 0.0
    var i = 0
    while (i < candidates.size - 1) {
      cum += probs(i)
      if (u < cum) return candidates(i)
      i += 1
    }
    candidates.last
  }
}
