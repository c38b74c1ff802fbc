package graft.core

import scala.collection.mutable.ArrayBuffer

/** Resolved (epsilon, delta) for one mechanism after budget computation. */
final case class MechanismSpec(
    mechanismType: MechanismType,
    name: String,
    epsilon: Double,
    delta: Double
) extends Serializable {
  def noiseKind: NoiseKind = mechanismType match {
    case MechanismType.Laplace  => NoiseKind.Laplace
    case MechanismType.Gaussian => NoiseKind.Gaussian
    case MechanismType.PartitionSelection =>
      throw new IllegalStateException("partition selection has no noise kind")
  }
}

/** A pending budget request; resolves to a [[MechanismSpec]] after
  * `computeBudgets()`. Unlike the reference's mutate-after-capture
  * `MechanismSpec` (reference: budget_accounting.py:43-123, 448-476), the
  * handle is explicit about the two-phase lifecycle: reading `.spec` before
  * resolution throws — Spark closures must only capture resolved specs.
  */
final class BudgetHandle private[core] (
    val mechanismType: MechanismType,
    val weight: Double,
    val count: Int,
    val name: String
) {
  private[core] var resolved: Option[MechanismSpec] = None
  def spec: MechanismSpec = resolved.getOrElse(
    throw new IllegalStateException(
      s"budget for '$name' not computed yet — call computeBudgets() before building the physical plan"))
  private def useDelta: Boolean = mechanismType != MechanismType.Laplace
  private[core] def epsWeight: Double = weight * count
  private[core] def deltaWeight: Double = if (useDelta) weight * count else 0.0
}

/** Naive (basic-composition) budget accountant: total epsilon is split across
  * all requested mechanisms proportionally to weight*count; total delta is
  * split only across delta-consuming mechanisms (Gaussian, partition
  * selection) (reference: budget_accounting.py:362-476).
  */
final class NaiveBudgetAccountant(
    val totalEpsilon: Double,
    val totalDelta: Double,
    numAggregations: Option[Int] = None
) {
  require(totalEpsilon > 0, s"totalEpsilon must be > 0, got $totalEpsilon")
  require(totalDelta >= 0 && totalDelta < 1, s"totalDelta must be in [0,1), got $totalDelta")

  private val requests = ArrayBuffer.empty[BudgetHandle]
  private var finalized = false
  private var aggregationCount = 0

  def requestBudget(
      mechanismType: MechanismType,
      weight: Double = 1.0,
      count: Int = 1,
      name: String = ""
  ): BudgetHandle = {
    require(!finalized,
      "requestBudget() called after computeBudgets(); build all aggregations first")
    if (mechanismType == MechanismType.Gaussian && totalDelta == 0)
      throw new IllegalArgumentException("Gaussian mechanism requires total delta > 0")
    if (mechanismType == MechanismType.PartitionSelection && totalDelta == 0)
      throw new IllegalArgumentException("private partition selection requires total delta > 0")
    val h = new BudgetHandle(mechanismType, weight, count, name)
    requests += h
    h
  }

  private[graft] def registerAggregation(): Unit = { aggregationCount += 1 }

  /** Resolve every pending request. Must run driver-side before any Spark
    * action on a plan that consumes the specs. */
  def computeBudgets(): Unit = {
    require(!finalized, "computeBudgets() already called")
    numAggregations.foreach { n =>
      require(aggregationCount == n,
        s"expected $n aggregations, got $aggregationCount")
    }
    finalized = true
    val totalEpsWeight = requests.iterator.map(_.epsWeight).sum
    val totalDeltaWeight = requests.iterator.map(_.deltaWeight).sum
    requests.foreach { h =>
      // The resolved spec is PER-USE: a handle with count=n is applied n
      // times, so its numerator is `weight` while the denominator sums
      // weight*count — total consumption over n uses is n*weight/Σ(w·c),
      // exactly the reference formula (budget_accounting.py:462-476).
      val eps = if (totalEpsWeight > 0) totalEpsilon * h.weight / totalEpsWeight else 0.0
      val delta =
        if (h.deltaWeight > 0 && totalDeltaWeight > 0) totalDelta * h.weight / totalDeltaWeight
        else 0.0
      h.resolved = Some(MechanismSpec(h.mechanismType, h.name, eps, delta))
    }
  }

  def isFinalized: Boolean = finalized
}
