package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NoiseSpec extends AnyFunSuite {

  test("gaussianDelta decreases in sigma and eps") {
    assert(DpNoise.gaussianDelta(1.0, 1.0) > DpNoise.gaussianDelta(2.0, 1.0))
    assert(DpNoise.gaussianDelta(1.0, 1.0) > DpNoise.gaussianDelta(1.0, 2.0))
  }

  test("gaussianSigma round-trips through gaussianDelta") {
    for (eps <- Seq(0.1, 1.0, 5.0); delta <- Seq(1e-10, 1e-5, 1e-2)) {
      val sigma = DpNoise.gaussianSigma(eps, delta, 1.0)
      val d = DpNoise.gaussianDelta(sigma, eps)
      assert(d <= delta * (1 + 1e-6), s"eps=$eps delta=$delta sigma=$sigma d=$d")
      // minimality: slightly smaller sigma must violate delta
      assert(DpNoise.gaussianDelta(sigma * 0.99, eps) > delta)
    }
  }

  test("gaussianSigma scales linearly with L2 sensitivity") {
    val s1 = DpNoise.gaussianSigma(1.0, 1e-5, 1.0)
    val s3 = DpNoise.gaussianSigma(1.0, 1e-5, 3.0)
    assert(math.abs(s3 - 3 * s1) < 1e-6 * s1)
  }

  test("gaussianSigma survives huge epsilon (the oracle trick)") {
    val sigma = DpNoise.gaussianSigma(1e5, 1e-10, 1.0)
    assert(sigma > 0 && sigma.isFinite && sigma < 1.0)
  }

  test("gaussianEpsilon inverts gaussianDelta") {
    val sigma = 2.0
    val delta = DpNoise.gaussianDelta(sigma, 1.5)
    assert(math.abs(DpNoise.gaussianEpsilon(sigma, delta) - 1.5) < 1e-6)
  }

  test("laplace noise has the right scale empirically") {
    val b = 2.0
    val n = 200000
    val src = NoiseSource.Seeded(42)
    val draws = Seq.fill(n)(src.laplace(b))
    val mean = draws.sum / n
    val variance = draws.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean) < 0.05, s"mean=$mean")
    assert(math.abs(variance - 2 * b * b) < 0.3, s"var=$variance expected ${2 * b * b}")
  }

  test("zero noise is exactly zero") {
    assert(NoiseSource.Zero.laplace(10.0) == 0.0)
    assert(NoiseSource.Zero.gaussian(10.0) == 0.0)
  }
}

class BudgetSpec extends AnyFunSuite {

  test("naive accountant splits eps by weight, delta among delta users") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    val lap = acc.requestBudget(MechanismType.Laplace, weight = 1.0, name = "a")
    val gau = acc.requestBudget(MechanismType.Gaussian, weight = 3.0, name = "b")
    val sel = acc.requestBudget(MechanismType.PartitionSelection, weight = 1.0, name = "c")
    acc.computeBudgets()
    assert(math.abs(lap.spec.epsilon - 0.2) < 1e-12)
    assert(math.abs(gau.spec.epsilon - 0.6) < 1e-12)
    assert(math.abs(sel.spec.epsilon - 0.2) < 1e-12)
    assert(lap.spec.delta == 0.0)
    assert(math.abs(gau.spec.delta - 0.75e-6) < 1e-18)
    assert(math.abs(sel.spec.delta - 0.25e-6) < 1e-18)
  }

  test("reading spec before computeBudgets throws") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    val h = acc.requestBudget(MechanismType.Laplace)
    assertThrows[IllegalStateException](h.spec)
  }

  test("request after computeBudgets throws") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    acc.requestBudget(MechanismType.Laplace)
    acc.computeBudgets()
    assertThrows[IllegalArgumentException](acc.requestBudget(MechanismType.Laplace))
  }

  test("gaussian with zero delta rejected") {
    val acc = new NaiveBudgetAccountant(1.0, 0.0)
    assertThrows[IllegalArgumentException](acc.requestBudget(MechanismType.Gaussian))
  }
}

class PartitionSelectionSpec extends AnyFunSuite {

  test("truncated geometric: monotone, 0 at 0, 1 for large counts") {
    val sel = TruncatedGeometricSelection(1.0, 1e-5, 1)
    assert(sel.probabilityOfKeep(0) == 0.0)
    val ps = (0L to 200L).map(sel.probabilityOfKeep)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-15 })
    assert(sel.probabilityOfKeep(200) == 1.0)
    assert(sel.probabilityOfKeep(1) > 0.0)
  }

  test("truncated geometric satisfies the DP constraints step-by-step") {
    val eps = 0.7; val delta = 1e-4
    val sel = TruncatedGeometricSelection(eps, delta, 1)
    for (n <- 1L to 300L) {
      val p0 = sel.probabilityOfKeep(n - 1); val p1 = sel.probabilityOfKeep(n)
      assert(p1 <= math.exp(eps) * p0 + delta + 1e-12)
      assert((1 - p0) <= math.exp(eps) * (1 - p1) + delta + 1e-12)
    }
  }

  test("truncated geometric with huge eps keeps everything with >= 2 units") {
    val sel = TruncatedGeometricSelection(1e5, 1e-10, 1)
    assert(sel.probabilityOfKeep(2) == 1.0)
    assert(sel.shouldKeep(100, NoiseSource.Zero))
  }

  test("truncated geometric respects l0 adjustment") {
    val s1 = TruncatedGeometricSelection(1.0, 1e-5, 1)
    val s4 = TruncatedGeometricSelection(1.0, 1e-5, 4)
    // stricter with more partitions contributed
    assert(s4.probabilityOfKeep(5) <= s1.probabilityOfKeep(5))
  }

  test("laplace thresholding: threshold calibrated so P(keep | n=1) = adjusted delta") {
    val delta = 1e-5
    val sel = LaplaceThresholdingSelection(1.0, delta, 1)
    assert(math.abs(sel.probabilityOfKeep(1) - delta) < 1e-12)
    assert(sel.probabilityOfKeep(1000) == 1.0)
    // empirical keep rate for n = threshold (should be ~0.5)
    val noise = NoiseSource.Seeded(7)
    val n = math.round(sel.threshold)
    val rate = (1 to 20000).count(_ => sel.shouldKeep(n, noise)) / 20000.0
    assert(rate > 0.4 && rate < 0.6, s"rate=$rate")
  }

  test("gaussian thresholding: keeps large, drops small, P(keep|1) <= delta") {
    val sel = GaussianThresholdingSelection(1.0, 1e-5, 2)
    assert(sel.probabilityOfKeep(1) <= 1e-5)
    assert(sel.probabilityOfKeep(100000) == 1.0)
    assert(sel.threshold > 1.0)
  }

  test("pre-threshold shifts the bar") {
    val sel = TruncatedGeometricSelection(1e5, 1e-10, 1, preThreshold = 10)
    assert(sel.probabilityOfKeep(9) == 0.0)
    assert(sel.probabilityOfKeep(12) == 1.0)
  }

  test("huge-eps thresholding keeps n>=2 deterministically with Zero noise") {
    val sel = LaplaceThresholdingSelection(1e5, 0.5, 1)
    assert(sel.noisedValueIfShouldKeep(2, NoiseSource.Zero).contains(2.0))
  }
}

class MechanismsSpec extends AnyFunSuite {

  test("sensitivities derive l1/l2 from l0/linf") {
    val s = Sensitivities(l0 = Some(4), linf = Some(3.0))
    assert(s.l1.contains(12.0))
    assert(s.l2.contains(6.0))
  }

  test("inconsistent given l1 rejected") {
    assertThrows[IllegalArgumentException](
      Sensitivities(l0 = Some(4), linf = Some(3.0), l1Given = Some(5.0)))
  }

  test("equallySplitBudget sums exactly to totals") {
    val parts = Mechanisms.equallySplitBudget(1.0, 1e-6, 3)
    assert(parts.size == 3)
    assert(parts.map(_._1).sum == 1.0)
    assert(parts.map(_._2).sum == 1e-6)
  }

  test("laplace mechanism stddev") {
    val m = LaplaceMechanism.fromEpsilon(2.0, 4.0) // b = 2
    assert(math.abs(m.stdDev - 2 * math.sqrt(2.0)) < 1e-12)
    assert(m.addNoise(10.0, NoiseSource.Zero) == 10.0)
  }

  test("squares interval straddles zero correctly and is always (low, high)") {
    assert(Mechanisms.squaresInterval(-2.0, 3.0) == (0.0, 9.0))
    assert(Mechanisms.squaresInterval(1.0, 3.0) == (1.0, 9.0))
    // non-positive ranges: the endpoint squares invert; the pair must
    // still come back ordered (the reference returns (9, 1) here —
    // a documented deviation, since VariancePart destructures ._1 as
    // the minimum)
    assert(Mechanisms.squaresInterval(-3.0, -1.0) == (1.0, 9.0))
  }

  test("mean with min==max is the exact endpoint under real noise, no sum budget") {
    // reference: dp_computations.py:339-341 — compute_dp_mean returns
    // min_value exactly when the range collapses.
    val mech = MeanMechanism(7.0, LaplaceMechanism.fromEpsilon(1.0, 1.0), None)
    val (_, _, mean) = mech.computeMean(100.0, 0.0, NoiseSource.Secure)
    assert(mean == 7.0)
    // and the planner must not burn epsilon on the degenerate sum: with the
    // whole budget on MeanCount, count noise scale is eps=1 not eps=0.5
    val acc = new NaiveBudgetAccountant(1.0, 0.0)
    val params = AggregateParams(metrics = Seq(Metric.Mean),
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(1),
      minValue = Some(7.0), maxValue = Some(7.0))
    val plan = graft.spark.CompoundComputer.plan(params, acc)
    assert(plan.meanSumHandle.isEmpty)
    acc.computeBudgets()
    assert(plan.meanCountHandle.get.spec.epsilon == 1.0)
    val computer = plan.build(NoiseSource.Secure)
    assert(computer.compute(5L, 35.0, 0.0, 0.0, 5L).head == 7.0)
  }

  test("budget split for Count+Mean+Percentile pins reference weight semantics") {
    // reference: combiners.py:914-1003 — when MEAN is present it requests TWO
    // budgets (MeanCount, MeanSum) and COUNT rides the MeanCount budget (no
    // separate Count request); any percentile set adds ONE Quantile budget.
    // Count+Mean+P50 therefore resolves exactly 3 equal-weight mechanisms:
    // (eps/3, delta/3) each under naive composition — a silent mis-split
    // would shift these numbers while still passing zero-noise output tests.
    val acc = new NaiveBudgetAccountant(3.0, 3e-6)
    val params = AggregateParams(
      metrics = Seq(Metric.Count, Metric.Mean, Metric.Percentile(50)),
      noiseKind = NoiseKind.Gaussian,
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(1),
      minValue = Some(0.0), maxValue = Some(10.0))
    val plan = graft.spark.CompoundComputer.plan(params, acc)
    assert(plan.countHandle.isEmpty, "COUNT must ride the MeanCount budget")
    assert(plan.varianceHandle.isEmpty)
    acc.computeBudgets()
    val specs = Seq(plan.meanCountHandle.get.spec, plan.meanSumHandle.get.spec,
      plan.quantileHandle.get.spec)
    specs.foreach { s =>
      assert(s.epsilon == 1.0, s"${s.name}: expected eps exactly 3.0/3, got ${s.epsilon}")
      assert(s.delta == 1e-6, s"${s.name}: expected delta exactly 3e-6/3, got ${s.delta}")
    }
    // budget_weight scales the whole aggregation's share: a second
    // aggregation at weight 2 takes 2 parts per mechanism (reference:
    // budget_accounting.py:462-476 weight*count numerators)
    val acc2 = new NaiveBudgetAccountant(8.0, 0.0)
    val p1 = graft.spark.CompoundComputer.plan(AggregateParams(
      metrics = Seq(Metric.Count), maxPartitionsContributed = 1,
      maxContributionsPerPartition = Some(1)), acc2)
    val p2 = graft.spark.CompoundComputer.plan(AggregateParams(
      metrics = Seq(Metric.Count, Metric.Mean, Metric.Percentile(50)),
      budgetWeight = 2.0,
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(1),
      minValue = Some(0.0), maxValue = Some(10.0)), acc2)
    acc2.computeBudgets()
    // total weight = 1 (Count) + 2*3 (MeanCount, MeanSum, Quantile at w=2)
    assert(p1.countHandle.get.spec.epsilon == 8.0 * 1.0 / 7.0)
    assert(p2.meanCountHandle.get.spec.epsilon == 8.0 * 2.0 / 7.0)
    assert(p2.quantileHandle.get.spec.epsilon == 8.0 * 2.0 / 7.0)
  }

  test("aggregate params validation matrix") {
    // MEAN without bounds rejected
    assertThrows[IllegalArgumentException](AggregateParams(
      metrics = Seq(Metric.Mean), maxContributionsPerPartition = Some(1)))
    // SUM with per-partition bounds OK without per-contribution bounds
    AggregateParams(metrics = Seq(Metric.Sum), maxPartitionsContributed = 2,
      minSumPerPartition = Some(0.0), maxSumPerPartition = Some(10.0))
    // both bound kinds rejected
    assertThrows[IllegalArgumentException](AggregateParams(
      metrics = Seq(Metric.Sum), minValue = Some(0.0), maxValue = Some(1.0),
      minSumPerPartition = Some(0.0), maxSumPerPartition = Some(10.0)))
    // maxContributions xor maxContributionsPerPartition
    assertThrows[IllegalArgumentException](AggregateParams(
      metrics = Seq(Metric.Count), maxContributions = Some(5),
      maxContributionsPerPartition = Some(2)))
  }
}
