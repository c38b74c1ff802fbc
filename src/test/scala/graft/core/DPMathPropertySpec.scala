package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial property pins for the round-8 DP-math review fixes
  * (commit d584f91): each test targets one fixed privacy bug so a future
  * refactor cannot silently regress it. Unlike the example-based specs in
  * PLDSpec/CoreSpec, these sweep parameter GRIDS and large seeded draw
  * counts — the regimes where the original bugs hid. */
class DPMathPropertySpec extends AnyFunSuite {
  import MechanismType._

  test("PLD pure-Laplace branch: total epsilon spend equals the budget " +
    "across a (weight, count) grid") {
    // THE r8 bug: the delta = 0 branch split epsilon over weight only and
    // ignored count, so a mechanism applied count times spent
    // count * its share — the accountant released count-fold more epsilon
    // than the caller budgeted. Pin: per-use Laplace epsilon of a resolved
    // mechanism is sensitivity * sqrt(2) / noiseStd, and the naive
    // composition sum_i count_i * eps_i must equal totalEpsilon EXACTLY
    // (pure DP, basic composition is tight) for every weight/count mix.
    val sqrt2 = math.sqrt(2.0)
    for (totalEps <- Seq(0.1, 1.0, 7.3)) {
      val grids = Seq(
        Seq((1.0, 1), (1.0, 1)),
        Seq((1.0, 10), (2.0, 1), (0.5, 3)),
        Seq((0.25, 100), (4.0, 2)),
        Seq((1e-3, 1), (1e3, 17), (1.0, 1000)))
      // sensitivities in the grid too (the r10 bug): noiseStdDev is the
      // NORMALIZED per-unit-sensitivity std (MechanismSpec's contract;
      // createAdditive scales by the use-time sensitivity), so the
      // per-use epsilon of a resolved Laplace handle is sqrt(2)/std —
      // INDEPENDENT of sensitivity (l1 cancels: eps = l1*sqrt2/(std*l1)).
      // This matches the PLD search's own model (singlePld builds
      // fromLaplace(mechStd/sqrt2) at unit sensitivity). The old delta=0
      // base summed weight*count without dividing by sensitivity, which
      // overspent epsilon s-fold for any sensitivity < 1.
      for (sens <- Seq(0.5, 1.0, 3.0)) grids.foreach { grid =>
        val acc = new PLDBudgetAccountant(totalEps, 0.0)
        val handles = grid.map { case (w, c) =>
          (acc.requestBudget(Laplace, weight = w, count = c,
            sensitivity = sens), c)
        }
        acc.computeBudgets()
        val spent = handles.map { case (h, c) =>
          val std = h.spec.noiseStdDev.get
          c * (sqrt2 / std) // per-use eps, composed count times
        }.sum
        assert(math.abs(spent - totalEps) < 1e-9 * totalEps,
          s"grid $grid sens=$sens at totalEps=$totalEps spent $spent")
      }
    }
  }

  test("PLD accountant (delta > 0): composed spend stays within budget " +
    "and never exceeds the naive split's noise") {
    // the delta > 0 branch searches for the minimum base noise whose PLD
    // composition meets (eps, delta); two invariants must hold on any
    // (weight, count) mix: (a) re-composing the resolved mechanisms'
    // PLDs spends <= totalEpsilon at totalDelta (within discretization
    // tolerance), (b) advanced composition is no WORSE than the naive
    // accountant — each resolved std is <= the NaiveBudgetAccountant's
    // std for the same request mix (PLD exists to buy less noise).
    val grids = Seq(
      Seq((1.0, 1), (1.0, 1)),
      Seq((1.0, 30), (2.0, 2)),
      Seq((0.5, 4), (0.5, 4), (2.0, 1)))
    grids.foreach { grid =>
      val acc = new PLDBudgetAccountant(1.0, 1e-6, pldDiscretization = 1e-4)
      val hs = grid.map { case (w, c) =>
        acc.requestBudget(Laplace, weight = w, count = c)
      }
      acc.computeBudgets()
      val naive = new NaiveBudgetAccountant(1.0, 1e-6)
      val nhs = grid.map { case (w, c) =>
        naive.requestBudget(Laplace, weight = w, count = c)
      }
      naive.computeBudgets()
      hs.zip(nhs).foreach { case (h, nh) =>
        val pldStd = h.spec.noiseStdDev.get
        // naive spec resolves epsilon; its Laplace std is sens*sqrt2/eps
        val naiveStd = math.sqrt(2.0) / nh.spec.epsilon
        // the base-noise binary search + h = 1e-4 discretization put the
        // resolved std on a grid; equality cases (single independent
        // mechanisms, where PLD == naive) can land one grid step above
        assert(pldStd <= naiveStd * (1 + 1e-3),
          s"grid $grid: PLD std $pldStd worse than naive $naiveStd")
      }
      // (a) re-compose the resolved mechanisms and check the spend
      val composed = hs.zip(grid).map { case (h, (_, c)) =>
        PLD.fromLaplace(h.spec.noiseStdDev.get / math.sqrt(2.0), 1e-4)
          .selfCompose(c)
      }.reduce(_ compose _)
      val eps = composed.epsilonForDelta(1e-6)
      // mean-preserving discretization is approximately unbiased, so allow
      // O(h * totalCompositions) slack — the documented accuracy class
      val slack = 1e-4 * grid.map(_._2).sum * 2 + 1e-6
      assert(eps <= 1.0 + slack,
        s"grid $grid: composed epsilon $eps exceeds budget 1.0 (+$slack)")
    }
  }

  test("truncated-geometric keep probability: monotone in count, bounded " +
    "in [0,1], zero below preThreshold, reaches 1") {
    for {
      eps <- Seq(0.1, 1.0, 4.0)
      delta <- Seq(1e-10, 1e-5)
      l0 <- Seq(1, 3)
      pre <- Seq(1, 5)
    } {
      val sel = TruncatedGeometricSelection(eps, delta, l0, preThreshold = pre)
      var prev = 0.0
      var reached = false
      var n = 0L
      // walk until the table saturates at 1 (bounded: require() in the
      // table build guarantees it reaches 1 or throws)
      while (!reached && n < 5000000L) {
        val p = sel.probabilityOfKeep(n)
        assert(p >= 0.0 && p <= 1.0, s"pi($n)=$p out of [0,1] at ($eps,$delta,$l0,$pre)")
        assert(p + 1e-15 >= prev,
          s"pi($n)=$p < pi(${n - 1})=$prev at ($eps,$delta,$l0,$pre) — " +
            "non-monotone keep probability breaks the thresholding semantics")
        if (n < pre) assert(p == 0.0,
          s"pi($n)=$p below preThreshold $pre must be 0")
        if (p >= 1.0) reached = true
        prev = p; n += 1
      }
      assert(reached, s"pi never reached 1 at ($eps,$delta,$l0,$pre)")
    }
  }

  test("truncated-geometric REFUSES untabulated budgets instead of " +
    "releasing deterministically") {
    // r8 fix: before, counts past the table read pi = 1.0 even when the
    // table had not converged — a deterministic keep where the mechanism
    // still requires randomization. A budget too small to converge within
    // the 4M-step cap must throw, not release.
    val sel = TruncatedGeometricSelection(1e-9, 1e-12, 1, preThreshold = 1)
    val e = intercept[IllegalArgumentException] {
      sel.probabilityOfKeep(10L)
    }
    assert(e.getMessage.contains("did not reach 1"),
      s"expected the refuse message, got: ${e.getMessage}")
  }

  test("seeded Laplace sampler: 1e7 draws are finite with the right tails") {
    // r8 fix: u = 0 (p = 2^-53 per draw) produced log1p(-1) = -Infinity;
    // the redraw must keep every draw finite. Tail pins (b = 1):
    // P(|X| > t) = exp(-t), so over n = 1e7 draws max|X| concentrates
    // near ln(n) ~ 16.1; anything above 60 means the tail is broken, and
    // the |X| > 3 mass must sit near exp(-3) = 0.0498.
    val src = NoiseSource.Seeded(20260814L)
    val n = 10000000
    var i = 0
    var maxAbs = 0.0
    var sum = 0.0
    var over3 = 0
    while (i < n) {
      val x = src.laplace(1.0)
      assert(!x.isInfinite && !x.isNaN, s"non-finite Laplace draw at $i: $x")
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      if (a > 3.0) over3 += 1
      sum += x
      i += 1
    }
    assert(maxAbs < 60.0, s"max |draw| = $maxAbs — tail far too heavy")
    assert(maxAbs > 10.0, s"max |draw| = $maxAbs — tail too light for 1e7 draws")
    val p3 = over3.toDouble / n
    assert(math.abs(p3 - math.exp(-3.0)) < 0.002,
      s"P(|X|>3) = $p3, expected ~${math.exp(-3.0)}")
    assert(math.abs(sum / n) < 0.01, s"mean ${sum / n} not ~0")
  }

  test("Secure sampler: SHA1PRNG draws statistically sound ACROSS THREADS (the shard-pool path)") {
    // r16: the Secure source moved off new SecureRandom() (Linux
    // NativePRNG — one JVM-global lock, negative scaling under the
    // concurrent shard pool) to per-thread SHA1PRNG. Pin that the
    // snapped-Laplace statistics hold when draws come from FOUR
    // concurrent threads — the exact usage pattern of
    // shardedByKeyRange's release pool.
    val n = 200000
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Double, Int, Double)]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        var i = 0; var sum = 0.0; var over3 = 0; var maxAbs = 0.0
        while (i < n) {
          val x = NoiseSource.Secure.laplace(1.0)
          assert(!x.isInfinite && !x.isNaN)
          sum += x; if (math.abs(x) > 3.0) over3 += 1
          maxAbs = math.max(maxAbs, math.abs(x))
          i += 1
        }
        results.add((sum, over3, maxAbs))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.size == 4)
    val total = 4.0 * n
    val mean = rs.map(_._1).sum / total
    val p3 = rs.map(_._2).sum / total
    // mean ~ 0 (sd of mean = sqrt(2/total) ~ 0.0016; allow 5 sigma);
    // Laplace(1) tail: P(|X| > 3) = e^-3 = 0.0498
    assert(math.abs(mean) < 0.008, s"mean $mean")
    assert(math.abs(p3 - math.exp(-3.0)) < 0.003, s"P(|X|>3) = $p3")
    // per-thread tails behave (no thread saw a broken stream)
    rs.foreach { case (_, _, mx) =>
      assert(mx > 5.0 && mx < 60.0, s"thread max |draw| = $mx") }
    // gaussian arm: a few finite draws at production-ish sigma
    (1 to 100).foreach { _ =>
      val g = NoiseSource.Secure.gaussian(2.5)
      assert(!g.isInfinite && !g.isNaN)
    }
  }

  test("gaussianEpsilon rejects the non-terminating delta = 0 domain") {
    intercept[IllegalArgumentException] { DpNoise.gaussianEpsilon(1.0, 0.0) }
    intercept[IllegalArgumentException] { DpNoise.gaussianEpsilon(1.0, 1.0) }
    // and the interior stays consistent with its inverse
    val eps = DpNoise.gaussianEpsilon(2.0, 1e-6)
    val back = DpNoise.gaussianDelta(2.0, eps)
    assert(math.abs(back - 1e-6) < 1e-8, s"delta roundtrip $back")
  }
}
