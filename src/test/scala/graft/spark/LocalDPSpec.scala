package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LocalDPSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dom = Seq("a", "b", "c")

  test("zero noise: exact one-hot counts; one report per unit (lowest value)") {
    // unit 1 has three rows -> ONE report, the lowest value ('a')
    val df = Seq((1L, "c"), (1L, "a"), (1L, "b"), (2L, "b"), (3L, "a"))
      .toDF("uid", "v")
    val r = LocalDP.ldpFrequency(df, "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Zero)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r.keySet == dom.toSet) // the public domain, zero counts included
    assert(r.values.forall(_._1 == 3L)) // n = 3 units, not 5 rows
    assert(r("a")._2 == 2L && r("b")._2 == 1L && r("c")._2 == 0L)
    // the estimator is the debias formula applied to the exact counts
    val expHalf = math.exp(0.5)
    val p = expHalf / (expHalf + 1.0); val q = 1.0 / (expHalf + 1.0)
    def est(c: Long) =
      BigDecimal((c - 3L * q) / (p - q)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("a")._3 == est(2L) && r("c")._3 == est(0L))
    // out-of-domain and NULL values fail loud (closed public domain)
    val e = intercept[Exception](LocalDP.ldpFrequency(
      Seq((1L, "zz")).toDF("uid", "v"), "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e).contains("outside the public domain"))
    val e2 = intercept[Exception](LocalDP.ldpFrequency(
      Seq((1L, null.asInstanceOf[String])).toDF("uid", "v"), "uid",
      col("v"), dom, 1.0, graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e2).contains("NULL value"))
    intercept[IllegalArgumentException](LocalDP.ldpFrequency(df, "uid",
      col("v"), Seq("a", "a"), 1.0, graft.core.NoiseSource.Zero))
  }

  test("always-flip source: every report carries k-1 ones (the flip formula's direction)") {
    // uniform() = 0 clears EVERY flip probability: the true bit reports 0,
    // both false bits report 1 — a wrong-direction flip rule would show
    // k or k-2 ones instead
    object AlwaysFlip extends graft.core.NoiseSource {
      def laplace(b: Double): Double = 0.0
      def gaussian(sigma: Double): Double = 0.0
      def uniform(): Double = 0.0
    }
    val df = Seq((1L, "a"), (2L, "b")).toDF("uid", "v")
    val r = LocalDP.ldpFrequency(df, "uid", col("v"), dom, 1.0, AlwaysFlip)
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    // per report: true bit -> 0, false bits -> 1. 'a': 0+1=1; 'b': 1+0=1;
    // 'c': 1+1=2 (false in both reports)
    assert(r("a") == 1L && r("b") == 1L && r("c") == 2L)
  }

  test("ldpMean: zero-noise sign reports replay; real randomizer unbiased within 5 sigma") {
    // zero noise: b = sign((v - mid)/half); values 900, 900, 100 in
    // [0, 1000] -> +1, +1, -1; sum_b = 1; est = clamp(500 + (1/3)/t*500)
    val df = Seq((1L, 900.0), (1L, 950.0), (2L, 900.0), (3L, 100.0))
      .toDF("uid", "v") // unit 1 reports once (lowest clamped = 900)
    val r = LocalDP.ldpMean(df, "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Zero).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    val t = (math.exp(1.0) - 1.0) / (math.exp(1.0) + 1.0)
    val expect = BigDecimal(500.0 + (1.0 / 3.0) / t * 500.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == math.min(expect, 1000.0))
    // out-of-range clamps INTO the domain before normalizing
    val c = LocalDP.ldpMean(Seq((1L, -999.0)).toDF("uid", "v"), "uid",
      col("v"), 0.0, 1000.0, 1.0, graft.core.NoiseSource.Zero)
      .collect().head
    assert(c.getLong(1) == 0L) // clamped 0 -> x = -1 -> report -1
    // real randomizer: n=20000 at true mean 750 (x = 0.5), eps = 1 —
    // sigma of est ~ (500/t) / sqrt(n) * sqrt(1 - (xt)^2) ~ 7.6; 5 sigma
    val big = (1 to 20000).map(i => (i.toLong, 750.0)).toDF("uid", "v")
    val est = LocalDP.ldpMean(big, "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Seeded(11L)).collect().head.getDouble(2)
    assert(math.abs(est - 750.0) < 40.0, s"est_mean = $est")
    // NULL value fails loud
    val e = intercept[Exception](LocalDP.ldpMean(
      Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("uid", "v"),
      "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e).contains("NULL value"))
    // NULL pid fails loud too: null pids would collapse into ONE window
    // partition and silently merge distinct units into a single report
    val ePid = intercept[Exception](LocalDP.ldpMean(
      Seq((null.asInstanceOf[java.lang.Long], 5.0)).toDF("uid", "v"),
      "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(ePid).contains("NULL privacy-unit"),
      SparkTestSession.chainMsg(ePid).take(300))
  }

  test("explainFrequency states the calibration; sampleSizePerArm matches the closed form") {
    val expHalf = math.exp(0.5)
    val p = expHalf / (expHalf + 1.0); val q = 1.0 / (expHalf + 1.0)
    val rep = LocalDP.explainFrequency(k = 5, epsilon = 1.0,
      nReports = 10000L)
    assert(rep.contains(f"$p%g") && rep.contains(f"$q%g"))
    assert(rep.contains("5 public values") && rep.contains("10000 reports"))
    val std = math.sqrt(10000.0 * p * (1 - p)) / (p - q)
    assert(rep.contains(f"$std%g"))
    intercept[IllegalArgumentException](LocalDP.explainFrequency(1, 1.0, 10L))
    // power analysis: alpha=0.05, power=0.8 gives the textbook
    // ~15.7 sigma^2/mde^2 per arm; CUPED rho=0.6 cuts it by 1-0.36
    val n0 = graft.ops.EventAnalytics.sampleSizePerArm(
      mde = 1.0, sigma = 1.0)
    assert(math.abs(n0 - 15.698) < 0.01, s"n0 = $n0")
    val nC = graft.ops.EventAnalytics.sampleSizePerArm(
      mde = 1.0, sigma = 1.0, cupedRho = 0.6)
    assert(math.abs(nC - n0 * 0.64) < 1e-9)
    // scale invariances: n ~ sigma^2 / mde^2
    val n2 = graft.ops.EventAnalytics.sampleSizePerArm(
      mde = 0.5, sigma = 2.0)
    assert(math.abs(n2 - n0 * 16.0) < 1e-6)
    intercept[IllegalArgumentException](
      graft.ops.EventAnalytics.sampleSizePerArm(0.0, 1.0))
  }

  test("OLH zero noise: truthful buckets, supports = true hits + hash collisions, debias exact") {
    // eps = 1: g = 3, p = e/(e+2) = 0.576 > 0.5 so uniform() = 0.5 keeps
    // every report truthful; seeds are md5(pid) mod 1024 (the engine's
    // portable public-randomness convention) — fully deterministic
    val df = Seq((1L, "c"), (1L, "a"), (2L, "b"), (3L, "a"), (1030L, "b"))
      .toDF("uid", "v") // unit 1: ONE report, lowest value 'a'
    val r = LocalDP.ldpFrequencyOLH(df, "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Zero)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r.keySet == dom.toSet)
    assert(r.values.forall(_._1 == 4L)) // 4 units
    // expected supports from the same public hash: unit u with value v_u
    // reports y_u = H(seed_u, idx(v_u)); candidate j supported where
    // H(seed_u, j) == y_u — the true value always, others on collision
    val units = Seq((1L, 0), (2L, 1), (3L, 0), (1030L, 1)) // (pid, trueIdx)
    val hp = LocalDP.olhParams(1024)
    val expect = dom.indices.map { j =>
      units.count { case (pid, ti) =>
        val (a, b) = hp(LocalDP.olhSeedOf(pid, 1024).toInt)
        LocalDP.olhHash(a, b, j.toLong, 3L) ==
          LocalDP.olhHash(a, b, ti.toLong, 3L)
      }.toLong
    }
    assert(dom.indices.forall(j => r(dom(j))._2 == expect(j)),
      s"supports = ${dom.map(v => r(v)._2)} vs expected $expect")
    // debias replays on those exact supports
    val expEps = math.exp(1.0)
    val p = expEps / (expEps + 2.0); val invG = 1.0 / 3.0
    def est(c: Long) = BigDecimal((c - 4L * invG) / (p - invG))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(dom.forall(v => r(v)._3 == est(r(v)._2)))
    // closed-domain and NULL contracts (the unary conventions)
    val e = intercept[Exception](LocalDP.ldpFrequencyOLH(
      Seq((1L, "zz")).toDF("uid", "v"), "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e).contains("outside the public domain"))
    val e2 = intercept[Exception](LocalDP.ldpFrequencyOLH(
      Seq((1L, null.asInstanceOf[String])).toDF("uid", "v"), "uid",
      col("v"), dom, 1.0, graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e2).contains("NULL value"))
    // non-numeric pid fails loud (the seed is pid-derived public randomness)
    val e3 = intercept[Exception](LocalDP.ldpFrequencyOLH(
      Seq(("not-a-number", "a")).toDF("uid", "v"), "uid", col("v"), dom,
      1.0, graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e3).contains("cast to BIGINT"))
    intercept[IllegalArgumentException](LocalDP.ldpFrequencyOLH(df, "uid",
      col("v"), Seq("a", "a"), 1.0, graft.core.NoiseSource.Zero))
  }

  test("OLH real randomizer: debiased estimates unbiased within 5 sigma; explain states g") {
    // n = 20000 units all holding 'a', eps = 1 (g = 3): per-value stddev
    // ~ sqrt(n (1/g)(1 - 1/g)) / (p - 1/g) ~ 274; assert within 5 sigma
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, "a")).toDF("uid", "v")
    val r = LocalDP.ldpFrequencyOLH(df, "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Seeded(13L))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(math.abs(r("a") - n) < 1400.0, s"est_a = ${r("a")}")
    assert(math.abs(r("b")) < 1400.0 && math.abs(r("c")) < 1400.0,
      s"b=${r("b")} c=${r("c")}")
    val rep = LocalDP.explainFrequencyOLH(k = 100000L, epsilon = 1.0,
      nReports = 20000L)
    assert(rep.contains("[0, 3)") && rep.contains("100000 public values"))
    assert(rep.contains("O(1) in the domain size"))
    intercept[IllegalArgumentException](
      LocalDP.explainFrequencyOLH(1L, 1.0, 10L))
    intercept[IllegalArgumentException](LocalDP.ldpFrequencyOLH(df, "uid",
      col("v"), dom, 1.0, graft.core.NoiseSource.Zero, seedSpace = 1))
  }

  test("shuffle amplification: monotonicity, the amplification guarantee, validity cap") {
    val eps = LocalDP.shuffleAmplifiedEpsilon(1.0, 100000L, 1e-8)
    // the amplification guarantee: central eps far below the local eps0
    assert(eps < 0.2 && eps > 0, s"eps = $eps")
    // regression pin of the exact closed form (FMT'21 Thm 3.1 at these
    // parameters, computed from the same expression — guards arithmetic
    // drift, not the citation)
    val e0 = math.exp(1.0)
    val want = math.log1p((e0 - 1) *
      (4 * math.sqrt(2 * math.log(4.0 / 1e-8) / ((e0 + 1) * 100000L)) +
        4.0 / 100000L))
    assert(eps == want)
    // monotone: decreasing in n, increasing in eps0, decreasing as delta grows
    assert(LocalDP.shuffleAmplifiedEpsilon(1.0, 1000000L, 1e-8) < eps)
    assert(LocalDP.shuffleAmplifiedEpsilon(2.0, 100000L, 1e-8) > eps)
    assert(LocalDP.shuffleAmplifiedEpsilon(1.0, 100000L, 1e-6) < eps)
    // n -> infinity drives eps -> 0
    assert(LocalDP.shuffleAmplifiedEpsilon(1.0, 100000000L, 1e-8) < 0.01)
    // validity cap fails loud: eps0 too large for this n/delta
    val e = intercept[IllegalArgumentException](
      LocalDP.shuffleAmplifiedEpsilon(8.0, 1000L, 1e-8))
    assert(e.getMessage.contains("validity cap"))
    intercept[IllegalArgumentException](
      LocalDP.shuffleAmplifiedEpsilon(1.0, 1L, 1e-8))
    // the explain report states both guarantees
    val rep = LocalDP.explainShuffle(1.0, 100000L, 1e-8)
    assert(rep.contains("eps0 = 1.00000") || rep.contains("eps0 = 1"))
    assert(rep.contains("central accountant"))
  }

  test("shuffled-LDP accountant: mixed ledger resolves a local eps0; round-trip; fail-loud") {
    import graft.core._
    // one ledger: a shuffled telemetry release + a central tree release
    val acc = new NaiveBudgetAccountant(1.0, 1e-8)
    val sh = acc.requestShuffledLdpRelease(nReports = 100000L, name = "olh")
    val t = acc.requestTreeRelease(bins = 64, NoiseKind.Laplace)
    // calibration before resolution fails loud (the two-phase contract)
    intercept[IllegalStateException](sh.localEpsilon)
    acc.computeBudgets()
    // naive split: eps halves across the two unit-weight mechanisms; the
    // shuffled release is the only delta consumer
    assert(sh.centralEpsilon == 0.5 && sh.centralDelta == 1e-8)
    assert(t.perNodeScale == 7.0 / 0.5) // (levels+1)/eps at unitLinf = 1
    val eps0 = sh.localEpsilon
    // the amplification guarantee: the local randomizer runs FAR above
    // the central share it costs
    assert(eps0 > sh.centralEpsilon, s"eps0 = $eps0")
    // round-trip: the resolved eps0's amplified central loss consumes
    // exactly the allocated share (bisection converged, not cap-clamped
    // at these parameters)
    val back = ShuffleAmplification.amplifiedEpsilon(eps0, 100000L, 1e-8)
    assert(math.abs(back - 0.5) < 1e-9, s"round-trip $back != 0.5")
    // monotone: a bigger central share buys a bigger local eps0
    assert(ShuffleAmplification.maxLocalEpsilon(0.8, 100000L, 1e-8) > eps0)
    // cap-clamp: a huge central share cannot certify past the validity
    // cap — the inverse returns the cap itself
    val cap = ShuffleAmplification.validityCap(100000L, 1e-8)
    assert(ShuffleAmplification.maxLocalEpsilon(100.0, 100000L, 1e-8) == cap)
    // PLD path: the shuffled release registers as a generic (eps, delta)
    // mechanism and composes tightly with additive mechanisms
    val accP = new PLDBudgetAccountant(1.0, 1e-8)
    val shP = accP.requestShuffledLdpRelease(nReports = 100000L)
    accP.requestBudget(MechanismType.Gaussian)
    accP.computeBudgets()
    assert(shP.centralEpsilon > 0 && shP.centralDelta > 0 &&
      shP.localEpsilon > shP.centralEpsilon)
    // contracts: pure-Laplace ledgers (delta = 0) cannot account a
    // shuffled release; tiny cohorts fail loud
    intercept[IllegalArgumentException](
      new NaiveBudgetAccountant(1.0, 0.0).requestShuffledLdpRelease(1000L))
    intercept[IllegalArgumentException](
      acc.requestShuffledLdpRelease(1L))
    intercept[IllegalArgumentException](
      ShuffleAmplification.maxLocalEpsilon(0.5, 10L, 1e-8)) // cap <= 0
  }

  test("OLH ingest fold: unit-partitioned batches == one-shot; cells stay bounded") {
    val df = (1 to 90).map(i => (i.toLong, dom(i % 3))).toDF("uid", "v")
    val oneShot = LocalDP.ldpFrequencyOLH(df, "uid", col("v"), dom, 1.0,
        graft.core.NoiseSource.Zero)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // fold over 3 unit-partitioned batches (each unit entirely in one)
    var store: Option[org.apache.spark.sql.DataFrame] = None
    (0 to 2).foreach { r =>
      store = Some(LocalDP.olhIngestStep(
        df.filter(pmod(col("uid"), lit(3L)) === r.toLong), store,
        "uid", col("v"), dom, 1.0, graft.core.NoiseSource.Zero)
        .localCheckpoint(false))
    }
    // the additive cells store is bounded by seedSpace * g, never by n
    assert(store.get.count() <= 1024L * 3)
    val folded = LocalDP.olhEstimate(store.get, dom, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(folded == oneShot, s"fold $folded != one-shot $oneShot")
  }

  test("heavy hitters: planted values discovered through the 2-round walk; contracts") {
    // 2000 units: 60% planted on three heavies with DISTINCT prefixes
    // (and ids chosen so the md5 group split sees all three in both
    // groups — the decorrelation the engine guarantees), rest spread
    val heavies = Seq("00aa", "3c11", "e7f2")
    val df = (1 to 2000).map { i =>
      val v = if (i % 10 < 6) heavies(i % 3)
        else f"${(i * 48271 + 7) % 65536}%04x"
      (i.toLong, v)
    }.toDF("uid", "v")
    val out = LocalDP.ldpHeavyHitters(df, "uid", col("v"), hexLen = 4,
        epsilon = 4.0, noise = graft.core.NoiseSource.Zero, k = 6,
        rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(heavies.forall(out.contains),
      s"planted not all discovered: ${out.keySet} vs $heavies")
    // the planted separate cleanly from whatever noise-floor values fill
    // the remaining slots
    val floor = (out.keySet -- heavies).map(out).maxOption.getOrElse(0.0)
    heavies.foreach { h =>
      assert(out(h) > floor, s"$h est ${out(h)} <= noise floor $floor") }
    // REAL randomizer at the same eps: statistical discovery still works
    // at this n (collision sd ~ sqrt(n/2/55)/0.485 ~ 9 vs signal ~ 400)
    val real = LocalDP.ldpHeavyHitters(df, "uid", col("v"), hexLen = 4,
        epsilon = 4.0, noise = graft.core.NoiseSource.Seeded(17L), k = 6,
        rounds = 2)
      .collect().map(_.getString(0)).toSet
    assert(heavies.count(real.contains) >= 2,
      s"real-noise discovery lost the heavies: $real")
    // contracts
    val e = intercept[Exception](LocalDP.ldpHeavyHitters(
      Seq((1L, "XYZ!")).toDF("uid", "v"), "uid", col("v"), 4, 4.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e).contains("lowercase-hex"))
    intercept[IllegalArgumentException](LocalDP.ldpHeavyHitters(df, "uid",
      col("v"), hexLen = 4, epsilon = 4.0,
      noise = graft.core.NoiseSource.Zero, rounds = 3)) // 3 !| 4
    intercept[IllegalArgumentException](LocalDP.ldpHeavyHitters(df, "uid",
      col("v"), hexLen = 16, epsilon = 4.0,
      noise = graft.core.NoiseSource.Zero))
  }

  test("ldpVariance: consistent at large n under the real randomizer; domain contract") {
    // 40000 units split 200/800 in [0, 1000]: true mean 500, true
    // m2 = 340000, true var = 90000. eps = 2 -> per-bit t at eps/2 =
    // (e - 1)/(e + 1) ~ 0.462; est_mean sd ~ (500/t)/sqrt(n) ~ 5.4,
    // m2 sd ~ 5400, plug-in var sd ~ 7700 — assert 5 sigma
    val n = 40000
    val df = (1 to n).map(i =>
      (i.toLong, if (i % 2 == 0) 200.0 else 800.0)).toDF("uid", "v")
    val r = LocalDP.ldpVariance(df, "uid", col("v"), 0.0, 1000.0, 2.0,
      graft.core.NoiseSource.Seeded(41L)).collect().head
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - 500.0) < 30.0, s"mean ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 340000.0) < 28000.0,
      s"m2 ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 90000.0) < 40000.0,
      s"var ${r.getDouble(3)}")
    // negative-lo domains are rejected (v^2 normalization would not be
    // monotone); empty cohorts fail loud downstream as ldpMean does
    intercept[IllegalArgumentException](LocalDP.ldpVariance(df, "uid",
      col("v"), -1.0, 1000.0, 1.0, graft.core.NoiseSource.Zero))
    // NULL pid fails loud (the OLH convention): null pids collapse into
    // one window partition, merging distinct units into a single report
    val ePid = intercept[Exception](LocalDP.ldpVariance(
      Seq((null.asInstanceOf[java.lang.Long], 5.0)).toDF("uid", "v"),
      "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(ePid).contains("NULL privacy-unit"),
      SparkTestSession.chainMsg(ePid).take(300))
  }

  test("keyed OLH: per-key unbiased estimates, one report per unit across keys, NULL-key contract") {
    // public metadata key k0/k1/k2 (pid-derived), 3000 units each:
    // k0 all hold 'a', k1 all 'b', k2 an even mix — per-key estimates
    // must separate (eps = 1: per-key sd ~ 106, assert 5 sigma)
    val df = (1 to 9000).map { i =>
      val k = s"k${i % 3}"
      val v = i % 3 match {
        case 0 => "a"
        case 1 => "b"
        case _ => dom((i / 3) % 3)
      }
      (i.toLong, k, v)
    }.toDF("uid", "k", "v")
    val r = LocalDP.ldpFrequencyOLHByKey(df, "uid", col("k"), col("v"),
        dom, 1.0, graft.core.NoiseSource.Seeded(31L))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(4))).toMap
    assert(r.keySet.map(_._1) == Set("k0", "k1", "k2"))
    assert(r.values.forall(_._1 == 3000L)) // per-key n, not rows
    assert(math.abs(r(("k0", "a"))._2 - 3000.0) < 530.0, r(("k0", "a")))
    assert(math.abs(r(("k0", "b"))._2) < 530.0)
    assert(math.abs(r(("k1", "b"))._2 - 3000.0) < 530.0)
    assert(math.abs(r(("k2", "a"))._2 - 1000.0) < 530.0)
    // one report per unit ACROSS keys: a unit with rows under two keys
    // still reports once (the lowest (key, value) pair)
    val multi = df.unionByName(Seq((1L, "zz_later_key", "a"))
      .toDF("uid", "k", "v"))
    val n2 = LocalDP.ldpFrequencyOLHByKey(multi, "uid", col("k"),
        col("v"), dom, 1.0, graft.core.NoiseSource.Zero)
      .agg(sum(col("support"))).head() // supports bounded by n = 9000
    assert(LocalDP.ldpFrequencyOLHByKey(multi, "uid", col("k"), col("v"),
        dom, 1.0, graft.core.NoiseSource.Zero)
      .select(col("key")).distinct().count() == 3L,
      "the extra higher-sorting key must not receive unit 1's report")
    assert(n2 != null)
    // NULL key fails loud (public metadata contract)
    val e = intercept[Exception](LocalDP.ldpFrequencyOLHByKey(
      Seq((1L, null.asInstanceOf[String], "a")).toDF("uid", "k", "v"),
      "uid", col("k"), col("v"), dom, 1.0,
      graft.core.NoiseSource.Zero).collect())
    assert(SparkTestSession.chainMsg(e).contains("NULL group key"))
  }

  test("LDP range tree: central readouts consume it; real noise tracks the true CDF; contracts") {
    // 21000 units, values uniform-ish over [0, 1000): the released tree
    // must feed cdfFromTree/rangeQueries UNCHANGED (the central/local
    // bridge), and under the REAL randomizer the CDF must track the
    // truth within the CKS error envelope
    val n = 21000
    val df = (1 to n).map(i => (i.toLong, (i * 48271 % 1000).toDouble))
      .toDF("uid", "v")
    val tree = LocalDP.ldpRangeTree(df, "uid", col("v"), 0.0, 1000.0,
      bins = 64, epsilon = 4.0,
      noise = graft.core.NoiseSource.Seeded(23L)).localCheckpoint(true)
    assert(tree.count() == 127L) // the full dyadic universe
    // the CENTRAL CDF readout consumes the LOCAL release as-is
    val cdf = graft.spark.RangeTree.cdfFromTree(tree, Nil, 0.0, 1000.0,
        64, monotone = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cdf.size == 64)
    // per-level groups are ~n/7 = 3000 units; per-node estimator sd
    // after population scaling ~ 7 * sqrt(3000/55)/0.48 ~ 110; a prefix
    // reads <= 6 nodes -> sd ~ 270. assert within 5 sigma at three
    // probe points (true prefix = (bin+1)/64 * n, uniform values)
    Seq(15L, 31L, 47L).foreach { b =>
      val truth = (b + 1).toDouble / 64.0 * n
      assert(math.abs(cdf(b) - truth) < 1350.0,
        s"bin $b: cdf ${cdf(b)} vs truth $truth")
    }
    // monotone: the PAVA projection held
    (1L until 64L).foreach(b => assert(cdf(b) >= cdf(b - 1) - 1e-9))
    // the range readout consumes it too (bins 16..31 = the second
    // quarter, true count n/4)
    val rq = graft.spark.RangeTree.rangeQueries(tree, Nil,
      Seq((16L, 31L)), 64).collect().head.getDouble(3)
    assert(math.abs(rq - n / 4.0) < 1350.0, s"range count $rq")
    // and the QUANTILE readout: the LDP tree's median bin must sit near
    // bin 31/32 (uniform values) — every central consumer works
    val med = graft.spark.RangeTree.quantilesFromTree(tree, Nil, 0.0,
        1000.0, 64, Seq(0.5)).collect().head.getLong(1)
    assert(med >= 28L && med <= 35L, s"LDP median bin $med")
    // clamp convention: out-of-domain values land in the edge bins
    val clampTree = LocalDP.ldpRangeTree(
      (1 to 700).map(i => (i.toLong, if (i % 2 == 0) -50.0 else 2000.0))
        .toDF("uid", "v"),
      "uid", col("v"), 0.0, 1000.0, bins = 2, epsilon = 4.0,
      noise = graft.core.NoiseSource.Zero)
    val leaves = clampTree.filter(col("__lvl") === 0)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // both leaves see ~350 clamped units (estimates carry collision
    // noise; they must be far from 0 and 700)
    assert(leaves(0L) > 150 && leaves(1L) > 150,
      s"clamped edges missing mass: $leaves")
    // a level with no reporting units fails loud (3 units, 7 groups)
    val e = intercept[IllegalArgumentException](LocalDP.ldpRangeTree(
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("uid", "v"), "uid",
      col("v"), 0.0, 1000.0, bins = 64, epsilon = 4.0,
      noise = graft.core.NoiseSource.Zero))
    assert(e.getMessage.contains("dyadic levels have"), e.getMessage)
    // NULL value fails loud
    val e2 = intercept[Exception](LocalDP.ldpRangeTree(
      Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("uid", "v"),
      "uid", col("v"), 0.0, 1000.0, 64, 4.0,
      graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(e2).contains("NULL value"))
  }

  test("shuffled fleet accounting: PLD composition beats naive, recovers the single point, monotone") {
    // a daily OLH telemetry release: eps0 = 1 locally, 100k reports,
    // deltaEach = 1e-9 -> one release's amplified central point
    val epsAmp = LocalDP.shuffleAmplifiedEpsilon(1.0, 100000L, 1e-9)
    // n = 1 recovers the point (within the pessimistic grid's O(h) slack,
    // never BELOW it — the certified-upper-bound direction)
    val one = LocalDP.shuffledFleetEpsilon(1.0, 100000L, 1e-9, 1, 1e-6)
    assert(one >= epsAmp - 1e-12 && one <= epsAmp + 0.01,
      s"single-release fleet $one vs point $epsAmp")
    // 64 daily releases: the PLD total is FAR under naive 64x (advanced-
    // composition tightness — the treeCompositionEpsilon golden pattern)
    // and at least the single release
    // measured: 2.62 vs naive 4.63 (0.57x) at these parameters — also
    // beats the advanced-composition closed form (~3.4); the 0.65 bound
    // guards the tightness class without pinning the grid
    val fleet = LocalDP.shuffledFleetEpsilon(1.0, 100000L, 1e-9, 64, 1e-6)
    assert(fleet < 64 * epsAmp * 0.65,
      s"fleet 64x total $fleet not tight vs naive ${64 * epsAmp}")
    assert(fleet > epsAmp, s"fleet $fleet <= single $epsAmp")
    // monotone in the release count
    val fleet16 = LocalDP.shuffledFleetEpsilon(1.0, 100000L, 1e-9, 16, 1e-6)
    assert(fleet16 < fleet && fleet16 > epsAmp)
    // a totalDelta that cannot absorb the accumulated per-release delta
    // mass composes to infinity, never a silent finite number
    assert(LocalDP.shuffledFleetEpsilon(1.0, 100000L, 1e-3, 64, 1e-6)
      .isInfinity)
    intercept[IllegalArgumentException](
      LocalDP.shuffledFleetEpsilon(1.0, 100000L, 1e-9, 0, 1e-6))
  }

  test("longitudinal LDP: memoized reports reuse across collections; changed values redraw; fold == one-shot") {
    import org.apache.spark.sql.DataFrame
    val df = (1 to 90).map(i => (i.toLong, dom(i % 3))).toDF("uid", "v")
    // draw-counting source: the OLH randomizer calls uniform() at least
    // once per DRAW; a reused memo calls it zero times. The draw runs in
    // an EXECUTOR task (unlike the tree family's driver-side draws), so
    // the count must cross the closure-serialization boundary — a plain
    // AtomicLong would increment a per-task copy; an accumulator folds
    // back to the driver
    val acc = spark.sparkContext.longAccumulator("ldp_longitudinal_draws")
    class AccCountingUniform extends graft.core.NoiseSource with Serializable {
      def laplace(b: Double): Double = 0.0
      def gaussian(sigma: Double): Double = 0.0
      def uniform(): Double = { acc.add(1L); 0.5 }
    }
    val CountingUniform = new AccCountingUniform
    def counterGet: Long = acc.value
    var store: Option[DataFrame] = None
    var est: Map[String, Double] = Map.empty
    (1 to 3).foreach { _ =>
      val (e, grown) = LocalDP.ldpLongitudinalStep(df, store, "uid",
        col("v"), dom, 1.0, CountingUniform)
      est = e.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      grown.count() // materialize the pinned store (draws final)
      store = Some(grown)
    }
    // REPORT REUSE: three collections of unchanged values drew exactly
    // once per (unit, value) — 90 draws (1 uniform call each at zero
    // noise: 0.5 < p takes the truthful branch), not 270
    assert(counterGet == 90L,
      s"draws across 3 collections = $counterGet, want 90 (memo reuse)")
    assert(store.get.count() == 90L)
    // fold == one-shot: the memoized (truthful) reports estimate exactly
    // the one-shot OLH release
    val oneShot = LocalDP.ldpFrequencyOLH(df, "uid", col("v"), dom, 1.0,
        graft.core.NoiseSource.Zero)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(est == oneShot, s"longitudinal $est != one-shot $oneShot")
    // a unit that CHANGES value draws a fresh report (a new ledger row);
    // unchanged units stay memoized
    val changed = (1 to 90).map(i =>
      (i.toLong, if (i == 7) dom((7 % 3 + 1) % 3) else dom(i % 3)))
      .toDF("uid", "v")
    val before = counterGet
    val (_, grown2) = LocalDP.ldpLongitudinalStep(changed, store, "uid",
      col("v"), dom, 1.0, CountingUniform)
    grown2.count()
    assert(counterGet == before + 1,
      s"changed-value collection drew ${counterGet - before}, want 1")
    assert(grown2.count() == 91L) // the ledger grew by the new pair
    // memoized reports are CALIBRATION-specific: resuming at another
    // epsilon (g = 8 vs the store's g = 3) fails loud, never silently
    // reuses wrong-bucket-space reports
    val e3 = intercept[IllegalArgumentException](
      LocalDP.ldpLongitudinalStep(df, Some(grown2), "uid", col("v"),
        dom, 2.0, CountingUniform))
    assert(e3.getMessage.contains("calibration-specific"), e3.getMessage)
    // closed-domain contract
    val e2 = intercept[Exception] {
      val (e, _) = LocalDP.ldpLongitudinalStep(
        Seq((1L, "zz")).toDF("uid", "v"), None, "uid", col("v"), dom,
        1.0, graft.core.NoiseSource.Zero)
      e.collect()
    }
    assert(SparkTestSession.chainMsg(e2).contains("outside the public domain"))
  }

  test("heavy hitters E2E: encode -> walk -> reverse lookup releases VALUES; collisions widen; contracts") {
    // open-domain words: 60% of 2000 units planted on 3 heavies, the
    // rest singletons — the telemetry shape the raw walk can only
    // answer in hashes
    val words = Seq("alpha", "beta", "gamma")
    val df = (1 to 2000).map { i =>
      (i.toLong, if (i % 10 < 6) words(i % 3) else s"rare_$i")
    }.toDF("uid", "w")
    // a catalog value engineered to COLLIDE with alpha's 4-char md5
    // prefix: the reverse lookup must surface BOTH candidates on the
    // shared hot hash (widen, never lose)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val target = md5hex("alpha").substring(0, 4)
    val collider = Iterator.from(0).map(i => s"collide_$i")
      .find(c => md5hex(c).substring(0, 4) == target).get
    val catalog = df.select(col("w"))
      .unionByName(Seq(collider).toDF("w")).distinct()
    val out = LocalDP.ldpHeavyHittersE2e(df, "uid", col("w"), catalog,
        "w", hexLen = 4, epsilon = 4.0,
        noise = graft.core.NoiseSource.Zero, k = 6, rounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val values = out.map(_._1)
    assert(words.forall(values.contains),
      s"planted values not all released: $values")
    // the collision widened alpha's hash into two candidate rows
    assert(values.contains(collider),
      s"collider $collider (hash $target) missing from $values")
    assert(out.filter(_._2 == target).map(_._1) == Set("alpha", collider))
    // contracts: the encode helper enforces the overflow-safe cap
    intercept[IllegalArgumentException](LocalDP.hexEncodeValue(col("w"), 11))
    intercept[IllegalArgumentException](LocalDP.hexEncodeValue(col("w"), 0))
  }

  test("real randomizer: the debiased estimate is unbiased within 5 sigma") {
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, "a")).toDF("uid", "v")
    val r = LocalDP.ldpFrequency(df, "uid", col("v"), dom, 1.0,
      graft.core.NoiseSource.Seeded(7L))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    // per-bit report variance <= p(1-p) at eps=1; sigma of est ~
    // sqrt(n p (1-p)) / (p - q) ~ 280 — assert within 5 sigma
    assert(math.abs(r("a") - n) < 1500.0, s"est_a = ${r("a")}")
    assert(math.abs(r("b")) < 1500.0 && math.abs(r("c")) < 1500.0,
      s"b=${r("b")} c=${r("c")}")
  }

  test("streaming LDP tree fold: cells are additive; fold == one-shot; state stays calibration-shaped") {
    val n = 2100
    val df = (1 to n).map(i => (i.toLong, (i.toLong * 48271 % 1000).toDouble))
      .toDF("uid", "v")
    // three unit-partitioned batches (the bounding contract)
    val batches = Seq(0L, 1L, 2L).map(r =>
      df.filter(pmod(col("uid"), lit(3L)) === r))
    var store: Option[org.apache.spark.sql.DataFrame] = None
    batches.foreach { b =>
      store = Some(LocalDP.ldpTreeIngestStep(b, store, "uid", col("v"),
        0.0, 1000.0, bins = 16, epsilon = 1.0,
        noise = graft.core.NoiseSource.Zero).localCheckpoint(false))
    }
    val folded = LocalDP.ldpTreeEstimate(store.get, 16, 1.0)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = LocalDP.ldpRangeTree(df, "uid", col("v"), 0.0, 1000.0,
        16, 1.0, graft.core.NoiseSource.Zero)
      .collect().map(_.toString).sorted.toSeq
    assert(folded == oneShot, "3-batch fold != one-shot LDP tree")
    // the store is calibration-shaped, never data-shaped:
    // <= nLevels * seedSpace * g = 5 * 1024 * 3 rows
    assert(store.get.count() <= 5L * 1024 * 3)
    // the central readout consumes the folded release too
    val cdf = graft.spark.RangeTree.cdfFromTree(
      LocalDP.ldpTreeEstimate(store.get, 16, 1.0), Nil, 0.0, 1000.0, 16,
      monotone = true)
    assert(cdf.count() == 16L)
    // r19: the calibration contract is ENFORCED, not doc-only — folding
    // or estimating a store at a different epsilon/bins/seedSpace fails
    // loud via the __eps/__bins/__sspace tags
    val eFold = intercept[IllegalArgumentException](
      LocalDP.ldpTreeIngestStep(batches.head, store, "uid", col("v"),
        0.0, 1000.0, bins = 16, epsilon = 2.0,
        noise = graft.core.NoiseSource.Zero))
    assert(eFold.getMessage.contains("calibration must stay fixed"))
    val eBins = intercept[IllegalArgumentException](
      LocalDP.ldpTreeEstimate(store.get, 32, 1.0))
    assert(eBins.getMessage.contains("calibration must stay fixed"))
    // an untagged (pre-r19) store is rejected with a rebuild message
    val eTag = intercept[IllegalArgumentException](
      LocalDP.ldpTreeEstimate(
        store.get.drop("__eps", "__bins", "__sspace"), 16, 1.0))
    assert(eTag.getMessage.contains("no calibration tags"))
  }

  test("keyed LDP range tree: per-key CDFs through the central keyed readout; contracts") {
    // 30000 units split across two public keys with DIFFERENT value
    // distributions: key A uniform over [0, 1000), key B concentrated
    // in [0, 250). The central keyed CDF readout must consume the
    // release unchanged and separate the two distributions.
    val n = 30000
    val df = (1 to n).map { i =>
      val k = if (i % 2 == 0) "A" else "B"
      val v = if (k == "A") (i.toLong * 48271 % 1000).toDouble
              else (i.toLong * 48271 % 250).toDouble
      (i.toLong, k, v)
    }.toDF("uid", "k", "v")
    val tree = LocalDP.ldpRangeTreeByKey(df, "uid", col("k"), col("v"),
        0.0, 1000.0, bins = 16, epsilon = 4.0,
        noise = graft.core.NoiseSource.Seeded(43L))
      .localCheckpoint(true)
    assert(tree.count() == 62L) // 2 keys x (2*16 - 1)
    val cdf = graft.spark.RangeTree.cdfFromTree(tree, Seq("key"), 0.0,
        1000.0, 16, monotone = true)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("bin")) ->
        r.getAs[Double]("dp_cdf_count")).toMap
    assert(cdf.size == 32)
    // per-key groups ~ 15000/5 = 3000; node sd after scaling ~ 900;
    // a prefix reads <= 4 cover nodes — assert 5 sigma ~ 9000 at the
    // quarter point: A has ~25% of 15000 below 250, B has ~100%
    val aQuarter = cdf(("A", 3L)); val bQuarter = cdf(("B", 3L))
    assert(math.abs(aQuarter - 3750.0) < 9000.0, s"A cdf@4 = $aQuarter")
    assert(math.abs(bQuarter - 15000.0) < 9000.0, s"B cdf@4 = $bQuarter")
    // the distributions SEPARATE (the whole point of keying)
    assert(bQuarter > aQuarter + 5000.0,
      s"keys failed to separate: A $aQuarter vs B $bQuarter")
    // zero noise: deterministic release
    val z1 = LocalDP.ldpRangeTreeByKey(df, "uid", col("k"), col("v"),
        0.0, 1000.0, 16, 4.0, graft.core.NoiseSource.Zero)
      .collect().map(_.toString).sorted.toSeq
    val z2 = LocalDP.ldpRangeTreeByKey(df, "uid", col("k"), col("v"),
        0.0, 1000.0, 16, 4.0, graft.core.NoiseSource.Zero)
      .collect().map(_.toString).sorted.toSeq
    assert(z1 == z2)
    // a key whose cohort cannot field all levels fails loud NAMING it
    val skew = ((1 to 500).map(i => (i.toLong, "big", 10.0)) ++
      Seq((9001L, "tiny", 10.0))).toDF("uid", "k", "v")
    val e = intercept[IllegalArgumentException](LocalDP.ldpRangeTreeByKey(
      skew, "uid", col("k"), col("v"), 0.0, 1000.0, 16, 4.0,
      graft.core.NoiseSource.Zero))
    assert(e.getMessage.contains("tiny") &&
      e.getMessage.contains("fewer than"), e.getMessage)
    // NULL key fails loud (public-metadata contract)
    val eK = intercept[Exception](LocalDP.ldpRangeTreeByKey(
      Seq((1L, null.asInstanceOf[String], 10.0)).toDF("uid", "k", "v"),
      "uid", col("k"), col("v"), 0.0, 1000.0, 16, 4.0,
      graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(eK).contains("NULL group key"))
  }

  test("LDP 2-D product tree: central box readout consumes it; real noise tracks truth; contracts") {
    // 32000 units, x uniform over [0, 1000), y uniform over [0, 32):
    // the released frame must BE a product tree the central
    // range2DQueries consumes unchanged, and under the REAL randomizer
    // box counts must track the truth within the CKS envelope
    val n = 32000
    val df = (1 to n).map { i =>
      (i.toLong, (i.toLong * 48271 % 1000).toDouble, (i.toLong * 69621 % 32).toDouble)
    }.toDF("uid", "x", "y")
    val tree = LocalDP.ldpRange2DTree(df, "uid", col("x"), col("y"),
        0.0, 1000.0, 8, 0.0, 32.0, 8, epsilon = 4.0,
        noise = graft.core.NoiseSource.Seeded(29L))
      .localCheckpoint(true)
    assert(tree.count() == 225L) // (2*8-1)^2: the full product universe
    // the CENTRAL 2-D box readout consumes the LOCAL release as-is.
    // Per-group units ~ n/16 = 2000; per-node estimate sd ~
    // 16 * sqrt(2000 * p(1-p)) / (p - 1/g) ~ 740; the quarter box
    // (x bins 0-3, y bins 0-3) decomposes to ONE cover node — 5 sigma
    val boxes = Seq((0L, 3L, 0L, 3L), (0L, 7L, 0L, 7L), (2L, 5L, 1L, 6L))
    val reads = graft.spark.RangeTree.range2DQueries(tree, Nil, boxes,
        8, 8).collect()
      .map(r => (r.getLong(0), r.getDouble(5))).toMap
    // truths under the uniform-ish fixture (computed from the data)
    def truth(xlo: Long, xhi: Long, ylo: Long, yhi: Long): Double =
      (1 to n).count { i =>
        val bx = (i.toLong * 48271 % 1000) / 125
        val by = (i.toLong * 69621 % 32) / 4
        bx >= xlo && bx <= xhi && by >= ylo && by <= yhi
      }.toDouble
    boxes.zipWithIndex.foreach { case ((xl, xh, yl, yh), qid) =>
      val tr = truth(xl, xh, yl, yh)
      val cover = 4 // worst cover size among the probe boxes
      assert(math.abs(reads(qid.toLong) - tr) < 3700.0 * math.sqrt(cover),
        s"box $qid: read ${reads(qid.toLong)} vs truth $tr")
    }
    // zero noise: the release is deterministic (two runs hash-equal)
    val z1 = LocalDP.ldpRange2DTree(df, "uid", col("x"), col("y"),
        0.0, 1000.0, 8, 0.0, 32.0, 8, 4.0, graft.core.NoiseSource.Zero)
      .collect().map(_.toString).sorted.toSeq
    val z2 = LocalDP.ldpRange2DTree(df, "uid", col("x"), col("y"),
        0.0, 1000.0, 8, 0.0, 32.0, 8, 4.0, graft.core.NoiseSource.Zero)
      .collect().map(_.toString).sorted.toSeq
    assert(z1 == z2, "zero-noise 2-D release is not deterministic")
    // a level-pair group with no reporting units fails loud
    // (3 units cannot field 16 groups)
    val e = intercept[IllegalArgumentException](LocalDP.ldpRange2DTree(
      Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0))
        .toDF("uid", "x", "y"),
      "uid", col("x"), col("y"), 0.0, 1000.0, 8, 0.0, 32.0, 8, 4.0,
      graft.core.NoiseSource.Zero))
    assert(e.getMessage.contains("level-pair groups"), e.getMessage)
    // NULL y fails loud; non-power-of-two bins rejected
    val e2 = intercept[Exception](LocalDP.ldpRange2DTree(
      Seq((1L, 1.0, null.asInstanceOf[java.lang.Double]))
        .toDF("uid", "x", "y"),
      "uid", col("x"), col("y"), 0.0, 1000.0, 8, 0.0, 32.0, 8, 4.0,
      graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(e2).contains("NULL y value"))
    intercept[IllegalArgumentException](LocalDP.ldpRange2DTree(df, "uid",
      col("x"), col("y"), 0.0, 1000.0, 12, 0.0, 32.0, 8, 4.0,
      graft.core.NoiseSource.Zero))
  }

  test("LDP tree + Hay consistency: the central sweep never worsens leaf error on the LDP release") {
    // the r18 bridge closure: ldpRangeTree's per-level estimates come
    // from DISJOINT unit groups, so the released tree is inconsistent
    // even at zero noise — the central enforceConsistency is pure
    // post-processing that pools the levels. Seeded real-noise run:
    // total squared leaf error must not increase (Hay OLS; empirical,
    // deterministic under the fixed seed).
    val n = 21000
    val df = (1 to n).map(i => (i.toLong, (i * 48271 % 1000).toDouble))
      .toDF("uid", "v")
    val tree = LocalDP.ldpRangeTree(df, "uid", col("v"), 0.0, 1000.0,
        bins = 64, epsilon = 4.0,
        noise = graft.core.NoiseSource.Seeded(31L))
      .localCheckpoint(true)
    val truth = Array.fill(64)(0.0)
    (1 to n).foreach(i => truth((i * 48271 % 1000) / 16) += 1.0)
    def leafSqErr(t: org.apache.spark.sql.DataFrame): Double =
      t.filter(col("__lvl") === 0).collect()
        .map(r => math.pow(r.getDouble(2) - truth(r.getLong(1).toInt), 2))
        .sum
    val before = leafSqErr(tree)
    val after = leafSqErr(
      graft.spark.RangeTree.enforceConsistency(tree, Nil, 64))
    assert(after <= before * (1.0 + 1e-9),
      s"consistency worsened LDP leaf error: $before -> $after")
    // and it genuinely pools information (strict improvement here)
    assert(after < before,
      s"consistency was a no-op on the LDP tree: $before -> $after")
    // the 2-D bridge too: the alternating product sweep over the LDP
    // product tree (same schema as dpRange2DTree by construction)
    val n2 = 32000
    val df2 = (1 to n2).map { i =>
      (i.toLong, (i.toLong * 48271 % 1000).toDouble, (i.toLong * 69621 % 32).toDouble)
    }.toDF("uid", "x", "y")
    val tree2 = LocalDP.ldpRange2DTree(df2, "uid", col("x"), col("y"),
        0.0, 1000.0, 8, 0.0, 32.0, 8, epsilon = 4.0,
        noise = graft.core.NoiseSource.Seeded(37L))
      .localCheckpoint(true)
    val truth2 = Array.fill(8, 8)(0.0)
    (1 to n2).foreach(i =>
      truth2(((i.toLong * 48271 % 1000) / 125).toInt)(((i.toLong * 69621 % 32) / 4).toInt) += 1.0)
    def cellSqErr(t: org.apache.spark.sql.DataFrame): Double =
      t.filter(col("__lvx") === 0 && col("__lvy") === 0).collect()
        .map(r => math.pow(r.getDouble(4) -
          truth2(r.getLong(1).toInt)(r.getLong(3).toInt), 2)).sum
    val before2 = cellSqErr(tree2)
    val after2 = cellSqErr(graft.spark.RangeTree.enforce2DConsistency(
      tree2, Nil, 8, 8))
    assert(after2 <= before2 * (1.0 + 1e-9) && after2 < before2,
      s"2-D consistency on the LDP product tree: $before2 -> $after2")
  }

  test("longitudinal numeric LDP: bits memoize across collections; fold == one-shot; contracts") {
    import org.apache.spark.sql.DataFrame
    val df = (1 to 90).map(i => (i.toLong, (i * 11 % 1000).toDouble))
      .toDF("uid", "v")
    val acc = spark.sparkContext.longAccumulator("ldp_long_mean_draws")
    class AccCountingUniform extends graft.core.NoiseSource with Serializable {
      def laplace(b: Double): Double = 0.0
      def gaussian(sigma: Double): Double = 0.0
      def uniform(): Double = { acc.add(1L); 0.5 }
    }
    val CountingUniform = new AccCountingUniform
    var store: Option[DataFrame] = None
    var est: org.apache.spark.sql.Row = null
    (1 to 3).foreach { _ =>
      val (e, grown) = LocalDP.ldpLongitudinalMeanStep(df, store, "uid",
        col("v"), 0.0, 1000.0, 1.0, CountingUniform)
      est = e.collect().head
      grown.count() // materialize the pinned store (draws final)
      store = Some(grown)
    }
    // BIT REUSE: three collections drew one uniform per (unit, value) —
    // 90, not 270
    assert(acc.value == 90L,
      s"draws across 3 collections = ${acc.value}, want 90 (memo reuse)")
    assert(store.get.count() == 90L)
    // fold == one-shot at the same (deterministic sign) bits
    val oneShot = LocalDP.ldpMean(df, "uid", col("v"), 0.0, 1000.0, 1.0,
      graft.core.NoiseSource.Zero).collect().head
    assert(est == oneShot, s"longitudinal $est != one-shot $oneShot")
    // a CHANGED value draws a fresh bit; the ledger grows by one pair
    val changed = (1 to 90).map(i =>
      (i.toLong, if (i == 7) 999.0 else (i * 11 % 1000).toDouble))
      .toDF("uid", "v")
    val before = acc.value
    val (_, grown2) = LocalDP.ldpLongitudinalMeanStep(changed, store,
      "uid", col("v"), 0.0, 1000.0, 1.0, CountingUniform)
    grown2.count()
    assert(acc.value == before + 1,
      s"changed-value collection drew ${acc.value - before}, want 1")
    assert(grown2.count() == 91L)
    // calibration lock: resuming at another epsilon fails loud
    val e3 = intercept[IllegalArgumentException](
      LocalDP.ldpLongitudinalMeanStep(df, Some(grown2), "uid", col("v"),
        0.0, 1000.0, 2.0, CountingUniform))
    assert(e3.getMessage.contains("epsilon must stay fixed"), e3.getMessage)
    // the VARIANCE arm: same ledger, TWO bits per (unit, value)
    val acc2 = spark.sparkContext.longAccumulator("ldp_long_var_draws")
    class AccCountingUniform2 extends graft.core.NoiseSource with Serializable {
      def laplace(b: Double): Double = 0.0
      def gaussian(sigma: Double): Double = 0.0
      def uniform(): Double = { acc2.add(1L); 0.5 }
    }
    val Counting2 = new AccCountingUniform2
    var storeV: Option[DataFrame] = None
    var estV: org.apache.spark.sql.Row = null
    (1 to 3).foreach { _ =>
      val (e, grown) = LocalDP.ldpLongitudinalVarianceStep(df, storeV,
        "uid", col("v"), 0.0, 1000.0, 1.0, Counting2)
      estV = e.collect().head
      grown.count()
      storeV = Some(grown)
    }
    assert(acc2.value == 180L,
      s"variance draws = ${acc2.value}, want 180 (two bits x 90 pairs)")
    val oneShotV = LocalDP.ldpVariance(df, "uid", col("v"), 0.0, 1000.0,
      1.0, graft.core.NoiseSource.Zero).collect().head
    assert(estV == oneShotV, s"longitudinal $estV != one-shot $oneShotV")
    // NULL value fails loud
    val eN = intercept[Exception] {
      val (e, _) = LocalDP.ldpLongitudinalMeanStep(
        Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("uid", "v"),
        None, "uid", col("v"), 0.0, 1000.0, 1.0,
        graft.core.NoiseSource.Zero)
      e.collect()
    }
    assert(SparkTestSession.chainMsg(eN).contains("NULL value"))
  }
}
