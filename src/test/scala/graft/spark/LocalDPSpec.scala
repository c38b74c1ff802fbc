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
}
