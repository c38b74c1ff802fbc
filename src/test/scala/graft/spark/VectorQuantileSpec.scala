package graft.spark

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class VectorQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def zeroEngine() = new DPEngine(new NaiveBudgetAccountant(1e5, 0.999999), NoiseSource.Zero)

  test("dp vector sum, zero noise, Linf clip not binding = exact elementwise sum") {
    val df = Seq(
      ("u1", "a", Array(1.0, 2.0)), ("u1", "a", Array(3.0, 4.0)),
      ("u2", "a", Array(10.0, 20.0)),
      ("u2", "b", Array(5.0, 5.0))
    ).toDF("pid", "pk", "vec")
    val engine = zeroEngine()
    val params = AggregateParams(metrics = Seq(Metric.VectorSum, Metric.PrivacyIdCount),
      maxPartitionsContributed = 2, maxContributionsPerPartition = Some(10),
      vectorNormKind = NormKind.Linf, vectorMaxNorm = 1000.0, vectorSize = 2)
    val res = engine.aggregate(df, params,
      DPColumns(org.apache.spark.sql.functions.col("pid"),
        Seq("pk" -> org.apache.spark.sql.functions.col("pk")),
        Some(org.apache.spark.sql.functions.col("vec"))))
    engine.accountant.computeBudgets()
    val rows = res.dataframe.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getSeq[Double](2))).toMap
    assert(rows("a")._1 == 2.0) // pid count
    assert(rows("a")._2 == Seq(14.0, 26.0))
    assert(rows("b")._2 == Seq(5.0, 5.0))
  }

  test("vector sum under a PLD accountant draws finite calibrated noise") {
    // the noiser read spec.epsilon directly, but PLD-resolved additive
    // specs carry (eps = 0, noiseStdDev = Some(std)): the Laplace vector
    // path released with b = sensitivity/0 = INFINITE noise — every
    // coordinate +-Infinity — and Gaussian crashed in calibration
    val df = Seq(("u1", "a", Array(1.0, 2.0)), ("u2", "a", Array(3.0, 4.0)))
      .toDF("pid", "pk", "vec")
    val engine = new DPEngine(new PLDBudgetAccountant(1.0, 1e-6),
      NoiseSource.Seeded(7L))
    val params = AggregateParams(metrics = Seq(Metric.VectorSum),
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(10),
      vectorNormKind = NormKind.L1, vectorMaxNorm = 100.0, vectorSize = 2)
    val res = engine.aggregate(df, params,
      DPColumns(org.apache.spark.sql.functions.col("pid"),
        Seq("pk" -> org.apache.spark.sql.functions.col("pk")),
        Some(org.apache.spark.sql.functions.col("vec"))),
      Some(Seq("a").toDF("pk")))
    engine.accountant.computeBudgets()
    val v = res.dataframe.collect().head.getSeq[Double](1)
    assert(v.forall(x => !x.isInfinite && !x.isNaN),
      s"PLD-resolved vector noise must be finite, got $v")
    // and it IS noisy (std ~ 141 per coordinate at eps=1, sens=100)
    assert(v != Seq(4.0, 6.0), "expected noise, got the exact sums")
  }

  test("L2 norm clipping rescales each user's per-partition vector") {
    // two users, each contributing one norm-5 vector
    val df = Seq(("u1", "a", Array(3.0, 4.0)), ("u2", "a", Array(3.0, 4.0)))
      .toDF("pid", "pk", "vec")
    val engine = zeroEngine()
    val params = AggregateParams(metrics = Seq(Metric.VectorSum),
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(10),
      noiseKind = NoiseKind.Gaussian,
      vectorNormKind = NormKind.L2, vectorMaxNorm = 1.0, vectorSize = 2)
    val res = engine.aggregate(df, params,
      DPColumns(org.apache.spark.sql.functions.col("pid"),
        Seq("pk" -> org.apache.spark.sql.functions.col("pk")),
        Some(org.apache.spark.sql.functions.col("vec"))))
    engine.accountant.computeBudgets()
    val vec = res.dataframe.collect().head.getSeq[Double](1)
    assert(math.abs(vec(0) - 1.2) < 1e-9 && math.abs(vec(1) - 1.6) < 1e-9)
  }

  test("dp percentiles, zero noise, approximate the true quantiles") {
    val rows = (1 to 2000).map(i => (s"u${i % 50}", "all", i / 20.0)) // values 0.05..100
    val df = rows.toDF("pid", "pk", "v")
    val engine = zeroEngine()
    val params = AggregateParams(
      metrics = Seq(Metric.Percentile(10), Metric.Percentile(50), Metric.Percentile(90)),
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(100),
      minValue = Some(0.0), maxValue = Some(100.0))
    val res = engine.aggregate(df, params, DPColumns("pid", "pk", "v"))
    engine.accountant.computeBudgets()
    val out = res.dataframe.collect().head
    assert(res.dataframe.columns.toSeq ==
      Seq("pk", "percentile_10", "percentile_50", "percentile_90"))
    assert(math.abs(out.getDouble(1) - 10.0) < 1.0, s"p10=${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - 50.0) < 1.0, s"p50=${out.getDouble(2)}")
    assert(math.abs(out.getDouble(3) - 90.0) < 1.0, s"p90=${out.getDouble(3)}")
  }

  test("percentiles combine with mean/count in one query") {
    val df = Seq(("u1", "a", 1.0), ("u2", "a", 2.0), ("u3", "a", 3.0)).toDF("pid", "pk", "v")
    val engine = zeroEngine()
    val params = AggregateParams(
      metrics = Seq(Metric.Count, Metric.Mean, Metric.Percentile(50)),
      maxPartitionsContributed = 1, maxContributionsPerPartition = Some(10),
      minValue = Some(0.0), maxValue = Some(4.0))
    val res = engine.aggregate(df, params, DPColumns("pid", "pk", "v"))
    engine.accountant.computeBudgets()
    val out = res.dataframe.collect().head
    val cols = res.dataframe.columns.toSeq
    assert(cols == Seq("pk", "mean", "count", "percentile_50"))
    assert(math.abs(out.getDouble(1) - 2.0) < 1e-9)
    assert(out.getDouble(2) == 3.0)
  }
}
