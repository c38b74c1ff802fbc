package graft.spark

import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivateApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def fixture = Seq(
    ("u1", "pk1", 1.0), ("u1", "pk1", 2.0), ("u1", "pk2", 4.0),
    ("u2", "pk1", 5.0), ("u2", "pk1", 6.0),
    ("u3", "pk2", 7.0), ("u3", "pk2", 8.0)
  ).toDF("pid", "pk", "v")

  test("one accountant governs several aggregations; budgets split") {
    val acc = new NaiveBudgetAccountant(1e5, 0.9999)
    val p = PrivateDataFrame(fixture, col("pid"), acc, NoiseSource.Zero)
    val params = PrivateAggParams(Seq("pk" -> col("pk")),
      maxPartitionsContributed = 5, maxContributionsPerPartition = Some(10),
      minValue = Some(0.0), maxValue = Some(100.0))
    val counts = p.count(params)
    val sums = p.sum(col("v"), params)
    acc.computeBudgets()
    val c = counts.dataframe.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val s = sums.dataframe.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(c == Map("pk1" -> 4.0, "pk2" -> 3.0))
    assert(s == Map("pk1" -> 14.0, "pk2" -> 19.0))
  }

  test("map re-keys payload but keeps the privacy unit") {
    val acc = new NaiveBudgetAccountant(1e5, 0.9999)
    val p = PrivateDataFrame(fixture, col("pid"), acc, NoiseSource.Zero)
      .map("pk2" -> concat(col("pk"), lit("_x")), "v2" -> (col("v") * 2))
    val res = p.sum(col("v2"), PrivateAggParams(Seq("pk2" -> col("pk2")),
      maxPartitionsContributed = 5, maxContributionsPerPartition = Some(10),
      minValue = Some(0.0), maxValue = Some(100.0)))
    acc.computeBudgets()
    val out = res.dataframe.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("pk1_x" -> 28.0, "pk2_x" -> 38.0))
  }

  test("filter reduces contributions only") {
    val acc = new NaiveBudgetAccountant(1e5, 0.9999)
    val p = PrivateDataFrame(fixture, col("pid"), acc, NoiseSource.Zero)
      .filter(col("v") >= 5.0)
    val res = p.count(PrivateAggParams(Seq("pk" -> col("pk")),
      maxPartitionsContributed = 5, maxContributionsPerPartition = Some(10)))
    acc.computeBudgets()
    val out = res.dataframe.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("pk1" -> 2.0, "pk2" -> 2.0))
  }

  test("explain report names mechanisms and selection") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    val engine = new DPEngine(acc, NoiseSource.Zero)
    val res = engine.aggregate(fixture,
      AggregateParams(metrics = Seq(Metric.Count, Metric.Sum),
        noiseKind = NoiseKind.Gaussian,
        maxPartitionsContributed = 2, maxContributionsPerPartition = Some(3),
        minValue = Some(0.0), maxValue = Some(10.0)),
      DPColumns("pid", "pk", "v"))
    acc.computeBudgets()
    val report = res.explainReport
    assert(report.contains("Contribution bounding"))
    assert(report.contains("Partition selection"))
    assert(report.contains("Gaussian mechanism"))
    assert(report.contains("DP count"))
    assert(report.contains("DP sum"))
  }

  test("post-aggregation thresholding outputs noised pid count and drops sparse") {
    val acc = new NaiveBudgetAccountant(1e5, 0.5)
    val engine = new DPEngine(acc, NoiseSource.Zero)
    val res = engine.aggregate(fixture,
      AggregateParams(metrics = Seq(Metric.PrivacyIdCount),
        maxPartitionsContributed = 5,
        postAggregationThresholding = true),
      DPColumns("pid", "pk", "v"))
    acc.computeBudgets()
    val out = res.dataframe.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // zero noise: noised pid count == exact; threshold ~ 1 + b*ln(1/(2*deltaAdj))
    // with huge eps b -> 0 => threshold ~ 1 => both partitions (2 users) kept
    assert(out == Map("pk1" -> 2.0, "pk2" -> 2.0))
  }

  test("weighted gaussian selection keeps dense partitions") {
    val rows = (1 to 200).flatMap(i => Seq((s"u$i", "dense", 1.0))) ++
      Seq(("u1", "sparse", 1.0))
    val acc = new NaiveBudgetAccountant(10.0, 1e-6)
    val engine = new DPEngine(acc, NoiseSource.Seeded(5))
    val res = engine.selectPartitions(rows.toDF("pid", "pk", "v"),
      SelectPartitionsParams(maxPartitionsContributed = 2,
        strategy = PartitionSelectionStrategyKind.WeightedGaussianThresholding),
      DPColumns(col("pid"), Seq("pk" -> col("pk"))))
    acc.computeBudgets()
    val kept = res.dataframe.collect().map(_.getString(0)).toSet
    assert(kept.contains("dense"))
    assert(!kept.contains("sparse"))
  }

  test("setUnion on the public API releases the common vocabulary (r19)") {
    val rows = (1 to 400).map(i => (s"u$i", "common")) ++
      Seq(("u1", "secret"))
    val acc = new NaiveBudgetAccountant(2.0, 1e-6)
    val pdf = PrivateDataFrame(rows.toDF("pid", "item"), col("pid"), acc,
      NoiseSource.Zero)
    val res = pdf.setUnion(col("item"), maxItemsPerUnit = 4)
    acc.computeBudgets()
    val out = res.dataframe.collect().map(_.getString(0)).toSet
    assert(out == Set("common"), s"got $out")
    assert(res.explainReport.contains("setUnion"))
  }
}
