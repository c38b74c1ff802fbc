package graft.analysis

import graft.core._
import graft.spark.{DPColumns, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PoissonBinomialSpec extends AnyFunSuite {

  private def assertSeqAlmost(got: Seq[Double], want: Seq[Double], tol: Double = 1e-9): Unit = {
    assert(got.length == want.length, s"length ${got.length} != ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) <= tol, s"$g != $w") }
  }

  test("exact pmf matches reference cases") {
    // (reference: analysis/tests/poisson_binomial_test.py:26-33)
    assertSeqAlmost(PoissonBinomial.computePmf(Nil).probabilities.toSeq, Seq(1.0))
    assertSeqAlmost(PoissonBinomial.computePmf(Seq(1.0)).probabilities.toSeq, Seq(0.0, 1.0))
    assertSeqAlmost(PoissonBinomial.computePmf(Seq(0.5, 0.5, 0.5, 0.5)).probabilities.toSeq,
      Seq(0.0625, 0.25, 0.375, 0.25, 0.0625))
    assertSeqAlmost(PoissonBinomial.computePmf(Seq(0.1, 0.2, 0.3)).probabilities.toSeq,
      Seq(0.504, 0.398, 0.092, 0.006))
    assertSeqAlmost(PoissonBinomial.computePmf(Seq.fill(10)(0.2)).probabilities.toSeq,
      Seq(0.107374182, 2.68435456e-01, 3.01989888e-01, 2.01326592e-01, 8.80803840e-02,
        2.64241152e-02, 5.50502400e-03, 7.86432000e-04, 7.37280000e-05, 4.09600000e-06,
        1.02400000e-07))
  }

  test("moments match reference case") {
    // (reference: analysis/tests/per_partition_combiners_test.py:131-137)
    val (c, e, v, m3) = PoissonBinomial.moments(Seq(0.1, 0.5, 0.5, 0.2))
    assert(c == 4)
    assert(math.abs(e - 1.3) < 1e-12)
    assert(math.abs(v - 0.75) < 1e-12)
    assert(math.abs(m3 - 0.168) < 1e-12)
  }

  test("refined normal approximation is close to exact pmf") {
    // (reference: analysis/tests/poisson_binomial_test.py:46-60)
    for ((probs, tol) <- Seq(
        (Seq.fill(20)(0.5), 1e-3),
        (Seq.fill(100)(0.3), 2e-4),
        ((0 until 50).map(i => 0.1 + 0.8 * i / 49.0), 2e-4))) {
      val exact = PoissonBinomial.computePmf(probs).probabilities
      val (n, ex, vr, m3) = PoissonBinomial.moments(probs)
      val std = math.sqrt(vr)
      val approx = PoissonBinomial.computePmfApproximation(ex, std, m3 / (std * std * std), n)
      approx.probabilities.zipWithIndex.foreach { case (p, i) =>
        val j = approx.start + i
        if (j < exact.length)
          assert(math.abs(p - exact(j)) <= tol, s"i=$j approx=$p exact=${exact(j)}")
      }
    }
  }
}

class UtilityAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eventsDf(rows: Seq[(String, String, Double)]) =
    rows.toDF("uid", "pk", "v")

  private val roles = DPColumns(col("uid"), Seq("pk" -> col("pk")), Some(col("v")))

  test("count error moments match the reference combiner case") {
    // One privacy id contributes 4 rows to partition A and also touches
    // B, C, D (n_partitions=4); l0=1, linf=2, Gaussian eps=1 delta=1e-5.
    // Expected (reference: per_partition_combiners_test.py:90-103):
    // sum=4, clip_max=-2, exp_l0=-1.5, std_l0=sqrt(0.75), std_noise~7.46484
    val df = eventsDf(Seq.tabulate(4)(i => ("u1", "A", 1.0 * i)) ++
      Seq(("u1", "B", 0.0), ("u1", "C", 0.0), ("u1", "D", 0.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 1e-5, metrics = Seq(Metric.Count),
      configs = Seq(UtilityAnalysisConfig(
        maxPartitionsContributed = 1, maxContributionsPerPartition = 2,
        noiseKind = NoiseKind.Gaussian)),
      publicPartitions = true)
    val pub = Seq("A", "B", "C", "D").toDF("pk")
    val (_, per) = UtilityAnalysis.analyze(df, roles, opts, Some(pub))
    val a = per.filter(col("pk") === "A").collect().head
    assert(a.getAs[Double]("count_sum") == 4.0)
    assert(a.getAs[Double]("count_clip_min_err") == 0.0)
    assert(a.getAs[Double]("count_clip_max_err") == -2.0)
    assert(a.getAs[Double]("count_exp_l0_err") == -1.5)
    assert(math.abs(a.getAs[Double]("count_std_l0_err") - math.sqrt(0.75)) < 1e-12)
    assert(math.abs(a.getAs[Double]("count_noise_std") - 7.46484375) < 0.01)
    assert(a.getAs[Double]("keep_prob") == 1.0)
    assert(a.getAs[Long]("raw_privacy_id_count") == 1L)
    assert(a.getAs[Long]("raw_count") == 4L)
  }

  test("sum error moments: clipping to min and max") {
    // u1 contributes sum 10 to A (> max 5 -> clip err -5), u2 sum -2 (< min
    // 0 -> clip err +2); both touch only A so no l0 error.
    val df = eventsDf(Seq(("u1", "A", 10.0), ("u2", "A", -2.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 0.0, metrics = Seq(Metric.Sum),
      configs = Seq(UtilityAnalysisConfig(
        maxPartitionsContributed = 1, minSumPerPartition = 0.0, maxSumPerPartition = 5.0)),
      publicPartitions = true)
    val pub = Seq("A").toDF("pk")
    val (_, per) = UtilityAnalysis.analyze(df, roles, opts, Some(pub))
    val a = per.collect().head
    assert(a.getAs[Double]("sum_sum") == 8.0)
    assert(a.getAs[Double]("sum_clip_min_err") == 2.0)
    assert(a.getAs[Double]("sum_clip_max_err") == -5.0)
    assert(a.getAs[Double]("sum_exp_l0_err") == 0.0)
    // Laplace std = sqrt(2) * l1 / eps = sqrt(2) * 5
    assert(math.abs(a.getAs[Double]("sum_noise_std") - math.sqrt(2.0) * 5.0) < 1e-12)
  }

  test("keep probability: degenerate (all contributors certain) equals strategy pmf") {
    // 3 users touch only partition A; l0=2 >= 1 partition each => prob 1 each
    // => P(keep) = strategy.probabilityOfKeep(3) exactly.
    val df = eventsDf(Seq(("u1", "A", 1.0), ("u2", "A", 1.0), ("u3", "A", 1.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 2.0, delta = 1e-4, metrics = Seq(Metric.PrivacyIdCount),
      configs = Seq(UtilityAnalysisConfig(maxPartitionsContributed = 2)))
    val (_, per) = UtilityAnalysis.analyze(df, roles, opts, None)
    val got = per.collect().head.getAs[Double]("keep_prob")
    // PS mechanism gets half the budget (equal split among 2 mechanisms)
    val strat = PartitionSelection.create(
      PartitionSelectionStrategyKind.TruncatedGeometric, 1.0, 5e-5, 2)
    assert(math.abs(got - strat.probabilityOfKeep(3)) < 1e-12)
  }

  test("keep probability: bernoulli mixture matches hand convolution") {
    // u1 touches A,B (prob 1/2 with l0=1); u2 touches only A (prob 1).
    // Contributor count in A: 1 w.p. 1/2, 2 w.p. 1/2.
    val df = eventsDf(Seq(("u1", "A", 1.0), ("u1", "B", 1.0), ("u2", "A", 1.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 2.0, delta = 1e-4, metrics = Seq(Metric.PrivacyIdCount),
      configs = Seq(UtilityAnalysisConfig(maxPartitionsContributed = 1)))
    val (_, per) = UtilityAnalysis.analyze(df, roles, opts, None)
    val got = per.filter(col("pk") === "A").collect().head.getAs[Double]("keep_prob")
    val strat = PartitionSelection.create(
      PartitionSelectionStrategyKind.TruncatedGeometric, 1.0, 5e-5, 1)
    val want = 0.5 * strat.probabilityOfKeep(1) + 0.5 * strat.probabilityOfKeep(2)
    assert(math.abs(got - want) < 1e-12)
  }

  test("keep probability: moments path approximates exact for many contributors") {
    // 150 users, each touching A and one private partition (prob 1/2 each
    // with l0=1) => accumulator flips to moments (>100 probabilities).
    val rows = (1 to 150).flatMap(i => Seq((s"u$i", "A", 1.0), (s"u$i", s"B$i", 1.0)))
    val df = eventsDf(rows)
    val opts = UtilityAnalysisOptions(
      epsilon = 2.0, delta = 1e-4, metrics = Seq(Metric.PrivacyIdCount),
      configs = Seq(UtilityAnalysisConfig(maxPartitionsContributed = 1)))
    val (_, per) = UtilityAnalysis.analyze(df, roles, opts, None)
    val got = per.filter(col("pk") === "A").collect().head.getAs[Double]("keep_prob")
    val strat = PartitionSelection.create(
      PartitionSelectionStrategyKind.TruncatedGeometric, 1.0, 5e-5, 1)
    val pmf = PoissonBinomial.computePmf(Seq.fill(150)(0.5))
    val want = pmf.probabilities.zipWithIndex.map { case (p, n) =>
      p * strat.probabilityOfKeep(n)
    }.sum
    assert(math.abs(got - want) < 1e-3, s"got $got want $want")
  }

  test("multi-column sums: per-column clipping errors and noise stds (reference case)") {
    // (reference: analysis/tests/utility_analysis_engine_test.py:400-470)
    // u0 contributes (2,3) and (0,0) to pk; u1 contributes (15,20).
    // Config 0: l0=1, sum bounds col0 [0,3], col1 [0,10], count linf 1.
    // Expected: col0 sum=17 clip_max=-12; col1 sum=23 clip_max=-10;
    // count sum=3 clip_max=-1; gaussian stds in ratio 3 : 10 : 1 (= linf).
    val df = Seq(("u0", "pk", 2.0, 3.0), ("u0", "pk", 0.0, 0.0), ("u1", "pk", 15.0, 20.0))
      .toDF("uid", "k", "a", "b")
    val mvCols = graft.spark.MultiValueColumns(col("uid"), Seq("k" -> col("k")),
      Seq("a" -> col("a"), "b" -> col("b")))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 1e-10, metrics = Seq(Metric.Sum, Metric.Count),
      configs = Seq(
        UtilityAnalysisConfig(1, 1, noiseKind = NoiseKind.Gaussian),
        UtilityAnalysisConfig(2, 1, noiseKind = NoiseKind.Gaussian)),
      publicPartitions = true)
    val bounds = Seq(Seq((0.0, 3.0), (0.0, 10.0)), Seq((0.0, 5.0), (0.0, 20.0)))
    val pre = UtilityAnalysis.preAggregateMulti(df, mvCols)
    val pub = Seq("pk").toDF("k")
    val per = UtilityAnalysis.perPartitionMetricsMultiSum(
      pre, Seq("k"), Seq("a", "b"), opts, bounds, Some(pub))
    val rows = per.collect().map(r => r.getAs[Int]("config_index") -> r).toMap
    val c0 = rows(0)
    assert(c0.getAs[Double]("sum_a_sum") == 17.0)
    assert(c0.getAs[Double]("sum_a_clip_max_err") == -12.0)
    assert(c0.getAs[Double]("sum_b_sum") == 23.0)
    assert(c0.getAs[Double]("sum_b_clip_max_err") == -10.0)
    assert(c0.getAs[Double]("count_sum") == 3.0)
    assert(c0.getAs[Double]("count_clip_max_err") == -1.0)
    // noise stds proportional to per-column linf (same gaussian budget share)
    val sA = c0.getAs[Double]("sum_a_noise_std")
    val sB = c0.getAs[Double]("sum_b_noise_std")
    val sC = c0.getAs[Double]("count_noise_std")
    assert(math.abs(sA / sC - 3.0) < 1e-9 && math.abs(sB / sC - 10.0) < 1e-9)
    // config 1: bounds [0,5]/[0,20] clip less
    val c1 = rows(1)
    assert(c1.getAs[Double]("sum_a_clip_max_err") == -10.0) // 15 -> 5
    assert(c1.getAs[Double]("sum_b_clip_max_err") == 0.0) // 20 within [0,20]
  }

  test("report: public partitions average and empty partition accounting") {
    // Partition A: count 4, no errors (linf large, l0 large). Partition B:
    // empty public => rmse = noise_std. Global bucket (-1) averages them.
    val df = eventsDf(Seq.tabulate(4)(i => (s"u$i", "A", 1.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 0.0, metrics = Seq(Metric.Count),
      configs = Seq(UtilityAnalysisConfig(
        maxPartitionsContributed = 1, maxContributionsPerPartition = 10)),
      publicPartitions = true)
    val pub = Seq("A", "B").toDF("pk")
    val (rep, _) = UtilityAnalysis.analyze(df, roles, opts, Some(pub))
    val global = rep.filter(col("bucket_lower") === -1L).collect().head
    assert(global.getAs[Long]("n_partitions") == 1L)
    assert(global.getAs[Long]("n_empty_partitions") == 1L)
    val noiseStd = math.sqrt(2.0) * 10.0 // laplace, l1 = 1*10, eps 1
    assert(math.abs(global.getAs[Double]("count_noise_std") - noiseStd) < 1e-12)
    // both partitions have abs_rmse = noise_std (no bounding error), weight 1
    assert(math.abs(global.getAs[Double]("count_abs_rmse") - noiseStd) < 1e-9)
    // dropped ratios all zero (nothing clipped, no selection for public)
    assert(global.getAs[Double]("count_ratio_dropped_l0") == 0.0)
    assert(global.getAs[Double]("count_ratio_dropped_ps") == 0.0)
    // histogram rows: bucket 1 (partition A, 4 pids) and bucket 0 (empty B)
    val buckets = rep.filter(col("bucket_lower") =!= -1L)
      .select("bucket_lower").as[Long].collect().toSet
    assert(buckets == Set(0L, 1L))
  }

  test("multi-configuration analysis produces one row set per config") {
    val df = eventsDf(Seq(("u1", "A", 1.0), ("u2", "A", 2.0), ("u1", "B", 3.0)))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 1e-6, metrics = Seq(Metric.Count, Metric.Sum),
      configs = Seq(
        UtilityAnalysisConfig(1, 1, 0.0, 1.0),
        UtilityAnalysisConfig(2, 5, 0.0, 10.0),
        UtilityAnalysisConfig(4, 10, 0.0, 100.0)))
    val (rep, per) = UtilityAnalysis.analyze(df, roles, opts, None)
    assert(per.select("config_index").distinct().count() == 3)
    assert(per.count() == 6) // 2 partitions x 3 configs
    val reps = rep.filter(col("bucket_lower") === -1L).collect()
    assert(reps.map(_.getAs[Int]("config_index")).toSet == Set(0, 1, 2))
    // larger bounds => weakly smaller clipping error magnitude
    val clip = per.groupBy("config_index")
      .agg(sum(abs(col("sum_clip_max_err"))).as("c")).collect()
      .map(r => r.getAs[Int]("config_index") -> r.getAs[Double]("c")).toMap
    assert(clip(0) >= clip(1) && clip(1) >= clip(2))
  }

  test("bucketLower matches the reference bucket bounds") {
    val df = Seq(0L, 1L, 5L, 9L, 10L, 19L, 20L, 49L, 50L, 99L, 100L, 199L,
      200L, 500L, 999L, 1000L, 5000L, 123456L).toDF("n")
    val got = df.select(UtilityAnalysis.bucketLower(col("n")).as("b"))
      .as[Long].collect().toSeq
    // (reference: analysis/utility_analysis.py:29-40: [0,1] + [1,2,5]*10^i)
    assert(got == Seq(0L, 1L, 1L, 1L, 10L, 10L, 20L, 20L, 50L, 50L, 100L, 100L,
      200L, 500L, 500L, 1000L, 5000L, 100000L))
  }

  test("partition sampling keeps a deterministic subset of expected size") {
    val rows = (1 to 60).flatMap(i =>
      Seq((s"u$i", s"p${i % 30}", 1.0), (s"u$i", s"p${(i + 1) % 30}", 1.0)))
    val df = eventsDf(rows)
    val pre1 = UtilityAnalysis.preAggregate(df, roles, partitionsSamplingProb = 0.5)
    val pre2 = UtilityAnalysis.preAggregate(df, roles, partitionsSamplingProb = 0.5)
    val kept1 = pre1.select("pk").distinct().as[String].collect().toSet
    val kept2 = pre2.select("pk").distinct().as[String].collect().toSet
    assert(kept1 == kept2) // deterministic
    assert(kept1.size > 5 && kept1.size < 25) // ~15 expected of 30
    // n_partitions computed before sampling: u1 touches 2 partitions even if
    // one was sampled away
    val np = pre1.select(max("__n_partitions")).as[Long].collect().head
    assert(np == 2L)
  }

  test("driver-side value sampler is deterministic and unbiased-ish") {
    val s = ValueSampler.Driver(0.3)
    val kept = (1 to 2000).count(i => s.keep(s"key$i"))
    assert(s.keep("key1") == s.keep("key1"))
    assert(kept > 450 && kept < 750, s"kept $kept of 2000 at rate 0.3")
  }
}

class MultiSumReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cross-partition report over multi-column analysis") {
    val df = Seq(("u0", "pk", 2.0, 3.0), ("u0", "pk", 0.0, 0.0), ("u1", "pk", 15.0, 20.0))
      .toDF("uid", "k", "a", "b")
    val mvCols = graft.spark.MultiValueColumns(col("uid"), Seq("k" -> col("k")),
      Seq("a" -> col("a"), "b" -> col("b")))
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 0.0, metrics = Seq(Metric.Sum),
      configs = Seq(UtilityAnalysisConfig(1, 1)), publicPartitions = true)
    val pre = UtilityAnalysis.preAggregateMulti(df, mvCols)
    val pub = Seq("pk").toDF("k")
    val per = UtilityAnalysis.perPartitionMetricsMultiSum(
      pre, Seq("k"), Seq("a", "b"), opts, Seq(Seq((0.0, 3.0), (0.0, 10.0))), Some(pub))
    val rep = UtilityAnalysis.reportMultiSum(per, opts, Seq("a", "b"))
    val global = rep.filter(col("bucket_lower") === -1L).collect().head
    // single partition, weight 1: abs_mean = clip errors
    assert(global.getAs[Double]("sum_a_abs_mean") == -12.0)
    assert(global.getAs[Double]("sum_b_abs_mean") == -10.0)
    // noise stds: laplace, eps 0.5 each, l1 = 1*3 and 1*10
    assert(math.abs(global.getAs[Double]("sum_a_noise_std") - math.sqrt(2.0) * 6.0) < 1e-9)
    assert(math.abs(global.getAs[Double]("sum_b_noise_std") - math.sqrt(2.0) * 20.0) < 1e-9)
    // dropped ratio: linf drop = 12 of 17 for column a
    assert(math.abs(global.getAs[Double]("sum_a_ratio_dropped_linf") - 12.0 / 17.0) < 1e-12)
  }
}

class SelectionOnlyAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("selection-only analysis (empty metrics): keep probabilities per partition") {
    // the select_partitions analysis case: no metric combiners, the whole
    // budget goes to partition selection
    val df = Seq(("u1", "A", 1.0), ("u2", "A", 1.0), ("u1", "B", 1.0))
      .toDF("uid", "pk", "v")
    val roles = graft.spark.DPColumns(col("uid"), Seq("pk" -> col("pk")), None)
    val opts = UtilityAnalysisOptions(
      epsilon = 1.0, delta = 1e-4, metrics = Nil,
      configs = Seq(UtilityAnalysisConfig(maxPartitionsContributed = 2)))
    val (rep, per) = UtilityAnalysis.analyze(df, roles, opts, None)
    val rows = per.collect().map(r =>
      r.getAs[String]("pk") -> r.getAs[Double]("keep_prob")).toMap
    // full budget to selection: l0=2 covers both of u1's partitions => all
    // contributor probs are 1, keep prob = strategy pmf at the pid count
    val strat = PartitionSelection.create(
      PartitionSelectionStrategyKind.TruncatedGeometric, 1.0, 1e-4, 2)
    assert(math.abs(rows("A") - strat.probabilityOfKeep(2)) < 1e-12)
    assert(math.abs(rows("B") - strat.probabilityOfKeep(1)) < 1e-12)
    // report still carries partition/selection info with no metric columns
    val g = rep.filter(col("bucket_lower") === -1L).collect().head
    assert(g.getAs[Long]("n_partitions") == 2L)
    assert(math.abs(g.getAs[Double]("kept_partitions_mean") -
      (rows("A") + rows("B"))) < 1e-12)
    assert(!rep.columns.exists(_.contains("noise_std")))
  }

  test("public partitions with empty metrics is rejected") {
    intercept[IllegalArgumentException] {
      UtilityAnalysisOptions(1.0, 1e-4, Nil,
        Seq(UtilityAnalysisConfig(1)), publicPartitions = true)
    }
  }

  test("Gaussian config with delta = 0 is rejected at option construction") {
    // would otherwise die later in gaussianSigma as a bare
    // 'requirement failed' with no hint at the fix
    val e = intercept[IllegalArgumentException] {
      UtilityAnalysisOptions(1.0, 0.0, Seq(Metric.Count),
        Seq(UtilityAnalysisConfig(1, noiseKind = NoiseKind.Gaussian)),
        publicPartitions = true)
    }
    assert(e.getMessage.contains("Gaussian"), e.getMessage)
  }

  test("SUM analysis with the default (0,0) sum bounds fails loud by name") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(("u1", "pk1", 1.0)).toDF("pid", "pk", "v")
    val opts = UtilityAnalysisOptions(1.0, 0.0, Seq(Metric.Sum),
      Seq(UtilityAnalysisConfig(1)), publicPartitions = true)
    val e = intercept[IllegalArgumentException] {
      UtilityAnalysis.analyze(df, DPColumns("pid", "pk", "v"), opts,
        Some(Seq("pk1").toDF("pk")))
    }
    assert(e.getMessage.contains("SumPerPartition"), e.getMessage)
  }

  test("tune fails loud (not indexBest = -1) when sampling drops every partition") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(("u1", "pk1", 1.0)).toDF("pid", "pk", "v")
    val hist = graft.stats.Histograms.computeDatasetHistograms(
      df, col("pid"), col("pk"))
    val opts = TuneOptions(1.0, 1e-4, Metric.Count, UtilityAnalysisConfig(1, 1),
      ParametersToTune(maxPartitionsContributed = true),
      partitionsSamplingProb = 1e-9, numberOfParameterCandidates = 3)
    val e = intercept[IllegalArgumentException] {
      ParameterTuning.tune(df, DPColumns("pid", "pk", "v"), hist, opts)
    }
    assert(e.getMessage.contains("utility report is empty"), e.getMessage)
  }
}
