package graft.analysis

import graft.core._
import graft.spark.{DPColumns, SparkTestSession}
import graft.stats.{DatasetHistograms, FrequencyBin, Histogram, Histograms}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DPStrategySelectorSpec extends AnyFunSuite {
  import NoiseKind._
  import PartitionSelectionStrategyKind._

  private def sens(l0: Int, linf: Double) =
    Sensitivities(l0 = Some(l0), linf = Some(linf))

  test("public partitions: noise kind by minimal std (reference cases)") {
    // (reference: analysis/tests/dp_strategy_selector_test.py:25-55)
    val s1 = new DPStrategySelector(1.0, 1e-10, Seq(Metric.Count), isPublicPartitions = true)
    val cases1 = Seq((1, 1.0) -> Laplace, (10, 1.0) -> Laplace, (10, 10.0) -> Laplace,
      (20, 1.0) -> Gaussian, (100, 5.0) -> Gaussian)
    cases1.foreach { case ((l0, linf), want) =>
      val got = s1.getDpStrategy(sens(l0, linf))
      assert(got.noiseKind.contains(want), s"l0=$l0 linf=$linf")
      assert(got.partitionSelectionStrategy.isEmpty && !got.postAggregationThresholding)
    }
    val s2 = new DPStrategySelector(0.1, 1e-5, Seq(Metric.Sum), isPublicPartitions = true)
    Seq((1, 1.0) -> Laplace, (2, 2.0) -> Laplace, (3, 1.0) -> Laplace, (6, 1.0) -> Gaussian)
      .foreach { case ((l0, linf), want) =>
        assert(s2.getDpStrategy(sens(l0, linf)).noiseKind.contains(want), s"l0=$l0")
      }
    // two metrics scale l0 by 2 (reference case: PRIVACY_ID_COUNT + SUM)
    val s3 = new DPStrategySelector(0.1, 1e-5, Seq(Metric.PrivacyIdCount, Metric.Sum),
      isPublicPartitions = true)
    Seq((1, 1.0) -> Laplace, (2, 1.0) -> Laplace, (3, 1.0) -> Gaussian, (6, 1.0) -> Gaussian)
      .foreach { case ((l0, linf), want) =>
        assert(s3.getDpStrategy(sens(l0, linf)).noiseKind.contains(want), s"l0=$l0")
      }
  }

  test("private partitions: noise + selection strategy (reference case)") {
    // (reference: dp_strategy_selector_test.py:68-95, count, eps=1 delta=1e-8)
    val s = new DPStrategySelector(1.0, 1e-8, Seq(Metric.Count), isPublicPartitions = false)
    val want = Seq(
      (1, 1.0) -> (Laplace, TruncatedGeometric),
      (2, 1.0) -> (Laplace, TruncatedGeometric),
      (3, 10.0) -> (Laplace, GaussianThresholding),
      (20, 1.0) -> (Gaussian, GaussianThresholding),
      (100, 5.0) -> (Gaussian, GaussianThresholding))
    want.foreach { case ((l0, linf), (nk, ps)) =>
      val got = s.getDpStrategy(sens(l0, linf))
      assert(got.noiseKind.contains(nk), s"noise l0=$l0 linf=$linf got $got")
      assert(got.partitionSelectionStrategy.contains(ps), s"ps l0=$l0 linf=$linf got $got")
      assert(!got.postAggregationThresholding)
    }
  }

  test("post-aggregation thresholding for PRIVACY_ID_COUNT (reference case)") {
    // (reference: dp_strategy_selector_test.py:112-141, eps=2 delta=1e-12)
    val s = new DPStrategySelector(2.0, 1e-12, Seq(Metric.PrivacyIdCount),
      isPublicPartitions = false)
    val want = Seq(
      1 -> (Laplace, LaplaceThresholding),
      10 -> (Laplace, LaplaceThresholding),
      25 -> (Gaussian, GaussianThresholding))
    want.foreach { case (l0, (nk, ps)) =>
      val got = s.getDpStrategy(sens(l0, 1.0))
      assert(got.noiseKind.contains(nk), s"l0=$l0 got $got")
      assert(got.partitionSelectionStrategy.contains(ps), s"l0=$l0 got $got")
      assert(got.postAggregationThresholding)
    }
  }
}

class ParameterTuningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def histWithMax(maxValue: Double) =
    Histogram("h", Seq(FrequencyBin(1, maxValue + 1, 1, maxValue, maxValue, 1)))

  private def histWithBinMaxes(maxes: Seq[Double]) =
    Histogram("h", maxes.map(m => FrequencyBin(m, m, 1, m, m, m)))

  test("constant relative step candidates (reference cases)") {
    // (reference: analysis/tests/parameter_tuning_test.py:156-187)
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(1), 1000) == Seq(1))
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(1003), 1) == Seq(1))
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(1003), 2) == Seq(1, 1003))
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(10), 10) == (1 to 10))
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(10), 1000) == (1 to 10))
    assert(ParameterTuning.findCandidatesConstantRelativeStep(histWithMax(1000), 5) ==
      Seq(1, 6, 32, 178, 1000))
  }

  test("bin-max subsample candidates (reference cases)") {
    // (reference: parameter_tuning_test.py:210-260)
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(histWithBinMaxes(Seq(1)), 1000)
      == Seq(1.0))
    val b3 = histWithBinMaxes(Seq(0.1, 0.2, 0.3))
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(b3, 1) == Seq(0.1))
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(b3, 2) == Seq(0.1, 0.3))
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(b3, 3) == Seq(0.1, 0.2, 0.3))
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(b3, 100) == Seq(0.1, 0.2, 0.3))
    // 0-max first bin is skipped
    val b10 = histWithBinMaxes((0 until 10).map(_.toDouble))
    assert(ParameterTuning.findCandidatesBinsMaxValuesSubsample(b10, 5) ==
      Seq(1.0, 3.0, 5.0, 7.0, 9.0))
  }

  private def mockHistograms(l0Max: Double, linfMax: Double) =
    DatasetHistograms(histWithMax(l0Max), histWithMax(1), histWithMax(linfMax),
      None, histWithMax(1), histWithMax(1), None)

  test("candidate cross product respects the max-candidates budget (reference cases)") {
    // (reference: parameter_tuning_test.py:70-125)
    val opts5 = TuneOptions(1.0, 1e-6, Metric.Count,
      UtilityAnalysisConfig(1, 1), ParametersToTune(
        maxPartitionsContributed = true, maxContributionsPerPartition = true),
      numberOfParameterCandidates = 5)
    val c5 = ParameterTuning.findCandidateParameters(mockHistograms(6, 3), opts5)
    assert(c5.map(_.maxPartitionsContributed) == Seq(1, 1, 6, 6))
    assert(c5.map(_.maxContributionsPerPartition) == Seq(1, 3, 1, 3))

    val opts9 = opts5.copy(numberOfParameterCandidates = 9)
    val c9 = ParameterTuning.findCandidateParameters(mockHistograms(4, 2), opts9)
    assert(c9.map(_.maxPartitionsContributed) == Seq(1, 1, 2, 2, 4, 4))
    assert(c9.map(_.maxContributionsPerPartition) == Seq(1, 2, 1, 2, 1, 2))
  }

  test("histogram error estimator: no dropping => rmse equals noise std") {
    val df = Seq(("u1", "A", 1.0), ("u2", "A", 1.0), ("u3", "B", 1.0))
      .toDF("uid", "pk", "v")
    val h = Histograms.computeDatasetHistograms(df, col("uid"), col("pk"))
    val est = HistogramErrorEstimator.forCount(h, 1.0, None, Metric.Count, NoiseKind.Laplace)
    // every user contributes once to one partition: bounds (1,1) drop nothing
    assert(est.ratioDroppedL0(1) == 0.0)
    assert(est.ratioDroppedLinf(1) == 0.0)
    val want = math.sqrt(2.0) / 1.0 // base laplace std, l0=linf=1
    assert(math.abs(est.estimateRmse(1, Some(1.0)) - want) < 1e-12)
    // bound 0 drops everything: rmse ~ sqrt(partition_size^2 + std^2) averaged
    assert(est.ratioDroppedL0(0) == 1.0)
  }

  test("histogram error estimator: interpolation between bounds") {
    // u1 contributes to 4 partitions, u2 to 1: l0 curve has points at 1 and 4
    val rows = Seq(("u1", "A", 1.0), ("u1", "B", 1.0), ("u1", "C", 1.0), ("u1", "D", 1.0),
      ("u2", "A", 1.0))
    val h = Histograms.computeDatasetHistograms(rows.toDF("uid", "pk", "v"),
      col("uid"), col("pk"))
    val est = HistogramErrorEstimator.forCount(h, 1.0, None, Metric.Count, NoiseKind.Laplace)
    val r1 = est.ratioDroppedL0(1) // u1 loses 3 of 4 rows => 3/5 dropped
    assert(math.abs(r1 - 3.0 / 5.0) < 1e-12)
    assert(est.ratioDroppedL0(4) == 0.0)
    val r2 = est.ratioDroppedL0(2) // u1 loses 2 of 4 => 2/5
    assert(math.abs(r2 - 2.0 / 5.0) < 1e-12)
    val r25 = est.ratioDroppedL0(2.5) // halfway between 2/5 and 1/5
    assert(math.abs(r25 - 0.3) < 1e-12)
  }

  test("laplace+gaussian sum quantiles are statistically sound") {
    val qs = ProbabilityComputations.sumLaplaceGaussianQuantiles(
      laplaceB = 2.0, gaussianSigma = 3.0, quantiles = Seq(0.05, 0.5, 0.95),
      numSamples = 200000, noise = NoiseSource.Seeded(42))
    // symmetric around 0; total std = sqrt(2*4 + 9) ~ 4.12
    assert(math.abs(qs(1)) < 0.1, s"median ${qs(1)}")
    assert(math.abs(qs(0) + qs(2)) < 0.3, s"asymmetric tails $qs")
    assert(qs(2) > 5.0 && qs(2) < 9.0, s"p95 ${qs(2)}")
  }

  test("public partitions summary classifies partitions") {
    val df = Seq(("u1", "A", 1.0), ("u2", "B", 1.0), ("u3", "C", 1.0))
      .toDF("uid", "pk", "v")
    val pub = Seq("A", "B", "GHOST").toDF("pk")
    val out = UtilityAnalysis.publicPartitionsSummary(df,
      Seq("pk" -> col("pk")), pub).collect().head
    assert(out.getAs[Long]("num_dataset_public") == 2L)
    assert(out.getAs[Long]("num_dataset_non_public") == 1L) // C
    assert(out.getAs[Long]("num_empty_public") == 1L) // GHOST
  }

  test("tune: picks the configuration with minimal rmse end-to-end") {
    // 50 users each contribute 1 row to 2 partitions of 10; generous data so
    // the only error is noise; smaller (l0, linf) => smaller noise => best
    // candidate must clip nothing and use the smallest noise that fits.
    val rows = (1 to 50).flatMap(i =>
      Seq((s"u$i", s"p${i % 10}", 1.0), (s"u$i", s"p${(i + 3) % 10}", 1.0)))
    val df = rows.toDF("uid", "pk", "v")
    val roles = DPColumns(col("uid"), Seq("pk" -> col("pk")), Some(col("v")))
    val h = Histograms.computeDatasetHistograms(df, col("uid"), col("pk"))
    val opts = TuneOptions(2.0, 1e-5, Metric.Count,
      UtilityAnalysisConfig(1, 1), ParametersToTune(
        maxPartitionsContributed = true, maxContributionsPerPartition = true),
      numberOfParameterCandidates = 9)
    val (result, report, per) = ParameterTuning.tune(df, roles, h, opts)
    assert(result.candidates.nonEmpty)
    assert(result.indexBest >= 0 && result.indexBest < result.candidates.size)
    assert(result.rmsePerCandidate.length == result.candidates.size)
    // argmin really is the min
    assert(result.rmsePerCandidate(result.indexBest) == result.rmsePerCandidate.min)
    // the best config must not drop data: l0=2 linf=1 has zero bounding error
    val best = result.candidates(result.indexBest)
    assert(best.maxPartitionsContributed == 2 && best.maxContributionsPerPartition == 1,
      s"best was $best with rmse ${result.rmsePerCandidate}")
    assert(per.count() == 10L * result.candidates.size)
  }

  test("tune with partition sampling: the speed knob keeps the argmin, samples deterministically, fails loud when everything drops") {
    // the reference's partitions_sampling_prob (parameter_tuning.py:74-77):
    // tuning over a SAMPLE of partitions for speed. 40 partitions so a 0.5
    // sample leaves plenty of signal; the clear-cut fixture (generous
    // bounds dominate) must pick the same argmin sampled or not.
    val rows = (1 to 200).flatMap(i =>
      Seq((s"u$i", s"p${i % 40}", 1.0), (s"u$i", s"p${(i + 7) % 40}", 1.0)))
    val df = rows.toDF("uid", "pk", "v")
    val roles = DPColumns(col("uid"), Seq("pk" -> col("pk")), Some(col("v")))
    val cands = Seq(UtilityAnalysisConfig(1, 1), UtilityAnalysisConfig(2, 1),
      UtilityAnalysisConfig(4, 4))
    def opts(prob: Double) = TuneOptions(2.0, 1e-5, Metric.Count,
      UtilityAnalysisConfig(1, 1), ParametersToTune(
        maxPartitionsContributed = true, maxContributionsPerPartition = true),
      partitionsSamplingProb = prob)
    val (full, _, perFull) = ParameterTuning.tuneFixed(df, roles, cands,
      opts(1.0))
    val (sampled, _, perSampled) = ParameterTuning.tuneFixed(df, roles,
      cands, opts(0.5))
    // the sample genuinely shrinks the analyzed work...
    val nFull = perFull.count(); val nSampled = perSampled.count()
    assert(nSampled < nFull,
      s"sampling analyzed as many partitions as the full run ($nSampled)")
    assert(nSampled > 0)
    // ...is value-keyed DETERMINISTIC (same partitions kept on re-run)...
    val (sampled2, _, perSampled2) = ParameterTuning.tuneFixed(df, roles,
      cands, opts(0.5))
    assert(perSampled2.count() == nSampled &&
      sampled2.rmsePerCandidate == sampled.rmsePerCandidate,
      "value-keyed sampling was not deterministic across runs")
    // ...and preserves the clear-cut argmin
    assert(sampled.indexBest == full.indexBest,
      s"sampled argmin ${sampled.indexBest} != full ${full.indexBest} " +
        s"(sampled rmse ${sampled.rmsePerCandidate}, " +
        s"full ${full.rmsePerCandidate})")
    // contract edges: probability domain, and the everything-sampled-away
    // shaped failure (one partition at a prob its hash rejects)
    intercept[IllegalArgumentException](ParameterTuning.tuneFixed(df, roles,
      cands, opts(0.0)))
    intercept[IllegalArgumentException](ParameterTuning.tuneFixed(df, roles,
      cands, opts(1.5)))
    val one = Seq(("u1", "pOnly", 1.0)).toDF("uid", "pk", "v")
    val probes = (1 to 60).map(k => math.pow(0.9, k))
    val rejecting = probes.find { p =>
      scala.util.Try(ParameterTuning.tuneFixed(one, roles, cands,
        opts(p))).isFailure
    }
    assert(rejecting.isDefined,
      "no probe probability sampled the single partition away")
    val e = intercept[IllegalArgumentException](ParameterTuning.tuneFixed(
      one, roles, cands, opts(rejecting.get)))
    assert(e.getMessage.contains("no partitions survived"), e.getMessage)
  }
}
