package graft.stats

import graft.core._
import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HistogramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("log binning keeps 3 significant digits") {
    assert(Histograms.toBinLower(123) == 123)
    assert(Histograms.toBinLower(999) == 999)
    assert(Histograms.toBinLower(1000) == 1000)
    assert(Histograms.toBinLower(1234) == 1230)
    assert(Histograms.toBinLower(12345) == 12300)
    assert(Histograms.toBinLower(999999) == 999000)
  }

  test("native binLowerCol matches toBinLower across magnitudes") {
    val vals = (1L to 2000L) ++ Seq(9999L, 10000L, 10001L, 123456L, 999999L,
      1000000L, 1234567890L, 987654321012L)
    val got = vals.toDF("v").select(Histograms.binLowerCol(col("v")))
      .as[Long].collect().toSeq
    assert(got == vals.map(Histograms.toBinLower))
  }

  test("possible contribution bounds mirror the binning") {
    val bounds = Histograms.generatePossibleContributionBounds(10200)
    assert(bounds.take(5) == Seq(1, 2, 3, 4, 5))
    assert(bounds.contains(999) && bounds.contains(1000) && bounds.contains(1010))
    assert(!bounds.contains(1001))
    assert(bounds.last == 10200 || bounds.last == 10100)
    // every generated bound is its own bin lower
    assert(bounds.forall(b => Histograms.toBinLower(b) == b))
  }

  test("dataset histograms on a known fixture") {
    // u1: pk1 x3 rows, pk2 x1; u2: pk1 x2; u3: pk2 x2
    val df = Seq(
      ("u1", "pk1", 1.0), ("u1", "pk1", 2.0), ("u1", "pk1", 3.0), ("u1", "pk2", 4.0),
      ("u2", "pk1", 5.0), ("u2", "pk1", 6.0),
      ("u3", "pk2", 7.0), ("u3", "pk2", 8.0)
    ).toDF("pid", "pk", "v")
    val h = Histograms.computeDatasetHistograms(df, col("pid"), col("pk"), Some(col("v")))
    // l0: u1 -> 2 partitions, u2 -> 1, u3 -> 1
    assert(h.l0Contributions.bins.map(b => (b.lower, b.count)).toSet == Set((1.0, 2L), (2.0, 1L)))
    // l1: rows per pid: u1=4, u2=2, u3=2
    assert(h.l1Contributions.bins.map(b => (b.lower, b.count)).toSet == Set((2.0, 2L), (4.0, 1L)))
    // linf: rows per (pid,pk): 3,1,2,2
    assert(h.linfContributions.totalCount == 4)
    assert(h.linfContributions.totalSum == 8.0)
    // privacy ids per partition: pk1 -> 2, pk2 -> 2
    assert(h.privacyIdPerPartition.bins.map(b => (b.lower, b.count)).toSet == Set((2.0, 2L)))
    assert(h.countPerPartition.bins.map(b => (b.lower, b.count)).toSet ==
      Set((5.0, 1L), (3.0, 1L)))
    assert(h.linfSumContributions.isDefined && h.sumPerPartition.isDefined)
  }

  test("histogram quantiles walk from the right") {
    val bins = Seq(
      FrequencyBin(1, 2, 50, 50, 1, 1),
      FrequencyBin(2, 3, 30, 60, 2, 2),
      FrequencyBin(5, 6, 20, 100, 5, 5))
    val h = Histogram("t", bins)
    assert(h.quantiles(Seq(0.3, 0.5, 0.9)) == Seq(1.0, 2.0, 5.0))
  }

  test("ratioDropped is 0 at max and 1 at 0") {
    val bins = Seq(FrequencyBin(1, 2, 2, 2, 1, 1), FrequencyBin(3, 4, 1, 3, 3, 3))
    val rd = Histogram("t", bins).ratioDropped
    assert(rd.head == (0.0, 1.0))
    assert(rd.last._2 == 0.0)
    // monotone decreasing dropped ratio as the bound grows
    assert(rd.map(_._2).reverse == rd.map(_._2).reverse.sorted)
  }

  test("private L0 bound: huge calculation eps picks the argmax score") {
    // 2 users contribute to 2 partitions, 1 user to 1; 3 partitions total.
    val df = Seq(
      ("u1", "pk1"), ("u1", "pk2"), ("u2", "pk1"), ("u2", "pk3"), ("u3", "pk2")
    ).toDF("pid", "pk")
    val h = Histograms.computeDatasetHistograms(df, col("pid"), col("pk"))
    val params = CalculatePrivateContributionBoundsParams(
      aggregationNoiseKind = NoiseKind.Laplace,
      aggregationEps = 1.0, aggregationDelta = 0.0,
      calculationEps = 1e6,
      maxPartitionsContributedUpperBound = 100)
    val k = PrivateL0Calculator.calculate(params, numberOfPartitions = 3, h, NoiseSource.Zero)
    // scores: k=1: -(0.5*3*sqrt2 + 0.5*2) = -3.12; k=2: -(0.5*6*sqrt2) = -4.24;
    // k=3: -6.36  => argmax is k=1
    assert(k == 1)
  }

  test("anonymity audit: class sizes and distinct-sensitive counts per threshold") {
    import spark.implicits._
    // classes: (a: 3 rows, 2 users), (b: 1 row, 1 user), (c: 2 rows, 2 users)
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 9L),
      ("c", 5L), ("c", 6L)
    ).toDF("qi", "user")
    val out = graft.stats.AnonymityAudit.audit(df, Seq("qi"), "user", ks = Seq(2, 3))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // k=2: below-k classes = {b} (1 row); l-div below 2 = {b}
    assert(out(2) == ((3L, 1L, 1L, 1L)))
    // k=3: below-k classes = {b, c} (3 rows); l-div below 3 = all three
    assert(out(3) == ((3L, 2L, 3L, 3L)))
    // duplicate thresholds would silently double-count — rejected
    intercept[IllegalArgumentException] {
      graft.stats.AnonymityAudit.audit(df, Seq("qi"), "user", ks = Seq(5, 5))
    }
  }

  test("exponential mechanism distributes by score at moderate eps") {
    val scoring = new ScoringFunction {
      def score(k: Int): Double = k.toDouble
      def globalSensitivity: Double = 1.0
      def isMonotonic: Boolean = true
    }
    val mech = new ExponentialMechanism(scoring)
    val probs = mech.probabilities(1.0, Seq(1, 2, 3))
    assert(probs.sum > 0.999 && probs.sum < 1.001)
    assert(probs(2) > probs(1) && probs(1) > probs(0))
    // huge eps concentrates on the max
    val concentrated = mech.probabilities(1000.0, Seq(1, 2, 3))
    assert(concentrated(2) > 0.999)
  }

  test("r12 review pins: ladder overflow, zero-total ratios, empty quasi-ids") {
    import graft.stats.Histograms
    // 19-digit values terminate and agree with the string-length column
    // arithmetic (the old ladder wrapped negative and spun forever)
    assert(Histograms.toBinLower(Long.MaxValue) ==
      Long.MaxValue / 10000000000000000L * 10000000000000000L)
    assert(Histograms.toBinLower(1000000000000000000L) == 1000000000000000000L)
    val big = Seq(Long.MaxValue, 1234567890123456789L).toDF("v")
    val viaCol = big.select(
        graft.stats.Histograms.binLowerCol(col("v")).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(viaCol == Set(Histograms.toBinLower(Long.MaxValue),
      Histograms.toBinLower(1234567890123456789L)), viaCol.toString)
    // zero-total sum histogram: ratios are 0.0 everywhere, never NaN
    val zero = Histogram("sum", Seq(FrequencyBin(1.0, 2.0, 3L, 0.0, 0.0, 0.0)))
    assert(zero.ratioDropped.forall(!_._2.isNaN))
    assert(zero.ratioDropped.forall(_._2 == 0.0))
    // the zero-total branch keeps the NORMAL path's ascending shape —
    // interpolate() reads ratios.last._1 as the max bound and walks the
    // list with indexWhere (r12 advice: an appended (0.0, 0.0) tail made
    // the sequence unsorted with last bound 0.0)
    val zb = zero.ratioDropped.map(_._1)
    assert(zb == zb.sorted && zb.distinct == zb, zb.toString)
    assert(zb.head == 0.0, zb.toString)
    // a zero-mass histogram whose bin max EXCEEDS its lower gets the same
    // (maxValue, 0.0) tail entry as the normal path
    val zeroTail = Histogram("sum",
      Seq(FrequencyBin(1.0, 2.0, 3L, 0.0, 2.0, 0.0)))
    val zt = zeroTail.ratioDropped.map(_._1)
    assert(zt == Seq(0.0, 1.0, 2.0), zt.toString)
    // maxValue at/below the last lower: no duplicate or unsorted tail
    val zeroFlat = Histogram("sum",
      Seq(FrequencyBin(1.0, 2.0, 3L, 0.0, 1.0, 1.0)))
    val zf = zeroFlat.ratioDropped.map(_._1)
    assert(zf == Seq(0.0, 1.0), zf.toString)
    // empty quasi-identifier list fails loud (one global class passes
    // every threshold vacuously)
    val e = intercept[IllegalArgumentException](
      AnonymityAudit.audit(Seq((1L, "a")).toDF("u", "x"), Seq.empty, "u"))
    assert(e.getMessage.contains("quasi-identifier"), e.getMessage)
  }

  test("NaN/Infinity in the value column fails loud, not a far-away NPE (19th pass)") {
    // NaN width nulls every bin expression; the driver-side Number reads
    // would NPE far from the cause — the histogram must name it instead
    def hist(v: Double) = Histograms.computeDatasetHistograms(
      Seq((1L, "p", 1.0), (2L, "p", v)).toDF("uid", "pk", "v"),
      col("uid"), col("pk"), Some(col("v")))
    val eN = intercept[IllegalArgumentException](hist(Double.NaN))
    assert(eN.getMessage.contains("NaN or Infinite"), eN.getMessage)
    val eI = intercept[IllegalArgumentException](hist(Double.PositiveInfinity))
    assert(eI.getMessage.contains("NaN or Infinite"), eI.getMessage)
    // finite data still builds (the guard is not over-broad)
    assert(hist(2.0).linfSumContributions.isDefined)
  }
}
