package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-9 streaming/corpus/stats review fixes: NULL keys,
  * NULL values, NULL flags, and BIGINT overflow in the exactness paths.
  * Each test fails on the pre-fix code. */
class NullAndOverflowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedDistinctUsers excludes NULL users (equals batch count(DISTINCT))") {
    val ev = Seq(
      (ts("2026-01-01 10:05:00"), "click", Some(1L)),
      (ts("2026-01-01 10:10:00"), "click", Some(1L)),
      (ts("2026-01-01 10:15:00"), "click", None),
      (ts("2026-01-01 10:20:00"), "click", None)
    ).toDF("ts", "event_type", "user_id")
    val got = graft.streaming.StreamOps.windowedDistinctUsers(ev)
      .select("distinct_users").as[Long].collect()
    assert(got.toSeq == Seq(1L),
      s"NULL users must not count as phantom distinct users (got ${got.toSeq})")
  }

  test("windowedMixDrift: a NULL category present in the reference compares, " +
    "not fires a spurious appeared-alert") {
    val corpus = Seq(("a"), ("a")).toDF("event_type")
      .union(Seq.fill(2)(null.asInstanceOf[String]).toDF("event_type"))
    val ref = graft.streaming.StreamOps.mixReference(corpus, "event_type")
    val ev = Seq(
      (ts("2026-01-01 10:05:00"), "a"),
      (ts("2026-01-01 10:10:00"), null.asInstanceOf[String])
    ).toDF("ts", "event_type")
    val rows = graft.streaming.StreamOps.windowedMixDrift(ev, ref)
      .select("event_type", "n_ref", "dev_x").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // null category folds to __null on BOTH sides: n_ref = 2 (not 0), and
    // the mix is perfectly balanced (1/2 vs 2/4) so dev_x = 0
    assert(rows.contains("__null"), s"null category row missing: $rows")
    assert(rows("__null")._1 == 2L, s"n_ref must join through the fold: $rows")
    assert(rows("__null")._2 == 0L, s"balanced mix must read dev_x=0: $rows")
  }

  test("DP windowed sum fails loud on NULL values instead of clamping to minValue") {
    val ev = Seq(
      (ts("2026-01-01 10:05:00"), "click", 1L, Some(5.0)),
      (ts("2026-01-01 10:10:00"), "click", 2L, None)
    ).toDF("ts", "event_type", "user_id", "value")
    val t = intercept[Throwable] {
      graft.streaming.StreamOps.dpWindowedSum(ev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1e5, maxPerCell = 10L,
        minValue = 1.0, maxValue = 10.0, noise = graft.core.NoiseSource.Zero)
        .collect()
    }
    def msgs(x: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = x
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgs(t).contains("NULL value"), msgs(t))
  }

  test("mergeUpsert treats a NULL delete flag as a plain upsert, not a tombstone") {
    val base = Seq((1L, 1L, "old", Some(false))).toDF("k", "version", "payload", "is_deleted")
    val updates = Seq(
      (1L, 2L, "new", None: Option[Boolean]),        // plain upsert, flag unset
      (2L, 1L, "row2", Some(true))                   // genuine tombstone
    ).toDF("k", "version", "payload", "is_deleted")
    val merged = CorpusOps.mergeUpsert(base, updates, Seq("k"), "version",
      Some("is_deleted")).select("k", "payload").as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "new"),
      s"NULL flag must not delete the winning row; tombstone must delete (got $merged)")
  }

  test("epochRepeat fractional epoch survives pretraining-scale token targets") {
    // remainder * 1e6 = 1.3e13 * 1e6 = 1.3e19 > Long.MaxValue: pre-fix the
    // BIGINT product wrapped negative and the fractional epoch vanished
    val docs = (0 until 100).map(i => (i.toLong, "web", 2e11.toLong))
      .toDF("doc_id", "source", "tokens") // group mass 2e13
    val out = CorpusOps.epochRepeat(docs, "doc_id", "tokens", "source",
      targetTokens = 33000000000000L, maxEpochs = 10) // 1.65 full + 0.65 frac
    val byEpoch = out.groupBy("epoch").count().collect()
      .map(r => (r.getAs[Number]("epoch").longValue(), r.getLong(1))).toMap
    assert(byEpoch.getOrElse(1L, 0L) == 100L, s"full epoch missing: $byEpoch")
    val frac = byEpoch.getOrElse(2L, 0L)
    assert(frac > 0L && frac < 100L,
      s"fractional epoch (~65% of docs) must survive the large-target regime: $byEpoch")
  }

  test("crossDeviation is exact past 2^63 products and refuses past BIGINT range") {
    // 4e9-row totals: products ~1.2e19 wrap in BIGINT; DECIMAL stays exact
    val df = Seq((3000000000L, 4000000000L, 2999999999L, 4000000001L))
      .toDF("n_a", "tot_b", "n_b", "tot_a")
    val got = df.select(CorpusOps.crossDeviation(col("n_a"), col("tot_b"),
      col("n_b"), col("tot_a")).as("dev")).as[Long].head()
    val expect = (BigInt(3000000000L) * BigInt(4000000000L) -
      BigInt(2999999999L) * BigInt(4000000001L)).abs
    assert(BigInt(got) == expect, s"got $got expected $expect")
    // a deviation beyond Long.MaxValue fails loud instead of wrapping
    val big = Seq((4000000000L, 4000000000L, 0L, 1L))
      .toDF("n_a", "tot_b", "n_b", "tot_a")
    val t = intercept[Throwable] {
      big.select(CorpusOps.crossDeviation(col("n_a"), col("tot_b"),
        col("n_b"), col("tot_a"))).collect()
    }
    def msgs(x: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = x
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgs(t).contains("exceeds BIGINT"), msgs(t))
  }

  test("quotaSample with a NULL stratum stays within totalK") {
    val df = ((0 until 50).map(i => (i.toLong, "a")) ++
      (50 until 150).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("id", "stratum")
    val out = CorpusOps.quotaSample(df, "stratum", "id", totalK = 20)
    assert(out.count() == 20L,
      "null-stratum rows must participate in the waterfill, not bypass it")
    val strata = out.select("stratum").distinct().as[String].collect().toSet
    assert(strata == Set("a", "__null"), s"got $strata")
  }

  test("prepPipeline attributes NULL text to too_short, not non_english") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = CorpusOps.prepPipeline(df, "doc_id", "text")
      .select("drop_reason").as[String].head()
    assert(r == "too_short", s"got $r")
  }

  test("dataset histograms skip NULL values instead of binning them hi-edge") {
    // one (pid, pk) group whose values are ALL null: its per-group sum is
    // NULL; pre-fix that row binned as top-bucket mass (and an all-NULL
    // top bucket NPE'd the driver reads)
    val df = Seq(
      (1L, "a", Some(1.0)), (1L, "a", Some(2.0)),
      (2L, "a", None), (2L, "a", None)
    ).toDF("uid", "pk", "v")
    val h = graft.stats.Histograms.computeDatasetHistograms(
      df, col("uid"), col("pk"), Some(col("v")))
    val sums = h.linfSumContributions.get
    assert(sums.totalCount == 1L,
      s"only the non-null group's sum may bin (got ${sums.totalCount})")
    assert(sums.totalSum == 3.0, s"got ${sums.totalSum}")
  }
}
