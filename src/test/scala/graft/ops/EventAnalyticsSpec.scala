package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourly zero-fills every interior gap for every key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), "a", 5.9),
      (2L, ts("2024-01-01 03:20:00"), "a", 2.0),
      (3L, ts("2024-01-01 01:00:00"), "b", 7.0)
    ).toDF("id", "t", "k", "v")
    val out = EventAnalytics.gapFillHourly(df, "t", "k", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // grid: 2 keys x 4 hours (00..03) = 8 rows, gaps zero-filled
    assert(out.size == 8)
    assert(out.contains(("a", "2024-01-01 00:00:00", 1L, 5.0))) // floor(5.9)
    assert(out.contains(("a", "2024-01-01 01:00:00", 0L, 0.0)))
    assert(out.contains(("a", "2024-01-01 02:00:00", 0L, 0.0)))
    assert(out.contains(("a", "2024-01-01 03:00:00", 1L, 2.0)))
    assert(out.contains(("b", "2024-01-01 01:00:00", 1L, 7.0)))
    assert(out.contains(("b", "2024-01-01 00:00:00", 0L, 0.0)))
  }

  test("funnel: order matters, same-timestamp ties advance, strict regressions don't") {
    val df = Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),
      (1L, ts("2024-01-01 00:02:00"), "purchase"),
      // u2: click BEFORE view and never after => stops at view
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 00:05:00"), "view"),
      // u3: view and click at the SAME timestamp => tie advances
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:00:00"), "click"),
      // u4: never viewed => not even step 1
      (4L, ts("2024-01-01 00:00:00"), "purchase")
    ).toDF("u", "t", "ty")
    val out = EventAnalytics.funnel(df, "u", "t", "ty",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "view", 3L, 1.0)))      // u1, u2, u3
    assert(out(1) == ((2L, "click", 2L, 2.0 / 3))) // u1, u3 (tie) — not u2
    assert(out(2) == ((3L, "purchase", 1L, 1.0 / 3)))
  }

  test("funnel entry time is the EARLIEST qualifying event, not any event") {
    // u1 clicks twice after view; step-3 window must open at the first click
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),
      (1L, ts("2024-01-01 00:10:00"), "click"),
      // purchase lands between the two clicks: qualifies vs the first
      (1L, ts("2024-01-01 00:05:00"), "purchase")
    ).toDF("u", "t", "ty")
    val out = EventAnalytics.funnel(df, "u", "t", "ty",
      Seq("view", "click", "purchase"))
    assert(out.filter(col("step") === "purchase").head().getLong(2) == 1L)
  }

  test("cohortRetention: cohort is the first day; weeks bucket by 7 days") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 01-01
      (1L, ts("2024-01-03 10:00:00")), // same week 0
      (1L, ts("2024-01-08 10:00:00")), // day 7 => week 1
      (2L, ts("2024-01-01 23:00:00")), // cohort 01-01, week 0 only
      (3L, ts("2024-01-05 00:00:00"))  // cohort 01-05, week 0
    ).toDF("u", "t")
    val out = EventAnalytics.cohortRetention(df, "u", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01", 0L, 2L), // u1 (two distinct days collapse), u2
      ("2024-01-01", 1L, 1L), // u1 on day 7
      ("2024-01-05", 0L, 1L)  // u3
    ))
  }

  test("sessionSequences: gap splits, (ts,id)-pinned order, exact paths") {
    val df = Seq(
      // u1 session 1: two events, tie on ts broken by event_id
      (1L, 1000L, "b", 20L),
      (1L, 1000L, "a", 10L),
      // u1 session 2: 31 min later
      (1L, 1000L + 31L * 60 * 1000000, "c", 30L),
      // u2: single session, strictly under the gap
      (2L, 0L, "x", 40L),
      (2L, 29L * 60 * 1000000, "y", 50L)
    ).toDF("u", "tu", "ty", "eid")
    val out = EventAnalytics.sessionSequences(df, "u", "tu", "ty", "eid",
        gapMicros = 1800L * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, 1000L, 2L, "a>b"), // event_id order under the ts tie
      (1L, 1000L + 31L * 60 * 1000000, 1L, "c"),
      (2L, 0L, 2L, "x>y")))
  }

  test("transitionCounts: consecutive pairs per user, row fractions sum to 1") {
    val df = Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "a", 3L), (1L, 4L, "b", 4L),
      (2L, 1L, "a", 5L), (2L, 2L, "b", 6L), (2L, 3L, "c", 7L)
    ).toDF("u", "tu", "ty", "eid")
    val out = EventAnalytics.transitionCounts(df, "u", "tu", "ty", "eid")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // a->b x3 (u1 twice, u2 once), b->a x1, b->c x1; no cross-user pair
    assert(out(("a", "b")) == ((3L, 1.0)))
    assert(out(("b", "a")) == ((1L, 0.5)))
    assert(out(("b", "c")) == ((1L, 0.5)))
    assert(out.size == 3)
  }

  test("growthAccounting classifies new / returning / resurrected by gap") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // new
      (1L, ts("2024-01-05 10:00:00")), // gap 4 => returning
      (1L, ts("2024-01-20 10:00:00")), // gap 15 => resurrected
      (2L, ts("2024-01-05 01:00:00")), // new
      (2L, ts("2024-01-05 23:00:00"))  // same day: deduped, not returning
    ).toDF("u", "t")
    val out = EventAnalytics.growthAccounting(df, "u", "t", resurrectDays = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("2024-01-01") == ((1L, 1L, 0L, 0L)))
    assert(out("2024-01-05") == ((2L, 1L, 1L, 0L))) // u2 new, u1 returning
    assert(out("2024-01-20") == ((1L, 0L, 0L, 1L)))
  }

  test("winsorizeProfile clamps with integerized bounds and exact sums") {
    // single key, values 1..10: p0.25 of 1..10 = 3.25, p0.75 = 7.75
    val df = (1 to 10).map(v => ("k", v.toDouble)).toDF("g", "v")
    val r = EventAnalytics.winsorizeProfile(df, "g", "v", 0.25, 0.75)
      .collect().head
    assert(r.getAs[Double]("p_lo") == 3.25)
    assert(r.getAs[Double]("p_hi") == 7.75)
    assert(r.getAs[Long]("n_rows") == 10L)
    // clamp bounds integerized: [floor(3.25), ceil(7.75)] = [3, 8]
    // clamped: 3,3,3,4,5,6,7,8,8,8 = 55
    assert(r.getAs[Double]("clamped_sum") == 55.0)
  }

  test("cuped: hand-computed pooled theta, adjusted means, variance reduction") {
    // units (arm, y, x): perfectly correlated y = 2x + arm-shift, so the
    // adjustment should remove ALL within-arm variance (var_y_cuped = 0)
    // and shift each arm's mean by -theta * (meanXa - meanXglobal).
    // arm 0: (y, x) = (2, 1), (6, 3); arm 1: (y, x) = (5, 2), (9, 4)
    val units = Seq((0L, 2.0, 1.0), (0L, 6.0, 3.0), (1L, 5.0, 2.0),
      (1L, 9.0, 4.0)).toDF("arm", "y", "x")
    // pooled: n=4, sx=10, sy=22, sxx=30, sxy=66
    // theta = (4*66 - 10*22) / (4*30 - 100) = 44/20 = 2.2
    // (NOT 2.0: the arm shift correlates with x across arms, and the
    // pooled slope absorbs some of it — the known CUPED property)
    val r = graft.ops.EventAnalytics.cuped(units, "arm", "y", "x")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_units") == 2L)
    assert(r(0L).getAs[Double]("theta") == 2.2)
    assert(r(1L).getAs[Double]("theta") == 2.2)
    // arm 0: mean_y = 4, meanXa = 2, meanXg = 2.5 -> 4 - 2.2*(-0.5) = 5.1
    assert(r(0L).getAs[Double]("mean_y") == 4.0)
    assert(r(0L).getAs[Double]("mean_y_cuped") == 5.1)
    // arm 1: mean_y = 7, meanXa = 3 -> 7 - 2.2*0.5 = 5.9
    assert(r(1L).getAs[Double]("mean_y_cuped") == 5.9)
    // the CUPED delta (0.8) undoes most of the covariate imbalance the
    // raw delta (3.0) carries; within-arm: y = 2x + c exactly, so the
    // residual var((2 - 2.2) x) = 0.04 * var(x) = 0.04 (from 4.0)
    assert(r(0L).getAs[Double]("var_y") == 4.0)
    assert(math.abs(r(0L).getAs[Double]("var_y_cuped") - 0.04) < 1e-9)
    assert(math.abs(r(1L).getAs[Double]("var_y_cuped") - 0.04) < 1e-9)
    // degenerate var(X) = 0: theta = 0, adjustment is a no-op (not NaN)
    val flat = Seq((0L, 2.0, 5.0), (1L, 4.0, 5.0)).toDF("arm", "y", "x")
    val fr = graft.ops.EventAnalytics.cuped(flat, "arm", "y", "x")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(fr(0L).getAs[Double]("theta") == 0.0)
    assert(fr(0L).getAs[Double]("mean_y_cuped") == 2.0)
    // NULL y fails loud — a silently skipped unit would bias the readout
    val bad = Seq((0L, Some(2.0), 1.0), (1L, None, 2.0)).toDF("arm", "y", "x")
    val e = intercept[Exception](
      graft.ops.EventAnalytics.cuped(bad, "arm", "y", "x").collect())
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("NULL y"))
  }

  test("cuped fleet shape: per-experiment pooled theta, one pass for many experiments") {
    // experiment A = the hand-computed case (theta 2.2); experiment B has
    // x on a 10x scale with slope 0.5 — a cross-experiment pooled theta
    // would blend the two scales; the keyed readout must NOT
    val a = Seq(("A", 0L, 2.0, 1.0), ("A", 0L, 6.0, 3.0),
      ("A", 1L, 5.0, 2.0), ("A", 1L, 9.0, 4.0))
    val b = Seq(("B", 0L, 5.0, 10.0), ("B", 0L, 15.0, 30.0),
      ("B", 1L, 11.0, 20.0), ("B", 1L, 21.0, 40.0))
    val units = (a ++ b).toDF("exp", "arm", "y", "x")
    val r = graft.ops.EventAnalytics.cuped(units, "arm", "y", "x",
      experimentCols = Seq("exp"))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x).toMap
    assert(r.size == 4)
    assert(r(("A", 0L)).getAs[Double]("theta") == 2.2)
    // B pooled: n=4, sx=100, sy=52, sxx=3000, sxy=1560
    // theta = (4*1560 - 100*52)/(4*3000 - 10000) = 1040/2000 = 0.52
    assert(r(("B", 0L)).getAs[Double]("theta") == 0.52)
    // each experiment's rows equal its OWN single-experiment readout
    val soloA = graft.ops.EventAnalytics.cuped(
      a.toDF("exp", "arm", "y", "x"), "arm", "y", "x")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(("A", 0L)).getAs[Double]("mean_y_cuped") == soloA(0L))
    assert(r(("A", 1L)).getAs[Double]("mean_y_cuped") == soloA(1L))
    // NULL experiment key fails loud
    val bad = Seq((Some("A"), 0L, 1.0, 1.0), (None, 1L, 2.0, 2.0))
      .toDF("exp", "arm", "y", "x")
    val e = intercept[Exception](graft.ops.EventAnalytics.cuped(bad,
      "arm", "y", "x", Seq("exp")).collect())
    assert(graft.spark.SparkTestSession.chainMsg(e)
      .contains("NULL experiment key"))
  }
}
