package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** event-analytics / time-series tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntryEvents {
  import EntryHelpers._

  /** The daily per-type rollup shared by ts_anomaly and ts_moving_avg —
    * one definition of the (event_type, day, integer-floor value sum)
    * aggregate so the two oracle-pinned windows cannot drift apart. */
  private def dailyValueRollup(s: SparkSession, dir: String, as: String) =
    events(s, dir).withColumn("day", tsDay)
      .groupBy("event_type", "day")
      .agg(sum(floor(col("value"))).cast("double").as(as))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gapfill" -> ((s, dir) => {
      // time-series resample: dense per-(event_type, hour) grid with
      // zero-filled gaps between the corpus min and max hour — the
      // telemetry shape dashboards and anomaly detectors require (a
      // missing cell is a 0, not an absent row). The grid is GENERATED
      // (sequence over a one-row min/max agg × distinct keys), never
      // collected, so the plan is scan + one map-side-combined agg at any
      // scale.
      graft.ops.EventAnalytics.gapFillHourly(
        events(s, dir).withColumn("tstamp", expr("timestamp_micros(ts div 1000)")),
        "tstamp", "event_type", "value")
    }),
    "funnel_conversion" -> ((s, dir) => {
      // ordered-step funnel (view -> click -> purchase): step k counts
      // users whose earliest step-k event is at/after their step-(k-1)
      // entry. One keyed shuffle per step over a shrinking frame — no
      // per-user event lists. frac_of_first is one IEEE division of exact
      // longs (bit-identical cross-engine).
      graft.ops.EventAnalytics.funnel(
        events(s, dir).withColumn("tstamp", expr("timestamp_micros(ts div 1000)")),
        "user_id", "tstamp", "event_type", Seq("view", "click", "purchase"))
    }),
    "cohort_retention" -> ((s, dir) => {
      // first-activity-day cohorts × weekly retention: the classic
      // retention triangle. Dedupe to (user, day), per-user min day, join
      // back on the SAME user key (one exchange serves both), then
      // distinct users per (cohort, week) — integer date math throughout.
      graft.ops.EventAnalytics.cohortRetention(
        events(s, dir).withColumn("tstamp", expr("timestamp_micros(ts div 1000)")),
        "user_id", "tstamp")
    }),
    "growth_accounting" -> ((s, dir) => {
      // DAU decomposition: per day, new / returning (gap <= 7d) /
      // resurrected (gap > 7d) users from each user's lagged activity-day
      // sequence — integer date math, two keyed shuffles.
      graft.ops.EventAnalytics.growthAccounting(
        events(s, dir).withColumn("tstamp", expr("timestamp_micros(ts div 1000)")),
        "user_id", "tstamp", resurrectDays = 7)
    }),
    "ts_anomaly" -> ((s, dir) => {
      // windowed z-score anomaly flags over the daily rollup: mean and
      // variance of the TRAILING 7-day window from exact integer moments
      // (sum and sum-of-squares of integer-valued doubles — order-free,
      // so the scores replay bit-exactly), z = (x - mean)/stddev, flag at
      // |z| > 2. The window runs over the bounded daily aggregate.
      val daily = dailyValueRollup(s, dir, "x")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
      daily.select(col("event_type"), col("day"), col("x"),
          sum("x").over(w).as("s1"),
          sum(col("x") * col("x")).over(w).as("s2"),
          count(lit(1)).over(w).cast("double").as("wn"))
        .filter(col("wn") >= 4.0) // need history before scoring
        .withColumn("mean", col("s1") / col("wn"))
        .withColumn("var", (col("s2") - col("s1") * col("s1") / col("wn")) / col("wn"))
        .withColumn("z",
          when(col("var") <= 0.0, lit(0.0))
            .otherwise((col("x") - col("mean")) / sqrt(col("var"))))
        .select(col("event_type"), col("day"), col("x"),
          col("mean"), round(col("z"), 9).as("z9"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
    }),
    "a_cuped" -> ((s, dir) => {
      // CUPED variance-reduced A/B readout (Deng et al. WSDM'13): units =
      // users, arm = user_id parity (a deterministic stand-in for an
      // assignment table), covariate x = each user's view/click value
      // mass, experiment metric y = their purchase/other value mass —
      // correlated through per-user activity level, so the adjustment
      // does real work. All moments are exact integer-valued doubles; the
      // derived doubles replay bit-exactly (the ts_anomaly convention).
      val ev = events(s, dir)
      val units = ev.groupBy(col("user_id")).agg(
        coalesce(sum(when(col("event_type").isin("view", "click"),
          floor(col("value")))), lit(0.0)).as("x"),
        coalesce(sum(when(!col("event_type").isin("view", "click"),
          floor(col("value")))), lit(0.0)).as("y"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      graft.ops.EventAnalytics.cuped(units, "arm", "y", "x")
    }),
    "ts_moving_avg" -> ((s, dir) => {
      // 7-day moving window over the daily per-type rollup: rolling sum +
      // average of integer-valued daily totals (ROWS BETWEEN 6 PRECEDING
      // AND CURRENT ROW — count-based, so row 1 averages 1 day, row 7+
      // averages 7). The window runs over the BOUNDED daily aggregate
      // (|types| x |days| rows), never the raw events.
      val daily = dailyValueRollup(s, dir, "day_sum")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily.select(col("event_type"), col("day"),
        col("day_sum"),
        sum(col("day_sum")).over(w).as("sum_7d"),
        (sum(col("day_sum")).over(w) / count(lit(1)).over(w)).as("avg_7d"))
    })
  )

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    Map(
      "ts_gapfill" ->
        """WITH agg AS (
              SELECT event_type, date_trunc('hour', ts) AS h,
                     count(*) AS n, sum(floor(value)) AS vs
              FROM events GROUP BY 1, 2),
            bounds AS (
              SELECT date_trunc('hour', min(ts)) AS lo,
                     date_trunc('hour', max(ts)) AS hi
              FROM events),
            hours AS (
              SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds),
            keys AS (SELECT DISTINCT event_type FROM events)
           SELECT k.event_type,
                  strftime(hr.h, '%Y-%m-%d %H:%M:%S') AS hour,
                  coalesce(a.n, 0) AS n_events,
                  CAST(coalesce(a.vs, 0) AS DOUBLE) AS value_floor_sum
           FROM hours hr CROSS JOIN keys k
           LEFT JOIN agg a ON a.event_type = k.event_type AND a.h = hr.h""",
      "funnel_conversion" ->
        """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS tu, event_type
                       FROM events),
            s1 AS (SELECT user_id, min(tu) AS e FROM ev
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT ev.user_id, min(ev.tu) AS e FROM ev
                   JOIN s1 ON ev.user_id = s1.user_id AND ev.tu >= s1.e
                   WHERE ev.event_type = 'click' GROUP BY 1),
            s3 AS (SELECT ev.user_id, min(ev.tu) AS e FROM ev
                   JOIN s2 ON ev.user_id = s2.user_id AND ev.tu >= s2.e
                   WHERE ev.event_type = 'purchase' GROUP BY 1),
            c AS (SELECT 1 AS step_index, 'view' AS step, count(*) AS n_users FROM s1
                  UNION ALL SELECT 2, 'click', count(*) FROM s2
                  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
           SELECT CAST(step_index AS BIGINT) AS step_index, step, n_users,
                  CASE WHEN (SELECT n_users FROM c WHERE step_index = 1) = 0
                       THEN 0.0
                       ELSE CAST(n_users AS DOUBLE) /
                         (SELECT n_users FROM c WHERE step_index = 1)
                  END AS frac_of_first
           FROM c""",
      "cohort_retention" ->
        """WITH days AS (
              SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
            coh AS (SELECT u, min(d) AS cohort FROM days GROUP BY 1)
           SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
                  CAST(date_diff('day', cohort, d) // 7 AS BIGINT) AS week_offset,
                  CAST(count(DISTINCT u) AS BIGINT) AS n_users
           FROM days JOIN coh USING (u) GROUP BY 1, 2""",
      "growth_accounting" ->
        """WITH days AS (
              SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
            l AS (SELECT u, d,
                         date_diff('day',
                                   lag(d) OVER (PARTITION BY u ORDER BY d),
                                   d) AS gap
                  FROM days)
           SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS n_active,
                  count(*) FILTER (gap IS NULL) AS n_new,
                  count(*) FILTER (gap IS NOT NULL AND gap <= 7) AS n_returning,
                  count(*) FILTER (gap > 7) AS n_resurrected
           FROM l GROUP BY 1""",
      "ts_anomaly" ->
        """WITH daily AS (
              SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                     CAST(sum(floor(value)) AS DOUBLE) AS x
              FROM events GROUP BY 1, 2),
            m AS (
              SELECT event_type, day, x,
                     sum(x) OVER w AS s1, sum(x * x) OVER w AS s2,
                     CAST(count(*) OVER w AS DOUBLE) AS wn
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
            c AS (
              SELECT event_type, day, x, s1 / wn AS mean,
                     CASE WHEN (s2 - s1 * s1 / wn) / wn <= 0 THEN 0.0
                          ELSE (x - s1 / wn)
                               / sqrt((s2 - s1 * s1 / wn) / wn) END AS z
              FROM m WHERE wn >= 4)
           SELECT event_type, day, x, mean, round(z, 9) AS z9,
                  abs(z) > 2.0 AS is_anomaly
           FROM c""",
      "a_cuped" ->
        """WITH u AS (
              SELECT user_id, user_id % 2 AS arm,
                     CAST(coalesce(sum(floor(value))
                       FILTER (event_type IN ('view', 'click')), 0) AS DOUBLE) AS x,
                     CAST(coalesce(sum(floor(value))
                       FILTER (event_type NOT IN ('view', 'click')), 0) AS DOUBLE) AS y
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT CAST(count(*) AS DOUBLE) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy
              FROM u),
            t AS (
              SELECT CASE WHEN n * sxx - sx * sx <= 0 THEN 0.0
                          ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx)
                     END AS theta,
                     sx / n AS mxg
              FROM g),
            a AS (
              SELECT arm, count(*) AS n_units,
                     sum(x) AS sxa, sum(y) AS sya,
                     sum(x * x) AS sxxa, sum(y * y) AS syya,
                     sum(x * y) AS sxya
              FROM u GROUP BY 1)
           SELECT a.arm, a.n_units,
                  round(a.sya / a.n_units, 9) AS mean_y,
                  round(a.sya / a.n_units
                    - t.theta * (a.sxa / a.n_units - t.mxg), 9) AS mean_y_cuped,
                  round(a.syya / a.n_units
                    - (a.sya / a.n_units) * (a.sya / a.n_units), 9) AS var_y,
                  round((a.syya / a.n_units
                      - (a.sya / a.n_units) * (a.sya / a.n_units))
                    - 2.0 * t.theta * (a.sxya / a.n_units
                      - (a.sxa / a.n_units) * (a.sya / a.n_units))
                    + t.theta * t.theta * (a.sxxa / a.n_units
                      - (a.sxa / a.n_units) * (a.sxa / a.n_units)), 9)
                    AS var_y_cuped,
                  round(t.theta, 9) AS theta
           FROM a, t""",
      "ts_moving_avg" ->
        """WITH daily AS (
              SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                     CAST(sum(floor(value)) AS DOUBLE) AS day_sum
              FROM events GROUP BY 1, 2)
           SELECT event_type, day, day_sum,
                  sum(day_sum) OVER w AS sum_7d,
                  sum(day_sum) OVER w / count(*) OVER w AS avg_7d
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
    )
  }
}
