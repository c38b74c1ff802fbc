package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams: time-series gap filling,
  * ordered-step funnels, and cohort retention. The reference engine has no
  * temporal analytics tier (SURVEY §2.E); these are the standard OLAP
  * queries a telemetry/training-data pipeline runs next to its DP rollups,
  * expressed as declarative Spark plans (no driver-side iteration):
  *
  *  - [[gapFillHourly]]: resample to a dense per-(key, hour) grid with
  *    zero-filled gaps. The grid is GENERATED (sequence over the one-row
  *    min/max aggregate × distinct keys), never materialized from data, so
  *    its size is |keys| × |hours| regardless of event volume.
  *  - [[funnel]]: per-user ordered step progression (step k counts only
  *    users whose earliest step-k event is at/after their step-(k-1) entry
  *    time). One keyed shuffle per step on a frame that only shrinks —
  *    the standard scale shape; no per-user event lists are ever collected.
  *  - [[cohortRetention]]: first-activity cohorts × weekly activity. Two
  *    keyed shuffles (per-user first day, then per-(cohort, week) distinct
  *    users) over a deduplicated (user, day) frame.
  *
  * All three are deterministic (no floats except exact integer-valued
  * sums/ratios), so they are oracle-exact against DuckDB replays.
  */
object EventAnalytics {

  /** Dense hourly rollup with zero-filled gaps: every (key, hour) cell
    * between the corpus-wide min and max hour appears exactly once, with
    * n_events=0 / value_floor_sum=0.0 where no events landed. `tsCol` must
    * be a timestamp column; values are floor()ed so the double sum is
    * integer-exact (the engine-wide float-parity convention).
    *
    * Plan shape: one map-side-combined aggregate over events, a one-row
    * min/max aggregate, a generated grid (sequence explode × distinct
    * keys), and a broadcast-sized left join of the aggregate onto the
    * grid. The grid and the aggregate are both bounded by
    * |keys| × |hours| — driver-independent and tiny relative to the scan
    * at any scale. */
  def gapFillHourly(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String): DataFrame = {
    val ev = df.select(col(keyCol).as("k"),
      date_trunc("hour", col(tsCol)).as("h"),
      floor(col(valueCol)).as("v"))
    // bounds and keys derive from the CHECKPOINTED cell aggregate (a
    // |keys| x |hours|-bounded frame), not the raw input — one events
    // scan total instead of three independent aggregate subtrees
    val agg = ev.groupBy("k", "h")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("value_floor_sum"))
      .localCheckpoint(false)
    val hours = agg.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val keys = agg.select("k").distinct()
    hours.crossJoin(keys)
      .join(agg, Seq("k", "h"), "left")
      .select(col("k").as(keyCol),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_floor_sum"), lit(0.0)).as("value_floor_sum"))
  }

  /** Per-step funnel entry frames: element k is one row per user still in
    * the funnel at step k, (u, entry). Each frame is localCheckpoint'ed
    * because it is consumed at least twice (its own count / release + the
    * next step's join build side); without it Catalyst re-derives every
    * prefix of the chain per consumer and the events scan runs
    * O(steps^2) times. Shared by [[funnel]] and the DP funnel release. */
  def funnelEntryFrames(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    val ev = df.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(typeCol).as("ty"))
    steps.zipWithIndex
      .foldLeft(List.empty[DataFrame]) { case (acc, (step, i)) =>
        val cur =
          if (i == 0)
            ev.filter(col("ty") === step).groupBy("u").agg(min("t").as("entry"))
          else {
            val prev = acc.head.select(col("u"), col("entry").as("prev_entry"))
            ev.filter(col("ty") === step)
              .join(prev, "u")
              .filter(col("t") >= col("prev_entry"))
              .groupBy("u").agg(min("t").as("entry"))
          }
        cur.localCheckpoint(false) :: acc
      }.reverse
  }

  /** Ordered-step funnel: for each step k, the number of users whose
    * earliest qualifying step-k event occurs at/after their step-(k-1)
    * entry time (entry time of step 1 = earliest step-1 event). Events at
    * the SAME timestamp as the previous step's entry DO qualify (ties
    * advance — two steps logged in the same batch tick should not break
    * the funnel); the oracle replays the same `>=` rule.
    *
    * Emits one row per step: (step_index, step, n_users, frac_of_first)
    * where frac_of_first is n_users(step)/n_users(step 1) — a single IEEE
    * division of exact longs, bit-identical in any engine. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val entries = funnelEntryFrames(df, userCol, tsCol, typeCol, steps)
    val counts = entries.zip(steps).zipWithIndex.map { case ((f, step), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_index"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_.unionByName(_))
    val first = counts.filter(col("step_index") === 1L)
      .select(col("n_users").as("__first"))
    counts.crossJoin(broadcast(first))
      .select(col("step_index"), col("step"), col("n_users"),
        // explicit zero-entrants arm: Spark's non-ANSI double division by
        // zero yields SQL NULL (not the IEEE inf/nan an oracle's division
        // would produce) — pin both engines to "no entrants -> 0.0"
        when(col("__first") === 0L, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("__first"))
          .as("frac_of_first"))
  }

  /** Per-user retention cells: one row per (user, cohort_day, week_offset)
    * the user is active in (cohort = first activity day, weeks bucket by
    * 7 days). Shared by [[cohortRetention]] and the DP retention release
    * so the cohort/week definition cannot drift between the exact query
    * and its DP twin. */
  def retentionCells(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val cohorts = days.groupBy("u").agg(min("d").as("cohort"))
    days.join(cohorts, "u")
      .select(col("u"),
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        floor(datediff(col("d"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .distinct()
  }

  /** Cohort retention: users are cohorted by their first-activity DAY and
    * counted as retained in week w if they have any activity in day range
    * [cohort + 7w, cohort + 7w + 7). Emits one row per (cohort_day,
    * week_offset) with n_users — the retention matrix an analytics stack
    * draws as the classic triangle chart.
    *
    * Plan: dedupe to (user, day) [one shuffle, map-side combined], per-user
    * min day [reuses the user key], join back on user [same key — a single
    * exchange serves both], then count distinct users per (cohort, week).
    * No driver participation; all arithmetic is integer date math. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame =
    // retentionCells is already distinct on (u, cohort_day, week_offset),
    // so a plain count equals countDistinct(u) without the second
    // expand/dedup aggregation pass
    retentionCells(df, userCol, tsCol)
      .groupBy("cohort_day", "week_offset")
      .agg(count(lit(1)).as("n_users"))

  /** Per-group winsorization profile: exact p-lo / p-hi percentiles of the
    * floor()ed value per key, plus the clamped sum — the outlier-capping
    * numbers a feature pipeline thresholds against. Exact interpolated
    * percentile is a sort-based agg per group (the text_length_quantiles
    * convention: at 100 TB swap in percentile_approx, same query shape —
    * the oracle anchors exactness here).
    *
    * The CLAMP bounds are integerized (floor(p_lo), ceil(p_hi)) so the
    * clamped sum is a sum of integer-valued doubles — exact and
    * summation-order-free, hence hashable cross-engine. The raw
    * interpolated percentiles are emitted alongside. */
  def winsorizeProfile(df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, s"bad percentile range [$pLo, $pHi]")
    // fail loud on NULL values: percentile() SKIPS nulls while the clamp
    // pass's greatest(NULL, clo) would impute clo — each NULL row would
    // silently inflate clamped_sum by floor(p_lo) and count in n_rows on
    // a basis the percentiles never saw
    val v = when(col(valueCol).isNull, raise_error(lit(
        s"winsorizeProfile: NULL $valueCol — the percentile basis skips " +
          "nulls but the clamp would impute the low bound; filter or " +
          "impute upstream")).cast("double"))
      .otherwise(floor(col(valueCol)).cast("double"))
    val withQ = df.select(col(keyCol).as("k"), v.as("v"))
      .groupBy("k")
      .agg(expr(s"percentile(v, array(${pLo}D, ${pHi}D))").as("q"))
      .select(col("k"), element_at(col("q"), 1).as("lo"),
        element_at(col("q"), 2).as("hi"))
    // clamped sum needs a second pass with the per-key bounds: broadcast
    // the bounded per-key table back onto the scan. eqNullSafe: a NULL
    // key forms a real group in the percentile aggregate (groupBy keeps
    // it, as does the oracle's GROUP BY) — a plain equi-join would
    // silently drop that whole group from the output
    val bounds = withQ.select(col("k").as("__bk"), col("lo"), col("hi"),
      floor(col("lo")).as("clo"), ceil(col("hi")).as("chi"))
    df.select(col(keyCol).as("k"), v.as("v"))
      .join(broadcast(bounds), col("k") <=> col("__bk"))
      .groupBy("k")
      .agg(sum(least(greatest(col("v"), col("clo")), col("chi")))
          .cast("double").as("clamped_sum"),
        first(col("lo")).as("p_lo"), first(col("hi")).as("p_hi"),
        count(lit(1)).as("n_rows"))
      .select(col("k").as(keyCol), col("p_lo"), col("p_hi"), col("n_rows"),
        col("clamped_sum"))
  }

  /** Per-user session SEQUENCES (gaps-and-islands, `gapMicros` inactivity
    * split): one row per (user, session) with the ordered event-type path
    * ("view>click>purchase") — the behavioral-sequence extraction a
    * session-modeling pipeline feeds downstream. Ordering inside a session
    * is pinned by (ts, event_id), so the emitted path is deterministic
    * under ties and replays exactly in any engine.
    *
    * `tsCol` must be epoch MICROS (long) — the caller converts once at the
    * edge (the ss_session_agg convention). Plan: one shuffle on user (the
    * lag window and the session group share the key), per-session state
    * bounded by session length. */
  def sessionSequences(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("tu"), col("eid"))
    val ev = df.select(col(userCol).as("u"), col(tsCol).as("tu"),
        col(typeCol).as("ty"), col(idCol).as("eid"))
      .withColumn("brk",
        when(col("tu") - lag(col("tu"), 1).over(byUser) >= gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(byUser))
    ev.groupBy(col("u"), col("sid"))
      .agg(min(col("tu")).as("session_start"),
        count(lit(1)).as("n_events"),
        concat_ws(">",
          transform(sort_array(collect_list(struct(col("tu"), col("eid"), col("ty")))),
            x => x.getField("ty"))).as("seq"))
      .select(col("u").as(userCol), col("session_start"), col("n_events"),
        col("seq"))
  }

  /** Adjacent (prev, cur) event pairs per user under the canonical
    * (ts, event_id) order — one row per transition, (u, prev, cur).
    * Shared by [[transitionCounts]] and the DP transition release so the
    * ordering/tie-break rule cannot drift between the exact query and
    * its DP twin. */
  def transitionPairs(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("tu"), col("eid"))
    df.select(col(userCol).as("u"), col(tsCol).as("tu"),
        col(typeCol).as("cur"), col(idCol).as("eid"))
      .withColumn("prev", lag(col("cur"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("u"), col("prev"), col("cur"))
  }

  /** First-order TRANSITION COUNTS between consecutive events per user
    * (the empirical Markov matrix of a clickstream): for every adjacent
    * (prev, cur) pair in a user's (ts, event_id)-ordered history, the
    * global count and the per-prev row fraction. One keyed shuffle for
    * the lag window, one map-side-combined aggregate over the bounded
    * (|types|^2) pair space; the fraction is a single IEEE division of
    * exact longs. */
  def transitionCounts(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    // the |types|^2-bounded pair table is consumed twice (rows + row
    // totals); checkpointing it keeps the totals branch from re-deriving
    // the whole window chain over the raw events
    val pairs = transitionPairs(df, userCol, tsCol, typeCol, idCol)
      .groupBy("prev", "cur").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val totals = pairs.groupBy(col("prev").as("__p"))
      .agg(sum("n").as("__row_total"))
    pairs.join(broadcast(totals), col("prev") === col("__p"))
      .select(col("prev"), col("cur"), col("n"),
        (col("n").cast("double") / col("__row_total")).as("frac"))
  }

  /** Per-(user, day) activity classification: one row per active day with
    * kind in {new, returning, resurrected} by the gap to the user's
    * previous active day. Shared by [[growthAccounting]] and the DP
    * growth release so the gap rule cannot drift. */
  def activityKinds(df: DataFrame, userCol: String, tsCol: String,
      resurrectDays: Int = 7): DataFrame = {
    require(resurrectDays >= 1, s"resurrectDays must be >= 1, got $resurrectDays")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("d")
    df.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(byUser)))
      .select(col("u"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        when(col("gap").isNull, "new")
          .when(col("gap") <= resurrectDays, "returning")
          .otherwise("resurrected").as("kind"))
  }

  /** GROWTH ACCOUNTING: per activity day, how many users are new (first
    * day ever), returning (previous activity <= `resurrectDays` ago), or
    * resurrected (a gap longer than `resurrectDays`) — the
    * new/returning/resurrected decomposition of a DAU curve. Dedupe to
    * (user, day), lag over each user's day sequence, classify, roll up:
    * two keyed shuffles, integer date math only. */
  def growthAccounting(df: DataFrame, userCol: String, tsCol: String,
      resurrectDays: Int = 7): DataFrame =
    activityKinds(df, userCol, tsCol, resurrectDays)
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("kind") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("kind") === "returning", 1L).otherwise(0L)).as("n_returning"),
        sum(when(col("kind") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi, Walker,
    * WSDM'13 "Improving the sensitivity of online controlled experiments
    * by utilizing pre-experiment data") — the standard A/B-testing
    * adjustment at experimentation-platform scale: each unit's experiment
    * metric Y is shifted by its pre-experiment covariate X,
    * Y' = Y - theta * (X - mean(X)), with theta = cov(X, Y) / var(X)
    * estimated POOLED over all units (the paper's recommendation — a
    * per-arm theta biases the delta under treatment-covariate imbalance).
    * The adjustment leaves every arm's expected mean unchanged (X
    * predates assignment, so E[X | arm] is constant) and cuts the
    * variance of the mean by the factor (1 - rho^2).
    *
    * `units` carries ONE ROW PER EXPERIMENTAL UNIT with an arm label and
    * INTEGER-VALUED doubles `y` / `x` (the engine-wide float-parity
    * convention: integer-valued sums are exact and order-free, so every
    * derived double below is a fixed expression over exact integers —
    * bit-reproducible in any engine). NULL y/x/arm fail loud — a silently
    * skipped unit would bias the readout.
    *
    * Output: one row per arm — (arm, n_units, mean_y, mean_y_cuped,
    * var_y, var_y_cuped, theta), variances population-style; derived
    * doubles rounded to 9 places (the ts_anomaly parity convention).
    * var_y_cuped applies var(Y - theta X) = var(Y) - 2 theta cov(X, Y)
    * + theta^2 var(X) per arm — never above var_y when theta is the
    * pooled OLS slope and arms mirror the pooled covariance (exactly the
    * regime CUPED assumes). Degenerate var(X) = 0 yields theta = 0 (the
    * adjustment is a no-op, not a NaN).
    *
    * Plan shape: two map-side-combined aggregations over the units frame
    * (per-arm moments + a ONE-ROW pooled-moment frame broadcast back) —
    * no window, no per-unit shuffle beyond the aggregations; |arms| rows
    * out. */
  /** Experiment POWER ANALYSIS — the planning half of the A/B tier
    * ([[cuped]] is the readout half): units per arm for a two-sample
    * z-test to detect an absolute effect `mde` on a metric with
    * per-unit stddev `sigma`, at two-sided significance `alpha` and
    * `power`:  n = 2 (z_{1-alpha/2} + z_{power})^2 sigma^2 / mde^2,
    * with CUPED's variance reduction applied as sigma^2 (1 - rho^2)
    * when the pre-experiment covariate correlation `cupedRho` is known
    * — exactly the factor the [[cuped]] adjustment realizes. Pure
    * driver math (normal quantiles via the engine's Phi inverse);
    * returns the exact real-valued requirement — callers ceil. */
  def sampleSizePerArm(mde: Double, sigma: Double, alpha: Double = 0.05,
      power: Double = 0.8, cupedRho: Double = 0.0): Double = {
    require(mde > 0, s"mde must be positive, got $mde")
    require(sigma > 0, s"sigma must be positive, got $sigma")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    require(power > 0 && power < 1, s"power must be in (0, 1), got $power")
    require(cupedRho >= -1 && cupedRho <= 1,
      s"cupedRho must be in [-1, 1], got $cupedRho")
    val za = graft.core.DpNoise.phiInverse(1.0 - alpha / 2.0)
    val zb = graft.core.DpNoise.phiInverse(power)
    val varFactor = 1.0 - cupedRho * cupedRho
    2.0 * (za + zb) * (za + zb) * sigma * sigma * varFactor / (mde * mde)
  }

  def cuped(units: DataFrame, armCol: String, yCol: String,
      xCol: String, experimentCols: Seq[String] = Nil): DataFrame = {
    def checked(n: String, what: String) =
      when(col(n).isNull, raise_error(lit(
        s"cuped: NULL $what — every unit needs a concrete value; " +
          "coalesce or filter upstream")).cast("double"))
        .otherwise(col(n).cast("double"))
    val armChecked = when(col(armCol).isNull, raise_error(lit(
        "cuped: NULL arm label — an unlabeled unit belongs to no arm; " +
          "coalesce or filter upstream")).cast(units.schema(armCol).dataType))
      .otherwise(col(armCol)).as("arm")
    // FLEET shape: with `experimentCols` the whole readout runs per
    // experiment in the same two aggregations — theta pools WITHIN each
    // experiment (a cross-experiment theta would blend unrelated metric
    // scales), arms join their own experiment's pooled moments. NULL
    // experiment keys fail loud like arms.
    val expChecked = experimentCols.map { n =>
      when(col(n).isNull, raise_error(lit(
        s"cuped: NULL experiment key '$n' — an unlabeled unit belongs " +
          "to no experiment; coalesce or filter upstream"))
        .cast(units.schema(n).dataType))
        .otherwise(col(n)).as(n)
    }
    val expCs = experimentCols.map(col)
    val u = units.select(expChecked ++ Seq(armChecked,
      checked(yCol, s"y ($yCol)").as("__y"),
      checked(xCol, s"x ($xCol)").as("__x")): _*)
      .localCheckpoint(false) // pooled + per-arm moments share one pass
    val pooledAggs = Seq(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val pooled =
      if (experimentCols.isEmpty) u.agg(pooledAggs.head, pooledAggs.tail: _*)
      else u.groupBy(expCs: _*).agg(pooledAggs.head, pooledAggs.tail: _*)
    val byArm = u.groupBy(expCs :+ col("arm"): _*).agg(
      count(lit(1)).as("n_units"),
      sum(col("__x")).as("__sxa"), sum(col("__y")).as("__sya"),
      sum(col("__x") * col("__x")).as("__sxxa"),
      sum(col("__y") * col("__y")).as("__syya"),
      sum(col("__x") * col("__y")).as("__sxya"))
    val varXn = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val theta = when(varXn <= 0.0, lit(0.0))
      .otherwise((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
        varXn)
    val na = col("n_units").cast("double")
    val meanY = col("__sya") / na
    val meanXa = col("__sxa") / na
    val meanXg = col("__sx") / col("__n")
    val varY = col("__syya") / na - meanY * meanY
    val covA = col("__sxya") / na - meanXa * meanY
    val varXa = col("__sxxa") / na - meanXa * meanXa
    val joined =
      if (experimentCols.isEmpty) byArm.crossJoin(broadcast(pooled))
      else byArm.join(broadcast(pooled), experimentCols)
    joined
      .withColumn("__theta", theta)
      .select(expCs ++ Seq(col("arm"), col("n_units"),
        round(meanY, 9).as("mean_y"),
        round(meanY - col("__theta") * (meanXa - meanXg), 9)
          .as("mean_y_cuped"),
        round(varY, 9).as("var_y"),
        round(varY - lit(2.0) * col("__theta") * covA +
          col("__theta") * col("__theta") * varXa, 9).as("var_y_cuped"),
        round(col("__theta"), 9).as("theta")): _*)
  }
}
