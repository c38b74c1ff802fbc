package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LOCAL differential privacy — the trust model the central engine
  * ([[DPEngine]]) cannot express: each privacy unit RANDOMIZES ITS OWN
  * report before anything aggregates, so the collector never holds true
  * values at all (the telemetry/federated shape; Warner's randomized
  * response lineage, deployed as RAPPOR / Apple's CMS / Chrome's
  * telemetry). The engine-side job is exact bit aggregation + the
  * unbiased debiasing estimate — both pure post-processing of the
  * already-private reports.
  *
  * [[ldpFrequency]] implements symmetric UNARY ENCODING (basic one-hot
  * RAPPOR): a PUBLIC domain of k values, each unit's value one-hot
  * encodes to k bits, and every bit independently reports truthfully
  * with probability p = e^(eps/2) / (e^(eps/2) + 1) and flips otherwise
  * (equivalently: a false bit reports 1 with q = 1 - p). Two one-hot
  * vectors differ in exactly 2 bits, each bit's report is
  * (eps/2)-LDP, so the whole report is eps-LDP by composition. The
  * frequency estimate debiases the observed ones-count:
  * est_j = (c_j - n q) / (p - q) — unbiased for the true count.
  *
  * Contracts (the engine's conventions): the domain is PUBLIC and
  * closed — a value outside it fails loud (silently dropping or
  * bucketing it would misstate n in the debiasing); NULL values fail
  * loud; each unit contributes exactly ONE report (the L0 = 1 bound —
  * the deterministic lowest-value row per unit; route multi-report
  * designs through explicit budget splits). Zero noise
  * ([[graft.core.NoiseSource.Zero]]: uniform() = 0.5 never clears a
  * sub-0.5 flip probability, and p > 0.5 > q for every eps > 0) reports
  * exact one-hot bits, so the released frame is a deterministic
  * function of exact counts — the oracle replays the whole estimator.
  *
  * Scale shape: one window rank per unit (the cap), one map-only
  * flip-and-explode (k small, the report is the unit's k-bit row), one
  * map-side-combined aggregation to (k) rows. Nothing data-shaped
  * collects or broadcasts. */
object LocalDP {

  def ldpFrequency(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): DataFrame = {
    require(domain.nonEmpty, "ldpFrequency: empty domain")
    require(domain.distinct.size == domain.size,
      s"ldpFrequency: duplicate domain values in $domain")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val k = domain.size
    val expHalf = math.exp(epsilon / 2.0)
    val p = expHalf / (expHalf + 1.0)
    val q = 1.0 / (expHalf + 1.0)
    val domainArr = domain.toArray
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpFrequency: NULL value for a privacy unit — nulls have no " +
          "one-hot encoding; filter or impute upstream")).cast("string"))
      .otherwise(valueCol.cast("string"))
    // one report per unit: the deterministic lowest value (L0 = 1)
    val perUnit = df
      .select(col(pidCol).as("__pid"), checked.as("__v"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__pid")).orderBy(col("__v").asc)))
      .filter(col("__rk") === 1)
    // the LOCAL randomizer: one-hot encode + per-bit flip. Marked
    // nondeterministic so Catalyst never collapses or re-orders draws;
    // task retries re-randomize a unit's report (same attack model as
    // the central engine's noise, documented there).
    val flip = udf((v: String) => {
      val idx = domainArr.indexOf(v)
      if (idx < 0) throw new IllegalArgumentException(
        s"ldpFrequency: value '$v' outside the public domain — the " +
          "domain is closed (an unlisted value would silently misstate " +
          "n in the debiasing); extend the domain or filter upstream")
      val bits = new Array[Int](domainArr.length)
      var j = 0
      while (j < domainArr.length) {
        val b = if (j == idx) 1 else 0
        val flipProb = if (b == 1) 1.0 - p else q
        bits(j) = if (noise.uniform() < flipProb) 1 - b else b
        j += 1
      }
      bits
    }).asNondeterministic()
    perUnit
      .select(posexplode(flip(col("__v"))).as(Seq("__j", "__bit")))
      .groupBy(col("__j"))
      .agg(count(lit(1)).as("n_reports"),
        sum(col("__bit")).as("reported_ones"))
      .select(
        element_at(typedLit(domain), col("__j").cast("int") + 1).as("value"),
        col("n_reports"), col("reported_ones"),
        round((col("reported_ones") - col("n_reports") * lit(q)) /
          lit(p - q), 9).as("est_count"))
  }

  /** Human-readable release report for [[ldpFrequency]] — the engine's
    * explain convention for the LOCAL trust model: states the encoding,
    * the per-bit flip probabilities the randomizer uses, the debias
    * formula, and the estimator stddev at a given report count
    * (sqrt(n p (1 - p)) / (p - q) per value — the planning number: LDP
    * error grows with sqrt(n), so small cohorts cannot read small
    * frequencies). Pure string math — no data access. */
  def explainFrequency(k: Int, epsilon: Double, nReports: Long): String = {
    require(k >= 2, s"domain size must be >= 2, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(nReports >= 1, s"nReports must be >= 1, got $nReports")
    val expHalf = math.exp(epsilon / 2.0)
    val p = expHalf / (expHalf + 1.0)
    val q = 1.0 / (expHalf + 1.0)
    val std = math.sqrt(nReports * p * (1.0 - p)) / (p - q)
    s"""LocalDP frequency release (one-hot unary encoding)
       |  domain    : $k public values, one k-bit report per unit (L0 = 1: the deterministic lowest value)
       |  randomizer: per-bit truthful w.p. p = e^(eps/2)/(e^(eps/2)+1) = ${f"$p%g"}, flipped w.p. q = ${f"$q%g"} — two one-hot vectors differ in 2 bits, so the report is ${f"$epsilon%g"}-LDP (the collector never holds true values)
       |  estimator : est_j = (c_j - n q) / (p - q), unbiased; n = $nReports reports
       |  error     : per-value stddev ~ ${f"$std%g"} (grows with sqrt(n) — the LDP cost; central DP's noise is O(1) in n)
       |""".stripMargin
  }

  /** LOCAL-DP mean estimation — the 1-BIT mechanism (Duchi-Jordan-
    * Wainwright's minimax-rate randomizer, the LDP analogue of the
    * central engine's clamped mean): each unit's value clamps into the
    * PUBLIC [lo, hi], normalizes to x in [-1, 1], and the unit reports
    * ONE BIT b in {-1, +1} with P(b = +1) = 1/2 + x t / 2 where
    * t = (e^eps - 1)/(e^eps + 1) — eps-LDP by direct likelihood-ratio
    * check, and E[b] = x t, so mean(b)/t unbiasedly estimates mean(x)
    * and maps back to value units. Per-unit bound: ONE report (the
    * deterministic lowest clamped value); NULL values fail loud.
    *
    * Zero noise (uniform() = 0.5) reports b = sign(x): deterministic —
    * the released frame replays exactly (the gate convention; the
    * estimator's statistical behavior is spec-pinned under the real
    * randomizer). Output: one row — (n_reports, reported_plus_ones,
    * est_mean) with est_mean in value units, CLAMPED into [lo, hi]
    * (the raw debiased estimate can fall outside the domain under
    * noise; the domain is public, so clamping is free post-processing). */
  def ldpMean(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): DataFrame = {
    require(lo < hi, s"empty domain [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val t = (math.exp(epsilon) - 1.0) / (math.exp(epsilon) + 1.0)
    val mid = (lo + hi) / 2.0
    val half = (hi - lo) / 2.0
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpMean: NULL value for a privacy unit — nulls have no " +
          "normalization; filter or impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi))
    val perUnit = df
      .select(col(pidCol).as("__pid"), clamped.as("__v"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__pid")).orderBy(col("__v").asc)))
      .filter(col("__rk") === 1)
    // the local randomizer: x normalized, one {-1, +1} report. Marked
    // nondeterministic (the ldpFrequency rationale).
    val report = udf((v: Double) => {
      val x = (v - mid) / half
      val pPlus = 0.5 + x * t / 2.0
      if (noise.uniform() < pPlus) 1 else -1
    }).asNondeterministic()
    perUnit
      .select(report(col("__v")).as("__b"))
      .agg(count(lit(1)).as("n_reports"),
        sum(when(col("__b") === 1, 1L).otherwise(0L))
          .as("reported_plus_ones"),
        sum(col("__b")).cast("double").as("__sb"))
      .select(col("n_reports"), col("reported_plus_ones"),
        round(least(greatest(
          lit(mid) + (col("__sb") / col("n_reports").cast("double")) /
            lit(t) * lit(half), lit(lo)), lit(hi)), 9).as("est_mean"))
  }
}
