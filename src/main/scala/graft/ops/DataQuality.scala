package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declarative data-quality constraint (the Deequ/Great-Expectations
  * shape): each check contributes a violation count to ONE shared
  * aggregation pass, so a hundred checks still cost a single scan of the
  * table. NULL semantics follow the Deequ convention: value checks
  * ([[InRange]]/[[MatchesPattern]]/[[ContainedIn]]/[[Satisfies]]) evaluate
  * only NON-NULL values — nullness is its own dimension, asserted
  * explicitly with [[NotNull]] — so a sparse optional column can pass a
  * range check while failing completeness, and the two failure modes stay
  * separately attributable. */
sealed trait DQCheck extends Serializable {
  def name: String
  def kind: String
}
/** Completeness: a NULL is a violation. */
final case class NotNull(name: String, column: Column) extends DQCheck {
  def kind = "not_null"
}
/** Key uniqueness over one or more columns: violations = surplus rows
  * (`n_rows - n_distinct` over the key tuple). NOTE: `count(DISTINCT ...)`
  * EXCLUDES tuples with any NULL component, so every NULL-key row counts
  * as a violation under this formulation — a key with a missing component
  * cannot attest uniqueness. (Matches the DuckDB oracle exactly.) */
final case class Unique(name: String, columns: Seq[Column]) extends DQCheck {
  require(columns.nonEmpty, s"Unique '$name' needs at least one column")
  def kind = "unique"
}
/** Non-null values must lie in [lo, hi]. */
final case class InRange(name: String, column: Column, lo: Double, hi: Double)
    extends DQCheck {
  require(lo <= hi && !lo.isNaN && !hi.isNaN, s"InRange '$name': lo <= hi required")
  def kind = "in_range"
}
/** Non-null values must match the regex — RLIKE semantics (a match
  * ANYWHERE in the value; anchor with ^...$ for a full match), which is
  * also what SQL engines' regexp_matches does, so the check replays
  * verbatim. Keep the pattern to java ∩ RE2 syntax. */
final case class MatchesPattern(name: String, column: Column, regex: String)
    extends DQCheck {
  def kind = "matches_pattern"
}
/** Non-null values must be one of the allowed strings (categorical domain). */
final case class ContainedIn(name: String, column: Column, allowed: Seq[String])
    extends DQCheck {
  require(allowed.nonEmpty, s"ContainedIn '$name' needs a non-empty domain")
  def kind = "contained_in"
}
/** Generic row predicate over non-null... whatever the predicate consults:
  * a row where `predicate` evaluates to FALSE or NULL is a violation (a
  * NULL predicate means "could not establish the property" — counting it
  * as pass would let missing data satisfy any rule). */
final case class Satisfies(name: String, predicate: Column) extends DQCheck {
  def kind = "satisfies"
}

/** Declarative data-quality verification — the table-stakes validation
  * layer of a 100 TB pipeline (the workload Deequ/Great Expectations
  * serve), absent from the reference (no analog). All checks run in ONE
  * aggregation over one scan: per-check violation counts are conditional
  * sums, uniqueness checks are `count_distinct` columns in the same
  * aggregate (Catalyst plans multi-distinct via one expand — still a
  * single pass over the input), and the per-check report rows come from
  * exploding a literal-keyed struct array, never a driver loop. Every
  * output is an exact integer or a boolean, so the report is
  * oracle-replayable bit-for-bit. */
object DataQuality {

  /** One report row per check: `(check, kind, n_rows, n_violations,
    * passed)` where `passed = n_violations <= maxViolations` (default 0 =
    * hard constraint). Ordering is the declaration order via an explicit
    * `check_index` so downstream diffs are stable. */
  def verify(df: DataFrame, checks: Seq[DQCheck],
      maxViolations: Long = 0L): DataFrame =
    verifyImpl(df, Seq.empty, checks, maxViolations)

  /** The per-group face — one report row per (group, check), the
    * production monitoring shape ("which SOURCE went bad today"): same
    * single-pass contract as [[verify]], with the aggregation keyed by
    * `groupBy` (one map-side-combined shuffle on the group keys instead
    * of a global reduce). A group key named like a report column fails
    * loud (the DPEngine collision convention).
    *
    * STREAMING: the same call monitors a stream — pass a watermarked
    * frame and `window(col(ts), ...)` as a group key and the aggregation
    * runs as one stateful windowed agg (append mode; the report explode
    * is stateless post-processing). The one exclusion is [[Unique]],
    * whose count_distinct Spark does not support on streams — batch
    * audits keep it; stream==batch parity for the rest is spec-pinned. */
  def verifyByGroup(df: DataFrame, groupBy: Seq[(String, Column)],
      checks: Seq[DQCheck], maxViolations: Long = 0L): DataFrame = {
    require(groupBy.nonEmpty,
      "verifyByGroup needs at least one group key (use verify for global)")
    verifyImpl(df, groupBy, checks, maxViolations)
  }

  private val reportCols =
    Seq("check_index", "check", "kind", "n_rows", "n_violations", "passed")

  private def verifyImpl(df: DataFrame, groupBy: Seq[(String, Column)],
      checks: Seq[DQCheck], maxViolations: Long): DataFrame = {
    require(checks.nonEmpty, "at least one check is required")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    require(maxViolations >= 0, s"maxViolations must be >= 0, got $maxViolations")
    val badKeys = groupBy.map(_._1).filter(n =>
      reportCols.contains(n) || n.startsWith("__dq_"))
    require(badKeys.isEmpty,
      s"group key name(s) ${badKeys.mkString(", ")} collide with the report " +
        s"columns (${reportCols.mkString(", ")}) or the __dq_ namespace")
    val violationAggs: Seq[Column] = checks.map {
      case NotNull(n, c) =>
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__dq_$n")
      case Unique(n, cs) =>
        (count(lit(1)) - count_distinct(cs.head, cs.tail: _*)).as(s"__dq_$n")
      case InRange(n, c, lo, hi) =>
        sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
          .as(s"__dq_$n")
      case MatchesPattern(n, c, re) =>
        sum(when(c.isNotNull && !regexp_like(c.cast("string"), lit(re)), 1L)
          .otherwise(0L)).as(s"__dq_$n")
      case ContainedIn(n, c, allowed) =>
        sum(when(c.isNotNull &&
            !c.cast("string").isin(allowed.map(lit(_)): _*), 1L)
          .otherwise(0L)).as(s"__dq_$n")
      case Satisfies(n, p) =>
        // FALSE or NULL predicate = violation: missing data must not
        // satisfy a rule by default
        sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__dq_$n")
    }
    val allAggs = count(lit(1)).as("__dq_n") +: violationAggs
    val agged =
      if (groupBy.isEmpty) df.agg(allAggs.head, allAggs.tail: _*)
      else df.groupBy(groupBy.map { case (n, c) => c.as(n) }: _*)
        .agg(allAggs.head, allAggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i.toLong).as("check_index"), lit(c.name).as("check"),
        lit(c.kind).as("kind"),
        coalesce(col(s"__dq_${c.name}"), lit(0L)).cast("long")
          .as("n_violations"))
    }
    val keyCols = groupBy.map { case (n, _) => col(n) }
    agged
      .select(keyCols :+ col("__dq_n").as("n_rows") :+
        explode(array(rows: _*)).as("r"): _*)
      .select(keyCols ++ Seq(col("r.check_index"), col("r.check"),
        col("r.kind"), col("n_rows"), col("r.n_violations"),
        (col("r.n_violations") <= maxViolations).as("passed")): _*)
  }

  /** Row-level quarantine routing — the ENFORCEMENT half of [[verify]]:
    * the same checks evaluated PER ROW, every input row released with
    * `dq_violations` (the declaration-ordered names of the rules it
    * fails) and `dq_valid`; the pipeline then splits
    * `filter(col("dq_valid"))` / `filter(!col("dq_valid"))` and the
    * quarantined side carries its reasons (the dead-letter shape —
    * [[verify]] only REPORTS, routing is what a pipeline does next).
    *
    * Semantics per check mirror [[verify]]'s conditions row-wise; the
    * one deliberate difference is [[Unique]]: verify counts SURPLUS rows
    * (n - n_distinct), but routing cannot know which duplicate is
    * canonical, so EVERY member of a >1 key group quarantines, as does
    * every row with a NULL key component (it cannot attest uniqueness —
    * the same formulation note as verify). Row-local checks are pure
    * projections (map-only); each Unique adds one window count (a
    * shuffle on its key). */
  def quarantine(df: DataFrame, checks: Seq[DQCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check is required")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val bad = df.columns.filter(n =>
      n == "dq_valid" || n == "dq_violations" || n.startsWith("__dq_"))
    require(bad.isEmpty,
      s"input column(s) ${bad.mkString(", ")} collide with the quarantine " +
        "output columns (dq_valid, dq_violations) or the __dq_ namespace")
    val flags: Seq[(String, Column)] = checks.map {
      case NotNull(n, c) => n -> c.isNull
      case Unique(n, cs) =>
        val w = org.apache.spark.sql.expressions.Window.partitionBy(cs: _*)
        n -> (cs.map(_.isNull).reduce(_ || _) || count(lit(1)).over(w) > 1)
      case InRange(n, c, lo, hi) =>
        n -> (c.isNotNull && (c < lo || c > hi))
      case MatchesPattern(n, c, re) =>
        n -> (c.isNotNull && !regexp_like(c.cast("string"), lit(re)))
      case ContainedIn(n, c, allowed) =>
        n -> (c.isNotNull &&
          !c.cast("string").isin(allowed.map(lit(_)): _*))
      case Satisfies(n, p) => n -> !coalesce(p, lit(false))
    }
    df.withColumn("dq_violations", array_compact(array(
        flags.map { case (n, f) => when(f, lit(n)) }: _*)))
      .withColumn("dq_valid", size(col("dq_violations")) === 0)
  }

  /** Column profiling — the Deequ-ColumnProfiler analog that tells a user
    * what to even CHECK: one report row per profiled column with exact
    * counts (rows, nulls, distinct non-null PROFILED values — for
    * numerics that is distinct after the floor() integerization, the
    * representation the exact report is built on) plus type-appropriate
    * extremes — floor()-integerized min/max/sum for numeric columns
    * (exact BIGINTs: order-free, engine-replayable — float mean/stddev
    * deliberately stay OUT of the exact report), lexicographic min/max
    * for string columns. Mixed engines format floats differently, so
    * numerics never surface through the string fields and vice versa.
    *
    * Plan shape: the profiled columns are MELTED to (column, sval, nval)
    * rows — k rows per input row — then ONE two-phase aggregation:
    * groupBy (column, value) for exact distincts with map-side combine,
    * then groupBy column for the report. Linear in k·rows with thin
    * shuffle rows; the alternative (one multi-distinct aggregate over k
    * columns) plans a k-way EXPAND — the same row multiplication —
    * without the reusable value histogram. Profiling cost is k scans'
    * worth of shuffle on a table you are about to audit anyway. */
  /** The shared melt of the profiling family: (column_name, sval, nval,
    * dtype) rows, k per input row — one definition so the stats report and
    * the top-values histogram type-handle identically. */
  private def profileMelt(df: DataFrame, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    require(columns.nonEmpty, "at least one column to profile")
    require(columns.distinct.size == columns.size, "duplicate profile columns")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    columns.foreach(c => require(fields.contains(c),
      s"profileColumns: no column '$c' in ${df.columns.mkString(", ")}"))
    df.select(explode(array(columns.map { c =>
      val (sv, nv) = fields(c) match {
        // integral types cast directly — routing them through a double
        // would silently round values past 2^53 (snowflake-style ids) and
        // collapse adjacent ids in n_distinct
        case ByteType | ShortType | IntegerType | LongType =>
          (lit(null).cast("string"), col(c).cast("long"))
        // decimals floor in exact decimal arithmetic, then narrow
        case _: DecimalType =>
          (lit(null).cast("string"), floor(col(c)).cast("long"))
        case FloatType | DoubleType =>
          (lit(null).cast("string"),
            floor(col(c).cast("double")).cast("long"))
        case StringType => (col(c), lit(null).cast("long"))
        case dt => throw new IllegalArgumentException(
          s"profileColumns: unsupported type $dt for '$c' — profile " +
            "numeric and string columns (cast or extract upstream)")
      }
      struct(lit(c).as("column_name"), sv.as("sval"), nv.as("nval"),
        lit(fields(c).simpleString).as("dtype"))
    }: _*)).as("m")).select(col("m.*"))
  }

  def profileColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    profileMelt(df, columns)
      .groupBy(col("column_name"), col("dtype"), col("sval"), col("nval"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("column_name"), col("dtype"))
      .agg(
        sum(col("__c")).cast("long").as("n_rows"),
        coalesce(sum(when(col("sval").isNull && col("nval").isNull,
          col("__c"))), lit(0L)).cast("long").as("n_null"),
        count(when(col("sval").isNotNull || col("nval").isNotNull, lit(1)))
          .cast("long").as("n_distinct"),
        // sentinels instead of NULLs for the other type's fields (an
        // all-NULL column breaks exact hash comparison downstream and a
        // profiler consumer reads fields per dtype anyway): numeric
        // fields are 0 for string columns, string fields '' for numeric
        coalesce(min(col("nval")), lit(0L)).as("min_long"),
        coalesce(max(col("nval")), lit(0L)).as("max_long"),
        // the sum accumulates in DECIMAL so the value*count products of
        // huge integral ids cannot wrap; the final BIGINT cast fails loud
        // (ANSI) only if the TRUE sum exceeds long range
        coalesce(sum(col("nval").cast("decimal(38,0)") * col("__c")),
          lit(0L)).cast("long").as("sum_long"),
        coalesce(min(col("sval")), lit("")).as("min_str"),
        coalesce(max(col("sval")), lit("")).as("max_str"))
  }

  /** Top-k most frequent values per profiled column — the histogram half
    * of the Deequ profiler ("what does this column actually contain"):
    * one row per (column, value) in the top k by exact count, ties by
    * value ascending (deterministic). Values surface as STRINGS — the
    * numeric side through the same floor-integerized longs as
    * [[profileColumns]] (integers format identically in any engine;
    * raw floats would not) — NULLs excluded (they are [[profileColumns]]'
    * n_null, not a value). Same melt + one aggregation + one bounded
    * window per column. */
  def profileTopValues(df: DataFrame, columns: Seq[String],
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column_name")).orderBy(col("n").desc, col("value").asc)
    profileMelt(df, columns)
      .filter(col("sval").isNotNull || col("nval").isNotNull)
      .select(col("column_name"),
        coalesce(col("sval"), col("nval").cast("string")).as("value"))
      .groupBy(col("column_name"), col("value"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
