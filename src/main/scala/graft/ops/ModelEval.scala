package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for corpus filter models (the
  * quality / toxicity / language filters a 100 TB pipeline gates on):
  * threshold sweeps (PR curve points) and score calibration bins, both
  * computed over INTEGER-valued scores so every released number is an
  * exact BIGINT (counts and floor-scaled integer ratios — the engine's
  * float-parity convention; the ranking-quality relative is
  * [[Retrieval.rankingMetrics]], which evaluates retrieval lists rather
  * than pointwise classifiers).
  *
  * Contract: `scoreCol` must be integer-valued (scale upstream — e.g.
  * floor(score * 1000) milli-units); `labelCol` is boolean. NULL scores
  * or labels fail loud — a silently skipped row would bias every
  * denominator. Both operators are ONE map-side-combined aggregation
  * over the scored frame (the threshold sweep folds all thresholds into
  * one pass of conditional sums — no per-threshold scan, no row
  * blow-up), so the exchange is |thresholds| x 4 (or |bins|) cells no
  * matter the corpus size. */
object ModelEval {

  private def checkedScore(scoreCol: Column) =
    when(scoreCol.isNull, raise_error(lit(
      "ModelEval: NULL score — every row needs a concrete integer " +
        "score; coalesce or filter upstream")).cast("long"))
      .otherwise(scoreCol.cast("long"))

  private def checkedLabel(labelCol: Column) =
    when(labelCol.isNull, raise_error(lit(
      "ModelEval: NULL label — every row needs a concrete boolean " +
        "label; coalesce or filter upstream")).cast("boolean"))
      .otherwise(labelCol.cast("boolean"))

  /** PR-curve points at explicit integer `thresholds` (predict positive
    * iff score >= t): one row per threshold with the exact confusion
    * counts (tp, fp, fn, tn) and floor-scaled integer ratios —
    * precision_e6 = tp * 1e6 div (tp + fp), recall_e6, f1_e6 =
    * 2 tp * 1e6 div (2 tp + fp + fn) — -1 when the denominator is zero
    * (an empty-prediction precision is undefined, not 0; a sentinel
    * rather than NULL so the released frame stays hashable without
    * NULL-comparison semantics). All thresholds evaluate in ONE
    * aggregation pass (4 conditional sums per threshold, stacked to
    * rows afterwards). */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve: no thresholds")
    require(thresholds.distinct.size == thresholds.size,
      s"prCurve: duplicate thresholds in $thresholds")
    val sc = checkedScore(scoreCol)
    val lb = checkedLabel(labelCol)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(sc >= t && lb, 1L).otherwise(0L)).as(s"__tp_$i"),
      sum(when(sc >= t && !lb, 1L).otherwise(0L)).as(s"__fp_$i"),
      sum(when(sc < t && lb, 1L).otherwise(0L)).as(s"__fn_$i"),
      sum(when(sc < t && !lb, 1L).otherwise(0L)).as(s"__tn_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = one.select(explode(array(
      thresholds.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("threshold"),
          coalesce(col(s"__tp_$i"), lit(0L)).as("tp"),
          coalesce(col(s"__fp_$i"), lit(0L)).as("fp"),
          coalesce(col(s"__fn_$i"), lit(0L)).as("fn"),
          coalesce(col(s"__tn_$i"), lit(0L)).as("tn"))
      }: _*)).as("__r")).select(col("__r.*"))
    rows.select(col("threshold"), col("tp"), col("fp"), col("fn"),
      col("tn"),
      when(col("tp") + col("fp") > 0,
        expr("tp * 1000000 div (tp + fp)")).otherwise(lit(-1L))
        .as("precision_e6"),
      when(col("tp") + col("fn") > 0,
        expr("tp * 1000000 div (tp + fn)")).otherwise(lit(-1L))
        .as("recall_e6"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        expr("2 * tp * 1000000 div (2 * tp + fp + fn)")).otherwise(lit(-1L))
        .as("f1_e6"))
  }

  /** Score-calibration bins over the PUBLIC integer range [lo, hi):
    * `nBins` equal-width bins (integer arithmetic: bin =
    * (s - lo) * nBins div (hi - lo), clamped to the edge bins — out-of-
    * range scores CLAMP rather than drop, so every row is accounted),
    * each releasing its exact count, positive count, floor-scaled
    * positive rate (pos_rate_e6 = n_pos * 1e6 div n) and mean score in
    * the score's own integer units (mean_score = sum div n — integer
    * division TRUNCATING TOWARD ZERO, Spark's `div` == DuckDB's `//`;
    * note this differs from floor for bins whose score sum is negative:
    * sum=-7, n=2 releases -3, not -4). Reading pos_rate against
    * mean_score per bin IS the
    * reliability diagram; its deviations are what ECE summarizes. Empty
    * bins do not appear (calibration is a per-observed-bin statement —
    * nothing hides, the bin grid is public). */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 4096, s"nBins must be in [2, 4096], got $nBins")
    require(lo < hi, s"empty score range [$lo, $hi)")
    val sc = checkedScore(scoreCol)
    val lb = checkedLabel(labelCol)
    val width = hi - lo
    // integer bin arithmetic, spelled as one expression so the SQL
    // replay states it verbatim
    val binExpr = least(greatest(
      expr(s"(__s - $lo) * $nBins div $width"), lit(0L)),
      lit((nBins - 1).toLong))
    df.select(sc.as("__s"), lb.as("__l"))
      .select(binExpr.as("bin"), col("__s"), col("__l"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_e6"),
        expr("__sum div n").as("mean_score"))
  }
}
