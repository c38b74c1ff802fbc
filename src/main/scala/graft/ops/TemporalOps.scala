package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks natively, composed the scale-correct way.
  *
  * As-of join (the time-series / attribution join: for each left row, the
  * latest right row with ts <= left ts, per key) is NOT expressed as a range
  * join — a `l.ts >= r.ts` theta-join explodes to O(|L|·|R|) per key before
  * aggregation. Instead both sides are union-tagged and merged through ONE
  * window over (key, ts): a single shuffle, sort-based, linear state — the
  * distributed merge-join formulation. At 100 TB this is the shape that
  * survives: one exchange by key, no pair blow-up, works for any key
  * cardinality (skewed keys sort within their partition).
  */
object TemporalOps {

  /** For each left row: `asofCol` = the greatest right `ts` with
    * right.ts <= left.ts for the same `key` (null when no such row).
    * Ties between a left and right row at the same ts match (inclusive
    * semantics, like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
    *
    * Both `ts` columns must be of a comparable orderable type (long
    * timestamps, timestamps, ...). Output = left columns + `asofCol`.
    */
  def asofJoinTs(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, asofCol: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 sorts right rows BEFORE left rows at equal ts => inclusive match
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(right.schema(rightTs).dataType))
    val r0 = right.select((keys.map(col) :+
      col(rightTs).as("__ts")): _*)
      .withColumn("__tag", lit(0))
      .withColumn("__rts", col("__ts"))
    // align schemas: right rows carry nulls for left payload columns
    val r = leftCols.foldLeft(r0) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__rts"))): _*)
    val u = l.select((leftCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__rts"))): _*)
      .unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ASOF equi-join semantics: NULL keys never match (NULL = NULL is
    // false in a join), but Window.partitionBy groups NULL keys into ONE
    // partition where they would match each other — null the result out
    // for null-keyed left rows instead. foldLeft over lit(false), not
    // reduce: an EMPTY key list (the global keyless as-of join, valid —
    // one global window) must yield the no-op wrapper, not throw
    val keyIsNull = keys.map(col(_).isNull).foldLeft(lit(false))(_ || _)
    u.withColumn(asofCol, max(col("__rts")).over(w))
      .filter(col("__tag") === 1)
      .withColumn(asofCol, when(keyIsNull,
          lit(null).cast(right.schema(rightTs).dataType))
        .otherwise(col(asofCol)))
      .drop("__ts", "__tag", "__rts")
  }

  /** Interval (range) join: every point row paired with every interval row
    * satisfying `lo <= pt < hi`. A naive theta-join plans as a cartesian
    * product — O(|P|·|I|) compared pairs; this instead buckets the time
    * axis: points land in bucket `pt div width`, intervals replicate across
    * the buckets they overlap, and an EQUI-join on the bucket id feeds the
    * exact `[lo, hi)` filter. Each (point, interval) match meets in exactly
    * one bucket (the point's), so no post-join dedup is needed. At 100 TB
    * this is the shape that survives: a hash-partitioned equi-join whose
    * replication factor is `interval_length / width` (pick `width` near the
    * typical interval length; Spark's shuffle/AQE handle the rest).
    *
    * Both `pointTs` and `lo`/`hi` must be non-negative integral values on a
    * shared axis (e.g. epoch nanos) — `div` truncates toward zero, so
    * negative timestamps would land in the wrong bucket. Intervals with
    * `hi <= lo` are empty and dropped. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, loCol: String, hiCol: String, bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bk", expr(s"`$pointTs` div ${bucketWidth}L"))
    val iv = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bk", explode(sequence(
        expr(s"`$loCol` div ${bucketWidth}L"),
        expr(s"(`$hiCol` - 1) div ${bucketWidth}L"))))
    p.join(iv, Seq("__bk"))
      .filter(col(pointTs) >= col(loCol) && col(pointTs) < col(hiCol))
      .drop("__bk")
  }
}
