package graft.ops

import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering with a
  * per-file min/max manifest and file-skipping — the Delta/Iceberg
  * OPTIMIZE ZORDER idea as a first-class operator. Writing a 100 TB table
  * sorted by one column prunes scans on that column only; interleaving the
  * bits of two (quantized) columns gives files that are LOCAL IN BOTH
  * dimensions, so a predicate on either column — or a box on both — skips
  * most files via nothing but the manifest's min/max stats.
  *
  * Everything here is deterministic integer arithmetic (value-based
  * quantization against the global min/max, bit interleave, equal-width
  * shard cut on the z-line), so the layout, the manifest, and the pruning
  * statistics are all bit-reproducible in any engine — unlike
  * RangePartitioner layouts whose boundaries come from engine-internal
  * sampling (see CorpusOps.exportRangeSorted, rows-only for that reason).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * x's bit i lands at position 2i, y's at 2i+1. Pure Column bit
    * arithmetic — stays inside whole-stage codegen (no UDF). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Equal-width quantization of column `c` in [lo, hi] onto [0, 2^bits):
    * (c - lo) * 2^bits div (hi - lo + 1). Integer-exact (`div` is the
    * integral SQL divide — no double round-trip at any magnitude),
    * monotone, and the top edge maps strictly below 2^bits. The product
    * is computed in DECIMAL(38,0) (the temperatureThresholds convention):
    * in long arithmetic (c - lo) * 2^bits silently wraps once the value
    * range nears 2^(63 - bits) — e.g. full-range long keys at bits = 8 —
    * and a wrapped z-value would silently shuffle rows into the wrong
    * shard. `div` on decimals still returns BIGINT, so downstream bit
    * interleaving sees the same long it always did. Takes column NAMES
    * because the expression is built as SQL text. */
  def quantize(c: String, lo: String, hi: String, bits: Int): Column =
    expr(s"(CAST($c AS DECIMAL(38,0)) - $lo) * ${1L << bits}" +
      s" div (CAST($hi AS DECIMAL(38,0)) - $lo + 1)")

  /** [[quantize]] against KNOWN literal bounds: when the span provably
    * cannot wrap — (hi - lo + 1) <= 2^(63-bits) — the product runs in
    * plain BIGINT (one codegen'd multiply instead of 128-bit decimal
    * math on every row); otherwise it falls back to the DECIMAL(38,0)
    * form. Bit-identical to [[quantize]] in both arms: integral floor
    * divide of an exact product. */
  private def quantizeLit(c: String, lo: Long, hi: Long, bits: Int): Column = {
    val span = BigInt(hi) - BigInt(lo) + 1 // hi >= lo by construction
    if (span <= BigInt(Long.MaxValue >> bits))
      expr(s"(CAST($c AS BIGINT) - ${lo}L) * ${1L << bits}L div ${span.toLong}L")
    else
      expr(s"(CAST($c AS DECIMAL(38,0)) - $lo) * ${1L << bits}" +
        s" div (CAST($hi AS DECIMAL(38,0)) - $lo + 1)")
  }

  /** Global (min, max) of the two layout columns as literals — ONE
    * collected row (removes the broadcast crossJoin from the full-data
    * projection and lets quantizeLit statically prove the BIGINT product
    * safe). Fails loud on empty/all-NULL input, where an empty export
    * would die far from the cause in the manifest read-back. */
  private def collectBounds(df: DataFrame, xCol: String, yCol: String,
      op: String): (Long, Long, Long, Long) = {
    val b = df.agg(
      min(col(xCol).cast("long")).as("__xlo"), max(col(xCol).cast("long")).as("__xhi"),
      min(col(yCol).cast("long")).as("__ylo"), max(col(yCol).cast("long")).as("__yhi"))
      .collect()(0)
    require(!b.anyNull,
      s"$op: empty input, or $xCol/$yCol all NULL — nothing to lay out")
    (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
  }

  /** Shared export tail of [[zorderExport]] / [[hilbertExport]]: cut the
    * curve key's line into `nShards` equal-width shards (deterministic,
    * unlike range-partitioner sampling), write one partition directory
    * per shard with rows sorted by the key, and read back the per-shard
    * manifest (shard, n_rows, x/y min/max, key min/max). The key column
    * name (`z` or `h`) flows into the manifest column names. */
  private def curveExport(laid: DataFrame, keyCol: String, span: Long,
      outDir: String, nShards: Int): DataFrame = {
    // key < span; the shard product stays in BIGINT unless
    // log2(span) + log2(nShards) can reach 63 (bits >= 30), where it
    // wraps negative and silently writes rows to bogus shard partitions
    // — DECIMAL(38,0) only on that (rare) configuration
    val shardExpr =
      if (span <= Long.MaxValue / nShards)
        expr(s"CAST($keyCol * $nShards div $span AS INT)")
      else
        expr(s"CAST(CAST($keyCol AS DECIMAL(38,0)) * $nShards div $span AS INT)")
    val sharded = laid.withColumn("shard", shardExpr)
      .select(col("id"), col("x"), col("y"), col(keyCol), col("shard"))
    sharded.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    laid.sparkSession.read.parquet(outDir)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        min(keyCol).as(s"${keyCol}_min"), max(keyCol).as(s"${keyCol}_max"))
  }

  /** Z-order clustered export: quantize (xCol, yCol) against their global
    * min/max, interleave to a z-value, cut the z-line into `nShards`
    * EQUAL-WIDTH shards (deterministic, unlike range-partitioner
    * sampling), write one partition directory per shard with rows sorted
    * by z, and return the read-back per-shard manifest:
    * (shard, n_rows, x_min, x_max, y_min, y_max, z_min, z_max).
    *
    * Plan: one tiny min/max aggregate, one map-only projection, one
    * shuffle (repartition by shard) + per-shard sort, one write, one
    * read-back aggregate over the written files. At 100 TB the only
    * full-data exchange is the layout shuffle itself — the point of the
    * operator. Equal-width z-cut can skew if the value distribution
    * does; bits/nShards are the knobs (a skewed production table would
    * quantize by rank instead — same interleave, different `quantize`). */
  def zorderExport(df: DataFrame, idCol: String, xCol: String, yCol: String,
      outDir: String, bits: Int = 8, nShards: Int = 16): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val (xlo, xhi, ylo, yhi) = collectBounds(df, xCol, yCol, "zorderExport")
    val laid = df.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("xq", quantizeLit("x", xlo, xhi, bits))
      .withColumn("yq", quantizeLit("y", ylo, yhi, bits))
      .withColumn("z", zValue(col("xq"), col("yq"), bits))
    curveExport(laid, "z", 1L << (2 * bits), outDir, nShards)
  }

  /** One xy2d step of the Hilbert recurrence at level size `s` — the
    * single source of truth for [[hilbertXY2D]]'s loop; the oracle-SQL
    * generator ([[graft.EntryCorpus]]) unrolls the same quadrant table
    * and rotation case-by-case. Returns (x', y', d'). */
  @inline private def hilbertStep(
      x: Long, y: Long, d: Long, s: Long): (Long, Long, Long) = {
    val rx = if ((x & s) > 0L) 1L else 0L
    val ry = if ((y & s) > 0L) 1L else 0L
    val d2 = d + s * s * ((3L * rx) ^ ry)
    if (ry == 0L) {
      // flip within the quadrant when rx = 1, then swap axes
      val fx = if (rx == 1L) s - 1L - x else x
      val fy = if (rx == 1L) s - 1L - y else y
      (fy, fx, d2)
    } else (x, y, d2)
  }

  /** Hilbert index of a quantized grid cell (the classic xy2d bit
    * algorithm): maps (x, y) in [0, 2^bits)^2 to d in [0, 2^(2*bits)) such
    * that consecutive d are ADJACENT cells — the locality property the
    * Morton/Z curve lacks (z takes quadrant-sized jumps), so equal-width
    * cuts of the Hilbert line give shards with tighter bounding boxes and
    * better file-skipping. */
  def hilbertXY2D(x: Long, y: Long, bits: Int): Long = {
    // fail loud outside the grid (16th pass, r17): the classic recurrence
    // silently returns a WRONG index for coordinates past 2^bits — the
    // engine's own export paths quantize into range, but the public SQL
    // surface (graft_hilbert) reaches here with arbitrary user input
    if (x < 0L || x >= (1L << bits) || y < 0L || y >= (1L << bits))
      throw graft.functions.HilbertIndex.outOfRange(x, y, bits)
    var cx = x; var cy = y; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val t = hilbertStep(cx, cy, d, s)
      cx = t._1; cy = t._2; d = t._3
      s >>= 1
    }
    d
  }

  /** [[hilbertXY2D]] as a column — the native codegen expression
    * [[graft.functions.HilbertIndex]] (generated while-loop inside the
    * stage body), NOT an unrolled Column fold (each Hilbert level reads
    * the previous level's (x, y) several times, so a pure expression tree
    * doubles per level — the hot-path-expression-engineering rule 2 case)
    * and no longer a boxed-Long ScalaUDF (which broke whole-stage codegen
    * in the export write path). The SQL oracle replays the same
    * recurrence as a generated per-level CTE chain. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.GraftShims
    GraftShims.column(graft.functions.HilbertIndex(
      GraftShims.expression(x.cast("long")),
      GraftShims.expression(y.cast("long")), bits))
  }

  /** [[zorderExport]] with the Hilbert curve as the layout key — same
    * deterministic quantize / equal-width cut / manifest contract, key
    * column `h`: (shard, n_rows, x_min, x_max, y_min, y_max, h_min,
    * h_max). Adjacent-cell steps mean a shard's box is tighter than the
    * z-cut's at the same (bits, nShards); [[pruneProbe]] works on either
    * manifest. */
  def hilbertExport(df: DataFrame, idCol: String, xCol: String, yCol: String,
      outDir: String, bits: Int = 8, nShards: Int = 16): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val (xlo, xhi, ylo, yhi) = collectBounds(df, xCol, yCol, "hilbertExport")
    val laid = df.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("xq", quantizeLit("x", xlo, xhi, bits))
      .withColumn("yq", quantizeLit("y", ylo, yhi, bits))
      .withColumn("h", hilbertValue(col("xq"), col("yq"), bits))
    curveExport(laid, "h", 1L << (2 * bits), outDir, nShards)
  }

  /** File-skipping probe for a box predicate x in [x1, x2] AND y in
    * [y1, y2] against a [[zorderExport]] layout: a shard must be scanned
    * iff its manifest box intersects the query box. Returns ONE row:
    * (files_total, files_scanned, rows_matched, prune_violations) where
    * prune_violations counts matching rows living OUTSIDE the scanned
    * set — the file-skipping soundness guarantee, provably 0 (min/max
    * containment), recomputed here from the data so the gate would catch
    * a manifest bug rather than trust it. */
  def pruneProbe(spark: SparkSession, outDir: String, manifest: DataFrame,
      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    val scanned = manifest.filter(
      col("x_min") <= x2 && col("x_max") >= x1 &&
      col("y_min") <= y2 && col("y_max") >= y1)
    val back = spark.read.parquet(outDir)
      .withColumn("shard", col("shard").cast("int"))
    val boxed = back.filter(
      col("x") >= x1 && col("x") <= x2 && col("y") >= y1 && col("y") <= y2)
    // one pass over the boxed rows: a left join against the scanned-shard
    // list yields both totals (count(*) and count(matched shard)) in a
    // single aggregate — a second scan of the export would double probe IO
    val matched = boxed.join(
        broadcast(scanned.select(col("shard").as("__ss"))),
        col("shard") === col("__ss"), "left")
      .agg(count(lit(1)).as("rows_matched"), count(col("__ss")).as("__n_in"))
    manifest.agg(count(lit(1)).as("files_total"))
      .crossJoin(broadcast(scanned.agg(count(lit(1)).as("files_scanned"))))
      .crossJoin(broadcast(matched))
      .select(col("files_total"), col("files_scanned"), col("rows_matched"),
        (col("rows_matched") - col("__n_in")).as("prune_violations"))
  }
}
