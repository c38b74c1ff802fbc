package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave: plain bit loop. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-loop reference on the full 6-bit grid") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y, 6), s"z($x, $y)")
    }
    // bijective on the grid: 4096 distinct z-values covering [0, 4096)
    val zs = got.map(_._3).toSet
    assert(zs.size == 4096 && zs.min == 0L && zs.max == 4095L)
  }

  test("quantize is monotone, integer-exact, and edge-safe") {
    val df = Seq((0L, 0L, 999L), (500L, 0L, 999L), (999L, 0L, 999L))
      .toDF("v", "lo", "hi")
      .withColumn("q", Layout.quantize("v", "lo", "hi", 8))
    val qs = df.collect().map(_.getAs[Long]("q"))
    assert(qs(0) == 0L)
    assert(qs(1) == 500L * 256 / 1000)
    assert(qs(2) == 999L * 256 / 1000) // 255: top edge strictly < 2^bits
    assert(qs.sorted.toSeq == qs.toSeq)
    // full-range long keys at bits=8: the long-arithmetic product
    // (c - lo) * 256 wraps at 2^63; the DECIMAL(38,0) product must not
    val wide = Seq(
      (Long.MinValue, Long.MinValue, Long.MaxValue),
      (0L, Long.MinValue, Long.MaxValue),
      (Long.MaxValue, Long.MinValue, Long.MaxValue))
      .toDF("v", "lo", "hi")
      .withColumn("q", Layout.quantize("v", "lo", "hi", 8))
    val wq = wide.collect().map(_.getAs[Long]("q"))
    assert(wq.toSeq == Seq(0L, 128L, 255L), s"got ${wq.toSeq}")
  }

  test("zorder export: shards cover all rows; pruning is sound and effective") {
    // clustered synthetic data: 4 well-separated blobs in (x, y) space
    val pts = (0 until 4).flatMap { b =>
      val (bx, by) = ((b % 2) * 1000L, (b / 2) * 1000L)
      (0 until 250).map(i => (b * 250L + i, bx + i % 50, by + i / 5))
    }
    val tmp = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    val manifest = Layout.zorderExport(
      pts.toDF("id", "xx", "yy"), "id", "xx", "yy", tmp, bits = 8, nShards = 8)
    val m = manifest.collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum == 1000L)
    // soundness brute-force: for a box over blob 0, every matching row
    // must live in a shard whose manifest box intersects the query box
    val probe = Layout.pruneProbe(spark, tmp, manifest, 0L, 60L, 0L, 60L)
      .collect().head
    assert(probe.getAs[Long]("prune_violations") == 0L)
    assert(probe.getAs[Long]("rows_matched") > 0L)
    // effectiveness: the blob box must NOT require scanning every file
    assert(probe.getAs[Long]("files_scanned") < probe.getAs[Long]("files_total"),
      s"no files skipped: $probe")
    // determinism: a second export yields the identical manifest
    val tmp2 = java.nio.file.Files.createTempDirectory("zorder_spec2").toString
    val m2 = Layout.zorderExport(
      pts.toDF("id", "xx", "yy"), "id", "xx", "yy", tmp2, bits = 8, nShards = 8)
      .collect()
    assert(m.map(_.toSeq).toSet == m2.map(_.toSeq).toSet)
  }

  test("zorder beats single-column sort for a box on the SECOND dimension") {
    // uniform grid; a thin slab in y. A y-sorted layout scans few files
    // for y-predicates but EVERY file for x-predicates; z-order bounds
    // both. Probe a thin x-slab (the dimension a y-sort cannot prune).
    val pts = (for (x <- 0L until 100L; y <- 0L until 100L)
      yield (x * 100 + y, x, y))
    val tmp = java.nio.file.Files.createTempDirectory("zorder_slab").toString
    val manifest = Layout.zorderExport(
      pts.toDF("id", "xx", "yy"), "id", "xx", "yy", tmp, bits = 8, nShards = 16)
    val xSlab = Layout.pruneProbe(spark, tmp, manifest, 0L, 20L, 0L, 99L)
      .collect().head
    assert(xSlab.getAs[Long]("prune_violations") == 0L)
    // a 21%-wide x-slab must skip at least half the files under z-order
    assert(xSlab.getAs[Long]("files_scanned") * 2
        <= xSlab.getAs[Long]("files_total"),
      s"x-slab scanned too much: $xSlab")
  }

  test("hilbertXY2D: first-order square and the exhaustive curve properties") {
    // the bits = 1 square walks (0,0) (0,1) (1,1) (1,0)
    assert(Layout.hilbertXY2D(0, 0, 1) == 0L)
    assert(Layout.hilbertXY2D(0, 1, 1) == 1L)
    assert(Layout.hilbertXY2D(1, 1, 1) == 2L)
    assert(Layout.hilbertXY2D(1, 0, 1) == 3L)
    // exhaustive at bits = 4 (16x16 grid): the index is a bijection onto
    // [0, 256) and CONSECUTIVE indices are grid-adjacent cells — the
    // locality property that distinguishes Hilbert from Morton (whose
    // quadrant seams jump); this pins the whole recurrence, rotations
    // included, against any refactor
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, Layout.hilbertXY2D(x, y, 4))
    val byD = cells.map { case (x, y, d) => d -> ((x, y)) }.toMap
    assert(byD.keySet == (0L until 256L).toSet, "not a bijection")
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
  }

  test("hilbertValue: codegen expression is bit-parity with hilbertXY2D, no UDF in plan") {
    // exhaustive parity at bits 1..4 (covers every rotation path), plus a
    // random sweep at bits = 16 for high-bit coverage
    for (bits <- 1 to 4) {
      val n = 1 << bits
      val pts = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      val got = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      pts.foreach { case (x, y) =>
        assert(got((x, y)) == Layout.hilbertXY2D(x, y, bits),
          s"bits=$bits cell ($x,$y)") }
    }
    // high-bit sweep over a RANGE source (a local relation would be
    // ConvertToLocalRelation-folded on the driver, bypassing codegen):
    // the executed plan must be a WholeStageCodegen projection with no
    // ScalaUDF / BatchEvalPython node — the generated-loop path IS what
    // computes these values
    val bits = 16
    val df16 = spark.range(300).select(
      (col("id") * 7919L % (1L << bits)).as("x"),
      (col("id") * 104729L % (1L << bits)).as("y"))
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
    df16.collect().foreach { r =>
      assert(r.getLong(2) == Layout.hilbertXY2D(r.getLong(0), r.getLong(1), bits)) }
    val plan = df16.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"), plan)
    // "*(1)" is the WholeStageCodegen marker in the simple-string plan:
    // the graft_hilbert projection must sit inside the codegen'd stage
    assert(plan.linesIterator.next().startsWith("*(") &&
      plan.contains("graft_hilbert"), plan)
    // null propagates instead of crashing the generated loop
    val withNull = Seq((Some(3L), Some(5L)), (None, Some(1L)))
      .toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 8).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(withNull(0).contains(Layout.hilbertXY2D(3, 5, 8)) && withNull(1).isEmpty)
    // out-of-grid coordinates fail LOUD in both paths (r17, 16th pass):
    // the classic recurrence would otherwise return a silently wrong
    // index — the engine's exports quantize into range, but the public
    // SQL surface reaches the expression with arbitrary input
    val eInterp = intercept[IllegalArgumentException](
      Layout.hilbertXY2D(1L << 8, 0L, 8))
    assert(eInterp.getMessage.contains("outside the [0, 2^8) grid"))
    val eGen = intercept[Exception](
      spark.range(1).select((col("id") + 256L).as("x"), col("id").as("y"))
        .select(Layout.hilbertValue(col("x"), col("y"), 8))
        .collect())
    assert(graft.spark.SparkTestSession.chainMsg(eGen)
      .contains("outside the [0, 2^8) grid"))
    intercept[IllegalArgumentException](Layout.hilbertXY2D(0L, -1L, 8))
  }

  test("hilbert export: sound pruning, and tighter boxes than zorder on a grid") {
    val pts = (for (x <- 0L until 100L; y <- 0L until 100L)
      yield (x * 100 + y, x, y))
    val tmpH = java.nio.file.Files.createTempDirectory("hilbert_slab").toString
    val mH = Layout.hilbertExport(
      pts.toDF("id", "xx", "yy"), "id", "xx", "yy", tmpH, bits = 8, nShards = 16)
      .localCheckpoint()
    assert(mH.collect().map(_.getAs[Long]("n_rows")).sum == 10000L)
    val probe = Layout.pruneProbe(spark, tmpH, mH, 0L, 20L, 0L, 99L)
      .collect().head
    assert(probe.getAs[Long]("prune_violations") == 0L)
    assert(probe.getAs[Long]("files_scanned") * 2
        <= probe.getAs[Long]("files_total"), s"x-slab scanned too much: $probe")
    // locality: total manifest box AREA under Hilbert must not exceed
    // the z-order layout's on the same uniform grid (adjacent-step curve
    // => shards are contiguous blobs, not quadrant-seam stripes)
    val tmpZ = java.nio.file.Files.createTempDirectory("zorder_cmp").toString
    val mZ = Layout.zorderExport(
      pts.toDF("id", "xx", "yy"), "id", "xx", "yy", tmpZ, bits = 8, nShards = 16)
    def area(rows: Array[org.apache.spark.sql.Row]): Long = rows.map(r =>
      (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1) *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)).sum
    assert(area(mH.collect()) <= area(mZ.collect()),
      "hilbert shards boxed worse than zorder on a uniform grid")
  }
}
