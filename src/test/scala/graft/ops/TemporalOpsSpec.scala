package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofJoinTs matches the latest right ts at-or-before each left ts") {
    val left = Seq(("u1", 1L, 10L), ("u1", 2L, 25L), ("u1", 3L, 30L),
      ("u2", 4L, 5L)).toDF("k", "id", "t")
    val right = Seq(("u1", 10L), ("u1", 20L), ("u1", 30L), ("u3", 1L))
      .toDF("k", "t")
    val out = TemporalOps.asofJoinTs(left, right, Seq("k"), "t", "t", "asof_t")
      .collect().map(r => (r.getAs[Long]("id"),
        Option(r.getAs[Any]("asof_t")).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == Some(10L)) // tie: inclusive match
    assert(out(2L) == Some(20L))
    assert(out(3L) == Some(30L))
    assert(out(4L) == None) // u2 has no right rows
  }

  test("asofJoinTs with EMPTY keys: one global window, no crash") {
    // the keyless global as-of join (Window.partitionBy() with no columns)
    // is valid; the null-key wrapper must fold to a no-op, not throw on
    // the empty reduce
    val left = Seq((1L, 10L), (2L, 25L)).toDF("id", "t")
    val right = Seq((5L), (20L)).toDF("t")
    val out = TemporalOps.asofJoinTs(left, right, Seq.empty, "t", "t", "asof_t")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("asof_t")).toMap
    assert(out == Map(1L -> 5L, 2L -> 20L))
  }

  test("rangeJoin matches points to [lo, hi) intervals exactly") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L),
      (6L, 1000L)).toDF("pid", "t")
    // intervals: [10,20) and [30,40) overlap buckets; [50,50) is empty
    val ivs = Seq((100L, 10L, 20L), (200L, 30L, 40L), (300L, 50L, 50L))
      .toDF("wid", "lo", "hi")
    val out = TemporalOps.rangeJoin(points, ivs, "t", "lo", "hi", bucketWidth = 7L)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 5 -> none; 10,19 -> [10,20); 20 -> none (exclusive hi); 35 -> [30,40)
    assert(out == Set((2L, 100L), (3L, 100L), (5L, 200L)))
  }

  test("rangeJoin yields each matching pair exactly once across bucket sizes") {
    val points = (0L until 200L).map(i => (i, i * 3)).toDF("pid", "t")
    val ivs = Seq((1L, 0L, 100L), (2L, 50L, 350L), (3L, 500L, 600L))
      .toDF("wid", "lo", "hi")
    val expected = (for {
      (pid, t) <- (0L until 200L).map(i => (i, i * 3))
      (wid, lo, hi) <- Seq((1L, 0L, 100L), (2L, 50L, 350L), (3L, 500L, 600L))
      if t >= lo && t < hi
    } yield (pid, wid)).toSet
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val got = TemporalOps.rangeJoin(points, ivs, "t", "lo", "hi", w)
        .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bucketWidth=$w")
    }
  }

  test("asofJoinTs preserves left row count and is a single shuffle") {
    val left = (1L to 100L).map(i => (s"u${i % 7}", i, i * 3)).toDF("k", "id", "t")
    val right = (1L to 50L).map(i => (s"u${i % 5}", i * 5)).toDF("k", "t")
    val out = TemporalOps.asofJoinTs(left, right, Seq("k"), "t", "t", "asof_t")
    assert(out.count() == 100)
    val exchanges = "Exchange".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"merge as-of join must be one shuffle, got $exchanges")
  }
}
