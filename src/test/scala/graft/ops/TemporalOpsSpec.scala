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
