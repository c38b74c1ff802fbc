package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join path: both sides bucketed by the join key at write
  * time join WITHOUT any Exchange — at 100 TB this converts the dominant
  * repeated fact-to-fact join cost from a full shuffle of both inputs per
  * query into zero (the shuffle is paid once, at write). This spec pins the
  * plan shape Spark produces for graft's bucketed tables so a config or
  * upgrade regression that silently reintroduces the shuffle fails CI. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with zero exchanges; result matches shuffled join") {
    // external table paths, so the (static) warehouse dir never matters
    val wh = Files.createTempDirectory("graft-bucketing").toString
    // bucketed scans only kick in when bucketing is enabled (default true)
    assert(spark.conf.get("spark.sql.sources.bucketing.enabled") == "true")

    val left = (0L until 1000L).map(i => (i % 97, i, i * 2.0))
      .toDF("k", "lid", "lv")
    val right = (0L until 500L).map(i => (i % 97, i, s"r$i"))
      .toDF("k", "rid", "rv")

    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bleft").saveAsTable("bleft")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bright").saveAsTable("bright")

    val l = spark.table("bleft")
    val r = spark.table("bright")
    // force the shuffle-join path (a broadcast would hide the layout reuse
    // this spec pins — on two 100 TB fact sides there is nothing to broadcast)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = l.join(r, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("lv").as("s"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join must consume the bucketed layout directly, and the
      // aggregation (grouping key == bucket key) must reuse it too
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")

      // and it is the same answer the shuffled join produces
      val expected = left.join(right, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("lv").as("s"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      val got = joined.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bleft")
      spark.sql("DROP TABLE IF EXISTS bright")
    }
  }

  test("Dataflow.bucketedJoin resolves identically-named join keys") {
    // the shared-key case: both sides call the key "k" — the join
    // condition must be frame-qualified or analysis throws
    // AMBIGUOUS_REFERENCE
    val wh = Files.createTempDirectory("graft-bucketed-same").toString
    val a = (0L until 100L).map(i => (i % 11, i)).toDF("k", "aid")
    val b = (0L until 60L).map(i => (i % 11, s"b$i")).toDF("k", "bv")
    try {
      val joined = Dataflow.bucketedJoin(a, b, "k", "k",
        nBuckets = 4, wh, "bj_same")
      assert(joined.count() == a.join(b.withColumnRenamed("k", "k2"),
        col("k") === col("k2")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_same_l")
      spark.sql("DROP TABLE IF EXISTS bj_same_r")
    }
  }

  test("Dataflow.bucketedJoin: exchange-free merge join, same rows as a plain join") {
    val wh = Files.createTempDirectory("graft-bucketed-join").toString
    val left = (0L until 600L).map(i => (i % 53, i)).toDF("lk", "lid")
    val right = (0L until 300L).map(i => (i % 53, s"r$i")).toDF("rk", "rv")
    try {
      val joined = Dataflow.bucketedJoin(left, right, "lk", "rk",
        nBuckets = 8, wh, "bj_spec")
      // the merge hint keeps SMJ even though the right side is
      // broadcast-small; the bucketed layout feeds it with no Exchange
      // and no per-query Sort above the scans
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val got = joined.select("lk", "lid", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = left.join(right, col("lk") === col("rk"))
        .select("lk", "lid", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_spec_l")
      spark.sql("DROP TABLE IF EXISTS bj_spec_r")
    }
  }
}
