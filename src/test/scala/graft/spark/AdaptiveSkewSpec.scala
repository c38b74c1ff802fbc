package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence: the runtime re-plan path graft relies on for
  * hot-key joins it does NOT manually salt (manual salting exists for the
  * semi-join path — Dataflow.filterByKeySharded — but plain fact-fact
  * equi-joins lean on AQE's skew split). This spec runs a join whose
  * shuffle has one pathologically hot key under production-shaped AQE
  * thresholds (scaled to test data) and asserts Spark actually SPLIT the
  * skewed partition — so a config regression that silently turns the
  * skew handling off fails here, not at 100 TB. */
class AdaptiveSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production default is 256m with factor 5; scale the byte thresholds
    // to the fixture so the same MECHANISM triggers
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // key 0 carries 50k rows; keys 1..100 carry 20 each — one hot shuffle
      // partition far beyond factor x median
      val left = spark.range(50000).select(lit(0L).as("k"), col("id").as("lv"))
        .unionAll(spark.range(2000).select(
          (col("id") % 100 + 1).as("k"), col("id").as("lv")))
      val right = (0L to 100L).flatMap(k => (0 until 20).map(i => (k, i)))
        .toDF("k", "rv")
      val joined = left.join(right, "k")
      // drive THIS plan to completion (a .count() would plan its own query,
      // leaving joined's adaptive plan un-finalized)
      val n = joined.queryExecution.executedPlan.execute().count()
      assert(n == 50000L * 20 + 2000L * 20, s"join result wrong: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"expected the skewed partition to be split (skew=true):\n$plan")
    } finally restore.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
