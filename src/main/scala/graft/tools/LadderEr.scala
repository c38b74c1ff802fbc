package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{ExactField, FuzzyStringField, NumericField, RecordLinkage}

/** Ladder evidence for the LSH-linkage volume guard and its maxBucket
  * escape at clone-mass scale, driven on the ladder `customer` table
  * DIRECTLY: the gate's erBase fixture cannot build past ~66x (base ids
  * collide with its +1e6 dirty-copy offset and its own id-space guard
  * fails loud — a fixture limit, not an engine one), but the guard story
  * needs the 100x rung, where every c_name repeats once per replica and
  * each md5-addr band bucket holds ~`replicas` records.
  *
  * Three measurements, printed as `[ladder-er]` lines:
  *  1. the guard's own volume estimate (the pre-join histogram pass);
  *  2. uncapped at a sane per-record budget — expect the GUARD TO FIRE
  *     (the quadratic clone-bucket mass is exactly what it exists for);
  *  3. capped (maxBucket star collapse) at the SAME budget — expect a
  *     completed run, linear volume, wall-clock reported.
  *
  * Evidence tooling only — never a gate input. */
object LadderEr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/ladder_x100"
    val budget = if (args.length > 1) args(1).toDouble else 100.0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("ladder-er").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long").as("rec_id"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .withColumn("c_addr", md5(col("c_name")))
      .localCheckpoint(false)
    val rules = Seq(
      FuzzyStringField("name", col("c_name"), maxEdit = 1, 30L, -20L),
      ExactField("segment", col("c_mktsegment"), 10L, -15L),
      NumericField("balance", col("c_acctbal"), 0.01, 20L, -10L))
    val n = cust.count()
    println(s"[ladder-er] $dir: $n records")
    // 2. uncapped at the per-record budget: the clone-bucket mass is
    // quadratic in replicas and the guard must reject it
    val t0 = System.nanoTime()
    try {
      val rows = RecordLinkage.lshLinkPairs(cust, "rec_id", col("c_addr"),
        rules, 45L, maxPairsPerRecord = budget)
        .queryExecution.toRdd.count()
      println(f"[ladder-er] uncapped(budget=$budget%.0f): UNEXPECTEDLY " +
        f"released $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch {
      case e: IllegalStateException =>
        println(f"[ladder-er] uncapped(budget=$budget%.0f): GUARD FIRED " +
          f"after ${(System.nanoTime() - t0) / 1e9}%.2f s — " +
          e.getMessage.replace('\n', ' ').take(200))
    }
    // 3. the maxBucket escape at the SAME budget: clone buckets collapse
    // to stars (~numBands pre-distinct pairs per record), run completes
    val t1 = System.nanoTime()
    val rows = RecordLinkage.lshLinkPairs(cust, "rec_id", col("c_addr"),
      rules, 45L, maxPairsPerRecord = budget, maxBucket = 8)
      .queryExecution.toRdd.count()
    println(f"[ladder-er] capped(maxBucket=8, budget=$budget%.0f): " +
      f"released $rows rows in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
