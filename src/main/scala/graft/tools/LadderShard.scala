package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Key-cardinality ladder for the SHARDED keyed tree release (r15): the
  * same 100k-event input keyed at 1x / 10x / 100x key cardinalities
  * (500 / 5,000 / 50,000 distinct keys at bins = 64 — the 10x and 100x
  * rungs sit far past the one-shot release guard of ~15.7k keys), timed
  * through release + quantile readout + consistency. What the rung must
  * show: wall grows with the RELEASED tree size (keys x nodes — the
  * output), not super-linearly, and the per-key cost stays flat-to-
  * falling; the sharding loop adds only per-shard job overhead.
  * Evidence tooling only — never a gate input.
  *
  * Usage: runMain graft.tools.LadderShard [sfDir] */
object LadderShard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("ladder-shard").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // no shared checkpoint: the between-rep unpersist (the bench
    // convention) would evict it and fail later reps
    val events = spark.read.parquet(s"$sfDir/events.parquet")

    // --skew: zipf-ish key mass (cube of a uniform — the hottest key
    // holds ~5% of all rows, the top 1% of keys ~60%) over the same key
    // cardinality, probing whether a hot key's node mass distorts the
    // shard loop (it cannot: shards split by key COUNT, and the hot
    // key's store rows are tree-shaped — at most 2*bins-1 per key)
    val skew = args.contains("--skew")

    // --conc: the SHARD-CONCURRENCY rung (r16) — 10k keys x 4096 bins
    // (~8.2M released nodes, cap 61 keys/shard at the default pool of 4
    // => ~164 shards), same shard layout at concurrency 1 vs the pool:
    // what the rung must show is wall ~flat in shard count up to the
    // pool size (the r15 serial loop paid one Spark job-scheduling +
    // parquet-commit latency PER SHARD, end to end)
    if (args.contains("--conc")) {
      val keys = 10000
      val bins = 4096
      val keyed = events.withColumn("k", format_string("c%06d",
        pmod(col("user_id") * 7919 + col("event_id"), lit(keys.toLong))))
      val store = graft.spark.RangeTree.rangeTreeIngestStep(keyed, None,
        "user_id", col("value"), Seq("k"), lo = 0.0, hi = 1000.0,
        bins = bins, maxPerUnit = 100L).localCheckpoint()
      // hold the shard LAYOUT fixed across arms (the default cap divides
      // by concurrency; passing it explicitly isolates the loop's shape)
      val cap = math.max(1L, graft.spark.RangeTree.MaxDriverRows /
        (2L * bins - 1) / graft.spark.RangeTree.ShardConcurrency)
      for (conc <- Seq(1, graft.spark.RangeTree.ShardConcurrency)) {
        val reps = (1 to 2).map { _ =>
          val out = java.nio.file.Files
            .createTempDirectory("graft_ladder_conc_").toString
          val t0 = System.nanoTime()
          val rel = graft.spark.RangeTree.shardedRangeTreeRelease(store,
            Seq("k"), bins = bins, epsilon = 1.0, maxPerUnit = 100L,
            noise = graft.core.NoiseSource.Secure, outDir = out,
            maxKeysPerShard = cap, concurrency = conc)
          val nRel = rel.count()
          ((System.nanoTime() - t0) / 1e9, nRel)
        }
        val best = reps.map(_._1).min
        println(f"[ladder-conc] keys=$keys bins=$bins shards=${
          (keys + cap - 1) / cap} conc=$conc released=${reps.head._2}%9d " +
          f"best=$best%7.2fs")
      }
      spark.stop()
      return
    }
    for (keys <- Seq(500, 5000, 50000)) {
      val uniformKey = pmod(col("user_id") * 7919 + col("event_id"),
        lit(keys.toLong))
      val skewKey = floor(pow(
        pmod(col("event_id") * 2654435761L, lit(1000000L)).cast("double")
          / lit(1000000.0), lit(3.0)) * keys).cast("long")
      val keyed = events.withColumn("k",
        format_string("c%06d", if (skew) skewKey else uniformKey))
      val reps = (1 to 3).map { _ =>
        val out = java.nio.file.Files
          .createTempDirectory("graft_ladder_shard_").toString
        val t0 = System.nanoTime()
        val rel = graft.spark.RangeTree.dpRangeCountTreeSharded(keyed,
          "user_id", col("value"), Seq("k"), lo = 0.0, hi = 1000.0,
          bins = 64, epsilon = 1.0, maxPerUnit = 100L,
          noise = graft.core.NoiseSource.Secure, outDir = out)
        val nRel = rel.count()
        val nQ = graft.spark.RangeTree.quantilesFromTree(rel, Seq("k"),
          0.0, 1000.0, 64, Seq(0.5, 0.99)).count()
        val nC = graft.spark.RangeTree.enforceConsistency(rel, Seq("k"), 64)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        (dt, nRel, nQ, nC)
      }
      val best = reps.map(_._1).min
      val (_, nRel, nQ, nC) = reps.head
      println(f"[ladder-shard] keys=$keys%6d released=$nRel%9d " +
        f"quantiles=$nQ%6d consistent=$nC%9d best=$best%7.2fs " +
        f"perKeyMs=${best * 1000 / keys}%7.3f")
    }
    spark.stop()
  }
}
