package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r19): component attribution for the per-key-domain tree
  * chain (dp_range_keyed_domains / _quantiles — the two slowest rows).
  * Times each stage of the chain in isolation with a noop-style count on
  * the COMPILED plan. Not part of the driver contract. */
object ProfileRangeKeyed {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.count() // warm cache

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[prk] $label%-40s median ${ts(1)}%6.2fs min ${ts.head}%6.2fs")
    }

    import graft.spark.RangeTree
    // (a) the 4096-bin keyed probe STORE (ingest only)
    time("probe store (4096 bins, keyed)") {
      RangeTree.rangeTreeIngestStep(ev, None, "user_id", col("value"),
        Seq("event_type"), 0.0, 1024.0, 4096, 1000000L)
        .queryExecution.toRdd.count()
    }
    // (b) probe store + release (the full dpRangeCountTree)
    time("probe tree (store + release)") {
      RangeTree.dpRangeCountTree(ev, "user_id", col("value"),
        Seq("event_type"), 0.0, 1024.0, 4096, 1.0, 1000000L,
        graft.core.NoiseSource.Zero)
        .queryExecution.toRdd.count()
    }
    // (c) the full estimated-domains chain (probe + readout + pad)
    time("dpEstimatedDomains (full)") {
      RangeTree.dpEstimatedDomains(ev, "user_id", col("value"),
        Seq("event_type"), 0.0, 1024.0, 64, 1.0, 1000000L,
        graft.core.NoiseSource.Zero, 0.01, 0.99, 0.0)
        .queryExecution.toRdd.count()
    }
    // (c2) readout alone: probe tree built once (store checkpoint warm
    //      after the first count), then the fused quantile readout timed
    //      against it
    val probeTree = RangeTree.dpRangeCountTree(ev, "user_id", col("value"),
      Seq("event_type"), 0.0, 1024.0, 4096, 1.0, 1000000L,
      graft.core.NoiseSource.Zero)
    probeTree.queryExecution.toRdd.count()
    time("probe release re-count (warm)") {
      probeTree.queryExecution.toRdd.count()
    }
    time("collectNodes only (warm probe)") {
      probeTree.groupBy(col("event_type"))
        .agg(collect_list(struct(col("__lvl").cast("int"),
          col("__idx").cast("long"), col("dp_count").cast("double"))).as("__n"))
        .queryExecution.toRdd.count()
    }
    time("quantile readout (warm probe)") {
      RangeTree.quantilesFromTree(probeTree, Seq("event_type"), 0.0, 1024.0,
        4096, Seq(0.01, 0.99)).queryExecution.toRdd.count()
    }
    // (d) the main per-key-domain tree over a LITERAL domains frame
    //     (isolates the main tree from the probe)
    import spark.implicits._
    val litDom = Seq(("click", 0.0, 1024.0), ("error", 0.0, 1024.0),
      ("purchase", 0.0, 1024.0), ("signup", 0.0, 1024.0),
      ("view", 0.0, 1024.0)).toDF("event_type", "lo", "hi")
    time("perKeyDomains tree (literal domains)") {
      RangeTree.dpRangeCountTreePerKeyDomains(ev, "user_id", col("value"),
        Seq("event_type"), litDom, 64, 1.0, 1000000L,
        graft.core.NoiseSource.Zero)
        .queryExecution.toRdd.count()
    }
    // (e) end-to-end (the declared query shape)
    time("keyed_domains end-to-end") {
      val dom = RangeTree.dpEstimatedDomains(ev, "user_id", col("value"),
        Seq("event_type"), 0.0, 1024.0, 64, 1.0, 1000000L,
        graft.core.NoiseSource.Zero, 0.01, 0.99, 0.0)
      RangeTree.dpRangeCountTreePerKeyDomains(ev, "user_id", col("value"),
        Seq("event_type"), dom, 64, 1.0, 1000000L,
        graft.core.NoiseSource.Zero)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
