package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-scale ladder for the 2-D DP range tree: the sf0.1 events table
  * replicated 1x / 10x / 100x (replica k offsets user_id — disjoint
  * privacy units, so the per-unit cap window sees k times the groups,
  * the honest scale shape), released keyed per event_type at 16 x 32
  * bins with Secure noise, plus a 5-box query batch. What the rung must
  * show: wall grows ~linearly with ROWS (the deterministic cap window +
  * node aggregation are the only data-sized stages), while the release
  * join and box queries stay flat (the released tree is keys x 1,953
  * nodes at ANY data scale). Evidence tooling only — never a gate input.
  *
  * Usage: runMain graft.tools.Ladder2D [sfDir]
  */
object Ladder2D {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.headOption.exists(!_.startsWith("--"))) args(0)
      else "/root/testdata/sf0.1"
    // --skew: the worst 2-D shapes — ~60% of rows route to ONE key (one
    // hot product tree) and ~5% of rows to ONE privacy unit (the cap
    // window's per-(pid, key) partition becomes a single large sort
    // group — the skew risk specific to the deterministic rank cap)
    val skew = args.contains("--skew")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("ladder-2d").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.streaming.StreamOps.tsToNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    for (mult <- Seq(1, 10, 100)) {
      val scaled0 = events
        .withColumn("__rep", explode(sequence(lit(0), lit(mult - 1))))
        .withColumn("user_id",
          col("user_id") + col("__rep").cast("long") * 1000000000L)
        .drop("__rep")
      val scaled = if (!skew) scaled0 else scaled0
        .withColumn("event_type",
          when(pmod(col("event_id"), lit(10L)) < 6, lit("hot_type"))
            .otherwise(col("event_type")))
        .withColumn("user_id",
          when(pmod(col("event_id") * 2654435761L, lit(20L)) === 0, lit(-1L))
            .otherwise(col("user_id")))
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val tree = graft.spark.RangeTree.dpRange2DTree(scaled, "user_id",
          col("value"), expr("hour(timestamp_micros(ts div 1000))"),
          Seq("event_type"), loX = 0.0, hiX = 1000.0, binsX = 16,
          loY = 0.0, hiY = 32.0, binsY = 32, epsilon = 1.0,
          maxPerUnit = 100L, noise = graft.core.NoiseSource.Secure)
        val nRel = tree.count()
        val nQ = graft.spark.RangeTree.range2DQueries(tree,
          Seq("event_type"), Seq((0L, 7L, 0L, 11L), (4L, 11L, 6L, 21L),
            (15L, 15L, 0L, 31L), (2L, 2L, 5L, 5L), (0L, 15L, 0L, 23L)),
          16, 32).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (dt, nRel, nQ)
      }
      val best = reps.map(_._1).min
      println(f"LADDER2D mult=$mult%3d rows=${reps.head._2}%,d " +
        f"boxRows=${reps.head._3}%,d best=$best%.2f s")
    }
    spark.stop()
  }
}
