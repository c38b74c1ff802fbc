package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r19 optimization round): formatted plans of the RangeTree
  * INGEST stores — the released frames hide them behind their
  * localCheckpoint leaf, so a plan audit of the store shapes (the r19
  * cappedLeafCounts rewrite: leaf pre-aggregation + prefix cap instead of
  * an all-rows row_number window + raw-row level explode) needs the
  * un-checkpointed plans. SPARK_GRAFT_EXPLAIN_OUT=<dir> writes
  * <name>.txt files. Not part of the driver contract. */
object ExplainTreeStores {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plans: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "store_count_tree" -> graft.spark.RangeTree.rangeTreeIngestStep(
        ev, None, "user_id", col("value"), Seq("event_type"),
        lo = 0.0, hi = 1000.0, bins = 64, maxPerUnit = 1000000L),
      "store_sum_tree" -> graft.spark.RangeTree.dpRangeSumTree(
        ev, "user_id", col("value"), floor(col("value")), Seq("event_type"),
        lo = 0.0, hi = 1000.0, bins = 64, epsilon = 1.0,
        maxPerUnit = 1000000L, minW = 0.0, maxW = 500.0,
        noise = graft.core.NoiseSource.Zero),
      "ldp_frequency" -> graft.spark.LocalDP.ldpFrequency(
        ev, "user_id", col("event_type"),
        Seq("click", "error", "purchase", "signup", "view"),
        epsilon = 1.0, noise = graft.core.NoiseSource.Zero))
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"========== $name ==========")
      println(plan)
      outDir.foreach { d =>
        val pw = new java.io.PrintWriter(s"$d/$name.txt", "UTF-8")
        try pw.println(plan) finally pw.close()
      }
    }
    spark.stop()
  }
}
