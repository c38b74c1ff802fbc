package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (r20 optimization round): split a query's wall time into
  * CONSTRUCTION (entry fn — any eager driver work: guard collects,
  * eager checkpoints), Catalyst phases from the QueryPlanningTracker
  * (analysis / optimization / physical planning of the FINAL frame), and
  * EXECUTION (toRdd.count, the bench's action). The r19 verdict flagged
  * ~50% of the 0.4-0.9s tail as "driver planning"; this tool shows how
  * much of that is Catalyst phase time vs entry-construction jobs, per
  * query. Not part of the driver contract. */
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.toRdd.count()
        val t2 = System.nanoTime()
        val phases = qe.tracker.phases.map { case (p, s) =>
          f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2fs"
        }.toSeq.sorted.mkString(" ")
        if (rep == 2) {
          println(f"[phases] $name: construct ${(t1 - t0) / 1e9}%.2fs, " +
            f"act ${(t2 - t1) / 1e9}%.2fs ($phases)")
          // top optimizer rules by exclusive time, process-cumulative —
          // prints the shared fixed cost the tail repays per query
          val rm = org.apache.spark.sql.catalyst.rules.RuleExecutor.getCurrentMetrics()
          println(f"[phases]   rules cumulative: ${rm.time / 1e9}%.2fs over ${rm.numRuns} runs")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
