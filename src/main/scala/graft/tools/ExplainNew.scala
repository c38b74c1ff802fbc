package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted plans of named SparkEntry queries (plan-audit
  * loop for new queries; run manually, not part of the driver contract). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // FormattedMode (r19): the optimization rounds' plan-audit artifact is
    // `.explain("formatted")` (operator list + per-operator details:
    // PushedFilters, ReadSchema, join strategy + build side, exchange
    // partitioning). SPARK_GRAFT_EXPLAIN_OUT=<dir> additionally writes one
    // <name>.txt per query — the plans/r<N>/ deliverable.
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    args.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
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
