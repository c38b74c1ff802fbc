package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: executes SparkEntry.entry (the driver's t1 check)
  * and prints the result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
