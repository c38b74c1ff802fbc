package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B ladder evidence for exact n-gram Jaccard WITH length-band blocking
  * (the scale-safe regime the round-8 ladder motivated): times the gate
  * query's shape (char-3-grams of 100-char heads, lang-blocked, t = 0.8)
  * with `lengthBandBlocking` off and on — 3 reps each, median — and
  * verifies the two pair sets are IDENTICAL (the band prune is lossless at
  * t < 1: |grams| ratio below t already caps Jaccard below t).
  *
  * Usage: runMain graft.tools.LadderNgramBlocking <sfDir> [reps]
  * Evidence tooling only — never a gate input.
  */
object LadderNgramBlocking {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("ladder-ngram-blocking").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("head", lower(substring(col("text"), 1, 100)))
    def pairs(blocking: Boolean) = Dedup.ngramJaccardPairs(
      docs, "doc_id", "head", "lang", n = 3, threshold = 0.8,
      lengthBandBlocking = blocking)

    def medianTime(blocking: Boolean): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        pairs(blocking).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }

    val off = medianTime(blocking = false)
    val on = medianTime(blocking = true)
    // lossless check: symmetric difference of the two pair sets must be 0
    val a = pairs(blocking = false).select("id_a", "id_b")
    val b = pairs(blocking = true).select("id_a", "id_b")
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    val n = a.count()
    println(f"[ladder-ngram-blocking] dir=$dir pairs=$n " +
      f"medianOff=$off%.2fs medianOn=$on%.2fs onlyOff=$onlyA onlyOn=$onlyB")
    spark.stop()
  }
}
