package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query `reps` times (default 3) and
  * emits ONE JSON line with per-query MEDIANS (plus mins), so round-over-round
  * comparisons are not single-sample noise. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/parquet/shuffle paths so the first timed query isn't
    // charged with one-time JVM initialization
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // optional comma-separated name-prefix filter for targeted local runs,
    // e.g. SPARK_GRAFT_BENCH_ONLY=sim_,dedup_minhash
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.length / 2)
      System.err.println(
        f"[bench] $name: median $median%.2fs min ${times.head}%.2fs ($reps reps)")
      (name, median, times.head)
    }
    // The harness captures only the LAST ~2000 bytes of output, so the JSON
    // line must stay compact: medians only (mins are on stderr above), values
    // rounded to 3 decimals. 70 queries * ~24 chars ≈ 1.7 KB — fits.
    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val queriesJson =
      results.map(r => "\"" + r._1 + "\":" + r3(r._2)).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","reps":$reps,"queries":$queriesJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
