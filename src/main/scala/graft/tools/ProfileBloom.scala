package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off cost attribution for a_bloom_join: is the time in the d md5
  * probes, the bitmap build, or the join itself? Run:
  * sbt "runMain graft.tools.ProfileBloom /root/testdata/sf0.1" */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(what: String)(df: => DataFrame): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $what%-32s median ${reps.sorted.apply(1)}%.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_totalprice")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    time("orders scan only")(ords)
    // bitmap built ONCE, outside the timed arm: the probe measurement must
    // not be inflated by the build-side job (measured separately below)
    val bits = graft.ops.Sketches.bloomBits(cust, "c_custkey", 5, 1 << 20)
      .collect()
    val words = new Array[Long]((1 << 20) / 64)
    bits.foreach { r =>
      val p = r.getLong(0); words((p >>> 6).toInt) |= (1L << (p & 63))
    }
    time("probe: expression-form filter only") {
      val bm = typedLit(words.toIndexedSeq)
      val pass = forall(
        graft.ops.Sketches.bloomPositions(col("o_custkey"), 5, 1 << 20),
        p => getbit(element_at(bm, shiftrightunsigned(p, 6).cast("int") + lit(1)),
          pmod(p, lit(64L))) === lit(1L))
      ords.filter(col("o_custkey").isNotNull && pass)
    }
    time("bitmap build only (cust side)") {
      graft.ops.Sketches.bloomBits(cust, "c_custkey", 5, 1 << 20)
    }
    time("plain shuffle-hash join + agg") {
      ords.join(cust.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }
    time("full bloomFilteredJoin + agg") {
      graft.spark.Dataflow.bloomFilteredJoin(ords, cust, "o_custkey", "c_custkey")
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }
    spark.stop()
  }
}
