package graft.tools

import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage attribution for the record-linkage pipeline. */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val reps = 3
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(reps / 2)
      println(f"[profile] $label%-44s median $med%6.2fs rows=${ts.head._2}")
    }

    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long").as("rec_id"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    val m = col("rec_id") % 28
    val dirty = cust.filter(m.isin(3L, 10L, 17L, 24L))
      .select((col("rec_id") + 1000000L).as("rec_id"),
        when(m === 10L, concat(expr("substring(c_name, 1, length(c_name) - 2)"), lit("XY")))
          .otherwise(concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))).as("c_name"),
        col("c_nationkey"),
        when(m === 17L, col("c_acctbal") + 5.0).otherwise(col("c_acctbal") + 0.005).as("c_acctbal"),
        when(m === 24L, lit("ALTERED")).otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val fx = cust.unionByName(dirty)
    val rules = Seq(
      FuzzyStringField("name", col("c_name"), maxEdit = 1, 30L, -20L),
      ExactField("segment", col("c_mktsegment"), 10L, -15L),
      NumericField("balance", col("c_acctbal"), 0.01, 20L, -10L))
    val blocks = Seq(col("c_nationkey"), col("c_mktsegment"))

    time("fixture count") { fx.count() }
    val proj = fx.select(col("rec_id"), col("c_nationkey"), col("c_mktsegment"),
      col("c_name"), col("c_acctbal")).localCheckpoint(false)
    time("raw block join pair count (no scoring)") {
      val l = proj.select(proj.columns.map(c => col(c).as(s"${c}_a")): _*)
      val r = proj.select(proj.columns.map(c => col(c).as(s"${c}_b")): _*)
      l.join(r, col("c_nationkey_a") === col("c_nationkey_b") &&
        col("c_mktsegment_a") === col("c_mktsegment_b") &&
        col("rec_id_a") < col("rec_id_b")).count()
    }
    time("block join + levenshtein filter") {
      val l = proj.select(proj.columns.map(c => col(c).as(s"${c}_a")): _*)
      val r = proj.select(proj.columns.map(c => col(c).as(s"${c}_b")): _*)
      l.join(r, col("c_nationkey_a") === col("c_nationkey_b") &&
        col("c_mktsegment_a") === col("c_mktsegment_b") &&
        col("rec_id_a") < col("rec_id_b") &&
        levenshtein(col("c_name_a"), col("c_name_b")) <= 1).count()
    }
    time("linkPairs full") {
      RecordLinkage.linkPairs(fx, "rec_id", blocks, rules, 45L).count()
    }
    val pairs = RecordLinkage.linkPairs(fx, "rec_id", blocks, rules, 45L)
      .localCheckpoint(false)
    time("resolveEntities on materialized pairs") {
      RecordLinkage.resolveEntities(fx, "rec_id", pairs).count()
    }
    spark.stop()
  }
}
