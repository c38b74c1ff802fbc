package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the IVF scored-join overhead. */
object IvfProbe {
  def time[A](label: String)(f: => A): A = {
    val reps = 5
    var out: Option[A] = None
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      out = Some(f)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[probe] $label%-40s median ${ts(reps / 2)}%6.3fs min ${ts.head}%6.3fs")
    out.get
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
    e0.count()

    val trainArr = e0.select(col("embedding").cast("array<double>").as("__arr")).rdd
      .mapPartitions(_.map(_.getSeq[Double](0).toArray)).collect()
    val centers = Similarity.lloyd(trainArr, 44, 42)
    val bc = spark.sparkContext.broadcast(centers)
    val nearest1 = udf((a: Seq[Double]) => {
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < cs.length) {
        val c = cs(ci); var s = 0.0; var i = 0
        while (i < c.length && i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = ci }
        ci += 1
      }
      best
    })
    val cA = e0.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .withColumn("cell", nearest1(col("__cv")))
    val qA = e0.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", nearest1(col("__qv")))

    time("corpus assign count") { cA.count() }
    time("corpus assign FORCED sum(cell)") { cA.agg(sum("cell")).collect() }
    val nearest1Arr = udf((a: Array[Double]) => {
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < cs.length) {
        val c = cs(ci); var s = 0.0; var i = 0
        while (i < c.length && i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = ci }
        ci += 1
      }
      best
    })
    val cAarr = e0.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .withColumn("cell", nearest1Arr(col("__cv")))
    time("FORCED sum(cell), Array[Double] udf") { cAarr.agg(sum("cell")).collect() }
    time("query assign count") { qA.count() }
    time("join no-broadcast-hint") { cA.join(qA, "cell").count() }
    time("join broadcast hint") { cA.join(broadcast(qA), "cell").count() }
    cA.join(broadcast(qA), "cell").explain("formatted")
    time("join + cosine") {
      cA.join(broadcast(qA), "cell")
        .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv"))).count()
    }
    val cAm = e0.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .withColumn("cell", (col("neighbor_id") % 44).cast("int"))
    val qAm = e0.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", (col("query_id") % 44).cast("int"))
    time("join modulo key (no UDF)") { cAm.join(broadcast(qAm), "cell").count() }
    val cAh = cA.withColumn("cell2", col("cell") + 0).drop("cell")
    time("join UDF key, AQE off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try cA.join(broadcast(qA), "cell").count()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val qCached = broadcast(qA).cache(); qCached.count()
    time("join + cosine, cached q") {
      cA.join(qCached, "cell")
        .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv"))).count()
    }
    time("full ivfTopK nlist=44") {
      Similarity.ivfTopK(e0, "vec_id", "embedding",
        e0.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("embedding")),
        "qid", "embedding", k = 5, nlist = 44, nprobe = 6).count()
    }
    spark.stop()
  }
}
