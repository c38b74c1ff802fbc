package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-attribution timings for the heavy dedup/similarity
  * pipelines (run manually; not part of the driver contract). */
object Profile {
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
      println(f"[profile] $label%-40s median $med%6.2fs rows=${ts.head._2}")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ---- minhash stages ----
    val base = docs.select(col("doc_id").as("id"), col("text"))
      .repartition(col("id"))
    // stages mirror the CURRENT pipeline layout (tokens bound as a column,
    // signature as a primitive UDF); each keeps the same localCheckpoint
    // barrier the real pipeline uses
    import graft.ops.TextAnalysis
    time("minhash: tokens to barrier") {
      base.withColumn("__toks", TextAnalysis.tokens(col("text")))
        .drop("text").localCheckpoint(false).count()
    }
    time("minhash: tokens+shingleUdf to barrier") {
      base.withColumn("__toks", TextAnalysis.tokens(col("text")))
        .withColumn("shingles", Dedup.wordShinglesForProfile(3)(col("__toks")))
        .filter(size(col("shingles")) > 0)
        .drop("text", "__toks").localCheckpoint(false).count()
    }
    time("minhash: + xxhash of shingles to barrier") {
      base.withColumn("__toks", TextAnalysis.tokens(col("text")))
        .withColumn("shingles", Dedup.wordShinglesForProfile(3)(col("__toks")))
        .filter(size(col("shingles")) > 0)
        .withColumn("__sh_hashes", transform(col("shingles"), s => xxhash64(s)))
        .drop("text", "__toks").localCheckpoint(false).count()
    }
    val sigStage = Dedup.minHashWithSig(docs, "doc_id", "text", 3, 128)
    time("minhash: withSig stage (to its barrier)") {
      Dedup.minHashWithSig(docs, "doc_id", "text", 3, 128).count()
    }
    time("minhash: bands+join after barrier") {
      Dedup.minHashPairsFromSig(sigStage, 16, 8, 0.6).count()
    }
    time("minhash: full pipeline") {
      Dedup.minHashLSH(docs, "doc_id", "text", threshold = 0.6).count()
    }

    val d2 = docs.withColumn("head", lower(substring(col("text"), 1, 100)))
    time("ngram: grams stage") {
      Dedup.ngramGramsStage(d2, "doc_id", "head", "lang", 3).count()
    }
    val gStage = Dedup.ngramGramsStage(d2, "doc_id", "head", "lang", 3)
    time("ngram: ordered stage") {
      Dedup.ngramOrderedStage(gStage).count()
    }
    val oStage = Dedup.ngramOrderedStage(gStage)
    time("ngram: candidates from ordered") {
      Dedup.ngramCandidatesStage(oStage, 0.8).count()
    }
    time("ngram: verify from ordered") {
      Dedup.ngramVerifyStage(Dedup.ngramCandidatesStage(oStage, 0.8), oStage, 0.8).count()
    }
    time("ngram: verify partitioned (no bcast)") {
      Dedup.ngramVerifyStage(Dedup.ngramCandidatesStage(oStage, 0.8), oStage, 0.8,
        broadcastGrams = false).count()
    }
    time("ngram jaccard: full pipeline") {
      Dedup.ngramJaccardPairs(d2, "doc_id", "head", "lang", n = 3, threshold = 0.8).count()
    }
    time("simhash: full pipeline") {
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3).count()
    }

    // ---- embedding LSH pieces ----
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val planted = e.filter(col("id") < 200)
      .select((-(col("id") + lit(1L))).as("id"),
        expr("transform(vec, (x, i) -> x + 0.02 * cos(CAST(i AS DOUBLE)))").as("vec"))
    val corpus = e.unionByName(planted)
    time("emb: LSH pairs only") {
      Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95).count()
    }
    val sub = corpus.filter(col("id") < 500)
      .localCheckpoint(false)
    val la = sub.select(col("id").as("id_a"), col("vec").as("v_a"))
    val rb = sub.select(col("id").as("id_b"), col("vec").as("v_b"))
    time("emb: subset BNLJ count only") {
      la.join(broadcast(rb), col("id_a") < col("id_b")).count()
    }
    time("emb: + cosine filter (checkpointed sub)") {
      la.join(broadcast(rb), col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.95).count()
    }
    time("emb: pair rows materialize (ckpt)") {
      la.join(broadcast(rb), col("id_a") < col("id_b")).localCheckpoint(false).count()
    }
    val pairsCk = la.join(broadcast(rb), col("id_a") < col("id_b")).localCheckpoint(false)
    time("emb: cosine UDF over ckpt pairs") {
      pairsCk.withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.95).count()
    }
    time("emb: expression cosine over ckpt pairs") {
      val na = sqrt(aggregate(transform(col("v_a"), x => x * x), lit(0.0), (s, x) => s + x))
      val nb = sqrt(aggregate(transform(col("v_b"), x => x * x), lit(0.0), (s, x) => s + x))
      val d = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y), lit(0.0), (s, x) => s + x)
      pairsCk.withColumn("cos",
        when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb)))
        .filter(col("cos") >= 0.95).count()
    }
    // ---- IVF pieces ----
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
    time("ivf: corpus count job") {
      e0.select(col("embedding").cast("array<double>")).count()
    }
    time("ivf: train sample collect") {
      e0.select(col("embedding").cast("array<double>").as("__arr")).rdd
        .mapPartitions(_.map(_.getSeq[Double](0).toArray)).collect().length.toLong
    }
    val trainArr = e0.select(col("embedding").cast("array<double>").as("__arr")).rdd
      .mapPartitions(_.map(_.getSeq[Double](0).toArray)).collect()
    time("ivf: lloyd driver-side (k=80)") {
      Similarity.lloyd(trainArr, 80, 42).length.toLong
    }
    time("ivf: full query") {
      val queries = e0.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      val nlist = math.max(16, math.min(256, math.sqrt(e0.count().toDouble).toInt))
      Similarity.ivfTopK(e0, "vec_id", "embedding", queries, "qid", "embedding",
        k = 5, nlist = nlist, nprobe = math.max(4, nlist / 8)).count()
    }
    val centers80 = Similarity.lloyd(trainArr, 44, 42)
    val nearest1 = udf((a: Seq[Double]) => {
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < centers80.length) {
        val c = centers80(ci); var s = 0.0; var i = 0
        while (i < c.length && i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = ci }
        ci += 1
      }
      best
    })
    val cAssigned = e0.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .withColumn("cell", nearest1(col("__cv")))
    time("ivf: corpus assignment only") { cAssigned.count() }
    val qAssigned = broadcast(e0.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", nearest1(col("__qv"))))
    time("ivf: scored join count") {
      cAssigned.join(qAssigned, "cell")
        .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv"))).count()
    }
    spark.stop()
  }
}
