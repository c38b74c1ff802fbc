package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage attribution for the dedup_embedding_lsh bench query. */
object ProfileEmb {
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

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val planted = e.filter(col("id") < 200)
      .select((-(col("id") + lit(1L))).as("id"),
        expr("transform(vec, (x, i) -> x + 0.02 * cos(CAST(i AS DOUBLE)))").as("vec"))
    val corpus = e.unionByName(planted)
    println(s"[profile] corpus rows = ${corpus.count()}")

    val s0 = corpus.select(col("id"), col("vec"))
    time("emb: corpus materialize") { s0.localCheckpoint(false).count() }
    val banded = s0.select(col("id"),
      posexplode(Similarity.bandBuckets(col("vec"), 8, 8)).as(Seq("band", "bucket")))
      .select("id", "band", "bucket")
    time("emb: banded explode") { banded.count() }
    val bandedCk = banded.localCheckpoint(false)
    val l = bandedCk.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = bandedCk.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.hint("shuffle_hash").join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    time("emb: bucket self-join (no distinct)") { candidates.count() }
    time("emb: bucket self-join + distinct") { candidates.distinct().count() }
    val candCk = candidates.distinct().localCheckpoint(false)
    val va = s0.select(col("id").as("id_a"), col("vec").as("v_a"))
    val vb = s0.select(col("id").as("id_b"), col("vec").as("v_b"))
    time("emb: join-back + cosine") {
      candCk.join(va.hint("shuffle_hash"), "id_a")
        .join(vb.hint("shuffle_hash"), "id_b")
        .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cosine") >= 0.95).count()
    }
    time("emb: full embeddingNearDups") {
      Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95).count()
    }
    time("emb: full LSH + localCheckpoint") {
      Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95)
        .select("id_a", "id_b").localCheckpoint().count()
    }
    val lsh = Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95)
      .select("id_a", "id_b").localCheckpoint()
    val sub = corpus.filter(col("id") < 500)
    val la = sub.select(col("id").as("id_a"), col("vec").as("v_a"))
    val rb = sub.select(col("id").as("id_b"), col("vec").as("v_b"))
    time("emb: exact anchor + localCheckpoint") {
      la.join(broadcast(rb), col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.95)
        .select("id_a", "id_b").localCheckpoint().count()
    }
    val exact = la.join(broadcast(rb), col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= 0.95)
      .select("id_a", "id_b").localCheckpoint()
    for ((p, b) <- Seq((8, 8), (10, 10), (12, 12), (14, 10), (16, 8))) {
      time(s"emb: nearDups planes=$p bands=$b") {
        Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95, planes = p, bands = b).count()
      }
      val cand = s0.select(col("id"),
          posexplode(Similarity.bandBuckets(col("vec"), p, b)).as(Seq("band", "bucket")))
        .select("id", "band", "bucket")
      val cl = cand.select(col("band"), col("bucket"), col("id").as("id_a"))
      val cr = cand.select(col("band"), col("bucket"), col("id").as("id_b"))
      println(s"[profile]   candidates p=$p b=$b: " +
        cl.join(cr, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().count())
    }
    time("emb: single-pass probe (full outer)") {
      val lshQ = Dedup.embeddingNearDups(corpus, "id", "vec", threshold = 0.95)
        .select(col("id_a"), col("id_b"), lit(1L).as("in_lsh"))
      val exQ = la.join(broadcast(rb), col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") >= 0.95)
        .select(col("id_a"), col("id_b"), lit(1L).as("in_exact"))
      lshQ.join(exQ, Seq("id_a", "id_b"), "full_outer")
        .agg(
          sum(when(col("in_lsh").isNotNull &&
            col("id_a") === -(col("id_b") + lit(1L)), 1L).otherwise(0L)).as("n_planted_found"),
          sum(when(col("in_lsh").isNotNull, 1L).otherwise(0L)).as("n_pairs_total"),
          sum(when(col("in_exact").isNotNull, 1L).otherwise(0L)).as("n_exact_pairs"),
          sum(when(col("in_exact").isNotNull && col("in_lsh").isNotNull, 1L).otherwise(0L))
            .as("n_exact_found"))
        .count()
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("cc: minhash portable pairs") {
      Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6).count()
    }
    val pairsCkCc = Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").localCheckpoint(false)
    time("cc: connectedComponents on materialized pairs") {
      Dedup.connectedComponents(pairsCkCc).count()
    }
    time("cc: full dedup_components pipeline") {
      Dedup.connectedComponents(
        Dedup.minHashLSHPortable(docs, "doc_id", "text", threshold = 0.6)
          .select("id_a", "id_b")).count()
    }
    time("emb: probe aggregates") {
      val probe = lsh.agg(
        sum(when(col("id_a") === -(col("id_b") + lit(1L)), 1L).otherwise(0L))
          .as("n_planted_found"),
        count(lit(1)).as("n_pairs_total"))
      val recall = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_exact_found"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact_pairs")))
      probe.crossJoin(recall).count()
    }
    spark.stop()
  }
}
