package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ladder evidence for the embedding-LSH hot-bucket escape: on CLUSTERED
  * embeddings (the realistic shape — and the testdata's: vectors carry
  * label clusters), random-hyperplane buckets are occupied proportionally
  * to cluster mass, so with fixed signature width the within-bucket pair
  * volume grows QUADRATICALLY in corpus scale — the dedup_embedding_lsh
  * 100x rung reads ~35x its 10x cost for exactly this reason. The escape
  * is the same star collapse as every banded family here
  * ([[graft.ops.Dedup.bandedCandidates]] maxBucket): over-cap buckets
  * release rep-member stars, which preserves cluster CONNECTIVITY (the
  * near-dup CC consumer repairs pair-level recall transitively).
  *
  * Prints uncapped vs capped wall-clock + released pair counts at the
  * given ladder dir. Evidence tooling only — never a gate input. */
object LadderEmb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/ladder_x100"
    val cap = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("ladder-emb").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Plant a PADDING-EMBEDDING mass: 2% of the corpus as one constant
    // vector (negative ids) — the real-corpus hot-bucket shape (zero /
    // default embeddings from failed or empty inputs land in ONE bucket
    // per band; rotated-replica geometry alone never concentrates mass)
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val dim = e0.select(size(col("vec"))).head().getInt(0)
    val nPad = e0.count() / 50
    val pad = spark.range(nPad).select((-col("id") - 1).as("id"),
      typedLit(Array.fill(dim)(0.25)).as("vec"))
    val e = e0.unionByName(pad).localCheckpoint(false)
    println(s"[ladder-emb] $dir: ${e.count()} vectors (incl. $nPad padding)")
    for ((label, mb) <- Seq("uncapped" -> 0, s"capped($cap)" -> cap)) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.embeddingNearDups(e, "id", "vec",
        threshold = 0.95, maxBucket = mb).queryExecution.toRdd.count()
      println(f"[ladder-emb] $label: $pairs pairs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
