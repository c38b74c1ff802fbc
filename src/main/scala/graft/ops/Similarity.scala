package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float|double>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — correct for
  * "a few thousand queries against a 100 TB corpus"; the corpus side streams
  * through one codegen'd projection, no shuffle except the final per-query
  * top-k, which aggregates to numQueries*k rows).
  *
  * Scale path: random-hyperplane LSH bucketing — candidates only within
  * matching signature buckets, then exact re-rank. Recall/latency trades off
  * via number of planes.
  */
object Similarity {

  /** Dot product of two equal-length numeric arrays — higher-order
    * expressions, fully codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a); val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Query side is broadcast (it must be small); ties break on
    * corpus id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val scored = c.crossJoin(q)
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: bit i = sign(v . h_i) where hyperplane
    * h_i's coordinates are deterministic pseudo-random +-1 derived from
    * xxhash64(i, coordinate). Returns a `planes`-bit Long bucket key. */
  def hyperplaneSignature(vec: Column, planes: Int = 16): Column =
    (0 until planes).map { p =>
      when(
        aggregate(zip_with(vec.cast("array<double>"),
          sequence(lit(0), size(vec) - 1),
          (x, i) => x * when(xxhash64(i, lit(p)).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          lit(0.0), (s, x) => s + x) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: exact cosine re-rank within matching
    * buckets only. Probing multiple band signatures raises recall; with
    * `bands` signatures of `planes` bits each, a pair is a candidate if any
    * band matches. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, planes: Int = 8, bands: Int = 4
  ): DataFrame = {
    def banded(df: DataFrame, id: String, vec: String, idAs: String, vecAs: String) = {
      val sigs = (0 until bands).map(b =>
        xxhash64(hyperplaneSignatureBand(col(vec), planes, b), lit(b)))
      df.select(col(id).as(idAs), col(vec).as(vecAs),
        posexplode(array(sigs: _*)).as(Seq("band", "bucket")))
    }
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id", "__cv")
    val q = banded(queries, queryId, queryVec, "query_id", "__qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(q, Seq("band", "bucket"))
      .select("query_id", "neighbor_id", "__qv", "__cv").distinct()
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** One band's signature: `planes` sign bits from hyperplanes salted by
    * (band, plane). */
  private def hyperplaneSignatureBand(vec: Column, planes: Int, band: Int): Column =
    (0 until planes).map { p =>
      when(
        aggregate(zip_with(vec.cast("array<double>"),
          sequence(lit(0), size(vec) - 1),
          (x, i) => x * when(xxhash64(i, lit(p), lit(band)).bitwiseAND(1) === 1, 1.0)
            .otherwise(-1.0)),
          lit(0.0), (s, x) => s + x) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
