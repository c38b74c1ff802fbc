package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Derives the sf1-equivalent scale-ladder corpus (10x documents +
  * embeddings) from the read-only sf0.1 tables, deterministically:
  *
  *  - documents: 10 replicas; replica k > 0 Caesar-shifts every letter and
  *    digit by k, so EVERY char changes — cross-replica similarity is ~zero
  *    for char-shingle AND token-shingle operators alike — while the
  *    WITHIN-replica near-dup structure is exactly sf0.1's. The derived
  *    corpus is therefore 10 disjoint copies of the sf0.1 dedup problem —
  *    the honest shape for measuring whether the banded / windowed paths
  *    scale linearly in rows (any super-linear growth is the algorithm,
  *    not new cross-replica structure). (A first attempt salted token
  *    SUFFIXES instead; that leaves intra-token char 3-grams shared across
  *    replicas, which manufactures ~quadratic cross-replica near-dup
  *    structure and poisons the char-shingle measurements.)
  *  - embeddings: 10 replicas; replica k rotates each vector by k
  *    positions (norm- and spread-preserving) and offsets vec_id/label
  *    ids, so IVF/PQ training sees a 10x corpus with the same geometry.
  *
  * SKEW mode (4th arg "skew"): ~30% of clone replicas (k%10 ∈ {1,4,7},
  * k > 0) route their mass into ONE hot key per guard-protected family —
  * un-salted text (their docs are byte-identical to replica 0's, so one
  * set of minhash band buckets absorbs the mass), un-rotated vectors (one
  * hot IVF cell / hyperplane bucket), one event_type (one hot DP /
  * continual partition key), and one (nation, segment) composite (one hot
  * equi-block; balances still differ by >= 0.07 so no cross-replica pair
  * RELEASES — the skew stresses candidate volume, not output size). This
  * is the worst case the uniform replicas never test: every 100 TB claim
  * in this repo rests on "bucketed + guarded", and the guards' job is
  * precisely this shape.
  *
  * Usage: runMain graft.tools.ScaleLadderGen <srcDir> <outDir> [replicas] [mode]
  * Evidence tooling only — never a gate input (TESTDATA.md stays the gate
  * source of truth).
  */
object ScaleLadderGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/scale_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val skew = args.length > 3 && args(3) == "skew"
    // the hot 30%: replicas 1, 4, 7, 11, 14, ... (k = 0 keeps the base)
    def hot(k: org.apache.spark.sql.Column) =
      lit(skew) && k > 0 && (k % 10).isin(1, 4, 7)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("scale-ladder-gen").getOrCreate()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    // offset stride = max(id)+1, NOT count(): sparse ids would otherwise
    // collide across replicas — precisely the generator-made structure the
    // scaladoc above warns poisons the measurements
    val nDocs = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    // Per-replica char map: AFFINE x -> a*x + b (mod 26 / mod 10), a a
    // unit. A plain Caesar shift (a = 1) repeats at k >= 26 — replica 26's
    // letters would be IDENTICAL to replica 0's, manufacturing quadratic
    // cross-replica near-dup structure precisely at the 30x rung meant to
    // expose quadratic terms. Affine gives 12*26 = 312 distinct letter
    // maps; k < 26 keeps a = 1, so the 3x/10x rungs reproduce the
    // round-6/7 ladders bit-for-bit.
    val unitsL = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val unitsD = Array(1, 3, 7, 9)
    val salt = udf((t: String, k: Int) =>
      if (t == null || k == 0) t
      else {
        val aL = unitsL((k / 26) % 12); val bL = k % 26
        val aD = unitsD((k / 10) % 4); val bD = k % 10
        t.map { c =>
          if (c >= 'a' && c <= 'z') ((aL * (c - 'a') + bL) % 26 + 'a').toChar
          else if (c >= 'A' && c <= 'Z') ((aL * (c - 'A') + bL) % 26 + 'A').toChar
          else if (c >= '0' && c <= '9') ((aD * (c - '0') + bD) % 10 + '0').toChar
          else c
        }
      })
    val docsN = docs
      .crossJoin(spark.range(replicas).select(col("id").cast("int").as("k")))
      .select((col("doc_id") + col("k").cast("long") * nDocs).as("doc_id"),
        salt(col("text"),
          when(hot(col("k")), lit(0)).otherwise(col("k"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docsN.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val nLabel = emb.agg(max("label")).collect()(0).getInt(0) + 1
    val rot = udf((v: Array[Float], k: Int) => {
      if (v == null || k == 0) v
      else {
        val n = v.length
        val o = new Array[Float](n)
        var i = 0
        while (i < n) { o(i) = v((i + k) % n); i += 1 }
        o
      }
    })
    emb.crossJoin(spark.range(replicas).select(col("id").cast("int").as("k")))
      .select((col("vec_id") + col("k").cast("long") * nVec).as("vec_id"),
        rot(col("embedding"),
          when(hot(col("k")), lit(0)).otherwise(col("k"))).as("embedding"),
        (col("label") + col("k") * nLabel).cast("int").as("label"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // events: replica k offsets user_id/event_id (disjoint privacy units,
    // same 5 partition keys, same per-unit contribution profile), keeping
    // the DP aggregate's partition count constant while row volume and
    // privacy-unit count scale 10x — the honest shape for the DP tier.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val nUsers = ev.agg(max("user_id")).collect()(0).getLong(0) + 1
    val nEvents = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
    ev.crossJoin(spark.range(replicas).select(col("id").as("k")))
      .select((col("event_id") + col("k") * nEvents).as("event_id"),
        col("ts"), (col("user_id") + col("k") * nUsers).as("user_id"),
        when(hot(col("k")), lit("click")).otherwise(col("event_type"))
          .as("event_type"),
        col("value"), col("props"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    // orders: replica k offsets o_orderkey/o_custkey (disjoint keys, same
    // date span), so the Z-order layout problem keeps its y-geometry while
    // the x-range and row volume scale together — the honest shape for
    // measuring that the layout shuffle is the only full-data exchange.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val nOrd = ord.agg(max("o_orderkey")).collect()(0).getLong(0) + 1
    val nCust = ord.agg(max("o_custkey")).collect()(0).getLong(0) + 1
    ord.crossJoin(spark.range(replicas).select(col("id").as("k")))
      .select((col("o_orderkey") + col("k") * nOrd).as("o_orderkey"),
        (col("o_custkey") + col("k") * nCust).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/orders.parquet")

    // customer: replica k offsets c_custkey and shifts c_acctbal by
    // k * 0.07 — names/nations/segments repeat across replicas, but every
    // cross-replica balance pair differs by >= 0.07 > the ER gate's 0.01
    // tolerance, so the linkage score caps at 30+10-10 = 30 < threshold
    // and NO cross-replica links exist: the derived corpus is `replicas`
    // disjoint copies of the sf0.1 linkage problem (the same honest-shape
    // rule as the salted documents above).
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val nCustK = cust.agg(max("c_custkey")).collect()(0).getLong(0) + 1
    cust.crossJoin(spark.range(replicas).select(col("id").as("k")))
      .select((col("c_custkey") + col("k") * nCustK).as("c_custkey"),
        col("c_name"),
        when(hot(col("k")), lit(0)).otherwise(col("c_nationkey"))
          .cast("int").as("c_nationkey"),
        (col("c_acctbal") + col("k").cast("double") * 0.07).as("c_acctbal"),
        when(hot(col("k")), lit("BUILDING")).otherwise(col("c_mktsegment"))
          .as("c_mktsegment"))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/customer.parquet")

    println(s"[scale-ladder] wrote $out: x$replicas replicas " +
      s"(doc id stride $nDocs, vec id stride $nVec, order id stride $nOrd)")
    spark.stop()
  }
}
