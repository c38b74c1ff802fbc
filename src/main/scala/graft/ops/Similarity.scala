package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Input row of the top-k aggregate: one scored candidate. */
final case class ScoredNeighbor(cosine: Double, neighbor_id: Long)

/** Bounded top-k state: parallel arrays sorted by (cosine desc, id asc),
  * length <= k. Kept as a product type so the buffer ser/de is Tungsten
  * (no kryo) when it spills or crosses the partial/final exchange. */
final case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Input row of the centroid aggregate: one vector. */
final case class VecIn(v: Array[Double])

/** Input row for the covariance moment aggregator: one int8-quantized
  * vector widened to longs. */
final case class QVecIn(q: Array[Long])

/** Exact second-moment state over quantized vectors: count, per-dimension
  * sums, and the upper-triangle cross-product sums (pair (i, j), i <= j,
  * lives at index i*d - i*(i-1)/2 + (j-i)). All-integer, so partials are
  * order-independent under any partitioning and merge by addition. */
final case class CovState(n: Long, sums: Array[Long], prods: Array[Long])

/** Centroid state: exact per-dimension quantized sums + vector count. */
final case class VecState(sums: Array[Long], n: Long)

/** Centroid result: per-dimension means + vector count. */
final case class VecCentroid(centroid: Array[Double], n: Long)

/** Exact group-wise vector centroid over QUANTIZED coordinates: each
  * coordinate contributes floor(x * scale) as a LONG, so the partial sums
  * are exact integers — order-independent under any partitioning (float
  * summation order is not, which would break independent-oracle
  * verification), and the aggregator state crossing the wire is one
  * long[dim] + count per (group, task) with full map-side combine. The
  * mean divides each exact sum by (n * scale) as the single double op.
  *
  * Every vector in a group must have the same length and finite
  * coordinates; a ragged group or a NaN coordinate fails the job loudly
  * (the mean-of-what question has no right silent answer: dividing by the
  * group count is wrong for short vectors, and floor(NaN) would quantize
  * to 0). Mismatched lengths always meet in some reduce or merge because
  * a non-empty state's sums array length IS its dimension. */
final class QuantizedCentroidAggregator(scale: Double)
    extends Aggregator[VecIn, VecState, VecCentroid] {
  require(scale > 0, s"scale must be positive, got $scale")

  def zero: VecState = VecState(Array.emptyLongArray, 0L)

  def reduce(b: VecState, a: VecIn): VecState = {
    if (a.v == null) b
    else {
      val d = a.v.length
      if (b.n > 0 && b.sums.length != d)
        throw new IllegalArgumentException(
          s"centroid: ragged group — vector of length $d in a group of length ${b.sums.length}")
      val sums =
        if (b.sums.length >= d) b.sums
        else java.util.Arrays.copyOf(b.sums, d)
      var i = 0
      while (i < d) {
        val x = a.v(i)
        if (!java.lang.Double.isFinite(x)) throw new IllegalArgumentException(
          s"centroid: non-finite coordinate $x at index $i — floor(NaN) would " +
            "silently quantize to 0 and Infinity saturates the long sum")
        sums(i) += math.floor(x * scale).toLong
        i += 1
      }
      VecState(sums, b.n + 1)
    }
  }

  def merge(b1: VecState, b2: VecState): VecState = {
    if (b2.n == 0) b1
    else if (b1.n == 0) b2
    else {
      if (b1.sums.length != b2.sums.length)
        throw new IllegalArgumentException(
          s"centroid: ragged group — partials of length ${b1.sums.length} and ${b2.sums.length}")
      val sums = java.util.Arrays.copyOf(b1.sums, b1.sums.length)
      var i = 0
      while (i < b2.sums.length) { sums(i) += b2.sums(i); i += 1 }
      VecState(sums, b1.n + b2.n)
    }
  }

  def finish(b: VecState): VecCentroid =
    if (b.n == 0) VecCentroid(Array.emptyDoubleArray, 0L)
    else {
      val den = b.n.toDouble * scale
      VecCentroid(b.sums.map(_.toDouble / den), b.n)
    }

  def bufferEncoder: Encoder[VecState] = Encoders.product[VecState]
  def outputEncoder: Encoder[VecCentroid] = Encoders.product[VecCentroid]
}

/** Partial top-k aggregate: each map task keeps at most k candidates per
  * query, so the exchange carries k rows per (query, task) instead of the
  * whole scored corpus, and no per-query global sort ever runs. Replaces a
  * `row_number().over(Window.partitionBy(query))` finalization whose
  * parallelism is capped at #queries. */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def reduce(b: TopKBuf, a: ScoredNeighbor): TopKBuf = {
    val n = b.scores.length
    if (n == k && !beats(a.cosine, a.neighbor_id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      var pos = n
      while (pos > 0 && beats(a.cosine, a.neighbor_id, b.scores(pos - 1), b.ids(pos - 1)))
        pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      System.arraycopy(b.scores, 0, ns, 0, pos)
      System.arraycopy(b.ids, 0, ni, 0, pos)
      ns(pos) = a.cosine; ni(pos) = a.neighbor_id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.scores, pos, ns, pos + 1, tail)
        System.arraycopy(b.ids, pos, ni, pos + 1, tail)
      }
      TopKBuf(ns, ni)
    }
  }

  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    if (b2.scores.isEmpty) b1
    else if (b1.scores.isEmpty) b2
    else {
      val m = math.min(b1.scores.length + b2.scores.length, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeLeft = j >= b2.scores.length ||
          (i < b1.scores.length && beats(b1.scores(i), b1.ids(i), b2.scores(j), b2.ids(j)))
        if (takeLeft) { ns(o) = b1.scores(i); ni(o) = b1.ids(i); i += 1 }
        else { ns(o) = b2.scores(j); ni(o) = b2.ids(j); j += 1 }
        o += 1
      }
      TopKBuf(ns, ni)
    }
  }

  def finish(b: TopKBuf): TopKBuf = b
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Similarity search over an embedding column (`array<float|double>`).
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — correct for
  * "a few thousand queries against a 100 TB corpus"; the corpus side streams
  * through one codegen'd projection; the only exchange carries at most
  * k rows per (query, map task) thanks to the partial top-k aggregate).
  *
  * Scale path: random-hyperplane LSH bucketing — candidates only within
  * matching signature buckets (ids only; vectors joined back after the
  * distinct), then exact re-rank. Recall/latency trades off via number of
  * planes/bands.
  */
/** Exact covariance MOMENTS over int8-quantized embeddings — the whitening
  * / PCA-prep statistic computed the 100 TB way: one pass, one mergeable
  * state of d + d(d+1)/2 longs per task (for d = 64 that is ~17 KB
  * crossing the wire per partial, full map-side combine), no per-pair
  * shuffle. Covariance follows as n*Sxy - Sx*Sy in the caller's chosen
  * precision; with |x| <= 127 the BIGINT form is exact up to ~7e8 vectors
  * — beyond that compute the final subtraction in decimal(38,0).
  *
  * Integer moments over DETERMINISTICALLY quantized values are the trick
  * that makes a covariance matrix oracle-verifiable at all: float
  * accumulation order would diverge per partitioning (same argument as
  * the centroid aggregator). Ragged vectors fail loudly — a non-empty
  * state's sums length IS its dimension. */
final class CovMomentAggregator
    extends Aggregator[QVecIn, CovState, CovState] {

  def zero: CovState = CovState(0L, Array.emptyLongArray, Array.emptyLongArray)

  def reduce(b: CovState, a: QVecIn): CovState = {
    if (a.q == null)
      // fail loud (file convention): silently skipping a null vector
      // would skew n against every independent replay of the moments
      throw new IllegalArgumentException(
        "covariance: null vector — filter or impute upstream")
    else {
      val d = a.q.length
      if (b.n > 0 && b.sums.length != d)
        throw new IllegalArgumentException(
          s"covariance: ragged input — vector of length $d after ${b.sums.length}")
      val sums = if (b.sums.length >= d) b.sums else new Array[Long](d)
      val prods = if (b.prods.length > 0) b.prods else new Array[Long](d * (d + 1) / 2)
      var i = 0
      var idx = 0
      while (i < d) {
        val xi = a.q(i)
        sums(i) += xi
        var j = i
        while (j < d) { prods(idx) += xi * a.q(j); j += 1; idx += 1 }
        i += 1
      }
      CovState(b.n + 1, sums, prods)
    }
  }

  def merge(b1: CovState, b2: CovState): CovState = {
    if (b2.n == 0) b1
    else if (b1.n == 0) b2
    else {
      if (b1.sums.length != b2.sums.length)
        throw new IllegalArgumentException(
          s"covariance: ragged partials ${b1.sums.length} vs ${b2.sums.length}")
      val sums = java.util.Arrays.copyOf(b1.sums, b1.sums.length)
      val prods = java.util.Arrays.copyOf(b1.prods, b1.prods.length)
      var i = 0
      while (i < sums.length) { sums(i) += b2.sums(i); i += 1 }
      i = 0
      while (i < prods.length) { prods(i) += b2.prods(i); i += 1 }
      CovState(b1.n + b2.n, sums, prods)
    }
  }

  def finish(b: CovState): CovState = b
  def bufferEncoder: Encoder[CovState] = Encoders.product[CovState]
  def outputEncoder: Encoder[CovState] = Encoders.product[CovState]
}

object Similarity {

  /** Dot product of two equal-length numeric arrays as a higher-order
    * expression (kept for composability in non-hot paths). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero or null.
    *
    * Backed by the NATIVE Catalyst expression [[graft.functions.CosineSim]]
    * (whole-stage codegen, reads ArrayData in place — no per-row
    * UnsafeArrayData -> Array[Double] copy and no UDF invocation boundary;
    * the history of this hot path is interpreted higher-order lambdas ->
    * primitive-loop Array UDF -> codegen expression, each tier measured).
    * The generated loop performs the same IEEE operations in the same order
    * as both prior forms (index-ascending products summed from +0.0, norms
    * over each full array), so results are bit-identical — oracle parity
    * preserved across the swap. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Per-query top-k of pre-scored candidates via the bounded-heap partial
    * aggregate; emits (query_id, neighbor_id, cosine, rank). */
  private def finalizeTopK(scored: DataFrame, k: Int): DataFrame = {
    val tk = udaf(new TopKAggregator(k), Encoders.product[ScoredNeighbor])
    scored
      .groupBy("query_id")
      .agg(tk(col("cosine"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(arrays_zip(
        col("tk.scores").as("cosine"), col("tk.ids").as("neighbor_id"))))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        col("col.cosine").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Query side is broadcast (it must be small); ties break on
    * corpus id for determinism. */
  /** Exact per-group embedding centroid (quantized-integer sums; see
    * [[QuantizedCentroidAggregator]]) — the class-prototype computation
    * behind semantic clustering / data-mixture analysis. One shuffle whose
    * payload is a long[dim] per (group, task). */
  def centroidByKey(
      df: DataFrame, keyCol: String, vecCol: String, scale: Double = 1000.0
  ): DataFrame = {
    val agg = udaf(new QuantizedCentroidAggregator(scale), Encoders.product[VecIn])
    df.select(col(keyCol).as("key"), col(vecCol).cast("array<double>").as("v"))
      .groupBy("key")
      .agg(agg(col("v")).as("c"))
      .select(col("key"), col("c.centroid").as("centroid"), col("c.n").as("n"))
  }

  /** Exact upper-triangle covariance of the int8-QUANTIZED embedding
    * coordinates (whitening / PCA prep): one row per dimension pair
    * (i <= j) with the raw moments and cov_e = n*Sxy - Sx*Sy (the n^2 x
    * covariance — integer-exact, division-free; callers divide by n^2 in
    * their own precision). One pass, one [[CovMomentAggregator]] state per
    * task, pair rows generated from the single result row — no per-pair
    * shuffle at any corpus size. */
  def covarianceMoments(df: DataFrame, vecCol: String): DataFrame = {
    val agg = udaf(new CovMomentAggregator, Encoders.product[QVecIn])
    val q = df.select(
      quantizeInt8(col(vecCol)).getField("q").cast("array<bigint>").as("qv"))
    val st = q.agg(agg(col("qv")).as("st"))
      .select(col("st.n").as("n"), col("st.sums").as("sums"),
        col("st.prods").as("prods"))
    // (i, j) pair rows from the one state row: two chained generators over
    // the KNOWN dimension (the sums array length), never a driver loop.
    // Empty input leaves the zero state's sums empty, and Spark's
    // sequence(0, -1) is the DESCENDING [0, -1] (not empty) — the n > 0
    // guard returns zero rows instead of an array-index crash.
    st.filter(col("n") > 0L)
      .select(col("n"), col("sums"), col("prods"),
        explode(expr("sequence(0, size(sums) - 1)")).as("i"))
      .select(col("n"), col("sums"), col("prods"), col("i"),
        explode(expr("sequence(i, size(sums) - 1)")).as("j"))
      .select(col("i"), col("j"), col("n"),
        expr("sums[i]").as("sx"), expr("sums[j]").as("sy"),
        expr("prods[CAST(i * size(sums) - i * (i - 1) div 2 + (j - i) AS INT)]")
          .as("sxy"))
      .withColumn("cov_e", col("n") * col("sxy") - col("sx") * col("sy"))
  }

  /** PCA projection to the top-`k` principal components — the LEARNED
    * counterpart to [[randomProject]]'s data-oblivious JL matrix, and the
    * standard whitening/compression step before clustering or ANN.
    *
    * The covariance comes from [[covarianceMoments]] — the oracle-exact
    * integer moments over the int8 quantization — collected driver-side
    * (d(d+1)/2 rows, bounded by the embedding dimensionality, never the
    * corpus). Eigenpairs via cyclic JACOBI with a fixed sweep order and a
    * fixed convergence rule, eigenvalues sorted (desc, index tie-break)
    * and every eigenvector sign-canonicalized (first coordinate above
    * 1e-9 made positive) — fully deterministic, so repeated runs and
    * different partitionings produce bit-identical projections. The
    * projection pass multiplies each QUANTIZED vector (integer coords)
    * with the broadcast d x k matrix: map-only, no shuffle.
    *
    * Returns (id, pc array<double>, probe_ortho_e9, probe_resid_e9):
    * the probes pin W^T W ~= I (max deviation, 1e-9 units) and the
    * eigen-residual max ||Cov w - lambda w||_inf / max|lambda| against
    * the untouched covariance in-query, per the rows-only convention. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rows = covarianceMoments(df, vecCol)
      .select("i", "j", "n", "cov_e").collect()
    require(rows.nonEmpty, "pcaProject: empty corpus has no covariance")
    val d = rows.map(_.getInt(0)).max + 1
    require(k <= d, s"k=$k exceeds dimensionality $d")
    val n = rows.head.getLong(2).toDouble
    val a = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val c = r.getLong(3).toDouble / (n * n)
      a(r.getInt(0))(r.getInt(1)) = c
      a(r.getInt(1))(r.getInt(0)) = c
    }
    // untouched copy for the eigen-residual probe (Jacobi mutates `a`)
    val cov = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // cyclic Jacobi: deterministic sweep order (p ascending, q ascending)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 && sweep < 60) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i)).take(k)
    val w = Array.tabulate(d, k) { (i, c) =>
      val src = order(c)
      // sign canonicalization: first |coord| > 1e-9 positive
      val firstIdx = (0 until d).find(r => math.abs(v(r)(src)) > 1e-9).getOrElse(0)
      if (v(firstIdx)(src) < 0) -v(i)(src) else v(i)(src)
    }
    // in-query probes (driver-computed constants riding every row)
    var orthoErr = 0.0
    for (c1 <- 0 until k; c2 <- c1 until k) {
      val dot = (0 until d).map(i => w(i)(c1) * w(i)(c2)).sum
      orthoErr = math.max(orthoErr, math.abs(dot - (if (c1 == c2) 1.0 else 0.0)))
    }
    // eigen-RESIDUAL against the untouched covariance: max over the kept
    // eigenpairs of ||Cov w_c - lambda_c w_c||_inf, scaled by max|lambda|.
    // A broken eigensolve (sweep cap hit, rotation bug) makes this blow
    // up; an order check over the just-sorted list would be vacuous.
    val lambdaMax = math.max(order.map(i => math.abs(a(i)(i))).max, 1e-30)
    var residErr = 0.0
    for (c <- 0 until k) {
      val lam = a(order(c))(order(c))
      for (i <- 0 until d) {
        val avi = (0 until d).map(j => cov(i)(j) * w(j)(c)).sum
        residErr = math.max(residErr, math.abs(avi - lam * w(i)(c)))
      }
    }
    val residE9 = math.round(residErr / lambdaMax * 1e9)
    val f = udf((q: Seq[Byte]) => {
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        var s = 0.0; var i = 0
        val lim = math.min(q.length, d)
        while (i < lim) { s += q(i).toDouble * w(i)(j); i += 1 }
        out(j) = s
        j += 1
      }
      out
    })
    df.select(col(idCol).as("id"),
        quantizeInt8(col(vecCol)).getField("q").as("__q"))
      .select(col("id"), f(col("__q")).as("pc"),
        lit(math.round(orthoErr * 1e9)).as("probe_ortho_e9"),
        lit(residE9).as("probe_resid_e9"))
  }

  /** Semantic-outlier scoring: each vector's cosine to ITS group centroid
    * (the SemDeDup-style pruning signal — low similarity to the class
    * prototype marks mislabeled/outlier rows). Composes the exact quantized
    * centroid with the codegen cosine: centroids are tiny (one per group)
    * so the join broadcasts, and the scoring pass is map-only. */
  def centroidOutliers(
      df: DataFrame, keyCol: String, vecCol: String,
      threshold: Double, scale: Double = 1000.0
  ): DataFrame = {
    // unique internal names: dropping a plain "key"/"centroid" would also
    // remove caller columns that happen to share those names
    val cents = centroidByKey(df, keyCol, vecCol, scale)
      .select(col("key").as("__cent_key"), col("centroid").as("__cent_vec"))
    df.join(broadcast(cents), df(keyCol) === cents("__cent_key"))
      .withColumn("cos_to_centroid", cosine(col(vecCol), col("__cent_vec")))
      .withColumn("is_outlier", col("cos_to_centroid") < threshold)
      .drop("__cent_key", "__cent_vec")
  }

  /** Symmetric per-vector int8 quantization for embedding storage and ANN
    * memory (4x smaller than float32, 8x than float64): scale = max|x|/127,
    * q_i = clamp(round(x_i/scale), -127, 127), so dequantization error is
    * bounded by scale/2 per coordinate. All-native expressions (codegen;
    * arithmetic order is deterministic, so an independent engine reproduces
    * the bytes exactly). Returns struct(q: array<tinyint>, scale).
    *
    * Non-finite coordinates fail the job loudly (same convention as the
    * centroid aggregator): a NaN would otherwise make scale = NaN and —
    * since greatest/least treat NaN as largest — quantize EVERY coordinate
    * to 127; an Infinity would zero out all the others. */
  def quantizeInt8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val bad = exists(v, x => x.isNaN || abs(x) === Double.PositiveInfinity)
    val mx = array_max(transform(v, x => abs(x)))
    val scale = when(mx === 0.0, lit(1.0)).otherwise(mx / 127.0)
    when(bad, raise_error(lit(
        "quantizeInt8: non-finite coordinate — NaN/Infinity would silently " +
          "saturate the whole vector; filter or impute upstream")))
      .otherwise(struct(
        transform(v, x =>
          least(greatest(round(x / scale), lit(-127.0)), lit(127.0)).cast("tinyint")).as("q"),
        scale.as("scale")))
  }

  /** Exact top-k by brute force: every query scored against every corpus
    * row. The query side is BROADCAST (hinted explicitly, so the planner
    * never shuffles a cartesian even past the AQE/autoBroadcast
    * thresholds) — which is also why the queries-small contract is now
    * ENFORCED, not a docstring: a 10 M-row query frame would OOM every
    * executor with the broadcast table and do |q|x|corpus| work. The
    * guard counts the query frame (one cheap job on the small-by-contract
    * side) and fails loud over `maxQueries`, directing the caller to an
    * ANN path; pass `Long.MaxValue` to skip the count deliberately. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, maxQueries: Long = 100000L
  ): DataFrame = {
    val q0 = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
    if (maxQueries < Long.MaxValue) {
      // limit(cap+1) bounds the guard's job at cap+1 rows instead of a
      // full count of the query frame — same pass/fail behavior
      val nq = q0.limit(
        (math.min(maxQueries, Long.MaxValue - 1) + 1).min(Int.MaxValue).toInt)
        .count()
      require(nq <= maxQueries,
        s"bruteForceTopK: over $maxQueries query rows (the guard stops " +
          "counting there) — the query side is broadcast to every executor " +
          "and scored " +
          "against every corpus row. Use an ANN path (ivfTopK/lshTopK/" +
          "pqTopK) for large query sets, or raise the cap deliberately")
    }
    val q = broadcast(q0)
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val scored = c.crossJoin(q)
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    finalizeTopK(scored, k)
  }

  /** HARD-NEGATIVE MINING — the contrastive-training prep op: for each
    * query (anchor), the highest-cosine corpus vector with a DIFFERENT
    * label (the hard negative — the confusable example a trainer wants
    * in the batch) and the highest-cosine SAME-label vector other than
    * the anchor itself (the positive), i.e. the (anchor, positive,
    * negative) triplet feed. Returns (query_id, side, neighbor_id,
    * cosine) with side in {positive, negative}; an anchor with no
    * same-label neighbor emits no positive row. Ties break to the
    * HIGHEST neighbor id (the single-pass max(struct(cosine, id))
    * formulation — one map-side-combined aggregation, no window over
    * the cross product). NULL labels fail loud on both sides — a null
    * never equals anything, so its rows would silently land on the
    * negative side of every anchor.
    *
    * Scale shape: the query side is broadcast-small by ENFORCED contract
    * (the [[bruteForceTopK]] guard); the corpus streams through ONE scan
    * and the per-(anchor, side) max combines map-side, so nothing
    * |corpus| x |queries|-sized ever shuffles. */
  def hardNegatives(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      corpusLabel: String,
      queries: DataFrame, queryId: String, queryVec: String,
      queryLabel: String,
      maxQueries: Long = 100000L
  ): DataFrame = {
    def checkedLabel(df: DataFrame, n: String, what: String) =
      when(col(n).isNull, raise_error(lit(
        s"hardNegatives: NULL $what label — it would silently land on " +
          "the negative side of every anchor; filter or impute upstream"))
        .cast(df.schema(n).dataType))
        .otherwise(col(n))
    val q0 = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("__qv"),
      checkedLabel(queries, queryLabel, "query").as("__ql"))
    if (maxQueries < Long.MaxValue) {
      val nq = q0.limit(
        (math.min(maxQueries, Long.MaxValue - 1) + 1).min(Int.MaxValue).toInt)
        .count()
      require(nq <= maxQueries,
        s"hardNegatives: over $maxQueries query rows (the guard stops " +
          "counting there) — the query side is broadcast to every " +
          "executor and scored against every corpus row; mine in query " +
          "batches or raise the cap deliberately")
    }
    val q = broadcast(q0)
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("__cv"),
      checkedLabel(corpus, corpusLabel, "corpus").as("__cl"))
    c.crossJoin(q)
      .withColumn("side",
        when(col("__cl") === col("__ql") &&
          col("neighbor_id") =!= col("query_id"), "positive")
          .when(col("__cl") =!= col("__ql") &&
            col("neighbor_id") =!= col("query_id"), "negative"))
      // drops the anchor's own id on BOTH sides: a corpus row sharing the
      // anchor's id but carrying a DIFFERENT label (overlapping id spaces
      // with inconsistent labels) must not mine as its own "hard negative"
      .filter(col("side").isNotNull)
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .groupBy("query_id", "side")
      .agg(max(struct(col("cosine"), col("neighbor_id"))).as("__best"))
      .select(col("query_id"), col("side"),
        col("__best.neighbor_id").as("neighbor_id"),
        col("__best.cosine").as("cosine"))
  }

  /** SEMANTIC decontamination — the EMBEDDING arm of the CorpusOps
    * decontamination family (exact / near-dup / containment / bloom are
    * string-overlap arms): for every corpus vector, its MAX cosine to any
    * benchmark/eval vector plus the drop flag at `threshold`. Catches
    * paraphrased or re-worded eval leakage whose token overlap is nil —
    * the failure mode every string arm structurally misses.
    *
    * Scale shape: the eval side is broadcast-small by ENFORCED contract
    * (the [[bruteForceTopK]] guard, limit-bounded count); the corpus
    * streams through ONE scan and the per-doc max combines map-side, so
    * nothing |corpus| x |eval|-sized ever shuffles. NULL corpus vectors
    * fail loud — a silent null cosine would report the doc uncontaminated. */
  def semanticDecontaminate(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      evalSet: DataFrame, evalId: String, evalVec: String,
      threshold: Double, maxEvalRows: Long = 100000L): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0 && !threshold.isNaN,
      s"threshold must be in [-1, 1], got $threshold")
    // NULL eval vectors fail loud too: max() ignores null cosines, so a
    // null eval row would quietly WEAKEN the contamination check — the
    // same "reports uncontaminated" failure mode the corpus-side guard
    // exists for, on the side that defines what leakage even looks like
    val e0 = evalSet.select(
      when(col(evalVec).isNull, raise_error(lit(
        "semanticDecontaminate: NULL eval vector — it would silently " +
          "weaken the contamination check (null cosines are ignored by " +
          "max); filter or impute upstream")).cast("array<double>"))
        .otherwise(col(evalVec).cast("array<double>")).as("__ev"))
    if (maxEvalRows < Long.MaxValue) {
      val n = e0.limit(
        (math.min(maxEvalRows, Long.MaxValue - 1) + 1).min(Int.MaxValue).toInt)
        .count()
      require(n <= maxEvalRows,
        s"semanticDecontaminate: over $maxEvalRows eval rows (the guard " +
          "stops counting there) — the eval side is broadcast to every " +
          "executor; raise the cap deliberately or pre-reduce the set")
    }
    val checked = when(col(corpusVec).isNull, raise_error(lit(
        "semanticDecontaminate: NULL corpus vector — it would silently " +
          "score uncontaminated; filter or impute upstream"))
      .cast("array<double>"))
      .otherwise(col(corpusVec).cast("array<double>"))
    corpus.select(col(corpusId).as("doc_id"), checked.as("__cv"))
      .crossJoin(broadcast(e0))
      .groupBy(col("doc_id"))
      .agg(max(cosine(col("__cv"), col("__ev"))).as("max_eval_cosine"))
      .withColumn("contaminated", col("max_eval_cosine") >= threshold)
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

  /** splitmix64 finalizer — deterministic pseudo-random sign source for the
    * hyperplane UDFs (public-domain constant mixer). */
  @inline private[ops] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ALL band-bucket keys in one primitive pass (array<bigint> of length
    * `bands`): bit p of band b's signature is the sign of the projection
    * onto the deterministic +-1 hyperplane derived from (element, plane,
    * band). One UDF call replaces bands*planes interpreted higher-order
    * aggregates — the banding stage of the LSH pipelines is interpreter-
    * bound, not I/O-bound, so this is the 10-20x lever. */
  private[ops] def bandBuckets(vec: Column, planes: Int, bands: Int): Column = {
    val f = udf((a: Array[Double]) => {
      if (a == null) null
      else {
        val out = new Array[Long](bands)
        var b = 0
        while (b < bands) {
          var sig = 0L
          var p = 0
          while (p < planes) {
            var s = 0.0
            var i = 0
            while (i < a.length) {
              val h = mix64((i.toLong << 24) ^ (p.toLong << 12) ^ b.toLong)
              s += (if ((h & 1L) == 1L) a(i) else -a(i))
              i += 1
            }
            if (s > 0) sig |= (1L << p)
            p += 1
          }
          out(b) = mix64(sig ^ (b.toLong << 56))
          b += 1
        }
        out
      }
    })
    f(vec.cast("array<double>"))
  }

  /** LSH-bucketed approximate top-k: exact cosine re-rank within matching
    * buckets only. Probing multiple band signatures raises recall; with
    * `bands` signatures of `planes` bits each, a pair is a candidate if any
    * band matches. Candidates carry ids only through the bucket join and the
    * distinct — embedding vectors are joined back afterwards (same layout as
    * Dedup.minHashLSH), so full vectors never ride the candidate shuffle. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, planes: Int = 8, bands: Int = 4,
      maxQueries: Long = 100000L
  ): DataFrame = {
    // the query side is broadcast TWICE below (banded ids + vectors), so
    // the queries-small contract is enforced like bruteForceTopK's, not
    // left as a docstring (r15 review); pass Long.MaxValue to skip
    if (maxQueries < Long.MaxValue) {
      val nq = queries.limit(
        (math.min(maxQueries, Long.MaxValue - 1) + 1).min(Int.MaxValue).toInt)
        .count()
      require(nq <= maxQueries,
        s"lshTopK: over $maxQueries query rows (the guard stops counting " +
          "there) — the query side is broadcast to every executor; " +
          "reduce the query set or raise the cap deliberately")
    }
    def banded(df: DataFrame, id: String, vec: String, idAs: String) = {
      df.select(col(id).as(idAs),
        posexplode(bandBuckets(col(vec), planes, bands)).as(Seq("band", "bucket")))
        .select(idAs, "band", "bucket")
    }
    val cIds = banded(corpus, corpusId, corpusVec, "neighbor_id")
    val qIds = banded(queries, queryId, queryVec, "query_id")
    // ids-only candidate set; a pair may collide in several bands
    val candidates = cIds.hint("shuffle_hash")
      .join(broadcast(qIds), Seq("band", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    val cVecs = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val qVecs = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")))
    val scored = candidates
      .join(cVecs.hint("shuffle_hash"), "neighbor_id")
      .join(qVecs, "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    finalizeTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells and re-ranks exactly (cosine) inside them, so
    * only ~nprobe/nlist of the corpus is scored per query. The classical
    * ANN index layout (Sivic-Zisserman "Video Google" inverted files; the
    * IVF-flat structure popularized by FAISS), Spark-native:
    *
    *  - the quantizer trains on a SAMPLED pass over the corpus, capped at
    *    `trainRowsTarget` rows (quantizer quality needs only a representative
    *    sample — the classic 1e5-training-points rule; FAISS trains its
    *    coarse quantizers the same way). The sample is BOUNDED, so Lloyd's
    *    iterations run driver-side on the collected array (1e5 x 64 doubles
    *    = 50 MB): one distributed sampling pass total, zero per-iteration
    *    Spark jobs — a distributed k-means spends more time scheduling its
    *    ~2 jobs/iteration than this takes to converge. The model is
    *    nlist x dim doubles, broadcast in closures;
    *  - cell assignment is one linear scan (embarrassingly parallel);
    *  - the candidate join is keyed by cell id — corpus vectors ride it only
    *    into the cells that are actually probed;
    *  - the final per-query top-k is the bounded-heap partial aggregate
    *    (no global sort, parallelism not capped at #queries).
    *
    * At 100 TB: the training sample stays ~trainRowsTarget regardless of
    * corpus size; keep nlist ~ sqrt(corpus/cell-size-target).
    */
  /** The quantizer-training sampling pass shared by every clustered index
    * (IVF, PQ, semantic dedup): one distributed `sample` bounded by
    * `trainRowsTarget` rows, collected driver-side, plus the corpus row
    * count the sampling fraction needs anyway (a statistics job — parquet
    * metadata for plain scans). Returns (training sample, corpus rows). */
  private[ops] def sampleVectors(
      vecs: DataFrame, vecCol: String, trainRowsTarget: Long, seed: Long
  ): (Array[Array[Double]], Long) = {
    val arrs = vecs.select(col(vecCol).cast("array<double>").as("__arr"))
    val total = arrs.count()
    val fraction =
      if (total <= trainRowsTarget) 1.0 else trainRowsTarget.toDouble / total
    val sampled =
      if (fraction < 1.0) arrs.sample(withReplacement = false, fraction, seed) else arrs
    val train: Array[Array[Double]] = sampled.rdd
      .mapPartitions(_.map(_.getSeq[Double](0).toArray))
      .collect() // bounded by trainRowsTarget (sampling variance aside)
    (train, total)
  }

  /** The `nlist <= 0` auto-sizing rule (classic IVF sizing: sqrt(corpus),
    * clamped) — callers don't run their own count() job to pick a cell
    * count; the training sampler already takes one. */
  private[ops] def autoNlist(nlist: Int, total: Long): Int =
    if (nlist > 0) nlist
    else math.max(16, math.min(256, math.sqrt(total.toDouble).toInt))

  /** Indices of the `n` smallest values (stable by index) — the partial
    * selection shared by cell assignment and query probe picking; no
    * boxing/sorting of all entries. */
  private[ops] def nSmallest(dists: Array[Double], n: Int): Array[Int] = {
    val out = new Array[Int](math.min(n, dists.length))
    val taken = new Array[Boolean](dists.length)
    var o = 0
    while (o < out.length) {
      var best = -1; var bestD = Double.MaxValue
      var j = 0
      while (j < dists.length) {
        if (!taken(j) && dists(j) < bestD) { bestD = dists(j); best = j }
        j += 1
      }
      // all remaining distances NaN (a NaN coordinate in the vector poisons
      // every center distance): fail with the cause, not taken(-1)
      if (best < 0) throw new IllegalArgumentException(
        "nSmallest: no orderable distance remains — NaN coordinates in the " +
          "input vector poison every center distance; filter or impute upstream")
      taken(best) = true; out(o) = best
      o += 1
    }
    out
  }

  /** Squared L2 distances from `a` to every center. */
  @inline private[ops] def centerDists(
      centers: Array[Array[Double]], a: Array[Double]): Array[Double] = {
    val dists = new Array[Double](centers.length)
    var ci = 0
    while (ci < centers.length) {
      val c = centers(ci)
      var s = 0.0; var i = 0
      while (i < c.length && i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
      dists(ci) = s
      ci += 1
    }
    dists
  }

  /** n nearest centers of `a` by L2 (stable by cell id). `centers` rides
    * the UDF closure (nlist x dim doubles — broadcast-sized by
    * construction). */
  private[ops] def nearestCellsUdf(centers: Array[Array[Double]], n: Int) =
    udf((a: Array[Double]) => {
      if (a == null) throw new IllegalArgumentException(
        "null vector — cell assignment has no right silent answer; filter upstream")
      nSmallest(centerDists(centers, a), n)
    })

  /** Build a PERSISTENT IVF index — the build-once / query-many production
    * layout the inline [[ivfTopK]] cannot give (it retrains the quantizer
    * per call): the expensive pass (sampled training, Lloyd's, full-corpus
    * cell assignment) runs ONCE and writes two parquet tables under `dir`
    * — `centroids` (cell, centroid; nlist rows) and `postings`
    * (neighbor_id, vec) PARTITIONED BY cell, so a probed query's scan
    * reads only its cells' files (hive partition pruning; the probe list
    * is a literal IN after the broadcast join, which Spark's dynamic
    * partition pruning also covers). Returns the effective cell count. */
  /** File-size bound for the cell-clustered postings writes (r20): one
    * task writes a whole cell, so without a bound a hot cell becomes one
    * giant parquet file. ~2M rows x (id + a ~512 B embedding) ≈ 1 GB —
    * the guide-§6 upper comfort bound; parquet stays splittable either
    * way, this caps the single-file extreme. */
  private[ops] val MaxPostingsRecordsPerFile = 2000000L

  def buildIvfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
      dir: String, nlist: Int = -1, trainRowsTarget: Long = 100000,
      seed: Long = 42): Int = {
    val spark = corpus.sparkSession
    val (train, total) = sampleVectors(corpus, corpusVec, trainRowsTarget, seed)
    val nl = autoNlist(nlist, total)
    val centers = lloyd(train, nl, seed)
    import spark.implicits._
    centers.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).cast("array<double>").as("vec"))
      .withColumn("cell", nearestCellsUdf(centers, 1)(col("vec")).getItem(0))
      // cluster by cell before the partitioned write (r19, guide-§6 file
      // sizing): without it every scan task writes one file per cell it
      // touches — tasks x nlist files at scale; with it each cell lands in
      // exactly one task, one file per cell (parquet stays splittable).
      // maxRecordsPerFile (r20, §2.5 skew): a HOT cell's whole postings
      // land in that one task — the write serializes regardless, but the
      // file-size bound keeps any single output file (and the read-side
      // row-group memory) capped; salt the repartition key if a hot cell's
      // write itself ever becomes the wall
      .repartition(col("cell"))
      .write.mode("overwrite").option("maxRecordsPerFile", MaxPostingsRecordsPerFile)
      .partitionBy("cell").parquet(s"$dir/postings")
    centers.length
  }

  /** APPEND to a persisted IVF index ([[buildIvfIndex]]'s layout) — the
    * incremental-maintenance arm (r17): new vectors assign to the
    * EXISTING, frozen centroids and land as NEW files in the same
    * cell-partitioned postings layout (parquet append — existing files
    * untouched), so ingesting an increment costs work proportional to
    * the INCREMENT, never the indexed corpus (the incremental-dedup
    * stored-signatures convention). No retrain: the quantizer is frozen,
    * [[ivfTopKFromIndex]] reads the union seamlessly, and the all-cells
    * probe stays provably brute force over the UNION (append(B) onto
    * index(A) assigns B exactly as one build over A ∪ B would under the
    * same centroids — spec-pinned identity).
    *
    * Returns the per-cell DRIFT REPORT over the appended rows —
    * (cell, n_appended, mean_cos_to_centroid) — the rebuild signal: the
    * centroids are frozen while the data distribution moves, so a
    * sagging mean cosine on successive appends means recall at fixed
    * nprobe is decaying and the index wants a rebuild.
    *
    * CONTRACTS: appended ids must be NEW — id uniqueness is the
    * caller's (the streaming-store convention); verifying it would scan
    * the whole postings table and defeat increment-proportionality.
    * Appended vectors must match the index dim exactly (fail-loud here:
    * the L2 loop would otherwise silently assign by a PARTIAL
    * distance). */
  def appendIvfIndex(newRows: DataFrame, idCol: String, vecCol: String,
      dir: String): DataFrame = {
    val spark = newRows.sparkSession
    val centerRows =
      (try spark.read.parquet(s"$dir/centroids").collect()
       catch {
         case e: org.apache.spark.sql.AnalysisException =>
           throw new IllegalArgumentException(
             s"appendIvfIndex: no centroids under $dir/centroids — build " +
               s"the index first (buildIvfIndex); (${e.getMessage})")
       })
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(centerRows.nonEmpty,
      s"appendIvfIndex: no centroids under $dir/centroids — build the " +
        "index first (buildIvfIndex)")
    val centers = centerRows.map(_._2)
    val dim = centers(0).length
    // NULL vectors first: size(NULL) is NULL, so the dim-mismatch predicate
    // is NULL (not true) and a NULL would slip through to nearestCellsUdf as
    // a raw executor NPE instead of this operator family's shaped error.
    val checkedVec = when(col(vecCol).isNull,
        raise_error(lit(s"appendIvfIndex: NULL $vecCol — every appended row " +
          "must carry an embedding; filter or impute upstream"))
          .cast("array<double>"))
      .when(size(col(vecCol).cast("array<double>")) =!= dim,
        raise_error(concat(lit(
          s"appendIvfIndex: vector length "), size(col(vecCol)),
          lit(s" != index dim $dim — a short vector would silently " +
            "assign by a partial distance; fix the embedding upstream")))
          .cast("array<double>"))
      .otherwise(col(vecCol).cast("array<double>"))
    val assigned = newRows
      .select(col(idCol).as("neighbor_id"), checkedVec.as("vec"))
      .withColumn("cell", nearestCellsUdf(centers, 1)(col("vec")).getItem(0))
      .localCheckpoint(false) // postings write + drift report share it
    // cluster by cell before the partitioned append (r19, the build's
    // one-file-per-cell convention — an increment otherwise adds
    // tasks x touched-cells files per append); same hot-cell file-size
    // bound as the build (r20)
    assigned.repartition(col("cell")).write.mode("append")
      .option("maxRecordsPerFile", MaxPostingsRecordsPerFile)
      .partitionBy("cell").parquet(s"$dir/postings")
    import spark.implicits._
    val centersDf = centerRows.toSeq.toDF("cell", "centroid")
    assigned.join(broadcast(centersDf), "cell")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_appended"),
        avg(cosine(col("vec"), col("centroid"))).as("mean_cos_to_centroid"))
  }

  /** DRIFT-TRIGGERED IVF REBUILD (r18) — the maintenance loop that
    * CONSUMES [[appendIvfIndex]]'s per-cell drift report: the index's
    * centroids are frozen while appends move the data distribution, so
    * recall at fixed nprobe decays; this op decides — from the report,
    * never a full-corpus scan — whether the sag warrants retraining,
    * and if so rebuilds via [[buildIvfIndex]] over the UNION already
    * sitting in the postings (base + every append).
    *
    * Decision rule (both thresholds are the caller's policy knobs):
    * rebuild when the appended rows' pooled mean cosine to their
    * assigned centroids falls below `meanCosFloor` (the appends don't
    * fit the frozen cells), OR when appended rows exceed
    * `appendShareCeil` of all postings (even well-fitting mass shifts
    * cell balance and probe budgets). `driftReport` is one or a UNION
    * of several [[appendIvfIndex]] returns (successive appends
    * accumulate by summing — the report is mergeable by construction).
    *
    * The rebuild reads the postings, pins them eagerly (localCheckpoint
    * — the build OVERWRITES the same dir it read from), retrains, and
    * rewrites centroids + postings in place. Returns a ONE-ROW decision
    * report: (rebuilt, n_postings, n_appended, append_share,
    * mean_cos_appended, n_cells_before, n_cells_after) — rows-only by
    * nature (Lloyd's is seeded but sample-dependent), with the
    * recall-recovery property spec-pinned instead (planted drift:
    * rebuilt index beats the stale one on a fixed-nprobe recall
    * probe). */
  def rebuildIvfIndexIfDrifted(spark: org.apache.spark.sql.SparkSession,
      dir: String, driftReport: DataFrame,
      meanCosFloor: Double = 0.75, appendShareCeil: Double = 0.25,
      nlist: Int = -1, trainRowsTarget: Long = 100000,
      seed: Long = 42): DataFrame = {
    require(meanCosFloor >= -1.0 && meanCosFloor <= 1.0,
      s"meanCosFloor must be a cosine in [-1, 1], got $meanCosFloor")
    require(appendShareCeil >= 0.0 && appendShareCeil <= 1.0,
      s"appendShareCeil must be a share in [0, 1], got $appendShareCeil")
    val postings = spark.read.parquet(s"$dir/postings")
    val nPostings = postings.count()
    require(nPostings > 0, s"rebuildIvfIndexIfDrifted: empty postings " +
      s"under $dir — build the index first (buildIvfIndex)")
    val cellsBefore = spark.read.parquet(s"$dir/centroids").count()
    val agg = driftReport.agg(
      coalesce(sum(col("n_appended")), lit(0L)).as("na"),
      sum(col("mean_cos_to_centroid") * col("n_appended")).as("wc")).head()
    val nAppended = agg.getLong(0)
    val meanCosAppended =
      if (nAppended == 0L) Double.NaN else agg.getDouble(1) / nAppended
    val appendShare = nAppended.toDouble / nPostings
    val drifted = (nAppended > 0L && meanCosAppended < meanCosFloor) ||
      appendShare > appendShareCeil
    val cellsAfter =
      if (!drifted) cellsBefore
      else {
        // pin BEFORE overwriting: the build writes the dir being read
        val union = postings.select(col("neighbor_id"), col("vec"))
          .localCheckpoint(true)
        buildIvfIndex(union, "neighbor_id", "vec", dir, nlist,
          trainRowsTarget, seed).toLong
      }
    import spark.implicits._
    Seq((drifted, nPostings, nAppended,
        BigDecimal(appendShare).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        meanCosAppended, cellsBefore, cellsAfter))
      .toDF("rebuilt", "n_postings", "n_appended", "append_share",
        "mean_cos_appended", "n_cells_before", "n_cells_after")
  }

  /** Probed top-k over a PERSISTED index ([[buildIvfIndex]]): reload the
    * (nlist-row) centroid table driver-side, probe `nprobe` cells per
    * query, score only the probed cells' postings. With nprobe = the cell
    * count this is provably identical to brute force (every posting
    * scored) — the oracle-exact anchor; smaller nprobe is the
    * approximate production setting. Same auto-sizing default as
    * [[ivfTopK]]. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int = -1): DataFrame = {
    val centers = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    require(centers.nonEmpty, s"no centroids found under $dir/centroids")
    // explicit nprobe: out-of-range is an ERROR (never silently clamped);
    // auto-sized default: clamped to the cell count (a tiny index can have
    // fewer than the max(4, nlist/8) floor)
    require(nprobe <= 0 || nprobe <= centers.length,
      s"nprobe must be <= the cell count (got nprobe=$nprobe, " +
        s"cells=${centers.length})")
    val np =
      if (nprobe > 0) nprobe
      else math.min(math.max(4, centers.length / 8), centers.length)
    val postings = spark.read.parquet(s"$dir/postings")
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).cast("array<double>").as("__qv"))
      .withColumn("cell", explode(nearestCellsUdf(centers, np)(col("__qv")))))
    val scored = postings.join(q, "cell")
      .withColumn("cosine", cosine(col("__qv"), col("vec")))
    finalizeTopK(scored, k)
  }

  /** Queries collected driver-side for the table-building ANN paths (the
    * broadcast-small side by the [[bruteForceTopK]] contract). */
  private def collectQueries(
      queries: DataFrame, queryId: String, queryVec: String
  ): Array[(Long, Array[Double])] =
    queries.select(col(queryId).cast("long"), col(queryVec).cast("array<double>"))
      .rdd.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).collect()

  @inline private def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** One m x ksub ADC grid per query: subspace dot products against each
    * codeword — the scoring tables shared by [[pqTopK]] and [[ivfPqTopK]]
    * (one definition so the two paths cannot drift). */
  private def adcDotTables(
      qRows: Array[(Long, Array[Double])],
      codebooks: Array[Array[Array[Double]]], dsub: Int
  ): Array[Array[Array[Double]]] = {
    // corpus rows get a ragged-length error at encode; queries must get
    // the same loudness — a short query would AIOOBE in the table loop and
    // a LONG one would silently score dots over dim coords against a qNorm
    // over all of them, deflating that query's every cosine
    val dim = codebooks.length * dsub
    qRows.foreach { case (qid, v) =>
      require(v != null && v.length == dim,
        s"PQ query $qid: vector length ${if (v == null) "null" else v.length} " +
          s"!= training dim $dim")
    }
    qRows.map { case (_, v) =>
      Array.tabulate(codebooks.length) { j =>
        codebooks(j).map { cw =>
          var s = 0.0; var i = 0
          while (i < dsub) { s += v(j * dsub + i) * cw(i); i += 1 }
          s
        }
      }
    }
  }

  /** Shared PQ preflight: non-empty uniform-length training sample, dim
    * divisible by m. Returns (dim, dsub). */
  private def pqDims(train: Array[Array[Double]], m: Int, what: String): (Int, Int) = {
    require(train.nonEmpty, s"$what training requires a non-empty corpus")
    val dim = train(0).length
    train.foreach(v => require(v.length == dim,
      s"$what: ragged training sample — vector of length ${v.length} vs dim $dim"))
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subquantizers")
    (dim, dim / m)
  }

  /** (nearest cell, squared L2 distance to it) in one pass — the windowed
    * semantic-dedup mode orders cell members by this distance. */
  private[ops] def cellWithDistUdf(centers: Array[Array[Double]]) =
    udf((a: Array[Double]) => {
      if (a == null) throw new IllegalArgumentException(
        "null vector — cell assignment has no right silent answer; filter upstream")
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        val ct = centers(c)
        var s = 0.0; var i = 0
        while (i < ct.length && i < a.length) { val d = a(i) - ct(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      // a NaN coordinate makes every distance NaN — the old best = 0 start
      // silently filed such vectors under cell 0; fail loud like nSmallest
      if (best < 0) throw new IllegalArgumentException(
        "cell assignment: every center distance is NaN — the vector has " +
          "NaN coordinates; filter or impute upstream")
      (best, bestD)
    })

  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = -1, nprobe: Int = -1,
      trainRowsTarget: Long = 100000, seed: Long = 42
  ): DataFrame = {
    val (train, total) = sampleVectors(corpus, corpusVec, trainRowsTarget, seed)
    val nl = autoNlist(nlist, total)
    // lloyd clamps to min(nl, |train|) centers; size the DEFAULT probe
    // count from the effective center count (the ivfPqTopK rule) so a
    // small explicit nlist or tiny corpus can't trip the require below
    // with an nprobe the caller never chose
    val centers = lloyd(train, nl, seed)
    val np = math.min(if (nprobe > 0) nprobe else math.max(4, nl / 8), centers.length)
    require(nprobe <= 0 || nprobe <= centers.length,
      s"nprobe must be <= the effective cell count (got nprobe=$nprobe, " +
        s"cells=${centers.length})")
    def nearestCells(n: Int) = nearestCellsUdf(centers, n)

    val c = corpus.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).cast("array<double>").as("__cv"))
      .withColumn("cell", nearestCells(1)(col("__cv")).getItem(0))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).cast("array<double>").as("__qv"))
      .withColumn("cell", explode(nearestCells(np)(col("__qv")))))
    val scored = c.join(q, "cell")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    finalizeTopK(scored, k)
  }

  /** Product-quantization approximate top-k with asymmetric distance
    * computation — Jegou, Douze & Schmid, "Product Quantization for Nearest
    * Neighbor Search" (TPAMI 2011); the PQ-flat layout popularized by FAISS.
    * The dimension splits into `m` contiguous subspaces; each subspace gets
    * its own `ksub`-center codebook (Lloyd's over the shared sample-capped
    * training pass); a corpus vector becomes `m` one-byte codes. Queries
    * score a code vector WITHOUT reconstructing it: per query, one
    * m x ksub table of subspace dot products (ADC), so scoring is m table
    * lookups per corpus row instead of `dim` multiplies. Cosine denominator
    * uses the RECONSTRUCTION norm, from a query-independent m x ksub table
    * of subspace codeword norms.
    *
    * At 100 TB this is the memory lever: the scanned representation is
    * m bytes/vector (64x smaller than float64 at dim=64, m=8) — the whole
    * corpus index fits where raw vectors cannot, and the scan is map-only
    * with k rows per (query, task) on the only exchange. Queries are
    * collected driver-side (they are the broadcast-small side by the same
    * contract as [[bruteForceTopK]]); tables ride the closure at
    * nq * m * ksub doubles. Approximate by construction (quantization
    * distortion) — anchor recall against [[bruteForceTopK]]. */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 8, ksub: Int = 256,
      trainRowsTarget: Long = 100000, seed: Long = 42
  ): DataFrame = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256] (one byte), got $ksub")
    val (train, _) = sampleVectors(corpus, corpusVec, trainRowsTarget, seed)
    val (dim, dsub) = pqDims(train, m, "PQ")
    // per-subspace codebooks over the one shared training sample
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val sub = train.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, ksub, seed + j)
    }
    val encode = udf((a: Array[Double]) => {
      if (a == null) throw new IllegalArgumentException(
        "null vector — PQ encoding would silently drop the row; filter upstream")
      else if (a.length != dim) throw new IllegalArgumentException(
        s"PQ: vector of length ${a.length} != training dim $dim — a ragged " +
          "corpus has no right silent answer (a LONGER vector would " +
          s"silently encode only its first $dim coords); filter upstream")
      else {
        val codes = new Array[Byte](m)
        var j = 0
        while (j < m) {
          val cb = codebooks(j)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cb.length) {
            val ct = cb(c)
            var s = 0.0; var i = 0
            while (i < dsub) { val d = a(j * dsub + i) - ct(i); s += d * d; i += 1 }
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          codes(j) = best.toByte
          j += 1
        }
        codes
      }
    })
    // query-independent reconstruction-norm table: norm2(j)(c) = |codeword|^2
    val norm2: Array[Array[Double]] = codebooks.map(_.map { ct =>
      var s = 0.0; var i = 0
      while (i < ct.length) { s += ct(i) * ct(i); i += 1 }
      s
    })
    // driver-side ADC tables, one m x ksub dot-product grid per query
    val qRows = collectQueries(queries, queryId, queryVec)
    val qIds = qRows.map(_._1)
    val qNorm = qRows.map { case (_, v) => l2(v) }
    val dotTab = adcDotTables(qRows, codebooks, dsub)
    // one UDF call scores ALL queries for a corpus row (the codes array is
    // read once; emitting per-query rows via posexplode keeps the m-byte
    // codes off the nq-way fan-out)
    val scoreAll = udf((codes: Array[Byte]) => {
      if (codes == null) null
      else {
        var rn2 = 0.0
        var j = 0
        while (j < m) { rn2 += norm2(j)(codes(j) & 0xff); j += 1 }
        val rn = math.sqrt(rn2)
        val out = new Array[Double](qIds.length)
        var q = 0
        while (q < qIds.length) {
          var dot = 0.0
          j = 0
          while (j < m) { dot += dotTab(q)(j)(codes(j) & 0xff); j += 1 }
          out(q) = if (rn == 0.0 || qNorm(q) == 0.0) 0.0 else dot / (rn * qNorm(q))
          q += 1
        }
        out
      }
    })
    val qIdx = broadcast(
      corpus.sparkSession.createDataFrame(
        qIds.toIndexedSeq.zipWithIndex.map { case (id, i) => (i, id) }
      ).toDF("pos", "query_id"))
    val scored = corpus
      .select(col(corpusId).as("neighbor_id"),
        encode(col(corpusVec).cast("array<double>")).as("__codes"))
      .select(col("neighbor_id"),
        posexplode(scoreAll(col("__codes"))).as(Seq("pos", "cosine")))
      .join(qIdx, "pos")
    finalizeTopK(scored, k)
  }

  /** IVF-PQ approximate top-k — the composition of [[ivfTopK]]'s coarse
    * inverted file with [[pqTopK]]'s product quantization, encoding
    * RESIDUALS (v - coarse centroid) as in the classical IVFADC layout
    * (Jegou et al. TPAMI 2011 §IV; FAISS `IVFPQ`): residuals are much
    * better centered than raw vectors, so the same codebook budget buys a
    * finer quantization. A corpus vector is stored as (cell id, m one-byte
    * codes); a query probes `nprobe` cells and scores members by table
    * lookups only:
    *
    *   dot(q, v^) = dot(q, c_cell) + sum_j dotTab[j][code_j]
    *   |v^|^2     = |c_cell|^2 + 2*sum_j crossTab[cell][j][code_j]
    *                + sum_j norm2[j][code_j]
    *
    * where dotTab is the per-query residual-codeword grid and crossTab the
    * query-INDEPENDENT centroid x codeword grid (nlist x m x ksub doubles —
    * computed once at build, broadcast on a cluster; it rides the scoring
    * closure here). The scanned representation is m+4 bytes per vector and
    * only ~nprobe/nlist of the corpus is touched per query — at 100 TB this
    * is the shape that actually fits: IVF bounds the scan, PQ bounds the
    * memory, and the only exchange still carries k rows per (query, task). */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = -1, nprobe: Int = -1, m: Int = 8, ksub: Int = 256,
      trainRowsTarget: Long = 100000, seed: Long = 42
  ): DataFrame = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1, 256] (one byte), got $ksub")
    val (train, total) = sampleVectors(corpus, corpusVec, trainRowsTarget, seed)
    val nl = autoNlist(nlist, total)
    require(nprobe <= 0 || nprobe <= nl,
      s"nprobe must be <= nlist (got nprobe=$nprobe nlist=$nl)")
    val (dim, dsub) = pqDims(train, m, "IVF-PQ")
    // lloyd clamps to min(nl, |train|) centers — every downstream table and
    // probe count must size from the EFFECTIVE cell count, or a corpus
    // smaller than nlist indexes past the centers
    val coarse = lloyd(train, nl, seed)
    val nlEff = coarse.length
    val np = math.min(if (nprobe > 0) nprobe else math.max(4, nl / 8), nlEff)

    @inline def nearestCoarse(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < coarse.length) {
        val ct = coarse(c)
        var s = 0.0; var i = 0
        while (i < dim) { val d = v(i) - ct(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }
    // one shared residual codebook set across cells (the classical layout —
    // per-cell codebooks would be nlist x larger for marginal gain)
    val residuals = train.map { v =>
      val ct = coarse(nearestCoarse(v))
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - ct(i); i += 1 }
      r
    }
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val sub = residuals.map(r => java.util.Arrays.copyOfRange(r, j * dsub, (j + 1) * dsub))
      lloyd(sub, ksub, seed + j)
    }
    val encode = udf((a: Array[Double]) => {
      if (a == null) throw new IllegalArgumentException(
        "null vector — IVF-PQ encoding would silently drop the row; filter upstream")
      else if (a.length != dim) throw new IllegalArgumentException(
        s"IVF-PQ: vector of length ${a.length} != training dim $dim — a " +
          "ragged corpus has no right silent answer (a LONGER vector would " +
          s"silently encode only its first $dim coords); filter upstream")
      else {
        val cell = nearestCoarse(a)
        val ct = coarse(cell)
        val codes = new Array[Byte](m)
        var j = 0
        while (j < m) {
          val cb = codebooks(j)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cb.length) {
            val cw = cb(c)
            var s = 0.0; var i = 0
            while (i < dsub) {
              val d = (a(j * dsub + i) - ct(j * dsub + i)) - cw(i)
              s += d * d; i += 1
            }
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          codes(j) = best.toByte
          j += 1
        }
        (cell, codes)
      }
    })
    // query-independent tables
    val norm2: Array[Array[Double]] = codebooks.map(_.map { cw =>
      var s = 0.0; var i = 0
      while (i < cw.length) { s += cw(i) * cw(i); i += 1 }
      s
    })
    val cellNorm2: Array[Double] = coarse.map { ct =>
      var s = 0.0; var i = 0
      while (i < dim) { s += ct(i) * ct(i); i += 1 }
      s
    }
    val crossTab: Array[Array[Array[Double]]] = Array.tabulate(nlEff) { cell =>
      val ct = coarse(cell)
      Array.tabulate(m) { j =>
        codebooks(j).map { cw =>
          var s = 0.0; var i = 0
          while (i < dsub) { s += ct(j * dsub + i) * cw(i); i += 1 }
          s
        }
      }
    }
    // per-query tables (queries are the driver-collected broadcast side)
    val qRows = collectQueries(queries, queryId, queryVec)
    val qIds = qRows.map(_._1)
    val qNorm = qRows.map { case (_, v) => l2(v) }
    val qCellDot: Array[Array[Double]] = qRows.map { case (_, v) =>
      coarse.map { ct =>
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i) * ct(i); i += 1 }
        s
      }
    }
    // nearest np cells by L2 (the same partial selection as cell assignment)
    val qProbes: Array[Array[Int]] =
      qRows.map { case (_, v) => nSmallest(centerDists(coarse, v), np) }
    val dotTab = adcDotTables(qRows, codebooks, dsub)
    val score = udf((qpos: Int, cell: Int, codes: Array[Byte]) => {
      var dot = qCellDot(qpos)(cell)
      var n2 = cellNorm2(cell)
      var j = 0
      while (j < m) {
        val c = codes(j) & 0xff
        dot += dotTab(qpos)(j)(c)
        n2 += 2.0 * crossTab(cell)(j)(c) + norm2(j)(c)
        j += 1
      }
      val rn = math.sqrt(math.max(n2, 0.0)) // fp cancellation can dip below 0
      if (rn == 0.0 || qNorm(qpos) == 0.0) 0.0 else dot / (rn * qNorm(qpos))
    })
    val enc = corpus
      .select(col(corpusId).as("neighbor_id"),
        encode(col(corpusVec).cast("array<double>")).as("__e"))
      .select(col("neighbor_id"), col("__e._1").as("cell"), col("__e._2").as("__codes"))
    val probes = broadcast(
      corpus.sparkSession.createDataFrame(
        qIds.toIndexedSeq.zipWithIndex.flatMap { case (id, qi) =>
          qProbes(qi).map(cell => (qi, id, cell))
        }
      ).toDF("qpos", "query_id", "cell"))
    val scored = enc.join(probes, "cell")
      .withColumn("cosine", score(col("qpos"), col("cell"), col("__codes")))
    finalizeTopK(scored, k)
  }

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions with a
    * DETERMINISTIC +-1 matrix (Achlioptas 2003: Rademacher entries preserve
    * pairwise distances within the JL bound — no Gaussians needed): sign of
    * cell (i, j) comes from the engine-wide portable md5 convention
    * (md5("i:j") leading 60 bits, low bit), so an independent engine
    * reproduces the exact matrix, and the scale 1/sqrt(outDim) is DYADIC
    * when outDim is a power of 4 (16 -> 0.25), keeping every output
    * coordinate bit-reproducible under the index-ascending-sum convention.
    *
    * The matrix is built ONCE driver-side (inDim x outDim doubles) and
    * rides the UDF closure; the row loop is pure multiply-add — no per-row
    * hashing. The cheap pre-step before ANN when raw dimensionality is the
    * cost driver (a 64 -> 16 projection cuts every downstream cosine 4x). */
  /** The engine-wide portable +-1 matrix: sign of cell (i, j) is the low
    * bit of md5("i:j")'s leading 60 bits — replayable in any SQL engine as
    * `CAST(CONCAT('0x', substr(md5(i || ':' || j), 1, 15)) AS BIGINT) % 2`.
    * Shared by [[randomProject]] (as the JL projection) and
    * [[Multimodal.extractFeaturesBatched]] (as the fixed-weight linear
    * "model"). */
  private[graft] def portableSigns(inDim: Int, outDim: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(inDim, outDim) { (i, j) =>
      val d = md.digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L; var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      if (((v >>> 4) & 1L) == 1L) 1 else -1
    }
  }

  def randomProject(vec: Column, inDim: Int, outDim: Int): Column = {
    require(inDim > 0 && outDim > 0, s"dims must be positive: $inDim -> $outDim")
    val signs = portableSigns(inDim, outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val f = udf((a: Array[Double]) => {
      if (a == null) throw new IllegalArgumentException(
        "null vector — a null projection poisons downstream distances; filter upstream")
      else if (a.length < inDim) throw new IllegalArgumentException(
        s"randomProject: vector of length ${a.length} shorter than inDim $inDim — " +
          "a ragged corpus has no right silent answer; filter upstream")
      else {
        val out = new Array[Double](outDim)
        var j = 0
        while (j < outDim) {
          var s = 0.0; var i = 0
          while (i < inDim) { s += a(i) * signs(i)(j); i += 1 }
          out(j) = s * scale
          j += 1
        }
        out
      }
    })
    f(vec.cast("array<double>"))
  }

  /** Two-stage top-k through the JL projection: shortlist by cosine in the
    * PROJECTED space (outDim floats per vector — the corpus scan does
    * outDim multiplies per candidate instead of inDim), then exact re-rank
    * of the shortlist in the original space. Deterministic end-to-end
    * (deterministic matrix, id tiebreaks at both stages), so unlike
    * LSH/IVF/PQ this approximate path is ORACLE-VERIFIABLE: an independent
    * engine reproduces the exact shortlist and therefore the exact result.
    * Recall is governed by `shortlist` (JL distortion shrinks as outDim
    * grows); the re-rank stage touches shortlist x queries vectors only. */
  def projectedTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, shortlist: Int, inDim: Int, outDim: Int = 16
  ): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val c = corpus.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).cast("array<double>").as("__cv"))
      .withColumn("__cp", randomProject(col("__cv"), inDim, outDim))
      .localCheckpoint(false) // scanned by stage 1, joined back by stage 2
    val q = queries.select(col(queryId).as("query_id"),
        col(queryVec).cast("array<double>").as("__qv"))
      .withColumn("__qp", randomProject(col("__qv"), inDim, outDim))
      .localCheckpoint(false)
    val short = finalizeTopK(
      c.select(col("neighbor_id"), col("__cp"))
        .crossJoin(broadcast(q.select(col("query_id"), col("__qp"))))
        .withColumn("cosine", cosine(col("__qp"), col("__cp"))),
      shortlist)
      .select("query_id", "neighbor_id")
    val rescored = short
      .join(c.select(col("neighbor_id"), col("__cv")).hint("shuffle_hash"), "neighbor_id")
      .join(broadcast(q.select(col("query_id"), col("__qv"))), "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    finalizeTopK(rescored, k)
  }

  /** Nearest-center assignment of every vector to a FIXED center array:
    * `(id, cluster, d2)` with `cluster` the index of the L2-nearest
    * center (ties to the lowest index — the [[cellWithDistUdf]]-style
    * strict-< rule) and `d2` the squared distance. One map-only pass;
    * `centers` rides the closure (k x dim doubles, broadcast-sized by
    * contract). On 1024x-floor-quantized inputs every difference,
    * square, and partial sum is an exact dyadic double, so `d2` is
    * order-free and replays bit-exactly in any engine — the oracle-exact
    * anchor path for [[kmeansCluster]]. */
  def assignToCenters(df: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]]): DataFrame = {
    require(centers.nonEmpty, "assignToCenters requires at least one center")
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__a", cellWithDistUdf(centers)(col("__v")))
      .select(col("id"), col("__a._1").cast("long").as("cluster"),
        col("__a._2").as("d2"))
  }

  /** User-facing k-means topic clustering — the corpus-organization step
    * behind cluster-balanced mixtures and SemDeDup-style partitioning:
    * train a k-center quantizer on the sample-capped pass (the shared
    * [[sampleVectors]] + [[lloyd]] machinery: bounded driver work at any
    * corpus size), then assign the full corpus in one map-only scan.
    * Returns `(id, cluster, d2)` per input vector. Deterministic for a
    * fixed (data, seed): seeded sampling, seeded init, fixed iteration
    * count semantics — but NOT engine-replayable (Lloyd's is
    * hash/RNG-path-dependent), so gate queries anchor it against the
    * fixed-centers [[assignToCenters]] twin. */
  def kmeansCluster(df: DataFrame, idCol: String, vecCol: String, k: Int,
      trainRowsTarget: Long = 100000, seed: Long = 42): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val (train, _) = sampleVectors(df, vecCol, trainRowsTarget, seed)
    assignToCenters(df, idCol, vecCol, lloyd(train, k, seed))
  }

  /** Lloyd's k-means over an in-memory sample: deterministic seeded init
    * (k distinct points), iterate assign/recenter until centers move less
    * than `tol` or `maxIter`. The sample is bounded by the caller
    * (`trainRowsTarget`), so this is bounded driver work — the IVF
    * quantizer's training loop without any per-iteration cluster jobs.
    * Empty clusters are re-seeded from the farthest-assigned point (the
    * standard repair), keeping all k cells populated. */
  private[graft] def lloyd(train: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 10, tol: Double = 1e-6): Array[Array[Double]] = {
    require(train.nonEmpty, "k-means requires a non-empty training sample")
    val dim = train(0).length
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, train.length)
    val centers = rnd.shuffle(train.indices.toVector).take(kk)
      .map(i => train(i).clone()).toArray
    val assign = new Array[Int](train.length)
    val dists = new Array[Double](train.length)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      // assignment pass
      var r = 0
      while (r < train.length) {
        val v = train(r)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val ct = centers(c)
          var s = 0.0; var i = 0
          while (i < dim) { val d = v(i) - ct(i); s += d * d; i += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        assign(r) = best; dists(r) = bestD
        r += 1
      }
      // recenter pass
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Int](kk)
      r = 0
      while (r < train.length) {
        val v = train(r); val c = assign(r)
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
        r += 1
      }
      moved = 0.0
      var c = 0
      while (c < kk) {
        if (counts(c) == 0) {
          // re-seed an empty cluster from the worst-fitted point
          var worst = 0; var worstD = -1.0
          var j = 0
          while (j < train.length) {
            if (dists(j) > worstD) { worstD = dists(j); worst = j }
            j += 1
          }
          System.arraycopy(train(worst), 0, centers(c), 0, dim)
          dists(worst) = 0.0
          moved = Double.MaxValue
        } else {
          var s = 0.0; var i = 0
          while (i < dim) {
            val nc = sums(c)(i) / counts(c)
            val d = nc - centers(c)(i)
            s += d * d
            centers(c)(i) = nc
            i += 1
          }
          moved = math.max(moved, s)
        }
        c += 1
      }
      iter += 1
    }
    centers
  }

  /** One band's signature: `planes` sign bits from hyperplanes salted by
    * (band, plane). */
  private[ops] def hyperplaneSignatureBand(vec: Column, planes: Int, band: Int): Column =
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
