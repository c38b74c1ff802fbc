package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries summary output: at most k (item, weight) counters, ordered
  * (estimate desc, item asc). */
final case class MGBuf(keys: Array[String], counts: Array[Long])

/** Misra-Gries heavy hitters as a partial aggregate: each task keeps at most
  * k counters per group, merge combines counters and subtracts the (k+1)-th
  * largest (the mergeable-summaries construction, Agarwal et al. PODS'12),
  * so the exchange carries <= k rows per (group, task) no matter how many
  * distinct items stream through — the "dominant domains/users/tokens"
  * analysis that an exact count-distinct-then-sort cannot do at corpus
  * scale. Estimated counts are within n/(k+1) of truth below, and every
  * item with true frequency > n/(k+1) is guaranteed present.
  *
  * The buffer is a hash map (O(1) per input row; the classic all-counter
  * decrement runs only on a miss with k live counters), so per-row cost is
  * independent of k — the buffer lives as a JVM object inside
  * ObjectHashAggregate and is kryo-serialized only when a partial crosses
  * the exchange. The deterministic (estimate desc, item asc) order is
  * imposed at finish. */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, java.util.HashMap[String, Long], MGBuf] {
  require(k > 0, s"k must be positive, got $k")

  def zero: java.util.HashMap[String, Long] = new java.util.HashMap()

  def reduce(b: java.util.HashMap[String, Long], item: String): java.util.HashMap[String, Long] = {
    if (item == null) return b
    val cur = b.getOrDefault(item, 0L)
    if (cur > 0L) b.put(item, cur + 1L)
    else if (b.size < k) b.put(item, 1L)
    else {
      // decrement all; drop zeros (classic MG step)
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - 1L
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b
  }

  def merge(b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val add = b2.entrySet().iterator()
    while (add.hasNext) {
      val e = add.next()
      b1.put(e.getKey, b1.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight, keep positive remainder
      val weights = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { weights(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val sub = weights(weights.length - (k + 1))
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - sub
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b1
  }

  def finish(b: java.util.HashMap[String, Long]): MGBuf = {
    // deterministic output: order counters by (estimate desc, item asc)
    val entries = new Array[(String, Long)](b.size)
    var i = 0
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (key, c) => (-c, key) }
    MGBuf(sorted.map(_._1), sorted.map(_._2))
  }
  def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}

/** KMV (k minimum values) synopsis output: the k smallest distinct hashes,
  * sorted ascending. */
final case class KMVBuf(hs: Array[Long])

/** Bottom-k DISTINCT longs as a partial aggregate: each task keeps a sorted
  * array of at most k distinct hashes, merge is a capped sorted-merge — the
  * KMV distinct-value synopsis (Bar-Yossef et al., RANDOM'02; Beyer et al.,
  * SIGMOD'07). Exchange carries <= k longs per (group, task) regardless of
  * item cardinality, and the result is a deterministic function of the item
  * SET — dedup happens inside the buffer, so no distinct shuffle is needed
  * upstream. */
final class BottomKDistinctAggregator(k: Int)
    extends Aggregator[Long, Array[Long], KMVBuf] {
  require(k >= 2, s"k must be >= 2, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val out = new Array[Long](math.min(b1.length + b2.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < b1.length || j < b2.length)) {
      val take1 = j >= b2.length || (i < b1.length && b1(i) <= b2(j))
      val v = if (take1) b1(i) else b2(j)
      if (take1) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def finish(b: Array[Long]): KMVBuf = KMVBuf(b)
  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  def outputEncoder: Encoder[KMVBuf] = Encoders.product[KMVBuf]
}

/** Frequent-Directions state: up to 2*ell vector rows (row-major flat
  * buffer), the input Frobenius mass, the accumulated shrink total
  * (sum of the per-shrink delta — THE quantity the FD theorem bounds),
  * and the consumed-vector count. Product type: Tungsten ser/de. */
final case class FDState(d: Int, used: Int, buf: Array[Double],
    frobSq: Double, deltaSum: Double, n: Long)

/** Finished FD sketch: <= ell rows of d coords (flat, row-major, rows
  * sorted lexicographically for a canonical order), plus the probe
  * scalars. */
final case class FDResult(d: Int, rows: Int, buf: Array[Double],
    frob_in: Double, frob_sketch: Double, delta_sum: Double, n: Long)

/** FREQUENT DIRECTIONS (Liberty, KDD'13; mergeability Ghashami et al.,
  * SIAM J. Comput. 2016) — the mergeable low-rank embedding summary: a
  * sketch B of at most `ell` rows with the deterministic guarantee
  * 0 <= x^T (A^T A - B^T B) x <= deltaSum <= ||A||_F^2 / ell for every
  * unit x — the streaming counterpart of a truncated SVD, feeding PCA /
  * subspace drift without a second pass. The buffer holds 2*ell rows;
  * on overflow the spectrum shifts down by delta = lambda_ell (the
  * (ell+1)-th largest eigenvalue of B B^T) and rows below it vanish.
  * Merge = insert the other partial's rows through the same shrink —
  * the mergeable-summaries property, so the exchange carries at most
  * 2*ell*d doubles per (group, task) no matter the corpus size.
  *
  * DETERMINISM: the sketch VALUES depend on the shrink history (=
  * partition/merge order), so the general row is rows-only with
  * in-query probes (delta_sum <= frob_in/ell, the theorem); the
  * NO-SHRINK regime (inputs <= 2*ell... and a final shrink only when
  * over ell) — with at most ell inputs the sketch IS the input set,
  * sorted canonically — is the oracle-exact anchor twin. The exact
  * integer-moment relative is [[Similarity.covarianceMoments]]. */
final class FrequentDirectionsAggregator(ell: Int)
    extends Aggregator[VecIn, FDState, FDResult] {
  require(ell >= 2 && ell <= 128, s"ell must be in [2, 128], got $ell")
  private val cap = 2 * ell

  def zero: FDState = FDState(0, 0, Array.emptyDoubleArray, 0.0, 0.0, 0L)

  private def insert(b: FDState, v: Array[Double]): FDState = {
    if (v == null) throw new IllegalArgumentException(
      "frequentDirections: null vector — filter or impute upstream")
    val d = if (b.d == 0) v.length else b.d
    if (v.length != d) throw new IllegalArgumentException(
      s"frequentDirections: ragged input — vector of length ${v.length} " +
        s"after dimension $d")
    val buf = if (b.buf.length >= cap * d) b.buf else {
      val nb = new Array[Double](cap * d)
      System.arraycopy(b.buf, 0, nb, 0, b.used * d)
      nb
    }
    var fs = b.frobSq
    var i = 0
    while (i < d) {
      val x = v(i)
      if (!java.lang.Double.isFinite(x)) throw new IllegalArgumentException(
        s"frequentDirections: non-finite coordinate $x — it would poison " +
          "the sketch spectrum; filter or impute upstream")
      buf(b.used * d + i) = x
      fs += x * x
      i += 1
    }
    val st = FDState(d, b.used + 1, buf, fs, b.deltaSum, b.n + 1)
    if (st.used == cap) shrink(st, ell) else st
  }

  /** Shift the spectrum down by lambda_(keep) and drop the tail: the FD
    * shrink step, via a cyclic-Jacobi eigensolve of the small (used x
    * used) Gram matrix B B^T. */
  private def shrink(b: FDState, keep: Int): FDState = {
    val m = b.used
    if (m <= keep) return b
    val d = b.d
    // G = B B^T (m x m, m <= 2*ell — bounded driver-free task math)
    val g = Array.ofDim[Double](m, m)
    var i = 0
    while (i < m) {
      var j = i
      while (j < m) {
        var s = 0.0; var k = 0
        while (k < d) { s += b.buf(i * d + k) * b.buf(j * d + k); k += 1 }
        g(i)(j) = s; g(j)(i) = s
        j += 1
      }
      i += 1
    }
    val (lam, u) = Sketches.jacobiEigenSym(g)
    // eigenvalues descending; delta = the (keep+1)-th largest (index keep)
    val order = (0 until m).sortBy(i => (-lam(i), i))
    val delta = math.max(lam(order(keep)), 0.0)
    val out = new Array[Double](cap * d)
    var r = 0
    var fs = 0.0
    var oi = 0
    while (oi < keep) {
      val src = order(oi)
      val l = lam(src)
      if (l > delta) {
        // new row r = sqrt(l - delta) * v_src^T, v^T = u^T B / sigma
        val scale = math.sqrt((l - delta) / l)
        var k = 0
        while (k < d) {
          var s = 0.0; var q = 0
          while (q < m) { s += u(q)(src) * b.buf(q * d + k); q += 1 }
          val x = s * scale
          out(r * d + k) = x
          fs += x * x
          k += 1
        }
        r += 1
      }
      oi += 1
    }
    FDState(d, r, out, b.frobSq, b.deltaSum + delta, b.n)
  }

  def reduce(b: FDState, a: VecIn): FDState = insert(b, a.v)

  def merge(b1: FDState, b2: FDState): FDState = {
    if (b2.n == 0L) return b1
    if (b1.n == 0L) return b2
    if (b1.d != b2.d) throw new IllegalArgumentException(
      s"frequentDirections: ragged partials ${b1.d} vs ${b2.d}")
    // insert b2's sketch rows through the same buffer+shrink (the
    // mergeable-FD construction); insert() also bumps frobSq/n with the
    // SKETCH rows' mass, which is not input mass — both are rebuilt from
    // the parts below (shrink never reads them, so the drift is inert)
    var acc = FDState(b1.d, b1.used, b1.buf, b1.frobSq,
      b1.deltaSum + b2.deltaSum, b1.n)
    var r = 0
    while (r < b2.used) {
      acc = insert(acc,
        java.util.Arrays.copyOfRange(b2.buf, r * b2.d, (r + 1) * b2.d))
      r += 1
    }
    FDState(acc.d, acc.used, acc.buf, b1.frobSq + b2.frobSq, acc.deltaSum,
      b1.n + b2.n)
  }

  def finish(b0: FDState): FDResult = {
    val b = shrink(b0, ell)
    val d = math.max(b.d, 0)
    // canonical row order: lexicographic over coordinates
    val rows = (0 until b.used).map(r =>
      java.util.Arrays.copyOfRange(b.buf, r * d, (r + 1) * d)).sortWith {
      (x, y) =>
        var i = 0
        while (i < d && x(i) == y(i)) i += 1
        i < d && x(i) < y(i)
    }
    val flat = new Array[Double](rows.length * d)
    var fs = 0.0
    var r = 0
    while (r < rows.length) {
      var k = 0
      while (k < d) {
        val x = rows(r)(k)
        flat(r * d + k) = x; fs += x * x; k += 1
      }
      r += 1
    }
    FDResult(d, rows.length, flat, b.frobSq, fs, b.deltaSum, b.n)
  }

  def bufferEncoder: Encoder[FDState] = Encoders.product[FDState]
  def outputEncoder: Encoder[FDResult] = Encoders.product[FDResult]
}

object Sketches {

  /** Cyclic Jacobi eigendecomposition of a small symmetric matrix —
    * (eigenvalues, eigenvector columns). Deterministic sweep order; used
    * by the FD shrink (m <= 2*ell, task-local math). */
  private[ops] def jacobiEigenSym(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 60) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
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
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
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
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    ((0 until n).map(i => a(i)(i)).toArray, v)
  }

  /** The FD sketch as a frame: one row per (sketch row r, coordinate
    * idx) — (r, idx, coord) — plus the probe scalars on every row:
    * n_vectors, frob_in / frob_sketch (1e6-scaled longs) and bound_ok =
    * delta_sum <= frob_in / ell + tolerance (THE Frequent-Directions
    * guarantee, checked in-query — the rows-only probe convention).
    * One aggregation; the exchange carries <= 2*ell*d doubles per task. */
  def frequentDirections(df: DataFrame, vecCol: String, ell: Int): DataFrame = {
    val fd = udaf(new FrequentDirectionsAggregator(ell),
      Encoders.product[VecIn])
    df.select(col(vecCol).cast("array<double>").as("v"))
      .agg(fd(col("v")).as("s"))
      .select(col("s.d").as("d"), col("s.rows").as("n_rows"),
        col("s.buf").as("buf"), col("s.n").as("n_vectors"),
        floor(col("s.frob_in") * 1e6).cast("long").as("frob_in_e6"),
        floor(col("s.frob_sketch") * 1e6).cast("long").as("frob_sketch_e6"),
        (col("s.delta_sum") <=
          col("s.frob_in") / lit(ell.toDouble) + lit(1e-6)).as("bound_ok"))
      // empty input => n_rows * d - 1 = -1, and Spark's sequence(0, -1)
      // is the DESCENDING [0, -1] (not empty) — the explode would index
      // an empty buffer; filter to zero rows instead
      .filter(col("n_rows") * col("d") > 0)
      .select(col("n_vectors"), col("frob_in_e6"), col("frob_sketch_e6"),
        col("bound_ok"),
        explode(expr("transform(sequence(0, n_rows * d - 1), " +
          "i -> struct(CAST(i div d AS BIGINT) AS r, CAST(i % d AS BIGINT) AS idx, " +
          "buf[CAST(i AS INT)] AS coord))"))
          .as("e"))
      .select(col("e.r").as("r"), col("e.idx").as("idx"),
        col("e.coord").as("coord"), col("n_vectors"), col("frob_in_e6"),
        col("frob_sketch_e6"), col("bound_ok"))
  }

  /** Portable HyperLogLog distinct count (Flajolet et al., AofA 2007) over
    * the engine-wide md5 60-bit hash convention: p = 6 (m = 64 buckets),
    * with the standard small-range linear-counting correction. m is small
    * ON PURPOSE: the WHOLE sketch — bucket maxima, integer bucket mass,
    * and the piecewise estimate — replays bit-exactly in an independent
    * SQL engine (the correction's only transcendental is ln(64/V) over 64
    * possible integer V, verified bit-identical between Java Math.log and
    * DuckDB ln on all of them). This is the oracle-exact deterministic
    * twin of `approx_count_distinct` / DataSketches HLL (whose estimates
    * are engine-specific), at the standard-error cost of a small m:
    * ~1.04/sqrt(64) = 13%.
    *
    * Scale shape: per-group state is <= 64 (bucket, max-rho) rows and the
    * max is natively map-side combined — the same mergeable-summary
    * contract the binary-sketch path ships, with none of the opacity.
    * Output: (group, approx_distinct, t_scaled), where t_scaled =
    * sum_buckets 2^(55 - rho_max) as an exact integer (empty bucket
    * contributes 2^55) and approx_distinct = alpha_64 * m^2 * 2^55 /
    * t_scaled evaluated left-to-right in doubles. */
  def hllPortable(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    hllPortableEstimate(hllPortableSketch(df, Seq(groupCol), itemCol), Seq("group"))

  /** The (bucket, rho) observation for one item under the portable 60-bit
    * md5 hash — the per-row input to any HLL rollup, batch or streaming.
    * NATIVE columns end to end (the engine-wide conv(substring(md5)) hash
    * convention, shiftright for the bucket, bin()-length for the
    * leading-zero count — exactly the arms this sketch's DuckDB oracle
    * runs), so the hot path stays inside whole-stage codegen with zero
    * per-row allocation. Null items map to a null struct. */
  def hllObs(item: Column): Column = {
    val h = conv(substring(md5(item.cast("string")), 1, 15), 16, 10).cast("long")
    val rest = h.bitwiseAND(lit((1L << 54) - 1))
    val rho = when(rest === 0L, lit(55)).otherwise(lit(55) - length(bin(rest)))
    when(item.isNull, lit(null)).otherwise(
      struct(shiftright(h, 54).cast("int").as("bucket"),
        rho.cast("int").as("rho")))
  }

  /** Stage 1 of the portable HLL: the PERSISTABLE sketch frame — one
    * (keys..., bucket, mx) row per non-empty bucket, <= 64 rows per key
    * tuple. Sketches for different key granularities UNION by re-grouping
    * on fewer keys with max(mx) — the store-sketches-merge-later pattern
    * with none of the binary-blob opacity, and every step SQL-replayable. */
  def hllPortableSketch(df: DataFrame, groupCols: Seq[String], itemCol: String): DataFrame = {
    val keyCols = groupCols.map(col)
    val named = if (groupCols.size == 1) Seq(col(groupCols.head).as("group"))
      else keyCols
    df.select(named :+ hllObs(col(itemCol)).as("o"): _*)
      .filter(col("o").isNotNull)
      .groupBy((if (groupCols.size == 1) Seq(col("group")) else keyCols) :+
        col("o.bucket").as("bucket"): _*)
      .agg(max(col("o.rho")).as("mx"))
  }

  /** Stage 2: merge sketch rows down to `keyCols` (max per bucket — the HLL
    * union) and evaluate the raw estimator exactly: integer bucket mass
    * t_scaled = sum 2^(55-mx) (empty bucket => 2^55), then one
    * left-to-right double expression alpha_64 * m^2 * 2^55 / t_scaled. */
  /** Exact integer bucket mass: sum 2^(55 - mx) over present buckets plus
    * 2^55 per empty bucket — aggregate expression over (…, mx) rows. */
  val hllMassAgg: Column =
    sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mx AS INT))")) +
      (lit(64L) - count(lit(1))) * lit(1L << 55)

  /** The HLL estimate from the integer mass + empty-bucket count: the raw
    * estimator (one left-to-right double expression) with the standard
    * small-range linear-counting correction (E_raw <= 2.5m and V > 0 =>
    * m * ln(m / V), Flajolet et al. §4). The correction stays bit-replayable
    * in SQL: its only transcendental input is ln(64 / V) over the 64
    * possible integer V values, verified bit-identical between Java
    * Math.log and DuckDB ln on all of them (round-6 session check). */
  def hllEstimate(tScaled: Column, vEmpty: Column): Column = {
    val raw = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
      tScaled.cast("double")
    // NOT functions.log: Spark lowers that to StrictMath.log (fdlibm),
    // which differs from the system libm DuckDB calls in the last ulp on
    // some of the 64 possible arguments (V=52 caught at sf0.001). Math.log
    // is the platform intrinsic == system libm — verified bit-identical to
    // DuckDB ln on all 64 V values.
    val lc = udf((v: Long) => 64.0 * java.lang.Math.log(64.0 / v.toDouble))
    when(raw <= lit(160.0) && vEmpty > lit(0L), lc(vEmpty)).otherwise(raw)
  }

  /** Stage 2 of the portable HLL: merge sketch rows down to `keyCols` (max
    * per bucket — the HLL union) and evaluate the estimator over the exact
    * integer mass. Output: (keys..., approx_distinct, t_scaled). */
  def hllPortableEstimate(sketch: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    hllEstimateFromBuckets(
      sketch.groupBy(keys :+ col("bucket"): _*).agg(max(col("mx")).as("mx")),
      keys)
  }

  /** The mass + estimator rollup over a frame that is ALREADY per-bucket
    * maxed ((keys..., bucket, mx) rows) — the ONE copy of the estimator
    * evaluation, shared by [[hllPortableEstimate]] and the streaming
    * chained-agg path ([[graft.streaming.StreamOps.windowedApproxDistinct]],
    * whose stage 1 is itself the stateful per-bucket max), so a future
    * change to the linear-counting threshold or bucket constants cannot
    * drift between the two. */
  def hllEstimateFromBuckets(perBucket: DataFrame, keys: Seq[Column]): DataFrame =
    perBucket
      .groupBy(keys: _*)
      .agg(hllMassAgg.as("t_scaled"), (lit(64L) - count(lit(1))).as("v_empty"))
      .select(keys :+
        hllEstimate(col("t_scaled"), col("v_empty")).as("approx_distinct") :+
        col("t_scaled"): _*)

  /** The bucket an item hashes to in row `row` of a portable Count-Min
    * sketch: the engine-wide md5 60-bit hash of the row-salted item, mod
    * `w`. Native columns, whole-stage-codegen'd, and — like [[hllObs]] —
    * replayable verbatim by an independent SQL engine. */
  def cmsBucket(item: Column, row: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(item.cast("string"), lit(s"#cms$row"))),
      1, 15), 16, 10).cast("long"), lit(w.toLong))

  /** Portable Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms
    * 2005): d salted hash rows x w counters per group, built as a plain
    * (group, j, bucket, cnt) frame — one map-side-combined aggregation,
    * <= d*w rows per group on the exchange regardless of item cardinality.
    * Point estimates OVERCOUNT, never undercount (each row's counter is a
    * sum over a superset of the item's occurrences), and the estimate is
    * within eps*N of truth w.p. 1-delta for w = e/eps, d = ln(1/delta).
    *
    * Mergeable by summing cnt on (group, j, bucket) — the
    * store-sketches-merge-later pattern of [[hllPortableSketch]]; and like
    * the portable HLL, the WHOLE construction (salted md5 bucketing and
    * integer counts) replays bit-exactly in SQL, so the sketch path itself
    * is oracle-verifiable rather than engine-opaque. */
  def cmsSketch(df: DataFrame, groupCol: String, itemCol: String,
      d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"d and w must be positive, got d=$d w=$w")
    df.filter(col(itemCol).isNotNull)
      .select(col(groupCol).as("group"),
        posexplode(array((0 until d).map(j => cmsBucket(col(itemCol), j, w)): _*)))
      .select(col("group"), col("pos").as("j"), col("col").as("bucket"))
      .groupBy("group", "j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a portable CMS sketch frame: for each (group, item) probe
    * row, est_count = min over the d rows of that row's bucket counter
    * (missing bucket => 0). The sketch side is tiny (<= d*w rows per
    * group) and broadcast, so probing any number of items stays a
    * map-side join + bounded aggregation. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      d: Int, w: Int): DataFrame = {
    val expl = probes
      .select(col("group"), col("item"),
        posexplode(array((0 until d).map(j => cmsBucket(col("item"), j, w)): _*)))
      .select(col("group"), col("item"), col("pos").as("j"),
        col("col").as("bucket"))
    expl.join(broadcast(sketch), Seq("group", "j", "bucket"), "left")
      .groupBy("group", "item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** The d bit positions an item sets in a portable Bloom filter of
    * `mBits` bits: Kirsch-Mitzenmacher double hashing — ONE md5 per item
    * yields h1 (hex chars 1-15, 60 bits) and h2 (chars 16-29, 56 bits),
    * and position j = (h1 + j*h2) mod mBits. Same false-positive
    * guarantees as d independent hashes (Kirsch & Mitzenmacher, "Less
    * Hashing, Same Performance", ESA 2006), at 1/d the hashing cost —
    * the d salted-md5 probes this replaces were the dominant cost of the
    * Bloom-join probe side (1.3s of a_bloom_join's 1.9s at sf0.1).
    * 56-bit h2 keeps h1 + (d-1)*h2 inside a signed 64-bit long for any
    * d <= 64. Replays in SQL as two substr()s of one md5. */
  def bloomPositions(item: Column, d: Int, mBits: Int): Column = {
    require(d <= 64, s"d must be <= 64 (overflow bound), got $d")
    val h = md5(item.cast("string"))
    val h1 = conv(substring(h, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(h, 16, 14), 16, 10).cast("long")
    array((0 until d).map(j =>
      pmod(h1 + lit(j.toLong) * h2, lit(mBits.toLong))): _*)
  }

  /** Build a portable Bloom filter over a membership set as a frame of its
    * DISTINCT set bit positions — <= min(d*|set|, mBits) rows, broadcastable,
    * unioned across sets by distinct-union, and (unlike
    * `DataFrameStatFunctions.bloomFilter`'s engine-specific binary) fully
    * replayable in SQL. */
  def bloomBits(items: DataFrame, itemCol: String, d: Int, mBits: Int): DataFrame = {
    require(d > 0 && mBits > 0, s"d and mBits must be positive, got d=$d mBits=$mBits")
    items.filter(col(itemCol).isNotNull)
      .select(explode(bloomPositions(col(itemCol), d, mBits)).as("pos"))
      .distinct()
  }

  /** Bloom membership test for every candidate row: appends
    * `bloom_positive` = true iff ALL d of the candidate's bit positions are
    * set. No false negatives ever; false positives at the standard
    * (1-e^(-dn/m))^d rate — and because the construction is deterministic,
    * WHICH items false-positive is reproducible and oracle-checkable. The
    * bits side broadcasts; the candidate side stays one scan + a bounded
    * per-row aggregation (explode fans each row out d ways, grouped
    * straight back by the carried key columns). */
  def bloomContains(candidates: DataFrame, itemCol: String, bits: DataFrame,
      d: Int, mBits: Int): DataFrame = {
    val keyCols = candidates.columns.map(col)
    // membership = EVERY exploded position matched, tested as
    // count(matched) == count(rows in the group), NOT == d: value-identical
    // candidate rows collapse into one group of 2d/3d/... exploded rows,
    // where a literal d comparison would turn a true member into a FALSE
    // NEGATIVE — violating the no-false-negatives contract. (The collapse
    // itself is the documented groupBy-by-all-columns semantics: exact
    // duplicate input rows return one flagged row.)
    candidates
      .select(keyCols :+
        explode(bloomPositions(col(itemCol), d, mBits)).as("__pos"): _*)
      .join(broadcast(bits.select(col("pos").as("__bit"))),
        col("__pos") === col("__bit"), "left")
      .groupBy(keyCols: _*)
      .agg((count(col("__bit")) === count(lit(1))).as("bloom_positive"))
  }

  /** Per-group heavy hitters: top items by estimated count from a k-counter
    * Misra-Gries summary. Emits (group, item, est_count) rows; the summary
    * is sorted (estimate desc, item asc) at finish, so posexplode emits
    * each group's items in that deterministic order. */
  def heavyHitters(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAggregator(k), Encoders.STRING)
    df.groupBy(col(groupCol).as("group"))
      .agg(mg(col(itemCol).cast("string")).as("s"))
      .select(col("group"), posexplode(arrays_zip(col("s.keys"), col("s.counts"))))
      .select(col("group"), col("col.keys").as("item"),
        col("col.counts").as("est_count"))
  }

  // ---------------- KMV / theta sketch set algebra ----------------

  /** 2^60 — the hash-space size of the engine-wide portable md5 60-bit
    * hash, exactly representable as a double. */
  private val Two60: Double = 1152921504606846976L.toDouble

  /** The portable KMV hash of an item: the engine-wide md5 60-bit
    * convention under the `#kmv` salt — replayable verbatim in SQL. */
  def kmvHash(item: Column): Column =
    conv(substring(md5(concat(item.cast("string"), lit("#kmv"))), 1, 15),
      16, 10).cast("long")

  /** Per-group KMV sketch: the k smallest DISTINCT portable hashes as
    * (group, h, rk) rows, rk = 1-based ascending rank. One
    * map-side-combined aggregation ([[BottomKDistinctAggregator]], <= k
    * longs of state per task) — no distinct shuffle, no per-group sort of
    * the full hash set. The sketch supports distinct estimation AND set
    * algebra (union/intersection across groups, [[kmvPairOverlap]]) —
    * the capability HLL trades away — and, like every portable sketch
    * here, replays bit-exactly in an independent SQL engine. */
  def kmvSketch(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val bk = udaf(new BottomKDistinctAggregator(k), Encoders.scalaLong)
    df.filter(col(itemCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(bk(kmvHash(col(itemCol))).as("s"))
      .select(col("group"), posexplode(col("s.hs")))
      .select(col("group"), (col("pos") + 1).as("rk"), col("col").as("h"))
  }

  /** Distinct-count estimate from a KMV sketch: exact when the group held
    * fewer than k distinct hashes (the sketch IS the hash set), else the
    * standard unbiased (k-1) / U_(k) estimator with U_(k) = h_k / 2^60 —
    * a single exact double division, oracle-replayable. */
  def kmvDistinct(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("group")
      .agg(count(lit(1)).as("n_hashes"), max("h").as("kth_hash"))
      .select(col("group"),
        when(col("n_hashes") < k, col("n_hashes").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Two60)
            / col("kth_hash").cast("double")).as("est_distinct"))

  /** Pairwise set algebra over per-group KMV sketches (the theta-sketch
    * estimator, Dasgupta et al., "Theta sketch framework"): for every
    * group pair (ga < gb), estimate the distinct-count of the UNION (KMV
    * over the merged bottom-k) and of the INTERSECTION (rho / theta, with
    * theta the merged k-th smallest hash and rho the number of retained
    * hashes present in both sketches). Both estimates degrade to EXACT
    * values when the merged hash set fits under k. Plan shape: sketches
    * are <= k rows per group; pairs x 2k rows total flow through one
    * grouped dedup + one per-pair window — nothing touches raw data
    * again. */
  def kmvPairOverlap(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val sk = kmvSketch(df, groupCol, itemCol, k).localCheckpoint(false)
    val groups = sk.select("group").distinct()
    val pairs = groups.select(col("group").as("ga"))
      .join(groups.select(col("group").as("gb")), col("ga") < col("gb"))
    val merged = pairs.join(sk.select(col("group").as("ga"), col("h")), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(
        pairs.join(sk.select(col("group").as("gb"), col("h")), Seq("gb"))
          .select(col("ga"), col("gb"), col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ga", "gb").orderBy("h")
    merged.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_u"), max("h").as("theta_h"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("rho"))
      .select(col("ga"), col("gb"),
        when(col("n_u") < k, col("n_u").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Two60)
            / col("theta_h").cast("double")).as("est_union"),
        when(col("n_u") < k, col("rho").cast("double"))
          .otherwise(col("rho").cast("double") * lit(Two60)
            / col("theta_h").cast("double")).as("est_intersect"))
  }
}
