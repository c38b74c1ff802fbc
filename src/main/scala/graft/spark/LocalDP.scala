package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LOCAL differential privacy — the trust model the central engine
  * ([[DPEngine]]) cannot express: each privacy unit RANDOMIZES ITS OWN
  * report before anything aggregates, so the collector never holds true
  * values at all (the telemetry/federated shape; Warner's randomized
  * response lineage, deployed as RAPPOR / Apple's CMS / Chrome's
  * telemetry). The engine-side job is exact bit aggregation + the
  * unbiased debiasing estimate — both pure post-processing of the
  * already-private reports.
  *
  * [[ldpFrequency]] implements symmetric UNARY ENCODING (basic one-hot
  * RAPPOR): a PUBLIC domain of k values, each unit's value one-hot
  * encodes to k bits, and every bit independently reports truthfully
  * with probability p = e^(eps/2) / (e^(eps/2) + 1) and flips otherwise
  * (equivalently: a false bit reports 1 with q = 1 - p). Two one-hot
  * vectors differ in exactly 2 bits, each bit's report is
  * (eps/2)-LDP, so the whole report is eps-LDP by composition. The
  * frequency estimate debiases the observed ones-count:
  * est_j = (c_j - n q) / (p - q) — unbiased for the true count.
  *
  * Contracts (the engine's conventions): the domain is PUBLIC and
  * closed — a value outside it fails loud (silently dropping or
  * bucketing it would misstate n in the debiasing); NULL values fail
  * loud; each unit contributes exactly ONE report (the L0 = 1 bound —
  * the deterministic lowest-value row per unit; route multi-report
  * designs through explicit budget splits). Zero noise
  * ([[graft.core.NoiseSource.Zero]]: uniform() = 0.5 never clears a
  * sub-0.5 flip probability, and p > 0.5 > q for every eps > 0) reports
  * exact one-hot bits, so the released frame is a deterministic
  * function of exact counts — the oracle replays the whole estimator.
  *
  * Scale shape: one window rank per unit (the cap), one map-only
  * flip-and-explode (k small, the report is the unit's k-bit row), one
  * map-side-combined aggregation to (k) rows. Nothing data-shaped
  * collects or broadcasts. */
object LocalDP {

  def ldpFrequency(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): DataFrame = {
    require(domain.nonEmpty, "ldpFrequency: empty domain")
    require(domain.distinct.size == domain.size,
      s"ldpFrequency: duplicate domain values in $domain")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val k = domain.size
    val expHalf = math.exp(epsilon / 2.0)
    val p = expHalf / (expHalf + 1.0)
    val q = 1.0 / (expHalf + 1.0)
    val domainArr = domain.toArray
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpFrequency: NULL value for a privacy unit — nulls have no " +
          "one-hot encoding; filter or impute upstream")).cast("string"))
      .otherwise(valueCol.cast("string"))
    // one report per unit: the deterministic lowest value (L0 = 1) — a
    // per-unit MIN, so it aggregates map-side (r19 optimization: the
    // row_number window shape sorted every row for the same result)
    val perUnit = df
      .select(col(pidCol).as("__pid"), checked.as("__v"))
      .groupBy(col("__pid")).agg(min(col("__v")).as("__v"))
    // the LOCAL randomizer: one-hot encode + per-bit flip. Marked
    // nondeterministic so Catalyst never collapses or re-orders draws.
    // RETRY COMPOSITION (differs from the central engine): the draw runs
    // in an executor task, so a Spark task retry or speculative duplicate
    // RE-RANDOMIZES that unit's report — under the LOCAL trust model each
    // execution is a separate eps-LDP release of the same unit, composing
    // to m*eps for a unit whose task ran m times. (Centrally, noise is
    // drawn once driver-side, so retries cost nothing there.) Secure
    // deployments should disable speculative execution
    // (spark.speculation=false, the default) and account retries, or
    // randomize client-side before ingest so the engine only aggregates.
    val flip = udf((v: String) => {
      val idx = domainArr.indexOf(v)
      if (idx < 0) throw new IllegalArgumentException(
        s"ldpFrequency: value '$v' outside the public domain — the " +
          "domain is closed (an unlisted value would silently misstate " +
          "n in the debiasing); extend the domain or filter upstream")
      val bits = new Array[Int](domainArr.length)
      var j = 0
      while (j < domainArr.length) {
        val b = if (j == idx) 1 else 0
        val flipProb = if (b == 1) 1.0 - p else q
        bits(j) = if (noise.uniform() < flipProb) 1 - b else b
        j += 1
      }
      bits
    }).asNondeterministic()
    perUnit
      .select(posexplode(flip(col("__v"))).as(Seq("__j", "__bit")))
      .groupBy(col("__j"))
      .agg(count(lit(1)).as("n_reports"),
        sum(col("__bit")).as("reported_ones"))
      .select(
        element_at(typedLit(domain), col("__j").cast("int") + 1).as("value"),
        col("n_reports"), col("reported_ones"),
        round((col("reported_ones") - col("n_reports") * lit(q)) /
          lit(p - q), 9).as("est_count"))
  }

  /** LOCAL-DP frequency over LARGE domains — OPTIMAL LOCAL HASHING
    * (Wang-Blocki-Li-Jha, USENIX Security 2017): where [[ldpFrequency]]'s
    * unary encoding sends k bits per unit (unusable at token/URL-scale
    * domains), OLH sends ONE bucket in [0, g) with g = floor(e^eps) + 1
    * — the report size is O(1) in the domain size. Each unit hashes its
    * value with a PUBLIC per-unit hash (seed = md5(pid) mod `seedSpace`
    * — the hash choice is public randomness, independent of the value,
    * so it carries no privacy budget and may be deterministic; the md5
    * derivation, NOT pid arithmetic, is the engine's portable
    * public-randomness convention shared with [[ldpHeavyHitters]]:
    * pid % seedSpace correlates with any pid-derived value structure,
    * concentrating a value's holders on correlated seeds so the fixed
    * parameter table's deterministic collisions bias cross-value
    * estimates — exactly the hazard the heavy-hitter walk measured) and
    * randomizes
    * the bucket: truthful with p = e^eps / (e^eps + g - 1), else uniform
    * over the other g - 1 buckets — eps-LDP by direct likelihood ratio
    * (worst-case output probability ratio p / ((1-p)/(g-1)) = e^eps).
    *
    * Estimation is support counting, debiased: C(v) = #reports whose
    * bucket equals H(seed, v); under a pairwise-uniform hash a non-true
    * value is supported with probability exactly 1/g, so
    * est(v) = (C(v) - n/g) / (p - 1/g) is unbiased. SCALE SHAPE (the
    * reason this exists): reports aggregate FIRST to <= seedSpace * g
    * (seed, bucket) count cells; the candidate grid is domain x
    * OBSERVED seeds (k x <= seedSpace rows, data-size-independent) with
    * the hash computed as a codegen'd integer expression; the cells
    * broadcast-join onto the grid and one aggregation lands k rows.
    * Nothing is ever n x k, nothing data-shaped collects.
    *
    * The hash family is Carter-Wegman universal: per seed s the pair
    * (A_s, B_s) from [[olhParams]] (a FIXED pseudorandom parameter
    * table — public randomness, data-independent, regenerated
    * identically everywhere) gives H(s, i) = ((A_s * i + B_s) mod P)
    * mod g — cross-value collision probability 1/g + O(1/P) per seed
    * pair, which is exactly what the 1/g debias term assumes. (A
    * seed-to-params map built from modular-affine mixing is NOT enough:
    * affine maps keep the collision indicator near-constant across
    * seeds for structured value pairs — measured 0.21 worst-pair
    * deviation vs the 0.05 sampling-noise bound this table achieves.)
    *
    * Contracts (the [[ldpFrequency]] conventions): closed PUBLIC domain,
    * out-of-domain and NULL values fail loud, one report per unit (the
    * deterministic lowest value), pid must cast to BIGINT (the seed is
    * replayed in SQL). Zero noise: uniform() = 0.5 < p whenever
    * p > 1/2 (any eps with fractional e^eps, e.g. eps = 1 => p =
    * e/(e+2) = 0.576), so every unit reports its TRUE bucket and the
    * whole release — hash, supports (true hits PLUS deterministic
    * cross-value hash collisions), debiasing — replays as a
    * deterministic SQL derivation over the literal parameter table. The
    * estimator's statistical behavior is spec-pinned under the real
    * randomizer. Retry composition caveat: same as [[ldpFrequency]].
    *
    * Output: (value, n_reports, support, est_count) — one row per
    * domain value. */
  def ldpFrequencyOLH(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame =
    olhEstimate(
      olhReportCells(df, pidCol, valueCol, domain, epsilon, noise,
        seedSpace).localCheckpoint(false), // draws final; read 3x below
      domain, epsilon, seedSpace)

  /** GROUPED LDP frequency — [[ldpFrequencyOLH]] per PUBLIC metadata key
    * (r17): the deployed-telemetry slice question ("value frequencies
    * per platform / per country") where the grouping key is COLLECTOR-
    * VISIBLE METADATA (platform, app version, geo of the connection) —
    * NOT a private attribute: the report is (key, bucket), so the key
    * rides outside the randomizer and carries no DP protection; a
    * private grouping attribute must instead be folded INTO the value
    * (product domain) or released via [[ldpHeavyHitters]]. Fail-loud on
    * NULL keys. Each unit reports ONCE — its deterministic lowest
    * (key, value) pair (the L0 = 1 bound), so the whole release is
    * eps-LDP regardless of how many keys a unit's rows span.
    *
    * Estimation is per-key OLH: cells collapse to (key, seed, bucket)
    * counts (<= keys * seedSpace * g — keys are LOW-CARDINALITY public
    * groups by contract); the grid is keys x domain x observed seeds
    * (data-size-independent); per-key n debiases each key's supports
    * independently. Zero noise: deterministic, the whole derivation
    * replays in SQL (the gate anchor). Output: (key, value, n_reports,
    * support, est_count) — one row per (observed key, domain value). */
  def ldpFrequencyOLHByKey(
      df: DataFrame,
      pidCol: String,
      keyCol: Column,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame = {
    require(domain.nonEmpty && domain.distinct.size == domain.size,
      "ldpFrequencyOLHByKey: domain must be non-empty and duplicate-free")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val gi = g.toInt
    val domainArr = domain.toArray
    val domainIdx: Map[String, Int] = domainArr.zipWithIndex.toMap
    val params = olhParams(seedSpace)
    val spark0 = df.sparkSession
    val checkedV = when(valueCol.isNull, raise_error(lit(
        "ldpFrequencyOLHByKey: NULL value for a privacy unit — filter " +
          "or impute upstream")).cast("string"))
      .otherwise(valueCol.cast("string"))
    val checkedK = when(keyCol.isNull, raise_error(lit(
        "ldpFrequencyOLHByKey: NULL group key — the key is public " +
          "collector metadata and every report must carry one; filter " +
          "or impute upstream")).cast("string"))
      .otherwise(keyCol.cast("string"))
    val seedCol = when(col("__pidn").isNull, raise_error(lit(
        "ldpFrequencyOLHByKey: pid does not cast to BIGINT — the public " +
          "hash seed derives from it")).cast("long"))
      .otherwise(pmod(expr(
        "CAST(conv(substr(md5(CAST(__pidn AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"), lit(seedSpace.toLong)))
    // ONE report per unit: the deterministic lowest (key, value) pair —
    // a per-unit MIN over the lexicographic struct, so it aggregates
    // map-side (r19: the row_number window sorted every row)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        checkedK.as("__k"), checkedV.as("__v"))
      .groupBy(col("__pidn"))
      .agg(min(struct(col("__k"), col("__v"))).as("__kv"))
      .select(col("__kv.__k").as("__k"), seedCol.as("__seed"),
        col("__kv.__v").as("__v"))
    val report = udf((seed: Long, v: String) => {
      val idx = domainIdx.getOrElse(v, -1)
      if (idx < 0) throw new IllegalArgumentException(
        s"ldpFrequencyOLHByKey: value '$v' outside the public domain — " +
          "the domain is closed; extend it or filter upstream")
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx.toLong, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    val cells = perUnit
      .select(col("__k"), col("__seed"),
        report(col("__seed"), col("__v")).as("__y"))
      .groupBy(col("__k"), col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // draws final; n, seeds, grid read it
    val nPerKey = cells.groupBy(col("__k")).agg(sum(col("__c")).as("__n"))
    val domDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        domainArr.toIndexedSeq.zipWithIndex.map { case (v, i) =>
          org.apache.spark.sql.Row(i.toLong, v) }, 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__i",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // grid: observed (key, seed) pairs x the domain, hash codegen'd
    val keySeeds = cells.select(col("__k"), col("__seed")).distinct()
    val grid = domDf
      .crossJoin(broadcast(keySeeds.join(paramsDf, "__seed")))
      .withColumn("__h",
        ((col("__a") * col("__i") + col("__b")) % lit(OlhPrime)) % lit(g))
    val cellsR = cells.select(col("__k").as("__ck"),
      col("__seed").as("__cseed"), col("__y"), col("__c"))
    grid.join(broadcast(cellsR),
        col("__k") === col("__ck") && col("__seed") === col("__cseed")
          && col("__h") === col("__y"), "left")
      .groupBy(col("__k"), col("value"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("support"))
      .join(broadcast(nPerKey), "__k")
      .select(col("__k").as("key"), col("value"),
        col("__n").as("n_reports"), col("support"),
        round((col("support") - col("__n") * lit(invG)) / lit(p - invG), 9)
          .as("est_count"))
  }

  /** One micro-batch step of STREAMING OLH frequency — the LDP family's
    * ingest fold: the (seed, bucket) -> count CELLS are plain additive
    * state (<= seedSpace * g rows — never data-shaped), so a stream
    * folds by summing each batch's cells into the store, and
    * [[olhEstimate]] reads the running estimate at ANY point for free.
    * Zero noise + the one-batch-per-unit contract => the fold over any
    * unit-partitioned batch split equals the one-shot
    * [[ldpFrequencyOLH]] cells exactly (spec-pinned).
    *
    * BOUNDING CONTRACT (the [[graft.spark.RangeTree.rangeTreeIngestStep]]
    * convention): the one-report-per-unit rule dedupes WITHIN a batch —
    * a unit whose rows straddle m batches reports m times and its
    * epsilon composes to m*eps; route each unit's rows through one
    * batch (partition the ingest by unit). Callers checkpoint the
    * returned store between steps. */
  def olhIngestStep(
      batch: DataFrame,
      store: Option[DataFrame],
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame = {
    val cells = olhReportCells(batch, pidCol, valueCol, domain, epsilon,
      noise, seedSpace)
    store match {
      case None => cells
      case Some(st) => st.unionByName(cells)
        .groupBy(col("__seed"), col("__y"))
        .agg(sum(col("__c")).as("__c"))
    }
  }

  /** The report-randomize-collapse stage shared by [[ldpFrequencyOLH]]
    * and [[olhIngestStep]]: one report per unit, the eps-LDP bucket
    * randomizer, collapsed to (seed, bucket) count cells. The caller
    * pins the result (draws are final once materialized). */
  private def olhReportCells(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int
  ): DataFrame = {
    require(domain.nonEmpty, "ldpFrequencyOLH: empty domain")
    require(domain.distinct.size == domain.size,
      s"ldpFrequencyOLH: duplicate domain values")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val domainArr = domain.toArray
    val params = olhParams(seedSpace)
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpFrequencyOLH: NULL value for a privacy unit — nulls have no " +
          "bucket; filter or impute upstream")).cast("string"))
      .otherwise(valueCol.cast("string"))
    // try_cast: a non-numeric pid flows to the shaped error instead of
    // ANSI's CAST_INVALID_INPUT mid-task
    // seed from the MD5 of the pid (the ldpHeavyHitters convention) —
    // pid % seedSpace would correlate with pid-derived value structure
    val seedCol = when(col("__pidn").isNull, raise_error(lit(
        "ldpFrequencyOLH: pid does not cast to BIGINT — the public hash " +
          "seed derives from it; map units to numeric ids upstream"))
        .cast("long"))
      .otherwise(pmod(expr(
        "CAST(conv(substr(md5(CAST(__pidn AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"), lit(seedSpace.toLong)))
    // one report per unit: the deterministic lowest value (L0 = 1) — a
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"), checked.as("__v"))
      .groupBy(col("__pidn")).agg(min(col("__v")).as("__v"))
      .select(seedCol.as("__seed"), col("__v"))
    // the LOCAL randomizer (nondeterministic — the ldpFrequency
    // conventions incl. the retry-composition caveat): true bucket via
    // the public hash, kept w.p. p, else uniform over the OTHER g - 1
    val gi = g.toInt
    // O(1) lookup — indexOf's linear scan is an O(n*k) hot path at
    // token-scale domains, the very regime this mechanism exists for
    val domainIdx: Map[String, Int] = domainArr.zipWithIndex.toMap
    val report = udf((seed: Long, v: String) => {
      val idx = domainIdx.getOrElse(v, -1)
      if (idx < 0) throw new IllegalArgumentException(
        s"ldpFrequencyOLH: value '$v' outside the public domain — the " +
          "domain is closed (an unlisted value would misstate n in the " +
          "debiasing); extend the domain or filter upstream")
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx.toLong, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    // reports collapse FIRST: <= seedSpace * g cells — everything
    // downstream is data-size-independent
    perUnit
      .select(col("__seed"), report(col("__seed"), col("__v")).as("__y"))
      .groupBy(col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
  }

  /** The debiased frequency readout over an OLH cells frame (a pinned
    * [[olhReportCells]] result or an [[olhIngestStep]] store): support
    * counting against the candidate grid, (C - n/g)/(p - 1/g) debias.
    * Pure post-processing — reads the cells three times, so pass a
    * checkpointed/stored frame. Output: (value, n_reports, support,
    * est_count). */
  def olhEstimate(
      pinned: DataFrame,
      domain: Seq[String],
      epsilon: Double,
      seedSpace: Int = 1024
  ): DataFrame = {
    require(domain.nonEmpty && domain.distinct.size == domain.size,
      "olhEstimate: domain must be non-empty and duplicate-free")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val domainArr = domain.toArray
    val params = olhParams(seedSpace)
    val spark0 = pinned.sparkSession
    val nDf = pinned.agg(sum(col("__c")).as("__n"))
    val seeds = pinned.select(col("__seed")).distinct()
    val domDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        domainArr.toIndexedSeq.zipWithIndex.map { case (v, i) =>
          org.apache.spark.sql.Row(i.toLong, v) }, 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__i",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // candidate grid: domain x observed seeds (with their literal hash
    // params), hash as a codegen'd integer EXPRESSION — mirrors olhHash
    // exactly (same constants P and g, non-negative operands, every
    // intermediate < 2^63, so Spark % == SQL % == Scala %)
    val grid = domDf
      .crossJoin(broadcast(seeds.join(paramsDf, "__seed")))
      .withColumn("__h",
        ((col("__a") * col("__i") + col("__b")) % lit(OlhPrime)) % lit(g))
    val cellsR = pinned.withColumnRenamed("__seed", "__cseed")
    grid.join(broadcast(cellsR),
        col("__seed") === col("__cseed") && col("__h") === col("__y"),
        "left")
      .groupBy(col("value"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("support"))
      .crossJoin(broadcast(nDf))
      .select(col("value"), col("__n").as("n_reports"), col("support"),
        round((col("support") - col("__n") * lit(invG)) / lit(p - invG), 9)
          .as("est_count"))
  }

  /** LOCAL-DP HEAVY HITTERS — prefix-extension discovery (the PEM shape,
    * Wang-Li-Jha "Locally Differentially Private Heavy Hitter
    * Identification", and the deployed Apple/Google telemetry pattern):
    * the question a frequency oracle cannot answer — WHAT are the
    * frequent values of an OPEN domain (URLs, tokens, error strings) —
    * answered by walking a prefix tree: users split into `rounds`
    * disjoint groups; group r's units report the OLH bucket of their
    * value's PREFIX of length L*(r+1)/rounds, and the aggregator
    * estimates only the candidates formed by extending the previous
    * round's top-k survivors one step — so each level's candidate set
    * stays k * |alphabet|^step instead of |alphabet|^L. Each unit
    * reports ONCE (its own group's round), so the whole discovery is
    * eps-LDP; group sizes shrink 1/rounds, the estimator-variance price
    * of the tree walk.
    *
    * Values are fixed-length lowercase-hex strings (`hexLen` chars,
    * fail-loud otherwise); the OLH index of a prefix is its numeric
    * value, so reporting needs NO closed candidate list (hash the
    * prefix, not an index into a domain) — the open-domain property.
    * Same public randomness as [[ldpFrequencyOLH]]: with h64 = md5(pid)'s
    * leading 60 bits, group = h64 mod rounds, seed = (h64 / rounds) mod
    * seedSpace, per-seed (A, B) from [[olhParams]].
    *
    * Zero noise: every report is the true bucket, every per-round
    * estimate (true hits + deterministic hash collisions, debiased) is
    * a deterministic function of exact counts, and the top-k pruning
    * breaks ties (est desc, candidate asc) — the WHOLE multi-round
    * derivation replays in SQL (the gate anchor). Retry-composition
    * caveat as [[ldpFrequency]].
    *
    * Output: the final round's top-k — (value, est_count, support,
    * n_reports, rk). Scale shape per round: reports collapse to
    * <= seedSpace * g cells; candidates (<= k * 16^step rows) cross the
    * observed seeds with the hash as a codegen'd expression; cells
    * broadcast onto the grid — nothing data-shaped collects, and the
    * only driver loop is the `rounds`-step walk (each step one bounded
    * Spark job chain, the IVF-training convention). */
  def ldpHeavyHitters(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      hexLen: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      k: Int = 8,
      rounds: Int = 2,
      seedSpace: Int = 1024
  ): DataFrame = {
    // 10, not 15: olhHash multiplies A (< P ~ 1e6) by the prefix's
    // numeric value, so the product stays under 2^63 only while the
    // prefix is <= 16^10 - 1 ~ 1.1e12 (1e6 * 1.1e12 ~ 1.1e18 < 9.2e18);
    // at 11+ hex chars the grid expression overflows (ANSI
    // ARITHMETIC_OVERFLOW) and the UDF silently wraps to out-of-range
    // buckets — which would break both the estimator and the eps-LDP
    // likelihood-ratio argument
    require(hexLen >= 1 && hexLen <= 10,
      s"hexLen must be in [1, 10] (A * prefix must stay under 2^63 in " +
        s"the public hash — hash longer values to <= 10 hex chars), got $hexLen")
    require(rounds >= 1 && hexLen % rounds == 0,
      s"rounds ($rounds) must divide hexLen ($hexLen) — equal prefix steps")
    require(k >= 1, s"k must be >= 1, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val step = hexLen / rounds
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val gi = g.toInt
    val params = olhParams(seedSpace)
    val spark0 = df.sparkSession
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpHeavyHitters: NULL value for a privacy unit — filter or " +
          "impute upstream")).cast("string"))
      .otherwise(when(valueCol.cast("string").rlike(s"^[0-9a-f]{$hexLen}$$"),
        valueCol.cast("string"))
        .otherwise(raise_error(lit(
          s"ldpHeavyHitters: value is not a $hexLen-char lowercase-hex " +
            "string — encode the open domain to fixed-length hex " +
            "upstream (hash or pad)")).cast("string")))
    val pidN = when(col("__pidn").isNull, raise_error(lit(
        "ldpHeavyHitters: pid does not cast to BIGINT — group and seed " +
          "derive from it")).cast("long"))
      .otherwise(col("__pidn"))
    // one report per unit: the deterministic lowest value — a per-unit
    // MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"), checked.as("__v"))
      .groupBy(col("__pidn")).agg(min(col("__v")).as("__v"))
      .select(pidN.as("__pid"), col("__v"))
      // group and seed from the MD5 of the pid (the engine's portable
      // public-randomness convention), NOT pid arithmetic: pid % rounds
      // correlates with any pid-linear value structure — measured: a
      // fixture deriving values from user_id % 4 put each heavy value in
      // ONLY ONE parity group, so the round estimating its prefix never
      // saw its holders and discovery collapsed. The hash decorrelates
      // group membership from every value pattern.
      .withColumn("__h64", expr(
        "CAST(conv(substr(md5(CAST(__pid AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"))
      .withColumn("__grp", pmod(col("__h64"), lit(rounds.toLong)))
      .withColumn("__seed",
        pmod(expr(s"__h64 div $rounds"), lit(seedSpace.toLong)))
      .localCheckpoint(false) // every round reads its group slice
    val report = udf((seed: Long, prefix: String) => {
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, java.lang.Long.parseLong(prefix, 16), g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val hexDigits = spark0.range(0, 16).select(
      lower(lpad(expr("hex(id)"), 1, "0")).as("__d"))
    // level-1 candidates: ALL step-length prefixes (16^step rows, public)
    var cands = (1 until step).foldLeft(
      hexDigits.select(col("__d").as("value"))) { (acc, _) =>
      acc.crossJoin(hexDigits).select(concat(col("value"), col("__d"))
        .as("value"))
    }
    var out: DataFrame = null
    for (r <- 0 until rounds) {
      val pfxLen = step * (r + 1)
      val grpReports = perUnit.filter(col("__grp") === r.toLong)
        .select(col("__seed"),
          report(col("__seed"), substring(col("__v"), 1, pfxLen)).as("__y"))
      val cells = grpReports.groupBy(col("__seed"), col("__y"))
        .agg(count(lit(1)).as("__c"))
        .localCheckpoint(false) // draws final; n + seeds + grid read it
      val nDf = cells.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
      val seeds = cells.select(col("__seed")).distinct()
      val grid = cands
        .crossJoin(broadcast(seeds.join(paramsDf, "__seed")))
        .withColumn("__h",
          ((col("__a") * expr("CAST(conv(value, 16, 10) AS BIGINT)") +
            col("__b")) % lit(OlhPrime)) % lit(g))
      val cellsR = cells.withColumnRenamed("__seed", "__cseed")
      val est = grid.join(broadcast(cellsR),
          col("__seed") === col("__cseed") && col("__h") === col("__y"),
          "left")
        .groupBy(col("value"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("support"))
        .crossJoin(broadcast(nDf))
        .select(col("value"), col("__n").as("n_reports"), col("support"),
          round((col("support") - col("__n") * lit(invG)) / lit(p - invG),
            9).as("est_count"))
      val top = est
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("est_count").desc, col("value").asc)).cast("long"))
        .filter(col("rk") <= k)
        .localCheckpoint(false) // next round extends it; final round returns
      if (r < rounds - 1)
        cands = (0 until step).foldLeft(top.select(col("value"))) {
          (acc, _) => acc.crossJoin(hexDigits)
            .select(concat(col("value"), col("__d")).as("value"))
        }.localCheckpoint(false)
      else out = top
    }
    out.select("value", "est_count", "support", "n_reports", "rk")
  }

  /** LOCAL-DP RANGE TREE — the hierarchical frequency oracle (the
    * Cormode-Kulkarni-Srivastava "Answering Range Queries Under Local
    * Differential Privacy" shape, VLDB 2019): range/CDF queries under
    * the LOCAL trust model, where the central
    * [[graft.spark.RangeTree.dpRangeCountTree]] cannot operate (the
    * collector never holds true values). Units md5-split into levels+1
    * groups, one per dyadic level; group l's units OLH-report their
    * value's NODE INDEX at level l (bin >> l — a domain of bins >> l
    * nodes, one bucket per unit, eps-LDP total since each unit reports
    * once). The aggregator estimates every node of the full dyadic
    * universe from its level's group (debiased support counting, scaled
    * by nTotal / n_level — the deterministic-slice population scaling)
    * and the released frame IS a tree ((__lvl, __idx, dp_count),
    * 2*bins-1 rows), so the CENTRAL readout machinery consumes it
    * unchanged as pure post-processing:
    * [[graft.spark.RangeTree.cdfFromTree]] for the CDF,
    * [[graft.spark.RangeTree.rangeQueries]] for ranges — the bridge
    * that closes the tree family's central/local asymmetry.
    *
    * Error shape (the CKS trade): each level's estimator carries OLH
    * variance over n/(levels+1) units, and a range reads <= 2*levels
    * cover nodes — O(log^1.5 bins / eps * sqrt(n)) per range vs central
    * DP's O(log^1.5 bins / eps); LDP error grows with sqrt(n), the
    * model's price. Values CLAMP into [lo, hi) (the tree-family
    * convention); NULL and non-numeric-pid fail loud. Zero noise:
    * truthful node reports, so every estimate (true hits + hash
    * collisions, debiased, scaled) is a deterministic function of exact
    * counts and the whole tree + CDF replays in SQL (the gate anchor).
    * A level with NO reporting units fails loud (n too small to field
    * levels+1 groups — collect more reports or coarsen bins).
    *
    * Scale shape: reports collapse FIRST to <= (levels+1) * seedSpace *
    * g cells (broadcast-sized); the node grid is GENERATED
    * ((2*bins-1) x observed per-level seeds, data-size-independent);
    * one aggregation lands the 2*bins-1 released rows. Nothing
    * data-shaped collects. */
  def ldpRangeTree(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame =
    ldpTreeEstimate(
      ldpTreeReportCells(df, pidCol, valueCol, lo, hi, bins, epsilon,
        noise, seedSpace)
        .localCheckpoint(false), // draws final; n, seeds and grid read it
      bins, epsilon, seedSpace)

  /** The report-randomize-collapse stage of [[ldpRangeTree]] — one
    * (__lvl, __seed, __y) -> count cells frame, <= (levels+1) *
    * seedSpace * g rows of plain ADDITIVE state. Shared by the one-shot
    * tree and the streaming fold so the randomizer cannot drift. */
  private def ldpTreeReportCells(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int
  ): DataFrame = {
    require(bins >= 2 && (bins & (bins - 1)) == 0 && bins <= 4096,
      s"bins must be a power of two in [2, 4096], got $bins")
    require(lo < hi, s"empty domain [$lo, $hi)")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val levels = 31 - Integer.numberOfLeadingZeros(bins)
    val nLevels = levels + 1
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val gi = g.toInt
    val width = (hi - lo) / bins
    val params = olhParams(seedSpace)
    val spark0 = df.sparkSession
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpRangeTree: NULL value for a privacy unit — filter or impute " +
          "upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)),
      lit(hi - width / 2)) // clamp INTO the top bin (the tree convention)
    val pidN = when(col("__pidn").isNull, raise_error(lit(
        "ldpRangeTree: pid does not cast to BIGINT — group and seed " +
          "derive from it")).cast("long"))
      .otherwise(col("__pidn"))
    // one report per unit: the deterministic lowest clamped value — a
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        clamped.as("__val"))
      .groupBy(col("__pidn")).agg(min(col("__val")).as("__val"))
      .select(pidN.as("__pid"),
        floor((col("__val") - lit(lo)) / lit(width)).cast("long")
          .as("__bin"))
      .withColumn("__h64", expr(
        "CAST(conv(substr(md5(CAST(__pid AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"))
      .withColumn("__lvl", pmod(col("__h64"), lit(nLevels.toLong))
        .cast("int"))
      .withColumn("__seed",
        pmod(expr(s"__h64 div $nLevels"), lit(seedSpace.toLong)))
      .withColumn("__idx", expr("shiftright(__bin, __lvl)"))
    val report = udf((seed: Long, idx: Long) => {
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    // reports collapse FIRST: <= nLevels * seedSpace * g cells.
    // The cells carry their CALIBRATION (__eps, __bins, __sspace — r19
    // advice): a cells frame is only additive with, and only estimable
    // under, the exact calibration it was drawn at (g buckets, levels+1
    // groups, flip probability), so the fold and the readout
    // require-match these tags instead of trusting a doc-only contract.
    val cells = perUnit
      .select(col("__lvl"), col("__seed"),
        report(col("__seed"), col("__idx")).as("__y"))
      .groupBy(col("__lvl"), col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__eps", lit(epsilon))
      .withColumn("__bins", lit(bins.toLong))
      .withColumn("__sspace", lit(seedSpace.toLong))
      .localCheckpoint(false) // draws final; n, seeds and grid read it
    cells
  }

  /** Require a cells frame's calibration tags to match the caller's
    * (epsilon, bins, seedSpace) — the [[ldpLongitudinalMeanStep]] ledger
    * convention for the tree family. Fails loud on an untagged (pre-r19)
    * store: folding or estimating at a silently different calibration
    * yields meaningless numbers, which is strictly worse than asking the
    * operator to restart the stream. */
  /** Schema half of the calibration check — free, no Spark job. */
  private def requireTreeTagColumns(cells: DataFrame, opName: String): Unit = {
    val cols = cells.columns.toSet
    require(Seq("__eps", "__bins", "__sspace").forall(cols.contains),
      s"$opName: the cells store carries no calibration tags — it was " +
        "built by a pre-tagging version; rebuild the store (the tags are " +
        "what prevent folding across incompatible calibrations)")
  }

  /** Value half against the 6-slot min/max row produced by
    * [[calibrationAggs]] at `offset` — shared by the fold's eager check
    * and the readout's piggybacked check so the message cannot drift. */
  private def requireTagRow(r: org.apache.spark.sql.Row, offset: Int,
      opName: String, epsilon: Double, bins: Int, seedSpace: Int): Unit =
    if (!r.isNullAt(offset)) { // empty store: nothing to contradict
      require(
        r.getDouble(offset) == epsilon && r.getDouble(offset + 1) == epsilon &&
        r.getLong(offset + 2) == bins.toLong &&
        r.getLong(offset + 3) == bins.toLong &&
        r.getLong(offset + 4) == seedSpace.toLong &&
        r.getLong(offset + 5) == seedSpace.toLong,
        s"$opName: the cells store was drawn at eps in " +
          s"[${r.getDouble(offset)}, ${r.getDouble(offset + 1)}], bins in " +
          s"[${r.getLong(offset + 2)}, ${r.getLong(offset + 3)}], " +
          s"seedSpace in [${r.getLong(offset + 4)}, ${r.getLong(offset + 5)}] " +
          s"but this call passes (eps = $epsilon, bins = $bins, " +
          s"seedSpace = $seedSpace) — calibration must stay fixed across " +
          "a stream; start a new store to recalibrate")
    }

  private def calibrationAggs: Seq[Column] = Seq(
    min(col("__eps")), max(col("__eps")),
    min(col("__bins")), max(col("__bins")),
    min(col("__sspace")), max(col("__sspace")))

  /** Eager full calibration check, used by the FOLD (fail-fast at fold
    * time, before incompatible counts could union; the store is
    * calibration-bounded — <= nLevels * seedSpace * g rows, checkpointed
    * per the step contract — so this one small aggregation per
    * micro-batch is the cost of failing loud BEFORE state is written).
    * The readout piggybacks the same check on its existing nTotal
    * aggregation instead — zero extra scans there. */
  private def requireTreeCalibration(cells: DataFrame, opName: String,
      epsilon: Double, bins: Int, seedSpace: Int): Unit = {
    requireTreeTagColumns(cells, opName)
    val r = cells.agg(calibrationAggs.head, calibrationAggs.tail: _*).head()
    requireTagRow(r, 0, opName, epsilon, bins, seedSpace)
  }

  /** One micro-batch step of the STREAMING LDP range tree (r18 — the
    * [[olhIngestStep]] shape for the hierarchical oracle): the tree's
    * report cells are plain additive state, so a stream folds by
    * summing each batch's cells into the store and [[ldpTreeEstimate]]
    * releases the running tree at ANY point as free post-processing
    * (which the central readouts then consume — continuous per-fleet
    * CDF telemetry). Same BOUNDING CONTRACT as [[olhIngestStep]]: the
    * one-report-per-unit rule dedupes WITHIN a batch — route each
    * unit's rows through ONE batch or epsilon composes per batch.
    * Callers checkpoint the returned store between steps. Epsilon,
    * bins and seedSpace must stay fixed across a stream (cells are
    * calibration-shaped: g buckets, levels+1 groups) — ENFORCED (r19):
    * the store carries __eps/__bins/__sspace tags and both the fold and
    * [[ldpTreeEstimate]] fail loud on a mismatch. */
  def ldpTreeIngestStep(
      batch: DataFrame,
      store: Option[DataFrame],
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame = {
    val cells = ldpTreeReportCells(batch, pidCol, valueCol, lo, hi, bins,
      epsilon, noise, seedSpace)
    store match {
      case None => cells
      case Some(st) =>
        // calibration tags must match before the stores become additive
        // (r19): a store drawn at another epsilon/bins/seedSpace has a
        // different cell grid and flip probability — summing would yield
        // meaningless estimates with no error anywhere downstream
        requireTreeCalibration(st, "ldpTreeIngestStep", epsilon, bins,
          seedSpace)
        st.unionByName(cells)
          .groupBy(col("__lvl"), col("__seed"), col("__y"),
            col("__eps"), col("__bins"), col("__sspace"))
          .agg(sum(col("__c")).as("__c"))
    }
  }

  /** The debiased whole-tree readout over an LDP tree cells frame (a
    * pinned [[ldpTreeReportCells]] result or a [[ldpTreeIngestStep]]
    * store): estimates every node of the dyadic universe and releases
    * the (__lvl, __idx, dp_count) tree the central readouts consume.
    * Pure post-processing — calling it never spends budget. */
  def ldpTreeEstimate(
      cells: DataFrame,
      bins: Int,
      epsilon: Double,
      seedSpace: Int = 1024
  ): DataFrame = {
    require(bins >= 2 && (bins & (bins - 1)) == 0 && bins <= 4096,
      s"bins must be a power of two in [2, 4096], got $bins")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    // the debias constants below (g, p) must be the constants the reports
    // were DRAWN with — the tags make a mismatch fail loud (r19). The
    // value check rides the existing nTotal aggregation: zero extra scans
    requireTreeTagColumns(cells, "ldpTreeEstimate")
    val levels = 31 - Integer.numberOfLeadingZeros(bins)
    val nLevels = levels + 1
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val params = olhParams(seedSpace)
    val spark0 = cells.sparkSession
    val nTotalRow = cells.agg(coalesce(sum(col("__c")), lit(0L)),
      calibrationAggs: _*).head()
    requireTagRow(nTotalRow, 1, "ldpTreeEstimate", epsilon, bins, seedSpace)
    val nTotal = nTotalRow.getLong(0)
    require(nTotal > 0, "ldpRangeTree: no reporting units")
    val nPerLvl = cells.groupBy(col("__lvl"))
      .agg(sum(col("__c")).as("__nl"))
    // every level must have reporters — a zero-group level has no
    // estimator and a silent zero would fabricate empty subtrees
    val lvlCount = nPerLvl.count()
    require(lvlCount == nLevels.toLong,
      s"ldpRangeTree: only $lvlCount of $nLevels dyadic levels have " +
        "reporting units — n too small to field levels+1 groups; " +
        "collect more reports or coarsen bins")
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // the GENERATED node universe x each level's observed seeds
    val nodes = spark0.range(0, nLevels.toLong).toDF("__lvl")
      .withColumn("__lvl", col("__lvl").cast("int"))
      .join(spark0.range(0, bins.toLong).toDF("__idx"),
        col("__idx") < expr(s"shiftright(${bins.toLong}, __lvl)"))
    val seeds = cells.select(col("__lvl").as("__slvl"), col("__seed"))
      .distinct()
    val grid = nodes
      .join(broadcast(seeds.join(paramsDf, "__seed")),
        col("__lvl") === col("__slvl"))
      .withColumn("__h",
        ((col("__a") * col("__idx") + col("__b")) % lit(OlhPrime)) % lit(g))
    val cellsR = cells.select(col("__lvl").as("__clvl"),
      col("__seed").as("__cseed"), col("__y"), col("__c"))
    grid.join(broadcast(cellsR),
        col("__lvl") === col("__clvl") && col("__seed") === col("__cseed")
          && col("__h") === col("__y"), "left")
      .groupBy(col("__lvl"), col("__idx"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__sup"))
      .join(broadcast(nPerLvl), "__lvl")
      .select(col("__lvl"), col("__idx"),
        round((col("__sup") - col("__nl") * lit(invG)) / lit(p - invG) *
          (lit(nTotal.toDouble) / col("__nl")), 9).as("dp_count"))
  }

  /** GROUPED LOCAL-DP RANGE TREE (r18) — [[ldpRangeTree]] per PUBLIC
    * collector-metadata key (the [[ldpFrequencyOLHByKey]] contract: the
    * key rides OUTSIDE the randomizer; a private grouping attribute
    * must fold into the value instead): per-key range/CDF/quantile
    * telemetry under the local trust model, e.g. a latency CDF per
    * platform. One report per unit — the deterministic lowest
    * (key, value) pair — so eps-LDP total across keys; each unit's
    * dyadic level and OLH seed derive from md5(pid) exactly as the
    * global tree's. The aggregator estimates every key's full node
    * universe from that key's level groups (debiased, scaled by
    * nKey / n(key, level) — each key's tree estimates its OWN cohort)
    * and the release is (key, __lvl, __idx, dp_count) — keys x
    * (2*bins-1) rows, which the central keyed readouts
    * ([[graft.spark.RangeTree.cdfFromTree]],
    * [[graft.spark.RangeTree.rangeQueries]] with keyCols = Seq(key))
    * consume unchanged.
    *
    * An OBSERVED key missing reporters at some level fails loud naming
    * the key (its tree would fabricate empty subtrees); NULL keys,
    * NULL values and non-castable pids fail loud. Zero noise: the
    * whole per-key derivation is deterministic and replays in SQL
    * (the gate anchor). Scale shape: cells <= keys * (levels+1) *
    * seedSpace * g, the grid is GENERATED per observed (key, level,
    * seed) — nothing data-shaped collects. */
  def ldpRangeTreeByKey(
      df: DataFrame,
      pidCol: String,
      keyCol: Column,
      valueCol: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame = {
    require(bins >= 2 && (bins & (bins - 1)) == 0 && bins <= 4096,
      s"bins must be a power of two in [2, 4096], got $bins")
    require(lo < hi, s"empty domain [$lo, $hi)")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val levels = 31 - Integer.numberOfLeadingZeros(bins)
    val nLevels = levels + 1
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val gi = g.toInt
    val width = (hi - lo) / bins
    val params = olhParams(seedSpace)
    val spark0 = df.sparkSession
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpRangeTreeByKey: NULL value for a privacy unit — filter or " +
          "impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val checkedK = when(keyCol.isNull, raise_error(lit(
        "ldpRangeTreeByKey: NULL group key — the key is public " +
          "collector metadata and every report must carry one")).cast("string"))
      .otherwise(keyCol.cast("string"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi - width / 2))
    val pidN = when(col("__pidn").isNull, raise_error(lit(
        "ldpRangeTreeByKey: pid does not cast to BIGINT — group and " +
          "seed derive from it")).cast("long"))
      .otherwise(col("__pidn"))
    // one report per unit across keys: the lowest (key, value) pair — a
    // per-unit MIN over the lexicographic struct, aggregated map-side
    // (r19: was a row_number window)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        checkedK.as("__k"), clamped.as("__val"))
      .groupBy(col("__pidn"))
      .agg(min(struct(col("__k"), col("__val"))).as("__kv"))
      .select(col("__pidn"), col("__kv.__k").as("__k"),
        col("__kv.__val").as("__val"))
      .select(pidN.as("__pid"), col("__k"),
        floor((col("__val") - lit(lo)) / lit(width)).cast("long")
          .as("__bin"))
      .withColumn("__h64", expr(
        "CAST(conv(substr(md5(CAST(__pid AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"))
      .withColumn("__lvl", pmod(col("__h64"), lit(nLevels.toLong))
        .cast("int"))
      .withColumn("__seed",
        pmod(expr(s"__h64 div $nLevels"), lit(seedSpace.toLong)))
      .withColumn("__idx", expr("shiftright(__bin, __lvl)"))
    val report = udf((seed: Long, idx: Long) => {
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    val cells = perUnit
      .select(col("__k"), col("__lvl"), col("__seed"),
        report(col("__seed"), col("__idx")).as("__y"))
      .groupBy(col("__k"), col("__lvl"), col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    val nPerKey = cells.groupBy(col("__k"))
      .agg(sum(col("__c")).as("__nk"))
    val nKeys = nPerKey.count()
    require(nKeys > 0, "ldpRangeTreeByKey: no reporting units")
    val nPerKeyLvl = cells.groupBy(col("__k"), col("__lvl"))
      .agg(sum(col("__c")).as("__nkl"))
    // every OBSERVED key must field all levels (a zero-group level
    // would fabricate an empty subtree for that key); name the keys
    val short = nPerKeyLvl.groupBy(col("__k"))
      .agg(count(lit(1)).as("__nl"))
      .filter(col("__nl") < nLevels.toLong)
      .select(col("__k")).limit(20).collect().map(_.getString(0))
    require(short.isEmpty,
      s"ldpRangeTreeByKey: key(s) ${short.mkString(", ")} have " +
        s"reporting units at fewer than $nLevels dyadic levels — their " +
        "cohorts are too small to field the level split; collect more " +
        "reports, coarsen bins, or merge keys")
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // the GENERATED node universe x each key-level's observed seeds
    val nodes = spark0.range(0, nLevels.toLong).toDF("__lvl")
      .withColumn("__lvl", col("__lvl").cast("int"))
      .join(spark0.range(0, bins.toLong).toDF("__idx"),
        col("__idx") < expr(s"shiftright(${bins.toLong}, __lvl)"))
    val seeds = cells.select(col("__k").as("__sk"),
      col("__lvl").as("__slvl"), col("__seed")).distinct()
    val grid = nodes
      .join(broadcast(seeds.join(paramsDf, "__seed")),
        col("__lvl") === col("__slvl"))
      .withColumn("__h",
        ((col("__a") * col("__idx") + col("__b")) % lit(OlhPrime)) % lit(g))
    val cellsR = cells.select(col("__k").as("__ck"),
      col("__lvl").as("__clvl"), col("__seed").as("__cseed"),
      col("__y"), col("__c"))
    grid.join(broadcast(cellsR),
        col("__sk") === col("__ck") && col("__lvl") === col("__clvl")
          && col("__seed") === col("__cseed") && col("__h") === col("__y"),
        "left")
      .groupBy(col("__sk").as("key"), col("__lvl"), col("__idx"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__sup"))
      .join(broadcast(nPerKeyLvl.withColumnRenamed("__k", "key")),
        Seq("key", "__lvl"))
      .join(broadcast(nPerKey.withColumnRenamed("__k", "key")), Seq("key"))
      .select(col("key"), col("__lvl"), col("__idx"),
        round((col("__sup") - col("__nkl") * lit(invG)) / lit(p - invG) *
          (col("__nk").cast("double") / col("__nkl")), 9).as("dp_count"))
  }

  /** LOCAL-DP 2-D RANGE TREE — the dyadic PRODUCT mechanism under the
    * LOCAL trust model (r18, closing the tree family's last
    * central/local asymmetry: the central tier has
    * [[graft.spark.RangeTree.dpRange2DTree]], the LDP tier stopped at
    * 1-D [[ldpRangeTree]]). The CKS group-split generalizes to LEVEL
    * PAIRS: units md5-split into (levelsX+1)*(levelsY+1) groups, one
    * per product level (lx, ly); group (lx, ly)'s units OLH-report
    * their value pair's PRODUCT-NODE index — the combined
    * (binX >> lx) * nodesY(ly) + (binY >> ly), a domain of
    * nodesX(lx)*nodesY(ly) values, one report per unit so eps-LDP
    * total. The aggregator estimates every product node from its
    * group (debiased support counting, scaled nTotal / n_group) and
    * the released frame IS the product tree
    * ((__lvx, __idxx, __lvy, __idxy, dp_count),
    * (2*binsX-1)*(2*binsY-1) rows) — so the CENTRAL 2-D readout
    * [[graft.spark.RangeTree.range2DQueries]] consumes it unchanged:
    * any axis-aligned box reads <= 2*levelsX * 2*levelsY cover nodes
    * as pure post-processing.
    *
    * Error shape: each group fields n/((levelsX+1)(levelsY+1)) units,
    * so per-node stddev ~ sqrt(n) * (log B)^1 / eps and a box reads
    * O(log^2 B) nodes — the LDP sqrt(n) price doubled up in 2-D,
    * exactly the CKS trade. Values CLAMP into their domains (the
    * tree-family convention); NULL values / non-castable pids fail
    * loud; a level-pair group with NO reporting units fails loud (n
    * too small to field the groups — coarsen bins or collect more).
    * Zero noise: truthful node reports, so every estimate is a
    * deterministic function of exact group counts + hash collisions
    * and the whole product tree replays in SQL (the gate anchor).
    *
    * Scale shape (the [[ldpRangeTree]] discipline): reports collapse
    * FIRST to <= nGroups * seedSpace * g cells; the product-node grid
    * is GENERATED ((2*binsX-1)*(2*binsY-1) x observed per-group seeds,
    * data-size-independent); one aggregation lands the released rows.
    * Nothing data-shaped collects. */
  def ldpRange2DTree(
      df: DataFrame,
      pidCol: String,
      xCol: Column,
      yCol: Column,
      loX: Double, hiX: Double, binsX: Int,
      loY: Double, hiY: Double, binsY: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): DataFrame = {
    def ckBins(b: Int, n: String): Unit = require(
      b >= 2 && (b & (b - 1)) == 0 && b <= 256,
      s"$n must be a power of two in [2, 256] (the group count is " +
        s"(log2 binsX + 1)*(log2 binsY + 1) and every group needs " +
        s"reporting units), got $b")
    ckBins(binsX, "binsX"); ckBins(binsY, "binsY")
    require(loX < hiX, s"empty x domain [$loX, $hiX)")
    require(loY < hiY, s"empty y domain [$loY, $hiY)")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val levelsX = 31 - Integer.numberOfLeadingZeros(binsX)
    val levelsY = 31 - Integer.numberOfLeadingZeros(binsY)
    val nLvlX = levelsX + 1; val nLvlY = levelsY + 1
    val nGroups = nLvlX * nLvlY
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val gi = g.toInt
    val widthX = (hiX - loX) / binsX
    val widthY = (hiY - loY) / binsY
    val params = olhParams(seedSpace)
    val spark0 = df.sparkSession
    def checked(c: Column, n: String) = when(c.isNull, raise_error(lit(
        s"ldpRange2DTree: NULL $n value for a privacy unit — filter or " +
          "impute upstream")).cast("double"))
      .otherwise(c.cast("double"))
    val clampedX = least(greatest(checked(xCol, "x"), lit(loX)),
      lit(hiX - widthX / 2))
    val clampedY = least(greatest(checked(yCol, "y"), lit(loY)),
      lit(hiY - widthY / 2))
    val pidN = when(col("__pidn").isNull, raise_error(lit(
        "ldpRange2DTree: pid does not cast to BIGINT — group and seed " +
          "derive from it")).cast("long"))
      .otherwise(col("__pidn"))
    // one report per unit: the deterministic lowest (x, y) pair — a
    // per-unit MIN over the lexicographic struct, aggregated map-side
    // (r19: was a row_number window)
    val perUnit = df
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        clampedX.as("__x"), clampedY.as("__y0"))
      .groupBy(col("__pidn"))
      .agg(min(struct(col("__x"), col("__y0"))).as("__xy"))
      .select(col("__pidn"), col("__xy.__x").as("__x"),
        col("__xy.__y0").as("__y0"))
      .select(pidN.as("__pid"),
        floor((col("__x") - lit(loX)) / lit(widthX)).cast("long")
          .as("__bx"),
        floor((col("__y0") - lit(loY)) / lit(widthY)).cast("long")
          .as("__by"))
      .withColumn("__h64", expr(
        "CAST(conv(substr(md5(CAST(__pid AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"))
      .withColumn("__grp", pmod(col("__h64"), lit(nGroups.toLong))
        .cast("int"))
      .withColumn("__lvx", (col("__grp") % nLvlX).cast("int"))
      .withColumn("__lvy", (col("__grp") / nLvlX).cast("int"))
      .withColumn("__seed",
        pmod(expr(s"__h64 div $nGroups"), lit(seedSpace.toLong)))
      // the product-node index inside group (lvx, lvy): row-major over
      // (ix, iy) with iy's stride = this group's y-node count
      .withColumn("__idx",
        expr(s"shiftright(__bx, __lvx) * shiftright($binsY, __lvy) " +
          "+ shiftright(__by, __lvy)"))
    val report = udf((seed: Long, idx: Long) => {
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    // reports collapse FIRST: <= nGroups * seedSpace * g cells
    val cells = perUnit
      .select(col("__lvx"), col("__lvy"), col("__seed"),
        report(col("__seed"), col("__idx")).as("__y"))
      .groupBy(col("__lvx"), col("__lvy"), col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // draws final; n, seeds and grid read it
    val nTotal = cells.agg(coalesce(sum(col("__c")), lit(0L)))
      .head().getLong(0)
    require(nTotal > 0, "ldpRange2DTree: no reporting units")
    val nPerGrp = cells.groupBy(col("__lvx"), col("__lvy"))
      .agg(sum(col("__c")).as("__ng"))
    val grpCount = nPerGrp.count()
    require(grpCount == nGroups.toLong,
      s"ldpRange2DTree: only $grpCount of $nGroups level-pair groups " +
        "have reporting units — n too small to field the product " +
        "split; collect more reports or coarsen bins")
    val paramsDf = spark0.createDataFrame(
      spark0.sparkContext.parallelize(
        params.indices.map(s => org.apache.spark.sql.Row(
          s.toLong, params(s)._1, params(s)._2)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__seed",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // the GENERATED product-node universe x each group's observed seeds
    val nodes = spark0.range(0, nLvlX.toLong).toDF("__lvx")
      .withColumn("__lvx", col("__lvx").cast("int"))
      .crossJoin(spark0.range(0, nLvlY.toLong).toDF("__lvy")
        .withColumn("__lvy", col("__lvy").cast("int")))
      .join(spark0.range(0, binsX.toLong).toDF("__idxx"),
        col("__idxx") < expr(s"shiftright(${binsX.toLong}, __lvx)"))
      .join(spark0.range(0, binsY.toLong).toDF("__idxy"),
        col("__idxy") < expr(s"shiftright(${binsY.toLong}, __lvy)"))
      .withColumn("__idx",
        expr(s"__idxx * shiftright($binsY, __lvy) + __idxy"))
    val seeds = cells.select(col("__lvx").as("__slx"),
      col("__lvy").as("__sly"), col("__seed")).distinct()
    val grid = nodes
      .join(broadcast(seeds.join(paramsDf, "__seed")),
        col("__lvx") === col("__slx") && col("__lvy") === col("__sly"))
      .withColumn("__h",
        ((col("__a") * col("__idx") + col("__b")) % lit(OlhPrime)) % lit(g))
    val cellsR = cells.select(col("__lvx").as("__clx"),
      col("__lvy").as("__cly"), col("__seed").as("__cseed"),
      col("__y"), col("__c"))
    grid.join(broadcast(cellsR),
        col("__lvx") === col("__clx") && col("__lvy") === col("__cly")
          && col("__seed") === col("__cseed") && col("__h") === col("__y"),
        "left")
      .groupBy(col("__lvx"), col("__idxx"), col("__lvy"), col("__idxy"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__sup"))
      .join(broadcast(nPerGrp), Seq("__lvx", "__lvy"))
      .select(col("__lvx"), col("__idxx"), col("__lvy"), col("__idxy"),
        round((col("__sup") - col("__ng") * lit(invG)) / lit(p - invG) *
          (lit(nTotal.toDouble) / col("__ng")), 9).as("dp_count"))
  }

  /** LONGITUDINAL LDP frequency — PERMANENT randomized response (the
    * RAPPOR memoization, closing every LDP doc's retry-composition
    * caveat for REPEATED collections): a unit's noisy OLH report for a
    * value is drawn ONCE and MEMOIZED; every later collection where the
    * unit still holds that value REUSES the stored report verbatim.
    * Privacy: the adversary sees an identical output every time, so m
    * collections of an unchanged value cost ONE eps — not m*eps (the
    * naive fold); a unit that CHANGES value draws a fresh report and
    * spends a fresh eps (the longitudinal ledger is per (unit, value)).
    * In a real deployment the memo lives CLIENT-side (RAPPOR's design);
    * in this engine — which holds the raw data and plays the trusted
    * randomizer for the release boundary, like every [[LocalDP]]
    * operator — the memo is the persisted store frame.
    *
    * Store: (__pid, __v, __y, __g) — one row per (unit, value) ever
    * reported; the per-unit seed re-derives from md5(pid), so it is not
    * stored, but the BUCKET COUNT g IS (15th pass, r17): memoized
    * reports are calibration-specific exactly like the continual
    * store's persisted draws, and a mid-stream epsilon change would
    * silently reuse wrong-g buckets — the step requires the store's g
    * to equal this step's (fail-loud; start a new memo to rebudget).
    * The closed-domain contract is enforced for EVERY per-unit value,
    * memoized ones included (a reused report skips the drawing UDF, so
    * the check cannot live only there). The step pins the grown store
    * internally (the release and the returned store MUST read the same
    * draws); callers checkpoint it between steps (the [[olhIngestStep]]
    * convention — parquet round-trips make draws final across restarts,
    * the [[graft.streaming.StreamOps.saveContinualStore]] pattern).
    *
    * Returns (estimate, grownStore): the estimate is this collection's
    * [[olhEstimate]] over the units' memoized reports. Zero noise:
    * memoized reports equal truthful buckets, so EVERY collection's
    * estimate over unchanged values equals the one-shot
    * [[ldpFrequencyOLH]] release (the gate anchor); report REUSE is
    * spec-pinned with a draw-counting source (m collections, distinct
    * (unit, value) draws only). */
  def ldpLongitudinalStep(
      batch: DataFrame,
      store: Option[DataFrame],
      pidCol: String,
      valueCol: Column,
      domain: Seq[String],
      epsilon: Double,
      noise: graft.core.NoiseSource,
      seedSpace: Int = 1024
  ): (DataFrame, DataFrame) = {
    require(domain.nonEmpty && domain.distinct.size == domain.size,
      "ldpLongitudinalStep: domain must be non-empty and duplicate-free")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(seedSpace >= 2 && seedSpace <= 65536,
      s"seedSpace must be in [2, 65536], got $seedSpace")
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val gi = g.toInt
    val domainIdx: Map[String, Int] =
      domain.toArray.zipWithIndex.toMap
    val params = olhParams(seedSpace)
    // closed-domain check HERE, not only in the drawing UDF: a memoized
    // (unit, value) reuses its report without ever reaching the UDF, so
    // a value that left the domain would otherwise silently distort n
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpLongitudinalStep: NULL value for a privacy unit — filter or " +
          "impute upstream")).cast("string"))
      .otherwise(when(!valueCol.cast("string").isin(domain: _*),
        raise_error(concat(lit(
          "ldpLongitudinalStep: value '"), valueCol.cast("string"), lit(
          "' outside the public domain — the domain is closed AND must " +
            "stay fixed across collections (memoized reports are " +
            "domain-specific); extend it or filter upstream")))
          .cast("string"))
        .otherwise(valueCol.cast("string")))
    val seedCol = when(col("__pid").isNull, raise_error(lit(
        "ldpLongitudinalStep: pid does not cast to BIGINT — the public " +
          "hash seed derives from it")).cast("long"))
      .otherwise(pmod(expr(
        "CAST(conv(substr(md5(CAST(__pid AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT)"), lit(seedSpace.toLong)))
    // one value per unit per collection: the deterministic lowest — a
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = batch
      .select(col(pidCol).try_cast("bigint").as("__pid"), checked.as("__v"))
      .groupBy(col("__pid")).agg(min(col("__v")).as("__v"))
      .select(col("__pid"), col("__v"), seedCol.as("__seed"))
    val spark0 = batch.sparkSession
    val st = store.getOrElse(spark0.createDataFrame(
      spark0.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__v",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__y",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.LongType, nullable = false)))))
    // memoized reports are CALIBRATION-specific (the continual-store
    // lesson, enforced not commented): a store drawn at another epsilon's
    // g must not be silently reused — its buckets live in [0, g') and
    // the debias would be meaningless
    store.foreach { s0 =>
      val gs = s0.agg(min(col("__g")), max(col("__g"))).head()
      if (!gs.isNullAt(0))
        require(gs.getLong(0) == g && gs.getLong(1) == g,
          s"ldpLongitudinalStep: the memo store's reports were drawn at " +
            s"g in [${gs.getLong(0)}, ${gs.getLong(1)}] but this step's " +
            s"epsilon gives g = $g — epsilon must stay fixed across a " +
            "longitudinal stream (memoized reports are " +
            "calibration-specific); start a new memo to rebudget")
    }
    val report = udf((seed: Long, v: String) => {
      val idx = domainIdx.getOrElse(v, -1)
      if (idx < 0) throw new IllegalArgumentException(
        s"ldpLongitudinalStep: value '$v' outside the public domain — " +
          "the domain is closed; extend it or filter upstream")
      val (a, b) = params(seed.toInt)
      val h = olhHash(a, b, idx.toLong, g)
      if (noise.uniform() < p) h
      else {
        val j = math.min((noise.uniform() * (gi - 1)).toInt, gi - 2)
        (h + 1 + j) % g
      }
    }).asNondeterministic()
    // memo lookup: units whose (pid, value) already reported REUSE the
    // stored report; only genuinely new pairs draw
    val joined = perUnit.join(st.drop("__g"), Seq("__pid", "__v"), "left")
    val fresh = joined.filter(col("__y").isNull)
      .select(col("__pid"), col("__v"),
        report(col("__seed"), col("__v")).as("__y"), lit(g).as("__g"))
    // pin the GROWN store before anything reads it: the estimate below
    // and the returned store must see the same draws (fresh's UDF is
    // nondeterministic — an unpinned union would re-draw per consumer)
    val grown = st.unionByName(fresh).localCheckpoint(false)
    val current = perUnit.join(grown, Seq("__pid", "__v"))
    val cells = current.groupBy(col("__seed"), col("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // olhEstimate reads the cells three times
    (olhEstimate(cells, domain, epsilon, seedSpace), grown)
  }

  /** The fixed-length hex encoding [[ldpHeavyHitters]]' domain contract
    * asks for: the first `hexLen` chars of md5(value-as-string) —
    * lowercase hex by construction, length-uniform, and identical in
    * Spark SQL and DuckDB (`substr(md5(v), 1, hexLen)`), so the whole
    * e2e walk replays in the oracle. hexLen <= 10 keeps the OLH hash
    * overflow-safe (the [[ldpHeavyHitters]] require). Collision rate:
    * two distinct values share an encoding w.p. 16^-hexLen per pair —
    * at hexLen 8, ~2.3e-10; the reverse lookup surfaces ALL candidates
    * of a hot hash, so collisions widen a row set, never lose one. */
  def hexEncodeValue(value: Column, hexLen: Int): Column = {
    require(hexLen >= 1 && hexLen <= 10,
      s"hexLen must be in [1, 10] (the ldpHeavyHitters hash-overflow " +
        s"contract), got $hexLen")
    substring(md5(value.cast("string")), 1, hexLen)
  }

  /** END-TO-END open-domain heavy hitters (r17, closing the usability
    * loop): [[ldpHeavyHitters]] discovers frequent md5-prefix HASHES —
    * real deployments then need the VALUES. This operator runs the full
    * pipeline: encode each unit's value with [[hexEncodeValue]], walk
    * the prefix tree over the hashes, then REVERSE-LOOK-UP the
    * discovered hot hashes against a PUBLIC candidate table (known
    * URLs, a vocabulary, a product catalog — the aggregator's side
    * knowledge; joining against the private reports themselves would
    * leave the LDP trust model). The lookup is pure post-processing of
    * the DP release against public data — no extra budget. The <= k hot
    * hashes BROADCAST onto the candidates (one scan of the candidate
    * table, nothing data-shaped collects).
    *
    * Output: (value, hash, est_count, support, n_reports, rk) — one row
    * per (hot hash, matching candidate); an encoding collision widens a
    * hash's row set (both candidates surface — est_count is the HASH's
    * total), and a hot hash with NO candidate drops here (a noise-floor
    * artifact or an out-of-catalog value — read the raw
    * [[ldpHeavyHitters]] release to see them). Zero noise: the whole
    * derivation — encoding, both rounds, pruning, lookup — is
    * deterministic and replays in SQL (the gate anchor). */
  def ldpHeavyHittersE2e(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      candidates: DataFrame,
      candidateCol: String,
      hexLen: Int,
      epsilon: Double,
      noise: graft.core.NoiseSource,
      k: Int = 8,
      rounds: Int = 2,
      seedSpace: Int = 1024
  ): DataFrame = {
    val encoded = df.select(col(pidCol).as(pidCol),
      hexEncodeValue(valueCol, hexLen).as("__hv"))
    val hot = ldpHeavyHitters(encoded, pidCol, col("__hv"), hexLen,
        epsilon, noise, k, rounds, seedSpace)
      .withColumnRenamed("value", "hash")
    val cand = candidates
      .select(col(candidateCol).cast("string").as("value")).distinct()
      .withColumn("hash", hexEncodeValue(col("value"), hexLen))
    cand.join(broadcast(hot), "hash")
      .select(col("value"), col("hash"), col("est_count"), col("support"),
        col("n_reports"), col("rk"))
  }

  /** Human-readable release report for [[ldpHeavyHitters]] — the explain
    * convention: the walk shape, per-round group sizes, the per-level
    * candidate cost, and the discovery floor (the OLH estimator stddev a
    * heavy value must clear in EVERY round it is alive). Pure string
    * math — no data access. */
  def explainHeavyHitters(hexLen: Int, epsilon: Double, nUnits: Long,
      k: Int = 8, rounds: Int = 2, seedSpace: Int = 1024): String = {
    require(hexLen >= 1 && rounds >= 1 && hexLen % rounds == 0,
      "rounds must divide hexLen")
    require(nUnits >= rounds, s"need >= $rounds units, got $nUnits")
    require(epsilon > 0, "epsilon must be positive")
    val step = hexLen / rounds
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val nGrp = nUnits / rounds
    val std = math.sqrt(nGrp * invG * (1.0 - invG)) / (p - invG)
    val candPerLevel = k.toLong * (1L << (4 * step))
    s"""LocalDP heavy-hitter discovery (prefix extension over OLH)
       |  walk      : $rounds rounds x $step hex chars; md5-split groups of ~$nGrp units report ONE bucket each (eps = ${f"$epsilon%g"}-LDP total, open domain)
       |  candidates: level 1 = ${1L << (4 * step)} public prefixes, later levels = top-$k x 16^$step = $candPerLevel — never 16^$hexLen
       |  floor     : per-candidate estimator stddev ~ ${f"$std%g"} at g = $g buckets; a heavy value must clear it EVERY round it is alive (small g — low eps — swamps discovery: at eps = 1, g = 3, the floor is ~7x worse)
       |""".stripMargin
  }

  /** The Carter-Wegman modulus: a prime far above any domain index the
    * engine meets, small enough that A * idx never nears 2^63 (idx up to
    * ~9e12 is safe), so the hash replays with plain `%` anywhere. */
  private[graft] val OlhPrime = 999983L

  /** The PUBLIC per-seed hash parameters: (A_s in [1, P), B_s in [0, P))
    * for every seed, drawn from a FIXED seeded generator — public
    * randomness, data-independent, the same table everywhere
    * (java.util.Random's algorithm is specified exactly, so the engine
    * UDF, the candidate grid, the specs, and the oracle-SQL literal
    * VALUES all regenerate it identically). Uniform params are what
    * makes the family universal: collision probability 1/g + O(1/P) for
    * EVERY value pair — a derived/mixed seed map provably is not (see
    * [[ldpFrequencyOLH]]). */
  private[graft] def olhParams(seedSpace: Int): IndexedSeq[(Long, Long)] = {
    val r = new java.util.Random(986543L)
    (0 until seedSpace).map { _ =>
      val a = 1L + (r.nextDouble() * (OlhPrime - 1)).toLong
      val b = (r.nextDouble() * OlhPrime).toLong
      (a, b)
    }
  }

  /** The md5-derived 60-bit public-randomness word for a pid — the
    * portable convention every LDP mechanism derives its seed/group
    * from: the first 15 hex chars of md5(pid-as-decimal-string), parsed
    * base 16. Matches the engine's SQL form
    * `conv(substr(md5(CAST(pid AS STRING)), 1, 15), 16, 10)` and
    * DuckDB's `CONCAT('0x', substr(md5(...), 1, 15))` bit-exactly. */
  private[graft] def md5Word(pid: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(pid.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** [[ldpFrequencyOLH]]'s public per-unit seed: md5Word(pid) mod
    * seedSpace. */
  private[graft] def olhSeedOf(pid: Long, seedSpace: Int): Long =
    java.lang.Math.floorMod(md5Word(pid), seedSpace.toLong)

  /** The PUBLIC OLH hash: H(s, i) = ((A_s * i + B_s) mod P) mod g with
    * (A_s, B_s) from [[olhParams]] — non-negative operands, every
    * intermediate far under 2^63, so the Scala, Column-expression and
    * oracle-SQL forms are the same integer function. */
  private[graft] def olhHash(a: Long, b: Long, idx: Long, g: Long): Long =
    ((a * idx + b) % OlhPrime) % g

  /** Human-readable release report for [[ldpFrequencyOLH]] — the explain
    * convention: encoding, g, the report probabilities, the debias
    * formula, and the per-value estimator stddev at n reports
    * (sqrt(n * (1/g) * (1 - 1/g)) / (p - 1/g) — Wang et al.'s
    * approximate variance 4 e^eps / (e^eps - 1)^2 per report at the
    * optimal g). Pure string math — no data access. */
  def explainFrequencyOLH(k: Long, epsilon: Double, nReports: Long,
      seedSpace: Int = 1024): String = {
    require(k >= 2, s"domain size must be >= 2, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(nReports >= 1, s"nReports must be >= 1, got $nReports")
    val expEps = math.exp(epsilon)
    val g = math.floor(expEps).toLong + 1L
    val p = expEps / (expEps + g - 1)
    val invG = 1.0 / g
    val std = math.sqrt(nReports * invG * (1.0 - invG)) / (p - invG)
    s"""LocalDP frequency release (optimal local hashing)
       |  domain    : $k public values; ONE bucket in [0, $g) per unit (vs $k bits under unary encoding — the large-domain mechanism), public hash seed = md5(pid) mod $seedSpace
       |  randomizer: truthful bucket w.p. p = e^eps/(e^eps + g - 1) = ${f"$p%g"}, else uniform over the other ${g - 1} — likelihood ratio e^${f"$epsilon%g"}, so the report is ${f"$epsilon%g"}-LDP
       |  estimator : est(v) = (C(v) - n/g) / (p - 1/g), unbiased; n = $nReports reports, support q* = 1/g = ${f"$invG%g"}
       |  error     : per-value stddev ~ ${f"$std%g"} (O(1) in the domain size — the OLH trade: constant report size, hash-collision variance)
       |""".stripMargin
  }

  /** Human-readable release report for [[ldpFrequency]] — the engine's
    * explain convention for the LOCAL trust model: states the encoding,
    * the per-bit flip probabilities the randomizer uses, the debias
    * formula, and the estimator stddev at a given report count
    * (sqrt(n p (1 - p)) / (p - q) per value — the planning number: LDP
    * error grows with sqrt(n), so small cohorts cannot read small
    * frequencies). Pure string math — no data access. */
  def explainFrequency(k: Int, epsilon: Double, nReports: Long): String = {
    require(k >= 2, s"domain size must be >= 2, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(nReports >= 1, s"nReports must be >= 1, got $nReports")
    val expHalf = math.exp(epsilon / 2.0)
    val p = expHalf / (expHalf + 1.0)
    val q = 1.0 / (expHalf + 1.0)
    val std = math.sqrt(nReports * p * (1.0 - p)) / (p - q)
    s"""LocalDP frequency release (one-hot unary encoding)
       |  domain    : $k public values, one k-bit report per unit (L0 = 1: the deterministic lowest value)
       |  randomizer: per-bit truthful w.p. p = e^(eps/2)/(e^(eps/2)+1) = ${f"$p%g"}, flipped w.p. q = ${f"$q%g"} — two one-hot vectors differ in 2 bits, so the report is ${f"$epsilon%g"}-LDP (the collector never holds true values)
       |  estimator : est_j = (c_j - n q) / (p - q), unbiased; n = $nReports reports
       |  error     : per-value stddev ~ ${f"$std%g"} (grows with sqrt(n) — the LDP cost; central DP's noise is O(1) in n)
       |""".stripMargin
  }

  /** LOCAL-DP variance — the plug-in moment estimator over TWO 1-bit
    * Duchi mechanisms (r17, completing the LDP moment family next to
    * [[ldpMean]]): each unit's clamped value reports one bit for v
    * (normalized over [lo, hi]) and one INDEPENDENT bit for v^2
    * (normalized over [lo^2, hi^2] — monotone since lo >= 0 is
    * required), each at eps/2, composing to eps-LDP per unit.
    * var = E[v^2] - E[v]^2 as the plug-in combination, clamped into
    * [0, (hi-lo)^2/4] (the population-variance range); the plug-in is
    * biased by the estimators' own variance (O(1/(n eps^2)) — the
    * standard trade, documented not hidden; the spec pins consistency
    * at large n). Zero noise: both bits are signs — deterministic, the
    * whole release replays in SQL (the gate anchor). One unit = one
    * (deterministic lowest clamped) value = two bits. Output: one row
    * (n_reports, est_mean, est_m2, est_variance). */
  def ldpVariance(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): DataFrame = {
    require(lo >= 0 && lo < hi,
      s"ldpVariance needs 0 <= lo < hi (v^2 normalization is monotone " +
        s"only for non-negative domains), got [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val t = (math.exp(epsilon / 2) - 1.0) / (math.exp(epsilon / 2) + 1.0)
    val mid = (lo + hi) / 2.0
    val half = (hi - lo) / 2.0
    val lo2 = lo * lo; val hi2 = hi * hi
    val mid2 = (lo2 + hi2) / 2.0
    val half2 = (hi2 - lo2) / 2.0
    val varCap = (hi - lo) * (hi - lo) / 4.0
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpVariance: NULL value for a privacy unit — filter or impute " +
          "upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi))
    // NULL pids would all land in ONE window partition and silently merge
    // distinct units into a single report (under-counting n, skewing both
    // moments) — fail loud like the OLH family instead.
    val checkedPid = when(col(pidCol).isNull, raise_error(lit(
        "ldpVariance: NULL privacy-unit id — distinct units would merge " +
          "into one report; filter or key upstream")).cast("string"))
      .otherwise(col(pidCol).cast("string"))
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = df
      .select(checkedPid.as("__pid"), clamped.as("__v"))
      .groupBy(col("__pid")).agg(min(col("__v")).as("__v"))
    // two INDEPENDENT eps/2 bits per unit (L1 composition — the
    // ldpFrequency retry caveat applies to each)
    val report = udf((v: Double) => {
      val x1 = (v - mid) / half
      val b1 = if (noise.uniform() < 0.5 + x1 * t / 2.0) 1 else -1
      val x2 = (v * v - mid2) / half2
      val b2 = if (noise.uniform() < 0.5 + x2 * t / 2.0) 1 else -1
      Array(b1, b2)
    }).asNondeterministic()
    perUnit
      .select(report(col("__v")).as("__b"))
      .agg(count(lit(1)).as("n_reports"),
        sum(element_at(col("__b"), 1)).cast("double").as("__s1"),
        sum(element_at(col("__b"), 2)).cast("double").as("__s2"))
      .select(col("n_reports"),
        when(col("n_reports") === 0, raise_error(lit(
            "ldpVariance: zero privacy units — an empty cohort has no " +
              "variance to release")).cast("double"))
          .otherwise(round(least(greatest(
            lit(mid) + (col("__s1") / col("n_reports").cast("double")) /
              lit(t) * lit(half), lit(lo)), lit(hi)), 9)).as("est_mean"),
        round(least(greatest(
          lit(mid2) + (col("__s2") / col("n_reports").cast("double")) /
            lit(t) * lit(half2), lit(lo2)), lit(hi2)), 9).as("est_m2"))
      .withColumn("est_variance", round(least(greatest(
        col("est_m2") - col("est_mean") * col("est_mean"), lit(0.0)),
        lit(varCap)), 9))
  }

  /** AMPLIFICATION BY SHUFFLING — the accounting bridge from this file's
    * LOCAL trust model to the central accountant: when n users each run
    * an eps0-LDP randomizer and an intermediary SHUFFLES the reports
    * before the analyst sees them (discarding which report came from
    * whom), the shuffled collection is (eps, delta)-DP centrally with
    * eps FAR below eps0 — each report hides among the n-1 others. The
    * closed form is Feldman-McMillan-Talwar's clone-reduction bound
    * ("Hiding Among the Clones", FOCS 2021, arXiv:2012.12803 Thm 3.1):
    *
    *   eps = ln(1 + (e^eps0 - 1) * (4 * sqrt(2 ln(4/delta) /
    *           ((e^eps0 + 1) n)) + 4 / n))
    *
    * valid when eps0 <= ln(n / (16 ln(2/delta))) (fail-loud otherwise —
    * outside it the bound simply does not apply; run more users or
    * lower eps0). Pure math, no data access: feed the result to a
    * central accountant (the [[graft.core.BudgetAccountant]] family)
    * exactly like [[graft.spark.RangeTree.treeCompositionEpsilon]]
    * bridges tree releases. The bound is monotone: DECREASING in n
    * (more to hide among), INCREASING in eps0, DECREASING as delta
    * grows — all spec-pinned, plus the amplification guarantee itself
    * (eps < eps0 in the valid regime at realistic n). */
  def shuffleAmplifiedEpsilon(epsilon0: Double, n: Long,
      delta: Double): Double =
    // the closed form lives in core (r17): the BudgetAccountant resolves
    // shuffled releases through graft.core.ShuffleAmplification, and
    // core cannot depend on the spark tier — this is the public face
    graft.core.ShuffleAmplification.amplifiedEpsilon(epsilon0, n, delta)

  /** TIGHT fleet-of-telemetry accounting (r17, the
    * [[graft.spark.RangeTree.treeCompositionEpsilon]] golden pattern for
    * the LDP bridge): `nReleases` repeated shuffled collections — a
    * DAILY OLH telemetry release, say — are each (epsAmp, deltaEach)-DP
    * centrally with epsAmp = [[shuffleAmplifiedEpsilon]](eps0, n,
    * deltaEach); composing them naively costs nReleases * epsAmp, while
    * registering the point as a privacy-loss distribution
    * ([[graft.core.PLD.fromPrivacyParameters]], PESSIMISTIC grid — a
    * certified upper bound) and self-composing gives the advanced-
    * composition-tight total the fleet actually spends. Returns the
    * composed epsilon at `totalDelta` (which must also absorb the
    * nReleases * deltaEach infinity mass — infinite if it cannot). */
  def shuffledFleetEpsilon(
      epsilon0: Double,
      nReports: Long,
      deltaEach: Double,
      nReleases: Int,
      totalDelta: Double,
      h: Double = 1e-3
  ): Double = {
    require(nReleases >= 1, s"nReleases must be >= 1, got $nReleases")
    require(totalDelta > 0 && totalDelta < 1,
      s"totalDelta must be in (0, 1), got $totalDelta")
    val epsAmp = shuffleAmplifiedEpsilon(epsilon0, nReports, deltaEach)
    graft.core.PLD.fromPrivacyParameters(epsAmp, deltaEach, h,
        pessimistic = true)
      .selfCompose(nReleases)
      .epsilonForDelta(totalDelta)
  }

  /** Human-readable shuffle-amplification report — the explain
    * convention: states the trust model, the local and central
    * guarantees, and the amplification factor. Pure string math. */
  def explainShuffle(epsilon0: Double, n: Long, delta: Double): String = {
    val eps = shuffleAmplifiedEpsilon(epsilon0, n, delta)
    s"""Shuffle-model amplification (FMT'21 clone reduction)
       |  trust     : each of $n units randomizes LOCALLY at eps0 = ${f"$epsilon0%g"}-LDP; a shuffler discards report-to-unit linkage before the analyst
       |  central   : the shuffled collection is (${f"$eps%g"}, ${f"$delta%g"})-DP — feed THIS to the central accountant
       |  amplifies : ${f"${epsilon0 / eps}%.1f"}x (grows ~sqrt(n); the shuffler is the trust being spent)
       |""".stripMargin
  }

  /** LOCAL-DP mean estimation — the 1-BIT mechanism (Duchi-Jordan-
    * Wainwright's minimax-rate randomizer, the LDP analogue of the
    * central engine's clamped mean): each unit's value clamps into the
    * PUBLIC [lo, hi], normalizes to x in [-1, 1], and the unit reports
    * ONE BIT b in {-1, +1} with P(b = +1) = 1/2 + x t / 2 where
    * t = (e^eps - 1)/(e^eps + 1) — eps-LDP by direct likelihood-ratio
    * check, and E[b] = x t, so mean(b)/t unbiasedly estimates mean(x)
    * and maps back to value units. Per-unit bound: ONE report (the
    * deterministic lowest clamped value); NULL values fail loud.
    *
    * Zero noise (uniform() = 0.5) reports b = sign(x): deterministic —
    * the released frame replays exactly (the gate convention; the
    * estimator's statistical behavior is spec-pinned under the real
    * randomizer). Output: one row — (n_reports, reported_plus_ones,
    * est_mean) with est_mean in value units, CLAMPED into [lo, hi]
    * (the raw debiased estimate can fall outside the domain under
    * noise; the domain is public, so clamping is free post-processing). */
  def ldpMean(
      df: DataFrame,
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): DataFrame = {
    require(lo < hi, s"empty domain [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val t = (math.exp(epsilon) - 1.0) / (math.exp(epsilon) + 1.0)
    val mid = (lo + hi) / 2.0
    val half = (hi - lo) / 2.0
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpMean: NULL value for a privacy unit — nulls have no " +
          "normalization; filter or impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi))
    // NULL pids collapse into one window partition → distinct units merge
    // into one report; fail loud (the OLH-family convention).
    val checkedPid = when(col(pidCol).isNull, raise_error(lit(
        "ldpMean: NULL privacy-unit id — distinct units would merge " +
          "into one report; filter or key upstream")).cast("string"))
      .otherwise(col(pidCol).cast("string"))
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = df
      .select(checkedPid.as("__pid"), clamped.as("__v"))
      .groupBy(col("__pid")).agg(min(col("__v")).as("__v"))
    // the local randomizer: x normalized, one {-1, +1} report. Marked
    // nondeterministic (the ldpFrequency rationale, incl. the retry
    // composition caveat documented there).
    val report = udf((v: Double) => {
      val x = (v - mid) / half
      val pPlus = 0.5 + x * t / 2.0
      if (noise.uniform() < pPlus) 1 else -1
    }).asNondeterministic()
    perUnit
      .select(report(col("__v")).as("__b"))
      .agg(count(lit(1)).as("n_reports"),
        sum(when(col("__b") === 1, 1L).otherwise(0L))
          .as("reported_plus_ones"),
        sum(col("__b")).cast("double").as("__sb"))
      .select(col("n_reports"), col("reported_plus_ones"),
        // fail-loud on an empty cohort (the engine convention): without
        // the guard the 0/0 division would silently release one row with
        // est_mean = NULL
        when(col("n_reports") === 0, raise_error(lit(
            "ldpMean: zero privacy units — an empty cohort has no mean " +
              "to release; check the input frame")).cast("double"))
          .otherwise(round(least(greatest(
            lit(mid) + (col("__sb") / col("n_reports").cast("double")) /
              lit(t) * lit(half), lit(lo)), lit(hi)), 9)).as("est_mean"))
  }

  /** LONGITUDINAL LDP NUMERIC collection — the [[ldpLongitudinalStep]]
    * permanent-response ledger applied to the Duchi 1-bit mean
    * randomizer (r18, closing the longitudinal tier's
    * frequency-only asymmetry): a unit's noisy sign bit for a (clamped)
    * value is drawn ONCE and MEMOIZED per (unit, value); every later
    * collection where the unit still holds that value REUSES the stored
    * bit verbatim, so m repeated telemetry collections of an unchanged
    * metric cost ONE eps — not m*eps. A unit that changes value draws a
    * fresh bit and spends a fresh eps (the ledger is per (unit, value),
    * RAPPOR's model). The memo lives client-side in a real deployment;
    * here it is the persisted store frame (the [[LocalDP]] trusted-
    * randomizer convention).
    *
    * Store: (__pid, __v, __b, __eps) — one row per (unit, clamped
    * value) ever reported. Memoized bits are CALIBRATION-specific (the
    * [[ldpLongitudinalStep]] g-check convention): the store's eps must
    * equal this step's, and the DOMAIN [lo, hi) must stay fixed across
    * collections (the clamped value is part of the ledger key — a
    * domain change would silently re-key the memo), both fail-loud.
    * The step pins the grown store internally; callers checkpoint it
    * between steps (parquet round-trips make draws final).
    *
    * Returns (estimate, grownStore): the estimate is this collection's
    * [[ldpMean]] release (same schema: n_reports, reported_plus_ones,
    * est_mean) over the units' memoized bits. Zero noise: memoized
    * bits equal deterministic sign bits, so EVERY collection's
    * estimate over unchanged values equals the one-shot [[ldpMean]]
    * release (the gate anchor); bit REUSE is spec-pinned with a
    * draw-counting source. */
  def ldpLongitudinalMeanStep(
      batch: DataFrame,
      store: Option[DataFrame],
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): (DataFrame, DataFrame) = {
    require(lo < hi, s"empty domain [$lo, $hi)")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val t = (math.exp(epsilon) - 1.0) / (math.exp(epsilon) + 1.0)
    val mid = (lo + hi) / 2.0
    val half = (hi - lo) / 2.0
    val spark0 = batch.sparkSession
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpLongitudinalMeanStep: NULL value for a privacy unit — " +
          "filter or impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi))
    val checkedPid = when(col("__pidn").isNull, raise_error(lit(
        "ldpLongitudinalMeanStep: pid does not cast to BIGINT — the " +
          "ledger keys on it")).cast("long"))
      .otherwise(col("__pidn"))
    // one value per unit per collection: the deterministic lowest — a
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = batch
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        clamped.as("__v"))
      .groupBy(col("__pidn")).agg(min(col("__v")).as("__v"))
      .select(checkedPid.as("__pid"), col("__v"))
    val st = store.getOrElse(spark0.createDataFrame(
      spark0.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__v",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__eps",
          org.apache.spark.sql.types.DoubleType, nullable = false)))))
    // memoized bits are calibration-specific: a store drawn at another
    // epsilon has a different flip probability and the debias would be
    // meaningless — fail loud (the ldpLongitudinalStep g-check)
    store.foreach { s0 =>
      val es = s0.agg(min(col("__eps")), max(col("__eps"))).head()
      if (!es.isNullAt(0))
        require(es.getDouble(0) == epsilon && es.getDouble(1) == epsilon,
          s"ldpLongitudinalMeanStep: the memo store's bits were drawn " +
            s"at eps in [${es.getDouble(0)}, ${es.getDouble(1)}] but " +
            s"this step's epsilon is $epsilon — epsilon must stay fixed " +
            "across a longitudinal stream; start a new memo to rebudget")
    }
    val draw = udf((v: Double) => {
      val x = (v - mid) / half
      if (noise.uniform() < 0.5 + x * t / 2.0) 1 else -1
    }).asNondeterministic()
    // ledger lookup: (pid, value) pairs already reported REUSE the
    // stored bit; only genuinely new pairs draw
    val joined = perUnit.join(st.drop("__eps"), Seq("__pid", "__v"), "left")
    val fresh = joined.filter(col("__b").isNull)
      .select(col("__pid"), col("__v"), draw(col("__v")).as("__b"),
        lit(epsilon).as("__eps"))
    // pin the GROWN store before anything reads it (nondeterministic
    // draws: an unpinned union would re-draw per consumer)
    val grown = st.unionByName(fresh).localCheckpoint(false)
    val est = perUnit.join(grown, Seq("__pid", "__v"))
      .agg(count(lit(1)).as("n_reports"),
        sum(when(col("__b") === 1, 1L).otherwise(0L))
          .as("reported_plus_ones"),
        sum(col("__b")).cast("double").as("__sb"))
      .select(col("n_reports"), col("reported_plus_ones"),
        when(col("n_reports") === 0, raise_error(lit(
            "ldpLongitudinalMeanStep: zero privacy units — an empty " +
              "cohort has no mean to release")).cast("double"))
          .otherwise(round(least(greatest(
            lit(mid) + (col("__sb") / col("n_reports").cast("double")) /
              lit(t) * lit(half), lit(lo)), lit(hi)), 9)).as("est_mean"))
    (est, grown)
  }

  /** The VARIANCE arm of the longitudinal numeric ledger — the
    * [[ldpLongitudinalMeanStep]] permanent-response memoization over
    * [[ldpVariance]]'s TWO eps/2 sign bits (first and second moment,
    * L1 composition): both bits for a (unit, value) draw once and are
    * reused while the value is unchanged. Same store conventions
    * (per-(unit, value) ledger, eps + domain fixed across collections,
    * fail-loud), same release schema as [[ldpVariance]]
    * (n_reports, est_mean, est_m2, est_variance); zero noise makes
    * every collection over unchanged values equal the one-shot
    * [[ldpVariance]] release. */
  def ldpLongitudinalVarianceStep(
      batch: DataFrame,
      store: Option[DataFrame],
      pidCol: String,
      valueCol: Column,
      lo: Double,
      hi: Double,
      epsilon: Double,
      noise: graft.core.NoiseSource
  ): (DataFrame, DataFrame) = {
    require(lo >= 0 && lo < hi,
      s"ldpLongitudinalVarianceStep needs 0 <= lo < hi (v^2 " +
        s"normalization is monotone only for non-negative domains), " +
        s"got [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val t = (math.exp(epsilon / 2) - 1.0) / (math.exp(epsilon / 2) + 1.0)
    val mid = (lo + hi) / 2.0
    val half = (hi - lo) / 2.0
    val lo2 = lo * lo; val hi2 = hi * hi
    val mid2 = (lo2 + hi2) / 2.0
    val half2 = (hi2 - lo2) / 2.0
    val varCap = (hi - lo) * (hi - lo) / 4.0
    val spark0 = batch.sparkSession
    val checked = when(valueCol.isNull, raise_error(lit(
        "ldpLongitudinalVarianceStep: NULL value for a privacy unit — " +
          "filter or impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val clamped = least(greatest(checked, lit(lo)), lit(hi))
    val checkedPid = when(col("__pidn").isNull, raise_error(lit(
        "ldpLongitudinalVarianceStep: pid does not cast to BIGINT — " +
          "the ledger keys on it")).cast("long"))
      .otherwise(col("__pidn"))
    // per-unit MIN, aggregated map-side (r19: was a row_number window)
    val perUnit = batch
      .select(col(pidCol).try_cast("bigint").as("__pidn"),
        clamped.as("__v"))
      .groupBy(col("__pidn")).agg(min(col("__v")).as("__v"))
      .select(checkedPid.as("__pid"), col("__v"))
    val st = store.getOrElse(spark0.createDataFrame(
      spark0.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__v",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("__b1",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__b2",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__eps",
          org.apache.spark.sql.types.DoubleType, nullable = false)))))
    store.foreach { s0 =>
      val es = s0.agg(min(col("__eps")), max(col("__eps"))).head()
      if (!es.isNullAt(0))
        require(es.getDouble(0) == epsilon && es.getDouble(1) == epsilon,
          s"ldpLongitudinalVarianceStep: the memo store's bits were " +
            s"drawn at eps in [${es.getDouble(0)}, ${es.getDouble(1)}] " +
            s"but this step's epsilon is $epsilon — epsilon must stay " +
            "fixed across a longitudinal stream; start a new memo")
    }
    val draw = udf((v: Double) => {
      val x1 = (v - mid) / half
      val b1 = if (noise.uniform() < 0.5 + x1 * t / 2.0) 1 else -1
      val x2 = (v * v - mid2) / half2
      val b2 = if (noise.uniform() < 0.5 + x2 * t / 2.0) 1 else -1
      Array(b1, b2)
    }).asNondeterministic()
    val joined = perUnit.join(st.drop("__eps"), Seq("__pid", "__v"), "left")
    val fresh = joined.filter(col("__b1").isNull)
      .withColumn("__bb", draw(col("__v")))
      .select(col("__pid"), col("__v"),
        element_at(col("__bb"), 1).as("__b1"),
        element_at(col("__bb"), 2).as("__b2"), lit(epsilon).as("__eps"))
    val grown = st.unionByName(fresh).localCheckpoint(false)
    val est = perUnit.join(grown, Seq("__pid", "__v"))
      .agg(count(lit(1)).as("n_reports"),
        sum(col("__b1")).cast("double").as("__s1"),
        sum(col("__b2")).cast("double").as("__s2"))
      .select(col("n_reports"),
        when(col("n_reports") === 0, raise_error(lit(
            "ldpLongitudinalVarianceStep: zero privacy units — an " +
              "empty cohort has no variance to release")).cast("double"))
          .otherwise(round(least(greatest(
            lit(mid) + (col("__s1") / col("n_reports").cast("double")) /
              lit(t) * lit(half), lit(lo)), lit(hi)), 9)).as("est_mean"),
        round(least(greatest(
          lit(mid2) + (col("__s2") / col("n_reports").cast("double")) /
            lit(t) * lit(half2), lit(lo2)), lit(hi2)), 9).as("est_m2"))
      .withColumn("est_variance", round(least(greatest(
        col("est_m2") - col("est_mean") * col("est_mean"), lit(0.0)),
        lit(varCap)), 9))
    (est, grown)
  }
}
