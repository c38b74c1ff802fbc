package graft

import graft.core._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry exercises one operator from SURVEY.md §2; entries
  * with an `oracleSql` counterpart are verified against DuckDB on the same
  * parquet. DP queries run with [[graft.core.NoiseSource.Zero]] and budgets
  * so generous that bounding drops nothing — the reference's own e2e
  * verification technique (reference: tests/dp_engine_test.py:1128-1157),
  * made exact. All arithmetic that feeds an oracle is integer-valued in
  * doubles, so Spark's and DuckDB's summation orders cannot diverge.
  */
object SparkEntry {

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by default;
    * read it as raw nanos (LongType) and convert explicitly where needed. */
  private def events(s: SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  /** ts (nanos since epoch) -> 'yyyy-MM-dd' in UTC. */
  private val tsDay = expr("date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd')")

  /** Zero-noise engine with a huge budget: DP plumbing, exact results. */
  private def zeroEngine() =
    new DPEngine(new NaiveBudgetAccountant(1e5, 0.999999), NoiseSource.Zero)

  private def eventRoles = DPColumns(
    col("user_id"), Seq("event_type" -> col("event_type")), Some(floor(col("value"))))

  /** Generous bounds: nothing sampled away at sf<=0.1 (max 29 rows per
    * (user, type), max 5 types per user). */
  private val generous = (metrics: Seq[Metric], minV: Double, maxV: Double) =>
    AggregateParams(
      metrics = metrics,
      noiseKind = NoiseKind.Laplace,
      maxPartitionsContributed = 5,
      maxContributionsPerPartition = Some(100),
      minValue = Some(minV), maxValue = Some(maxV))

  private def runZero(df: DataFrame, params: AggregateParams, roles: DPColumns,
      pub: Option[DataFrame] = None): DataFrame = {
    val engine = zeroEngine()
    val res = engine.aggregate(df, params, roles, pub)
    engine.accountant.computeBudgets()
    res.dataframe
  }

  /** Flagship query on /root/testdata/sf0.001 — the reference's demo shape
    * (groupby + count + sum + mean) with REAL Gaussian noise.
    * (reference: examples/restaurant_visits/run_on_dataframes.py:75-84) */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val publicTypes = Seq("click", "error", "purchase", "signup", "view").toDF("event_type")
    new QueryBuilder(events(spark, "/root/testdata/sf0.001"), "user_id")
      .groupby(Seq("event_type"), maxGroupsContributed = 5, maxContributionsPerGroup = 20,
        publicKeys = Some(publicTypes))
      .count()
      .sum("value", minValue = 0, maxValue = 500)
      .mean("value")
      .buildQuery()
      .runQuery(Budget(1.0, 1e-6), NoiseKind.Gaussian)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.C DP aggregations (zero noise => exact; see scaladoc above) ----
    "dp_count" -> ((s, dir) => {
      runZero(events(s, dir),
        AggregateParams(metrics = Seq(Metric.Count), maxPartitionsContributed = 5,
          maxContributionsPerPartition = Some(100)),
        DPColumns(col("user_id"), Seq("event_type" -> col("event_type")), None))
    }),
    "dp_privacy_id_count" -> ((s, dir) => {
      runZero(events(s, dir),
        AggregateParams(metrics = Seq(Metric.PrivacyIdCount), maxPartitionsContributed = 5),
        DPColumns(col("user_id"), Seq("event_type" -> col("event_type")), None))
    }),
    "dp_sum" -> ((s, dir) => {
      // clip to [10, 100] — the clip binds, and is mirrored in the oracle
      runZero(events(s, dir), generous(Seq(Metric.Sum), 10, 100), eventRoles)
    }),
    "dp_mean" -> ((s, dir) => {
      runZero(events(s, dir), generous(Seq(Metric.Mean), 10, 100), eventRoles)
    }),
    "dp_mean_count_sum" -> ((s, dir) => {
      runZero(events(s, dir),
        generous(Seq(Metric.Mean, Metric.Count, Metric.Sum), 10, 100), eventRoles)
    }),
    "dp_variance" -> ((s, dir) => {
      runZero(events(s, dir),
        generous(Seq(Metric.Variance, Metric.Mean, Metric.Count, Metric.Sum), 10, 100),
        eventRoles)
    }),
    "dp_sum_per_partition" -> ((s, dir) => {
      // per-partition bounding mode: sum per (user, type) clipped to [0, 500]
      runZero(events(s, dir),
        AggregateParams(metrics = Seq(Metric.Sum), maxPartitionsContributed = 5,
          minSumPerPartition = Some(0.0), maxSumPerPartition = Some(500.0)),
        eventRoles)
    }),
    "dp_public_partitions" -> ((s, dir) => {
      import s.implicits._
      val pub = Seq("click", "error", "purchase", "ghost_type").toDF("event_type")
      runZero(events(s, dir), generous(Seq(Metric.Count, Metric.Sum), 0, 1000),
        eventRoles, Some(pub))
    }),
    "dp_multi_key" -> ((s, dir) => {
      // multi-column partition key: (event_type, day)
      val df = events(s, dir).withColumn("day", tsDay)
      runZero(df,
        AggregateParams(metrics = Seq(Metric.Count, Metric.PrivacyIdCount),
          maxPartitionsContributed = 200, maxContributionsPerPartition = Some(100)),
        DPColumns(col("user_id"),
          Seq("event_type" -> col("event_type"), "day" -> col("day")), None))
    }),
    "dp_select_partitions" -> ((s, dir) => {
      val engine = zeroEngine()
      val res = engine.selectPartitions(events(s, dir),
        SelectPartitionsParams(maxPartitionsContributed = 5),
        DPColumns(col("user_id"), Seq("event_type" -> col("event_type"))))
      engine.accountant.computeBudgets()
      res.dataframe
    }),
    "dp_vector_sum" -> ((s, dir) => {
      // elementwise sum of embeddings per label, privacy unit = vec_id.
      // embeddings quantized to multiples of 1/1024 so double sums are exact
      // in any addition order (oracle parity).
      val df = s.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("emb", expr("transform(embedding, e -> floor(CAST(e AS DOUBLE) * 1024) / 1024)"))
      val out = runZero(df,
        AggregateParams(metrics = Seq(Metric.VectorSum),
          maxPartitionsContributed = 1,
          vectorNormKind = NormKind.Linf, vectorMaxNorm = 1e6, vectorSize = 64),
        DPColumns(col("vec_id"), Seq("label" -> col("label")), Some(col("emb"))))
      out.select(col("label"), posexplode(col("vector_sum")).as(Seq("idx", "coord_sum")))
        .select(col("label"), col("idx").cast("long").as("idx"), col("coord_sum"))
    }),
    "dp_percentile" -> ((s, dir) => {
      // DP quantile tree: no SQL-expressible oracle (tree-interpolated values);
      // accuracy is covered by VectorQuantileSpec. Rows-only check here.
      runZero(events(s, dir),
        AggregateParams(
          metrics = Seq(Metric.Percentile(10), Metric.Percentile(50), Metric.Percentile(90)),
          maxPartitionsContributed = 5, maxContributionsPerPartition = Some(100),
          minValue = Some(0.0), maxValue = Some(500.0)),
        eventRoles)
    }),
    "dp_add_noise" -> ((s, dir) => {
      // noise-only path on pre-aggregated data; zero noise => identity
      val pre = events(s, dir).groupBy("event_type")
        .agg(sum(floor(col("value"))).cast("double").as("total"))
      val engine = zeroEngine()
      val res = engine.addDpNoise(pre,
        AddDpNoiseParams(NoiseKind.Laplace, l0Sensitivity = Some(1),
          linfSensitivity = Some(1000.0)), Seq("total"))
      engine.accountant.computeBudgets()
      res.dataframe
    })
  )

  /** DuckDB-equivalent SQL for each query (same parquet tables, table names
    * without path — driver mounts them). Column names and arithmetic shape
    * mirror the Spark plans exactly (see scaladoc above). */
  def oracleSql: Map[String, String] = {
    val x = "least(greatest(floor(value), 10.0), 100.0)" // clipped value
    Map(
      "dp_count" ->
        "SELECT event_type, CAST(count(*) AS DOUBLE) AS count FROM events GROUP BY event_type",
      "dp_privacy_id_count" ->
        "SELECT event_type, CAST(count(DISTINCT user_id) AS DOUBLE) AS privacy_id_count FROM events GROUP BY event_type",
      "dp_sum" ->
        s"SELECT event_type, sum($x) AS sum FROM events GROUP BY event_type",
      "dp_mean" ->
        s"SELECT event_type, 55.0 + sum($x - 55.0) / count(*) AS mean FROM events GROUP BY event_type",
      "dp_mean_count_sum" ->
        s"""SELECT event_type,
              55.0 + sum($x - 55.0) / count(*) AS mean,
              CAST(count(*) AS DOUBLE) AS count,
              (55.0 + sum($x - 55.0) / count(*)) * count(*) AS sum
            FROM events GROUP BY event_type""",
      "dp_variance" ->
        s"""SELECT event_type,
              sum(($x - 55.0) * ($x - 55.0)) / count(*)
                - pow(sum($x - 55.0) / count(*), 2) AS variance,
              55.0 + sum($x - 55.0) / count(*) AS mean,
              CAST(count(*) AS DOUBLE) AS count,
              (55.0 + sum($x - 55.0) / count(*)) * count(*) AS sum
            FROM events GROUP BY event_type""",
      "dp_sum_per_partition" ->
        """SELECT event_type, sum(s) AS sum FROM (
             SELECT user_id, event_type,
                    least(greatest(sum(floor(value)), 0.0), 500.0) AS s
             FROM events GROUP BY user_id, event_type
           ) GROUP BY event_type""",
      "dp_public_partitions" ->
        """SELECT p.event_type,
              CAST(coalesce(count(e.user_id), 0) AS DOUBLE) AS count,
              coalesce(sum(least(greatest(floor(e.value), 0.0), 1000.0)), 0.0) AS sum
           FROM (VALUES ('click'), ('error'), ('purchase'), ('ghost_type')) AS p(event_type)
           LEFT JOIN events e ON e.event_type = p.event_type
           GROUP BY p.event_type""",
      "dp_multi_key" ->
        """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
              CAST(count(*) AS DOUBLE) AS count,
              CAST(count(DISTINCT user_id) AS DOUBLE) AS privacy_id_count
           FROM events GROUP BY 1, 2""",
      "dp_select_partitions" ->
        "SELECT DISTINCT event_type FROM events",
      "dp_vector_sum" ->
        """SELECT label,
              CAST(gs - 1 AS BIGINT) AS idx,
              sum(floor(CAST(e AS DOUBLE) * 1024) / 1024) AS coord_sum
           FROM (SELECT label, unnest(embedding) AS e,
                        generate_subscripts(embedding, 1) AS gs
                 FROM embeddings)
           GROUP BY label, gs""",
      "dp_add_noise" ->
        "SELECT event_type, CAST(sum(floor(value)) AS DOUBLE) AS total FROM events GROUP BY event_type"
    )
  }
}
