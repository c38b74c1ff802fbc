package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-unit-aware DataFrame wrapper — the Spark-native analogue of the
  * reference's `PrivateRDD` (reference: private_spark.py:23-313): transforms
  * preserve the privacy-unit association, aggregations go through the shared
  * [[DPEngine]] so one accountant governs the whole pipeline's budget.
  *
  * {{{
  * val acc = new NaiveBudgetAccountant(1.0, 1e-6)
  * val p = PrivateDataFrame(df, col("user_id"), acc)
  * val counts = p.filter($"value" > 0).count(CountParams(Seq("day" -> $"day"), 3, 1))
  * acc.computeBudgets()
  * counts.dataframe.show()
  * }}}
  */
final case class PrivateDataFrame(
    df: DataFrame,
    privacyUnit: Column,
    accountant: BudgetAccountant,
    noise: NoiseSource = NoiseSource.Secure
) {
  private val PidCol = "__graft_private_pid"
  private lazy val engine = new DPEngine(accountant, noise)

  /** Keyed representation: privacy unit pinned as a column so row-level
    * transforms cannot detach it (reference: private_spark.py:34-66 keeps
    * (pid, value) pairs). */
  private def keyed: DataFrame = df.withColumn(PidCol, privacyUnit)

  /** Privacy-preserving projection: replaces the payload columns, keeps the
    * privacy unit (reference `map`, private_spark.py:42-54). */
  def map(columns: (String, Column)*): PrivateDataFrame = {
    val projected = keyed.select(col(PidCol) +: columns.map { case (n, c) => c.as(n) }: _*)
    PrivateDataFrame(projected, col(PidCol), accountant, noise)
  }

  /** Privacy-preserving explode (reference `flat_map`, private_spark.py:56-66). */
  def flatMap(arrayCol: Column, as: String): PrivateDataFrame = {
    val exploded = keyed.select(col(PidCol), explode(arrayCol).as(as))
    PrivateDataFrame(exploded, col(PidCol), accountant, noise)
  }

  /** Row filters are privacy-safe (they only reduce contributions). */
  def filter(cond: Column): PrivateDataFrame = copy(df = df.filter(cond))

  def count(params: PrivateAggParams): DPResult =
    run(params, Metric.Count, value = None)

  def privacyIdCount(params: PrivateAggParams): DPResult =
    run(params, Metric.PrivacyIdCount, value = None)

  def sum(valueCol: Column, params: PrivateAggParams): DPResult =
    run(params, Metric.Sum, Some(valueCol))

  def mean(valueCol: Column, params: PrivateAggParams): DPResult =
    run(params, Metric.Mean, Some(valueCol))

  def variance(valueCol: Column, params: PrivateAggParams): DPResult =
    run(params, Metric.Variance, Some(valueCol))

  def quantiles(valueCol: Column, percentiles: Seq[Double],
      params: PrivateAggParams): DPResult = {
    val agg = toAggregateParams(params, percentiles.map(Metric.Percentile))
    engine.aggregate(df, agg, DPColumns(privacyUnit, params.partitionKeys, Some(valueCol)),
      params.publicPartitions)
  }

  def selectPartitions(partitionKeys: Seq[(String, Column)],
      maxPartitionsContributed: Int): DPResult =
    engine.selectPartitions(df,
      SelectPartitionsParams(maxPartitionsContributed),
      DPColumns(privacyUnit, partitionKeys, None))

  /** DP SET UNION over an item column (r19; Gopi et al. ICML 2020) —
    * release the union of items this frame's privacy units contribute
    * (vocabulary words, n-grams, URLs). See [[DPEngine.setUnion]]. */
  def setUnion(item: Column, maxItemsPerUnit: Int,
      noiseKind: NoiseKind = NoiseKind.Laplace,
      weighting: SetUnionWeighting = SetUnionWeighting.Constant): DPResult =
    engine.setUnion(df,
      SetUnionParams(maxItemsPerUnit, noiseKind, weighting),
      privacyUnit, item)

  private def run(params: PrivateAggParams, metric: Metric, value: Option[Column]): DPResult =
    engine.aggregate(df, toAggregateParams(params, Seq(metric)),
      DPColumns(privacyUnit, params.partitionKeys, value), params.publicPartitions)

  private def toAggregateParams(p: PrivateAggParams, metrics: Seq[Metric]): AggregateParams =
    AggregateParams(
      metrics = metrics,
      noiseKind = p.noiseKind,
      maxPartitionsContributed = p.maxPartitionsContributed,
      maxContributionsPerPartition = p.maxContributionsPerPartition,
      minValue = p.minValue,
      maxValue = p.maxValue,
      budgetWeight = p.budgetWeight)
}

/** Parameters for one PrivateDataFrame aggregation — the role of the
  * reference's `CountParams`/`SumParams`/... bundles
  * (reference: aggregate_params.py:443-700). */
final case class PrivateAggParams(
    partitionKeys: Seq[(String, Column)],
    maxPartitionsContributed: Int,
    maxContributionsPerPartition: Option[Int] = None,
    minValue: Option[Double] = None,
    maxValue: Option[Double] = None,
    noiseKind: NoiseKind = NoiseKind.Laplace,
    budgetWeight: Double = 1.0,
    publicPartitions: Option[DataFrame] = None
)
