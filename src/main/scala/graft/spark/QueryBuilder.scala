package graft.spark

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** Fluent DP query API over DataFrames, mirroring the reference's
  * `QueryBuilder`/`Query` surface (reference: pipeline_dp/dataframes.py:268-499)
  * with the same validation quirks:
  *  - `groupby` may be called exactly once, before any aggregation;
  *  - all value aggregations must target the same input column;
  *  - each metric may appear at most once.
  *
  * Example (the reference's own demo query,
  * reference: examples/restaurant_visits/run_on_dataframes.py:75-84):
  * {{{
  * new QueryBuilder(df, "visitor_id")
  *   .groupby(Seq("day"), maxGroupsContributed = 3, maxContributionsPerGroup = 1)
  *   .count()
  *   .sum("spent_money", minValue = 0, maxValue = 100)
  *   .mean("spent_money")
  *   .buildQuery()
  *   .runQuery(Budget(1.0, 1e-10), NoiseKind.Gaussian)
  * }}}
  */
final class QueryBuilder(df: DataFrame, privacyUnitColumn: String) {
  require(df.columns.contains(privacyUnitColumn),
    s"Column '$privacyUnitColumn' is not present in the DataFrame")

  private case class AggSpec(metric: Metric, inputColumn: Option[String],
      outputColumn: Option[String], minValue: Option[Double] = None,
      maxValue: Option[Double] = None)

  private var by: Seq[String] = null
  private var maxGroups: Int = 0
  private var maxPerGroup: Int = 0
  private var publicKeys: Option[DataFrame] = None
  private val specs = ArrayBuffer.empty[AggSpec]

  def groupby(
      partitionKeys: Seq[String],
      maxGroupsContributed: Int,
      maxContributionsPerGroup: Int,
      publicKeys: Option[DataFrame] = None
  ): QueryBuilder = {
    require(by == null, "groupby can be called only once")
    partitionKeys.foreach(c => require(df.columns.contains(c),
      s"Column '$c' is not present in the DataFrame"))
    require(!partitionKeys.contains(privacyUnitColumn),
      "partition key cannot be the privacy unit column")
    this.by = partitionKeys
    this.maxGroups = maxGroupsContributed
    this.maxPerGroup = maxContributionsPerGroup
    this.publicKeys = publicKeys
    this
  }

  def groupby(partitionKey: String, maxGroupsContributed: Int,
      maxContributionsPerGroup: Int): QueryBuilder =
    groupby(Seq(partitionKey), maxGroupsContributed, maxContributionsPerGroup, None)

  private def add(spec: AggSpec): QueryBuilder = {
    require(by != null, "Aggregations can be added only after groupby")
    require(!specs.exists(_.metric == spec.metric),
      s"${spec.metric.name} can be counted only once")
    spec.inputColumn.foreach(c => require(df.columns.contains(c),
      s"Column '$c' is not present in the DataFrame"))
    specs += spec
    this
  }

  def count(name: String = null): QueryBuilder =
    add(AggSpec(Metric.Count, None, Option(name)))

  def privacyIdCount(name: String = null): QueryBuilder =
    add(AggSpec(Metric.PrivacyIdCount, None, Option(name)))

  def sum(column: String, minValue: Double, maxValue: Double,
      name: String = null): QueryBuilder =
    add(AggSpec(Metric.Sum, Some(column), Option(name), Some(minValue), Some(maxValue)))

  def mean(column: String, minValue: Double = Double.NaN, maxValue: Double = Double.NaN,
      name: String = null): QueryBuilder =
    add(AggSpec(Metric.Mean, Some(column), Option(name),
      if (minValue.isNaN) None else Some(minValue),
      if (maxValue.isNaN) None else Some(maxValue)))

  def variance(column: String, minValue: Double = Double.NaN, maxValue: Double = Double.NaN,
      name: String = null): QueryBuilder =
    add(AggSpec(Metric.Variance, Some(column), Option(name),
      if (minValue.isNaN) None else Some(minValue),
      if (maxValue.isNaN) None else Some(maxValue)))

  def buildQuery(): DPQuery = {
    require(by != null, "Query must have at least one groupby")
    require(specs.nonEmpty, "Query must have at least one aggregation")
    val inputCols = specs.flatMap(_.inputColumn).distinct
    require(inputCols.size <= 1,
      s"Aggregation of only one column is supported, requested: $inputCols")
    val caps = specs.filter(s => s.minValue.isDefined || s.maxValue.isDefined)
      .map(s => (s.minValue, s.maxValue)).distinct
    require(caps.size <= 1, "All aggregations must use the same [min, max] caps")
    caps.headOption.foreach { case (lo, hi) =>
      require(lo.isDefined && hi.isDefined,
        "minValue and maxValue must BOTH be set on a capped aggregation " +
          s"(got minValue=$lo, maxValue=$hi)") // was a bare None.get crash
    }
    new DPQuery(df, privacyUnitColumn, by, inputCols.headOption,
      specs.map(s => (s.metric, s.outputColumn.getOrElse(s.metric.name))).toSeq,
      caps.headOption.map(_._1.get), caps.headOption.map(_._2.get),
      maxGroups, maxPerGroup, publicKeys)
  }
}

/** A built (validated) DP query; `runQuery` resolves budgets and executes
  * (reference: dataframes.py:143-248). */
final class DPQuery private[spark] (
    df: DataFrame,
    privacyUnitColumn: String,
    by: Seq[String],
    inputColumn: Option[String],
    metricsOutput: Seq[(Metric, String)],
    minValue: Option[Double],
    maxValue: Option[Double],
    maxGroupsContributed: Int,
    maxContributionsPerGroup: Int,
    publicKeys: Option[DataFrame]
) {
  def runQuery(
      budget: Budget,
      noiseKind: NoiseKind = NoiseKind.Laplace,
      noise: NoiseSource = NoiseSource.Secure
  ): DataFrame = {
    // reject output-name collisions BEFORE running: the rename fold below
    // would otherwise emit a frame with two identical column names
    // (count(name = "sum") next to a sum metric, or two metrics renamed
    // to one name) — an AMBIGUOUS_REFERENCE ambush for the first
    // downstream select, or silent duplicate fields in parquet
    val outNames = (by ++ metricsOutput.map(_._2)).toSeq
    require(outNames.distinct.size == outNames.size,
      s"duplicate output column names: " +
        outNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
          .mkString(", "))
    val params = AggregateParams(
      metrics = metricsOutput.map(_._1),
      noiseKind = noiseKind,
      maxPartitionsContributed = maxGroupsContributed,
      maxContributionsPerPartition = Some(maxContributionsPerGroup),
      minValue = minValue,
      maxValue = maxValue)
    val accountant = new NaiveBudgetAccountant(budget.epsilon, budget.delta)
    val engine = new DPEngine(accountant, noise)
    val columns = DPColumns(col(privacyUnitColumn),
      by.map(n => n -> col(n)), inputColumn.map(col))
    val result = engine.aggregate(df, params, columns, publicKeys)
    accountant.computeBudgets()
    // one aliasing select instead of a rename fold: withColumnRenamed
    // renames EVERY column matching the name, so a fold would corrupt the
    // cross-rename case — count(name = "sum") + sum(name = "total") has
    // distinct FINAL names (passes the duplicate guard above) but the
    // intermediate frame holds two "sum" columns and the next fold step
    // renames BOTH to "total"
    result.dataframe.select(
      by.map(col) ++ metricsOutput.map { case (m, out) => col(m.name).as(out) }: _*)
  }
}
