package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Roles for a multi-value aggregation: several value columns aggregated for
  * the same privacy unit / partition key in ONE pass (reference:
  * data_extractors.py:34-44 MultiValueDataExtractors — extractor lambdas
  * become named Column expressions). */
final case class MultiValueColumns(
    privacyUnit: Column,
    partitionKeys: Seq[(String, Column)],
    values: Seq[(String, Column)]
) {
  require(values.nonEmpty, "at least one value column is required")
}

/** Per-column contribution bounds: the per-partition sum of the column is
  * clipped to [minSumPerPartition, maxSumPerPartition] (the reference's
  * multi-column mode, analysis/data_structures.py:74-94). */
final case class ValueColumnBounds(
    name: String,
    minSumPerPartition: Double,
    maxSumPerPartition: Double
) {
  require(minSumPerPartition <= maxSumPerPartition,
    s"minSumPerPartition must be <= maxSumPerPartition for $name")
}

/** Parameters of a multi-value DP SUM aggregation. */
final case class MultiValueSumParams(
    columnBounds: Seq[ValueColumnBounds],
    maxPartitionsContributed: Int,
    noiseKind: NoiseKind = NoiseKind.Laplace,
    budgetWeight: Double = 1.0,
    partitionSelectionStrategy: PartitionSelectionStrategyKind =
      PartitionSelectionStrategyKind.TruncatedGeometric,
    preThreshold: Option[Int] = None
) {
  require(columnBounds.nonEmpty, "columnBounds must not be empty")
  require(maxPartitionsContributed >= 1, "maxPartitionsContributed must be >= 1")
  require(columnBounds.map(_.name).distinct.size == columnBounds.size,
    "value column names must be unique")
}

/** N DP sums over N value columns in one pass — one shuffle chain, one noise
  * mechanism per column, each with its own sensitivity, all under one
  * accountant. The plan is the single-value DP sum plan with the accumulator
  * block widened to N native `sum(clip(...))` columns:
  *
  * {{{
  * select(pid, pk..., v1..vk)            -- narrow projection, codegen
  *   [left_semi join public partitions]
  *   groupBy(pid, pk): clip(sum(v_i))    -- shuffle 1, map-side combine
  *   window rn over pid, rn <= L0        -- shuffle 2 (L0 bounding)
  *   groupBy(pk): sum each column        -- shuffle 3, map-side combine
  *   [outer join empty public partitions]
  *   [selection filter]                  -- per surviving partition key only
  *   per-column noise                    -- k scalar UDF calls on final rows
  * }}}
  */
object MultiValueSum {

  import DPEngine._

  def aggregate(
      engine: DPEngine,
      df: DataFrame,
      params: MultiValueSumParams,
      columns: MultiValueColumns,
      publicPartitions: Option[DataFrame] = None
  ): DPResult = {
    require(params.columnBounds.map(_.name) == columns.values.map(_._1),
      "columnBounds and value columns must align by name")
    val accountant = engine.accountant
    accountant.registerAggregation()
    val handles = params.columnBounds.map { c =>
      accountant.requestBudget(params.noiseKind.mechanismType,
        weight = params.budgetWeight, name = s"sum_${c.name}")
    }
    val selectionHandle =
      if (publicPartitions.isEmpty)
        Some(accountant.requestBudget(MechanismType.PartitionSelection,
          weight = params.budgetWeight, name = "PartitionSelection"))
      else None

    new DPResult(() => {
      val noise = engine.noise
      val pkNames = columns.partitionKeys.map(_._1)
      val pkCols = pkNames.map(col)
      val valAliases = columns.values.map { case (n, c) => c.cast("double").as(s"__mv_$n") }

      var cur = df.select(
        (columns.privacyUnit.as(PidCol) +:
          columns.partitionKeys.map { case (n, c) => c.as(n) }) ++ valAliases: _*)
      publicPartitions.foreach { pub => cur = cur.join(pub, pkNames, "left_semi") }

      // per-(pid, pk): sum each column, clip to its per-partition bounds
      val perPidPk = cur
        .groupBy((col(PidCol) +: pkCols): _*)
        .agg(count(lit(1)).as(CntCol),
          params.columnBounds.map { c =>
            least(greatest(sum(col(s"__mv_${c.name}")), lit(c.minSumPerPartition)),
              lit(c.maxSumPerPartition)).as(s"__mv_${c.name}")
          }: _*)

      // L0 bounding: keep <= maxPartitionsContributed partitions per unit
      val bounded = sampleRowsPerKey(perPidPk, Seq(PidCol), params.maxPartitionsContributed)

      var agg = bounded
        .groupBy(pkCols: _*)
        .agg(count(lit(1)).as(PidCntCol),
          params.columnBounds.map(c =>
            sum(col(s"__mv_${c.name}")).as(s"__mv_${c.name}")): _*)

      publicPartitions.foreach { pub =>
        agg = pub.distinct().join(agg, pkNames, "left_outer").select(
          pkCols ++ (coalesce(col(PidCntCol), lit(0L)).as(PidCntCol) +:
            params.columnBounds.map(c =>
              coalesce(col(s"__mv_${c.name}"), lit(0.0)).as(s"__mv_${c.name}"))): _*)
      }

      selectionHandle.foreach { h =>
        val spec = h.spec
        val sel = PartitionSelection.create(params.partitionSelectionStrategy,
          spec.epsilon, spec.delta, params.maxPartitionsContributed, params.preThreshold)
        val keepUdf = udf((n: Long) => sel.shouldKeep(n, noise)).asNondeterministic()
        agg = agg.filter(keepUdf(col(PidCntCol)))
      }

      val noisedCols = params.columnBounds.zip(handles).map { case (c, h) =>
        val linf = math.max(math.abs(c.minSumPerPartition), math.abs(c.maxSumPerPartition))
        val sens = Sensitivities(l0 = Some(params.maxPartitionsContributed), linf = Some(linf))
        val mech = Mechanisms.createAdditive(h.spec, sens)
        val noiseUdf = udf((v: Double) => mech.addNoise(v, noise)).asNondeterministic()
        noiseUdf(col(s"__mv_${c.name}")).as(s"${c.name}_sum")
      }
      agg.select(pkCols ++ noisedCols: _*)
    })
  }
}
