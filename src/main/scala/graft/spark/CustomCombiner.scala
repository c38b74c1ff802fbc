package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-extensible DP aggregation (reference: combiners.py:110-161
  * CustomCombiner — the experimental extension point re-expressed as Column
  * expressions so user logic stays inside whole-stage codegen).
  *
  * Lifecycle:
  *  1. [[requestBudget]] runs driver-side at plan-construction time; store
  *     the returned handles in fields (they serialize with `this`).
  *  2. [[createAccumulators]] produce native aggregate expressions evaluated
  *     per (privacy unit, partition) group — implement contribution clipping
  *     here if the metric needs it.
  *  3. [[mergeAccumulators]] merge those per partition key.
  *  4. [[computeMetrics]] turn the merged accumulators into the final DP
  *     output columns; runs after budgets resolve, so resolved specs can be
  *     read from the stored handles. This is where noise must be added —
  *     an incorrect implementation breaks the DP guarantee, exactly as the
  *     reference warns.
  */
trait CustomCombiner extends Serializable {
  def name: String
  def requestBudget(accountant: BudgetAccountant): Unit
  def createAccumulators(value: Column): Seq[Column]
  def mergeAccumulators(accs: Seq[Column]): Seq[Column]
  def computeMetrics(accs: Seq[Column], noise: NoiseSource): Seq[Column]
  def metricNames: Seq[String]
  /** One line for the explain report, available after budget resolution. */
  def explainBudget: String
}

/** Contribution-bounding parameters for a custom aggregation. */
final case class CustomAggParams(
    maxPartitionsContributed: Int,
    maxContributionsPerPartition: Option[Int] = None,
    budgetWeight: Double = 1.0,
    partitionSelectionStrategy: PartitionSelectionStrategyKind =
      PartitionSelectionStrategyKind.TruncatedGeometric,
    preThreshold: Option[Int] = None
) {
  require(maxPartitionsContributed >= 1, "maxPartitionsContributed must be >= 1")
  // Some(0) would silently sample EVERY row away (rn <= 0 keeps nothing)
  // and release an empty result with no error — the AggregateParams rule
  maxContributionsPerPartition.foreach(c => require(c >= 1,
    s"maxContributionsPerPartition must be >= 1 when set, got $c"))
}

/** Example user combiner: DP sum of squares with per-contribution square
  * clipping — each contribution adds at most `maxSquare`, the engine's Linf
  * sampling bounds contributions per partition, so the L1 sensitivity is
  * l0 * contributionsPerPartition * maxSquare. */
final class SquareSumCombiner(
    maxSquare: Double, l0: Int, contributionsPerPartition: Int) extends CustomCombiner {
  def name: String = "square_sum"
  private var handle: BudgetHandle = _
  def requestBudget(accountant: BudgetAccountant): Unit =
    handle = accountant.requestBudget(MechanismType.Laplace, name = name)
  def createAccumulators(value: Column): Seq[Column] =
    Seq(sum(least(value * value, lit(maxSquare))))
  def mergeAccumulators(accs: Seq[Column]): Seq[Column] = Seq(sum(accs.head))
  def computeMetrics(accs: Seq[Column], noise: NoiseSource): Seq[Column] = {
    val mech = Mechanisms.createAdditive(handle.spec,
      Sensitivities(l0 = Some(l0), linf = Some(maxSquare * contributionsPerPartition)))
    val noiseUdf = udf((v: Double) => mech.addNoise(v, noise)).asNondeterministic()
    Seq(noiseUdf(accs.head))
  }
  def metricNames: Seq[String] = Seq("square_sum")
  def explainBudget: String = {
    val s = handle.spec
    f"$name: Laplace eps=${s.epsilon}%.4g"
  }
}

object CustomAggregation {
  import DPEngine._

  /** Runs a [[CustomCombiner]] through the engine's standard bounding +
    * selection plan: Linf/L0 sampling, per-unit accumulators, per-partition
    * merge, DP partition selection, then the combiner's metric columns.
    * Public partitions are dropped via semi-join (missing keys are not
    * added — custom accumulators have no generic empty value). */
  def aggregate(
      engine: DPEngine,
      df: DataFrame,
      params: CustomAggParams,
      columns: DPColumns,
      combiner: CustomCombiner,
      publicPartitions: Option[DataFrame] = None
  ): DPResult = {
    // the DPEngine.assemble collision contract: combiner metric columns are
    // emitted next to the pk columns by name
    locally {
      val badPk = columns.partitionKeys.map(_._1).filter(n =>
        combiner.metricNames.contains(n) ||
          n.startsWith("__graft_") || n.startsWith("__cc_"))
      require(badPk.isEmpty,
        s"partition key name(s) ${badPk.mkString(", ")} collide with the " +
          s"combiner's metric columns (${combiner.metricNames.mkString(", ")}) " +
          "or the engine's reserved namespaces; rename the key columns")
    }
    val accountant = engine.accountant
    accountant.registerAggregation()
    combiner.requestBudget(accountant)
    val selectionHandle =
      if (publicPartitions.isEmpty)
        Some(accountant.requestBudget(MechanismType.PartitionSelection,
          weight = params.budgetWeight, name = s"${combiner.name}:PartitionSelection"))
      else None

    new DPResult(() => {
      val noise = engine.noise
      val pkNames = columns.partitionKeys.map(_._1)
      val pkCols = pkNames.map(col)
      // the DPEngine.assemble noNull contract, extended to the custom
      // path: a NULL value otherwise flows into user accumulators where
      // least/greatest skip nulls (SquareSumCombiner would fabricate a
      // full maxSquare contribution per NULL row) and an all-NULL
      // partition would release an un-noised NULL metric
      val guarded = columns.value.map(v =>
        when(v.isNull, raise_error(lit(
          "CustomAggregation: NULL value for a privacy unit — nulls have " +
            "no clipping semantics and would corrupt or leak through the " +
            "custom accumulators; filter or impute upstream")).cast("double"))
          .otherwise(v.cast("double")))
      var cur = df.select(
        (columns.privacyUnit.as(PidCol) +:
          columns.partitionKeys.map { case (n, c) => c.as(n) }) :+
          guarded.getOrElse(lit(1.0).cast("double")).as(ValCol): _*)
      publicPartitions.foreach { pub => cur = cur.join(pub, pkNames, "left_semi") }
      params.maxContributionsPerPartition.foreach { c =>
        cur = sampleRowsPerKey(cur, PidCol +: pkNames, c, engine.l0ShardingFactor)
      }
      val accs = combiner.createAccumulators(col(ValCol))
      val accNames = accs.indices.map(i => s"__cc_$i")
      val perPidPk = cur.groupBy((col(PidCol) +: pkCols): _*)
        .agg(accs.head.as(accNames.head),
          accs.tail.zip(accNames.tail).map { case (a, n) => a.as(n) }: _*)
      val bounded = sampleRowsPerKey(perPidPk, Seq(PidCol),
        params.maxPartitionsContributed, engine.l0ShardingFactor)
      val merged = combiner.mergeAccumulators(accNames.map(col))
      var agg = bounded.groupBy(pkCols: _*)
        .agg(count(lit(1)).as(PidCntCol),
          merged.zip(accNames).map { case (m, n) => m.as(n) }: _*)
      selectionHandle.foreach { h =>
        val spec = h.spec
        val sel = PartitionSelection.create(params.partitionSelectionStrategy,
          spec.epsilon, spec.delta, params.maxPartitionsContributed, params.preThreshold)
        val keepUdf = udf((n: Long) => sel.shouldKeep(n, noise)).asNondeterministic()
        agg = agg.filter(keepUdf(col(PidCntCol)))
      }
      val metrics = combiner.computeMetrics(accNames.map(col), noise)
      require(metrics.length == combiner.metricNames.length,
        "computeMetrics must return one column per metric name")
      agg.select(pkCols ++ metrics.zip(combiner.metricNames).map {
        case (m, n) => m.as(n)
      }: _*)
    }, () => {
      val lines = Seq.newBuilder[String]
      lines += s"Custom DP aggregation: ${combiner.name}"
      selectionHandle.foreach { h =>
        val s = h.spec
        lines += f"- Partition selection: ${params.partitionSelectionStrategy} eps=${s.epsilon}%.4g delta=${s.delta}%.4g"
      }
      lines += s"- ${combiner.explainBudget}"
      lines.result().mkString("\n")
    })
  }
}
