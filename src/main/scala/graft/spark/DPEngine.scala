package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Names the three roles every DP query needs
  * (reference: pipeline_dp/data_extractors.py:20-31 — extractor lambdas become
  * Column expressions, so Catalyst can prune/push them).
  */
final case class DPColumns(
    privacyUnit: Column,
    partitionKeys: Seq[(String, Column)],
    value: Option[Column] = None
)
object DPColumns {
  def apply(privacyUnit: String, partitionKey: String): DPColumns =
    DPColumns(col(privacyUnit), Seq(partitionKey -> col(partitionKey)), None)
  def apply(privacyUnit: String, partitionKey: String, value: String): DPColumns =
    DPColumns(col(privacyUnit), Seq(partitionKey -> col(partitionKey)), Some(col(value)))
}

/** A lazily-built DP result: the physical DataFrame is assembled only after
  * the accountant resolves budgets (explicit two-phase lifecycle replacing the
  * reference's mutate-after-capture, reference: budget_accounting.py:448-476).
  */
final class DPResult private[spark] (
    builder: () => DataFrame,
    reportBuilder: () => String = () => ""
) {
  lazy val dataframe: DataFrame = builder()
  /** Human-readable explanation of the DP computation — resolved budgets,
    * mechanisms and selection strategy (reference: report_generator.py:46-116).
    * Available after computeBudgets(). */
  lazy val explainReport: String = reportBuilder()
}

/** The DP aggregation engine, Spark-native.
  *
  * The reference's dataflow stages (reference: dp_engine.py:71-195) become one
  * declarative DataFrame plan:
  *
  * {{{
  * select(pid, pk..., value)                        -- narrow, codegen
  *   [left_semi join public partitions]             -- broadcast if small
  *   window rn over (pid, pk) order rand, rn <= c   -- shuffle 1 (Linf bound)
  *   groupBy(pid, pk).agg(partial accumulators)     -- no extra shuffle (same keys)
  *   window rn over (pid) order rand, rn <= L0      -- shuffle 2 (L0 bound)
  *   groupBy(pk).agg(merge accumulators)            -- shuffle 3, map-side combine
  *   [outer join empty public partitions]
  *   [filter shouldKeep(pid_count)]                 -- nondeterministic UDF
  *   select(noised metrics)                         -- nondeterministic UDF
  * }}}
  *
  * Everything up to the final two (per-partition-key, low-cardinality) UDFs is
  * native Catalyst — whole-stage codegen, partial aggregation, AQE all apply.
  *
  * @param noise noise source; [[NoiseSource.Zero]] gives exact results for
  *              oracle tests (the reference's huge-epsilon trick, made exact).
  */
final class DPEngine(
    val accountant: BudgetAccountant,
    val noise: NoiseSource = NoiseSource.Secure,
    /** Shards per privacy unit for the L0/L1 bounding windows. The default
      * (1) sorts each pid's full partition fan-out in one window task — fine
      * until one pid contributes to millions of partitions, the fan-out
      * hazard the reference documents but does not mitigate on this path
      * (reference: dp_engine.py:270-271; its salting helper exists only for
      * semi-joins, pipeline_functions.py:119-156). Setting > 1 switches the
      * bounding sample to a two-stage window that is distribution-IDENTICAL
      * (DPEngineSpec proves bit-equality on a fixed rand draw) but never
      * sorts one pid's rows in a single task, at the price of one extra
      * exchange. */
    val l0ShardingFactor: Int = 1
) {
  import DPEngine._
  require(l0ShardingFactor >= 1, "l0ShardingFactor must be >= 1")

  /** The main DP groupBy-aggregate (reference: dp_engine.py:71-195). */
  def aggregate(
      df: DataFrame,
      params: AggregateParams,
      columns: DPColumns,
      publicPartitions: Option[DataFrame] = None
  ): DPResult = {
    accountant.registerAggregation()
    require(!(params.postAggregationThresholding && publicPartitions.isDefined),
      "postAggregationThresholding requires private partitions")
    val plan = CompoundComputer.plan(params, accountant)
    // Post-aggregation thresholding is an ADDITIVE mechanism (noised count vs
    // threshold), so it requests the matching thresholding mechanism type:
    // under PLD accounting it participates in the noise-std search and
    // receives its share of the 25% thresholding-delta reservation
    // (reference: budget_accounting.py:700-747); under naive accounting the
    // type resolves to plain (eps, delta) like any other request. The
    // sensitivity of the privacy-unit count is L1 = l0 (Laplace) /
    // L2 = sqrt(l0) (Gaussian).
    val selectionSensitivity = params.noiseKind match {
      case NoiseKind.Laplace  => effectiveL0(params).toDouble
      case NoiseKind.Gaussian => math.sqrt(effectiveL0(params).toDouble)
    }
    val selectionHandle =
      if (publicPartitions.isEmpty) {
        val mtype =
          if (params.postAggregationThresholding) params.noiseKind match {
            case NoiseKind.Laplace  => MechanismType.LaplaceThresholding
            case NoiseKind.Gaussian => MechanismType.GaussianThresholding
          }
          else MechanismType.PartitionSelection
        // sensitivity stays 1.0 here: the PLD accountant resolves the
        // NORMALIZED per-unit-sensitivity noiseStdDev, and
        // buildPostAggSelection scales it by selectionSensitivity ONCE at
        // build — requesting with sensitivity = S as well applied S twice
        // (std = S^2 * base/w), over-noising the thresholded count and
        // inflating the release threshold S-fold
        Some(accountant.requestBudget(mtype, weight = params.budgetWeight,
          name = "PartitionSelection"))
      } else None

    new DPResult(() => {
      val computer = plan.build(noise)
      val thresholdingStrategy = params.noiseKind match {
        case NoiseKind.Laplace  => PartitionSelectionStrategyKind.LaplaceThresholding
        case NoiseKind.Gaussian => PartitionSelectionStrategyKind.GaussianThresholding
      }
      if (params.postAggregationThresholding) {
        val sel = buildPostAggSelection(selectionHandle.get.spec, thresholdingStrategy,
          selectionSensitivity, params)
        assemble(df, params, columns, publicPartitions, computer, None, noise,
          plan.buildQuantile(), plan.buildVector(), postAggThresholding = Some(sel),
          shards = l0ShardingFactor)
      } else {
        val selector = selectionHandle.map { h =>
          val spec = h.spec
          PartitionSelection.create(params.partitionSelectionStrategy, spec.epsilon,
            spec.delta, effectiveL0(params), params.preThreshold)
        }
        assemble(df, params, columns, publicPartitions, computer, selector, noise,
          plan.buildQuantile(), plan.buildVector(), shards = l0ShardingFactor)
      }
    }, () => {
      // Per-stage accumulated report, mirroring the reference's
      // report_generator (reference: report_generator.py:46-116): every
      // stage that ran states its resolved parameters; mechanisms print
      // their final noise scales.
      val lines = Seq.newBuilder[String]
      lines += s"DPEngine.aggregate: metrics=[${params.metrics.map(_.name).mkString(", ")}]"
      var stage = 0
      def add(s: String): Unit = { stage += 1; lines += s"$stage. $s" }
      if (publicPartitions.isDefined)
        add("Public partition filtering: dropped rows of non-public partitions before any aggregation")
      if (params.contributionBoundsAlreadyEnforced)
        add("Contribution bounding: SKIPPED — caller vouched that bounds are already enforced")
      else params.maxContributions match {
        case Some(mc) =>
          add(s"Contribution bounding (L1, total): randomly sampled <= $mc contributions per privacy unit")
        case None =>
          if (needsLinfSampling(params))
            params.maxContributionsPerPartition.foreach { c =>
              add(s"Contribution bounding (Linf, per-partition): randomly sampled <= $c " +
                "contributions per (privacy unit, partition)")
            }
          add("Contribution bounding (L0, cross-partition): randomly sampled <= " +
            s"${params.maxPartitionsContributed} partitions per privacy unit")
      }
      if (params.boundsPerContributionAreSet)
        add(f"Per-contribution clipping: values clipped to [${params.minValue.get}%.6g, ${params.maxValue.get}%.6g]")
      else if (params.boundsPerPartitionAreSet)
        add(f"Per-partition sum clipping: per-partition sums clipped to " +
          f"[${params.minSumPerPartition.get}%.6g, ${params.maxSumPerPartition.get}%.6g]")
      if (publicPartitions.isDefined)
        add("Partition selection: public partitions (missing public keys added as empty accumulators)")
      else {
        val spec = selectionHandle.get.spec
        val thresholdingStrategy = params.noiseKind match {
          case NoiseKind.Laplace  => PartitionSelectionStrategyKind.LaplaceThresholding
          case NoiseKind.Gaussian => PartitionSelectionStrategyKind.GaussianThresholding
        }
        if (params.postAggregationThresholding) {
          val sel = buildPostAggSelection(spec, thresholdingStrategy,
            selectionSensitivity, params)
          add(s"Partition selection (post-aggregation thresholding): ${sel.describe}")
        } else {
          val sel = PartitionSelection.create(params.partitionSelectionStrategy,
            spec.epsilon, spec.delta, effectiveL0(params), params.preThreshold)
          add(s"Partition selection: ${sel.describe}")
        }
      }
      val parts = plan.build(noise).parts
      val quantile = plan.buildQuantile()
      val vector = plan.buildVector()
      if (parts.nonEmpty || quantile.isDefined || vector.isDefined) {
        add("Per-metric mechanisms:")
        parts.foreach(p => lines += s"   - ${p.describe}")
        quantile.foreach(q => lines += s"   - ${q.describe}")
        vector.foreach(v => lines += s"   - ${v.describe}")
      }
      lines.result().mkString("\n")
    })
  }

  /** DP release of the same metric set at SEVERAL partition-key
    * granularities under one budget — the GROUPING SETS / ROLLUP shape of
    * [[aggregate]]. Beyond-reference: the reference releases one
    * granularity per aggregation; a multi-granularity release there means
    * hand-composing pipelines and budgets.
    *
    * Each grouping set is one full private release (its own contribution
    * bounding, aggregation, partition selection), so every mechanism is
    * applied `groupingSets.size` times: all budget handles are requested
    * with count = n and the accountant composes them n-fold (naive:
    * n-fold epsilon/delta charge, reference: budget_accounting.py:448-476;
    * PLD: n-fold self-composition, with the reserved thresholding delta
    * split per USE so a count = n thresholding handle consumes n shares).
    * The released frames are unioned with rolled-up key columns as typed
    * NULLs plus a `grouping_id` bitmask (Spark/SQL convention: bit set =
    * key rolled up, first declared key = most significant bit), so the
    * Zero-noise gate replays as SQL GROUP BY GROUPING SETS.
    *
    * Public partitions are not supported here (a public domain would need
    * one frame per granularity); call [[aggregate]] per granularity for
    * that. */
  def aggregateGroupingSets(
      df: DataFrame,
      params: AggregateParams,
      columns: DPColumns,
      groupingSets: Seq[Seq[String]]
  ): DPResult = {
    accountant.registerAggregation()
    val allKeys = columns.partitionKeys.map(_._1)
    require(!allKeys.contains("grouping_id"),
      "partition key names must not be 'grouping_id' (the released rollup " +
        "bitmask column); rename the key column")
    require(groupingSets.nonEmpty, "at least one grouping set is required")
    require(groupingSets.distinct == groupingSets,
      "duplicate grouping sets: releasing a granularity twice spends budget " +
        "for no new information — deduplicate the sets")
    groupingSets.foreach { set =>
      require(set.distinct == set && set.forall(allKeys.contains),
        s"grouping set ${set.mkString("(", ",", ")")} must be distinct " +
          s"names out of the declared partition keys ${allKeys.mkString(", ")}")
    }
    val n = groupingSets.size
    val plan = CompoundComputer.plan(params, accountant, uses = n)
    val selectionSensitivity = params.noiseKind match {
      case NoiseKind.Laplace  => effectiveL0(params).toDouble
      case NoiseKind.Gaussian => math.sqrt(effectiveL0(params).toDouble)
    }
    val mtype =
      if (params.postAggregationThresholding) params.noiseKind match {
        case NoiseKind.Laplace  => MechanismType.LaplaceThresholding
        case NoiseKind.Gaussian => MechanismType.GaussianThresholding
      }
      else MechanismType.PartitionSelection
    val selectionHandle = accountant.requestBudget(mtype,
      weight = params.budgetWeight, count = n, name = "PartitionSelection")
    new DPResult(() => {
      val spec = selectionHandle.spec
      val computer = plan.build(noise)
      val quantile = plan.buildQuantile()
      val vector = plan.buildVector()
      val thresholdingStrategy = params.noiseKind match {
        case NoiseKind.Laplace  => PartitionSelectionStrategyKind.LaplaceThresholding
        case NoiseKind.Gaussian => PartitionSelectionStrategyKind.GaussianThresholding
      }
      val (selector, postAgg) =
        if (params.postAggregationThresholding)
          (None, Some(buildPostAggSelection(spec, thresholdingStrategy,
            selectionSensitivity, params)))
        else
          (Some(PartitionSelection.create(params.partitionSelectionStrategy,
            spec.epsilon, spec.delta, effectiveL0(params), params.preThreshold)),
            None)
      // key types from the projected frame's schema (driver-side analysis
      // only — no job): rolled-up columns must union as the SAME type
      val keyTypes = df.select(columns.partitionKeys.map {
        case (nm, c) => c.as(nm) }: _*).schema
        .fields.map(f => f.name -> f.dataType).toMap
      val frames = groupingSets.map { set =>
        val colsI = columns.copy(
          partitionKeys = columns.partitionKeys.filter(p => set.contains(p._1)))
        val released = assemble(df, params, colsI, None, computer, selector,
          noise, quantile, vector, postAggThresholding = postAgg,
          shards = l0ShardingFactor)
        val gid = allKeys.zipWithIndex.iterator.collect {
          case (nm, i) if !set.contains(nm) => 1L << (allKeys.size - 1 - i)
        }.sum
        val metricCols = released.columns.filterNot(set.contains).map(col(_))
        val keyCols = allKeys.map { nm =>
          if (set.contains(nm)) col(nm)
          else lit(null).cast(keyTypes(nm)).as(nm)
        }
        released.select(keyCols ++ metricCols :+
          lit(gid).as("grouping_id"): _*)
      }
      frames.reduce(_.unionByName(_))
    })
  }

  /** Post-aggregation thresholding selection from the resolved spec: under
    * PLD accounting the noise scale comes from the composition search and
    * the threshold spends the reserved thresholding delta (actual std =
    * normalized std * sensitivity, the same convention as
    * Mechanisms.createAdditive); under naive accounting the (eps, delta)
    * split is built by the selection itself. */
  private def buildPostAggSelection(
      spec: MechanismSpec,
      strategy: PartitionSelectionStrategyKind,
      sensitivity: Double,
      params: AggregateParams
  ): ThresholdingSelection = spec.noiseStdDev match {
    case Some(nstd) =>
      PartitionSelection.fromNoiseStd(strategy, nstd * sensitivity,
        spec.thresholdingDelta.get, effectiveL0(params), params.preThreshold)
    case None =>
      PartitionSelection.create(strategy, spec.epsilon, spec.delta,
        effectiveL0(params), params.preThreshold)
        .asInstanceOf[ThresholdingSelection]
  }

  /** DP set of partition keys (reference: dp_engine.py:220-305). */
  def selectPartitions(
      df: DataFrame,
      params: SelectPartitionsParams,
      columns: DPColumns
  ): DPResult = {
    accountant.registerAggregation()
    val handle = accountant.requestBudget(MechanismType.PartitionSelection,
      weight = params.budgetWeight, name = "PartitionSelection")
    new DPResult(() => {
      val spec = handle.spec
      val pkNames = columns.partitionKeys.map(_._1)
      val projected = df.select(
        columns.privacyUnit.as(PidCol) +:
          columns.partitionKeys.map { case (n, c) => c.as(n) }: _*)
      // distinct (pid, pk), bound partitions per pid
      val distinctPairs = projected.distinct()
      val bounded = sampleRowsPerKey(distinctPairs, Seq(PidCol),
        params.maxPartitionsContributed, shards = l0ShardingFactor)
      val noiseSrc = noise
      params.strategy match {
        case PartitionSelectionStrategyKind.WeightedGaussianThresholding =>
          // weight = 1/sqrt(#partitions of the unit); threshold the weight sums
          // (reference: dp_engine.py:664-714). The weighted mechanism has no
          // pre-threshold arm — silently dropping the caller's explicit
          // policy would release small partitions they asked to suppress.
          require(params.preThreshold.isEmpty,
            "preThreshold is not supported with WeightedGaussianThresholding " +
              "(the weighted mechanism thresholds weight sums, not unit counts); " +
              "use Laplace/Gaussian thresholding for preThreshold")
          val sel = WeightedGaussianSelection(spec.epsilon, spec.delta,
            params.maxPartitionsContributed)
          val w = Window.partitionBy(col(PidCol))
          val weighted = bounded
            .withColumn("__graft_w", lit(1.0) / sqrt(count(lit(1)).over(w)))
            .groupBy(pkNames.map(col): _*)
            .agg(sum(col("__graft_w")).as("__graft_wsum"))
          val keepUdf = udf((ws: Double) => sel.shouldKeep(ws, noiseSrc)).asNondeterministic()
          weighted.filter(keepUdf(col("__graft_wsum"))).select(pkNames.map(col): _*)
        case _ =>
          val selector = PartitionSelection.create(params.strategy, spec.epsilon,
            spec.delta, params.maxPartitionsContributed, params.preThreshold)
          val counted = bounded.groupBy(pkNames.map(col): _*).agg(count(lit(1)).as(PidCntCol))
          val keepUdf = udf((n: Long) => selector.shouldKeep(n, noiseSrc)).asNondeterministic()
          counted.filter(keepUdf(col(PidCntCol))).select(pkNames.map(col): _*)
      }
    })
  }

  /** DP SET UNION (beyond-reference; Gopi et al. ICML 2020,
    * "Differentially Private Set Union") — release the union of ITEMS
    * contributed by privacy units: the vocabulary/n-gram/URL release a
    * training-corpus pipeline needs before it may publish token
    * statistics derived from user data. Differs from
    * [[selectPartitions]] in what is protected: there a unit's presence
    * in a partition is the signal; here a unit carries a SET of items
    * and the release must bound its total influence across all of them.
    *
    * Policy (the paper's weighted-histogram family): bound each unit to
    * `maxItemsPerUnit` items — deterministically, the first by item sort
    * order (a valid item-selection policy per the paper, and stable
    * under retries); spread the unit's weight per
    * [[graft.core.SetUnionWeighting]] (L1-normalized for Laplace,
    * L2-normalized for Gaussian); threshold the per-item noisy weight
    * sums ([[WeightedLaplaceSelection]] / [[WeightedGaussianSelection]]).
    *
    * Plan shape (audited): distinct -> bounding window on the unit ->
    * map-side-combined sum per item -> per-item threshold UDF. Three
    * exchanges, EACH pre-pruned map-side before it ships (partial
    * hash-agg dedupe before the (pid, item) exchange; Spark's partial
    * WindowGroupLimit caps every map task at maxItemsPerUnit rows per
    * unit before the pid exchange; partial sums before the item
    * exchange), all on low-skew keys; no driver state. NULL items fail
    * loud (they would silently vanish from the union). */
  def setUnion(
      df: DataFrame,
      params: SetUnionParams,
      pid: Column,
      item: Column
  ): DPResult = {
    accountant.registerAggregation()
    val handle = accountant.requestBudget(MechanismType.PartitionSelection,
      weight = params.budgetWeight, name = "SetUnion")
    lazy val described: String = {
      val spec = handle.spec
      params.noiseKind match {
        case NoiseKind.Laplace =>
          WeightedLaplaceSelection(spec.epsilon, spec.delta).describe
        case NoiseKind.Gaussian =>
          WeightedGaussianSelection(spec.epsilon, spec.delta,
            params.maxItemsPerUnit).describe
      }
    }
    new DPResult(() => {
      val spec = handle.spec
      val checkedItem = when(item.isNull, raise_error(lit(
          "setUnion: NULL item — a null cannot join the released union; " +
            "filter or impute upstream")).cast("string"))
        .otherwise(item.cast("string"))
      val projected = df.select(pid.as(PidCol), checkedItem.as("item"))
      val distinctPairs = projected.distinct()
      // deterministic per-unit bounding: the first maxItemsPerUnit items
      // by sort order (the SetUnionParams policy note)
      val w = Window.partitionBy(col(PidCol)).orderBy(col("item"))
      val bounded = distinctPairs
        .withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") <= params.maxItemsPerUnit)
      val kw = Window.partitionBy(col(PidCol))
      val noiseSrc = noise
      val weight = (params.noiseKind, params.weighting) match {
        case (NoiseKind.Laplace, SetUnionWeighting.Uniform) =>
          lit(1.0) / count(lit(1)).over(kw)
        case (NoiseKind.Laplace, SetUnionWeighting.Constant) =>
          lit(1.0 / params.maxItemsPerUnit)
        case (NoiseKind.Gaussian, SetUnionWeighting.Uniform) =>
          lit(1.0) / sqrt(count(lit(1)).over(kw))
        case (NoiseKind.Gaussian, SetUnionWeighting.Constant) =>
          lit(1.0 / math.sqrt(params.maxItemsPerUnit.toDouble))
      }
      val weighted = bounded
        .withColumn("__graft_w", weight)
        .groupBy(col("item"))
        .agg(sum(col("__graft_w")).as("__graft_wsum"))
      val keepUdf = params.noiseKind match {
        case NoiseKind.Laplace =>
          val sel = WeightedLaplaceSelection(spec.epsilon, spec.delta)
          udf((ws: Double) => sel.shouldKeep(ws, noiseSrc)).asNondeterministic()
        case NoiseKind.Gaussian =>
          val sel = WeightedGaussianSelection(spec.epsilon, spec.delta,
            params.maxItemsPerUnit)
          udf((ws: Double) => sel.shouldKeep(ws, noiseSrc)).asNondeterministic()
      }
      weighted.filter(keepUdf(col("__graft_wsum"))).select(col("item"))
    }, () => s"DPEngine.setUnion: maxItemsPerUnit=${params.maxItemsPerUnit} " +
      s"weighting=${params.weighting} — $described")
  }

  /** Top-k partition release by noisy privacy-unit count — the
    * report-noisy-max family (Dwork & Roth §3.3; one-shot Laplace top-k,
    * Durfee & Rogers NeurIPS'19). Beyond-reference DP extension: the
    * reference's thresholding selection strategies
    * (partition_selection.py:33-138) keep every partition above a noisy
    * bar and cannot answer "which k partitions are largest".
    *
    * Two arms, chosen by whether the candidate domain is public —
    * report-noisy-max is only defined over a data-INDEPENDENT candidate
    * set, so a data-derived domain must instead go through thresholding
    * (a partition contributed by a single unit would otherwise be
    * released with probability > 0 in D and exactly 0 in the neighbor
    * missing that unit — unbounded privacy loss at any finite eps):
    *
    *  - `publicPartitions = Some(frame)`: pure-eps peeling
    *    report-noisy-max over the FIXED public domain (missing public
    *    keys are candidates with count 0; non-public keys are dropped
    *    before any noise). Laplace scale `b = 2 * k * l0 / eps`
    *    (peeling composition: k rounds of report-noisy-max at eps/k
    *    each; the factor 2 is the general-sensitivity arm — with
    *    l0 = 1 the monotone-count argument would permit dropping it,
    *    kept for uniformity). Valid under totalDelta = 0. Built via
    *    [[Mechanisms.createAdditive]] with L1 sensitivity 2*k*l0, so a
    *    PLD-resolved spec (epsilon = 0, normalized noiseStdDev) yields
    *    the correct finite scale instead of b = Infinity.
    *
    *  - `publicPartitions = None` (unknown domain): Laplace
    *    THRESHOLDING release — noisy unit-counts (L1 sensitivity l0)
    *    are released only above the delta-calibrated threshold, and the
    *    top-k of the surviving noisy counts is post-processing of that
    *    (eps, delta)-DP release (the same analysis as
    *    [[selectPartitions]]; cf. Durfee & Rogers NeurIPS'19 on why an
    *    unknown domain forces a threshold + delta spend). Requires
    *    totalDelta > 0 — fails loud at request time otherwise.
    *
    * ONLY the k top-scoring partition keys with their ranks are
    * released. The noisy scores are withheld: releasing magnitudes is a
    * different mechanism with its own budget (compose with
    * [[aggregate]] over the released keys as public partitions for
    * that).
    *
    * Ties (exact under Zero noise; measure-zero otherwise) break by the
    * partition-key columns ascending in declaration order —
    * deterministic, so the Zero gate replays in SQL.
    *
    * Scale: the top-k is an orderBy+limit (TakeOrderedAndProject — a
    * per-partition bounded heap, no global sort); the rank window then
    * runs over exactly k rows. The public join is a broadcast when the
    * domain frame is small (the usual case for a curated key list). */
  def noisyTopK(
      df: DataFrame,
      params: NoisyTopKParams,
      columns: DPColumns,
      publicPartitions: Option[DataFrame] = None
  ): DPResult = {
    accountant.registerAggregation()
    val l0 = params.maxPartitionsContributed
    val handle = publicPartitions match {
      case Some(_) =>
        accountant.requestBudget(MechanismType.Laplace,
          weight = params.budgetWeight, name = "NoisyTopK")
      case None =>
        require(accountant.totalDelta > 0,
          "noisyTopK over an unknown (data-derived) partition domain requires " +
            "totalDelta > 0: the release must threshold away partitions with few " +
            "contributors (report-noisy-max needs a data-independent candidate " +
            "set). Pass publicPartitions for a pure-epsilon release")
        accountant.requestBudget(MechanismType.LaplaceThresholding,
          weight = params.budgetWeight, name = "NoisyTopK")
    }
    new DPResult(() => {
      val spec = handle.spec
      val pkNames = columns.partitionKeys.map(_._1)
      require(!pkNames.contains("rank") && !pkNames.exists(_.startsWith("__graft_")),
        "partition key names must not be 'rank' (the released rank column) " +
          "or start with __graft_ (the engine's namespace); rename the key columns")
      val pkCols = pkNames.map(col)
      val projected = df.select(
        columns.privacyUnit.as(PidCol) +:
          columns.partitionKeys.map { case (n, c) => c.as(n) }: _*)
      val distinctPairs = projected.distinct()
      def countBounded(pairs: DataFrame): DataFrame =
        sampleRowsPerKey(pairs, Seq(PidCol), l0, shards = l0ShardingFactor)
          .groupBy(pkCols: _*).agg(count(lit(1)).as(PidCntCol))
      val noiseSrc = noise
      val scored = publicPartitions match {
        case Some(pub) =>
          val pubKeys = pub.select(pkCols: _*).distinct()
          // non-public rows drop BEFORE L0 bounding — a unit's
          // contribution budget must not be spent on partitions that can
          // never be released (same stage order as [[aggregate]])
          val counted = countBounded(
            distinctPairs.join(pubKeys, pkNames, "left_semi"))
          val mech = Mechanisms.createAdditive(spec,
            Sensitivities(l1Given = Some(2.0 * params.k * l0)))
          val scoreUdf = udf((n: Long) =>
            mech.addNoise(n.toDouble, noiseSrc)).asNondeterministic()
          pubKeys.join(counted, pkNames, "left_outer")
            .withColumn(PidCntCol, coalesce(col(PidCntCol), lit(0L)))
            .withColumn("__graft_score", scoreUdf(col(PidCntCol)))
        case None =>
          val counted = countBounded(distinctPairs)
          val sel: ThresholdingSelection = spec.noiseStdDev match {
            case Some(nstd) => PartitionSelection.fromNoiseStd(
              PartitionSelectionStrategyKind.LaplaceThresholding,
              nstd * l0, spec.thresholdingDelta.get, l0)
            case None => PartitionSelection.create(
              PartitionSelectionStrategyKind.LaplaceThresholding,
              spec.epsilon, spec.delta, l0).asInstanceOf[ThresholdingSelection]
          }
          val scoreUdf = udf((n: Long) =>
            sel.noisedValueIfShouldKeep(n, noiseSrc)).asNondeterministic()
          counted.withColumn("__graft_score", scoreUdf(col(PidCntCol)))
            .filter(col("__graft_score").isNotNull)
      }
      val order = col("__graft_score").desc +: pkNames.map(col(_).asc)
      scored.orderBy(order: _*).limit(params.k)
        .withColumn("rank",
          row_number().over(Window.orderBy(order: _*)).cast("long"))
        .select(pkCols :+ col("rank"): _*)
    })
  }

  /** Noise-only on pre-aggregated per-partition values; the caller vouches for
    * the sensitivities (reference: dp_engine.py:579-652). */
  def addDpNoise(
      df: DataFrame,
      params: AddDpNoiseParams,
      valueColumns: Seq[String]
  ): DPResult = {
    accountant.registerAggregation()
    val handle = accountant.requestBudget(params.noiseKind.mechanismType,
      weight = params.budgetWeight, name = "AddDpNoise")
    new DPResult(() => {
      val sens = Sensitivities(params.l0Sensitivity, params.linfSensitivity,
        params.l1Sensitivity, params.l2Sensitivity)
      val mech = Mechanisms.createAdditive(handle.spec, sens)
      val noiseSrc = noise
      val noiseUdf = udf((v: Double) => mech.addNoise(v, noiseSrc)).asNondeterministic()
      // the assemble noNull contract: Spark SKIPS a primitive-Double UDF on
      // null input and returns null, so an unguarded NULL cell would be
      // released UN-NOISED — an exact "this cell was null" disclosure
      valueColumns.foldLeft(df)((d, c) => d.withColumn(c,
        noiseUdf(when(col(c).isNull, raise_error(lit(
            s"addDpNoise: NULL value in '$c' — a null release would " +
              "disclose the cell un-noised; filter or impute upstream"))
          .cast("double")).otherwise(col(c).cast("double")))))
    })
  }
}

object DPEngine {
  private[spark] val PidCol = "__graft_pid"
  private[spark] val ValCol = "__graft_v"
  private[spark] val CntCol = "__graft_cnt"
  private[spark] val SumCol = "__graft_sum"
  private[spark] val NSumCol = "__graft_nsum"
  private[spark] val NSqCol = "__graft_nsq"
  private[spark] val PidCntCol = "__graft_pidcnt"
  private[spark] val RnCol = "__graft_rn"
  private[spark] val RndCol = "__graft_rnd"
  private[spark] val ShardCol = "__graft_shard"
  private[spark] val MetricsCol = "__graft_metrics"
  private[spark] val TreeCol = "__graft_qtree"
  private[spark] val VecCol = "__graft_vec"

  /** Uniform without-replacement sample of at most `n` rows per key:
    * `row_number() over (partition by keys order by rand())` — the window sort
    * randomizes, the filter bounds. Uniformity holds exactly (a uniform random
    * permutation prefix), unlike the reference's Spark path which documents
    * non-uniformity (reference: spark_rdd_backend.py:121-124).
    *
    * With `shards > 1` the selection runs as TWO windows: rows first rank
    * within (key, shard) — shard derived from the same rand value, so no
    * second draw — keeping each shard's n smallest; survivors (<= shards*n
    * per key) then rank within the key. The n globally-smallest rand values
    * are always contained in the union of the per-shard n smallest (an
    * element outside its shard's top n has > n smaller within its shard
    * alone), so the result SET is identical to the single-window form for
    * the same rand draw — but no task ever sorts one key's full fan-out
    * (the reference's documented per-pid hazard, dp_engine.py:270-271). */
  private[graft] def sampleRowsPerKey(df: DataFrame, keys: Seq[String], n: Int,
      shards: Int = 1, rnd: Column = rand()): DataFrame = {
    if (shards <= 1) {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(rnd)
      df.withColumn(RnCol, row_number().over(w)).filter(col(RnCol) <= n).drop(RnCol)
    } else {
      val keyCols = keys.map(col)
      val withR = df.withColumn(RndCol, rnd)
        .withColumn(ShardCol, floor(col(RndCol) * shards).cast("int"))
      val w1 = Window.partitionBy(keyCols :+ col(ShardCol): _*).orderBy(col(RndCol))
      val w2 = Window.partitionBy(keyCols: _*).orderBy(col(RndCol))
      withR
        .withColumn(RnCol, row_number().over(w1)).filter(col(RnCol) <= n)
        .withColumn(RnCol, row_number().over(w2)).filter(col(RnCol) <= n)
        .drop(RnCol, RndCol, ShardCol)
    }
  }

  /** Partitions one unit can influence: in maxContributions (L1) mode the
    * L1 sample is the only enforced bound, so a unit may touch up to mc
    * partitions — maxPartitionsContributed is NOT enforced there (it
    * defaults to 1) and using it would under-calibrate partition
    * selection mc-fold. */
  private def effectiveL0(params: AggregateParams): Int =
    params.maxContributions.getOrElse(params.maxPartitionsContributed)

  /** Whether any requested metric needs per-(pid, pk) contribution sampling
    * (reference: combiners.py expects_per_partition_sampling; sum in
    * per-partition-bound mode and privacy_id_count do not). */
  private def needsLinfSampling(params: AggregateParams): Boolean =
    params.metrics.exists {
      case Metric.Count | Metric.Mean | Metric.Variance | _: Metric.Percentile => true
      case Metric.Sum => params.boundsPerContributionAreSet
      case Metric.VectorSum => true
      case Metric.PrivacyIdCount => false
    }

  private[spark] def assemble(
      df: DataFrame,
      params: AggregateParams,
      columns: DPColumns,
      publicPartitions: Option[DataFrame],
      computer: CompoundComputer,
      selector: Option[PartitionSelection],
      noise: NoiseSource,
      quantile: Option[QuantileComputer] = None,
      vector: Option[VectorOps.VectorNoiser] = None,
      postAggThresholding: Option[ThresholdingSelection] = None,
      shards: Int = 1
  ): DataFrame = {
    val pkNames = columns.partitionKeys.map(_._1)
    val pkCols = pkNames.map(col)
    val isVector = vector.isDefined
    // fail loud on output-name collisions: the final select emits pk
    // columns next to metric columns BY NAME, so a partition key named
    // "count" (plausible) would silently produce a frame with duplicate
    // column names — an AMBIGUOUS_REFERENCE ambush for the first
    // downstream select, or silent duplicate fields in parquet
    val emitted = computer.names ++ quantile.toSeq.flatMap(_.names) ++
      vector.toSeq.map(_ => "vector_sum") ++
      postAggThresholding.toSeq.map(_ => "privacy_id_count")
    val badPk = pkNames.filter(n => emitted.contains(n) || n.startsWith("__graft_"))
    require(badPk.isEmpty,
      s"partition key name(s) ${badPk.mkString(", ")} collide with DP output " +
        s"columns (${emitted.mkString(", ")}) or the engine's __graft_ " +
        "namespace; rename the key columns")
    // fail loud on NULL values: sum(all-null group) is SQL NULL, which
    // would ride through the merge, skip the primitive-typed metrics UDF
    // (Spark nulls it out), and RELEASE null metrics with no noise — an
    // exact "every value was null" disclosure. A null value has no
    // clipping semantics either; the caller must filter or impute.
    def noNull(v: Column, shape: String): Column =
      when(v.isNull, raise_error(lit(
        s"DPEngine: NULL $shape value for a privacy unit — nulls have no " +
          "clipping semantics and would release un-noised null metrics; " +
          "filter or impute upstream"))).otherwise(v)
    val valueExpr =
      if (isVector) noNull(columns.value.get, "vector").cast("array<double>")
      else columns.value.map(v => noNull(v, "scalar").cast("double"))
        .getOrElse(lit(1.0).cast("double"))

    // stage 3: extract (pid, pk..., value) — Catalyst prunes everything else
    var cur = df.select(
      (columns.privacyUnit.as(PidCol) +:
        columns.partitionKeys.map { case (n, c) => c.as(n) }) :+
        valueExpr.as(ValCol): _*)

    // stage 4: drop non-public partitions early (semi-join; broadcast when small)
    publicPartitions.foreach { pub => cur = cur.join(pub, pkNames, "left_semi") }

    // stage 5a: contribution sampling. In maxContributions (total-L1) mode
    // the sampling below IS the entire contribution bound — it must run
    // for EVERY metric: needsLinfSampling only says per-partition (Linf)
    // sampling is unnecessary (privacy_id_count, per-partition-bounded
    // sum), but skipping the L1 sample would leave contributions fully
    // unbounded while noise is calibrated to mc.
    val doSampling = !params.contributionBoundsAlreadyEnforced
    // COUNT-STYLE Linf fast path (r20): when every requested metric reads
    // only the bounded row count (Count) or the distinct-unit count
    // (PrivacyIdCount) — never a row's value — the Linf sample's one
    // observable is the kept-row count min(n, c): a group's rows are
    // interchangeable, so which c rows survive cannot reach the release.
    // least(count, c) over the stage-5b aggregate is therefore EXACTLY the
    // sampled result (bit-identical for every rand draw, not merely equal
    // in distribution) with no rand, no sort and no raw-row exchange: the
    // aggregate partial-combines map-side where the row_number window had
    // to sort the whole fact table per release (guide §2.3/§2.4). The L1
    // (maxContributions) sample is NOT reducible this way — it splits one
    // unit's budget ACROSS partitions, so which rows survive decides the
    // per-partition counts — and keeps the window.
    val countOnlyLinfCap: Option[Long] =
      if (doSampling && params.maxContributions.isEmpty &&
          needsLinfSampling(params) && quantile.isEmpty && vector.isEmpty &&
          params.metrics.nonEmpty && params.metrics.forall(m =>
            m == Metric.Count || m == Metric.PrivacyIdCount))
        params.maxContributionsPerPartition.map(_.toLong)
      else None
    if (doSampling && countOnlyLinfCap.isEmpty) {
      params.maxContributions match {
        case Some(mc) => // L1 bounding: <= mc rows per pid across all partitions
          cur = sampleRowsPerKey(cur, Seq(PidCol), mc, shards)
        case None if needsLinfSampling(params) =>
          params.maxContributionsPerPartition.foreach { c =>
            cur = sampleRowsPerKey(cur, PidCol +: pkNames, c, shards)
          }
        case None => // Linf sampling unnecessary for this metric set
      }
    }

    // stage 5b: per-(pid, pk) partial accumulators — all native functions.
    // Window partitioned the data by (pid, pk) already, so this groupBy
    // reuses the exchange (no extra shuffle).
    val clipped = columns.value match {
      case Some(_) if !isVector && params.boundsPerContributionAreSet =>
        least(greatest(col(ValCol), lit(params.minValue.get)), lit(params.maxValue.get))
      case _ => col(ValCol)
    }
    val mid = if (params.boundsPerContributionAreSet) params.rangeMiddle else 0.0
    val scalarAccs =
      if (isVector)
        Seq(lit(0.0).as(SumCol), lit(0.0).as(NSumCol), lit(0.0).as(NSqCol))
      else {
        // the centered-moment accumulators only feed Mean/Variance: a
        // plain Count/Sum/PrivacyIdCount query otherwise pays two extra
        // per-row multiply+sum aggregates through BOTH aggregation stages
        // for columns the metrics UDF ignores (the vector branch's
        // lit(0.0) trick, applied per metric set)
        val needsMoments = params.metrics.exists(m =>
          m == Metric.Mean || m == Metric.Variance)
        // SumPart is the ONLY consumer of the sum accumulator — and it is
        // only BUILT when Sum is requested without Mean/Variance (those
        // subsume it from the centered moments) — so any other metric set
        // pays the lit(0.0) trick here too (r20). The count-only fast path
        // above RELIES on this: with sampling folded into least(count, c),
        // a live sum would aggregate unsampled rows.
        val needsSum = params.metrics.contains(Metric.Sum) && !needsMoments
        Seq(
          (if (!needsSum) lit(0.0)
           else if (params.boundsPerPartitionAreSet)
             least(greatest(sum(col(ValCol)), lit(params.minSumPerPartition.get)),
               lit(params.maxSumPerPartition.get))
           else sum(clipped)).as(SumCol),
          (if (needsMoments) sum(clipped - lit(mid)) else lit(0.0)).as(NSumCol),
          (if (needsMoments) sum((clipped - lit(mid)) * (clipped - lit(mid)))
           else lit(0.0)).as(NSqCol))
      }
    val extraAccs =
      quantile.map(q =>
        QuantileAgg.buildTree(q.lower, q.upper)(clipped).as(TreeCol)).toSeq ++
      // norm-clip AFTER the aggregation (semantically identical — the clip
      // applies to the per-(pid, pk) sum either way): clipVector references
      // its input twice (non-finite guard + value), and wrapping the
      // aggregate ran the vector-sum Aggregator TWICE per group (two
      // vectorsumaggregator calls visible in the plan)
      vector.map(_ => VectorOps.vecSum(col(ValCol)).as(VecCol)).toSeq
    // the count-only fast path folds the Linf bound into the aggregate:
    // least(count, c) == the sampled row count for EVERY rand draw
    val cntAcc = countOnlyLinfCap
      .map(c => least(count(lit(1)), lit(c)))
      .getOrElse(count(lit(1)))
    val perPidPk0 = cur
      .groupBy((col(PidCol) +: pkCols): _*)
      .agg(cntAcc.as(CntCol), scalarAccs ++ extraAccs: _*)
    val perPidPk = vector.map(v => perPidPk0.withColumn(VecCol,
      VectorOps.clipVector(col(VecCol), v.normKind, v.maxNorm)))
      .getOrElse(perPidPk0)

    // stage 5c: L0 bounding — sample <= maxPartitionsContributed partitions per pid
    val crossBounded =
      if (doSampling && params.maxContributions.isEmpty)
        sampleRowsPerKey(perPidPk, Seq(PidCol), params.maxPartitionsContributed, shards)
      else perPidPk

    // stages 6+8: drop pid, merge accumulators per pk (map-side combine free)
    val mergeExtra =
      quantile.map(q => QuantileAgg.mergeTrees(q.lower, q.upper)(col(TreeCol)).as(TreeCol)).toSeq ++
      vector.map(_ => VectorOps.vecSum(col(VecCol)).as(VecCol)).toSeq
    var agg = crossBounded
      .groupBy(pkCols: _*)
      .agg(
        sum(col(CntCol)).as(CntCol),
        Seq(
          sum(col(SumCol)).as(SumCol),
          sum(col(NSumCol)).as(NSumCol),
          sum(col(NSqCol)).as(NSqCol),
          count(lit(1)).as(PidCntCol) // one row per (pid, pk) => exact pid count
        ) ++ mergeExtra: _*)

    // stage 7: union empty accumulators for missing public partitions
    publicPartitions.foreach { pub =>
      val zeroExtra =
        quantile.map(_ => col(TreeCol)).toSeq ++ // null tree = empty tree
        vector.map(v => coalesce(col(VecCol),
          array_repeat(lit(0.0), v.vectorSize)).as(VecCol)).toSeq
      agg = pub.select(pkCols: _*).distinct().join(agg, pkNames, "left_outer").select(
        pkCols ++ Seq(
          coalesce(col(CntCol), lit(0L)).as(CntCol),
          coalesce(col(SumCol), lit(0.0)).as(SumCol),
          coalesce(col(NSumCol), lit(0.0)).as(NSumCol),
          coalesce(col(NSqCol), lit(0.0)).as(NSqCol),
          coalesce(col(PidCntCol), lit(0L)).as(PidCntCol)) ++ zeroExtra: _*)
    }

    // stage 9: DP partition selection (private partitions only)
    selector.foreach { sel =>
      val noiseSrc = noise
      val keepUdf = udf((n: Long) => sel.shouldKeep(n, noiseSrc)).asNondeterministic()
      agg = agg.filter(keepUdf(col(PidCntCol)))
    }

    // stage 10: compute DP metrics — one nondeterministic UDF emitting the
    // full metric vector so a single logical noise draw is never split
    // across column re-evaluations (SURVEY §7.4 hard-part 4)
    val comp = computer
    val metricsUdf = udf((cnt: Long, s: Double, ns: Double, nsq: Double, pc: Long) =>
      comp.compute(cnt, s, ns, nsq, pc)).asNondeterministic()
    val withMetrics = agg.withColumn(MetricsCol,
      metricsUdf(col(CntCol), col(SumCol), col(NSumCol), col(NSqCol), col(PidCntCol)))

    val metricCols = comp.names.zipWithIndex.map { case (n, i) =>
      col(MetricsCol).getItem(i).as(n)
    }
    val quantileCols = quantile.toSeq.flatMap { q =>
      val noiseSrc = noise
      val qUdf = udf((bytes: Array[Byte]) => q.compute(bytes, noiseSrc)).asNondeterministic()
      val qArr = qUdf(col(TreeCol))
      q.names.zipWithIndex.map { case (n, i) => qArr.getItem(i).as(n) }
    }
    val vectorCols = vector.toSeq.map { v =>
      val noiseSrc = noise
      val vUdf = udf((vec: Array[Double]) =>
        v.addNoise(if (vec == null || vec.isEmpty) new Array[Double](v.vectorSize) else vec,
          noiseSrc)).asNondeterministic()
      vUdf(col(VecCol)).as("vector_sum")
    }
    // stage 11: post-aggregation thresholding — the noised pid count IS the
    // release decision; under-threshold partitions yield null and are dropped
    // (reference: combiners.py:360-416, dp_engine.py:572-577)
    val postAggCols = postAggThresholding.toSeq.map { sel =>
      val noiseSrc = noise
      val thrUdf = udf((n: Long) =>
        sel.noisedValueIfShouldKeep(n, noiseSrc).map(Double.box).orNull)
        .asNondeterministic()
      thrUdf(col(PidCntCol)).as("privacy_id_count")
    }
    val out = withMetrics.select(
      pkCols ++ metricCols ++ quantileCols ++ vectorCols ++ postAggCols: _*)
    if (postAggThresholding.isDefined) out.filter(col("privacy_id_count").isNotNull) else out
  }
}
