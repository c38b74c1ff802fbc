package graft

import graft.analysis._
import graft.core._
import graft.ops._
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
  import EntryHelpers._

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
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryDP.queries ++
    EntryDataflow.queries ++
    EntryText.queries ++
    EntryDedup.queries ++
    EntrySim.queries ++
    EntryCorpus.queries ++
    EntryStream.queries ++
    EntryEvents.queries

  /** DuckDB-equivalent SQL for each query (same parquet tables, table names
    * without path — driver mounts them). Column names and arithmetic shape
    * mirror the Spark plans exactly (see scaladoc above). */
  def oracleSql: Map[String, String] =
    EntryDP.oracleSql ++
    EntryDataflow.oracleSql ++
    EntryText.oracleSql ++
    EntryDedup.oracleSql ++
    EntrySim.oracleSql ++
    EntryCorpus.oracleSql ++
    EntryStream.oracleSql ++
    EntryEvents.oracleSql
}
