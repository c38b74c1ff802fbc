package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataflow helpers that need more than a one-liner of native Spark
  * (the rest of SURVEY §2.A/2.B maps directly onto Dataset operators). */
object Dataflow {

  /** Skew-resilient filter_by_key (reference: the sharded variant of
    * pipeline_dp's filter_by_key; SURVEY §2.B): a plain left-semi join
    * funnels every row of a hot key through one task — here the probe side
    * gets a uniform salt in [0, shards) and the key side is replicated
    * across all shards, so each hot key spreads over `shards` tasks. The
    * output is identical to the unsalted semi-join (salting only changes the
    * physical distribution), at the cost of a `shards`-times larger key-side
    * shuffle — use for key lists that are small relative to the data but
    * match a skewed fraction of it. For mild skew prefer plain left_semi +
    * AQE skew handling. */
  def filterByKeySharded(
      df: DataFrame,
      keys: DataFrame,
      keyCols: Seq[String],
      shards: Int = 16
  ): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val salted = df.withColumn("__graft_salt", (rand() * shards).cast("int"))
    val replicated = keys.select(keyCols.map(col): _*).distinct()
      .withColumn("__graft_salt", explode(array((0 until shards).map(lit): _*)))
    salted.join(replicated, keyCols :+ "__graft_salt", "left_semi")
      .drop("__graft_salt")
  }
}
