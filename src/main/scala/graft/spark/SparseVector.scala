package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARSE VECTOR TECHNIQUE (AboveThreshold / Sparse — Dwork-Roth, "The
  * Algorithmic Foundations of Differential Privacy" §3.6, Algs. 1-2):
  * given an ORDERED stream of low-sensitivity queries, privately release
  * WHICH of them exceed a threshold — paying budget only for the (at
  * most `c`) above-answers, not per query. The primitive the rest of the
  * engine lacks: every other mechanism here pays for what it answers;
  * SVT pays for what it FINDS, so a pipeline can scan thousands of
  * candidate hypotheses ("is any region's error above tolerance?",
  * "which candidate n-grams clear the frequency floor?") under a budget
  * that scales with the number of HITS.
  *
  * Mechanism (the textbook calibration): threshold noise rho =
  * Lap(c * sensitivity / eps1) drawn once and REDRAWN after every
  * above-answer; per-query noise nu_i = Lap(2c * sensitivity / eps2);
  * release "above" iff v_i + nu_i >= T + rho; HALT after the c-th
  * above-answer (later queries are 'unanswered' — asking more would be
  * unpaid-for). eps = eps1 + eps2 with the standard equal split. The
  * whole stream costs (eps, 0)-DP regardless of its length.
  *
  * Execution shape (the quantile-tree-walk convention): the query
  * VALUES are data-shaped work computed DISTRIBUTED upstream (counts,
  * errors, masses — whatever the caller aggregates); what reaches this
  * function is one bounded row per candidate query (guarded collect,
  * [[RangeTree.MaxDriverRows]]), and the mechanism itself is the
  * inherently SEQUENTIAL driver loop — each comparison depends on how
  * many releases precede it, so a distributed formulation would be a
  * fiction. Draws happen exactly once per query plus once per release
  * (draw-once is the loop's construction, spec-pinned with a counting
  * source).
  *
  * Zero noise ([[graft.core.NoiseSource.Zero]] — laplace(b) = 0):
  * "above" iff v_i >= T, first c hits in query order answered, the rest
  * of the stream after the c-th hit 'unanswered' — a deterministic
  * function of the exact values that a SQL window replays (the gate
  * anchor); the statistical behavior runs under the real source in
  * specs.
  *
  * Ordering contract: `idCol` defines the query order (ascending,
  * fail-loud on duplicates) — SVT's guarantee is for a FIXED query
  * sequence chosen independently of the data. */
object SparseVector {

  /** Output: one row per query — (query id, value released as NOTHING
    * (the point of SVT: only the bit escapes), answer in
    * {'above', 'below', 'unanswered'}, n_released_before). */
  /** `valueEpsilon > 0` adds the NUMERIC arm (Dwork-Roth's NumericSparse
    * shape by basic composition): each of the <= c released above-answers
    * additionally carries its value + Lap(c * sensitivity / valueEpsilon)
    * (c releases compose in L1), spending `valueEpsilon` ON TOP of
    * `epsilon`; below/unanswered queries release NULL. With
    * valueEpsilon = 0 (default) the noisy_value column is NULL
    * everywhere — only the bit escapes. */
  def aboveThreshold(
      queries: DataFrame,
      idCol: String,
      valueCol: Column,
      threshold: Double,
      epsilon: Double,
      sensitivity: Double,
      c: Int,
      noise: graft.core.NoiseSource,
      valueEpsilon: Double = 0.0
  ): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(sensitivity > 0, s"sensitivity must be positive, got $sensitivity")
    require(c >= 1, s"c (max above-answers) must be >= 1, got $c")
    require(valueEpsilon >= 0, s"valueEpsilon must be >= 0, got $valueEpsilon")
    val spark0 = queries.sparkSession
    val checkedV = when(valueCol.isNull, raise_error(lit(
        "aboveThreshold: NULL query value — a null cannot compare " +
          "against the threshold; filter or impute upstream")).cast("double"))
      .otherwise(valueCol.cast("double"))
    val checkedId = when(col(idCol).isNull, raise_error(lit(
        s"aboveThreshold: NULL query id '$idCol' — the id defines the " +
          "SVT query ORDER; assign ids upstream")).cast(
        queries.schema(idCol).dataType))
      .otherwise(col(idCol))
    val rows = RangeTree.boundedCollect(
      queries.select(checkedId.as("__qid"), checkedV.as("__v"))
        .sort(col("__qid")),
      "aboveThreshold: candidate queries")
    require(rows.map(_.get(0)).distinct.length == rows.length,
      "aboveThreshold: duplicate query ids — the id must define a " +
        "strict query order (SVT's guarantee is per fixed sequence)")
    // the textbook split + scales: eps1 = eps2 = eps/2;
    // rho ~ Lap(c*sens/eps1) redrawn per release, nu ~ Lap(2c*sens/eps2)
    val eps1 = epsilon / 2.0
    val eps2 = epsilon - eps1
    val bRho = c * sensitivity / eps1
    val bNu = 2.0 * c * sensitivity / eps2
    val bVal = if (valueEpsilon > 0) c * sensitivity / valueEpsilon else 0.0
    var rho = noise.laplace(bRho)
    var released = 0
    val out = new Array[org.apache.spark.sql.Row](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val (answer, before, value) =
        if (released >= c) ("unanswered", released, null)
        else {
          val nu = noise.laplace(bNu)
          if (r.getDouble(1) + nu >= threshold + rho) {
            val b = released
            released += 1
            if (released < c) rho = noise.laplace(bRho) // redraw after a hit
            val v = if (valueEpsilon > 0)
              Double.box(r.getDouble(1) + noise.laplace(bVal)) else null
            ("above", b, v)
          } else ("below", released, null)
        }
      out(i) = org.apache.spark.sql.Row(r.get(0), answer, before.toLong, value)
      i += 1
    }
    import scala.jdk.CollectionConverters._
    spark0.createDataFrame(
      new java.util.ArrayList(out.toSeq.asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          queries.schema(idCol).dataType, nullable = false),
        org.apache.spark.sql.types.StructField("answer",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_released_before",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("noisy_value",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** Human-readable SVT report — the explain convention: the split, both
    * noise scales, the halt rule, and what leaks (one bit per answered
    * query, nothing per unanswered). Pure string math. */
  def explainAboveThreshold(epsilon: Double, sensitivity: Double,
      c: Int): String = {
    require(epsilon > 0 && sensitivity > 0 && c >= 1,
      "epsilon/sensitivity must be positive and c >= 1")
    val bRho = c * sensitivity / (epsilon / 2.0)
    val bNu = 2.0 * c * sensitivity / (epsilon - epsilon / 2.0)
    s"""Sparse Vector (AboveThreshold, c = $c)
       |  budget    : (${f"$epsilon%g"}, 0)-DP for the WHOLE query stream, any length — eps1 = eps2 = eps/2
       |  threshold : + Lap(c*sens/eps1), scale ${f"$bRho%g"}; redrawn after every above-answer
       |  queries   : + Lap(2c*sens/eps2), scale ${f"$bNu%g"} per comparison
       |  halts     : after the ${c}th 'above' — later queries release NOTHING ('unanswered')
       |  leaks     : one bit per answered query; values never leave the mechanism
       |""".stripMargin
  }
}
