package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Scale-regression guards: the corpus-prep operators' physical plans must
  * keep their audited shuffle counts — these shapes are what make them safe
  * at 100 TB, independent of what the optimizer does to the details. */
class CorpusOpsPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  private val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta beta beta"))
    .toDF("doc_id", "text")

  test("piiScrub and repetitionFeatures are zero-shuffle projections") {
    assert(exchanges(CorpusOps.piiScrub(docs, "text")) == 0)
    assert(exchanges(CorpusOps.repetitionFeatures(docs, "text")) == 0)
  }

  test("ngramContamination keeps the corpus side map-only (zero shuffles)") {
    val bench = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = CorpusOps.ngramContamination(docs, "text", bench, "text", 3)
    assert(exchanges(out) == 0,
      s"corpus side must not shuffle:\n${out.queryExecution.executedPlan}")
  }

  test("rangeJoin plans as an equi-join, never a cartesian range scan") {
    val points = (0L until 100L).map(i => (i, i * 5)).toDF("pid", "t")
    val ivs = Seq((1L, 0L, 100L), (2L, 200L, 400L)).toDF("wid", "lo", "hi")
    val plan = TemporalOps.rangeJoin(points, ivs, "t", "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"interval containment must ride the bucket equi-join:\n$plan")
  }

  test("duplicatedSpanStats shuffles 8-byte gram hashes, not gram strings") {
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 2)
    val plan = out.queryExecution.executedPlan.toString
    // every exchange below the frequency aggregate carries (doc_id, pos, h);
    // a plan that shuffles the gram text would show a string-typed hashpartitioning key
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(out.columns.toSeq == Seq("doc_id", "n_grams", "n_dup_grams",
      "dup_gram_frac", "covered_token_frac"))
  }

  test("stratifiedSample is exactly one partial-aggregate shuffle") {
    val df = (1L to 50L).map(i => (s"s${i % 3}", i)).toDF("grp", "id")
    val out = CorpusOps.stratifiedSample(df, "grp", "id", k = 5)
    assert(exchanges(out) == 1,
      s"expected one exchange carrying <= k rows per (stratum, task):\n${out.queryExecution.executedPlan}")
  }

  test("prepPipeline is a zero-shuffle single-scan projection") {
    assert(exchanges(CorpusOps.prepPipeline(docs, "doc_id", "text")) == 0)
  }

  test("snapshotDiff/tableDiff: one exchange per side, join reuses it (r19 audit pin)") {
    // The full-outer reconciliation ops' scale contract: each side
    // shuffles ONCE on the id/key (the dup-guard window / aggregate
    // partitioning), and the join reuses that partitioning instead of
    // injecting a second per-side exchange. r18 fixed exactly this in
    // snapshotDiff (an id-rewriting guard projection broke the
    // co-partitioning proof); this spec pins the shape for BOTH ops so a
    // future edit cannot silently reintroduce the double shuffle. Hot-key
    // skew cannot occur by contract (duplicate ids/keys raise), so two
    // id-partitioned exchanges IS the whole data movement.
    val old = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "h")
    val neu = Seq((2L, "b2", 21L), (3L, "c", 30L)).toDF("id", "v", "h")
    val sd = CorpusOps.snapshotDiff(old, neu, "id", Seq("v", "h"))
    assert(exchanges(sd) == 2,
      s"snapshotDiff must shuffle each side exactly once:\n${sd.queryExecution.executedPlan}")
    val td = CorpusOps.tableDiff(old, neu, Seq("id"))
    assert(exchanges(td) == 2,
      s"tableDiff must shuffle each side exactly once:\n${td.queryExecution.executedPlan}")
    // and neither degenerates into a broadcast-then-recompute or cartesian
    Seq(sd, td).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    }
  }

  test("vocabTopK: one shuffle with partial counts, top-k never a global sort") {
    val plan = CorpusOps.vocabTopK(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, s"one exchange expected:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"map-side combine expected:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"bounded top-k expected:\n$plan")
    assert(!plan.contains("Sort "), s"no global sort expected:\n$plan")
  }
}
