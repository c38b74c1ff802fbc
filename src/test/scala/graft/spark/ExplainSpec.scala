package graft.spark

import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r19 engine-level explain surface: one call renders the end-to-end
  * budget narrative — per-release mechanism sections + the accountant's
  * composition story. */
class ExplainSpec extends AnyFunSuite {
  lazy val spark = graft.spark.SparkTestSession.spark
  import spark.implicits._

  test("explain composes release sections with the resolved budget story") {
    val acct = new NaiveBudgetAccountant(totalEpsilon = 2.0, totalDelta = 1e-6)
    val engine = new DPEngine(acct, NoiseSource.Zero)
    val df = (1 to 300).map(i => (i.toLong % 50, s"k${i % 3}", i.toDouble))
      .toDF("uid", "pk", "v")
    val counts = engine.aggregate(df,
      AggregateParams(metrics = Seq(Metric.Count),
        maxPartitionsContributed = 2,
        maxContributionsPerPartition = Some(5)),
      DPColumns(col("uid"), Seq("pk" -> col("pk")), None))
    val treeH = acct.requestTreeRelease(bins = 64, NoiseKind.Laplace,
      name = "value histogram tree")

    // BEFORE resolution the story says so explicitly and still lists
    // every registered mechanism (engine mechanisms + the tree)
    val early = acct.budgetStory
    assert(early.contains("NOT yet resolved"))
    assert(early.contains("value histogram tree"))

    acct.computeBudgets()
    val doc = Explain.explain(acct,
      counts.explainReport,
      RangeTree.explainRelease(bins = 64,
        epsilon = treeH.handle.spec.epsilon, maxPerUnit = 1),
      LocalDP.explainFrequency(k = 8, epsilon = 1.0, nReports = 100000L))

    // the numbered release sections all made it in, in order
    assert(doc.contains("== Release 1 ==") && doc.contains("== Release 2 ==")
      && doc.contains("== Release 3 =="))
    assert(doc.indexOf("== Release 1 ==") < doc.indexOf("== Release 2 =="))
    // section contents: the engine's per-stage report, the tree math,
    // the LDP calibration
    assert(doc.contains("DPEngine.aggregate"))
    assert(doc.contains("Contribution bounding"))
    // the composition section closes the document with resolved numbers
    val comp = doc.substring(doc.indexOf("== Composition =="))
    assert(comp.contains("NaiveBudgetAccountant"))
    assert(comp.contains("total budget: epsilon = 2.0"))
    assert(comp.contains("value histogram tree"))
    assert(comp.contains("-> epsilon ="),
      s"resolved per-mechanism epsilons missing:\n$comp")
    // every registered mechanism shows up exactly once, numbered
    val nMechanisms = "\\n  \\d+\\. ".r.findAllIn(comp).length
    assert(nMechanisms >= 2, s"expected >= 2 mechanism lines:\n$comp")
    // the one-result overload is the two-section document
    val single = Explain.explain(counts, acct)
    assert(single.contains("== Release 1 ==")
      && single.contains("== Composition =="))
    // empty sections are dropped, never rendered as blank releases
    val noBlank = Explain.explain(acct, "", counts.explainReport)
    assert(noBlank.contains("== Release 1 ==")
      && !noBlank.contains("== Release 2 =="))
  }
}
