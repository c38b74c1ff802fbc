package graft.spark

import graft.core.BudgetAccountant

/** ONE engine-level explain surface (r19 verdict stretch): every release
  * family already renders its own mechanism-level story — the per-stage
  * [[DPResult.explainReport]] (reference: report_generator.py:46-116),
  * [[RangeTree.explainRelease]] / [[RangeTree.explainRelease2D]],
  * [[LocalDP.explainFrequency]] / [[LocalDP.explainFrequencyOLH]] /
  * [[LocalDP.explainHeavyHitters]] / [[LocalDP.explainShuffle]],
  * [[SparseVector.explainAboveThreshold]], and a
  * [[CustomCombiner]]'s `explainBudget` — while the accountant holds the
  * composition story ([[BudgetAccountant.budgetStory]]: every registered
  * mechanism with its resolved epsilon/delta/noise scale). This object
  * stitches the two halves into one numbered document, so a reviewer
  * reads the END-TO-END budget narrative of a session from a single
  * call:
  *
  * {{{
  * val acct   = new NaiveBudgetAccountant(totalEpsilon = 2.0, totalDelta = 1e-6)
  * val engine = new DPEngine(acct)
  * val counts = engine.aggregate(df, params, cols)     // release 1
  * val treeH  = acct.requestTreeRelease(bins = 64,
  *   NoiseKind.Laplace, name = "value histogram tree")
  * acct.computeBudgets()
  * println(Explain.explain(acct,
  *   counts.explainReport,
  *   RangeTree.explainRelease(bins = 64, epsilon = treeH.handle.spec.epsilon,
  *     maxPerUnit = 1)))
  * }}}
  */
object Explain {

  /** Compose any number of per-release explain sections with the
    * accountant's budget story. Empty sections are dropped; the
    * composition section always closes the document. */
  def explain(accountant: BudgetAccountant, sections: String*): String = {
    val parts = sections.filter(_.trim.nonEmpty).zipWithIndex.map {
      case (s, i) => s"== Release ${i + 1} ==\n${s.trim}"
    }
    (parts :+ ("== Composition ==\n" + accountant.budgetStory))
      .mkString("\n\n")
  }

  /** The common one-result case: its per-stage report + the budget
    * story of the accountant it ran under. */
  def explain(result: DPResult, accountant: BudgetAccountant): String =
    explain(accountant, result.explainReport)
}
