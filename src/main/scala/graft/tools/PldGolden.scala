package graft.tools

import graft.core._
import graft.core.MechanismType._

/** Dev scratch: print base noise stds for the reference's golden PLD
  * cases (budget_accounting_test.py:266-500) to pick honest spec
  * tolerances. Not part of the gate. */
object PldGolden {
  def main(args: Array[String]): Unit = {
    def run(name: String, eps: Double, delta: Double, expected: Double,
        ms: Seq[(Int, MechanismType, Double, Double)]): Unit = {
      val pess = sys.env.get("PLD_PESSIMISTIC").contains("1")
      val acc = new PLDBudgetAccountant(eps, delta, pldDiscretization = 1e-2,
        pessimistic = pess)
      val hs = ms.map { case (c, t, w, s) =>
        acc.requestBudget(t, weight = w, count = c, sensitivity = s)
      }
      acc.computeBudgets()
      val base = acc.baseNoiseStd.get
      println(f"$name%-28s base=$base%12.6f expected=$expected%12.6f diff=${base - expected}%+.4f")
      hs.zip(ms).foreach { case (h, (c, t, w, s)) =>
        val spec = h.spec
        println(f"    $t w=$w s=$s count=$c -> std=${spec.noiseStdDev.getOrElse(Double.NaN)}%.6f eps=${spec.epsilon}%.8f delta=${spec.delta}%.3e")
      }
    }
    run("standard_laplace", 4, 0, 0.7071067811865476,
      Seq((2, Laplace, 1, 1)))
    run("standard_laplace_weights", 4, 0, 1.4142135623730951,
      Seq((2, Laplace, 2, 1)))
    run("standard_laplace_sens", 3, 0, 0.9428090415820634,
      Seq((2, Laplace, 1, 3)))
    run("laplace_mechanisms", 0.168, 1e-3, 49.872,
      Seq((10, Laplace, 1, 1)))
    run("gaussian_mechanisms", 0.115, 1e-3, 50.25,
      Seq((10, Gaussian, 1, 1)))
    run("multiple_noise_kinds", 0.240, 1e-3, 49.73,
      Seq((5, Laplace, 1, 1), (5, Gaussian, 1, 1), (5, MechanismType.PartitionSelection, 1, 1)))
    run("multiple_weights", 1.873, 1e-5, 20.0,
      Seq((4, Laplace, 2, 1), (4, Gaussian, 4, 1)))
    run("generic", 0.22999925338484556, 1e-5, 6.41455078125,
      Seq((1, MechanismType.PartitionSelection, 1, 1)))
    run("generic_multiple", 0.6599974547358093, 1e-5, 6.71649169921875,
      Seq((3, MechanismType.PartitionSelection, 1, 1)))
  }
}
