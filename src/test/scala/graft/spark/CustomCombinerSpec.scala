package graft.spark

import graft.core._
import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A user combiner: DP sum of squares with per-contribution square clipping.
  * (the reference's CustomCombiner extension point, exercised end-to-end) */
final class DpSquareSumCombiner(maxSquare: Double, l0: Int, cPerPartition: Int) extends CustomCombiner {
  def name: String = "dp_square_sum"
  private var handle: BudgetHandle = _

  def requestBudget(accountant: BudgetAccountant): Unit =
    handle = accountant.requestBudget(MechanismType.Laplace, name = name)

  def createAccumulators(value: Column): Seq[Column] =
    Seq(sum(least(value * value, lit(maxSquare))))

  def mergeAccumulators(accs: Seq[Column]): Seq[Column] = Seq(sum(accs.head))

  def computeMetrics(accs: Seq[Column], noise: NoiseSource): Seq[Column] = {
    val mech = Mechanisms.createAdditive(handle.spec,
      Sensitivities(l0 = Some(l0), linf = Some(maxSquare * cPerPartition)))
    val noiseUdf = udf((v: Double) => mech.addNoise(v, noise)).asNondeterministic()
    Seq(noiseUdf(accs.head))
  }

  def metricNames: Seq[String] = Seq("square_sum")
  def explainBudget: String = {
    val s = handle.spec
    f"$name: Laplace eps=${s.epsilon}%.4g"
  }
}

class CustomCombinerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("user combiner runs through the engine with its own budget line") {
    val df = Seq(
      ("u1", "A", 2.0), ("u1", "A", 10.0), // 10^2 clipped to 25
      ("u2", "A", 3.0), ("u2", "B", 1.0)
    ).toDF("uid", "pk", "v")
    val acc = new NaiveBudgetAccountant(1e5, 0.999999)
    val engine = new DPEngine(acc, NoiseSource.Zero)
    val combiner = new DpSquareSumCombiner(maxSquare = 25.0, l0 = 2, cPerPartition = 10)
    val res = CustomAggregation.aggregate(engine, df,
      CustomAggParams(maxPartitionsContributed = 2, maxContributionsPerPartition = Some(10)),
      DPColumns(col("uid"), Seq("pk" -> col("pk")), Some(col("v"))), combiner)
    acc.computeBudgets()
    val out = res.dataframe.collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[Double]("square_sum")).toMap
    assert(out("A") == 4.0 + 25.0 + 9.0) // u1: 4 + clipped 25; u2: 9
    assert(out("B") == 1.0)
    // the combiner's budget line appears in the explain report
    assert(res.explainReport.contains("dp_square_sum: Laplace eps="))
    assert(res.explainReport.contains("Partition selection"))
  }

  test("budget scope normalizes weights of requests made inside") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    val outside = acc.requestBudget(MechanismType.Laplace, weight = 1.0)
    val (in1, in2) = acc.scope(1.0) {
      val a = acc.requestBudget(MechanismType.Laplace, weight = 3.0)
      val b = acc.requestBudget(MechanismType.Laplace, weight = 1.0)
      (a, b)
    }
    acc.computeBudgets()
    // scope total weight 1.0 => in1 weight 0.75, in2 0.25; outside 1.0;
    // eps split proportional over total weight 2.0
    assert(math.abs(outside.spec.epsilon - 0.5) < 1e-12)
    assert(math.abs(in1.spec.epsilon - 0.375) < 1e-12)
    assert(math.abs(in2.spec.epsilon - 0.125) < 1e-12)
  }

  test("nested scopes: inner normalized first, then rescaled by outer") {
    val acc = new NaiveBudgetAccountant(1.0, 1e-6)
    val (h1, h2, h3) = acc.scope(1.0) {
      val a = acc.requestBudget(MechanismType.Laplace, weight = 1.0)
      val (b, c) = acc.scope(1.0) {
        (acc.requestBudget(MechanismType.Laplace, weight = 1.0),
         acc.requestBudget(MechanismType.Laplace, weight = 3.0))
      }
      (a, b, c)
    }
    acc.computeBudgets()
    // inner scope -> b=0.25, c=0.75; outer scope total = 1 + 1 = 2 -> x0.5:
    // a=0.5, b=0.125, c=0.375; eps proportional (total weight 1.0)
    assert(math.abs(h1.spec.epsilon - 0.5) < 1e-12)
    assert(math.abs(h2.spec.epsilon - 0.125) < 1e-12)
    assert(math.abs(h3.spec.epsilon - 0.375) < 1e-12)
  }
}
