package graft.spark

import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DP set union (Gopi et al. ICML 2020) — the vocabulary-release
  * mechanism over (privacy unit, item) pairs. */
class DPSetUnionSpec extends AnyFunSuite {
  lazy val spark = graft.spark.SparkTestSession.spark
  import spark.implicits._

  private def engine() = new DPEngine(
    new NaiveBudgetAccountant(2.0, 1e-6), NoiseSource.Zero)

  // 400 units all carrying "common"; units 0..9 also carry a rare item;
  // unit 0 additionally carries a UNIQUE item
  private def pairs = (0 until 400).flatMap { u =>
    Seq((u.toLong, "common")) ++
      (if (u < 10) Seq((u.toLong, "rare")) else Nil) ++
      (if (u == 0) Seq((0L, "unique-secret")) else Nil)
  }.toDF("uid", "item")

  test("zero-noise release: common item survives, rare and unique drop") {
    val e = engine()
    // constant 1/4 weighting, threshold = 1 + 0.5*ln(1/2e-6) = 7.5612:
    // common: 400/4 = 100 >= 7.56 -> kept; rare: 10/4 = 2.5 -> dropped;
    // unique: 1/4 -> dropped
    val res = e.setUnion(pairs, SetUnionParams(maxItemsPerUnit = 4),
      col("uid"), col("item"))
    e.accountant.computeBudgets()
    val out = res.dataframe.collect().map(_.getString(0)).toSet
    assert(out == Set("common"), s"got $out")
    // the DP property's shape at zero noise: a single unit's fresh item
    // carries weight <= 1 < threshold, so it can NEVER release without
    // noise crossing — the set stays clean of unique secrets by margin
    assert(!out.contains("unique-secret"))
    // the report/explain surface names the mechanism
    assert(res.explainReport.contains("setUnion") &&
      res.explainReport.contains("set-union selection"))
  }

  test("uniform weighting is tighter: few-item units push their items harder") {
    // 10 units carrying ONLY item "focus": uniform weight = 1/1 = 1 each
    // -> sum 10 >= 7.56 releases; constant 1/4 -> 2.5 drops. The policy
    // difference is exactly the paper's point.
    val df = (0 until 10).map(u => (u.toLong, "focus")).toDF("uid", "item")
    val eU = engine()
    val rU = eU.setUnion(df, SetUnionParams(maxItemsPerUnit = 4,
      weighting = SetUnionWeighting.Uniform), col("uid"), col("item"))
    eU.accountant.computeBudgets()
    assert(rU.dataframe.collect().map(_.getString(0)).toSet == Set("focus"))
    val eC = engine()
    val rC = eC.setUnion(df, SetUnionParams(maxItemsPerUnit = 4),
      col("uid"), col("item"))
    eC.accountant.computeBudgets()
    assert(rC.dataframe.collect().isEmpty)
  }

  test("gaussian policy, bounding determinism, null item fails loud") {
    // Gaussian arm: sigma/threshold from the weighted Gaussian selector;
    // zero noise keeps the common item (400/sqrt(4) = 200 >> threshold)
    val eG = engine()
    val rG = eG.setUnion(pairs, SetUnionParams(maxItemsPerUnit = 4,
      noiseKind = NoiseKind.Gaussian), col("uid"), col("item"))
    eG.accountant.computeBudgets()
    assert(rG.dataframe.collect().map(_.getString(0)).toSet == Set("common"))
    // deterministic bounding: a unit over the cap keeps the FIRST items
    // by sort order — so 'aaa' survives the cap-1 bound, 'zzz' never
    // does, and two runs release identically
    val over = Seq((1L, "zzz"), (1L, "aaa"), (2L, "aaa"), (3L, "aaa"),
      (4L, "aaa"), (5L, "aaa"), (6L, "aaa"), (7L, "aaa"), (8L, "aaa"),
      (9L, "aaa"), (10L, "aaa"), (11L, "aaa"))
      .toDF("uid", "item")
    def release() = {
      val e2 = engine()
      val r2 = e2.setUnion(over, SetUnionParams(maxItemsPerUnit = 1,
        weighting = SetUnionWeighting.Uniform), col("uid"), col("item"))
      e2.accountant.computeBudgets()
      r2.dataframe.collect().map(_.getString(0)).toSet
    }
    assert(release() == Set("aaa"))
    assert(release() == Set("aaa"), "bounded release not deterministic")
    // null items fail loud
    val eN = engine()
    val rN = eN.setUnion(Seq((1L, null.asInstanceOf[String]))
        .toDF("uid", "item"),
      SetUnionParams(maxItemsPerUnit = 2), col("uid"), col("item"))
    eN.accountant.computeBudgets()
    val ex = intercept[Exception](rN.dataframe.collect())
    assert(graft.spark.SparkTestSession.chainMsg(ex).contains("NULL item"))
  }
}
