package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ModelEvalSpec extends AnyFunSuite {
  lazy val spark = graft.spark.SparkTestSession.spark
  import spark.implicits._

  test("prCurve: hand-computed confusion counts, -1 sentinel, one-pass sweep") {
    // scores (milli): positives at 900, 600, 100; negatives at 800, -200
    val df = Seq((900L, true), (600L, true), (100L, true), (800L, false),
      (-200L, false)).toDF("s", "l")
    val r = ModelEval.prCurve(df, col("s"), col("l"), Seq(0L, 700L, 1000L))
      .collect().map(x => x.getLong(0) -> x).toMap
    // t=0: predict + for all but -200 -> tp=3 fp=1 fn=0 tn=1
    assert(r(0L).getAs[Long]("tp") == 3 && r(0L).getAs[Long]("fp") == 1)
    assert(r(0L).getAs[Long]("fn") == 0 && r(0L).getAs[Long]("tn") == 1)
    assert(r(0L).getAs[Long]("precision_e6") == 750000)
    assert(r(0L).getAs[Long]("recall_e6") == 1000000)
    // f1 = 2*3/(2*3+1+0) = 6/7 -> floor(6e6/7) = 857142
    assert(r(0L).getAs[Long]("f1_e6") == 857142)
    // t=700: + for 900, 800 -> tp=1 fp=1 fn=2 tn=1
    assert(r(700L).getAs[Long]("tp") == 1 && r(700L).getAs[Long]("fn") == 2)
    assert(r(700L).getAs[Long]("precision_e6") == 500000)
    assert(r(700L).getAs[Long]("recall_e6") == 333333)
    // t=1000: nothing predicted positive -> precision undefined -> -1
    assert(r(1000L).getAs[Long]("tp") == 0 && r(1000L).getAs[Long]("fp") == 0)
    assert(r(1000L).getAs[Long]("precision_e6") == -1L)
    assert(r(1000L).getAs[Long]("recall_e6") == 0)
    // duplicate thresholds rejected; NULL label fails loud
    intercept[IllegalArgumentException](
      ModelEval.prCurve(df, col("s"), col("l"), Seq(0L, 0L)))
    val bad = Seq((1L, Some(true)), (2L, None)).toDF("s", "l")
    val e = intercept[Exception](
      ModelEval.prCurve(bad, col("s"), col("l"), Seq(0L)).collect())
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("NULL label"))
  }

  test("calibrationBins: integer bin edges, out-of-range clamps, exact rates") {
    // bins over [0, 1000) x 4 -> width 250; scores: bin0 x2 (one pos),
    // bin3 x1 (pos), and out-of-range 1500 clamps into bin 3, -50 into bin 0
    val df = Seq((10L, true), (240L, false), (990L, true), (1500L, true),
      (-50L, false)).toDF("s", "l")
    val r = ModelEval.calibrationBins(df, col("s"), col("l"), 0L, 1000L, 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(0L, 3L)) // empty interior bins absent
    assert(r(0L).getAs[Long]("n") == 3 && r(0L).getAs[Long]("n_pos") == 1)
    assert(r(0L).getAs[Long]("pos_rate_e6") == 333333)
    // mean_score bin0 = (10 + 240 - 50) div 3 = 66
    assert(r(0L).getAs[Long]("mean_score") == 66)
    assert(r(3L).getAs[Long]("n") == 2 && r(3L).getAs[Long]("n_pos") == 2)
    assert(r(3L).getAs[Long]("pos_rate_e6") == 1000000)
    // mean keeps the raw (unclamped) score: (990 + 1500) div 2 = 1245
    assert(r(3L).getAs[Long]("mean_score") == 1245)
  }
}
