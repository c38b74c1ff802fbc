package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SparseVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zero noise: above iff v >= T, first-c releases, halt, draw accounting") {
    // order q1..q6; T = 4, c = 2: q1 above (release 1), q2 below,
    // q3 above (release 2 -> HALT), q4-q6 unanswered regardless of value
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 6.0), (4L, 7.0), (5L, 2.0),
      (6L, 8.0)).toDF("qid", "v")
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object CountingZero extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter.incrementAndGet(); 0.0 }
      def gaussian(sigma: Double): Double = 0.0
      def uniform(): Double = 0.5
    }
    val out = SparseVector.aboveThreshold(df, "qid", col("v"),
        threshold = 4.0, epsilon = 1.0, sensitivity = 1.0, c = 2,
        noise = CountingZero)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("above", 0L))
    assert(out(2L) == ("below", 1L))
    assert(out(3L) == ("above", 1L))
    assert(out(4L) == ("unanswered", 2L))
    assert(out(5L) == ("unanswered", 2L))
    assert(out(6L) == ("unanswered", 2L))
    // draw-once accounting: 1 initial rho + 3 answered-query nus +
    // 1 redraw (after release 1 only — the c-th release never redraws,
    // and unanswered queries draw NOTHING)
    assert(counter.get == 5L, s"draws = ${counter.get}")
    // the boundary is >= (a value exactly at T releases)
    val eq = SparseVector.aboveThreshold(Seq((1L, 4.0)).toDF("qid", "v"),
      "qid", col("v"), 4.0, 1.0, 1.0, 1, graft.core.NoiseSource.Zero)
      .collect().head
    assert(eq.getString(1) == "above")
    // default: only the bit escapes — noisy_value NULL everywhere
    assert(eq.isNullAt(3))
    // NUMERIC arm: released values carry Lap(c*sens/valueEpsilon) noise
    // (zero noise => the exact value, above rows only)
    val num = SparseVector.aboveThreshold(df, "qid", col("v"), 4.0,
        1.0, 1.0, 2, graft.core.NoiseSource.Zero, valueEpsilon = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(num(1L) == ("above", Some(5.0)))
    assert(num(3L) == ("above", Some(6.0)))
    assert(num(2L)._2.isEmpty && num(4L)._2.isEmpty)
  }

  test("contracts fail loud: duplicate ids, NULL value, NULL id, bad params") {
    val dup = Seq((1L, 5.0), (1L, 2.0)).toDF("qid", "v")
    val e = intercept[Exception](SparseVector.aboveThreshold(dup, "qid",
      col("v"), 4.0, 1.0, 1.0, 1, graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(e).contains("duplicate query ids"))
    val e2 = intercept[Exception](SparseVector.aboveThreshold(
      Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("qid", "v"),
      "qid", col("v"), 4.0, 1.0, 1.0, 1, graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(e2).contains("NULL query value"))
    val e3 = intercept[Exception](SparseVector.aboveThreshold(
      Seq((null.asInstanceOf[java.lang.Long], 1.0)).toDF("qid", "v"),
      "qid", col("v"), 4.0, 1.0, 1.0, 1, graft.core.NoiseSource.Zero))
    assert(SparkTestSession.chainMsg(e3).contains("NULL query id"))
    intercept[IllegalArgumentException](SparseVector.aboveThreshold(dup,
      "qid", col("v"), 4.0, 0.0, 1.0, 1, graft.core.NoiseSource.Zero))
    intercept[IllegalArgumentException](SparseVector.aboveThreshold(dup,
      "qid", col("v"), 4.0, 1.0, 1.0, 0, graft.core.NoiseSource.Zero))
  }

  test("real randomizer: halts at <= c releases; huge epsilon converges to exact; explain") {
    val df = (1 to 200).map(i => (i.toLong,
      if (i % 5 == 0) 100.0 else 0.0)).toDF("qid", "v")
    // tiny epsilon: noisy, but NEVER more than c above-answers
    val noisy = SparseVector.aboveThreshold(df, "qid", col("v"), 50.0,
        epsilon = 0.05, sensitivity = 1.0, c = 5,
        noise = graft.core.NoiseSource.Seeded(31L))
      .filter(col("answer") === "above").count()
    assert(noisy <= 5L, s"released $noisy > c")
    // huge epsilon: the noise scales vanish and the release equals the
    // deterministic rule (values are 0/100 with T = 50 — far from noise)
    val sharp = SparseVector.aboveThreshold(df, "qid", col("v"), 50.0,
        epsilon = 1e6, sensitivity = 1.0, c = 5,
        noise = graft.core.NoiseSource.Seeded(32L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // first 5 multiples of 5 release; everything after the 25th query
    // is unanswered
    (1 to 25).foreach { i =>
      val want = if (i % 5 == 0) "above" else "below"
      assert(sharp(i.toLong) == want, s"q$i: ${sharp(i.toLong)}")
    }
    (26 to 200).foreach { i =>
      assert(sharp(i.toLong) == "unanswered", s"q$i: ${sharp(i.toLong)}") }
    val rep = SparseVector.explainAboveThreshold(1.0, 1.0, 7)
    assert(rep.contains("c = 7") && rep.contains("halts"))
    assert(rep.contains("one bit per answered query"))
  }
}
