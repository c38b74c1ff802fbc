package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // every failure mode planted once: a null id, a duplicate key, an
  // out-of-range value, an off-domain category, a pattern breaker, and a
  // row failing the generic predicate via NULL (must count as violation)
  def df = Seq(
    (Some(1L), "k1", Some(5.0), "click", Some(10.0)),
    (Some(2L), "k2", Some(500.0), "view", Some(20.0)),   // out of range
    (None, "k3", Some(5.0), "click", Some(30.0)),        // null id
    (Some(4L), "k3", None, "Signup!", Some(40.0)),       // dup key, null value, bad cat+pattern
    (Some(5L), "k4", Some(6.0), "click", None)           // null predicate input
  ).toDF("id", "key", "v", "cat", "amt")

  def checks = Seq(
    NotNull("id_complete", col("id")),
    Unique("key_unique", Seq(col("key"))),
    InRange("v_range", col("v"), 0.0, 100.0),
    ContainedIn("cat_domain", col("cat"), Seq("click", "view")),
    MatchesPattern("cat_shape", col("cat"), "^[a-z]+$"),
    Satisfies("amt_cap", col("amt") <= 35.0))

  test("verify: one row per check, exact counts, Deequ null semantics") {
    val out = DataQuality.verify(df, checks)
      .collect().map(r => r.getString(1) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out("id_complete") == (("not_null", 5L, 1L, false)))
    assert(out("key_unique") == (("unique", 5L, 1L, false)))
    // the NULL v row is NOT an in_range violation (value checks skip nulls)
    assert(out("v_range") == (("in_range", 5L, 1L, false)))
    assert(out("cat_domain") == (("contained_in", 5L, 1L, false)))
    assert(out("cat_shape") == (("matches_pattern", 5L, 1L, false)))
    // NULL predicate input (amt null) counts as a violation alongside 40 > 35
    assert(out("amt_cap") == (("satisfies", 5L, 2L, false)))
    assert(out.size == 6)
  }

  test("maxViolations threshold and declaration-order indexing") {
    val out = DataQuality.verify(df, checks, maxViolations = 1L)
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getString(1)).toSeq == checks.map(_.name))
    // with 1 allowed, every 1-violation check passes; the 2-violation fails
    val passed = out.map(r => r.getString(1) -> r.getBoolean(5)).toMap
    assert(passed.count(_._2) == 5 && !passed("amt_cap"))
    // a fully clean frame passes everything
    val clean = DataQuality.verify(
      Seq((1L, "a", 1.0, "click", 1.0)).toDF("id", "key", "v", "cat", "amt"),
      checks).collect()
    assert(clean.forall(_.getBoolean(5)))
    intercept[IllegalArgumentException](DataQuality.verify(df, Seq.empty))
    // per-group face: per-key counts, same semantics
    val grouped = DataQuality.verifyByGroup(
      df.withColumn("grp", when(col("id") <= 2L, "g1").otherwise("g2")),
      Seq("grp" -> col("grp")), Seq(NotNull("id_complete", col("id"))))
      .collect().map(r => (r.getString(0), r.getString(2)) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    assert(grouped(("g1", "id_complete")) == ((2L, 0L)))
    assert(grouped(("g2", "id_complete")) == ((3L, 1L))) // the null id is > 2
    intercept[IllegalArgumentException](
      DataQuality.verifyByGroup(df, Seq.empty,
        Seq(NotNull("x", col("id")))))
    intercept[IllegalArgumentException](
      DataQuality.verifyByGroup(df, Seq("passed" -> col("key")),
        Seq(NotNull("x", col("id")))))
    intercept[IllegalArgumentException](
      DataQuality.verify(df, checks :+ NotNull("id_complete", col("id"))))
    intercept[IllegalArgumentException](
      DataQuality.verify(df, checks, maxViolations = -1L))
  }

  test("profileColumns: exact counts, typed extremes, sentinels, validation") {
    val pdf = Seq(
      (Some(3L), Some(2.7), Some("beta")),
      (Some(1L), Some(-1.2), Some("alpha")),
      (Some(3L), None, None),
      (None, Some(9.9), Some("alpha"))
    ).toDF("num", "dbl", "str")
    val prof = DataQuality.profileColumns(pdf, Seq("num", "dbl", "str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = prof("num")
    assert(num.getString(1) == "bigint")
    assert(num.getLong(2) == 4 && num.getLong(3) == 1) // n_rows, n_null
    assert(num.getLong(4) == 2)                        // distinct {1, 3}
    assert(num.getLong(5) == 1 && num.getLong(6) == 3) // min, max
    assert(num.getLong(7) == 7)                        // sum 3+1+3
    assert(num.getString(8) == "" && num.getString(9) == "") // sentinels
    val dbl = prof("dbl")
    // floor integerization: {2, -2, 9}; distinct 3; sum 9
    assert(dbl.getString(1) == "double")
    assert(dbl.getLong(3) == 1 && dbl.getLong(4) == 3)
    assert(dbl.getLong(5) == -2 && dbl.getLong(6) == 9 && dbl.getLong(7) == 9)
    val str = prof("str")
    assert(str.getString(1) == "string")
    assert(str.getLong(3) == 1 && str.getLong(4) == 2) // null; {alpha, beta}
    assert(str.getString(8) == "alpha" && str.getString(9) == "beta")
    assert(str.getLong(5) == 0 && str.getLong(6) == 0 && str.getLong(7) == 0)
    // integral exactness past 2^53: snowflake-style ids must not round
    // through a double (adjacent ids would collapse in n_distinct)
    val big = Seq(9007199254740992L, 9007199254740993L, 9007199254740993L)
      .toDF("id") // 2^53 and 2^53+1: indistinguishable as doubles
    val bigProf = DataQuality.profileColumns(big, Seq("id")).collect().head
    assert(bigProf.getLong(4) == 2, bigProf.toString) // distinct EXACT
    assert(bigProf.getLong(5) == 9007199254740992L &&
      bigProf.getLong(6) == 9007199254740993L)
    assert(bigProf.getLong(7) == 9007199254740992L + 2 * 9007199254740993L)
    intercept[IllegalArgumentException](
      DataQuality.profileColumns(pdf, Seq.empty))
    intercept[IllegalArgumentException](
      DataQuality.profileColumns(pdf, Seq("num", "num")))
    intercept[IllegalArgumentException](
      DataQuality.profileColumns(pdf, Seq("nope")))
    // unsupported type fails loud, naming the column
    val arr = Seq((1L, Seq(1.0))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException](
      DataQuality.profileColumns(arr, Seq("vec")))
    assert(e.getMessage.contains("vec"), e.getMessage)
  }

  test("profileTopValues: exact counts, tie order, null exclusion, numeric formatting") {
    val pdf = Seq(
      Some("b"), Some("a"), Some("a"), Some("c"), Some("b"), None
    ).toDF("s").withColumn("n", when(col("s") === "a", 10L).otherwise(7L))
    val top = DataQuality.profileTopValues(pdf, Seq("s", "n"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byCol = top.groupBy(_._1)
    // s: a(2) and b(2) tie at count 2 -> value-ascending order
    assert(byCol("s").sortBy(_._4).map(t => (t._2, t._3)).toSeq ==
      Seq(("a", 2L), ("b", 2L)))
    // n: 7 occurs 4x (incl. the null-s row), 10 occurs 2x; longs format
    // without decimal points
    assert(byCol("n").sortBy(_._4).map(t => (t._2, t._3)).toSeq ==
      Seq(("7", 4L), ("10", 2L)))
    // NULL values are excluded, never a "null" bucket
    assert(!top.exists(_._2 == null) && !top.exists(_._2 == "null"))
    intercept[IllegalArgumentException](
      DataQuality.profileTopValues(pdf, Seq("s"), k = 0))
  }

  test("quarantine: per-row reasons in declaration order; Unique flags every dup") {
    // rows: (id, v, typ) — id 5 duplicated; id NULL once; v out of range;
    // typ outside the domain; one fully clean row
    val df = Seq(
      (Option(1L), Option(10.0), "ok"),      // clean
      (Option(2L), Option(999.0), "ok"),     // range
      (Option(3L), Option(10.0), "weird"),   // domain
      (Option(5L), Option(10.0), "ok"),      // dup (both copies flag)
      (Option(5L), Option(999.0), "weird"),  // dup + range + domain
      (Option.empty[Long], Option(10.0), "ok"), // NULL key cannot attest
      (Option(6L), Option.empty[Double], "ok")  // NULL v: NOT a range violation
    ).toDF("id", "v", "typ")
    val q = DataQuality.quarantine(df, Seq(
      InRange("v_range", col("v"), 0.0, 100.0),
      ContainedIn("typ_dom", col("typ"), Seq("ok")),
      Unique("id_uniq", Seq(col("id")))))
    val got = q.collect().map(r => (Option(r.get(0)), Option(r.get(1)),
      r.getString(2)) -> (r.getSeq[String](3), r.getBoolean(4))).toMap
    assert(got((Some(1L), Some(10.0), "ok")) == (Seq(), true))
    assert(got((Some(2L), Some(999.0), "ok")) == (Seq("v_range"), false))
    assert(got((Some(3L), Some(10.0), "weird")) == (Seq("typ_dom"), false))
    // both dup copies flag; reasons in DECLARATION order
    assert(got((Some(5L), Some(10.0), "ok")) == (Seq("id_uniq"), false))
    assert(got((Some(5L), Some(999.0), "weird")) ==
      (Seq("v_range", "typ_dom", "id_uniq"), false))
    assert(got((None, Some(10.0), "ok")) == (Seq("id_uniq"), false))
    // a NULL value is a completeness problem, not a range violation
    assert(got((Some(6L), None, "ok")) == (Seq(), true))
    // the split covers the frame exactly
    assert(q.filter(col("dq_valid")).count() +
      q.filter(!col("dq_valid")).count() == 7)
    // output-column collision fails loud
    val e = intercept[IllegalArgumentException](DataQuality.quarantine(
      df.withColumn("dq_valid", lit(true)),
      Seq(NotNull("x", col("id")))))
    assert(e.getMessage.contains("collide"), e.getMessage)
  }
}
