package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("VectorExpressionsSpec")
    .getOrCreate()

  // the exact UDF formulation the expression replaces (same IEEE op order)
  private val referenceUdf = udf((a: Array[Double], b: Array[Double]) => {
    if (a == null || b == null) 0.0
    else {
      val n = math.min(a.length, b.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += a(i) * b(i); i += 1 }
      var na = 0.0
      i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      var nb = 0.0
      i = 0
      while (i < b.length) { nb += b(i) * b(i); i += 1 }
      val sa = math.sqrt(na); val sb = math.sqrt(nb)
      if (sa == 0.0 || sb == 0.0) 0.0 else d / (sa * sb)
    }
  })

  test("CosineSim is bit-identical to the primitive UDF on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val d = 1 + rnd.nextInt(64)
      (i.toLong,
        Array.fill(d)(rnd.nextDouble() * 2 - 1),
        Array.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("expr_cos", VectorFunctions.cosineSim(col("a"), col("b")))
      .withColumn("udf_cos", referenceUdf(col("a"), col("b")))
    // == on doubles: BIT-identical, not approximately equal
    df.filter(col("expr_cos") =!= col("udf_cos")).count() shouldBe 0L
    df.agg(max(abs(col("expr_cos")))).head.getDouble(0) should be <= 1.0000000001
  }

  test("CosineSim edge cases: empty, zero, unequal length, null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0))),     // identical
      (2L, Some(Array.empty[Double]), Some(Array(1.0))),      // empty side
      (3L, Some(Array(0.0, 0.0)), Some(Array(1.0, 1.0))),     // zero vector
      (4L, Some(Array(1.0, 0.0, 5.0)), Some(Array(1.0))),     // unequal length
      (5L, None, Some(Array(1.0)))                            // null side
    ).toDF("id", "a", "b")
      .withColumn("c", VectorFunctions.cosineSim(col("a"), col("b")))
    val got = df.select("id", "c").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(1L) shouldBe 1.0 +- 1e-15
    got(2L) shouldBe 0.0
    got(3L) shouldBe 0.0
    // dot over min-length prefix = 1.0; norms over full arrays
    got(4L) shouldBe (1.0 / (math.sqrt(26.0) * 1.0)) +- 1e-15
    got(5L) shouldBe 0.0
  }

  test("CosineSim fails loudly on a null array ELEMENT (both exec paths)") {
    import spark.implicits._
    // parquet-style containsNull=true schema with an actual null element
    val df = Seq((1L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))))
      .toDF("id", "a", "b")
    import graft.spark.SparkTestSession.chainMsg
    // codegen path
    val ex1 = intercept[Exception] {
      df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    }
    assert(chainMsg(ex1).contains("null array element"), chainMsg(ex1))
    // interpreted path (eval) via the SQL surface: constant arguments are
    // evaluated by ConstantFolding's eval, not generated code
    VectorFunctions.registerSql(spark)
    val ex2 = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(CAST(NULL AS DOUBLE), 1.0d), array(1.0d, 2.0d))").collect()
    }
    assert(chainMsg(ex2).contains("null array element"), chainMsg(ex2))
  }

  test("CosineSim stays inside WholeStageCodegen (no UDF boundary)") {
    // a Range source (codegen-capable, not constant-foldable — a literal
    // local relation would be evaluated away by ConvertToLocalRelation)
    val df = spark.range(100)
      .select(col("id"),
        array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(col("id"), VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
    val plan = df.queryExecution.executedPlan
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    spans.nonEmpty shouldBe true
    // the generated Java must contain our ArrayData loop AND compile — a
    // codegen failure would silently fall back to interpreted eval
    val sources = spans.map(_.doCodeGen()._2)
    sources.exists(_.body.contains("getDouble")) shouldBe true
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    spans.foreach { w => CodeGenerator.compile(w.doCodeGen()._2) }
    // id=2: a=(2,1) b=(2,2) -> cos = 6 / (sqrt(5)*sqrt(8))
    val c2 = df.filter(col("id") === 2).head.getDouble(1)
    c2 shouldBe (6.0 / (math.sqrt(5.0) * math.sqrt(8.0))) +- 1e-15
  }

  test("GraftSqlExtensions injects the function descriptor") {
    // the --conf spark.sql.extensions entry point: applying it to a fresh
    // SparkSessionExtensions must register graft_cosine without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSqlExtensions().apply(ext)
    // building the expression through the same builder the registry stores
    val e = CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    e.eval(null) shouldBe 1.0
  }

  test("graft_hilbert is callable from SQL; bits must be a literal") {
    VectorFunctions.registerSql(spark)
    // bit-parity with the Scala implementation on a few cells
    for ((x, y) <- Seq((0L, 0L), (1L, 2L), (7L, 5L), (15L, 0L))) {
      val got = spark.sql(s"SELECT graft_hilbert($x, $y, 4)").head.getLong(0)
      got shouldBe graft.ops.Layout.hilbertXY2D(x, y, 4)
    }
    // an INT bits literal works too (the common hand-typed form)
    spark.sql("SELECT graft_hilbert(CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS INT))")
      .head.getLong(0) shouldBe graft.ops.Layout.hilbertXY2D(3L, 1L, 8)
    // non-literal bits fails loud at analysis, not deep in a task
    import spark.implicits._
    Seq((1L, 2L, 4)).toDF("x", "y", "b").createOrReplaceTempView("hcells")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hilbert(x, y, b) FROM hcells").collect()
    }
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("literal"),
      graft.spark.SparkTestSession.chainMsg(e).take(200))
  }

  test("graft_cosine is callable from SQL after registration") {
    VectorFunctions.registerSql(spark)
    import spark.implicits._
    Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs").head.getDouble(0)
    r shouldBe 1.0 +- 1e-15
  }

  test("graft_cosine SQL surface accepts array<float> (the parquet embedding type)") {
    // CosineSim has no implicit input casts; the SQL builders must apply
    // the same cast-to-array<double> the Column path does, or the common
    // float-embedding case fails analysis despite the documented contract
    VectorFunctions.registerSql(spark)
    import spark.implicits._
    Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("fvecs")
    val r = spark.sql("SELECT graft_cosine(a, b) AS c FROM fvecs").head.getDouble(0)
    r shouldBe 1.0 +- 1e-7
  }
}
