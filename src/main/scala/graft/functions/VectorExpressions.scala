package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.Column

/** Cosine similarity of two `array<double>` columns as a NATIVE Catalyst
  * expression with whole-stage codegen.
  *
  * This is the tier above a Scala UDF in the extension preference order:
  * the generated Java reads `ArrayData` elements in place inside the stage's
  * generated loop — no `UnsafeArrayData -> Array[Double]` copy per row, no
  * UDF invocation boundary, and the projection stays inside one
  * `WholeStageCodegen` span with the surrounding operators.
  *
  * Semantics are IDENTICAL (bit-for-bit) to the primitive-loop UDF it
  * replaces on the similarity hot paths: products of the first
  * `min(|a|, |b|)` elements summed index-ascending from +0.0, each norm over
  * its full array, `0.0` when either vector is all-zero or either input is
  * null (null-as-zero keeps the score column non-nullable, which the
  * bounded-heap top-k aggregate relies on). A null array ELEMENT throws
  * (checked in the norm loops, which visit every element of both arrays) —
  * parquet array columns are containsNull=true by schema even when no null
  * ever occurs, so rejecting the TYPE would break every real caller, while
  * reading a null element as 0.0/garbage would silently corrupt scores.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def compute(a: ArrayData, b: ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    val n = math.min(la, lb)
    var d = 0.0
    var i = 0
    while (i < n) { d += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < la) {
      if (a.isNullAt(i)) throw CosineSim.nullElement(i)
      val v = a.getDouble(i); na += v * v; i += 1
    }
    var nb = 0.0
    i = 0
    while (i < lb) {
      if (b.isNullAt(i)) throw CosineSim.nullElement(i)
      val w = b.getDouble(i); nb += w * w; i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else d / (sa * sb)
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) 0.0
    else compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("cosA")
    val b = ctx.freshName("cosB")
    val la = ctx.freshName("cosLa")
    val lb = ctx.freshName("cosLb")
    val n = ctx.freshName("cosN")
    val d = ctx.freshName("cosDot")
    val na = ctx.freshName("cosNa")
    val nb = ctx.freshName("cosNb")
    val sa = ctx.freshName("cosSa")
    val sb = ctx.freshName("cosSb")
    val i = ctx.freshName("cosI")
    val v = ctx.freshName("cosV")
    val arrayData = classOf[ArrayData].getName
    val resultCode =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |double ${ev.value} = 0.0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  $arrayData $a = ${leftGen.value};
        |  $arrayData $b = ${rightGen.value};
        |  int $la = $a.numElements();
        |  int $lb = $b.numElements();
        |  int $n = $la < $lb ? $la : $lb;
        |  double $d = 0.0;
        |  double $na = 0.0;
        |  double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $d += $a.getDouble($i) * $b.getDouble($i);
        |  }
        |  for (int $i = 0; $i < $la; $i++) {
        |    if ($a.isNullAt($i)) throw graft.functions.CosineSim.nullElement($i);
        |    double $v = $a.getDouble($i);
        |    $na += $v * $v;
        |  }
        |  for (int $i = 0; $i < $lb; $i++) {
        |    if ($b.isNullAt($i)) throw graft.functions.CosineSim.nullElement($i);
        |    double $v = $b.getDouble($i);
        |    $nb += $v * $v;
        |  }
        |  double $sa = java.lang.Math.sqrt($na);
        |  double $sb = java.lang.Math.sqrt($nb);
        |  ${ev.value} = ($sa == 0.0 || $sb == 0.0) ? 0.0 : $d / ($sa * $sb);
        |}
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Shared by the interpreted and generated paths (public: generated Java
    * code must reach it). */
  def nullElement(i: Int): NullPointerException =
    new NullPointerException(
      s"graft_cosine: null array element at index $i — cosine over a vector " +
        "with null coordinates is undefined; filter or impute upstream")
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  /** Cosine similarity via [[CosineSim]]; accepts any numeric array column
    * (cast to array<double> like the UDF path it replaces). */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.column(CosineSim(
      org.apache.spark.sql.GraftShims.expression(a.cast("array<double>")),
      org.apache.spark.sql.GraftShims.expression(b.cast("array<double>"))))

  /** Registers the SQL surface (`graft_cosine(a, b)`,
    * `graft_hilbert(x, y, bits)`) on an existing session — idempotent,
    * for notebook / spark.sql use. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hilbert", hilbertBuilder, "built-in")
  }

  /** SQL-surface builder for [[CosineSim]] — ONE definition shared by
    * [[registerSql]] and [[GraftSqlExtensions]] (the hilbertBuilder
    * pattern), so the two injection paths cannot drift. */
  private[functions] def cosineBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_cosine takes exactly 2 arguments")
    CosineSim(castToDoubleArray(children.head), castToDoubleArray(children(1)))
  }

  /** SQL-surface builder for [[graft.functions.HilbertIndex]]: `bits` must
    * be a foldable integer literal (it is a plan-time constant — the
    * generated loop bound). */
  private[functions] def hilbertBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_hilbert takes exactly 3 arguments: x, y, bits")
    val bitsExpr = children(2)
    require(bitsExpr.foldable,
      "graft_hilbert: bits must be a literal (it is a plan-time constant)")
    val bits = bitsExpr.eval() match {
      case i: Int   => i
      case l: Long  => l.toInt
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case null => throw new IllegalArgumentException(
        "graft_hilbert: bits must not be NULL — it is the plan-time loop " +
          "bound of the generated code")
      case other => throw new IllegalArgumentException(
        s"graft_hilbert: bits must be an integer literal, got $other " +
          s"(${other.getClass.getSimpleName})")
    }
    graft.functions.HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Cast(children(0),
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(children(1),
        org.apache.spark.sql.types.LongType), bits)
  }

  /** The SQL surfaces must apply the same cast-to-array<double> the Column
    * path does: CosineSim has no implicit input casts, so a raw
    * array<float> argument (the common parquet embedding type) would fail
    * analysis despite the documented any-numeric-array contract. */
  private[functions] def castToDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}

/** `spark.sql.extensions`-style injection point so external deployments get
  * the SQL functions without code: \
  * `--conf spark.sql.extensions=graft.functions.GraftSqlExtensions`. */
class GraftSqlExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      VectorFunctions.cosineBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      VectorFunctions.hilbertBuilder))
  }
}
