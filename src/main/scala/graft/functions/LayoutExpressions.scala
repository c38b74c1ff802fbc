package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert xy2d index of a quantized grid cell as a NATIVE Catalyst
  * expression with whole-stage codegen — the generated Java carries the
  * while-loop INSIDE the stage's loop body, replacing the boxed-Long
  * ScalaUDF that previously sat in the write path of every
  * `hilbertExport` row (per-row boxing + UDF invocation boundary, and a
  * codegen-span break right where the export projection is hottest).
  *
  * Semantics are bit-for-bit [[graft.ops.Layout.hilbertXY2D]] (the
  * interpreted path CALLS it, so the two cannot drift; the generated
  * loop's parity is spec-pinned exhaustively at small bit widths).
  * `bits` is a plan-time constant in [1, 31]; null in, null out.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  protected override def nullSafeEval(x: Any, y: Any): Any =
    graft.ops.Layout.hilbertXY2D(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val cx = ctx.freshName("hilX")
      val cy = ctx.freshName("hilY")
      val d = ctx.freshName("hilD")
      val s = ctx.freshName("hilS")
      val rx = ctx.freshName("hilRx")
      val ry = ctx.freshName("hilRy")
      val t = ctx.freshName("hilT")
      // the same quadrant/rotation recurrence as Layout.hilbertStep:
      // d += s^2 * ((3*rx) ^ ry); on ry == 0 flip within the quadrant
      // when rx == 1, then swap axes
      s"""
         |long $cx = $xv;
         |long $cy = $yv;
         |if ($cx < 0L || $cx >= ${1L << bits}L ||
         |    $cy < 0L || $cy >= ${1L << bits}L) {
         |  throw graft.functions.HilbertIndex.outOfRange($cx, $cy, $bits);
         |}
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($cx & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($cy & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $cx = $s - 1L - $cx;
         |      $cy = $s - 1L - $cy;
         |    }
         |    long $t = $cx; $cx = $cy; $cy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Shared by the interpreted path ([[graft.ops.Layout.hilbertXY2D]])
    * and the generated Java (public: codegen must reach it) — the
    * out-of-grid fail-loud both paths throw identically. */
  def outOfRange(x: Long, y: Long, bits: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_hilbert: ($x, $y) outside the [0, 2^$bits) grid — the " +
        "recurrence would silently return a wrong index; quantize " +
        "coordinates into the grid first")
}
