package graft.spark

import graft.core._
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Elementwise vector sum as a typed Aggregator — the per-key merge of
  * `Array[Double]` accumulators (reference: combiners.py:850-911). Runs under
  * ObjectHashAggregate with map-side partial aggregation; buffers stay
  * deserialized between rows, serializing only at the shuffle boundary.
  */
object VectorSumAggregator extends Aggregator[Array[Double], Array[Double], Array[Double]] {
  def zero: Array[Double] = Array.emptyDoubleArray
  def reduce(b: Array[Double], a: Array[Double]): Array[Double] = add(b, a)
  def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = add(b1, b2)
  def finish(r: Array[Double]): Array[Double] = r
  def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  private def add(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, s"Shape mismatch: ${a.length} != ${b.length}")
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }
}

object VectorOps {

  /** vec_sum aggregate column over an array<double> column. */
  def vecSum(c: Column): Column = udaf(VectorSumAggregator).apply(c)

  /** Norm-clip an array<double> column with native higher-order functions
    * (codegen-friendly, no UDF): Linf clips per coordinate; L1/L2 rescale the
    * whole vector when its norm exceeds maxNorm
    * (reference: combiners.py:877-890). */
  def clipVector(c0: Column, normKind: NormKind, maxNorm: Double): Column = {
    // fail loud on non-finite coordinates (the quantizeInt8 convention): a
    // NaN makes the L1/L2 norm NaN, and least(1.0, maxNorm/NaN) = 1.0
    // because Spark orders NaN greater than every double — so every FINITE
    // coordinate would pass through unclipped while the noise stays
    // calibrated to maxNorm, silently breaking the DP sensitivity bound
    // (Linf would quietly coerce NaN to +maxNorm — also not a clip).
    val c = when(
      exists(c0, x => isnan(x) || abs(x) === Double.PositiveInfinity),
      raise_error(lit("clipVector: non-finite coordinate — NaN/Infinity " +
        "defeats norm clipping and under-protects the DP release; filter " +
        "or impute upstream")).cast("array<double>"))
      .otherwise(c0)
    normKind match {
      case NormKind.Linf =>
        transform(c, x => least(greatest(x, lit(-maxNorm)), lit(maxNorm)))
      case NormKind.L1 =>
        val norm = aggregate(c, lit(0.0), (acc, x) => acc + abs(x))
        scaleIfOver(c, norm, maxNorm)
      case NormKind.L2 =>
        val norm = sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))
        scaleIfOver(c, norm, maxNorm)
    }
  }

  private def scaleIfOver(c: Column, norm: Column, maxNorm: Double): Column = {
    val coef = when(norm === 0.0, lit(1.0)).otherwise(least(lit(1.0), lit(maxNorm) / norm))
    transform(c, x => x * coef)
  }

  /** Per-coordinate noise for the DP vector sum. Sensitivity scaling follows
    * (reference: dp_computations.py:241-281): Laplace needs L1-compatible norm
    * (L1 or Linf*size), Gaussian needs L2-compatible (L2 or Linf*sqrt(size)).
    */
  final case class VectorNoiser(
      spec: MechanismSpec,
      normKind: NormKind,
      maxNorm: Double,
      vectorSize: Int,
      l0: Int,
      noiseKind: NoiseKind
  ) extends Serializable {
    // build via Mechanisms.createAdditive so PLD-resolved specs work: a
    // PLDBudgetAccountant resolves additive specs to (eps = 0, delta = 0,
    // noiseStdDev = Some(std)), and reading spec.epsilon directly here
    // yielded b = sensitivity/0 = Infinity noise (Laplace) or a require
    // crash (Gaussian). The QuantileComputer pattern, applied to vectors.
    private val mechanism: AdditiveMechanism = noiseKind match {
      case NoiseKind.Laplace =>
        val sensitivity = normKind match {
          case NormKind.L1   => maxNorm * l0
          case NormKind.Linf => maxNorm * vectorSize * l0
          case NormKind.L2 => throw new IllegalArgumentException(
            "L2 norm clipping requires Gaussian noise")
        }
        Mechanisms.createAdditive(spec, Sensitivities(l1Given = Some(sensitivity)))
      case NoiseKind.Gaussian =>
        val sensitivity = normKind match {
          case NormKind.L2   => maxNorm * math.sqrt(l0.toDouble)
          case NormKind.Linf => maxNorm * math.sqrt(vectorSize.toDouble) * math.sqrt(l0.toDouble)
          case NormKind.L1 => throw new IllegalArgumentException(
            "L1 norm clipping requires Laplace noise")
        }
        Mechanisms.createAdditive(spec, Sensitivities(l2Given = Some(sensitivity)))
    }
    def addNoise(vec: Array[Double], noise: NoiseSource): Array[Double] =
      vec.map(v => mechanism.addNoise(v, noise))
    def describe: String =
      s"Computed DP vector_sum (size $vectorSize, $normKind norm clipped to " +
        f"$maxNorm%.6g) with per-coordinate ${mechanism.describe}"
  }
}
