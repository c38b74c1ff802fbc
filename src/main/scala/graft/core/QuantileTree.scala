package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** DP quantile tree — a port of the algorithm from Google's public DP library
  * (cc/algorithms/quantile-tree.h; the reference wraps it via PyDP,
  * reference: pipeline_dp/combiners.py:629-719). Re-implemented from the
  * published algorithm description, not translated.
  *
  * Structure: a b-ary tree of `height` levels over [lower, upper]. Each value
  * increments one node count per level along its root-to-leaf path, so one
  * contribution touches exactly `height` counts — that factor enters the
  * noise sensitivity. Counts are kept sparsely (hash map) because at
  * branching=16, height=4 the full tree has 69904 nodes but real data touches
  * few.
  *
  * Quantile computation walks the tree top-down: at each node the (noised,
  * clamped-to-0) child counts define a distribution; descend into the child
  * where the cumulative mass crosses the target rank and interpolate linearly
  * inside the final leaf interval.
  */
final class QuantileTree(
    val lower: Double,
    val upper: Double,
    val height: Int = QuantileTree.DefaultHeight,
    val branching: Int = QuantileTree.DefaultBranching
) extends Serializable {
  require(upper > lower, s"upper ($upper) must be > lower ($lower)")
  require(height >= 1 && branching >= 2)
  require(math.pow(branching.toDouble, (height + 1).toDouble) < Int.MaxValue,
    "tree too large: branching^(height+1) must fit in Int")

  /** node ids: root = 0; children of n: n*branching+1 .. n*branching+branching */
  private[core] val counts = mutable.HashMap.empty[Int, Long]

  private val numLeaves: Long = {
    var n = 1L; var i = 0
    while (i < height) { n *= branching; i += 1 }
    n
  }

  def totalCount: Long = {
    // level-1 nodes sum to the number of entries
    (1 to branching).map(i => counts.getOrElse(i, 0L)).sum
  }

  def add(value: Double, times: Long = 1): Unit = {
    // NaN would propagate through the clamp, index leaf 0, and silently
    // drag every percentile toward `lower` — fail loud instead (the
    // repo-wide NaN convention, e.g. quantizeInt8 / distributionDrift)
    require(!value.isNaN, "QuantileTree.add: NaN value — filter or impute upstream")
    val v = math.min(upper, math.max(lower, value))
    var leaf = ((v - lower) / (upper - lower) * numLeaves).toLong
    if (leaf == numLeaves) leaf -= 1 // value == upper
    // walk root -> leaf, incrementing one node per level
    var node = 0L
    var level = 0
    var width = numLeaves
    while (level < height) {
      width /= branching
      val childIdx = leaf / width % branching
      node = node * branching + 1 + childIdx
      counts.update(node.toInt, counts.getOrElse(node.toInt, 0L) + times)
      level += 1
    }
  }

  def merge(other: QuantileTree): QuantileTree = {
    require(other.lower == lower && other.upper == upper &&
      other.height == height && other.branching == branching,
      "cannot merge quantile trees with different geometry")
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    this
  }

  /** Computes the given quantiles (in [0,1]) with DP noise on every node
    * count consulted. Sensitivity: one contribution touches `height` nodes;
    * with L0 = maxPartitionsContributed and Linf = maxContributionsPerPartition,
    * Laplace L1 = height*l0*linf, Gaussian L2 = sqrt(height*l0)*linf. */
  def computeQuantiles(
      quantiles: Seq[Double],
      eps: Double,
      delta: Double,
      maxPartitionsContributed: Int,
      maxContributionsPerPartition: Int,
      noiseKind: NoiseKind,
      noise: NoiseSource
  ): Seq[Double] = {
    val mech: AdditiveMechanism = noiseKind match {
      case NoiseKind.Laplace =>
        LaplaceMechanism.fromEpsilon(eps,
          height.toDouble * maxPartitionsContributed * maxContributionsPerPartition)
      case NoiseKind.Gaussian =>
        GaussianMechanism.fromEpsilonDelta(eps, delta,
          math.sqrt(height.toDouble * maxPartitionsContributed) * maxContributionsPerPartition)
    }
    computeQuantiles(quantiles, mech, noise)
  }

  /** Quantile computation with a pre-built noise mechanism (lets budget
    * accountants that resolve to a noise STD rather than (eps, delta) — the
    * PLD accountant — drive the tree). */
  def computeQuantiles(
      quantiles: Seq[Double],
      mech: AdditiveMechanism,
      noise: NoiseSource
  ): Seq[Double] = {
    // memoize noised counts so repeated quantile queries see one consistent tree
    val noised = mutable.HashMap.empty[Int, Double]
    def noisedCount(node: Int): Double =
      noised.getOrElseUpdate(node,
        math.max(0.0, mech.addNoise(counts.getOrElse(node, 0L).toDouble, noise)))

    quantiles.map { q =>
      require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
      var node = 0L
      var lo = lower
      var hi = upper
      var rank = q
      var level = 0
      var done = false
      var result = lower
      while (level < height && !done) {
        val children = (0 until branching).map(i => noisedCount((node * branching + 1 + i).toInt))
        val total = children.sum
        if (total <= 0.0) {
          // no signal below this node: interpolate uniformly in [lo, hi]
          result = lo + rank * (hi - lo)
          done = true
        } else {
          val target = rank * total
          var cum = 0.0
          var idx = 0
          while (idx < branching - 1 && cum + children(idx) < target) {
            cum += children(idx); idx += 1
          }
          val childMass = math.max(children(idx), 1e-12)
          rank = math.min(1.0, math.max(0.0, (target - cum) / childMass))
          val width = (hi - lo) / branching
          hi = lo + (idx + 1) * width
          lo = lo + idx * width
          node = node * branching + 1 + idx
          level += 1
        }
      }
      if (!done) result = lo + rank * (hi - lo)
      math.min(upper, math.max(lower, result))
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(lower); out.writeDouble(upper)
    out.writeInt(height); out.writeInt(branching)
    out.writeInt(counts.size)
    counts.foreach { case (k, v) => out.writeInt(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }
}

object QuantileTree {
  /** Defaults from the published Google DP implementation. */
  val DefaultHeight = 4
  val DefaultBranching = 16

  def deserialize(bytes: Array[Byte]): QuantileTree = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val tree = new QuantileTree(in.readDouble(), in.readDouble(), in.readInt(), in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readInt(); val v = in.readLong()
      tree.counts.update(k, v)
      i += 1
    }
    tree
  }
}
