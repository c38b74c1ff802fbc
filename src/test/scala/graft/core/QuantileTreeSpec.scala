package graft.core

import org.scalatest.funsuite.AnyFunSuite

class QuantileTreeSpec extends AnyFunSuite {

  test("noiseless quantiles on uniform data are close to exact") {
    val tree = new QuantileTree(0.0, 100.0)
    (1 to 9999).foreach(i => tree.add(i / 100.0))
    val qs = tree.computeQuantiles(Seq(0.1, 0.5, 0.9), 1e5, 0.5, 1, 1,
      NoiseKind.Laplace, NoiseSource.Zero)
    assert(math.abs(qs(0) - 10.0) < 0.1, s"p10=${qs(0)}")
    assert(math.abs(qs(1) - 50.0) < 0.1, s"p50=${qs(1)}")
    assert(math.abs(qs(2) - 90.0) < 0.1, s"p90=${qs(2)}")
  }

  test("values outside bounds are clamped") {
    val tree = new QuantileTree(0.0, 10.0)
    Seq(-100.0, -5.0, 5.0, 50.0, 100.0).foreach(tree.add(_))
    assert(tree.totalCount == 5)
    val Seq(med) = tree.computeQuantiles(Seq(0.5), 1e5, 0.5, 1, 1,
      NoiseKind.Laplace, NoiseSource.Zero)
    assert(med >= 0.0 && med <= 10.0)
  }

  test("merge equals union") {
    val a = new QuantileTree(0.0, 100.0)
    val b = new QuantileTree(0.0, 100.0)
    val c = new QuantileTree(0.0, 100.0)
    (1 to 500).foreach(i => { a.add(i * 0.1); c.add(i * 0.1) })
    (501 to 1000).foreach(i => { b.add(i * 0.1); c.add(i * 0.1) })
    a.merge(b)
    assert(a.totalCount == c.totalCount)
    val qa = a.computeQuantiles(Seq(0.25, 0.75), 1e5, 0.5, 1, 1,
      NoiseKind.Laplace, NoiseSource.Zero)
    val qc = c.computeQuantiles(Seq(0.25, 0.75), 1e5, 0.5, 1, 1,
      NoiseKind.Laplace, NoiseSource.Zero)
    assert(qa == qc)
  }

  test("serialization round-trips") {
    val tree = new QuantileTree(-50.0, 50.0)
    (1 to 1000).foreach(i => tree.add(math.sin(i) * 50))
    val back = QuantileTree.deserialize(tree.serialize())
    assert(back.totalCount == tree.totalCount)
    val q1 = tree.computeQuantiles(Seq(0.5), 1e5, 0.5, 1, 1, NoiseKind.Laplace, NoiseSource.Zero)
    val q2 = back.computeQuantiles(Seq(0.5), 1e5, 0.5, 1, 1, NoiseKind.Laplace, NoiseSource.Zero)
    assert(q1 == q2)
  }

  test("noise perturbs quantiles at small eps") {
    val tree = new QuantileTree(0.0, 100.0)
    (1 to 1000).foreach(i => tree.add(i * 0.1))
    val src = NoiseSource.Seeded(11)
    val noisy = tree.computeQuantiles(Seq(0.5), 0.01, 1e-10, 1, 1, NoiseKind.Laplace, src)
    val exact = tree.computeQuantiles(Seq(0.5), 1e5, 0.5, 1, 1, NoiseKind.Laplace, NoiseSource.Zero)
    assert(noisy != exact)
  }

  test("empty tree returns uniform interpolation") {
    val tree = new QuantileTree(0.0, 10.0)
    val Seq(q) = tree.computeQuantiles(Seq(0.3), 1e5, 0.5, 1, 1,
      NoiseKind.Laplace, NoiseSource.Zero)
    assert(math.abs(q - 3.0) < 1e-9)
  }
}
