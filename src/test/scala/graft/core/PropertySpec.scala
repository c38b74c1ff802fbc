package graft.core

import graft.ops.{BottomKAggregator, QuantizedCentroidAggregator, ScoredNeighbor, StratItem, TopKAggregator, VecIn, VecState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants behind the distributed-correctness claims:
  * every partial aggregate must produce the same result for ANY split of
  * its input into partitions and ANY merge order — exactly what Spark's
  * partial/final aggregation assumes of it. Raw ScalaCheck (no scalatest
  * bridge in the offline cache); 200 cases per property. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("QuantileTree: any partition split + merge == sequential build") {
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(-1e6, 1e6))
      parts <- Gen.chooseNum(1, 5)
    } yield (vs, parts)
    check("quantile-tree-merge")(Prop.forAll(gen) { case (vs, parts) =>
      val seq = new QuantileTree(-1e6, 1e6)
      vs.foreach(seq.add(_))
      val trees = vs.grouped(math.max(vs.length / parts, 1)).map { g =>
        val t = new QuantileTree(-1e6, 1e6)
        g.foreach(t.add(_))
        t
      }.toList
      val merged =
        if (trees.isEmpty) new QuantileTree(-1e6, 1e6) else trees.reduce(_.merge(_))
      val qs = Seq(0.1, 0.5, 0.9)
      def quants(t: QuantileTree): Seq[Double] =
        t.computeQuantiles(qs, 1.0, 0.0, 1, 1, NoiseKind.Laplace, NoiseSource.Zero)
      quants(seq) == quants(merged)
    })
  }

  test("TopKAggregator: reduce/merge in any order == global sort-take-k") {
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      scored <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(0L, 30L)))
      k <- Gen.chooseNum(1, 8)
      parts <- Gen.chooseNum(1, 4)
    } yield (scored, k, parts)
    check("topk-merge")(Prop.forAll(gen) { case (scored, k, parts) =>
      val agg = new TopKAggregator(k)
      val merged = scored.grouped(math.max(scored.length / parts, 1)).toList
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, ScoredNeighbor(x._1, x._2))))
        .foldLeft(agg.zero)(agg.merge)
      val expect = scored.sortBy { case (s, id) => (-s, id) }.take(k)
      merged.scores.zip(merged.ids).toSeq == expect
    })
  }

  test("BottomKAggregator: reduce/merge in any order == global sort-take-k") {
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      items <- Gen.listOfN(n,
        Gen.zip(Gen.stringOfN(6, Gen.alphaNumChar), Gen.chooseNum(0L, 1000L)))
      k <- Gen.chooseNum(1, 8)
      parts <- Gen.chooseNum(1, 4)
    } yield (items, k, parts)
    check("bottomk-merge")(Prop.forAll(gen) { case (items, k, parts) =>
      val agg = new BottomKAggregator(k)
      val merged = items.grouped(math.max(items.length / parts, 1)).toList
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, StratItem(x._1, x._2))))
        .foldLeft(agg.zero)(agg.merge)
      val expect = items.sortBy { case (s, id) => (s, id) }.take(k)
      merged.keys.zip(merged.ids).toSeq == expect
    })
  }

  test("QuantizedCentroidAggregator: any split/merge order == sequential") {
    val gen = for {
      vs <- Gen.listOf(Gen.listOfN(4, Gen.chooseNum(-100.0, 100.0)).map(_.toArray))
      parts <- Gen.chooseNum(1, 4)
    } yield (vs, parts)
    check("centroid-merge")(Prop.forAll(gen) { case (vs, parts) =>
      val agg = new QuantizedCentroidAggregator(1000.0)
      def build(xs: List[Array[Double]]): VecState =
        xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, VecIn(v)))
      val seq = agg.finish(build(vs))
      val merged = agg.finish(
        vs.grouped(math.max(vs.length / parts, 1)).toList
          .map(build).foldLeft(agg.zero)(agg.merge))
      merged.n == seq.n && merged.centroid.toSeq == seq.centroid.toSeq
    })
  }
}
