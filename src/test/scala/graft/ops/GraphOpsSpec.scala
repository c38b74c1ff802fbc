package graft.ops

import graft.spark.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent single-machine replay of the exact fixed-point semantics
    * (long sums, floor divisions) — the oracle the distributed ranks must
    * match bit-for-bit. */
  private def naive(edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val base = (scale * 3L / 20L) / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val inc = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(nd =>
        nd -> (base + (inc.getOrElse(nd, 0L) + dangling / n) * 17L / 20L)).toMap
    }
    r
  }

  test("pageRank matches the integer-exact naive replay bit-for-bit") {
    // a graph with structure: a cycle, a hub pulling from everywhere, a
    // dangling sink, and a duplicate edge that must collapse
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "a",          // cycle
      "a" -> "hub", "b" -> "hub", "c" -> "hub",    // hub
      "hub" -> "sink",                             // sink is dangling
      "a" -> "b")                                  // duplicate
    val got = GraphOps.pageRank(edges.toDF("s", "d").repartition(7), "s", "d",
        iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive(edges, 6))
    // the hub outranks cycle members; the sink holds the hub's forwarded mass
    assert(got("hub") > got("a") && got("sink") > got("a"))
  }

  test("pageRank conserves rank mass up to floor drift") {
    val edges = (0 until 40).map(i => (s"n$i", s"n${(3 * i + 1) % 40}")) ++
      (0 until 40).map(i => (s"n$i", s"d${i % 7}")) // 7 dangling sinks
    val scale = 1000000000000L
    val iters = 5
    val total = GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .agg(org.apache.spark.sql.functions.sum("rank_scaled"))
      .collect()(0).getLong(0)
    // each round floors at most once per node (propagation) + once for the
    // teleport base + once for the dangling share => drift < 3N per round
    val n = 47L
    assert(total <= scale && scale - total <= 3L * n * iters,
      s"mass $total drifted more than floor slack from $scale")
  }

  test("pageRank is partition-invariant") {
    val edges = (0 until 60).map(i => (s"u${i % 13}", s"u${(i * 5 + 2) % 13}"))
    def run(parts: Int) = GraphOps.pageRank(
        edges.toDF("s", "d").repartition(parts), "s", "d", iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(2) == run(11))
  }

  test("triangleStats: hand-checked census, direction/dup/self-loop-proof") {
    // K4 on {1,2,3,4} (4 triangles, 6 edges, every pair adjacent) plus a
    // pendant 4-5 and noise: reversed duplicates and a self-loop
    val k4 = for (a <- 1 to 4; b <- a + 1 to 4) yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (2L, 1L), (3L, 3L))).toDF("x", "y")
    val r = GraphOps.triangleStats(edges, "x", "y").collect().head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L) // 6 K4 edges + pendant; dup/self dropped
    // degrees: 3,3,3,4,1 -> wedges 3+3+3+6+0 = 15
    assert(r.getAs[Long]("n_wedges") == 15L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("clustering") == 12.0 / 15.0)
  }

  test("triangleStats: degree orientation collapses planted-star wedge candidates") {
    // planted star: center 5000 with 10^4 spokes (ids 0..10000 \ {5000}),
    // plus a triangle among spokes {1,2,3}. Under the old id-ordered plan
    // the wedge join centered at the star center generates
    // (#edges where center is max-id) * (#edges where center is min-id)
    // = 5000 * 5000 = 25M candidate rows; under degree ordering every
    // spoke->center edge points INTO the center (degree 10^4), so the
    // center contributes zero wedges and the total candidate count is 4.
    import org.apache.spark.sql.functions._
    val star = (0L to 10000L).filter(_ != 5000L).map(i => (5000L, i))
    val edges = (star ++ Seq((1L, 2L), (1L, 3L), (2L, 3L))).toDF("x", "y")
    val e = edges
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // id-ordered wedge candidates: sum over b of (times-as-max * times-as-min)
    val idOrdered = e.groupBy(col("b").as("v")).agg(count(lit(1)).as("nb"))
      .join(e.groupBy(col("a").as("v")).agg(count(lit(1)).as("na")), "v")
      .agg(sum(col("na") * col("nb"))).collect()(0).getLong(0)
    // degree-ordered wedge candidates: sum over u of (outdeg choose 2)
    val oriented = GraphOps.degreeOriented(e, deg)
    val degOrdered = oriented.groupBy("u").agg(count(lit(1)).as("od"))
      .agg(sum(expr("od * (od - 1) div 2"))).collect()(0).getLong(0)
    assert(idOrdered >= 25000000L)
    assert(degOrdered == 4L)
    // orientation is a bijection on edges and the census is still exact:
    // triangles {1,2,3}, {5000,1,2}, {5000,1,3}, {5000,2,3}
    assert(oriented.count() == e.count())
    val r = GraphOps.triangleStats(edges, "x", "y").collect().head
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_edges") == 10003L)
  }

  test("triangleStats: triangle-free graph reports zero with zero clustering") {
    // a path 1-2-3-4: wedges exist, no triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val r = GraphOps.triangleStats(edges, "x", "y").collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("n_wedges") == 2L)
    assert(r.getAs[Double]("clustering") == 0.0)
  }
}
