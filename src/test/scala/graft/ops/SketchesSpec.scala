package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Misra-Gries guarantee holds for any split/merge order (property)") {
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      items <- Gen.listOfN(n, Gen.chooseNum(0, 30).map(i => s"u$i"))
      k <- Gen.chooseNum(2, 12)
      parts <- Gen.chooseNum(1, 5)
    } yield (items, k, parts)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { case (items, k, parts) =>
        val agg = new MisraGriesAggregator(k)
        val merged = agg.finish(
          items.grouped(math.max(items.length / parts, 1)).toList
            .map(_.foldLeft(agg.zero)(agg.reduce))
            .foldLeft(agg.zero)(agg.merge))
        val est = merged.keys.zip(merged.counts).toMap
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bound = items.size.toLong / (k + 1) + 1
        // every true heavy hitter present; every estimate within the bound
        exact.forall { case (item, c) =>
          (c <= bound || est.contains(item)) && {
            val e = est.getOrElse(item, 0L)
            e <= c && c - e <= bound
          }
        }
      })
    assert(res.passed, s"misra-gries: ${res.status}")
  }

  test("percentile_approx stays within the GK rank-error bound vs exact") {
    // accuracy=1000 => rank error <= n/1000; on uniform 0..9999 that is a
    // value error <= ~10 per 10k rows, i.e. 0.1% of the range
    val df = (0 until 10000).map(i => ("t", i.toDouble)).toDF("g", "v")
      .repartition(16) // sketch merge across partitions must not blow the bound
    val r = df.groupBy("g").agg(
      expr("percentile_approx(v, array(0.5D, 0.9D, 0.99D), 1000)").as("a"),
      expr("percentile(v, array(0.5D, 0.9D, 0.99D))").as("e")).collect()(0)
    val errs = r.getSeq[Double](1).zip(r.getSeq[Double](2)).map { case (a, e) => math.abs(a - e) }
    assert(errs.forall(_ <= 20.0), s"errors $errs exceed the rank bound")
  }

  test("heavyHitters surfaces the planted dominant item per group") {
    val rows =
      (1 to 500).map(i => ("a", s"u${i % 50}")) ++     // background noise
      (1 to 300).map(_ => ("a", "whale")) ++           // dominant item
      (1 to 100).map(i => ("b", s"v${i % 10}")) ++
      (1 to 80).map(_ => ("b", "orca"))
    val df = rows.toDF("event_type", "user_id").repartition(8)
    val hh = Sketches.heavyHitters(df, "event_type", "user_id", k = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val aTop = hh.filter(_._1 == "a").maxBy(_._3)
    val bTop = hh.filter(_._1 == "b").maxBy(_._3)
    assert(aTop._2 == "whale" && aTop._3 <= 300)
    assert(bTop._2 == "orca" && bTop._3 <= 80)
    // plan: one exchange, partial aggregation before it
    val plan = Sketches.heavyHitters(df, "event_type", "user_id", 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length <= 2, plan) // repartition + agg
    assert(plan.contains("partial_misragriesaggregator"), plan)
  }

  test("hllPortable: partition-invariant, within HLL error, both branches") {
    // 800 and 250 distinct items exercise the raw-estimator branch; 25
    // distinct items lands in the small-range regime where the
    // linear-counting correction (m * ln(m / V)) applies
    val rows = (1 to 800).flatMap(i => Seq(("a", s"u$i"), ("a", s"u$i"))) ++
      (1 to 250).map(i => ("b", s"v$i")) ++
      (1 to 25).map(i => ("c", s"w$i"))
    def run(parts: Int) =
      Sketches.hllPortable(rows.toDF("g", "item").repartition(parts), "g", "item")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val est = run(4)
    // the sketch is a deterministic function of the item SET: any
    // partitioning/merge order must give the identical t_scaled and estimate
    assert(run(13) == est)
    val byG = est.map(t => t._1 -> t).toMap
    assert(math.abs(byG("a")._2 - 800) / 800.0 < 0.4, byG("a").toString)
    assert(math.abs(byG("b")._2 - 250) / 250.0 < 0.4, byG("b").toString)
    // raw branch precondition held for b (estimate above 2.5 * m)
    assert(byG("b")._2 > 160.0, byG("b").toString)
    // small-range: linear counting brings a 25-distinct group within 30%
    // (the raw estimator alone would read ~45 no matter what)
    assert(math.abs(byG("c")._2 - 25) / 25.0 < 0.3, byG("c").toString)
  }

  test("cmsSketch: estimates never undercount, bound holds, merge is exact") {
    // CMS guarantee: est >= exact always (counters sum supersets), and
    // est - exact <= eps * N with prob 1 - delta for w = e/eps. With
    // w = 128, eps ~ 0.0212, N = 1000 => slack <= ~64 per row; the min
    // over d = 3 rows makes exceeding it astronomically unlikely, so the
    // test asserts the bound outright for every probed item.
    val n = 1000
    val rows = (1 to n).map(i => ("g", s"u${i % 97}"))
    val df = rows.toDF("event_type", "user_id").repartition(8)
    val ev = df.select(col("event_type").as("group"), col("user_id").as("item"))
    val sk = Sketches.cmsSketch(ev, "group", "item", d = 3, w = 128)
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.map(("g", _)).toDF("group", "item")
    val est = Sketches.cmsEstimate(sk, probes, d = 3, w = 128)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    exact.foreach { case (item, c) =>
      val e = est(item)
      assert(e >= c, s"$item: CMS undercounted ($e < $c) — impossible by construction")
      assert(e - c <= (math.E / 128 * n).ceil.toLong, s"$item: overcount ${e - c}")
    }
    // mergeability: summing two half-corpus sketches on (group,j,bucket)
    // reproduces the direct sketch EXACTLY (counters are plain sums)
    val (h1, h2) = rows.splitAt(n / 2)
    def sketch(part: Seq[(String, String)]) = Sketches.cmsSketch(
      part.toDF("g", "i").select(col("g").as("group"), col("i").as("item")),
      "group", "item", d = 3, w = 128)
    val merged = sketch(h1).union(sketch(h2))
      .groupBy("group", "j", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val direct = sk.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == direct)
  }

  test("bloomBits/bloomContains: zero false negatives, FP rate near theory") {
    val members = (1 to 200).map(i => s"m$i")
    val nonMembers = (1 to 1000).map(i => s"x$i")
    val bits = Sketches.bloomBits(
      members.toDF("h"), "h", d = 4, mBits = 4096)
    assert(bits.count() <= 4L * 200, "more set bits than d * |set|")
    val res = Sketches.bloomContains(
      (members ++ nonMembers).toDF("h").repartition(8), "h", bits,
      d = 4, mBits = 4096)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(res(m), s"$m: false negative — impossible"))
    val fpRate = nonMembers.count(res(_)).toDouble / nonMembers.size
    // theory: (1 - e^(-d n / m))^d = (1 - e^(-800/4096))^4 ~ 0.1%; allow 10x
    assert(fpRate <= 0.01, s"false-positive rate $fpRate implausibly high")
  }

  test("BottomKDistinctAggregator equals bottom-k of the distinct set (property)") {
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      items <- Gen.listOfN(n, Gen.chooseNum(0L, 80L))
      k <- Gen.chooseNum(2, 20)
      parts <- Gen.chooseNum(1, 5)
    } yield (items, k, parts)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { case (items, k, parts) =>
        val agg = new BottomKDistinctAggregator(k)
        val got = agg.finish(
          items.grouped(math.max(items.length / parts, 1)).toList
            .map(_.foldLeft(agg.zero)(agg.reduce))
            .foldLeft(agg.zero)(agg.merge)).hs.toSeq
        got == items.distinct.sorted.take(k)
      })
    assert(res.passed, s"bottom-k distinct: ${res.status}")
  }

  test("kmvDistinct: exact under k, within KMV error above k") {
    val rows = (1 to 2000).map(i => ("big", s"u${i % 700}")) ++
      (1 to 100).map(i => ("small", s"v${i % 40}"))
    val df = rows.toDF("g", "item").repartition(9)
    val est = Sketches.kmvDistinct(Sketches.kmvSketch(df, "g", "item", 64), 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est("small") == 40.0, "under k the sketch IS the set — must be exact")
    // KMV relative error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
    assert(math.abs(est("big") - 700) / 700.0 < 0.4, est("big").toString)
  }

  test("kmvPairOverlap: exact mode under k, estimates near planted overlap") {
    // two groups sharing exactly 30 of their users, small enough for exact
    // mode (merged distinct = 70 > 64? no: 50 + 50 - 30 = 70 ... keep
    // under: 40 + 40 - 25 = 55 < 64 => exact mode)
    val a = (1 to 40).map(i => ("a", s"s$i"))
    val b = (1 to 25).map(i => ("b", s"s$i")) ++ (1 to 15).map(i => ("b", s"t$i"))
    val exact = Sketches.kmvPairOverlap((a ++ b).toDF("g", "item"), "g", "item", 64)
      .collect()(0)
    assert(exact.getAs[Double]("est_union") == 55.0 &&
      exact.getAs[Double]("est_intersect") == 25.0,
      s"exact mode must return exact values, got $exact")
    // estimate mode: 600 vs 500 users sharing 300
    val bigA = (1 to 600).map(i => ("a", s"s$i"))
    val bigB = (1 to 500).map(i => ("b", s"s${i + 300}"))
    val r = Sketches.kmvPairOverlap((bigA ++ bigB).toDF("g", "item")
      .repartition(7), "g", "item", 64).collect()(0)
    assert(math.abs(r.getAs[Double]("est_union") - 800) / 800.0 < 0.5, r.toString)
    assert(math.abs(r.getAs[Double]("est_intersect") - 300) / 300.0 < 0.6, r.toString)
  }

  test("hllPortable: union of partial sketches equals the direct sketch") {
    // store-sketches-merge-later: sketch per (g, shard), union by max down
    // to g — distributivity of max makes this EXACTLY the direct sketch,
    // the invariant that lets a pipeline persist per-day sketch rows and
    // answer any coarser rollup without re-touching raw data
    val rows = (1 to 600).map(i => ("a", s"shard${i % 7}", s"u${i % 331}")) ++
      (1 to 200).map(i => ("b", s"shard${i % 3}", s"v$i"))
    val df = rows.toDF("g", "shard", "item").repartition(6)
    val direct = Sketches.hllPortable(df, "g", "item")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val unioned = Sketches.hllPortableEstimate(
        Sketches.hllPortableSketch(df, Seq("g", "shard"), "item"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(unioned == direct)
  }

  test("frequent directions: exact in the no-shrink regime, theorem bound under shrinks, mergeable") {
    // deterministic synthetic vectors: v_i[k] = ((i * 31 + k * 7) % 13 - 6) / 4.0
    def vec(i: Int, d: Int): Array[Double] =
      Array.tabulate(d)(k => ((i * 31 + k * 7) % 13 - 6) / 4.0)
    val d = 6
    // NO-SHRINK anchor: n <= ell -> the sketch IS the input set (sorted)
    val small = (0 until 8).map(i => Tuple1(vec(i, d))).toDF("v")
    val anchor = Sketches.frequentDirections(small, "v", ell = 16).collect()
    val rowsOut = anchor.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
      case (_, rs) => rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
    }
    val expect = (0 until 8).map(i => vec(i, d).toSeq)
      .sortWith { (a, b) =>
        val i = a.zip(b).indexWhere { case (x, y) => x != y }
        i >= 0 && a(i) < b(i)
      }
    assert(rowsOut == expect, s"anchor rows ${rowsOut.take(2)}")
    assert(anchor.head.getBoolean(6)) // bound trivially holds
    // SHRINK regime: 200 vectors, ell = 4 -> the FD guarantee
    //   0 <= x^T (A^T A - B^T B) x <= delta_sum <= frob_in / ell
    // checked against the exact A^T A, driver-side
    val n = 200
    val vs = (0 until n).map(i => vec(i, d))
    def run(parts: Int): (Array[Array[Double]], Double, Double, Boolean) = {
      val df = vs.map(Tuple1(_)).toDF("v").repartition(parts)
      val out = Sketches.frequentDirections(df, "v", ell = 4).collect()
      val nr = if (out.isEmpty) 0 else out.map(_.getLong(0)).max.toInt + 1
      val b = Array.ofDim[Double](nr, d)
      out.foreach(r => b(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
      val frobIn = out.head.getLong(4).toDouble / 1e6
      (b, frobIn, out.head.getLong(5).toDouble / 1e6, out.head.getBoolean(6))
    }
    for (parts <- Seq(1, 7)) {
      val (b, frobIn, _, boundOk) = run(parts)
      assert(boundOk, s"parts=$parts in-query bound failed")
      // exact A^T A and B^T B
      val ata = Array.ofDim[Double](d, d)
      vs.foreach(v => for (i <- 0 until d; j <- 0 until d) ata(i)(j) += v(i) * v(j))
      val btb = Array.ofDim[Double](d, d)
      b.foreach(r => for (i <- 0 until d; j <- 0 until d) btb(i)(j) += r(i) * r(j))
      val diff = Array.tabulate(d, d)((i, j) => ata(i)(j) - btb(i)(j))
      // spectral norm of the (symmetric PSD) difference via power iteration
      var x = Array.fill(d)(1.0 / math.sqrt(d))
      var lam = 0.0
      for (_ <- 0 until 200) {
        val y = Array.tabulate(d)(i => (0 until d).map(j => diff(i)(j) * x(j)).sum)
        val norm = math.sqrt(y.map(t => t * t).sum)
        if (norm > 0) { x = y.map(_ / norm); lam = norm }
      }
      val frobTrue = vs.map(_.map(t => t * t).sum).sum
      assert(lam <= frobTrue / 4 + 1e-6,
        s"parts=$parts spectral err $lam > ${frobTrue / 4}")
      // PSD: x^T diff x >= -tol for probe directions
      for (seed <- 0 until 5) {
        val z = Array.tabulate(d)(k => ((seed * 17 + k * 5) % 9 - 4).toDouble)
        val q = (0 until d).map(i => (0 until d).map(j => z(i) * diff(i)(j) * z(j)).sum).sum
        assert(q >= -1e-6, s"parts=$parts not PSD: $q")
      }
      assert(math.abs(frobIn - frobTrue) < 1e-3)
    }
    // EMPTY input yields zero rows, not a descending-sequence crash
    // (Spark's sequence(0, -1) is [0, -1], not empty — the r15 footgun)
    val empty = Seq.empty[Tuple1[Array[Double]]].toDF("v")
    assert(Sketches.frequentDirections(empty, "v", ell = 4).collect().isEmpty)
  }
}
