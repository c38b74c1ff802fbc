package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, block, name, seg, bal) — every agreement combination on purpose
  def recs = Seq(
    (1L, "b1", "alice smith", "A", 10.0),
    (2L, "b1", "alice smyth", "A", 10.005), // 1 edit, seg agree, bal in tol
    (3L, "b1", "alicia smith", "A", 10.0),  // 2 edits from id 1
    (4L, "b1", "alice smith", "B", 50.0),   // seg + bal disagree vs id 1
    (5L, "b2", "alice smith", "A", 10.0),   // different block: never pairs
    (6L, "b1", null, "A", 10.0),            // null name: zero evidence
    (7L, null.asInstanceOf[String], "alice smith", "A", 10.0) // null block
  ).toDF("id", "blk", "nm", "seg", "bal")

  def rules = Seq(
    FuzzyStringField("name", col("nm"), maxEdit = 1, 30L, -20L),
    ExactField("segment", col("seg"), 10L, -15L),
    NumericField("balance", col("bal"), 0.01, 20L, -10L))

  test("linkPairs: integer weights, null evidence, threshold, blocking") {
    val pairs = RecordLinkage.linkPairs(recs, "id", Seq(col("blk")), rules,
        threshold = Long.MinValue) // keep all pairs to inspect every weight
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(pairs((1L, 2L)) == ((30L, 10L, 20L, 60L)))   // full agreement
    assert(pairs((1L, 3L)) == ((-20L, 10L, 20L, 10L)))  // 2 edits disagree
    assert(pairs((1L, 4L)) == ((30L, -15L, -10L, 5L)))  // seg + bal disagree
    assert(pairs((1L, 6L)) == ((0L, 10L, 20L, 30L)))    // null name: 0, not -20
    // different or null block: ids 5 and 7 pair with nobody
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L))
    assert(!pairs.keySet.exists(p => p._1 == 7L || p._2 == 7L))
    // id_a < id_b exactly once per pair
    assert(pairs.keySet.forall(p => p._1 < p._2))
    // the threshold drops sub-threshold pairs
    val kept = RecordLinkage.linkPairs(recs, "id", Seq(col("blk")), rules,
      threshold = 45L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 2L)))
  }

  test("resolveEntities: chains collapse to min id, singletons stand alone") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val all = Seq(1L, 2L, 3L, 9L).toDF("id")
    val out = RecordLinkage.resolveEntities(all, "id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 3L)) && out(2L) == ((1L, 3L)) && out(3L) == ((1L, 3L)))
    assert(out(9L) == ((9L, 1L)))
  }

  test("candidate-volume guard trips on coarse blocking, names the fix") {
    val pile = (1L to 40L).map(i => (i, "hot", s"name$i", "A", 1.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val e = intercept[IllegalStateException] {
      RecordLinkage.linkPairs(pile, "id", Seq(col("blk")), rules,
        threshold = 0L, maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("finer"), e.getMessage)
    // below the cap (39/2 = 19.5 pairs per record) the same input passes
    val n = RecordLinkage.linkPairs(pile, "id", Seq(col("blk")), rules,
      threshold = Long.MinValue, maxPairsPerRecord = 20.0).count()
    assert(n == 40L * 39 / 2)
  }

  test("cross-table linkage: A x B only, colliding id spaces, guard, null keys") {
    // id 1 exists in BOTH sources (colliding namespaces) — the AB form
    // must pair A's 1 with B's 1 without any offset hack, and must NEVER
    // emit the A-A pair (1, 2) even though both sit in block b1
    val a = Seq(
      (1L, "b1", "alice smith", "A", 10.0),
      (2L, "b1", "alice smitt", "A", 10.002),
      (9L, null.asInstanceOf[String], "alice smith", "A", 10.0)
    ).toDF("id", "blk", "nm", "seg", "bal")
    val b = Seq(
      (1L, "b1", "alice smyth", "A", 10.005), // B's id 1: true match of A's 1
      (7L, "b1", "zzz totally", "B", 99.0),
      (8L, null.asInstanceOf[String], "alice smith", "A", 10.0)
    ).toDF("id", "blk", "nm", "seg", "bal")
    val all = RecordLinkage.linkPairsAB(a, b, "id", Seq(col("blk")), rules,
      threshold = Long.MinValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    // every pair is (A id, B id): exactly {1,2} x {1,7}; null keys never join
    assert(all.keySet == Set((1L, 1L), (1L, 7L), (2L, 1L), (2L, 7L)),
      all.keySet.toString)
    assert(all((1L, 1L)) == 60L) // cross-source full agreement
    // threshold release: only the true cross-source match survives
    // (levenshtein(smitt, smyth) = 2, so (2, 1) scores 10 and drops)
    assert(RecordLinkage.linkPairsAB(a, b, "id", Seq(col("blk")), rules, 45L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
    // cross-volume guard: a hot block of 40 x 40 trips a 10/record cap
    val pileA = (1L to 40L).map(i => (i, "hot", s"a$i", "A", 1.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val pileB = (1L to 40L).map(i => (i, "hot", s"b$i", "A", 1.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val e = intercept[IllegalStateException] {
      RecordLinkage.linkPairsAB(pileA, pileB, "id", Seq(col("blk")), rules,
        threshold = 0L, maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("finer"), e.getMessage)
    // 40*40 = 1600 pairs over 80 records = 20/record: passes at cap 20
    assert(RecordLinkage.linkPairsAB(pileA, pileB, "id", Seq(col("blk")),
      rules, threshold = Long.MinValue, maxPairsPerRecord = 20.0).count() == 1600L)
  }

  test("volume guard ignores NULL block keys (they never join)") {
    // 40 null-block rows would contribute 780 phantom pairs to a naive
    // guard; the join generates exactly ONE candidate pair (ids 100/101)
    val df = ((1L to 40L).map(i => (i, null.asInstanceOf[String], s"n$i", "A", 1.0)) ++
      Seq((100L, "b", "alice smith", "A", 1.0), (101L, "b", "alice smitt", "A", 1.0)))
      .toDF("id", "blk", "nm", "seg", "bal")
    // cap 5/record: must NOT trip (actual volume is 1 pair over 2 records)
    val out = RecordLinkage.linkPairs(df, "id", Seq(col("blk")), rules,
      threshold = Long.MinValue, maxPairsPerRecord = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 101L)))
  }

  test("LSH string-key blocking: typo'd keys pair, junk never does, guard trips") {
    // high-entropy string keys (the address/name shape): id 2's key is id
    // 1's with the last char replaced — an equi-block on the key misses it
    // forever; minhash bands still collide. id 3's key is unrelated.
    val df = Seq(
      (1L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", "alice smith", "A", 10.0),
      (2L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsdX", "alice smyth", "A", 10.005),
      (3L, "0q8mw3jz7xr2pv9lk4cn1fy6hb5tg2es", "alice smith", "A", 10.0),
      (4L, null.asInstanceOf[String], "alice smith", "A", 10.0),
      (5L, "", "alice smith", "A", 10.0)
    ).toDF("id", "key", "nm", "seg", "bal")
    // the equi-block arm on the raw key finds nothing
    val equi = RecordLinkage.linkPairs(df, "id", Seq(col("key")), rules, 45L)
    assert(equi.count() == 0)
    val lsh = RecordLinkage.lshLinkPairs(df, "id", col("key"), rules,
      threshold = Long.MinValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    // the typo'd pair is found and carries the true full-agreement score
    assert(lsh.contains((1L, 2L)), s"typo'd key pair not found: ${lsh.keySet}")
    assert(lsh((1L, 2L)) == 60L)
    // unrelated keys never collide at this entropy; null/empty never pair
    assert(!lsh.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!lsh.keySet.exists(p => Set(p._1, p._2).intersect(Set(4L, 5L)).nonEmpty))
    // identical keys ALWAYS pair (identical signatures — hash-independent)
    val same = Seq(
      (1L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", "a", "A", 1.0),
      (2L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", "a", "A", 1.0)
    ).toDF("id", "key", "nm", "seg", "bal")
    assert(RecordLinkage.lshLinkPairs(same, "id", col("key"), rules,
      threshold = Long.MinValue).count() == 1)
    // mass-duplicate keys: every band bucket goes quadratic -> guard
    val pile = (1L to 40L).map(i =>
      (i, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", s"n$i", "A", 1.0))
      .toDF("id", "key", "nm", "seg", "bal")
    val e = intercept[IllegalStateException] {
      RecordLinkage.lshLinkPairs(pile, "id", col("key"), rules,
        threshold = 0L, maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("rowsPerBand"), e.getMessage)
  }

  test("LSH maxBucket star collapse: linear hot-bucket volume, capped == uncapped when no cap binds") {
    // the SAME mass-duplicate pile the guard rejects above: with a cap,
    // each hot bucket releases only its star to the min-id rep — the
    // distinct pair set is the 39 pairs (1, i), and the guard's
    // POST-collapse (pre-distinct) volume is numBands*(n-1) = 624, i.e.
    // ~numBands per record REGARDLESS of n (linear escape: the uncapped
    // volume at the same n is 16*780 = 312/record and grows with n)
    val pile = (1L to 40L).map(i =>
      (i, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", s"n$i", "A", 1.0))
      .toDF("id", "key", "nm", "seg", "bal")
    val star = RecordLinkage.lshLinkPairs(pile, "id", col("key"), rules,
      threshold = Long.MinValue, maxPairsPerRecord = 17.0, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == (2L to 40L).map(i => (1L, i)).toSet, star.toString)
    // and the SAME 17/record cap still trips UNCAPPED on this pile —
    // the cap is what turned the volume linear, not a looser guard
    val e2 = intercept[IllegalStateException] {
      RecordLinkage.lshLinkPairs(pile, "id", col("key"), rules,
        threshold = 0L, maxPairsPerRecord = 17.0)
    }
    assert(e2.getMessage.contains("maxBucket"), e2.getMessage)
    // output identity: on a corpus where NO bucket exceeds the cap, the
    // capped run returns exactly the uncapped pair set
    val mixed = Seq(
      (1L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsda", "alice smith", "A", 10.0),
      (2L, "k7f2q9xm4plw8zr3vn6bty0cehj5gsdX", "alice smyth", "A", 10.005),
      (3L, "0q8mw3jz7xr2pv9lk4cn1fy6hb5tg2es", "bob jones", "B", 50.0),
      (4L, "0q8mw3jz7xr2pv9lk4cn1fy6hb5tg2eZ", "bob jonez", "B", 50.005)
    ).toDF("id", "key", "nm", "seg", "bal")
    def pairs(cap: Int) = RecordLinkage.lshLinkPairs(mixed, "id", col("key"),
      rules, threshold = Long.MinValue, maxBucket = cap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toSet
    val uncapped = pairs(0)
    assert(pairs(8) == uncapped, s"capped=${pairs(8)} uncapped=$uncapped")
    assert(uncapped.map(_._1).intersect(Set((1L, 2L), (3L, 4L))).size == 2)
  }

  test("multi-pass blocking: null-block recovery, cross-pass dedup") {
    // ids 1/2 match but id 2 has a NULL blk — invisible to pass 1;
    // pass 2 blocks on seg and recovers them. ids 1/8 sit in the same
    // block under BOTH passes: exactly one scored row may result.
    val df = Seq(
      (1L, "b1", "alice smith", "A", 10.0),
      (2L, null.asInstanceOf[String], "alice smyth", "A", 10.005),
      (8L, "b1", "alice smitt", "A", 10.002)
    ).toDF("id", "blk", "nm", "seg", "bal")
    // single pass on blk: id 2 pairs with nobody
    val single = RecordLinkage.linkPairs(df, "id", Seq(col("blk")), rules, 45L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single == Set((1L, 8L)))
    val multi = RecordLinkage.linkPairsMultiPass(df, "id",
      Seq(Seq(col("blk")), Seq(col("seg"))), rules, 45L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    // pass 2 recovers the null-block pair (1, 2); (2, 8) is scored but
    // drops (smyth/smitt is 2 edits: -20+10+20 = 10); (1, 8) found by
    // both passes appears once
    assert(multi.keySet == Set((1L, 2L), (1L, 8L)))
    assert(multi((1L, 2L)) == 60L)
    // per-pass guard names the coarse pass
    val pile = (1L to 40L).map(i => (i, s"b$i", "n", "hot", 1.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val e = intercept[IllegalStateException] {
      RecordLinkage.linkPairsMultiPass(pile, "id",
        Seq(Seq(col("blk")), Seq(col("seg"))), rules, 0L,
        maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("pass 1"), e.getMessage)
  }

  test("sorted-neighborhood: rank window, cross-bucket pairs, alignment guard") {
    // ranks by (bal, id): 1, 2, 3, 4, 5 — ids 1/2 and 4/5 are true pairs;
    // buckets floor(bal/10) = 0,0,0,3,3 put the rank-3/4 adjacency ACROSS
    // buckets (the boundary case the global rank must stitch)
    val df = Seq(
      (1L, "alice smith", "A", 1.0),
      (2L, "alice smyth", "A", 1.005),
      (3L, "bob jones", "A", 5.0),
      (4L, "carol white", "B", 30.0),
      (5L, "carol whyte", "B", 30.002),
      (6L, "null key", "A", Double.NaN) // NaN sorts, but null is the test below
    ).toDF("id", "nm", "seg", "bal")
      .withColumn("bal", when(col("id") === 6L,
        lit(null).cast("double")).otherwise(col("bal")))
    def snm(w: Int) = RecordLinkage.sortedNeighborhoodPairs(df, "id",
      col("bal"), floor(col("bal") / 10).cast("long"), w, rules, 45L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // window 1: only adjacent ranks scored -> both true pairs found,
    // including the cross-bucket (3, 4) candidate (scored, fails threshold);
    // the null-sortKey record never pairs
    assert(snm(1) == Set((1L, 2L), (4L, 5L)))
    // window 4 reaches everything; the match set is unchanged (more
    // candidates, same survivors)
    assert(snm(4) == Set((1L, 2L), (4L, 5L)))
    // non-order-aligned bucketing fails loud instead of permuting ranks
    val e = intercept[IllegalStateException] {
      RecordLinkage.sortedNeighborhoodPairs(df, "id", col("bal"),
        pmod(col("id"), lit(2L)), 1, rules, 45L)
    }
    assert(e.getMessage.contains("order-aligned"), e.getMessage)
  }

  test("incremental linkage: increment identity, single orientation, guard") {
    // existing = ids 1, 3, 4; increment = ids 2, 8 (both match id 1)
    val df = recs.withColumn("is_new", col("id").isin(2L, 8L))
    val inc = RecordLinkage.linkPairsIncremental(df, "id", col("is_new"),
      Seq(col("blk")), rules, Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // each pair exactly once (new-new (2,8) not doubled)... but ids 2
    // and 6 have null blk/name quirks from `recs` — just pin the sets:
    assert(inc.distinct == inc, s"duplicated pairs: $inc")
    val incSet = inc.toSet
    // the incremental identity: incremental(all) U linkPairs(existing)
    // == linkPairs(all)
    val existingOnly = RecordLinkage.linkPairs(df.filter(!col("is_new")),
      "id", Seq(col("blk")), rules, Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = RecordLinkage.linkPairs(df, "id", Seq(col("blk")), rules,
      Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((incSet ++ existingOnly) == full)
    assert(incSet.intersect(existingOnly).isEmpty)
    // every incremental pair touches a new id
    assert(incSet.forall(p => Set(2L, 8L).contains(p._1) ||
      Set(2L, 8L).contains(p._2)))
    // the guard is increment-proportional: 39 existing + 1 new in one
    // block = 39 pairs for 1 new record -> trips a 10/record cap that
    // the full-join guard (19.5/record over 40) would NOT trip at
    val pile = (1L to 40L).map(i => (i, "hot", s"name$i", "A", 1.0, i == 40L))
      .toDF("id", "blk", "nm", "seg", "bal", "is_new")
    val e = intercept[IllegalStateException] {
      RecordLinkage.linkPairsIncremental(pile, "id", col("is_new"),
        Seq(col("blk")), rules, 0L, maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("new record"), e.getMessage)
    // a NULL isNew flag fails loud instead of asymmetrically dropping pairs
    val withNullFlag = recs.withColumn("is_new",
      when(col("id") === 2L, lit(null).cast("boolean")).otherwise(lit(false)))
    val e2 = intercept[Exception] {
      RecordLinkage.linkPairsIncremental(withNullFlag, "id", col("is_new"),
        Seq(col("blk")), rules, Long.MinValue).collect()
    }
    assert(graft.spark.SparkTestSession.chainMsg(e2).contains("NULL isNew"),
      graft.spark.SparkTestSession.chainMsg(e2).take(300))
  }

  test("EM weight estimation recovers a planted Fellegi-Sunter mixture") {
    // THREE rules — the classic identifiability minimum for the
    // conditional-independence mixture (two binary features give 4 cells
    // for 5 parameters; three give 8 cells for 7). Expected counts from
    // lambda=0.2, m=(0.95, 0.8, 0.9), u=(0.1, 0.3, 0.2).
    val (lam, m, u) = (0.2, Seq(0.95, 0.8, 0.9), Seq(0.1, 0.3, 0.2))
    val pats = for (c1 <- Seq(0L, 1L); c2 <- Seq(0L, 1L); c3 <- Seq(0L, 1L))
      yield {
        val cs = Seq(c1, c2, c3)
        def p(ps: Seq[Double]) = cs.zip(ps)
          .map { case (c, pr) => if (c == 1L) pr else 1 - pr }.product
        (cs, math.round(1000000 * (lam * p(m) + (1 - lam) * p(u))))
      }
    val names = Seq("r1", "r2", "r3")
    val (lamHat, w) = RecordLinkage.estimateWeights(pats, names,
      iterations = 200)
    assert(math.abs(lamHat - lam) < 0.05, s"lambda $lamHat")
    names.indices.foreach { i =>
      assert(math.abs(w(i).m - m(i)) < 0.05 && math.abs(w(i).u - u(i)) < 0.05,
        s"rule $i: ${w(i)}")
    }
    // integerized log2-odds: agree positive, disagree negative, and the
    // most discriminating rule carries the largest agree weight
    assert(w.forall(x => x.agreeWeight > 0 && x.disagreeWeight < 0))
    assert(w(0).agreeWeight > w(1).agreeWeight)
    // missing-evidence codes are skipped, not treated as disagreement:
    // adding a large all-missing pattern must not move the estimates
    val (lamHat2, w2) = RecordLinkage.estimateWeights(
      pats :+ ((Seq(-1L, -1L, -1L), 5000000L)), names, iterations = 200)
    assert(math.abs(w2(0).m - w(0).m) < 0.02, s"${w2(0).m} vs ${w(0).m}")
    assert(math.abs(lamHat2 - lamHat) < 0.05)
    // degenerate all-agree input: clamping keeps weights finite
    val (_, w3) = RecordLinkage.estimateWeights(
      Seq((Seq(1L), 100L)), Seq("only"))
    assert(w3(0).agreeWeight.abs < 10000 && !w3(0).m.isNaN)
    intercept[IllegalArgumentException](
      RecordLinkage.estimateWeights(Seq((Seq(1L), 1L)), Seq("a", "b")))
    // the histogram operator feeds it end-to-end (finite, 3-code domain)
    val hist = RecordLinkage.agreementPatterns(recs, "id", Seq(col("blk")),
      rules).collect().map(r => (Seq(r.getLong(0), r.getLong(1),
        r.getLong(2)), r.getLong(3))).toSeq
    assert(hist.map(_._2).sum == 10L) // C(5,2) same-block pairs of b1
    assert(hist.flatMap(_._1).forall(c => c == -1L || c == 0L || c == 1L))
    val (_, w4) = RecordLinkage.estimateWeights(hist,
      Seq("name", "segment", "balance"))
    assert(w4.forall(x => !x.m.isNaN && !x.u.isNaN))
  }

  test("sampled agreementPatterns converges to full-pass m/u (block sampling)") {
    // 300 heterogeneous blocks: 2 of 3 carry a planted match pair, every
    // block carries non-match pairs, every 5th block has a missing name —
    // so the sampled estimate is a REAL subsample, not a scaled copy
    val rows = (0 until 300).flatMap { b =>
      val blk = s"blk$b"
      val base = Seq(
        (b * 10L + 1, blk, s"name-$b-alpha", "A", b * 1.0),
        (b * 10L + 2, blk,
          if (b % 5 == 0) null else s"name-$b-alphX", "A", b * 1.0 + 0.005),
        (b * 10L + 3, blk, s"other-$b-zzz", "B", b * 1.0 + 77.0))
      if (b % 3 == 2) base.take(1) ++ base.drop(2) else base // no match pair
    }
    val df = rows.toDF("id", "blk", "nm", "seg", "bal")
    def fit(samplingProb: Double) = {
      val hist = RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")),
        rules, samplingProb = samplingProb)
        .collect().map(r => (Seq(r.getLong(0), r.getLong(1), r.getLong(2)),
          r.getLong(3))).toSeq
      RecordLinkage.estimateWeights(hist, Seq("name", "segment", "balance"),
        iterations = 200)
    }
    val (_, full) = fit(1.0)
    val (_, sampled) = fit(0.5)
    // the sampled histogram really is a strict subsample
    full.indices.foreach { i =>
      assert(math.abs(sampled(i).m - full(i).m) < 0.1,
        s"rule $i m: ${sampled(i).m} vs ${full(i).m}")
      assert(math.abs(sampled(i).u - full(i).u) < 0.1,
        s"rule $i u: ${sampled(i).u} vs ${full(i).u}")
    }
    // determinism: the same call yields the same histogram
    val h1 = RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")),
      rules, samplingProb = 0.5).collect().toSet
    val h2 = RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")),
      rules, samplingProb = 0.5).collect().toSet
    assert(h1 == h2 && h1.nonEmpty)
    // and it is smaller than the full pass (blocks really dropped)
    val nFull = RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")),
      rules).agg(sum("n")).head().getLong(0)
    val nSamp = RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")),
      rules, samplingProb = 0.5).agg(sum("n")).head().getLong(0)
    assert(nSamp < nFull && nSamp > 0, s"$nSamp vs $nFull")
    intercept[IllegalArgumentException](
      RecordLinkage.agreementPatterns(df, "id", Seq(col("blk")), rules,
        samplingProb = 0.0))
  }

  test("canonicalizeEntities: best-preferBy per entity, null-last, id ties") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(9.0)), (3L, None),   // entity {1,2,3}
      (4L, None), (5L, None),                          // entity {4,5}: all null
      (9L, Some(1.0))                                  // singleton
    ).toDF("id", "q").withColumn("q", col("q").cast("double"))
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = RecordLinkage.canonicalizeEntities(df, "id", pairs, col("q"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(2), r.getLong(3)))).toMap
    // highest q wins; all-null entity falls back to min id; singleton kept
    assert(out.keySet == Set(2L, 4L, 9L), out.toString)
    assert(out(2L) == ((1L, 3L)))  // entity_id = min member, size 3
    assert(out(4L) == ((4L, 2L)))
    assert(out(9L) == ((9L, 1L)))
  }

  test("validation: empty blocks/rules, duplicate names, inverted weights") {
    intercept[IllegalArgumentException](
      RecordLinkage.linkPairs(recs, "id", Seq.empty, rules, 0L))
    intercept[IllegalArgumentException](
      RecordLinkage.linkPairs(recs, "id", Seq(col("blk")), Seq.empty, 0L))
    intercept[IllegalArgumentException](
      RecordLinkage.linkPairs(recs, "id", Seq(col("blk")),
        rules :+ ExactField("name", col("nm"), 1L, 0L), 0L))
    intercept[IllegalArgumentException](
      RecordLinkage.linkPairs(recs, "id", Seq(col("blk")),
        Seq(ExactField("x", col("nm"), -5L, 5L)), 0L))
    // rule names become column names: dots would break resolution
    intercept[IllegalArgumentException](
      RecordLinkage.linkPairs(recs, "id", Seq(col("blk")),
        Seq(ExactField("a.b", col("nm"), 5L, -5L)), 0L))
    // the histogram pass carries the same volume guard
    val pile = (1L to 40L).map(i => (i, "hot", s"n$i", "A", 1.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val e = intercept[IllegalStateException] {
      RecordLinkage.agreementPatterns(pile, "id", Seq(col("blk")), rules,
        maxPairsPerRecord = 10.0)
    }
    assert(e.getMessage.contains("agreementPatterns"), e.getMessage)
  }
}
