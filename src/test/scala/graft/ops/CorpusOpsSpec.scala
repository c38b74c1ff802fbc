package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("piiScrub redacts and counts every pattern kind") {
    val df = Seq((1L,
      "mail a.b%x@ex-1.co.uk and c@d.org ip 10.0.3.7 ssn 123-45-6789 ph 555 013 2244 end"))
      .toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(df, "text").collect().head
    assert(out.getAs[Long]("n_email") == 2)
    assert(out.getAs[Long]("n_ip") == 1)
    assert(out.getAs[Long]("n_ssn") == 1)
    assert(out.getAs[Long]("n_phone") == 1)
    assert(out.getAs[String]("scrubbed") ==
      "mail <EMAIL> and <EMAIL> ip <IP> ssn <SSN> ph <PHONE> end")
  }

  test("piiScrub leaves clean text untouched") {
    val df = Seq((1L, "nothing sensitive here, just words and the number 42"))
      .toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(df, "text").collect().head
    assert(out.getAs[String]("scrubbed") == out.getAs[String]("text"))
    assert(out.getAs[Long]("n_email") + out.getAs[Long]("n_ip") +
      out.getAs[Long]("n_ssn") + out.getAs[Long]("n_phone") == 0)
  }

  test("repetitionFeatures computes exact Gopher-style fractions") {
    // tokens: a b a b a  -> top token 'a' 3/5; 2-grams: "a b","b a","a b","b a"
    // -> top 2/4, dup (4-2)/4; 3-grams: "a b a","b a b","a b a" -> dup 1/3
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val out = CorpusOps.repetitionFeatures(df, "text").collect().head
    assert(out.getAs[Long]("n_tokens") == 5)
    assert(out.getAs[Double]("top_token_frac") == 3.0 / 5)
    assert(out.getAs[Double]("top_2gram_frac") == 2.0 / 4)
    assert(out.getAs[Double]("dup_2gram_frac") == 2.0 / 4)
    assert(out.getAs[Double]("dup_3gram_frac") == 1.0 / 3)
  }

  test("repetitionFeatures: empty and single-token documents") {
    val df = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val out = CorpusOps.repetitionFeatures(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 0)
    assert(out(1L).getAs[Double]("top_token_frac") == 0.0)
    assert(out(2L).getAs[Double]("top_token_frac") == 1.0)
    assert(out(2L).getAs[Double]("dup_2gram_frac") == 0.0)
  }

  test("ngramContamination flags overlapping docs, zero for clean docs") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma something else entirely"), // shares "alpha beta gamma"
      (2L, "totally unrelated words in here now")
    ).toDF("doc_id", "text")
    val out = CorpusOps.ngramContamination(corpus, "text", bench, "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_contaminated") == 1)
    assert(out(1L).getAs[Long]("n_grams") == 4)
    assert(out(1L).getAs[Double]("contamination_frac") == 0.25)
    assert(out(2L).getAs[Long]("n_contaminated") == 0)
    assert(out(2L).getAs[Double]("contamination_frac") == 0.0)
  }

  test("stratifiedSample: exactly min(k, |stratum|) rows, hash order, deterministic") {
    val df = (1L to 100L).map(i => (if (i <= 80) "big" else "small", i))
      .toDF("grp", "id")
    val out = CorpusOps.stratifiedSample(df, "grp", "id", k = 10).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("id"), r.getAs[Long]("rk")))
    val byStratum = out.groupBy(_._1)
    assert(byStratum("big").length == 10)
    assert(byStratum("small").length == 10)
    // rank order must equal (md5(id), id) ascending within the stratum
    def md5Of(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectBig = (1L to 80L).map(i => (md5Of(i), i)).sorted.take(10).map(_._2)
    assert(byStratum("big").sortBy(_._3).map(_._2).toSeq == expectBig)
    // small stratum has 20 rows, k=10 kept
    assert(byStratum("small").map(_._3).sorted.toSeq == (1L to 10L))
    // repartitioning must not change the result (merge path exercised)
    val out2 = CorpusOps.stratifiedSample(df.repartition(13), "grp", "id", k = 10)
      .collect().map(r => (r.getAs[String]("stratum"), r.getAs[Long]("id"), r.getAs[Long]("rk")))
    assert(out2.sortBy(r => (r._1, r._3)).toSeq == out.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("approx_count_distinct stays within 5% of exact on events") {
    val df = (1L to 5000L).map(i => (i % 997, "t")).toDF("user_id", "event_type")
    val row = df.agg(
      approx_count_distinct("user_id", 0.02).as("a"),
      countDistinct(col("user_id")).as("e")).collect().head
    val rel = math.abs(row.getLong(0) - row.getLong(1)).toDouble / row.getLong(1)
    assert(rel <= 0.05, s"relative error $rel")
  }

  test("HLL sketch union across shards stays within 5% of exact distinct") {
    // per-shard sketches unioned to a total — the store-and-merge pattern;
    // users deliberately overlap across shards so union != sum
    val df = (1L to 6000L).map(i => (i % 10, i % 1499)).toDF("shard", "user_id")
    val perShard = df.groupBy("shard")
      .agg(hll_sketch_agg(col("user_id").cast("string"), lit(14)).as("sk"))
    val est = perShard.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("a")).collect().head.getLong(0)
    val exact = df.select(countDistinct("user_id")).collect().head.getLong(0)
    val rel = math.abs(est - exact).toDouble / exact
    assert(rel <= 0.05, s"union estimate $est vs exact $exact (rel $rel)")
  }

  test("packSequences: global contiguous fill across bucket boundaries") {
    // ids span 3 buckets (width 4); lens force packs to straddle both doc
    // and bucket boundaries; sparse ids (gaps) must not disturb the layout
    val df = Seq((0L, 3L), (1L, 5L), (3L, 4L), (5L, 7L), (9L, 2L), (11L, 6L))
      .toDF("doc_id", "n_toks")
    val out = CorpusOps.packSequences(df, "doc_id", "n_toks",
      seqLen = 8L, bucketWidth = 4L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cumulative starts: 0,3,8,12,19,21 -> packs of 8
    assert(out(0L) == ((3L, 0L, 0L)))
    assert(out(1L) == ((5L, 0L, 3L)))
    assert(out(3L) == ((4L, 1L, 0L)))   // starts exactly on pack 1
    assert(out(5L) == ((7L, 1L, 4L)))   // bucket 1, offset carried over
    assert(out(9L) == ((2L, 2L, 3L)))   // bucket 2
    assert(out(11L) == ((6L, 2L, 5L)))
  }

  test("packSequences matches the sequential cumsum on random sparse inputs") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).filter(_ => rnd.nextBoolean())
      .map(i => (i.toLong, 1L + rnd.nextInt(40).toLong))
    val df = rows.toDF("doc_id", "n_toks")
    val got = CorpusOps.packSequences(df, "doc_id", "n_toks",
      seqLen = 64L, bucketWidth = 17L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    var cum = 0L
    rows.sortBy(_._1).foreach { case (id, len) =>
      val start = cum
      assert(got(id) == ((start / 64L, start % 64L)), s"doc $id")
      cum += len
    }
    assert(got.size == rows.size)
  }

  test("packSequences rejects null ids and lengths with a clear message") {
    import graft.spark.SparkTestSession.chainMsg
    val nullId = Seq((Some(0L), Some(3L)), (None, Some(5L)))
      .toDF("doc_id", "n_toks")
    val ex1 = intercept[Exception] {
      CorpusOps.packSequences(nullId, "doc_id", "n_toks", 8L, 4L).collect()
    }
    assert(chainMsg(ex1).contains("null doc_id"), chainMsg(ex1))
    val nullLen = Seq((Some(0L), Some(3L)), (Some(1L), None))
      .toDF("doc_id", "n_toks")
    val ex2 = intercept[Exception] {
      CorpusOps.packSequences(nullLen, "doc_id", "n_toks", 8L, 4L).collect()
    }
    assert(chainMsg(ex2).contains("null/negative n_toks"), chainMsg(ex2))
    // a NEGATIVE length would overlap pack assignments (r19 review fix)
    val negLen = Seq((0L, 5L), (1L, -3L), (2L, 4L)).toDF("doc_id", "n_toks")
    val ex3 = intercept[Exception] {
      CorpusOps.packSequences(negLen, "doc_id", "n_toks", 8L, 4L).collect()
    }
    assert(chainMsg(ex3).contains("null/negative n_toks"), chainMsg(ex3))
  }

  test("vocabTopK: exact counts, count-desc token-asc order") {
    val df = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana apple date"),
      (3L, "apple")
    ).toDF("doc_id", "text")
    val out = CorpusOps.vocabTopK(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("apple", 4L), ("banana", 2L), ("cherry", 1L)))
  }

  test("applyMixture: rate-proportional, growth-stable, split-independent, no shuffle") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = CorpusOps.applyMixture(df, "src", "id", Map("a" -> 0.25, "b" -> 1.0))
    val kept = out.collect().map(r => (r.getLong(0), r.getString(1)))
    val aKept = kept.count(_._2 == "a"); val bKept = kept.count(_._2 == "b")
    assert(bKept == 1000, "rate 1.0 keeps everything")
    assert(math.abs(aKept - 250) < 60, s"rate 0.25 kept $aKept of 1000")
    // growth-stable: the kept set over a prefix is a subset of the kept set
    // over the grown corpus (hash membership, not position)
    val prefix = CorpusOps.applyMixture(
        df.filter(col("id") < 1000), "src", "id", Map("a" -> 0.25, "b" -> 1.0))
      .collect().map(_.getLong(0)).toSet
    assert(prefix.subsetOf(kept.map(_._1).toSet))
    // default rate applies to unlisted groups; 0.0 drops them
    assert(CorpusOps.applyMixture(df, "src", "id", Map("a" -> 0.5)).collect()
      .forall(_.getString(1) == "a"))
    // salted hash: mixture membership must NOT be hashSplit's train set
    // (unsalted, rate 0.8 would keep exactly the 'train' rows)
    val splitTrain = CorpusOps.hashSplit(df, "id")
      .filter(col("split") === "train").collect().map(_.getLong(0)).toSet
    val mix80 = CorpusOps.applyMixture(df, "src", "id",
      Map("a" -> 0.8, "b" -> 0.8)).collect().map(_.getLong(0)).toSet
    assert(mix80 != splitTrain, "mixture membership must be decorrelated from splits")
    // zero shuffle: broadcast join only
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"mixture must not shuffle:\n$plan")
  }

  test("prepPipeline: first failing rule wins; clean doc keeps") {
    val en = "the cat sat on the mat and it was that kind of day for all of " +
      "them to be in this good place with more light than not"
    val short = "the cat"
    val repetitive = ("spam ham " * 40).trim
    val df = Seq((1L, en), (2L, short), (3L, repetitive)).toDF("doc_id", "text")
    val out = CorpusOps.prepPipeline(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), Option(r.getString(7)))).toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some("too_short")))
    // 79 2-grams, "spam ham" occurs 40x -> top_2gram_frac ~ 0.506 > 0.09
    assert(out(3L) == (false, Some("repetitive_2gram")))
  }

  test("exportRangeSorted: disjoint ascending ranges, zero overlaps, full coverage") {
    val rows = (1L to 500L).map(i => (i, (i * 37 % 211).toDouble))
      .toDF("id", "key").repartition(7)
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    val m = CorpusOps.exportRangeSorted(rows, "key", dir, nParts = 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    // probes: no adjacent-range overlaps, totals cover the input, nothing
    // lost between input and written files
    assert(m.forall(_._5 == 0L), s"overlap violations: $m")
    assert(m.forall(_._6 == 500L))
    assert(m.forall(_._7 == 0L), s"rows_missing nonzero: $m")
    assert(m.map(_._2).sum == 500L)
    // ranges ascend strictly across partitions: every part's max <= next min
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"range overlap between parts ${a._1} and ${b._1}")
    case _ => ()
    }
    // each written file is locally sorted (the global-sort contract is
    // disjoint ranges + local order)
    val spark2 = rows.sparkSession
    val p0 = m.head._1
    val f = spark2.read.parquet(s"$dir/part=$p0")
      .select("key").collect().map(_.getDouble(0))
    assert(f.nonEmpty && (f sameElements f.sorted))
  }

  test("exportRangeBounded: explicit boundaries route deterministically, clamp out-of-range keys") {
    // keys in [0, 211) + two out-of-range outliers that must CLAMP into
    // the edge buckets instead of growing extra files
    val rows = ((1L to 500L).map(i => (i, (i * 37 % 211).toDouble))
      ++ Seq((501L, -40.0), (502L, 9999.0)))
      .toDF("id", "key").repartition(7)
    val dir = java.nio.file.Files.createTempDirectory("graft-rangeb").toString
    val m = CorpusOps.exportRangeBounded(rows, "key", dir,
        lo = 0.0, width = 30.0, nParts = 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(m.forall(_._5 == 0L), s"overlap violations: $m")
    assert(m.forall(_._6 == 502L))
    assert(m.forall(_._7 == 0L), s"rows_missing nonzero: $m")
    // bucket membership is the EXPLICIT formula, not sampling: every key
    // in part p sits in [p*30, (p+1)*30) except clamped edges
    m.foreach { case (p, _, kmin, kmax, _, _, _) =>
      if (p > 0) assert(kmin >= p * 30.0, s"part $p min $kmin below range")
      if (p < 7) assert(kmax < (p + 1) * 30.0, s"part $p max $kmax above range")
    }
    // the outliers landed in the edge buckets
    assert(m.head._3 == -40.0, "low outlier not clamped into part 0")
    assert(m.last._4 == 9999.0, "high outlier not clamped into part 7")
    // deterministic re-export: same input -> identical manifest
    val dir2 = java.nio.file.Files.createTempDirectory("graft-rangeb2").toString
    val m2 = CorpusOps.exportRangeBounded(rows, "key", dir2,
        lo = 0.0, width = 30.0, nParts = 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(m sameElements m2, "bounded export not deterministic across runs")
  }

  test("exportShards: deterministic manifest, full coverage, ordered files") {
    val docs = (1L to 400L).map(i => (i, s"text-$i", 10L + i % 7))
      .toDF("doc_id", "text", "n_chars").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    def manifest() = CorpusOps.exportShards(docs, "doc_id", "n_chars", dir, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val m1 = manifest()
    // all 8 shards populated; totals add up to the corpus
    assert(m1.map(_._1) == (0 until 8).toSet)
    assert(m1.toSeq.map(_._2).sum == 400L)
    // a rewrite from a DIFFERENT input partitioning produces the identical
    // manifest — assignment and checksums are functions of the data alone
    val m2 = CorpusOps.exportShards(docs.repartition(3), "doc_id", "n_chars", dir, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(m2 == m1)
    // shard files really are (hash, id)-ordered: re-read one shard and
    // check the write order survives
    val spark2 = docs.sparkSession
    val s0 = spark2.read.parquet(s"$dir/shard=0")
      .withColumn("__h", conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"))
      .collect().map(r => (r.getAs[Long]("__h"), r.getAs[Long]("doc_id")))
    assert(s0.nonEmpty && (s0 sameElements s0.sortBy(identity)),
      "shard file rows must be (hash, id)-ordered as written")
  }

  test("c4Filter applies every line rule and page rule") {
    val docs = Seq(
      // clean page: 3 substantial sentences + one short line dropped
      (1L, "This is a good first sentence of a page.\nok.\n" +
        "Here is the second proper sentence right here!\n" +
        "And a third one closes it out, naturally?"),
      // javascript line dropped, page then below 3 sentences => dropped
      (2L, "Please enable JavaScript to see this content fine.\n" +
        "One real sentence is written right here today.\n" +
        "A second real sentence is also written here now."),
      // brace => page dropped even though lines are fine
      (3L, "A perfectly reasonable sentence { with code } inside it.\n" +
        "Another perfectly reasonable long sentence sits here.\n" +
        "And a third perfectly reasonable sentence too."),
      // lorem ipsum => page dropped
      (4L, "Lorem Ipsum dolor sit amet, consectetur adipiscing elit.\n" +
        "A second real sentence is also written here now.\n" +
        "And a third real sentence is written here as well."),
      // no terminal punctuation anywhere => zero lines kept
      (5L, "just some words with no punctuation at all\nand more of them"))
      .toDF("doc_id", "text")
    val r = CorpusOps.c4Filter(docs, "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_lines_kept") == 3 &&
      r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[String]("clean_text").linesIterator.size == 3)
    assert(r(2L).getAs[Long]("n_lines_kept") == 2 &&
      !r(2L).getAs[Boolean]("keep"), "javascript line must drop the page below 3 sentences")
    assert(r(3L).getAs[Boolean]("has_brace") && !r(3L).getAs[Boolean]("keep"))
    assert(r(4L).getAs[Boolean]("has_lorem") && !r(4L).getAs[Boolean]("keep"))
    assert(r(5L).getAs[Long]("n_lines_kept") == 0 &&
      !r(5L).getAs[Boolean]("keep"))
  }

  private def cdcBase = Seq(
    (1L, 1L, false, "a"), (2L, 1L, false, "b"), (3L, 1L, false, "c"),
    (4L, 5L, false, "old-but-high-version")
  ).toDF("id", "version", "deleted", "payload")

  test("snapshotDiff: statuses on a planted refresh; NULL-safe compare; contracts") {
    import org.apache.spark.sql.functions._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"),
        (4L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val neu = Seq((1L, "a"), (2L, "B"), (5L, "e"),
        (4L, "now-set"))
      .toDF("id", "v")
    val got = CorpusOps.snapshotDiff(old, neu, "id", Seq("v"))
      .select("id", "diff_status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged, 2 changed, 3 removed, 5 added; 4: NULL -> value is a
    // CHANGE (the null-safe <=> — a naive equality would call it
    // unchanged because NULL = 'now-set' is NULL, not false)
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "changed"), got.toString)
    // duplicate ids fail loud NAMING the id and the side (they would
    // silently multiply join rows)
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    val eD = intercept[Exception](
      CorpusOps.snapshotDiff(dup, neu, "id", Seq("v")).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eD)
      .contains("duplicate id '1' in the old snapshot"),
      graft.spark.SparkTestSession.chainMsg(eD).take(300))
    // NULL ids fail loud; missing compare column rejected
    val eN = intercept[Exception](CorpusOps.snapshotDiff(
      Seq((null.asInstanceOf[java.lang.Long], "a")).toDF("id", "v"),
      neu, "id", Seq("v")).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eN).contains("NULL id"))
    intercept[IllegalArgumentException](
      CorpusOps.snapshotDiff(old, neu, "id", Seq("nope")))
  }

  test("mergeUpsert: higher version wins, tombstone winners are dropped") {
    val updates = Seq(
      (1L, 2L, false, "a2"),       // upsert over id 1
      (2L, 2L, true, "b-gone"),    // tombstone id 2
      (4L, 2L, false, "too-old"),  // LOSES: base already at version 5
      (9L, 1L, false, "new-row")   // pure insert
    ).toDF("id", "version", "deleted", "payload")
    val got = CorpusOps.mergeUpsert(cdcBase, updates, Seq("id"), "version",
        deleteCol = Some("deleted"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("version"),
        r.getAs[String]("payload"))).toSet
    assert(got == Set((1L, 2L, "a2"), (3L, 1L, "c"),
      (4L, 5L, "old-but-high-version"), (9L, 1L, "new-row")))
  }

  test("mergeUpsert: version tie goes to the update batch, deterministically") {
    val updates = Seq((1L, 1L, false, "a-updated")).toDF(
      "id", "version", "deleted", "payload")
    val got = CorpusOps.mergeUpsert(cdcBase, updates, Seq("id"), "version",
        deleteCol = Some("deleted"))
      .filter(col("id") === 1L).collect().head.getAs[String]("payload")
    assert(got == "a-updated")
  }

  test("mergeUpsert: null version fails loud") {
    val updates = Seq((1L, Option.empty[Long], false, "x")).toDF(
      "id", "version", "deleted", "payload")
    val e = intercept[Exception] {
      CorpusOps.mergeUpsert(cdcBase, updates, Seq("id"), "version").collect()
    }
    assert(SparkTestSession.chainMsg(e).contains("null version"))
  }

  test("weightedSample: k rows, weight-biased, deterministic, heap-based plan") {
    // 1000 docs: ids 0..899 weight 1, ids 900..999 weight 100 — the heavy
    // 10% should dominate a weight-proportional sample
    val docs = (0L until 1000L).map(i => (i, if (i >= 900) 100L else 1L))
      .toDF("id", "w")
    val s1 = CorpusOps.weightedSample(docs, "id", "w", 50)
    val rows = s1.collect()
    assert(rows.length == 50)
    val heavy = rows.count(_.getAs[Double]("w") == 100.0)
    assert(heavy > 25, s"heavy items under-represented: $heavy/50")
    // deterministic: same input, same sample
    val s2 = CorpusOps.weightedSample(docs, "id", "w", 50).collect()
    assert(rows.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    // top-k is bounded heaps, never a global sort
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected heap top-k:\n$plan")
  }

  test("weightedSample: non-positive weight fails loud") {
    val docs = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      CorpusOps.weightedSample(docs, "id", "w", 1).collect()
    }
    assert(SparkTestSession.chainMsg(e).contains("must be positive"))
  }

  test("budgetSelect: keeps exactly the best-first prefix within budget") {
    // scores descend with id; lens chosen so the budget cuts mid-list
    val docs = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.8), (3L, 30L, 0.7),
      (4L, 25L, 0.6), (5L, 5L, 0.5)
    ).toDF("id", "len", "score")
    // budget 60: 10+20+30=60 fits; id 4 overflows; id 5 would fit but
    // prefix semantics stop at the first overflow
    val got = CorpusOps.budgetSelect(docs, "id", "len", "score", budget = 60L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens")))
      .toSet
    assert(got == Set((1L, 10L), (2L, 30L), (3L, 60L)))
  }

  test("budgetSelect: bin-crossing prefix sum matches a single global cumsum") {
    // 500 rows with scores spread over many bins; independently verify
    // against a driver-side exact cumulative sum in (score desc, id) order
    val docs = (0L until 500L).map(i =>
      (i, i % 37 + 1, ((i * 7919) % 1000) / 1000.0)).toDF("id", "len", "score")
    val budget = 2000L
    val got = CorpusOps.budgetSelect(docs, "id", "len", "score", budget)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum_tokens"))).toMap
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, s) => (-s, id) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, len, _)) =>
        (id, len, cum + len) }
      .drop(1).takeWhile(_._3 <= budget)
      .map { case (id, _, cum) => (id, cum) }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("budgetSelect: score outside [0,1] fails loud; no single-task window") {
    val bad = Seq((1L, 10L, 1.5)).toDF("id", "len", "score")
    val e = intercept[Exception] {
      CorpusOps.budgetSelect(bad, "id", "len", "score", 100L).collect()
    }
    assert(SparkTestSession.chainMsg(e).contains("must be in [0,1]"))
    val ok = Seq((1L, 10L, 0.5), (2L, 10L, 0.25)).toDF("id", "len", "score")
    val plan = CorpusOps.budgetSelect(ok, "id", "len", "score", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global-order prefix sum must not funnel through one task:\n$plan")
  }

  test("mergeUpsert: argmax plan — one exchange, map-side partial aggregate") {
    val updates = Seq((1L, 2L, false, "a2")).toDF(
      "id", "version", "deleted", "payload")
    val merged = CorpusOps.mergeUpsert(cdcBase, updates, Seq("id"), "version",
      deleteCol = Some("deleted"))
    val plan = merged.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"one shuffle expected (argmax aggregate, no window sort):\n$plan")
    assert(!plan.contains("Window"), s"no window sort expected:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("partial"),
      s"map-side combine expected:\n$plan")
  }

  test("temperatureThresholds: sqrt weighting up-weights rare groups; caps at grid") {
    // 80 'big' rows vs 20 'small': raw shares 0.8/0.2, sqrt weights
    // w_big = floor(sqrt(8000)) = 89, w_small = floor(sqrt(2000)) = 44
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small"))).toDF("id", "g")
    val thr = CorpusOps.temperatureThresholds(df, "g", budgetPpm = 500000L)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("w"), r.getAs[Long]("thr"))).toMap
    assert(thr("big") == ((80L, 89L, 50L * 89 * 1000000 / (133 * 80))))
    assert(thr("small") == ((20L, 44L, 50L * 44 * 1000000 / (133 * 20))))
    // the small group keeps a ~1.6x larger FRACTION of itself: that is the
    // temperature effect (equal-share would keep 50% of each)
    assert(thr("small")._3 > thr("big")._3)
    // full-budget degenerate case: every threshold caps at the grid
    val all = CorpusOps.temperatureThresholds(df, "g", budgetPpm = 1000000L)
      .collect().map(_.getAs[Long]("thr"))
    assert(all.forall(_ <= 1000000L))
  }

  test("applyThresholds keeps exactly the under-threshold hash buckets") {
    val df = (1 to 200).map(i => (i.toLong, "g", 1)).toDF("id", "g", "x")
    val thr = Seq(("g", 250000L)).toDF("g", "thr")
    val kept = CorpusOps.applyThresholds(df, "g", "id", thr, salt = "#t")
    // every kept row's salted bucket is under the threshold, and the kept
    // fraction is in the right ballpark for a uniform hash
    val buckets = kept.select(
      pmod(conv(substring(md5(concat(col("id").cast("string"), lit("#t"))), 1, 15), 16, 10)
        .cast("long"), lit(1000000L)).as("b")).collect().map(_.getLong(0))
    assert(buckets.forall(_ < 250000L))
    assert(buckets.length > 20 && buckets.length < 90) // ~50 expected of 200
    // groups missing from the table keep NOTHING (explicit mixture only)
    val none = CorpusOps.applyThresholds(
      df.withColumn("g", lit("other")), "g", "id", thr, salt = "#t")
    assert(none.count() == 0L)
  }

  test("epochRepeat: full epochs + fractional epoch hit the token target") {
    // one group, 4 docs x 25 tokens = 100 tokens; target 260 => 2 full
    // epochs + 60% fractional; cap high enough not to bind
    val df = (1 to 4).map(i => (i.toLong, "s", 25L)).toDF("id", "src", "tok")
    val out = CorpusOps.epochRepeat(df, "id", "tok", "src",
      targetTokens = 260L, maxEpochs = 10)
    val byEpoch = out.groupBy("epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEpoch(1L) == 4L && byEpoch(2L) == 4L) // full epochs: every doc
    // fractional epoch selects SOME subset (hash of 4 ids at 600000 ppm)
    assert(byEpoch.getOrElse(3L, 0L) <= 4L)
    assert(out.filter(col("epoch") > 3L).count() == 0L)
    // cap binds: maxEpochs=2 emits exactly 2 epochs per doc, no fraction
    val capped = CorpusOps.epochRepeat(df, "id", "tok", "src",
      targetTokens = 260L, maxEpochs = 2)
    assert(capped.count() == 8L)
    assert(capped.agg(max("epoch")).collect().head.getLong(0) == 2L)
    // DOWN-sampling regime (target < mass => zero full epochs): only the
    // fractional epoch may emit, and it must be epoch 1. Guards the
    // sequence(1, 0) pitfall — Spark's sequence(1, 0) is [1, 0], NOT
    // empty, so an unguarded explode emitted two spurious epochs here.
    val down = CorpusOps.epochRepeat(df, "id", "tok", "src",
      targetTokens = 50L, maxEpochs = 4) // 50 of 100 tokens => frac only
    val downRows = down.collect()
    assert(downRows.forall(_.getAs[Long]("epoch") == 1L),
      s"zero-full-epoch group must emit only the fractional epoch 1: ${downRows.toSeq}")
    assert(downRows.length < 4, "fractional epoch must not keep every doc at 500000 ppm")
  }

  test("tableDiff: added/removed/changed/unchanged incl. one-sided nulls") {
    val base = Seq(
      (1L, Some("a"), 10L), // unchanged
      (2L, Some("b"), 20L), // changed payload
      (3L, Some("c"), 30L), // removed
      (5L, None: Option[String], 50L), // null -> value: changed
      (6L, Some("f"), 60L)  // value -> null: changed
    ).toDF("id", "s", "v")
    val revised = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 20L),
      (4L, Some("d"), 40L), // added
      (5L, Some("e"), 50L),
      (6L, None: Option[String], 60L)
    ).toDF("id", "s", "v")
    val out = CorpusOps.tableDiff(base, revised, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed", 6L -> "changed"))
    // schema drift fails loud
    intercept[IllegalArgumentException] {
      CorpusOps.tableDiff(base, revised.drop("v"), Seq("id"))
    }
    // duplicate keys fail loud instead of cross-producting the join
    val dup = revised.unionByName(revised.limit(1))
    val e = intercept[Exception] {
      CorpusOps.tableDiff(base, dup, Seq("id")).collect()
    }
    assert(String.valueOf(e.getMessage).contains("duplicate key") ||
      String.valueOf(e.getCause).contains("duplicate key"))
  }

  test("compactFiles: fewer files, rank-deterministic bins, nothing lost") {
    val tmp = java.nio.file.Files.createTempDirectory("compact_spec").toString
    val df = (0L until 500L).map(i => (i, i * 2)).toDF("id", "payload")
    df.repartition(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("maxRecordsPerFile", 25)
      .parquet(s"$tmp/small")
    val m = CorpusOps.compactFiles(spark, s"$tmp/small", s"$tmp/big", "id",
        targetRows = 100L)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(m.length == 5)
    assert(m.head.getAs[Long]("files_before") == 20L)
    assert(m.head.getAs[Long]("files_after") == 5L)
    assert(m.forall(_.getAs[Long]("rows_missing") == 0L))
    // bins are contiguous rank ranges over the id order
    m.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_rows") == 100L)
      assert(r.getAs[Long]("id_min") == i * 100L)
      assert(r.getAs[Long]("id_max") == i * 100L + 99L)
    }
    // the compacted table carries the FULL rows — a compaction that
    // rewrote only ids would silently lose every payload column
    val back = spark.read.parquet(s"$tmp/big")
    assert(back.columns.toSet == Set("id", "payload", "bin"))
    assert(back.agg(sum("payload")).collect().head.getLong(0)
      == (0L until 500L).map(_ * 2).sum)
  }

  test("weightedInterleave: prefix composition tracks weights; deterministic") {
    val df = ((1 to 300).map(i => (i.toLong, "a")) ++
      (301 to 600).map(i => (i.toLong, "b"))).toDF("id", "g")
    val weights = Map("a" -> 1L, "b" -> 3L)
    val out = CorpusOps.weightedInterleave(df, "id", "g", weights)
    // a weight-3 source runs 3x the pace: in the first 200 of the global
    // (vt, g, id) order, b should hold ~150 slots and a ~50 — exact here
    // because pacing is deterministic (b ranks 1..150 have vt <= 50000000
    // == a ranks 1..50)
    val prefix = out.orderBy(col("vt"), col("g"), col("id")).limit(200)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prefix("b") == 150L && prefix("a") == 50L, s"prefix $prefix")
    // reruns replay bit-identically
    val a = out.orderBy("vt", "g", "id").collect().map(_.toSeq)
    val b = CorpusOps.weightedInterleave(df, "id", "g", weights)
      .orderBy("vt", "g", "id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // a group with no weight entry fails LOUD (silently dropping a source
    // from the training order is the worst default)
    // collect() (not count()) — a count prunes the guarded projection
    val e = intercept[Exception] {
      CorpusOps.weightedInterleave(
        df.withColumn("g", lit("zz")), "id", "g", weights).collect()
    }
    assert(String.valueOf(e.getMessage).contains("no weight") ||
      String.valueOf(e.getCause).contains("no weight"))
  }

  test("rendezvousShard: stable under growth — moved keys only go to the new shard") {
    val df = (1 to 2000).map(i => Tuple1(i.toLong)).toDF("id")
    val out = df.select(col("id"),
        CorpusOps.rendezvousShard(col("id"), 8).as("s8"),
        CorpusOps.rendezvousShard(col("id"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.forall { case (_, s8, _) => s8 >= 0 && s8 < 8 })
    assert(out.forall { case (_, _, s9) => s9 >= 0 && s9 < 9 })
    // THE rendezvous invariant: a key either keeps its shard or moves to
    // the NEW shard 8 — never between existing shards
    assert(out.forall { case (_, s8, s9) => s9 == s8 || s9 == 8 })
    // expected move rate 1/9 of 2000 ~ 222; allow generous uniform slack
    val moved = out.count { case (_, s8, s9) => s8 != s9 }
    assert(moved > 120 && moved < 340, s"moved=$moved (expected ~222)")
    // balanced-ish occupancy under 8 shards (uniform hash: ~250 each)
    val occ = out.groupBy(_._2).view.mapValues(_.length)
    assert(occ.values.forall(c => c > 150 && c < 350), s"occupancy $occ")
  }

  test("deterministicShuffle: a permutation, reproducible, seed-sensitive") {
    val df = (1 to 500).map(i => Tuple1(i.toLong)).toDF("id")
    val a = CorpusOps.deterministicShuffle(df, "id", "seedA", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every input id appears exactly once
    assert(a.map(_._1).sorted.toSeq == (1L to 500L))
    // positions within a shard are 1..count(shard) with no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    // rerun is bit-identical; a different seed is a different permutation
    val a2 = CorpusOps.deterministicShuffle(df, "id", "seedA", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == a2.sortBy(_._1).toSeq)
    val b = CorpusOps.deterministicShuffle(df, "id", "seedB", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq != b.sortBy(_._1).toSeq)
  }

  test("distributionDrift: dense grid, clamped edges, exact cross deviations") {
    // a: 4 values in bin 0, 2 in bin 1; b: 1 in bin 0, 3 in bin 1, plus
    // out-of-range values clamping into both edge bins
    val a = Seq(0.5, 1.0, 2.0, 4.9, 5.0, 9.0).toDF("v")   // [0,5)x4, [5,10)x2
    val b = Seq(-3.0, 7.0, 8.0, 9.9, 25.0).toDF("v")      // clamp->0, 3x bin1, clamp->1
    val out = CorpusOps.distributionDrift(a, b, "v", lo = 0.0, hi = 10.0, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.map(x => (x._1, x._2, x._3)).toSeq == Seq((0L, 4L, 1L), (1L, 2L, 4L)))
    assert(out.forall(x => x._4 == 6L && x._5 == 5L))
    // dev_x = |n_a*tot_b - n_b*tot_a|: |4*5-1*6| = 14, |2*5-4*6| = 14
    assert(out.map(_._6).toSeq == Seq(14L, 14L))
    // identical snapshots drift zero on every bin; empty bins still emit
    val same = CorpusOps.distributionDrift(a, a, "v", 0.0, 10.0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(5))).sortBy(_._1)
    assert(same.length == 4 && same.forall(_._2 == 0L))
    // NULL and NaN fail loud instead of masquerading as edge-bin mass
    val withNull = Seq(Some(1.0), None).toDF("v")
    intercept[Exception] {
      CorpusOps.distributionDrift(a, withNull, "v", 0.0, 10.0, 2).collect()
    }
    val withNan = Seq(1.0, Double.NaN).toDF("v")
    intercept[Exception] {
      CorpusOps.distributionDrift(withNan, a, "v", 0.0, 10.0, 2).collect()
    }
  }

  test("categoricalDrift: union key grid surfaces appearing/vanishing categories") {
    val a = Seq("en", "en", "en", "de").toDF("lang")
    val b = Seq("en", "zh", "zh").toDF("lang") // de vanished, zh appeared
    val out = CorpusOps.categoricalDrift(a, b, "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .sortBy(_._1)
    assert(out.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("de", 1L, 0L), ("en", 3L, 1L), ("zh", 0L, 2L)))
    // dev_x with tot_a=4, tot_b=3: de |1*3-0*4|=3, en |3*3-1*4|=5, zh |0-2*4|=8
    assert(out.map(_._4).toSeq == Seq(3L, 5L, 8L))
  }

  test("round-8 ops are partition-invariant (quota sample, leakage split, drift)") {
    // the order-independence premise behind every oracle-exact claim:
    // identical output sets under one-partition, hashed, and
    // reverse-range layouts
    val docs = (1L to 120L).map(i => (i, s"lang${i % 4}", (i * 37) % 97))
      .toDF("id", "lang", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("id_a", "id_b")
    def layouts(df: org.apache.spark.sql.DataFrame) = Seq(
      df.coalesce(1), df.repartition(7),
      df.orderBy(col("id").desc).repartition(3))
    def sets[T](f: org.apache.spark.sql.DataFrame => Array[T]) = {
      val rs = layouts(docs).map(f(_).toSet)
      assert(rs.distinct.size == 1, s"layout-dependent output: $rs")
    }
    sets(d => CorpusOps.quotaSample(d, "lang", "id", 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    sets(d => CorpusOps.leakageSafeSplit(d, "id", pairs,
        Seq("train" -> 900000L, "test" -> 100000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))))
    sets(d => CorpusOps.categoricalDrift(
        d.filter(col("id") <= 60), d.filter(col("id") > 60), "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5))))
  }

  test("quotaSample: waterfill quotas, remainder split, all-capped take-all") {
    // strata sizes 2 / 3 / 10 / 11, K = 14: capped 2 and 3 (2*4<=14,
    // 3*3<=12), then rem=9 over 2 strata -> lvl 4, r 1 -> quotas 5 and 4
    // for the two big strata in (size, name) order
    val df = (
      (1 to 2).map(i => (s"a$i", "s2")) ++ (1 to 3).map(i => (s"b$i", "s3")) ++
      (1 to 10).map(i => (s"c$i", "s10")) ++ (1 to 11).map(i => (s"d$i", "s11"))
    ).zipWithIndex.map { case ((_, st), i) => (i.toLong, st) }.toDF("id", "strat")
    val out = CorpusOps.quotaSample(df, "strat", "id", totalK = 14L).collect()
    val byStrat = out.groupBy(_.getString(0))
    assert(out.length == 14)
    val quotas = byStrat.map { case (s, rows) => s -> rows.head.getLong(1) }
    assert(quotas == Map("s2" -> 2L, "s3" -> 3L, "s10" -> 5L, "s11" -> 4L),
      s"quotas=$quotas")
    assert(byStrat.forall { case (_, rows) =>
      rows.length == rows.head.getLong(1) })
    // sampled rows are exactly the smallest-md5 prefix: ranks are 1..quota
    assert(byStrat.forall { case (_, rows) =>
      rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.head.getLong(1)) })
    // K >= corpus: every stratum taken whole
    val all = CorpusOps.quotaSample(df, "strat", "id", totalK = 100L).collect()
    assert(all.length == 26)
  }

  test("leakageSafeSplit: near-dup clusters never straddle splits; singletons split solo") {
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "text")
    // two clusters: {1,2,3} (chain) and {10,11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = CorpusOps.leakageSafeSplit(docs, "id", pairs,
        Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 50)
    // whole-cluster assignment: one rep, one split across each cluster
    assert(Set(out(1L), out(2L), out(3L)).size == 1 && out(1L)._1 == 1L)
    assert(out(10L) == out(11L) && out(10L)._1 == 10L)
    // singletons are their own cluster
    assert(out(7L)._1 == 7L)
    // deterministic: re-run identical
    val again = CorpusOps.leakageSafeSplit(docs, "id", pairs,
        Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
    // all three splits reachable at this size and ppm sum enforced
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    intercept[IllegalArgumentException] {
      CorpusOps.leakageSafeSplit(docs, "id", pairs, Seq("train" -> 1L))
    }
  }
}
