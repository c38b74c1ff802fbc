package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-9 ops-tier review fixes: degenerate inputs
  * (token-less docs, NaN vectors, duplicate rows, string ids, replayed
  * batches) that previously produced silent wrong answers or bare crashes.
  * Each test fails on the pre-fix code. */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rootMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("minHashLSH excludes token-less docs instead of pairing them all at jaccard 1.0") {
    // docs 1-3 have NO [a-z0-9]+ tokens; pre-fix they all shingled to [""]
    // -> identical signatures -> 3 false jaccard-1.0 pairs
    val df = Seq(
      (1L, "!!! ??? ..."), (2L, "你好世界"), (3L, ""),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashLSH(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L)),
      s"token-less docs must not pair (got $pairs)")
  }

  test("simHashPairs excludes token-less docs instead of pairing them at hamming 0") {
    val df = Seq(
      (1L, "!!! ??? ..."), (2L, "你好世界"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L)),
      s"token-less docs must not pair (got $pairs)")
  }

  test("simHash chunk blocking sizes from maxHamming (pigeonhole-complete at any h)") {
    // h = 0: one whole-signature chunk still finds exact-dup pairs
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val h0 = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h0 == Set((1L, 2L)))
    // out-of-domain h fails loud
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 64)
    }
    assert(e.getMessage.contains("[0, 63]"))
  }

  test("incremental near-dup works with STRING ids (tie-break no longer negates the id)") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(("doc_b", body), ("doc_a", body)).toDF("doc_id", "text")
    val increment = Seq(("new_1", body + " mu")).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupsPortable(
      increment, corpus, "doc_id", "text", threshold = 0.5).collect()
    assert(out.length == 1)
    // pre-fix: -col(match_id) on a string cast to null and match_id nulled
    // for every row; now: max jaccard, tie -> smallest store id
    assert(out(0).getAs[String]("match_id") == "doc_a",
      s"expected tie-break to doc_a, got ${out(0)}")
  }

  test("a replayed ingest batch does not self-match (id == match_id excluded)") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, body), (2L, "totally different other content words entirely"))
      .toDF("doc_id", "text")
    val store = Dedup.minHashWithSigPortable(docs, "doc_id", "text", 3, 128)
    // replay the SAME docs as the increment: doc 1's only candidate above
    // threshold is itself, which must be excluded -> no match rows
    val out = Dedup.incrementalNearDupsFromSigs(docs, store, "doc_id", "text",
      threshold = 0.5).collect()
    assert(out.isEmpty, s"self-matches must be excluded, got ${out.mkString(",")}")
  }

  test("bloomContains: duplicate candidate rows stay positive (no false negative)") {
    val members = Seq("alpha", "beta", "gamma").toDF("item")
    val bits = Sketches.bloomBits(members, "item", d = 4, mBits = 1024)
    // the same candidate row TWICE: pre-fix count(__bit) = 2d != d read as negative
    val candidates = Seq("alpha", "alpha", "delta").toDF("item")
    val got = Sketches.bloomContains(candidates, "item", bits, d = 4, mBits = 1024)
      .as[(String, Boolean)].collect().toMap
    assert(got("alpha"), "true member must stay bloom_positive under duplication")
    assert(!got("delta"), "non-member must stay negative")
  }

  test("ivfTopK with a small explicit nlist and DEFAULT nprobe does not throw") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toDouble / 100))).toDF("id", "vec")
    val queries = Seq((0L, Array.tabulate(8)(_.toDouble / 10))).toDF("qid", "qvec")
    // pre-fix: auto nprobe = max(4, 2/8) = 4 > nlist = 2 -> spurious require
    val got = Similarity.ivfTopK(corpus, "id", "vec", queries, "qid", "qvec",
      k = 3, nlist = 2)
    assert(got.count() == 3)
  }

  test("pqTopK rejects a query whose length differs from the training dim") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toDouble / 100))).toDF("id", "vec")
    val shortQ = Seq((0L, Array.tabulate(4)(_.toDouble))).toDF("qid", "qvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(corpus, "id", "vec", shortQ, "qid", "qvec", k = 3, m = 4)
    }
    assert(e.getMessage.contains("training dim"), e.getMessage)
  }

  test("sampleFrameIndices rejects n = 0 instead of emitting [0, Long.MinValue]") {
    // sequence(0, -1) is Spark's DESCENDING [0, -1], and i*count/0 is NaN/
    // -Infinity — the pre-fix silent-garbage path
    val e = intercept[IllegalArgumentException] {
      Multimodal.sampleFrameIndices(lit(10), 0)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("zorderExport fails loud on empty input instead of dying in the read-back") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Layout.zorderExport(empty, "id", "x", "y",
        java.nio.file.Files.createTempDirectory("zorder_empty").toString)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("pageRank rejects scales outside its exactness contract") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val big = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, "src", "dst", scale = 1000000000000000L)
    }
    assert(big.getMessage.contains("exact"))
    val small = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, "src", "dst", scale = 1L).collect()
    }
    assert(small.getMessage.contains("node count"))
  }

  test("decodeAudio returns None for a header whose frame count the payload cannot hold") {
    // a 44-byte WAV header claiming 0xFFFFFFF0 data bytes with no payload —
    // the streamed-capture header lie; pre-fix this released n_frames ~4e9
    def le32(v: Long) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val header =
      "RIFF".getBytes("US-ASCII") ++ le32(0xFFFFFFF0L) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(0xFFFFFFF0L)
    val df = Seq((1L, header)).toDF("doc_id", "media")
    val out = Multimodal.decodeAudio(df, "media")
      .select(col("decoded_audio")).collect()
    assert(out(0).isNullAt(0),
      s"header-lie frame counts must decode to None, got ${out(0)}")
  }

  test("NaN vector coordinates fail loud in cell assignment, not taken(-1) or cell 0") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toDouble / 100))).toDF("id", "vec")
    val nanQ = Seq((0L, Array.fill(8)(Double.NaN))).toDF("qid", "qvec")
    val t = intercept[Throwable] {
      Similarity.ivfTopK(corpus, "id", "vec", nanQ, "qid", "qvec", k = 3).count()
    }
    assert(rootMessages(t).contains("NaN"), rootMessages(t))
  }
}
