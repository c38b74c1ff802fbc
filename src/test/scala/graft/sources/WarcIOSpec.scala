package graft.sources

import graft.spark.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WarcIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rec(id: Long, text: String) = WarcIO.WarcRecord(
    "", "resource", s"doc://$id", "2026-01-01T00:00:00Z",
    s"urn:graft:$id", "text/plain", -1L, text.getBytes("UTF-8"))

  test("write -> parse roundtrip: every field and byte; empty payload; UTF-8") {
    val recs = Seq(rec(1, "hello warc"), rec(2, ""),
      rec(3, "café über 世界")) // multi-byte UTF-8
    val parsed = WarcIO.parseWarc("t.warc", WarcIO.warcBytes(recs)).toSeq
    assert(parsed.length == 3)
    parsed.zip(recs).foreach { case (p, w) =>
      assert(p.warc_type == w.warc_type && p.target_uri == w.target_uri &&
        p.warc_date == w.warc_date && p.record_id == w.record_id &&
        p.content_type == w.content_type)
      assert(p.content_length == w.payload.length.toLong)
      assert(java.util.Arrays.equals(p.payload, w.payload))
    }
    // payload bytes, not chars: the café record's length counts UTF-8
    assert(parsed(2).content_length >
      "café über 世界".length)
  }

  test("multi-member gzip: per-record members concatenate and all parse") {
    val recs = (1L to 5L).map(i => rec(i, s"payload $i" * i.toInt))
    val gz = WarcIO.gzipPerRecord(recs)
    val parsed = WarcIO.parseWarc("t.warc.gz",
      WarcIO.gunzipAll("t.warc.gz", gz)).toSeq
    assert(parsed.map(_.record_id) == recs.map(_.record_id))
    assert(parsed.zip(recs).forall { case (p, w) =>
      java.util.Arrays.equals(p.payload, w.payload) })
    // a corrupt gzip stream fails loud with the file name
    val e = intercept[IllegalArgumentException](
      WarcIO.gunzipAll("bad.gz", Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("bad.gz"))
  }

  test("distributed read: one row per record across BOTH archives; payload intact") {
    import org.apache.spark.sql.functions._
    val recs = (0L until 20L).map(i => rec(i, s"document body $i"))
    val dir = java.nio.file.Files.createTempDirectory("warcio_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/a.warc"), WarcIO.warcBytes(recs))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/b.warc.gz"), WarcIO.gzipPerRecord(recs))
    val df = WarcIO.readWarc(spark, s"$dir/*.warc*")
    assert(df.count() == 40L)
    val texts = df.select(col("record_id"),
        col("payload").cast("string").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(texts.length == 40 &&
      texts.forall { case (id, t) =>
        t == s"document body ${id.stripPrefix("urn:graft:")}" })
  }

  test("httpParts: status/content-type/body split; contracts fail loud") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ok = Seq(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nX: y\r\n\r\n<p>b</p>",
      "HTTP/1.0 404 Not Found\r\nSERVER: z\r\n\r\nmissing" // no content-type
    ).toDF("p")
      .select(WarcIO.httpParts(col("p").cast("binary")).as("h"))
      .select(col("h.status"), col("h.content_type"), col("h.body"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(ok(0) == ((200, "text/html", "<p>b</p>")))
    assert(ok(1) == ((404, "", "missing"))) // absent header -> empty
    // a body containing CRLFCRLF splits at the FIRST separator only
    val multi = Seq("HTTP/1.1 200 OK\r\nA: b\r\n\r\nline1\r\n\r\nline2")
      .toDF("p").select(WarcIO.httpParts(col("p")).as("h"))
      .select(col("h.body")).head().getString(0)
    assert(multi == "line1\r\n\r\nline2")
    // contracts: no separator, no status line, NULL payload
    val e1 = intercept[Exception](Seq("HTTP/1.1 200 OK\r\nA: b\r\nbody")
      .toDF("p").select(WarcIO.httpParts(col("p"))).collect())
    assert(SparkTestSession.chainMsg(e1).contains("separator"))
    val e2 = intercept[Exception](Seq("WARC/1.0\r\n\r\nnot http")
      .toDF("p").select(WarcIO.httpParts(col("p"))).collect())
    assert(SparkTestSession.chainMsg(e2).contains("status"))
    val e3 = intercept[Exception](
      Seq(null.asInstanceOf[String]).toDF("p")
        .select(WarcIO.httpParts(col("p"))).collect())
    assert(SparkTestSession.chainMsg(e3).contains("NULL payload"))
  }

  test("malformed archives fail loud: bad version line, missing length, truncation, folding") {
    def bytes(s: String) = s.getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n\r\n\r\n")).toSeq)
    assert(e1.getMessage.contains("version line"))
    val e2 = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nWARC-Type: resource\r\n\r\npayload\r\n\r\n")).toSeq)
    assert(e2.getMessage.contains("no Content-Length"))
    val e3 = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nContent-Length: 999\r\n\r\nshort")).toSeq)
    assert(e3.getMessage.contains("truncated"))
    val e4 = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nContent-Length: abc\r\n\r\n\r\n\r\n")).toSeq)
    assert(e4.getMessage.contains("unparseable Content-Length"))
    // negative lengths parse as longs; they must get the SHAPED error,
    // not copyOfRange's raw fromIndex > toIndex (18th adversarial pass)
    val eNeg = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nContent-Length: -5\r\n\r\n\r\n\r\n")).toSeq)
    assert(eNeg.getMessage.contains("negative Content-Length"))
    val e5 = intercept[IllegalArgumentException](WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nbroken header no colon\r\n" +
        "Content-Length: 0\r\n\r\n\r\n\r\n")).toSeq)
    assert(e5.getMessage.contains("no colon"))
    // headers are case-insensitive per the spec
    val ok = WarcIO.parseWarc("x",
      bytes("WARC/1.0\r\nCONTENT-LENGTH: 2\r\nwarc-type: resource\r\n" +
        "\r\nhi\r\n\r\n")).toSeq
    assert(ok.head.content_length == 2L && ok.head.warc_type == "resource")
  }

  test("writeWarcShards: distributed export round-trips, archives are size-bounded, contracts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_warc_shards_").toString
    // 200 records, payloads 100..1096 bytes — with a 4 KiB bound each
    // shard MUST roll across several archives
    val recs = (1 to 200).map { i =>
      (i.toLong, "resource", s"doc://$i", "2026-01-01T00:00:00Z",
        s"urn:graft:$i", "text/plain",
        ("x" * (100 + (i * 37) % 997)).getBytes("UTF-8"))
    }.toDF("id", "warc_type", "target_uri", "warc_date", "record_id",
      "content_type", "payload")
    val bound = 4096L
    val manifest = WarcIO.writeWarcShards(recs, out, nShards = 3,
      maxPayloadBytesPerArchive = bound).localCheckpoint(true)
    val m = manifest.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(m.map(_._4).sum == 200L, s"manifest records ${m.map(_._4).sum}")
    assert(m.groupBy(_._1).keySet == Set(0, 1, 2))
    assert(m.length > 3, s"only ${m.length} archives — rolling never fired")
    // size bound: every archive holds < bound + one max record of payload
    m.foreach { case (s, q, f, n, pb) =>
      assert(pb < bound + 1097,
        s"shard $s seq $q: payload $pb exceeds bound+record")
      assert(new java.io.File(new java.net.URI(
        if (f.startsWith("file:")) f else s"file:$f").getPath).exists ||
        new java.io.File(f).exists, s"manifest names a missing file $f")
    }
    // seq values are contiguous from 0 per shard (the prefix-sum rule)
    m.groupBy(_._1).foreach { case (s, rows) =>
      val seqs = rows.map(_._2).sorted.toSeq
      assert(seqs == (0L until seqs.length).toSeq,
        s"shard $s seqs $seqs not contiguous")
    }
    // read-back identity: every field and every payload byte
    val back = WarcIO.readWarc(spark, s"$out/shard=*/*.warc.gz")
      .select(col("record_id"), col("target_uri"), col("warc_type"),
        col("content_type"), col("content_length"),
        md5(col("payload")).as("pm"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getString(5))).toSet
    val want = (1 to 200).map { i =>
      val p = "x" * (100 + (i * 37) % 997)
      (s"urn:graft:$i", s"doc://$i", "resource", "text/plain",
        p.length.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }.toSet
    assert(back == want, "read-back records differ from the written set")
    // determinism: a second materialization rewrites the same manifest
    val m2 = WarcIO.writeWarcShards(recs, out, 3, bound).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).sortBy(x => (x._1, x._2)).toSeq
    assert(m2 == m.sortBy(x => (x._1, x._2)).toSeq,
      "re-export produced a different manifest")
    // contracts: NULL record_id / NULL payload / missing column fail loud
    val eId = intercept[Exception](WarcIO.writeWarcShards(
      Seq((null.asInstanceOf[String], "r", "u", "d", "c",
        "p".getBytes("UTF-8")))
        .toDF("record_id", "warc_type", "target_uri", "warc_date",
          "content_type", "payload"),
      out + "_x", 2, 4096L).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eId)
      .contains("NULL record_id"))
    val ePay = intercept[Exception](WarcIO.writeWarcShards(
      Seq(("id1", "r", "u", "d", "c", null.asInstanceOf[Array[Byte]]))
        .toDF("record_id", "warc_type", "target_uri", "warc_date",
          "content_type", "payload"),
      out + "_y", 2, 4096L).collect())
    assert(graft.spark.SparkTestSession.chainMsg(ePay)
      .contains("NULL payload"))
    val eCol = intercept[IllegalArgumentException](WarcIO.writeWarcShards(
      Seq(("id1", "r")).toDF("record_id", "warc_type"), out + "_z", 2))
    assert(eCol.getMessage.contains("missing column"), eCol.getMessage)
    // duplicate record_id fails loud (r19): duplicates tie on both
    // prefix-sum order keys, which would make the archive roll — and the
    // manifest — nondeterministic across retries
    val eDup = intercept[Exception](WarcIO.writeWarcShards(
      Seq(("urn:dup", "r", "u", "d", "c", "p".getBytes("UTF-8")),
        ("urn:dup", "r", "u2", "d", "c", "q".getBytes("UTF-8")),
        ("urn:ok", "r", "u3", "d", "c", "r".getBytes("UTF-8")))
        .toDF("record_id", "warc_type", "target_uri", "warc_date",
          "content_type", "payload"),
      out + "_w", 2, 4096L).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eDup)
      .contains("duplicate record_id"))
  }
}
