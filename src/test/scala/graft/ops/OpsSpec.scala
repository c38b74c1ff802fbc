package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token count and quality features") {
    val df = Seq((1L, "The quick brown fox, it jumped over 2 lazy dogs!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.withQualityFeatures(df, "text").collect().head
    assert(out.getAs[Long]("n_tokens") == 10)
    assert(out.getAs[Long]("n_chars") == 48)
    assert(out.getAs[Double]("digit_ratio") == 1.0 / 48)
    // distinct stopwords present: "the", "it" (2 of 10 tokens)
    assert(out.getAs[Double]("stopword_ratio") == 2.0 / 10)
  }

  test("bpe token count: contractions, unicode letters, digits, symbols") {
    val df = Seq(
      (1L, "I'll say it's 42 tokens, really!"),
      (2L, "漢字テキスト"),      // one CJK letter-run = one pre-token
      (3L, ""),
      (4L, "   "),               // whitespace only: zero tokens
      (5L, "a+b=c")              // letter / symbol / letter / symbol / letter
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withTokenStats(df, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    // "I"," 'll"→' + ll? GPT-2 style: I / 'll / say / it / 's / 42 / tokens / , / really / !
    assert(got(1L) == 10L, s"got ${got(1L)}")
    assert(got(2L) == 1L)
    assert(got(3L) == 0L)
    assert(got(4L) == 0L)
    assert(got(5L) == 5L)
    // bytes/token: multibyte text counts UTF-8 bytes, not chars
    val zh = TextAnalysis.withTokenStats(df.filter(col("doc_id") === 2L), "text")
      .collect().head
    assert(zh.getAs[Long]("n_bytes") == 18L) // 6 CJK chars x 3 bytes
    assert(zh.getAs[Double]("bytes_per_token") == 18.0)
  }

  test("urlDomainStats: per-domain url and distinct-doc counts") {
    val df = Seq(
      (1L, "see https://a.com/x and https://a.com/y plus http://b.org/z"),
      (2L, "again https://a.com/other"),
      (3L, "no urls here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.urlDomainStats(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a.com" -> ((3L, 2L)), "b.org" -> ((1L, 1L))))
  }

  test("langId identifies real multilingual text") {
    // (the synthetic documents table's `lang` column does not reflect the
    // actual text language — all docs are English-ish word soup — so the
    // heuristic is validated on genuine sentences)
    val df = Seq(
      ("en", "the cat sat on the mat and it was happy with all of this"),
      ("de", "der hund ist mit der katze in dem haus und sie sind nicht da"),
      ("fr", "le chat est dans la maison avec les enfants et il est content"),
      ("es", "el perro está en la casa con los niños y no quiere salir de ella"),
      ("zh", "今天天气很好我们一起去公园散步吧然后吃饭")
    ).toDF("expected", "text")
    val out = df.withColumn("pred", TextAnalysis.langId(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(2))
    out.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("canonicalizeUrl: case, ports, www, fragments, tracking params, slashes") {
    import spark.implicits._
    val cases = Seq(
      // scheme/host lowered, :443 + www + fragment + trailing slash +
      // first-position tracking param all stripped, survivor param kept
      ("HTTPS://WWW.Site.Example.com:443/p/1/?utm_source=x&ref=r2#top",
        "https://site.example.com/p/1?ref=r2"),
      // :80 only strips for http; path case PRESERVED
      ("http://A.example.org:80/Path/X", "http://a.example.org/Path/X"),
      // :443 on http is a real port — must survive
      ("http://a.example.org:443/x", "http://a.example.org:443/x"),
      // all-tracking query vanishes entirely (no dangling '?')
      ("https://a.com/x?utm_a=1&fbclid=2", "https://a.com/x"),
      // bare host + slash collapses to bare host
      ("https://a.com/", "https://a.com"),
      // no scheme: pass through trimmed, no guessing
      ("  not-a-url/path  ", "not-a-url/path"),
      // userinfo stripped — including a second '@' (RFC: host starts at
      // the LAST @ of the authority)
      ("https://User:Pw@a.com/x", "https://a.com/x"),
      ("https://u@v@a.com/x", "https://a.com/x"),
      // percent-encoding: hex case normalized upward (%2f == %2F, both
      // digits), reserved escapes stay ENCODED
      ("https://a.com/x%2fy%Af%fa", "https://a.com/x%2Fy%AF%FA"),
      // unreserved punctuation escapes decode (%7E == ~, %2E == ., %2D,
      // %5F), in either input case
      ("https://a.com/%7euser/f%2Ename%2dv%5f1", "https://a.com/~user/f.name-v_1"),
      // a raw '%' NOT followed by two hex chars is not a parseable
      // escape and must pass through untouched ('%ax': x not hex; '%a'
      // at end of string; '%zz')
      ("https://a.com/x%ax", "https://a.com/x%ax"),
      ("https://a.com/x%a", "https://a.com/x%a"),
      ("https://a.com/x?q=a%4a%zz", "https://a.com/x?q=a%4A%zz"),
      // a raw '%' that DOES precede two hex chars is grammatically an
      // escape (RFC 3986: literal percent must be sent as %25) and
      // normalizes as one: %fa inside '50%fall' uppercases
      ("https://a.com/50%fall", "https://a.com/50%FAll"),
      // the passthrough branch must NOT percent-normalize (no scheme =>
      // no canonical form to guess)
      ("raw %2f text", "raw %2f text"))
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].collect()
    got.zip(cases.map(_._2)).zip(cases.map(_._1)).foreach {
      case ((g, want), in) => assert(g == want, s"$in -> $g, wanted $want")
    }
  }

  test("normalizeText: NFC composition, lowercase, whitespace collapse") {
    import spark.implicits._
    val decomposed = "Cafe\u0301  du\tMonde"   // e + combining acute, run of ws
    val df = Seq((1L, decomposed), (2L, "already clean"), (3L, "  Padded  ")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(df, "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) == (("caf\u00e9 du monde", true)))  // composed e-acute
    assert(out(2L) == (("already clean", false)))
    assert(out(3L) == (("padded", true)))
  }

  test("chunkDocuments: overlapping windows, clipped tail, empty => no rows") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "only two"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: nChunks = 1 + ceil((10-4)/3) = 3 -> [0,4),[3,7),[6,10);
    // no start-9 window (it would be fully contained in [6,10))
    assert(out((1L, 0L)) == ((0L, 4L, "t1 t2 t3 t4")))
    assert(out((1L, 1L)) == ((3L, 4L, "t4 t5 t6 t7")))
    assert(out((1L, 2L)) == ((6L, 4L, "t7 t8 t9 t10")))
    assert(out((2L, 0L)) == ((0L, 2L, "only two")))
    assert(!out.keySet.exists(_._1 == 3L))
    assert(out.size == 4)
  }

  test("tfIdfTopTerms: integer log2-floor idf, deterministic ranking") {
    import spark.implicits._
    // 4 docs; "rare" appears in 1 doc => idf_q = floor(log2(4/1)) = 2
    // "common" in all 4 => idf_q = 0; "pair" in 2 => idf_q = 1
    val df = Seq(
      (1L, "common rare rare pair"),
      (2L, "common pair"),
      (3L, "common"),
      (4L, "common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(5)),
        (r.getString(1), r.getLong(4)))).toMap
    assert(out((1L, 1L)) == (("rare", 4L)))   // tf=2 * idf_q=2
    assert(out((1L, 2L)) == (("pair", 1L)))   // tf=1 * idf_q=1
    assert(out((2L, 1L)) == (("pair", 1L)))
    assert(out((2L, 2L)) == (("common", 0L))) // tie on score 0 -> term asc
    assert(out((3L, 1L)) == (("common", 0L)))
  }

  test("collocations: exact integer PMI ratio, minCount floor, tie order") {
    import spark.implicits._
    val df = Seq(
      (1L, "new york new york"),
      (2L, "new york city"),
      (3L, "the city"),
      (4L, "solo"),                      // 1 token: unigram only, no bigram
      (5L, null.asInstanceOf[String]),   // null text dropped
      (6L, "")                           // 0 tokens
    ).toDF("doc_id", "text")
    // unigrams: new=3 york=3 city=2 the=1 solo=1 => N=10
    // bigrams: (new,york)=3 (york,new)=1 (york,city)=1 (the,city)=1
    val out = TextAnalysis.collocations(df, "text", k = 10, minCount = 1)
      .collect().map(r => (r.getLong(6),
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    // raw PMI explodes on the hapax pair: ("the","city") ranks #1 —
    // floor(1e6*10*1/(1*2)) = 5000000 beats the real collocation
    assert(out(1L) == (("the", "city", 1L, 1L, 2L, 5000000L)))
    assert(out(2L) == (("new", "york", 3L, 3L, 3L, 3333333L)))
    assert(out(3L) == (("york", "city", 1L, 3L, 2L, 1666666L)))
    assert(out(4L) == (("york", "new", 1L, 3L, 3L, 1111111L)))
    assert(out.size == 4)
    // the minCount floor removes every hapax pair
    val floored = TextAnalysis.collocations(df, "text", k = 10, minCount = 2)
      .collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("new", "york")))
    // k truncates AFTER the global ordering
    val top1 = TextAnalysis.collocations(df, "text", k = 1, minCount = 1)
      .collect()
    assert(top1.map(r => (r.getString(0), r.getString(1), r.getLong(6))).toSeq
      == Seq(("the", "city", 1L)))
    // score ties order by (w1, w2) ascending: "b a b c" has three bigrams
    // all scoring 1e6*4/2 = 2000000
    val ties = TextAnalysis.collocations(
      Seq((1L, "b a b c")).toDF("doc_id", "text"), "text", k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5),
        r.getLong(6))).toSeq
    assert(ties == Seq(("a", "b", 2000000L, 1L), ("b", "a", 2000000L, 2L),
      ("b", "c", 2000000L, 3L)))
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(df, "text", k = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(df, "text", k = 1, minCount = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.collocations(df, "text", k = 1, scale = 0L))
  }

  test("cooccurrence: windowed pairs, 1/d weights, canonical order, guards") {
    import spark.implicits._
    // "a b a c", window 2: (a,b)x2 w=1e6 each; (a,a) d=2 w=5e5;
    // (b,c) d=2 w=5e5; (a,c) d=1 w=1e6
    val df = Seq((1L, "a b a c"), (2L, "x y"), (3L, "solo"),
      (4L, null.asInstanceOf[String]), (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(df, "text", window = 2, k = 10,
        minCount = 1)
      .collect().map(r => (r.getLong(4),
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a", "b", 2L, 2000000L)))
    assert(out(2L) == (("a", "c", 1L, 1000000L)))
    // the 2-token doc exercises the sequence guard (inner range is [1, 1])
    assert(out(3L) == (("x", "y", 1L, 1000000L))) // wsum tie -> (w1, w2) asc
    assert(out(4L) == (("a", "a", 1L, 500000L)))  // self-pair at distance 2
    assert(out(5L) == (("b", "c", 1L, 500000L)))
    assert(out.size == 5)
    // window = 1 is adjacent-only; minCount floors
    val adj = TextAnalysis.cooccurrence(df, "text", window = 1, k = 10,
      minCount = 2).collect()
    assert(adj.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", "b", 2L)))
    intercept[IllegalArgumentException](
      TextAnalysis.cooccurrence(df, "text", window = 0, k = 1))
  }

  test("fused fingerprint UDFs are bit-identical to the expression forms") {
    import spark.implicits._
    // multi-byte code points exercise the code-point gram boundaries
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short",
      "", "abcd",
      "caf\u00e9 na\u00efve \u4e2d\u6587 text with \u00fcml\u00e4uts and more words here",
      "aaaaa aaaaa aaaaa aaaaa")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val cmp = df.select(
      TextAnalysis.fingerprint(col("text")).as("u"),
      TextAnalysis.fingerprintExpr(col("text")).as("e"),
      TextAnalysis.fingerprintPortable(col("text")).as("up"),
      TextAnalysis.fingerprintPortableExpr(col("text")).as("ep")).collect()
    cmp.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"native mismatch: $r")
      assert(r.getString(2) == r.getString(3), s"portable mismatch: $r")
    }
  }

  test("fingerprint UDF/expression parity holds on random unicode incl. astral") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // alphabet mixes ascii, multi-byte BMP, and astral (surrogate-pair)
    // code points — the gram boundaries must count CODE POINTS like
    // Spark's substring, not UTF-16 units
    val alphabet = Array("a", "b", " ", "\u00e9", "\u4e2d", "\ud83d\ude00", "\ud83c\udf55")
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(
        TextAnalysis.fingerprint(col("text")).as("u"),
        TextAnalysis.fingerprintExpr(col("text")).as("e"),
        TextAnalysis.fingerprintPortable(col("text")).as("up"),
        TextAnalysis.fingerprintPortableExpr(col("text")).as("ep"))
    assert(df.filter(col("u") =!= col("e")).count() == 0)
    assert(df.filter(col("up") =!= col("ep")).count() == 0)
  }

  test("fingerprint: equal texts collide, different texts don't") {
    val df = Seq((1L, "identical document text body"), (2L, "identical document text body"),
      (3L, "zzz qqq www unrelated stuff kkk")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
}

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("merge training follows the reference algorithm with deterministic ties") {
    // the classic Sennrich fixture: est-family pairs dominate at 9, the
    // low-family at 7; ties break on the lexicographically smallest pair
    val counts = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainFromCounts(counts, 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    // merge count larger than the pair supply terminates cleanly
    assert(Bpe.trainFromCounts(Seq("ab" -> 1L), 100).size <= 2)
  }

  test("applied merges roundtrip: concatenated subwords reconstruct each word") {
    val docs = Seq((1L, "the lowest new word"), (2L, "lower and lower still"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 20, vocabCap = 100)
    val rows = docs.select(explode(Bpe.applyMerges(col("text"), merges)).as("bw"))
      .select(col("bw.word"), col("bw.tokens")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getString(0); val toks = r.getSeq[String](1)
      assert(toks.mkString("") == w + Bpe.EndOfWord, s"$w -> $toks")
    }
    // frequent words compress below character granularity
    val lower = rows.find(_.getString(0) == "lower").get.getSeq[String](1)
    assert(lower.length < "lower".length + 1)
  }

  test("roundtrip property holds on random corpora at any merge count") {
    val rnd = new scala.util.Random(67)
    for (trial <- 0 until 5) {
      val vocab = Array.fill(30)(
        (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
      val counts = vocab.toSeq.distinct.map(w => w -> (1L + rnd.nextInt(50)))
      val merges = Bpe.trainFromCounts(counts, nMerges = rnd.nextInt(40))
      // apply driver-side through the same Spark UDF path
      val text = Array.fill(50)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val rows = Seq((1L, text)).toDF("id", "text")
        .select(explode(Bpe.applyMerges(col("text"), merges)).as("bw"))
        .select(col("bw.word"), col("bw.tokens")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1).mkString("") == r.getString(0) + Bpe.EndOfWord,
          s"trial $trial: ${r.getString(0)} -> ${r.getSeq[String](1)}")
      }
    }
  }
}

class HtmlStripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("htmlStrip drops boilerplate content, keeps body, decodes entities") {
    val html = "<html><head><title>T &amp; U</title><style>p{}</style></head>" +
      "<body><nav>home | login</nav><h1>Head</h1>\n<p>a &lt;b&gt; c &quot;d&quot; &#39;e&#39; &amp;f</p>" +
      "<script>if (x<1) alert('hi');</script><footer>legal</footer></body></html>"
    val out = Seq((1L, html)).toDF("id", "html")
      .select(TextAnalysis.htmlStrip(col("html")).as("c"),
        TextAnalysis.htmlTitle(col("html")).as("t"))
      .collect()(0)
    // title text survives (title is not a boilerplate block), entities decode
    assert(out.getString(0) == "T & U Head a <b> c \"d\" 'e' &f")
    assert(out.getString(1) == "T &amp; U") // title is raw by contract
    // multiline block content spans (?s)
    val multi = "<body><script>\nvar a=1;\nvar b=2;\n</script>keep</body>"
    val c2 = Seq((1L, multi)).toDF("id", "h")
      .select(TextAnalysis.htmlStrip(col("h"))).collect()(0).getString(0)
    assert(c2 == "keep")
    // real-world uppercase/mixed-case tags must not leak block content
    val upper = "<BODY><SCRIPT>var t=track();</SCRIPT><Footer>legal</Footer>" +
      "<TITLE>Up</TITLE>body text</BODY>"
    val r3 = Seq((1L, upper)).toDF("id", "h")
      .select(TextAnalysis.htmlStrip(col("h")).as("c"),
        TextAnalysis.htmlTitle(col("h")).as("t")).collect()(0)
    assert(r3.getString(0) == "Up body text", r3.getString(0))
    assert(r3.getString(1) == "Up")
  }
}

class LinearTextModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** the model's formula, independently: md5-60-bit bucket -> Knuth-mod
    * thousandth weight */
  private def refWeight(feature: String, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(feature.getBytes("UTF-8"))
    var v = 0L
    for (k <- 0 until 8) v = (v << 8) | (d(k) & 0xffL)
    val bucket = (v >>> 4) % dim
    Math.floorMod(bucket * 2654435761L, 2001L) - 1000L
  }

  test("hashed linear scoring: exact mean of unigram+bigram bucket weights") {
    val text = "spark shuffles the fast table"
    val toks = text.split(" ").toSeq
    val feats = toks ++ toks.sliding(2).map(_.mkString(" "))
    val expMillis = feats.map(refWeight(_, 1024)).sum
    val exp = expMillis.toDouble / (feats.size * 1000)
    val out = Seq((1L, text), (2L, ""), (3L, "one")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.LinearTextModel.score(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_features"), col("q.score"), col("q.keep"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1 == feats.size.toLong)
    assert(out(1L)._2 == exp, s"got ${out(1L)._2}, want $exp")
    assert(out(1L)._3 == (exp > 0))
    assert(out(2L) == ((0L, 0.0, false)), "empty text: zero features, drop")
    // single token: no bigrams (sequence(1,0) would descend — guarded)
    assert(out(3L)._1 == 1L)
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog and then runs far away into the woods " * 3

  test("exact dedup keeps one row per key") {
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("id", "text")
    val out = Dedup.dedupExact(df, Seq("text"), "id")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val groups = Dedup.duplicateGroups(df, "text", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(groups.toSeq == Seq(("aa", 1L, 2L), ("bb", 3L, 1L)))
  }

  test("containmentPortable: catches doc-inside-doc where Jaccard fails") {
    // doc 2 CONTAINS doc 1 verbatim plus ~equal-length extra content:
    // containment(1 in 2) ~ 1.0 while Jaccard ~ 0.5 sits under the 0.6
    // near-dup threshold — the pair the Jaccard path misses by design
    val extra = " meanwhile a completely different second half talks about " +
      "catalyst optimizer rules and tungsten codegen stages in spark " * 2
    val df = Seq(
      (1L, base),
      (2L, base + extra),
      (3L, "unrelated short text about nothing in particular at all today")
    ).toDF("id", "text")
    val cont = Dedup.containmentPortable(df, "id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the contained pair: ${cont.toSeq}")
    assert(cont.head._3 >= 0.95, s"containment should be ~1: ${cont.head._3}")
    // the Jaccard path at its dedup threshold must NOT report this pair
    val jac = Dedup.minHashLSHPortable(df, "id", "text", threshold = 0.6)
      .collect()
    assert(jac.isEmpty, s"Jaccard 0.6 should miss the contained pair: ${jac.toSeq}")
  }

  test("maxBucket: mass-duplicate pile collapses to a star; normal fixture identical") {
    // 200 identical docs put every doc in the same bucket in every band:
    // uncapped verify volume is C(200,2) = 19900 pairs; capped, each
    // oversized bucket emits the min-id star — exactly 199 pairs, all
    // anchored at doc 0, all verified at jaccard 1.0. The downstream dup
    // graph's connected component is identical either way.
    val pile = (0L until 200L).map(i => (i, base)).toDF("id", "text")
    val capped = Dedup.minHashLSHPortable(pile, "id", "text",
        threshold = 0.6, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.length == 199, s"star expected: ${capped.length}")
    assert(capped.forall(p => p._1 == 0L && p._3 == 1.0))
    assert(capped.map(_._2).sorted.toSeq == (1L until 200L).toSeq)
    val uncapped = Dedup.minHashLSHPortable(pile, "id", "text", threshold = 0.6)
    assert(uncapped.count() == 19900L)
    // on a fixture with no oversized bucket the capped plan is identical
    val normal = Seq(
      (1L, base),
      (2L, base + " extra trailing sentence appended here"),
      (3L, "completely unrelated content about spark catalyst optimizer rules"),
      (4L, base.replace("quick", "rapid"))
    ).toDF("id", "text")
    def pairSet(mb: Int) = Dedup.minHashLSHPortable(normal, "id", "text",
        threshold = 0.3, maxBucket = mb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairSet(50) == pairSet(0))
    assert(pairSet(0).map(p => (p._1, p._2)).contains((1L, 2L)))
    // same contract on the embedding path: identical vectors pile into one
    // bucket per band; capped output is the min-id star at cosine 1.0
    val vecs = (0L until 120L).map(i => (i, Array.fill(8)(1.0f)))
      .toDF("id", "vec")
    val embCapped = Dedup.embeddingNearDups(vecs, "id", "vec",
        threshold = 0.9, planes = 4, bands = 3, maxBucket = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(embCapped.length == 119 && embCapped.forall(_._1 == 0L))
    // same contract on the simhash chunk-blocked path: identical texts
    // share all 4 chunk buckets; capped output is the min-id star at
    // hamming 0, and the capped plan is identical on a normal fixture
    val shCapped = Dedup.simHashPairs(pile, "id", "text",
        maxHamming = 3, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(shCapped.length == 199 && shCapped.forall(p => p._1 == 0L && p._3 == 0))
    def shSet(mb: Int) = Dedup.simHashPairs(normal, "id", "text",
        maxHamming = 10, maxBucket = mb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(shSet(50) == shSet(0))
  }

  test("minhash LSH finds planted near-duplicates and not unrelated docs") {
    val df = Seq(
      (1L, base),
      (2L, base + " extra trailing sentence appended here"), // near-dup of 1
      (3L, "completely unrelated content about spark catalyst optimizer rules and physical plans and codegen stages"),
      (4L, base.replace("quick", "rapid")) // still close to 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashLSH(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs=$pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"pairs=$pairs")
  }

  test("minhash similarity approximates jaccard") {
    val df = Seq((1L, base), (2L, base + " tail piece of text")).toDF("id", "text")
    val withS = df.select(
      Dedup.minHashSignature(Dedup.wordShingles(col("text")), 256).as("sig"),
      Dedup.wordShingles(col("text")).as("sh"))
    val rows = withS.collect()
    val est = rows(0).getSeq[Long](0).zip(rows(1).getSeq[Long](0))
      .count { case (a, b) => a == b } / 256.0
    val exact = {
      val a = rows(0).getSeq[String](1).toSet; val b = rows(1).getSeq[String](1).toSet
      a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: identical texts distance 0, near texts close, pairs found") {
    val df = Seq((1L, base), (2L, base), (3L, base + " small tail"),
      (4L, "other completely different words entirely about unrelated things"))
      .toDF("doc_id", "text")
    val sigs = df.select(Dedup.simHash(col("text"))).collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(2)) <= 6)
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(3)) > 10)
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("incremental near-dup flags only new-vs-corpus matches, best match wins") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, body),                      // near-match target
      (2L, body + " lambda"),          // second, worse-or-equal match
      (3L, body),                      // corpus-internal dup of 1 — must NOT appear
      (4L, "completely different words about other topics entirely now")
    ).toDF("doc_id", "text")
    val increment = Seq(
      (10L, body + " mu"),             // near-dup of 1/2/3
      (11L, "unique new document with fresh content nobody has seen")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupsPortable(increment, corpus, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // only the near-dup increment doc is flagged; corpus-internal dups and
    // unique new docs never appear
    assert(out.keySet == Set(10L), s"got $out")
    // best match: docs 1 and 3 are identical texts (equal jaccard) => tie
    // breaks to the smaller corpus id
    assert(out(10L)._1 == 1L, s"got ${out(10L)}")
    assert(out(10L)._2 >= 0.5)
  }

  test("stored-signature incremental path is identical to the raw-docs path") {
    val rnd = new scala.util.Random(13)
    val bodies = (0 to 7).map(_ =>
      Seq.fill(15)(rnd.alphanumeric.take(5).mkString).mkString(" "))
    val corpus = (1L to 30L).map(i => (i, s"${bodies((i % 8).toInt)} tail$i"))
      .toDF("doc_id", "text")
    val increment = (100L to 110L).map(i => (i, s"${bodies((i % 8).toInt)} inc$i"))
      .toDF("doc_id", "text")
    def matches(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val raw = matches(Dedup.incrementalNearDupsPortable(
      increment, corpus, "doc_id", "text", threshold = 0.3))
    // persist the signature frame through parquet (the store roundtrip a
    // production pipeline does) before feeding the sig-based entry point
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toFile
    try {
      Dedup.minHashWithSigPortable(corpus, "doc_id", "text",
          shingleSize = 3, numHashes = 128)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stored = matches(Dedup.incrementalNearDupsFromSigs(
        increment, spark.read.parquet(dir.getAbsolutePath),
        "doc_id", "text", threshold = 0.3))
      assert(raw.nonEmpty)
      assert(stored == raw)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("stored-signature path fails loud on a store with the wrong signature length") {
    val corpus = Seq((1L, base), (2L, base + " tail")).toDF("doc_id", "text")
    val increment = Seq((10L, base)).toDF("doc_id", "text")
    // store built with 64 hashes, queried expecting 16 bands x 8 rows = 128
    val shortStore = Dedup.minHashWithSigPortable(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 64)
    val ex = intercept[Exception] {
      Dedup.incrementalNearDupsFromSigs(increment, shortStore,
        "doc_id", "text", threshold = 0.3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("signature store length")), s"got $ex")
  }

  test("ngram jaccard pairs within blocks") {
    val df = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick brown fox jumps over the lazy cat"),
      (3L, "en", "zzz completely different"),
      (4L, "de", "the quick brown fox jumps over the lazy dog") // other block
    ).toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard: candidate-volume guard trips on a low-entropy corpus, " +
    "not on a normal one") {
    // THE measured scale boundary (r9 ladder): exact AllPairs goes
    // super-linear when many docs share the same few prefix grams — and
    // length-band blocking cannot rescue fixed-length keys. The guard must
    // convert that regime into a loud error BEFORE the candidate join runs.
    // Low-entropy corpus: 200 near-identical fixed-length keys — every doc's
    // prefix collapses onto the same handful of grams, est/doc ~ nDocs.
    val lowEntropy = (0 until 200)
      .map(i => (i.toLong, f"item-00${i % 2}%03d-suffix"))
      .toDF("id", "text").withColumn("blk", lit("b"))
    val ex = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(lowEntropy, "id", "text", "blk", threshold = 0.8,
        maxCandidatesPerDoc = 32.0, guardMinDocs = 1L).count()
    }
    assert(ex.getMessage.contains("maxCandidatesPerDoc"), ex.getMessage)
    assert(ex.getMessage.contains("minhashLshPairs"), ex.getMessage)
    // Normal corpus: distinct random texts — prefix groups stay tiny, the
    // guard (forced on with guardMinDocs = 1) must NOT fire, and the output
    // must equal the unguarded run
    val rnd = new scala.util.Random(31)
    val normal = (0 until 200)
      .map(i => (i.toLong, Seq.fill(20)(rnd.alphanumeric.take(7).mkString).mkString(" ")))
      .toDF("id", "text").withColumn("blk", lit("b"))
    def pairSet(guarded: Boolean) = Dedup.ngramJaccardPairs(normal, "id", "text",
        "blk", threshold = 0.8,
        maxCandidatesPerDoc = if (guarded) 64.0 else Double.PositiveInfinity,
        guardMinDocs = if (guarded) 1L else Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(guarded = true) == pairSet(guarded = false))
    // below guardMinDocs the estimate pass is skipped entirely: the
    // low-entropy corpus must run (and produce its quadratic-but-bounded
    // exact answer) when the caller's corpus is under the cutoff
    assert(Dedup.ngramJaccardPairs(lowEntropy, "id", "text", "blk",
      threshold = 0.8, maxCandidatesPerDoc = 32.0).count() > 0)
  }

  test("ngram guard estimate dominates the true candidate volume (property)") {
    // the wall must never become a sieve: across entropy regimes and
    // thresholds, the guard's sum-of-prefix-group-size^2 estimate must
    // upper-bound the candidate pairs the join actually produces (the
    // short-prefix side of every group is a subset of its long-prefix
    // side, and the direction/size-ratio/positional filters only shrink)
    val rnd = new scala.util.Random(7)
    val shapes: Seq[(String, Seq[(Long, String)])] = Seq(
      "low-entropy" -> (0 until 120).map(i =>
        (i.toLong, Seq.fill(6)("w" + rnd.nextInt(4)).mkString(" "))),
      "shared-head" -> (0 until 120).map(i =>
        (i.toLong, "common head " +
          Seq.fill(8)(rnd.alphanumeric.take(5).mkString).mkString(" "))),
      "high-entropy" -> (0 until 120).map(i =>
        (i.toLong, Seq.fill(12)(rnd.alphanumeric.take(6).mkString).mkString(" ")))
    )
    for ((label, rows) <- shapes; t <- Seq(0.5, 0.8)) {
      val df = rows.toDF("id", "text").withColumn("blk", lit("b"))
      val ordered = Dedup.ngramOrderedStage(
        Dedup.ngramGramsStage(df, "id", "text", "blk", 3))
      val est = Dedup.candidateVolumeEstimate(ordered, t)
      val observed = Dedup.ngramCandidatesStage(ordered, t).count().toDouble
      assert(est >= observed,
        s"$label t=$t: estimate $est < observed candidate pairs $observed")
      assert(est > 0 || observed == 0)
    }
  }

  test("ngram jaccard: length-band blocking is output-identical on a mixed-size corpus") {
    // small shared vocab => shared prefix grams across very different doc
    // sizes, the regime band blocking prunes; near-dups planted at close
    // sizes so real pairs exist
    val vocab = Array("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    def doc(i: Int): String = {
      val len = 6 + (i % 25) * 8 // sizes 6..198 words
      (0 until len).map(k => vocab((i * 7 + k * 5) % vocab.length)).mkString(" ")
    }
    val rows = (0 until 60).map(i => (i.toLong, doc(i))) ++
      Seq((1000L, doc(3) + " alpha"), (1001L, doc(30) + " bravo")) // near-dups
    val df = rows.toDF("id", "text").withColumn("blk", lit("b"))
    def pairs(banded: Boolean) = Dedup.ngramJaccardPairs(df, "id", "text",
        "blk", n = 3, threshold = 0.8, lengthBandBlocking = banded)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val plain = pairs(false)
    assert(pairs(true) == plain)
    assert(plain.exists(p => p._1 == 3L && p._2 == 1000L), s"planted pair lost: $plain")
  }

  test("ngram jaccard: partitioned verify fallback matches broadcast path") {
    // a corpus with near-dup groups (same long body, one varying token),
    // distinct docs, and a second block
    val rnd = new scala.util.Random(7)
    val bodies = (0 to 10).map(g =>
      Seq.fill(12)(rnd.alphanumeric.take(6).mkString).mkString(" "))
    val rows = (1L to 40L).map { i =>
      val g = (i / 4).toInt
      (i, if (i % 10 == 0) "de" else "en", s"${bodies(g)} tail$i")
    }
    val df = rows.toDF("doc_id", "lang", "text")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val bcast = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", threshold = 0.5)
    val part = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", threshold = 0.5,
      gramBroadcastMaxBytes = 0L)
    // the size switch must actually flip the verify join strategy: the
    // ordered stage is checkpointed, so the final plan's joins ARE the
    // candidate+verify joins — broadcast hash join appears only on the
    // broadcast path
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(!part.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val bs = pairSet(bcast)
    assert(bs.nonEmpty)
    assert(bs == pairSet(part))
  }

  test("embedding near dups via hyperplane LSH") {
    val v = (0 until 16).map(_.toDouble / 16).toArray
    val near = v.clone(); near(0) += 0.001
    val far = (0 until 16).map(i => if (i % 2 == 0) 1.0 else -1.0).toArray
    val df = Seq((1L, v), (2L, near), (3L, far)).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDups(df, "id", "vec", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("duplicated span stats: copied docs flagged, unique docs clean") {
    val copied = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, copied),
      (2L, copied), // exact copy: every 5-gram duplicated
      (3L, "one two three four five six seven eight nine ten"),
      (4L, s"prefix words here then $copied"), // partial copy
      (5L, "tiny doc")) // < 5 tokens: no grams, excluded
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(df, "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("dup_gram_frac"),
          r.getAs[Double]("covered_token_frac"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((4L, 1.0, 1.0)))
    assert(out(2L) == ((4L, 1.0, 1.0)))
    assert(out(3L)._2 == 0.0 && out(3L)._3 == 0.0)
    // doc 4: 12 tokens => 8 grams; the copied suffix contributes the 4
    // grams fully inside it; coverage = 8 trailing tokens of 12
    assert(out(4L)._1 == 8L)
    assert(out(4L)._2 == 4.0 / 8)
    assert(out(4L)._3 == 8.0 / 12)
  }

  test("cdcChunks: exact partition, size bounds, shift resynchronization") {
    val rnd = new scala.util.Random(7)
    val body = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val df = Seq((1L, body), (2L, "PREFIX-" * 4 + body), (3L, "tiny"), (4L, ""))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.cdcChunks(df, "doc_id", "text",
        minSize = 32, avgSize = 128, maxSize = 512)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start"), r.getAs[Long]("length"),
        r.getAs[Boolean]("is_last"), r.getAs[String]("chunk_md5"),
        r.getAs[String]("chunk_text")))
    // empty text: zero chunks; short text: one short (last) chunk
    assert(!out.exists(_._1 == 4L))
    val tiny = out.filter(_._1 == 3L)
    assert(tiny.length == 1 && tiny.head._7 == "tiny" && tiny.head._5)
    // exact partition: ordered chunks reassemble to the document
    def reassemble(id: Long) =
      out.filter(_._1 == id).sortBy(_._2).map(_._7).mkString
    assert(reassemble(1L) == body)
    assert(reassemble(2L) == "PREFIX-" * 4 + body)
    // size bounds: every non-last chunk in [32, 512]
    out.filterNot(_._5).foreach { c =>
      assert(c._4 >= 32 && c._4 <= 512, c.toString)
    }
    // THE CDC property: after a 28-char prefix insertion, boundaries
    // resynchronize — the shifted doc shares almost all chunk hashes with
    // the original (fixed windows would share none). Compare md5 multisets.
    val h1 = out.filter(_._1 == 1L).map(_._6)
    val h2 = out.filter(_._1 == 2L).map(_._6)
    val shared = h1.intersect(h2).length
    assert(shared >= h1.length - 2,
      s"expected resynchronization: ${shared} shared of ${h1.length}")
  }

  test("removeDuplicatedSpans: covered tokens drop, survivors fingerprint") {
    val copied = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, copied),
      (2L, copied), // exact copy: fully covered, nothing survives
      (3L, "one two three four five six seven eight nine ten"),
      (4L, s"prefix words here then $copied"), // suffix copied => prefix survives
      (5L, "tiny doc")) // < 5 tokens: no grams, kept verbatim
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[String]("kept_md5"))).toMap
    def md5Of(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // full copies: all 8 tokens covered, empty survivor stream
    assert(out(1L) == ((8L, 0L, md5Of(""))))
    assert(out(2L) == ((8L, 0L, md5Of(""))))
    // unique doc: untouched
    assert(out(3L) == ((10L, 10L,
      md5Of("one two three four five six seven eight nine ten"))))
    // partial copy: the 8 trailing copied tokens drop, the 4-token prefix
    // survives (its grams all straddle into the copied region? no — a
    // 12-token doc's grams at positions 0..3 include copied tokens, but
    // only grams occurring in >=2 DOCS count, and the straddling grams are
    // unique to doc 4)
    assert(out(4L) == ((12L, 4L, md5Of("prefix words here then"))))
    // short doc: no grams possible, kept verbatim
    assert(out(5L) == ((2L, 2L, md5Of("tiny doc"))))
  }

  test("bestOfCluster: quality champion survives, min-id breaks ties, singletons keep") {
    val docs = Seq((1L, 10L), (2L, 90L), (3L, 90L), (4L, 5L), (7L, 1L))
      .toDF("id", "score")
    // cluster {1,2,3}: max score 90 shared by 2 and 3 -> champ 2 (min id);
    // cluster {4}: none via pairs; 7 not in any pair
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.bestOfCluster(docs, "id", "score", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (1L, 0L), 2L -> (1L, 1L), 3L -> (1L, 0L),
      4L -> (4L, 1L), 7L -> (7L, 1L)))
  }

  test("exactSubstrDedup: arbitrary-boundary repeats scrub, first occurrence survives") {
    // a 40-char substring planted into three docs at DIFFERENT character
    // offsets, crossing word boundaries, with unrelated surroundings —
    // the case word-gram and fixed-segment arms cannot express exactly
    val planted = "the quick brown fox jumps over the lazyx" // 40 chars
    assert(planted.length == 40)
    // every occurrence is bounded by DIFFERENT characters on both sides,
    // so the maximal repeated substring is exactly `planted`
    val d1 = s"alpha $planted omega one"         // first occurrence (doc 1)
    val d2 = s"completely different lead-in xx$planted-trailing bits"
    val d3 = s"${planted}_starts this one"
    val d4 = "no repeated content whatsoever in here at all"
    val df = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, "tiny"))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(df, "doc_id", "text", minLen = 30)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    def md5Of(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    // doc 1 (globally first by (doc_id, pos) for every planted window):
    // fully intact
    assert(out(1L) == ((d1.length.toLong, d1.length.toLong, md5Of(d1))),
      out(1L).toString)
    // docs 2 and 3: exactly the planted 40 chars scrubbed, surroundings
    // intact (coverage is the union of the duplicated 30-char windows,
    // which tile the full planted span)
    assert(out(2L) == ((d2.length.toLong, (d2.length - 40).toLong,
      md5Of("completely different lead-in xx-trailing bits"))), out(2L).toString)
    assert(out(3L) == ((d3.length.toLong, (d3.length - 40).toLong,
      md5Of("_starts this one"))), out(3L).toString)
    // unique doc: untouched; short doc: no window, kept verbatim
    assert(out(4L) == ((d4.length.toLong, d4.length.toLong, md5Of(d4))))
    assert(out(5L) == ((4L, 4L, md5Of("tiny"))))
    // WITHIN-doc repetition: the second copy scrubs, the first stays
    val rep = "x" * 0 + "abcdefghijklmnopqrstuvwxyz012345" // 32 chars
    val one = Seq((9L, s"$rep--and then--$rep")).toDF("doc_id", "text")
    val r9 = Dedup.exactSubstrDedup(one, "doc_id", "text", minLen = 32)
      .collect().head
    assert(r9.getLong(2) == r9.getLong(1) - 32, r9.toString)
    assert(r9.getString(3) == md5Of(s"$rep--and then--"), r9.toString)
  }

  test("connectedComponents and bestOfCluster work on STRING ids") {
    // the common ER/doc case — string keys. The r15 review found the
    // decimal-sum convergence signature and the -id champion trick both
    // threw ANSI CAST_INVALID_INPUT on strings; CC now uses exact
    // anti-join change detection for non-integral ids and bestOfCluster
    // a rank window. The 6-node chain needs >1 propagation round, so a
    // falsely-early convergence would mislabel the tail.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "f")).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc.size == 6 && cc.values.forall(_ == "a"), cc.toString)
    val docs = Seq(("a", 1.0), ("b", 9.0), ("c", 5.0), ("z", 2.0))
      .toDF("id", "score")
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val out = Dedup.bestOfCluster(docs, "id", "score", pairs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("a" -> ("a", 0L), "b" -> ("a", 1L),
      "c" -> ("a", 0L), "z" -> ("z", 1L)), out.toString)
  }

  test("incrementalComponents: edge increment folds to exactly the full recompute") {
    // existing store: {5,9} comp 5, {10,11} comp 10
    val oldEdges = Seq((5L, 9L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(oldEdges)
    // increment: new doc 2 becomes the NEW MIN of {5,9}; 20 joins {10,11};
    // {30,31} is a brand-new cluster
    val newEdges = Seq((2L, 5L), (11L, 20L), (30L, 31L)).toDF("id_a", "id_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = asMap(Dedup.incrementalComponents(labels, newEdges))
    val full = asMap(Dedup.connectedComponents(oldEdges.unionByName(newEdges)))
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc(9L) == 2L && inc(20L) == 10L && inc(31L) == 30L)
    // idempotent on an empty-effect increment (edge already inside a cluster)
    val again = asMap(Dedup.incrementalComponents(
      Dedup.incrementalComponents(labels, newEdges), Seq((5L, 9L)).toDF("id_a", "id_b")))
    assert(again == full)
  }

  test("incrementalComponents: random graphs and random splits fold to the full recompute") {
    val rnd = new scala.util.Random(20260814L)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (round <- 1 to 5) {
      val n = 12 + rnd.nextInt(20)
      val edges = (0 until (n * 2)).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val cut = rnd.nextInt(edges.length.max(1))
      val (oldE, newE) = edges.splitAt(cut)
      // empty halves exercise the zero-edge convergence path
      val labels =
        Dedup.connectedComponents(oldE.toDF("id_a", "id_b"))
      val inc = asMap(Dedup.incrementalComponents(labels, newE.toDF("id_a", "id_b")))
      val full = asMap(Dedup.connectedComponents(edges.toDF("id_a", "id_b")))
      assert(inc == full, s"round $round: n=$n cut=$cut inc=$inc full=$full")
    }
  }

  test("connected components: clusters from pair sets, min-id labels") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: pointer jumping converges on a long chain") {
    // a 60-node path has diameter 59; plain min-propagation would need 59
    // rounds — pointer jumping must finish within the default maxIter
    val edges = (1L to 60L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 60)
    assert(out.forall(_._2 == 1L))
  }

  test("banded LSH recovers planted near-duplicates with high recall") {
    val rnd = new scala.util.Random(17)
    val originals = (0L until 150L).map(i => (i, Array.fill(32)(rnd.nextGaussian())))
    // planted copies: tiny perturbation => cosine ~0.999
    val planted = originals.map { case (i, v) =>
      (i + 1000L, v.map(_ + 0.02 * rnd.nextGaussian()))
    }
    val df = (originals ++ planted).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDups(df, "id", "vec", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = originals.count { case (i, _) => pairs.contains((i, i + 1000L)) }
    assert(found >= 143, s"recall ${found / 150.0} too low") // >= 95%
    // no false positives below the cosine threshold by construction (exact
    // verify); distinct random vectors must not pair up
    pairs.foreach { case (a, b) => assert(b - a == 1000L, s"unexpected pair ($a,$b)") }
  }

  test("dedupSegments: first occurrence survives, later repeats drop, docs reassemble") {
    val df = Seq(
      (1L, "a b c d"),        // segs (w=2): "a b", "c d"
      (2L, "c d e f a b"),    // "c d" (dup of doc1), "e f", "a b" (dup)
      (3L, "a b a b"),        // within-doc repeat: second "a b" drops
      (4L, ""),               // empty: zero segments
      (5L, "x")               // single short segment
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(df, "doc_id", "text", segmentWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((3L, 1L, "e f")))
    assert(out(3L) == ((2L, 0L, "")))    // both "a b" already seen in doc 1
    assert(out(4L) == ((0L, 0L, "")))
    assert(out(5L) == ((1L, 1L, "x")))
    // the md5-keyed scale mode produces the identical result
    val hashed = Dedup.dedupSegments(df, "doc_id", "text", 2, hashJoinKeys = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(hashed == out)
  }

  test("removeFrequentSegments: boilerplate drops everywhere, rare segments keep all copies") {
    val df = Seq(
      (1L, "a b c d"),     // "a b" x3 corpus-wide -> boilerplate; "c d" x2 kept
      (2L, "c d e f a b"), // keeps "c d" and "e f", drops "a b"
      (3L, "a b x y"),     // keeps only "x y"
      (4L, ""),            // empty: zero segments
      (5L, "q")            // singleton segment survives
    ).toDF("doc_id", "text")
    val out = Dedup.removeFrequentSegments(df, "doc_id", "text",
        segmentWords = 2, maxFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "a b" occurs 3 times (> maxFreq=2): every copy drops, including doc 1's
    assert(out(1L) == ((2L, 1L, "c d")))
    assert(out(2L) == ((3L, 2L, "c d e f")))
    assert(out(3L) == ((2L, 1L, "x y")))
    assert(out(4L) == ((0L, 0L, "")))
    assert(out(5L) == ((1L, 1L, "q")))
    // md5-keyed scale mode is decision-identical
    val hashed = Dedup.removeFrequentSegments(df, "doc_id", "text",
        2, 2, hashJoinKeys = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(hashed == out)
    // duplicate-saturated-corpus mode (shuffle-hash flag join, no
    // broadcast) is decision-identical too
    val shuffled = Dedup.removeFrequentSegments(df, "doc_id", "text",
        2, 2, broadcastBoiler = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(shuffled == out)
    // maxFreq=1 degrades to "drop every segment that repeats at all"
    val strict = Dedup.removeFrequentSegments(df, "doc_id", "text", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict(1L) == 0L && strict(2L) == 1L && strict(5L) == 1L)
  }

  test("nearDupDecontaminate: near-copies of benchmark docs drop, clean docs keep") {
    val benchText = "the quick brown fox jumps over the lazy dog again and again today"
    val bench = Seq((1000L, benchText, "eval", 10L)).toDF("doc_id", "text", "source", "n_chars")
    val corpus = Seq(
      // near-copy: one word appended — high shingle overlap, must drop
      (1L, benchText + " tomorrow", "web", 20L),
      // exact copy, must drop
      (2L, benchText, "web", 30L),
      // unrelated, must keep
      (3L, "completely different words about spark engines and query plans entirely", "web", 40L),
      (4L, "another unrelated document with its own vocabulary and nothing shared", "books", 50L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val sigs = Dedup.minHashWithSigPortable(bench, "doc_id", "text", 3, 128)
    val out = CorpusOps.nearDupDecontaminate(corpus, sigs,
        "doc_id", "source", "n_chars", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("web") == ((1L, 2L, 40L)))   // docs 1,2 dropped; 3 kept
    assert(out("books") == ((1L, 0L, 50L)))
  }

  test("containmentDecontaminate: quoted benchmarks drop where Jaccard keeps them") {
    val benchText = "the quick brown fox jumps over the lazy dog again and again today"
    val bench = Seq((1000L, benchText, "eval", 10L)).toDF("doc_id", "text", "source", "n_chars")
    // a long document QUOTING the benchmark verbatim inside much more
    // content: containment(bench in doc) = 1.0, Jaccard << 0.6
    val padding = "meanwhile a sprawling essay discusses catalyst optimizer " +
      "rules tungsten codegen adaptive execution shuffle partitions and " +
      "storage formats at great length with many more words " * 2
    val corpus = Seq(
      (1L, padding + " " + benchText + " " + padding, "web", 20L), // quotes it
      (2L, "completely different words about spark engines and query plans entirely", "web", 40L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val sigs = Dedup.minHashWithSigPortable(bench, "doc_id", "text", 3, 128)
    val cont = CorpusOps.containmentDecontaminate(corpus, sigs,
        "doc_id", "source", "n_chars", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cont("web") == ((1L, 1L, 40L)), s"quoting doc must drop: $cont")
    // the Jaccard rule KEEPS the quoting doc — the gap this operator closes
    val jac = CorpusOps.nearDupDecontaminate(corpus, sigs,
        "doc_id", "source", "n_chars", "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(jac("web") == 0L, s"Jaccard path should keep the quoting doc: $jac")
  }

  test("lm surprisal: repetitive docs score head, rare-bigram docs score tail") {
    // corpus: many copies of the same fluent phrase + one doc of unique
    // word-salad bigrams + one too-short doc
    val fluent = (1L to 6L).map(i => (i, "the cat sat on the mat"))
    val df = (fluent :+ (7L, "zebra quark mat on") :+ (8L, "hi") :+ (9L, ""))
      .toDF("doc_id", "text")
    val out = LmScore.surprisalScores(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // every input doc comes back exactly once
    assert(out.keySet == (1L to 9L).toSet)
    // "the cat sat on the mat": 5 bigrams each seen 6 times corpus-wide
    assert(out(1L).getLong(1) == 5L)
    // short/empty docs are unscored with null mean and rank
    for (id <- Seq(8L, 9L)) {
      assert(out(id).getString(5) == "unscored")
      assert(out(id).isNullAt(3) && out(id).isNullAt(4))
      assert(out(id).getLong(1) == 0L && out(id).getLong(2) == 0L)
    }
    // the word-salad doc has the highest mean surprisal -> last rank, tail
    val scored = out.values.filter(!_.isNullAt(4)).toSeq
    assert(scored.map(_.getLong(4)).sorted == (1L to 7L))
    assert(out(7L).getLong(4) == 7L && out(7L).getString(5) == "tail")
    // identical docs score identically; ranks break ties by doc_id
    assert(fluent.map(f => out(f._1).getDouble(3)).distinct.size == 1)
    assert((1L to 6L).map(i => out(i).getLong(4)) == (1L to 6L))
    // terciles: 7 scored docs -> 2 head, 2 middle, 3 tail (rnk*3 rule)
    assert(scored.count(_.getString(5) == "head") == 2)
    assert(scored.count(_.getString(5) == "middle") == 2)
    assert(scored.count(_.getString(5) == "tail") == 3)
    // minCount pruning: with every bigram pruned away (minCount huge),
    // all bigrams score as unseen (c2=0) — bits strictly increase
    val pruned = LmScore.surprisalScores(df, "doc_id", "text", minCount = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pruned(1L) > out(1L).getLong(2))
    // web-scale-vocabulary mode (shuffle-hash model joins, no broadcast)
    // scores identically
    val shuffled = LmScore.surprisalScores(df, "doc_id", "text",
        broadcastModel = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getString(5)))).toMap
    val base = out.map { case (k, r) => k ->
      ((r.getLong(1), r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getString(5))) }
    assert(shuffled == base)
  }

  test("semantic dedup: clustered pass catches planted dups, nlist=1 is exact") {
    val rnd = new scala.util.Random(23)
    // 4 well-separated gaussian blobs of 50 docs each
    val anchors = Array.fill(4)(Array.fill(32)(rnd.nextGaussian() * 5))
    val originals = (0L until 200L).map { i =>
      val a = anchors((i % 4).toInt)
      (i, a.map(_ + 0.3 * rnd.nextGaussian()))
    }
    val planted = originals.take(60).map { case (i, v) =>
      (i + 1000L, v.map(_ + 0.005 * rnd.nextGaussian())) // cosine ~0.99999
    }
    val df = (originals ++ planted).toDF("id", "vec")
    val out = Dedup.semanticDedup(df, "id", "vec", threshold = 0.995, nlist = 8,
      trainRowsTarget = 1000, seed = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 260)
    val comp = out.map(t => t._1 -> t._2).toMap
    // a planted copy is caught iff it shares a component with its original;
    // near-identical vectors land in the same k-means cell by construction
    val caught = (0L until 60L).count(i => comp(i) == comp(i + 1000L))
    assert(caught >= 57, s"semantic recall ${caught / 60.0} too low")
    // representative rule: keep iff component == id, one keeper per cluster
    out.foreach { case (id, c, keep) => assert(keep == (c == id)) }
    assert(out.filter(_._3).map(_._2).distinct.length == out.count(_._3))
    // nlist=1 disables clustering: must equal brute-force all-pairs dedup
    val exact = Dedup.semanticDedup(df, "id", "vec", threshold = 0.995, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val exactCaught = (0L until 60L).count { i =>
      val m = exact.map(t => t._1 -> t._2).toMap; m(i) == m(i + 1000L)
    }
    assert(exactCaught == 60, "exact pass must catch every planted copy")
    // windowed (linear-cost) mode: near-identical vectors have near-equal
    // centroid distance, so they sit adjacent in the window order
    val win = Dedup.semanticDedup(df, "id", "vec", threshold = 0.995, nlist = 8,
      window = 8, trainRowsTarget = 1000, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val winCaught = (0L until 60L).count(i => win(i) == win(i + 1000L))
    assert(winCaught >= 57, s"windowed recall ${winCaught / 60.0} too low")
    // nlist=1 + window is a contract violation (no centroid to order by),
    // and negative windows are rejected rather than silently running exact
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, "id", "vec", 0.995, nlist = 1, window = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, "id", "vec", 0.995, nlist = 8, window = -1)
    }
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("centroidOutliers: broadcast join, flags vectors far from their centroid") {
    val df = Seq(
      ("a", 1L, Array(1.0, 0.0)), ("a", 2L, Array(0.9, 0.1)),
      ("a", 3L, Array(-1.0, 0.0)), // opposite direction: outlier
      ("b", 4L, Array(0.0, 2.0))
    ).toDF("label", "vid", "vec")
    val out = Similarity.centroidOutliers(df, "label", "vec", threshold = 0.0)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(!out(1L) && !out(2L) && out(3L) && !out(4L))
    val plan = Similarity.centroidOutliers(df, "label", "vec", 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$plan")
  }

  test("covarianceMoments: exact vs brute force, partition-invariant") {
    // vectors whose max|x| = 127 so the int8 quantization is the identity
    // and the expected moments are computable by hand
    val vecs = Seq(
      Array(127.0, 0.0, -127.0),
      Array(0.0, 127.0, 127.0),
      Array(127.0, 127.0, 0.0))
    val expect = {
      val n = vecs.length
      for (i <- 0 until 3; j <- i until 3) yield {
        val sx = vecs.map(_(i).toLong).sum
        val sy = vecs.map(_(j).toLong).sum
        val sxy = vecs.map(v => v(i).toLong * v(j).toLong).sum
        (i, j) -> (n.toLong, sx, sy, sxy, n * sxy - sx * sy)
      }
    }.toMap
    Seq(1, 3).foreach { parts =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs.map(Tuple1(_)), parts)
          .map(t => org.apache.spark.sql.Row(t._1)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      val got = Similarity.covarianceMoments(df, "vec")
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("covarianceMoments: ragged input fails loud") {
    val df = Seq(Tuple1(Array(127.0, 0.0)), Tuple1(Array(127.0, 0.0, 1.0)))
      .toDF("vec")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.covarianceMoments(df, "vec").collect()
    }
    assert(e.getMessage.contains("ragged") ||
      String.valueOf(e.getCause).contains("ragged"))
  }

  test("centroidByKey plans as one exchange with map-side partial aggregation") {
    val df = Seq(("a", Array(1.0, 2.0))).toDF("label", "vec")
    val plan = Similarity.centroidByKey(df, "label", "vec")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, s"one exchange expected:\n$plan")
    assert(plan.contains("partial_quantizedcentroidaggregator"),
      s"map-side combine expected:\n$plan")
  }

  test("centroidByKey: exact quantized means, merge-safe across partitions") {
    val df = Seq(
      ("a", Array(1.0, 2.0)), ("a", Array(2.0, 3.0)), ("a", Array(3.0, 4.0)),
      ("b", Array(-1.5, 0.5))
    ).toDF("label", "vec").repartition(7) // force partial/merge paths
    val out = Similarity.centroidByKey(df, "label", "vec")
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Double](1).toList, r.getLong(2))))
      .toMap
    // floor(x*1000) sums: a -> (1000+2000+3000, 2000+3000+4000)/3000
    assert(out("a") == ((List(2.0, 3.0), 3L)))
    // b: floor(-1.5*1000) = -1500, floor(0.5*1000) = 500
    assert(out("b") == ((List(-1.5, 0.5), 1L)))
  }

  test("pcaProject: PC1 finds the planted axis, orthonormal, deterministic") {
    // anisotropic cloud: variance concentrated on a fixed axis (dims 2+5),
    // small deterministic jitter elsewhere
    val d = 8
    val axis = Array.tabulate(d)(i => if (i == 2) 0.8f else if (i == 5) 0.6f else 0.0f)
    // amp never 0: per-vector quantization normalizes every vector to
    // full scale, so a jitter-only row would masquerade as signal
    val cloud = (0 until 300).map { t =>
      val amp = (t % 20).toFloat - 10.5f
      (t.toLong, Array.tabulate(d)(i =>
        axis(i) * amp + 0.03f * (((t * 31 + i * 17) % 11) - 5)))
    }
    // unit-basis probe rows read W's columns back out through the
    // projection: e_i quantizes to 127*e_i, so pc1(e_i) = 127 * W[i][0]
    val probes = (0 until d).map(i =>
      (1000L + i, Array.tabulate(d)(j => if (i == j) 1.0f else 0.0f)))
    val vecs = (cloud ++ probes).toDF("vec_id", "embedding")
    val out = Similarity.pcaProject(vecs, "vec_id", "embedding", k = 3)
    val rows = out.collect()
    assert(rows.length == 300 + d)
    assert(rows.forall(_.getLong(2) < 1000L), // ortho error < 1e-6
      s"ortho_e9=${rows.head.getLong(2)}")
    assert(rows.forall(_.getLong(3) < 10000L), // eigen-residual < 1e-5
      s"resid_e9=${rows.head.getLong(3)}")
    val w1 = rows.filter(_.getLong(0) >= 1000L)
      .map(r => (r.getLong(0) - 1000L).toInt -> r.getSeq[Double](1).head / 127.0)
      .toMap
    // PC1 concentrates on the planted dims 2 and 5 in the 0.8 : 0.6 ratio
    assert(math.abs(w1(2)) > 0.7 && math.abs(w1(5)) > 0.5, s"w1=$w1")
    assert(w1(2) * w1(5) > 0, s"planted dims must agree in sign: $w1")
    val offAxis = (0 until d).filter(i => i != 2 && i != 5).map(i => math.abs(w1(i))).sum
    assert(offAxis < 0.25, s"off-axis PC1 mass too high: $w1")
    val ratio = math.abs(w1(2) / w1(5))
    assert(ratio > 1.1 && ratio < 1.6, s"expected ~0.8/0.6 ratio, got $ratio")
    // bit-identical on re-run (deterministic Jacobi + canonical signs)
    val again = Similarity.pcaProject(vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val first = rows.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == first)
  }

  test("int8 quantization: error <= scale/2, clamps at 127, zero-vector safe") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 50L).map(i => (i, Array.fill(16)(rnd.nextDouble() * 20 - 10))) :+
      (51L, Array.fill(16)(0.0))
    val df = rows.toDF("id", "v")
    val out = df.select(col("id"), col("v"), Similarity.quantizeInt8(col("v")).as("qz"))
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Double](1)
      val q = r.getStruct(2).getSeq[Byte](0)
      val scale = r.getStruct(2).getDouble(1)
      assert(q.forall(b => b >= -127 && b <= 127))
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(x - b * scale) <= scale / 2 + 1e-12,
          s"id=${r.getLong(0)} x=$x q=$b scale=$scale")
      }
    }
    // the zero vector quantizes to zeros with the sentinel scale
    val zero = out.find(_.getLong(0) == 51L).get
    assert(zero.getStruct(2).getSeq[Byte](0).forall(_ == 0))
    assert(zero.getStruct(2).getDouble(1) == 1.0)
    // non-finite coordinates fail loudly instead of saturating the vector
    import graft.spark.SparkTestSession.chainMsg
    for (v <- Seq(Array(1.0, Double.NaN), Array(Double.PositiveInfinity, 1.0))) {
      val ex = intercept[Exception] {
        Seq((1L, v)).toDF("id", "v")
          .select(Similarity.quantizeInt8(col("v"))).collect()
      }
      assert(chainMsg(ex).contains("non-finite coordinate"), chainMsg(ex))
    }
  }

  test("int8-quantized top-k agrees closely with float-exact top-k") {
    val rnd = new scala.util.Random(9)
    val corpus = (1L to 300L).map(i => (i, Array.fill(32)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "vec")
      .withColumn("qz", Similarity.quantizeInt8(col("vec")))
      .withColumn("dq", expr("transform(qz.q, q -> CAST(q AS DOUBLE) * qz.scale)"))
    val queries = corpus.filter(col("id") <= 10)
    def topk(vecCol: String) =
      Similarity.bruteForceTopK(corpus, "id", vecCol, queries.select(col("id").as("qid"), col(vecCol)), "qid", vecCol, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk("vec")
    val quant = topk("dq")
    // per-coordinate error <= scale/2 (~0.4% of range): overlap@10 stays high
    val overlap = (exact intersect quant).size.toDouble / exact.size
    assert(overlap >= 0.9, s"overlap $overlap")
  }

  test("centroidByKey fails loudly on ragged groups and NaN coordinates") {
    val ragged = Seq(("a", Array(1.0, 2.0)), ("a", Array(1.0)))
      .toDF("label", "vec")
    val ex1 = intercept[Exception] {
      Similarity.centroidByKey(ragged, "label", "vec").collect()
    }
    import graft.spark.SparkTestSession.chainMsg
    assert(chainMsg(ex1).contains("ragged group"), chainMsg(ex1))
    val withNaN = Seq(("a", Array(1.0, Double.NaN))).toDF("label", "vec")
    val ex2 = intercept[Exception] {
      Similarity.centroidByKey(withNaN, "label", "vec").collect()
    }
    assert(chainMsg(ex2).contains("non-finite coordinate"), chainMsg(ex2))
    val withInf = Seq(("a", Array(1.0, Double.PositiveInfinity))).toDF("label", "vec")
    val ex3 = intercept[Exception] {
      Similarity.centroidByKey(withInf, "label", "vec").collect()
    }
    assert(chainMsg(ex3).contains("non-finite coordinate"), chainMsg(ex3))
  }

  test("brute force top-k ranks by cosine with id tiebreak") {
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)),
      (4L, Array(-1.0, 0.0))).toDF("id", "vec")
    val queries = Seq((100L, Array(1.0, 0.0))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("bounded-heap top-k matches window row_number on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 300L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val queries = (0L until 7L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("qid", "qvec")
    val got = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val want = corpus.select(col("id").as("neighbor_id"), col("vec"))
      .crossJoin(queries.select(col("qid").as("query_id"), col("qvec")))
      .withColumn("cosine", Similarity.cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(got == want)
  }

  test("ivf top-k achieves high recall on clustered data") {
    val rnd = new scala.util.Random(23)
    def cluster(center: Array[Double], n: Int, startId: Long) =
      (0 until n).map(i => (startId + i, center.map(_ + 0.05 * rnd.nextGaussian())))
    val centers = (0 until 6).map(_ => Array.fill(16)(rnd.nextGaussian()))
    val corpus = centers.zipWithIndex.flatMap { case (c, i) =>
      cluster(c, 50, i * 100L)
    }.toDF("id", "vec")
    val queries = centers.zipWithIndex.map { case (c, i) =>
      (1000L + i, c.map(_ + 0.02 * rnd.nextGaussian()))
    }.toDF("qid", "qvec")
    val got = Similarity.ivfTopK(corpus, "id", "vec", queries, "qid", "qvec",
      k = 10, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val want = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("semanticDecontaminate: flags by max eval cosine, guards eval size and nulls") {
    val ev = Seq((100L, Array(1.0, 0.0, 0.0)), (101L, Array(0.0, 1.0, 0.0)))
      .toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Array(2.0, 0.0, 0.0)),    // colinear with eval 100: cosine 1
      (2L, Array(0.0, 0.0, 5.0)),    // orthogonal to both: max 0
      (3L, Array(1.0, 1.0, 0.0))     // cos 1/sqrt(2) to both
    ).toDF("id", "vec")
    val out = Similarity.semanticDecontaminate(corpus, "id", "vec",
        ev, "qid", "qvec", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false)))
    assert(math.abs(out(3L)._1 - 1.0 / math.sqrt(2.0)) < 1e-12 && !out(3L)._2)
    // eval-size guard (limit-bounded count)
    val e = intercept[IllegalArgumentException](
      Similarity.semanticDecontaminate(corpus, "id", "vec", ev, "qid", "qvec",
        threshold = 0.9, maxEvalRows = 1L))
    assert(e.getMessage.contains("broadcast"), e.getMessage)
    // a NULL corpus vector fails loud (it would score uncontaminated)
    val withNull = Seq((9L, null.asInstanceOf[Array[Double]])).toDF("id", "vec")
    val eNull = intercept[Exception](
      Similarity.semanticDecontaminate(withNull, "id", "vec", ev, "qid", "qvec",
        threshold = 0.9).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eNull).contains("NULL corpus"),
      graft.spark.SparkTestSession.chainMsg(eNull).take(300))
    // a NULL EVAL vector fails loud too (max skips null cosines, so it
    // would silently WEAKEN the check — r12 advice)
    val evNull = Seq((100L, Array(1.0, 0.0, 0.0)),
      (101L, null.asInstanceOf[Array[Double]])).toDF("qid", "qvec")
    val eEvalNull = intercept[Exception](
      Similarity.semanticDecontaminate(corpus, "id", "vec", evNull, "qid",
        "qvec", threshold = 0.9).collect())
    assert(graft.spark.SparkTestSession.chainMsg(eEvalNull).contains("NULL eval"),
      graft.spark.SparkTestSession.chainMsg(eEvalNull).take(300))
  }

  test("bruteForceTopK enforces the queries-small broadcast contract") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 30).map(i =>
      (i.toLong, Array.fill(4)(rnd.nextGaussian()))).toDF("id", "vec")
    val qs = (0 until 10).map(i =>
      (100L + i, Array.fill(4)(rnd.nextGaussian()))).toDF("qid", "qvec")
    val e = intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(corpus, "id", "vec", qs, "qid", "qvec",
        k = 3, maxQueries = 5L))
    assert(e.getMessage.contains("ANN path"), e.getMessage)
    // at or under the cap (and with the opt-out) it runs
    assert(Similarity.bruteForceTopK(corpus, "id", "vec", qs, "qid", "qvec",
      k = 3, maxQueries = 10L).count() == 30L)
    assert(Similarity.bruteForceTopK(corpus, "id", "vec", qs, "qid", "qvec",
      k = 3, maxQueries = Long.MaxValue).count() == 30L)
  }

  test("persisted IVF index: build/reload equals the inline path; probes prune") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 120).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "vec")
    val queries = (0 until 5).map(i =>
      (1000L + i, Array.fill(8)(rnd.nextGaussian()))).toDF("qid", "qvec")
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val cells = Similarity.buildIvfIndex(corpus, "id", "vec", dir,
      nlist = 8, seed = 9)
    assert(cells == 8)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    // all-cells probe over the index == the inline exact arm == brute force
    val fromIdx = asSet(Similarity.ivfTopKFromIndex(spark, dir, queries,
      "qid", "qvec", k = 4, nprobe = 8))
    val inline = asSet(Similarity.ivfTopK(corpus, "id", "vec", queries,
      "qid", "qvec", k = 4, nlist = 8, nprobe = 8, seed = 9))
    assert(fromIdx == inline && fromIdx.nonEmpty)
    // approximate probing returns valid per-query top-k shapes
    val approx = Similarity.ivfTopKFromIndex(spark, dir, queries,
      "qid", "qvec", k = 4, nprobe = 2).collect()
    assert(approx.nonEmpty &&
      approx.groupBy(_.getAs[Long]("query_id")).values.forall(_.length <= 4))
    // missing index fails loud
    intercept[Exception](Similarity.ivfTopKFromIndex(spark, s"$dir/nope",
      queries, "qid", "qvec", k = 4).collect())
    // explicit oversized nprobe is an ERROR, never silently clamped
    val e = intercept[IllegalArgumentException](
      Similarity.ivfTopKFromIndex(spark, dir, queries, "qid", "qvec",
        k = 4, nprobe = 9))
    assert(e.getMessage.contains("cell count"), e.getMessage)
    // the auto-sized default clamps to the cell count on a tiny index
    // (max(4, nlist/8) floor would exceed 2 cells) instead of erroring
    val tiny = java.nio.file.Files.createTempDirectory("ivf_tiny").toString
    Similarity.buildIvfIndex(corpus, "id", "vec", tiny, nlist = 2, seed = 9)
    val auto = asSet(Similarity.ivfTopKFromIndex(spark, tiny, queries,
      "qid", "qvec", k = 4))
    assert(auto == asSet(Similarity.bruteForceTopK(corpus, "id", "vec",
      queries, "qid", "qvec", 4))) // 2-cell default probes all cells
  }

  test("IVF append: increment assigns under frozen centroids == same-centroid rebuild; drift report; contracts") {
    val rnd = new scala.util.Random(47)
    val a = (0 until 80).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "vec")
    val b = (80 until 130).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "vec")
    val union = a.unionByName(b)
    val queries = (0 until 5).map(i =>
      (1000L + i, Array.fill(8)(rnd.nextGaussian()))).toDF("qid", "qvec")
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    val cells = Similarity.buildIvfIndex(a, "id", "vec", dir,
      nlist = 8, seed = 9)
    val report = Similarity.appendIvfIndex(b, "id", "vec", dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // drift report: counts sum to the increment, cosines are cosines
    assert(report.map(_._2).sum == 50L)
    assert(report.forall(r => r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
    // append ∪ build ≡ same-centroid rebuild: every appended row's cell
    // equals assignment of the UNION under the frozen centroids (the
    // quantizer never moved, files only accumulated)
    val centers = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val postings = spark.read.parquet(s"$dir/postings").collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("cell")).toMap
    val want = Similarity.assignToCenters(union, "id", "vec", centers)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(postings == want,
      s"appended postings != same-centroid assignment of the union")
    // all-cells probe over the appended index == brute force over the
    // union (the sim_ivf_exact identity survives the append)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(asSet(Similarity.ivfTopKFromIndex(spark, dir, queries,
        "qid", "qvec", k = 4, nprobe = cells)) ==
      asSet(Similarity.bruteForceTopK(union, "id", "vec", queries,
        "qid", "qvec", 4)))
    // contracts: appending to a missing index fails loud; a
    // wrong-dimension increment fails loud (a short vector would
    // silently assign by a partial distance)
    val e1 = intercept[IllegalArgumentException](
      Similarity.appendIvfIndex(b, "id", "vec", s"$dir/nope"))
    assert(e1.getMessage.contains("build the index first") ||
      e1.getMessage.contains("no centroids"), e1.getMessage)
    val short = Seq((999L, Array(1.0, 2.0))).toDF("id", "vec")
    val e2 = intercept[Exception](
      Similarity.appendIvfIndex(short, "id", "vec", dir))
    assert(graft.spark.SparkTestSession.chainMsg(e2).contains("index dim"),
      graft.spark.SparkTestSession.chainMsg(e2).take(300))
    // a NULL vector gets the shaped error, not a raw executor NPE
    // (size(NULL) is NULL, so the dim predicate alone would let it through)
    val nullVec = Seq((998L, null.asInstanceOf[Array[Double]]))
      .toDF("id", "vec")
    val e3 = intercept[Exception](
      Similarity.appendIvfIndex(nullVec, "id", "vec", dir))
    assert(graft.spark.SparkTestSession.chainMsg(e3).contains("NULL vec"),
      graft.spark.SparkTestSession.chainMsg(e3).take(300))
  }

  test("IVF rebuild-on-drift: planted drift triggers retrain; fresh index beats stale on recall; no-drift is a no-op") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(53)
    // base: 4 tight blobs near the origin region
    def blob(c: Array[Double], n: Int, from: Int) =
      (from until from + n).map(i =>
        (i.toLong, c.zipWithIndex.map { case (v, d) =>
          v + 0.1 * rnd.nextGaussian() }))
    val baseCenters = Seq(Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 1.0, 0, 0, 0, 0, 0, 0), Array(0, 0, 1.0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 1.0, 0, 0, 0, 0))
    val base = baseCenters.zipWithIndex
      .flatMap { case (c, j) => blob(c, 40, j * 40) }.toDF("id", "vec")
    // drifted appends: 15 pairs along the (2.4, 2.4, e) diagonal — far
    // off every base direction (the pooled cosine to the frozen
    // centroids sags to ~0.71), and all swallowed by whichever e0-ish
    // frozen cell leans closest to the diagonal.
    val pairs = (0 until 15).flatMap { j =>
      val e = 0.15 * j
      Seq((1000L + 2 * j, Array(2.45, 2.35, e, 0.0, 0, 0, 0, 0)),
        (1001L + 2 * j, Array(2.35, 2.45, e, 0.0, 0, 0, 0, 0)))
    }
    val drifted = pairs.toDF("id", "vec")
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_rebuild").toString
    Similarity.buildIvfIndex(base, "id", "vec", dir, nlist = 6, seed = 9)
    val report = Similarity.appendIvfIndex(drifted, "id", "vec", dir)
      .localCheckpoint(true)
    // recall probe at nprobe = 1: the queries sit at (1.8, 2.9, e) —
    // their COSINE-nearest neighbors are the drifted pairs (cos ~ 0.97
    // vs ~ 0.85 for the nearest base blob), but their L2-nearest FROZEN
    // centroid is the e1 cell (d^2 ~ 7.1 vs ~ 8.7 to the cell holding
    // the drift), so the single probed cell contains NONE of the true
    // top-2 — recall collapses structurally until the rebuild gives the
    // drifted mass its own centroid. Truth = brute force over the union.
    val union = base.unionByName(drifted)
    val queries = (0 until 10).map(j =>
        (5000L + j, Array(1.8, 2.9, 0.15 * j, 0.0, 0, 0, 0, 0)))
      .toDF("qid", "qvec")
    def recall(): Double = {
      val got = Similarity.ivfTopKFromIndex(spark, dir, queries,
          "qid", "qvec", k = 2, nprobe = 1).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .toSet
      val want = Similarity.bruteForceTopK(union, "id", "vec", queries,
          "qid", "qvec", 2).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .toSet
      (got intersect want).size.toDouble / want.size
    }
    val staleRecall = recall()
    assert(staleRecall < 0.8,
      s"fixture defect: the frozen quantizer shows no recall decay " +
        s"($staleRecall) — the drift plant missed the cell boundary")
    // the decision: share 30/190 stays under the ceiling, but the
    // pooled cosine to the frozen centroids sags (the pairs are far off
    // every base direction) — rebuilt must be true via the cosine floor
    val dec = Similarity.rebuildIvfIndexIfDrifted(spark, dir, report,
      meanCosFloor = 0.75, appendShareCeil = 0.25, nlist = 6, seed = 9)
      .collect().head
    assert(dec.getAs[Boolean]("rebuilt"), s"drift not detected: $dec")
    assert(dec.getAs[Long]("n_appended") == 30L &&
      dec.getAs[Long]("n_postings") == 190L)
    assert(math.abs(dec.getAs[Double]("append_share") - 30.0 / 190) < 1e-6)
    // the rebuilt index gives the drifted mass its own cell(s) that
    // hold both members of a pair: recall at the SAME nprobe = 1 must
    // improve
    val freshRecall = recall()
    assert(freshRecall > staleRecall,
      s"rebuild did not recover recall: stale $staleRecall, " +
        s"fresh $freshRecall")
    assert(freshRecall >= 0.5, s"fresh recall $freshRecall < 0.5")
    // postings survived the in-place rebuild intact (same id set)
    assert(spark.read.parquet(s"$dir/postings").count() == 190L)
    // no-drift arm: a small, in-distribution append under loose
    // thresholds must NOT rebuild (decision false, postings untouched)
    val dir2 = java.nio.file.Files
      .createTempDirectory("ivf_norebuild").toString
    Similarity.buildIvfIndex(base, "id", "vec", dir2, nlist = 6, seed = 9)
    val tiny = blob(baseCenters.head, 5, 7000).toDF("id", "vec")
    val rep2 = Similarity.appendIvfIndex(tiny, "id", "vec", dir2)
      .localCheckpoint(true)
    val files = new java.io.File(s"$dir2/centroids").list().sorted.toSeq
    val dec2 = Similarity.rebuildIvfIndexIfDrifted(spark, dir2, rep2,
      meanCosFloor = 0.5, appendShareCeil = 0.25, nlist = 6, seed = 9)
      .collect().head
    assert(!dec2.getAs[Boolean]("rebuilt"), s"no-drift rebuilt: $dec2")
    assert(new java.io.File(s"$dir2/centroids").list().sorted.toSeq
      == files, "a no-op decision rewrote the centroids")
    // empty-index contract
    val eE = intercept[Exception](Similarity.rebuildIvfIndexIfDrifted(
      spark, s"$dir2/nowhere", rep2))
    assert(graft.spark.SparkTestSession.chainMsg(eE).toLowerCase
      .contains("path does not exist") ||
      graft.spark.SparkTestSession.chainMsg(eE).contains("empty postings"))
  }

  test("kmeans: trained clustering recovers planted blobs and beats fixed init") {
    val rnd = new scala.util.Random(7)
    val blobCenters = (0 until 4).map(_ => Array.fill(8)(rnd.nextGaussian() * 10))
    val corpus = blobCenters.zipWithIndex.flatMap { case (c, i) =>
      (0 until 40).map(j => (i * 100L + j, c.map(_ + 0.1 * rnd.nextGaussian())))
    }.toDF("id", "vec")
    val assigned = Similarity.kmeansCluster(corpus, "id", "vec", k = 4, seed = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(assigned.length == 160)
    // same seed + data => bit-identical clustering (seeded sample, seeded init)
    val again = Similarity.kmeansCluster(corpus, "id", "vec", k = 4, seed = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.sortBy(_._1).toSeq == assigned.sortBy(_._1).toSeq)
    // all k cells materialize and co-blob points that share a cluster sit close
    assert(assigned.map(_._2).distinct.length == 4)
    // trained inertia beats a fixed degenerate init (all 4 firsts from ONE blob)
    val fixed = corpus.filter(col("id") < 4).sort("id")
      .collect().map(_.getSeq[Double](1).toArray)
    val fixedInertia = Similarity.assignToCenters(corpus, "id", "vec", fixed)
      .agg(sum("d2")).collect().head.getDouble(0)
    val trainedInertia = assigned.map(_._3).sum
    assert(trainedInertia < fixedInertia)
    // assignToCenters ties break to the lowest cluster index
    val dup = Seq((0L, Array(1.0, 0.0))).toDF("id", "vec")
    val tied = Similarity.assignToCenters(dup, "id", "vec",
      Array(Array(0.0, 0.0), Array(2.0, 0.0))).collect().head
    assert(tied.getLong(1) == 0L && tied.getDouble(2) == 1.0)
  }

  test("partitioning invariance: centroid, top-k, segment dedup bit-identical across layouts") {
    // the oracle gate's premise: results must not depend on how rows are
    // split across tasks (exact integer sums, total-order merges, min-struct
    // first-occurrence). Pin it by re-running on adversarial layouts.
    val rnd = new scala.util.Random(61)
    val vecs = (0L until 200L).map(i => (i % 7, i, Array.fill(16)(rnd.nextGaussian())))
    val vdf = vecs.toDF("g", "id", "vec")
    def layouts(df: org.apache.spark.sql.DataFrame, key: String = "id") =
      Seq(df.coalesce(1), df.repartition(17, col(key)), df.repartitionByRange(5, col(key).desc))
    def centroids(df: org.apache.spark.sql.DataFrame) =
      Similarity.centroidByKey(df, "g", "vec").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getLong(2))).toSet
    val cRef = centroids(vdf.coalesce(1))
    layouts(vdf).foreach(l => assert(centroids(l) == cRef))
    val qdf = vecs.take(3).map { case (_, i, v) => (1000L + i, v) }.toDF("qid", "qvec")
    def topk(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df, "id", "vec", qdf, "qid", "qvec", 7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val tRef = topk(vdf.coalesce(1))
    layouts(vdf).foreach(l => assert(topk(l) == tRef))
    val docs = (0L until 60L).map(i => (i, s"w${i % 9} x y z w${i % 9} a b c"))
      .toDF("doc_id", "text")
    def segs(df: org.apache.spark.sql.DataFrame) =
      Dedup.dedupSegments(df, "doc_id", "text", 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val sRef = segs(docs.coalesce(1))
    layouts(docs, "doc_id").foreach(l => assert(segs(l) == sRef))
  }

  test("randomProject: deterministic portable matrix, JL distance preservation") {
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 300L).map(i => (i, Array.fill(64)(rnd.nextGaussian())))
    val df = vecs.toDF("id", "vec")
    val proj = df.select(col("id"),
        Similarity.randomProject(col("vec"), 64, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // exact reference for one vector: same md5 sign convention, independently
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val d = md.digest(s"$i:$j".getBytes("UTF-8"))
      var v = 0L
      for (k <- 0 until 8) v = (v << 8) | (d(k) & 0xffL)
      if (((v >>> 4) & 1L) == 1L) 1.0 else -1.0
    }
    val v0 = vecs.head._2
    val want = Array.tabulate(16)(j => (0 until 64).map(i => v0(i) * sign(i, j)).sum * 0.25)
    assert(proj(0L).toSeq == want.toSeq)
    // JL: norms preserved within distortion on average (eps ~ sqrt(8/16)*slack)
    def n2(a: Array[Double]) = a.map(x => x * x).sum
    val ratios = vecs.take(100).map { case (i, v) => n2(proj(i)) / n2(v) }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean norm ratio $mean")
    assert(ratios.count(r => r > 0.3 && r < 1.9) >= 95, "distortion tail too heavy")
    // null vectors fail loudly (the engine-wide convention), not NPE/drop
    import graft.spark.SparkTestSession.chainMsg
    val ex = intercept[Exception] {
      Seq((1L, null.asInstanceOf[Array[Double]])).toDF("id", "vec")
        .select(Similarity.randomProject(col("vec"), 64, 16)).collect()
    }
    assert(chainMsg(ex).contains("null vector"), chainMsg(ex))
    // ragged (too-short) vectors fail loudly too — a silent prefix
    // projection would skew every downstream distance
    val exShort = intercept[Exception] {
      Seq((1L, Array.fill(8)(1.0))).toDF("id", "vec")
        .select(Similarity.randomProject(col("vec"), 64, 16)).collect()
    }
    assert(chainMsg(exShort).contains("shorter than inDim"), chainMsg(exShort))
  }

  test("projectedTopK: high recall vs brute force through the 4x-smaller scan") {
    // clustered corpus (the realistic embedding regime — uniform random
    // 64-dim gaussians have near-orthogonal neighbors, where ANY projection
    // shreds the razor-thin top-k margins)
    val rnd = new scala.util.Random(59)
    def cluster(center: Array[Double], n: Int, startId: Long) =
      (0 until n).map(i => (startId + i, center.map(_ + 0.1 * rnd.nextGaussian())))
    val centers = (0 until 8).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val vecs = centers.zipWithIndex.flatMap { case (c, i) => cluster(c, 50, i * 100L) }
    val df = vecs.toDF("id", "vec")
    val qdf = centers.zipWithIndex.map { case (c, i) => (1000L + i, c) }.toDF("qid", "qvec")
    val got = Similarity.projectedTopK(df, "id", "vec", qdf, "qid", "qvec",
      k = 5, shortlist = 40, inDim = 64, outDim = 16)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val want = Similarity.bruteForceTopK(df, "id", "vec", qdf, "qid", "qvec", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.8, s"projected recall $recall too low")
  }

  test("pq adc top-k: planted copies recovered, high overlap with exact") {
    val rnd = new scala.util.Random(31)
    def cluster(center: Array[Double], n: Int, startId: Long) =
      (0 until n).map(i => (startId + i, center.map(_ + 0.05 * rnd.nextGaussian())))
    val centers = (0 until 6).map(_ => Array.fill(16)(rnd.nextGaussian()))
    val base = centers.zipWithIndex.flatMap { case (c, i) => cluster(c, 50, i * 100L) }
    // planted near-copies of the query vectors (dyadic perturbation)
    val queries = centers.zipWithIndex.map { case (c, i) => (1000L + i, c) }
    val planted = queries.map { case (id, v) =>
      (-(id + 1), v.zipWithIndex.map { case (x, i) => x + (i % 3 - 1) / 256.0 })
    }
    val corpus = (base ++ planted).toDF("id", "vec")
    val qdf = queries.toDF("qid", "qvec")
    val got = Similarity.pqTopK(corpus, "id", "vec", qdf, "qid", "qvec",
      k = 10, m = 8, ksub = 64, trainRowsTarget = 1000, seed = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // every planted near-copy (cosine ~1) must surface in its query's top-k
    queries.foreach { case (qid, _) =>
      assert(got.contains((qid, -(qid + 1))), s"planted copy missed for $qid")
    }
    val want = Similarity.bruteForceTopK(corpus, "id", "vec", qdf, "qid", "qvec", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.6, s"pq recall $recall too low")
  }

  test("ivfpq top-k: planted copies recovered within probed cells") {
    val rnd = new scala.util.Random(41)
    def cluster(center: Array[Double], n: Int, startId: Long) =
      (0 until n).map(i => (startId + i, center.map(_ + 0.05 * rnd.nextGaussian())))
    val centers = (0 until 6).map(_ => Array.fill(16)(rnd.nextGaussian()))
    val base = centers.zipWithIndex.flatMap { case (c, i) => cluster(c, 50, i * 100L) }
    val queries = centers.zipWithIndex.map { case (c, i) => (1000L + i, c) }
    val planted = queries.map { case (id, v) =>
      (-(id + 1), v.zipWithIndex.map { case (x, i) => x + (i % 3 - 1) / 256.0 })
    }
    val corpus = (base ++ planted).toDF("id", "vec")
    val qdf = queries.toDF("qid", "qvec")
    val got = Similarity.ivfPqTopK(corpus, "id", "vec", qdf, "qid", "qvec",
      k = 10, nlist = 8, nprobe = 4, m = 8, ksub = 64,
      trainRowsTarget = 1000, seed = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // a planted near-copy lands in the query's own nearest cell, which is
    // always probed — it must surface in the top-k
    queries.foreach { case (qid, _) =>
      assert(got.contains((qid, -(qid + 1))), s"planted copy missed for $qid")
    }
    val want = Similarity.bruteForceTopK(corpus, "id", "vec", qdf, "qid", "qvec", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.5, s"ivfpq recall $recall too low")
    // corpus smaller than nlist: lloyd clamps the centers; tables and
    // probe counts must size from the EFFECTIVE cell count, not crash
    val tiny = (0L until 10L).map(i => (i, Array.fill(16)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val tq = Seq((99L, Array.fill(16)(0.1))).toDF("qid", "qvec")
    val rows = Similarity.ivfPqTopK(tiny, "id", "vec", tq, "qid", "qvec",
      k = 3, nlist = 64, nprobe = 8, m = 8, ksub = 4, trainRowsTarget = 100, seed = 3)
      .collect()
    assert(rows.length == 3)
  }

  test("lsh top-k achieves high recall on clustered data") {
    val rnd = new scala.util.Random(7)
    def cluster(center: Array[Double], n: Int, startId: Long) =
      (0 until n).map { i =>
        (startId + i, center.map(c => c + rnd.nextGaussian() * 0.05))
      }
    val c1 = Array.fill(16)(1.0); val c2 = Array.fill(16)(-1.0)
    val c3 = (0 until 16).map(i => if (i < 8) 1.0 else -1.0).toArray
    val corpus = (cluster(c1, 40, 0) ++ cluster(c2, 40, 100) ++ cluster(c3, 40, 200))
      .toDF("id", "vec")
    val queries = Seq((0L, c1), (1L, c2), (2L, c3)).toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(corpus, "id", "vec", queries, "qid", "qvec", 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(corpus, "id", "vec", queries, "qid", "qvec", 10,
      planes = 6, bands = 6)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("hardNegatives: per-anchor positive and hardest negative, tie and guard rules") {
    // anchor 1 (label a) at (1, 0); same-label 2 at (0.9, 0.1) (positive),
    // different-label 3 at (0.99, 0.01) is the CONFUSABLE hard negative,
    // different-label 4 at (-1, 0) is easy (far)
    val corpus = Seq(
      (1L, "a", Array(1.0, 0.0)), (2L, "a", Array(0.9, 0.1)),
      (3L, "b", Array(0.99, 0.01)), (4L, "b", Array(-1.0, 0.0))
    ).toDF("id", "label", "vec")
    val anchors = corpus.filter(col("id") === 1L)
      .select(col("id").as("qid"), col("vec"), col("label"))
    val r = graft.ops.Similarity.hardNegatives(corpus, "id", "vec", "label",
      anchors, "qid", "vec", "label")
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(r("positive") == 2L) // the only same-label non-self vector
    assert(r("negative") == 3L) // the confusable one, not the far one
    // an anchor whose label is unique emits no positive row
    val lonely = Seq((9L, "z", Array(0.0, 1.0))).toDF("qid", "label", "vec")
    val r2 = graft.ops.Similarity.hardNegatives(corpus, "id", "vec", "label",
      lonely, "qid", "vec", "label")
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(!r2.contains("positive") && r2.contains("negative"))
    // ties break to the HIGHEST neighbor id (the max(struct) rule)
    val tied = Seq(
      (1L, "a", Array(1.0, 0.0)), (5L, "b", Array(2.0, 0.0)),
      (6L, "b", Array(3.0, 0.0)) // same cosine (1.0) as id 5
    ).toDF("id", "label", "vec")
    val rt = graft.ops.Similarity.hardNegatives(tied, "id", "vec", "label",
      tied.filter(col("id") === 1L).select(col("id").as("qid"), col("vec"),
        col("label")), "qid", "vec", "label")
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(rt("negative") == 6L)
    // NULL corpus label fails loud
    val badCorpus = Seq((1L, Some("a"), Array(1.0, 0.0)),
      (2L, Option.empty[String], Array(0.5, 0.5))).toDF("id", "label", "vec")
    val e = intercept[Exception](graft.ops.Similarity.hardNegatives(
      badCorpus, "id", "vec", "label",
      anchors, "qid", "vec", "label").collect())
    assert(SparkTestSession.chainMsg(e).contains("NULL corpus label"))
    // the broadcast guard fires on an oversized anchor set
    val e2 = intercept[IllegalArgumentException](
      graft.ops.Similarity.hardNegatives(corpus, "id", "vec", "label",
        corpus.select(col("id").as("qid"), col("vec"), col("label")),
        "qid", "vec", "label", maxQueries = 2L))
    assert(e2.getMessage.contains("query batches"), e2.getMessage)
  }

}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("frame sampling: evenly-spaced indices, only sampled frames decode") {
    import spark.implicits._
    // 5 distinct real PNG frames; n=2 samples floor(0*5/2)=0, floor(1*5/2)=2
    val frames = (0 until 5).map(i => Multimodal.syntheticPng("frame" * (i + 1)))
    val video = Multimodal.syntheticVideo(frames)
    val df = Seq((7L, video)).toDF("id", "media")
    val sampled = Multimodal.sampleFrames(df, "media", n = 2)
      .select("id", "frame_idx", "n_frames", "frame")
      .collect().sortBy(_.getLong(1))
    assert(sampled.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(sampled.forall(_.getInt(2) == 5))
    // the sampled bytes are the exact original frames, decodable roundtrip
    sampled.zip(Seq(0, 2)).foreach { case (r, fi) =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](3), frames(fi)))
      assert(Multimodal.decodeImageBytes(r.getAs[Array[Byte]](3)).nonEmpty)
    }
    // malformed payloads produce zero rows, not failures
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "media")
    assert(Multimodal.sampleFrames(bad, "media", 2).count() == 0)
  }

  test("media columns + payload features + resize plan") {
    val df = Seq((1L, "hello world")).toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val media = Multimodal.withMediaColumns(df, col("payload"), lit("txt"))
    val row = media.select(col("meta.n_bytes"), col("meta.format")).collect().head
    assert(row.getLong(0) == 11L && row.getString(1) == "txt")

    val feats = media.select(Multimodal.payloadFeatures(col("media")).as("f"))
      .select("f.n_bytes", "f.sha256").collect().head
    assert(feats.getLong(0) == 11L)
    assert(feats.getString(1) ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9") // sha256("hello world")

    val decoded = Multimodal.decodeImageStub(media, "media")
    val plan = decoded.select(Multimodal.resizePlan(col("decoded"), 256).as("p"))
      .select("p.target_width", "p.target_height", "p.scale").collect().head
    assert(plan.getInt(0) <= 256 && plan.getInt(1) <= 256)
  }

  test("real image decode + resize roundtrip via ImageIO") {
    val text = "a" * 30 // w = 4 + 30%13 = 8, h = 4 + (30/13)%11 = 6
    val png = Multimodal.syntheticPng(text)
    assert(png.length > 8 && (png(1) & 0xFF) == 'P'.toInt) // PNG magic
    val df = Seq((1L, png)).toDF("id", "media")
    val dec = Multimodal.decodeImage(df, "media")
      .select("decoded.width", "decoded.height", "decoded.mean_luminance")
      .collect().head
    assert(dec.getInt(0) == 8 && dec.getInt(1) == 6)
    assert(dec.getDouble(2) > 0.0 && dec.getDouble(2) < 255.0)
    // real resize halves the longest side
    val resized = Multimodal.resizeImage(df, "media", maxSide = 4)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    val back = Multimodal.decodeImageBytes(resized).get
    assert(back.width == 4 && back.height == 3)
    // undecodable bytes yield null struct, not an exception
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    assert(Multimodal.decodeImage(junk, "media").filter(col("decoded").isNull).count() == 1)
  }

  test("real audio decode via javax.sound") {
    val wav = Multimodal.syntheticWav("hello world", 16000f)
    val df = Seq((1L, wav)).toDF("id", "media")
    val dec = Multimodal.decodeAudio(df, "media")
      .select("decoded_audio.sample_rate", "decoded_audio.channels",
        "decoded_audio.n_frames").collect().head
    assert(dec.getDouble(0) == 16000.0)
    assert(dec.getInt(1) == 1)
    assert(dec.getLong(2) == 11L) // one frame per byte
  }

  test("batched feature extraction preserves rows and adds deterministic vectors") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz")).toDF("id", "text")
      .withColumn("media", col("text").cast("binary")).drop("text")
    val out = Multimodal.extractFeaturesBatched(df, "media")
    val rows = out.collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(rows.size == 3)
    assert(rows(1L) == rows(2L)) // deterministic on same bytes
    assert(rows(1L) != rows(3L))
    // the forward pass is the pinned fixed-weight network: hand-replay
    // sum-pool + portable +-1 linear layer for "abc" at inDim=16, outDim=8
    val w = Similarity.portableSigns(16, 8)
    val bytes = "abc".getBytes("UTF-8")
    val acc = new Array[Long](16)
    bytes.zipWithIndex.foreach { case (b, i) => acc(i % 16) += b.toLong }
    val expect = (0 until 8).map(j => (0 until 16).map(k => acc(k) * w(k)(j)).sum)
    assert(rows(1L) == expect, s"got ${rows(1L)} want $expect")
    // batch size must not change results (batched == row-at-a-time)
    val one = Multimodal.extractFeaturesBatched(df, "media", batchSize = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(one == rows)
  }

  test("frame sampling is evenly spaced and bounded") {
    val df = Seq((120L), (0L)).toDF("frames")
    val out = df.select(Multimodal.sampleFrameIndices(col("frames"), 4)).collect()
    assert(out(0).getSeq[Long](0) == Seq(0L, 30L, 60L, 90L))
    assert(out(1).getSeq[Long](0).isEmpty)
  }

  test("aHash: identical images hash equal; banded Hamming pairs are exact") {
    // identical payloads => Hamming 0; a one-char edit in the rendered
    // text perturbs few grid cells; an unrelated text lands far away
    val base = "the quick brown fox jumps over the lazy dog 0123456789"
    val near = "the quick brown fox jumps over the lazy dog 0123456788"
    val far = "ZZZZ!!!!    @@@@####    aaaa;;;;    ....||||    ~~~~&&&&"
    val df = Seq(
      (1L, Multimodal.syntheticPng(base)),
      (2L, Multimodal.syntheticPng(base)), // exact image dup of 1
      (3L, Multimodal.syntheticPng(near)),
      (4L, Multimodal.syntheticPng(far))).toDF("id", "media")
    val hashed = Multimodal.imageAHash(df, "media")
    val ph = hashed.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ph.values.forall(p => p != null && p.length == 64 &&
      p.forall(c => c == '0' || c == '1')))
    assert(ph(1L) == ph(2L)) // identical payload => identical fingerprint
    val ham = (a: String, b: String) => a.zip(b).count(x => x._1 != x._2)
    val pairs = Multimodal.phashNearDupPairs(hashed, "id", "phash",
      maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0L)
    // the released pair set is EXACTLY the <=7-Hamming pairs (pigeonhole
    // recall + exact verify): check every pair against the raw distance
    val ids = Seq(1L, 2L, 3L, 4L)
    for (a <- ids; b <- ids if a < b) {
      val d = ham(ph(a), ph(b))
      assert(pairs.contains((a, b)) == (d <= 7),
        s"pair ($a, $b) at Hamming $d: released=${pairs.contains((a, b))}")
      if (d <= 7) assert(pairs((a, b)) == d.toLong)
    }
    // pigeonhole contract enforced: a radius past bands-1 fails loud
    val e = intercept[IllegalArgumentException](
      Multimodal.phashNearDupPairs(hashed, "id", "phash",
        maxHamming = 8, bands = 8))
    assert(e.getMessage.contains("pigeonhole"), e.getMessage)
    // NULL fingerprints (undecodable payloads) fail loud
    val withNull = hashed.unionByName(
      Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "media")
        .withColumn("phash", lit(null).cast("string")))
    val e2 = intercept[Exception](Multimodal.phashNearDupPairs(withNull,
      "id", "phash", 7, 8).collect())
    assert(SparkTestSession.chainMsg(e2).contains("NULL fingerprint"))
  }
}
