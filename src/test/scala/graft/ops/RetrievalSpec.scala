package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def q(terms: (Long, String)*) = terms.toDF("query_id", "term")

  test("bm25TopK matches the hand-computed scaled integral scores") {
    // N=4, totlen=9 (the NULL-text doc counts toward N with dl=0);
    // df(apple)=df(banana)=2 => idf = floor(log2(4 div 2)) = 1.
    // contrib = (1e6*idf*22*totlen*tf) div (10*totlen*tf + 3*totlen + 9*dl*N)
    val docs = Seq(
      (1L, "apple banana apple"), // dl=3
      (2L, "apple cherry"), // dl=2
      (3L, "banana banana banana banana"), // dl=4
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      q(0L -> "apple", 0L -> "banana"), "query_id", "term", k = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("score"), r.getAs[Long]("n_terms"), r.getAs[Long]("rk"))))
      .toMap
    // doc1: apple tf=2: 396000000 div 315 = 1257142; banana tf=1:
    //       198000000 div 225 = 880000 => 2137142
    assert(out(1L) == ((2137142L, 2L, 1L)))
    // doc3: banana tf=4: 792000000 div 531 = 1491525
    assert(out(3L) == ((1491525L, 1L, 2L)))
    // doc2: apple tf=1: 198000000 div 189 = 1047619
    assert(out(2L) == ((1047619L, 1L, 3L)))
    assert(!out.contains(4L)) // no tokens, no match
  }

  test("bm25TopK: idf saturates to 0 for terms in more than half the corpus") {
    // df(x)=3 of N=3 => 3 div 3 = 1 => idf=0: matched docs keep their
    // n_terms row but contribute score 0; ranking falls to the doc-id
    // tiebreak below the one real match
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x y")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      q(0L -> "x", 0L -> "y"), "query_id", "term", k = 5)
      .collect().map(r => (r.getAs[Long]("rk"),
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score")))).toMap
    assert(out(1L)._1 == 3L && out(1L)._2 > 0L) // y: df=1, idf=1
    assert(out(2L) == ((1L, 0L))) // idf=0 arms, doc-id tiebreak
    assert(out(3L) == ((2L, 0L)))
  }

  test("bm25TopK: dl normalization ranks the shorter doc first at equal tf") {
    // N=4, totlen=8, df(a)=2 => idf=1; tf=1 both; num=176000000
    // d1 dl=2: den=176 => 1000000 ; d2 dl=4: den=248 => 709677
    val docs = Seq((1L, "a b"), (2L, "a b c d"), (3L, "zzz"), (4L, "www"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      q(0L -> "a"), "query_id", "term", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score"))
      .toMap
    assert(out == Map(1L -> 1000000L, 2L -> 709677L))
  }

  test("bm25TopK: absent query terms match nothing; empty corpus fails loud") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      q(0L -> "nosuchterm"), "query_id", "term", k = 3).count() == 0L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(empty, "doc_id", "text",
        q(0L -> "a"), "query_id", "term", k = 3)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("rrfFuse matches the hand-computed reciprocal-rank sums") {
    // A: i1@1, i2@2 ; B: i2@1, i3@2 (same query)
    // 1e6 div 61 = 16393, 1e6 div 62 = 16129
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L)).toDF("qid", "item", "r")
    val b = Seq((0L, 20L, 1L), (0L, 30L, 2L)).toDF("qid", "item", "r")
    val out = Retrieval.rrfFuse(Seq(a, b), "qid", "item", "r", k = 10)
      .collect().map(r => (r.getAs[Long]("rk"),
        (r.getAs[Long]("item_id"), r.getAs[Long]("rrf_score"),
          r.getAs[Long]("n_lists"), r.getAs[Long]("best_rank"))))
      .toMap
    assert(out(1L) == ((20L, 32522L, 2L, 1L))) // both lists: 16129+16393
    assert(out(2L) == ((10L, 16393L, 1L, 1L)))
    assert(out(3L) == ((30L, 16129L, 1L, 2L)))
  }

  test("rrfFuse: equal scores break ties by ascending item id") {
    val a = Seq((0L, 50L, 1L), (0L, 7L, 1L)).toDF("qid", "item", "r")
    // two separate queries' rank-1 rows cannot tie-break across queries
    val out = Retrieval.rrfFuse(Seq(a), "qid", "item", "r", k = 10)
      .collect().map(r => r.getAs[Long]("rk") -> r.getAs[Long]("item_id"))
      .toMap
    assert(out == Map(1L -> 7L, 2L -> 50L))
  }

  test("rrfFuse fails loud on a duplicate (query, item) row within one frame") {
    // item 20 listed TWICE by frame a (ranks 2 and 3): without the check
    // its rrf_score would silently sum both reciprocal ranks
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 20L, 3L)).toDF("qid", "item", "r")
    val b = Seq((0L, 20L, 1L)).toDF("qid", "item", "r")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(a, b), "qid", "item", "r", k = 10).collect()
    }
    assert(e.getMessage.contains("duplicate"))
    // the duplicate must trip even when the duplicated item ranks BELOW
    // the fused top-k cut (k = 1 keeps only item 10 here)
    val a2 = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 20L, 3L)).toDF("qid", "item", "r")
    val e2 = intercept[Exception] {
      Retrieval.rrfFuse(Seq(a2), "qid", "item", "r", k = 1).collect()
    }
    assert(e2.getMessage.contains("duplicate"))
    // the same item in DIFFERENT frames is the normal fusion case — no trip
    val ok = Retrieval.rrfFuse(
      Seq(Seq((0L, 20L, 1L)).toDF("qid", "item", "r"),
        Seq((0L, 20L, 2L)).toDF("qid", "item", "r")),
      "qid", "item", "r", k = 5).collect()
    assert(ok.length == 1 && ok.head.getAs[Long]("n_lists") == 2L)
  }

  test("bm25TopK: materializeTokens = false yields identical results") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana banana banana"), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val qs = q(0L -> "apple", 0L -> "banana")
    def rows(m: Boolean) = Retrieval.bm25TopK(docs, "doc_id", "text",
      qs, "query_id", "term", k = 5, materializeTokens = m)
      .collect().map(_.toSeq).toSet
    assert(rows(true) == rows(false))
  }

  test("rrfFuse fails loud on NULL or non-positive ranks") {
    val bad = Seq((0L, 1L, 0L)).toDF("qid", "item", "r")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(bad), "qid", "item", "r", k = 5).collect()
    }
    assert(e.getMessage.contains("rrfFuse"))
    val withNull = Seq((0L, 1L, Some(2L)), (0L, 2L, None))
      .toDF("qid", "item", "r")
    val e2 = intercept[Exception] {
      Retrieval.rrfFuse(Seq(withNull), "qid", "item", "r", k = 5).collect()
    }
    assert(e2.getMessage.contains("rrfFuse"))
  }

  test("rankingMetrics matches hand-computed recall/MRR/nDCG") {
    // query 1: relevant {10, 11, 12}; retrieved top-4 = 10(rk1), 20(rk2),
    // 11(rk3), 21(rk4) -> found 2/3, first relevant at 1, DCG = d1 + d3
    // query 2: relevant {30}; retrieved 40, 41 (none relevant) -> zeros
    // query 3: relevant {50} but NOT retrieved at all -> zeros row
    val results = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 11L, 3L), (1L, 21L, 4L),
      (2L, 40L, 1L), (2L, 41L, 2L),
      (9L, 50L, 5L) // rank past k: ignored entirely
    ).toDF("q", "item", "rk")
    val relevant = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 30L), (3L, 50L),
      (1L, 10L) // duplicate relevance row: deduplicated
    ).toDF("q", "item")
    val out = Retrieval.rankingMetrics(results, relevant, "q", "item", "rk", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val d = Retrieval.ndcgDiscounts(4)
    // query 1: n_rel 3, found 2, mrr 1e6/1, ndcg = 1e6*(d1+d3)/(d1+d2+d3)
    assert(out(1L) == ((3L, 2L, 1000000L,
      1000000L * (d(0) + d(2)) / (d(0) + d(1) + d(2)))), out(1L).toString)
    assert(out(2L) == ((1L, 0L, 0L, 0L)))
    assert(out(3L) == ((1L, 0L, 0L, 0L)))
    // discount table sanity: d1 = 1e6 (log2 2 = 1), strictly decreasing
    assert(d.head == 1000000L && d == d.sorted.reverse && d.distinct == d)
    // INDEPENDENT value anchor (r13 entry-tier review): the discount
    // literals are the one shared-constants table where the oracle is
    // GENERATED from the implementation (retrieval_metrics embeds
    // ndcgDiscounts verbatim), so a wrong formula would be invisible to
    // the gate — these ten values are floor(1e6/log2(i+1)) computed
    // independently, not via the implementation
    assert(graft.ops.Retrieval.ndcgDiscounts(10) == Seq(1000000L, 630929L,
      500000L, 430676L, 386852L, 356207L, 333333L, 315464L, 301029L,
      289064L))
    // NULL/non-positive rank fails loud
    val bad = Seq((1L, 10L, 0L)).toDF("q", "item", "rk")
    val e = intercept[Exception](
      Retrieval.rankingMetrics(bad, relevant, "q", "item", "rk", 4).collect())
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("positive"),
      graft.spark.SparkTestSession.chainMsg(e).take(200))
    intercept[IllegalArgumentException](
      Retrieval.rankingMetrics(results, relevant, "q", "item", "rk", 0))
  }
}
