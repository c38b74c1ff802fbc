package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** corpus-ops / sampling / IO-layout / sketch / graph tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntryCorpus {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) => {
      // domain-authority PageRank over a planted link graph: each doc's
      // footer links site-{id%37} -> site-{(3id+1)%37} (a 37-node
      // permutation cycle) and site-{id%37} -> cdn-{id%11} (11 dangling
      // sinks) — REAL url extraction feeds the edge builder, and the
      // fixed-point integer PageRank (5 rounds, damping 17/20, dangling
      // mass redistributed) replays BIT-FOR-BIT in the unrolled oracle,
      // dangling branch exercised live.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", concat(
          lit("https://site-"), (col("doc_id") % 37).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string"),
          lit(" https://site-"), ((col("doc_id") * 3 + 1) % 37).cast("string"),
          lit(".example.com/q/"), col("doc_id").cast("string"),
          lit(" https://cdn-"), (col("doc_id") % 11).cast("string"),
          lit(".example.org/a/"), col("doc_id").cast("string")))
      val doms = docs.select(
        transform(TextAnalysis.extractUrls(col("body")),
          u => regexp_extract(u, "https?://([^/ \\t\\n\\f\\r]+)", 1)).as("d"))
      val edges = doms.select(
        element_at(col("d"), 1).as("src"),
        explode(array(element_at(col("d"), 2), element_at(col("d"), 3))).as("dst"))
      GraphOps.pageRank(edges, "src", "dst", iters = 5)
        .select(col("node").as("domain"), col("rank_scaled"), col("rank"))
    }),
    "sample_split" -> ((s, dir) => {
      // deterministic train/val/test split by portable md5 bucket — stable
      // membership, engine-independent, zero shuffle; profiled per source
      CorpusOps.hashSplit(
        readParquet(s, s"$dir/documents.parquet"), "doc_id")
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    }),
    "sample_mixture" -> ((s, dir) => {
      // deterministic pretraining-mixture application: per-source keep
      // rates via the salted portable hash (zero shuffle, growth-stable
      // membership); dyadic rates (quarters) and integerized thresholds so
      // the oracle reproduces the exact kept set. Rolled up per source.
      val rates = (0 until 20).map(i => s"src$i" -> ((i % 4) + 1) * 0.25).toMap
      CorpusOps.applyMixture(
          readParquet(s, s"$dir/documents.parquet"), "source", "doc_id",
          rates, defaultRate = 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
    }),
    "sample_stratified" -> ((s, dir) => {
      // deterministic stratified sample: exactly 40 orders per order
      // priority, chosen as the smallest md5(o_orderkey) — portable hash
      // order, bounded bottom-k partial aggregate (never a per-stratum
      // window sort).
      CorpusOps.stratifiedSample(
        readParquet(s, s"$dir/orders.parquet"), "o_orderpriority", "o_orderkey", k = 40)
    }),
    "approx_percentiles" -> ((s, dir) => {
      // mergeable quantile sketch (percentile_approx = Greenwald-Khanna
      // summaries, partial-merged map-side like every sketch here),
      // flattened to one row per (event_type, percentile) — scalar columns
      // only. The sketch's value is merge-order dependent, so the hashed
      // columns are the EXACT interpolated percentile plus a GK-guarantee
      // certificate in RANK space (value-space bounds break when the group
      // is small enough that one rank step exceeds the eps window): the
      // sketch value's true rank interval must intersect
      // [p*n - 2eps*n, p*n + 2eps*n] +- 1 (eps = 1/accuracy = 1/1000,
      // doubled for slack). within_bound flips false on accuracy collapse
      // and breaks the oracle hash, so the probe is part of the verified
      // row — strictly stronger than the old rows-only form.
      val ev = events(s, dir).withColumn("v", floor(col("value")).cast("double"))
      val g = ev.groupBy("event_type")
        .agg(
          percentile_approx(col("v"), expr("array(0.5D, 0.9D, 0.99D)"), lit(1000))
            .cast("array<double>").as("approx"),
          expr("percentile(v, array(0.5D, 0.9D, 0.99D))").as("exact"),
          count(lit(1)).as("n_events"))
      val probes = g.select(col("event_type"), col("n_events"),
          posexplode(arrays_zip(col("approx"), col("exact"))).as(Seq("pos", "z")))
        .select(col("event_type"), col("n_events"),
          element_at(array(lit(0.5), lit(0.9), lit(0.99)), col("pos") + 1).as("pct"),
          col("z.approx").as("approx_v"), col("z.exact").as("exact_pct"))
      // rank the sketch value back in the data (one broadcast join of the
      // 3*|event_type| probe rows against the scan): the certificate is
      // rank-space, so it holds at ANY group size — [cnt_lt+1, cnt_le] (the
      // sketch value's true rank interval) must intersect the guarantee
      // window [p*n - 2eps*n - 1, p*n + 2eps*n + 1]
      val ranked = ev.select(col("event_type"), col("v"))
        .join(broadcast(probes), Seq("event_type"))
        .groupBy("event_type", "pct", "exact_pct", "n_events", "approx_v")
        .agg(sum(when(col("v") < col("approx_v"), 1L).otherwise(0L)).as("cnt_lt"),
          sum(when(col("v") <= col("approx_v"), 1L).otherwise(0L)).as("cnt_le"))
      val nD = col("n_events").cast("double")
      val loT = ceil((col("pct") - lit(0.002)) * nD) - lit(1L)
      val hiT = floor((col("pct") + lit(0.002)) * nD) + lit(2L)
      ranked.select(col("event_type"), col("pct"), col("exact_pct"),
        col("n_events"), loT.as("rank_lo_target"), hiT.as("rank_hi_target"),
        (col("cnt_le") >= loT && (col("cnt_lt") + lit(1L)) <= hiT)
          .as("within_bound"))
    }),
    "approx_distinct_users" -> ((s, dir) => {
      // HLL++ mergeable sketches — the 100 TB distinct-count path (per-shard
      // sketches, union, estimate; no exact-distinct shuffle). Estimates are
      // engine-specific => rows-only; the query carries its own error probe
      // against the exact count and CorpusOpsSpec bounds the relative error.
      events(s, dir).groupBy("event_type").agg(
          approx_count_distinct("user_id", 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .withColumn("rel_err",
          abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users").cast("double"))
    }),
    "approx_distinct_md5" -> ((s, dir) => {
      // the ORACLE-EXACT twin of approx_distinct_users: portable md5 HLL
      // (p=6, exact integer bucket mass, piecewise estimator incl. the
      // linear-counting small-range branch) whose bucket maxima AND
      // estimate replay bit-exactly in DuckDB SQL — the sketch path itself
      // gets a hash-verified row, anchoring the engine-specific
      // approx_count_distinct / DataSketches variants.
      Sketches.hllPortable(events(s, dir), "event_type", "user_id")
        .select(col("group").as("event_type"), col("approx_distinct"),
          col("t_scaled"))
    }),
    "approx_sketch_union_md5" -> ((s, dir) => {
      // oracle-exact twin of approx_sketch_union: per-day PORTABLE HLL
      // sketch rows (a persistable (event_type, day, bucket, mx) frame),
      // unioned by max-per-bucket into per-type estimates — the
      // store-sketches-merge-later pattern with every step SQL-replayable.
      // Distributivity of max makes the union path provably equal to the
      // direct sketch (SketchesSpec pins it); here the gate verifies the
      // two-stage plumbing end to end against the same closed form.
      val perDay = Sketches.hllPortableSketch(
        events(s, dir).withColumn("day", tsDay),
        Seq("event_type", "day"), "user_id")
      Sketches.hllPortableEstimate(perDay, Seq("event_type"))
    }),
    "approx_heavy_hitters" -> ((s, dir) => {
      // Misra-Gries frequent items per event type: bounded k-counter state
      // per (group, task), <= k rows per task on the exchange — the
      // dominant-items analysis exact count-then-sort cannot do at scale.
      // Estimates are merge-order dependent => rows-only; the exact join
      // carries the error probe (|est - exact| <= n/(k+1) by construction)
      // and SketchesSpec proves the guarantee property.
      val ev = events(s, dir).select(col("event_type"), col("user_id"))
      val hh = Sketches.heavyHitters(ev, "event_type", "user_id", k = 16)
      val exact = ev.groupBy(col("event_type").as("group"),
          col("user_id").cast("string").as("item"))
        .agg(count(lit(1)).as("exact_count"))
      hh.join(exact, Seq("group", "item"), "left")
        .withColumn("abs_err", abs(col("est_count") - col("exact_count")))
    }),
    "approx_heavy_hitters_exact" -> ((s, dir) => {
      // oracle-exact twin for approx_heavy_hitters: the true per-group
      // top-16 items by exact count (count desc, item asc — a strict
      // total order, so the cut is deterministic). This pins the exact
      // side the Misra-Gries estimate is probed against.
      import org.apache.spark.sql.expressions.Window
      val exact = events(s, dir)
        .groupBy(col("event_type").as("grp"),
          col("user_id").cast("string").as("item"))
        .agg(count(lit(1)).as("exact_count"))
      val w = Window.partitionBy("grp")
        .orderBy(col("exact_count").desc, col("item").asc)
      exact.withColumn("rk", row_number().over(w)).filter(col("rk") <= 16)
    }),
    "approx_sketch_union" -> ((s, dir) => {
      // the store-sketches-merge-later pattern: per-day DataSketches HLL
      // sketches (persistable binaries in a real pipeline), then a SECOND
      // aggregation unions the day sketches into per-type totals — distinct
      // counting over any rollup without ever re-touching raw data. Sketch
      // estimates are engine-specific => rows-only; the in-query exact
      // columns carry the error probe and CorpusOpsSpec bounds it.
      val perDay = events(s, dir).withColumn("day", tsDay)
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id").cast("string"), lit(14)).as("sk"),
          countDistinct(col("user_id")).as("exact_day_users"))
      perDay.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
          sum("exact_day_users").as("sum_day_exact"),
          count(lit(1)).cast("long").as("n_days"))
    }),
    "approx_cms_md5" -> ((s, dir) => {
      // portable Count-Min sketch: d=3 salted md5 rows x w=128 counters per
      // event type, probed at the 5 highest-frequency users per type
      // (deterministic row_number tie-break). est_count >= exact_count by
      // construction (each counter sums a superset of the item's
      // occurrences) — overcount IS the collision error — and, like the
      // portable HLL, the whole sketch (salted bucketing, integer counters,
      // min-of-rows estimate) replays bit-exactly in the DuckDB oracle, so
      // the sketch path itself is hash-verified rather than engine-opaque.
      // Scale shape: sketch build is one map-side-combined agg to <= d*w
      // rows per type; the probe join broadcasts the sketch.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("group").orderBy(col("exact_count").desc, col("item").asc)
      val ev = events(s, dir).select(col("event_type").as("group"),
        col("user_id").cast("string").as("item"))
      val sk = Sketches.cmsSketch(ev, "group", "item", d = 3, w = 128)
      val top = ev.groupBy("group", "item").agg(count(lit(1)).as("exact_count"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5).drop("rk")
      Sketches.cmsEstimate(sk, top.select("group", "item"), d = 3, w = 128)
        .join(top, Seq("group", "item"))
        .select(col("group").as("event_type"), col("item").as("user_id"),
          col("est_count"), col("exact_count"),
          (col("est_count") - col("exact_count")).as("overcount"))
    }),
    "approx_theta_overlap" -> ((s, dir) => {
      // KMV/theta sketch SET ALGEBRA over event-type user sets — the
      // capability HLL trades away: per event-type pair, distinct-user
      // union and intersection estimates from 64-hash bottom-k sketches,
      // next to the exact values (|est - exact| is the real KMV error,
      // visible per row). The whole construction — salted md5 bottom-k,
      // merged-sketch theta, rho/theta and (k-1)/U_(k) estimators, exact
      // degradation when the merged set fits under k — replays bit-exactly
      // in the oracle. Sketch build is one map-side-combined aggregation
      // with <= 64 longs of state per task; the pair stage only ever
      // touches sketch rows.
      val k = 64
      val ev = events(s, dir).select(col("event_type").as("group"),
        col("user_id").cast("string").as("item"))
      val est = Sketches.kmvPairOverlap(ev, "group", "item", k)
      val dist = Sketches.kmvDistinct(Sketches.kmvSketch(ev, "group", "item", k), k)
      val exact = ev.distinct()
      val exN = exact.groupBy("group").agg(count(lit(1)).as("exact_n"))
      val exInt = exact.select(col("group").as("ga"), col("item"))
        .join(exact.select(col("group").as("gb"), col("item")), "item")
        .filter(col("ga") < col("gb"))
        .groupBy("ga", "gb").agg(count(lit(1)).as("exact_intersect0"))
      est
        .join(dist.select(col("group").as("ga"), col("est_distinct").as("est_a")), "ga")
        .join(dist.select(col("group").as("gb"), col("est_distinct").as("est_b")), "gb")
        .join(exN.select(col("group").as("ga"), col("exact_n").as("exact_a")), "ga")
        .join(exN.select(col("group").as("gb"), col("exact_n").as("exact_b")), "gb")
        .join(exInt, Seq("ga", "gb"), "left")
        .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
          col("est_union"), col("est_intersect"),
          col("exact_a"), col("exact_b"),
          (col("exact_a") + col("exact_b")
            - coalesce(col("exact_intersect0"), lit(0L))).as("exact_union"),
          coalesce(col("exact_intersect0"), lit(0L)).as("exact_intersect"))
    }),
    "corpus_report" -> ((s, dir) => {
      // the data-card rollup: corpus-level facts a release review reads
      // first (volume, source/lang spread, exact-dup mass, token budget,
      // URL incidence) — all exact integer arithmetic in one scan plus one
      // distinct-text aggregate, so the whole card is oracle-verifiable.
      // The fixture corpus carries no URLs, so every 10th doc gets a
      // deterministic footer URL (the text_url_domains construction) —
      // otherwise the URL column would be vacuously 0 == 0 in both engines
      // and its extraction logic never actually gate-checked.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("body", when(col("doc_id") % 10 === 0,
            concat(coalesce(col("text"), lit("")), lit(" https://card-"),
              (col("doc_id") % 7).cast("string"), lit(".example.com/d")))
          .otherwise(coalesce(col("text"), lit(""))))
      docs.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_exact_dup_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(when(size(TextAnalysis.extractUrls(col("body"))) > 0, 1L)
          .otherwise(0L)).as("n_docs_with_urls"))
    }),
    "io_bucketed_join" -> ((s, dir) => {
      // bucketed CO-LOCATED join: both sides stored once as bucketed +
      // sorted parquet tables, then merge-joined with zero exchange and
      // zero per-query sort (spec-asserted plan shape) — the amortized
      // layout for repeatedly-joined fact tables at corpus scale. The
      // rollup result is the plain join's, oracle-exact.
      val tmp = scratchDir("bucketed_join")
      val ords = readParquet(s, s"$dir/orders.parquet")
        .select("o_custkey", "o_totalprice")
      val cust = readParquet(s, s"$dir/customer.parquet")
        .select("c_custkey", "c_mktsegment")
      Dataflow.bucketedJoin(ords, cust, "o_custkey", "c_custkey",
          nBuckets = 8, tmp, "g_bucketed")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }),
    "io_range_export" -> ((s, dir) => {
      // globally-sorted range-partitioned export (repartitionByRange +
      // local sort): rows-only because RangePartitioner boundary sampling
      // is engine-internal, with the written-files manifest self-checked
      // in-query (overlap_violations must be 0, n_total must cover the
      // corpus — both contract-pinned).
      val tmp = scratchDir("range_export")
      CorpusOps.exportRangeSorted(
        readParquet(s, s"$dir/orders.parquet")
          .select("o_orderkey", "o_totalprice"),
        "o_totalprice", tmp, nParts = 16)
    }),
    "io_range_export_bounds" -> ((s, dir) => {
      // the EXPLICIT-boundary twin (r19): equal-width buckets over
      // o_totalprice replace RangePartitioner's sampled boundaries, so
      // the per-file manifest — (part, n_rows, key min/max) plus the
      // overlap/coverage probes — is a pure function of orders and the
      // whole write/roll/read-back chain replays in SQL. Anchors the
      // machinery io_range_export shares (route -> per-partition sort ->
      // dynamic-partition write -> manifest from the files just written).
      val tmp = scratchDir("range_export_bounds")
      CorpusOps.exportRangeBounded(
        readParquet(s, s"$dir/orders.parquet")
          .select("o_orderkey", "o_totalprice"),
        "o_totalprice", tmp, lo = 0.0, width = 37500.0, nParts = 16)
    }),
    "io_roundtrip" -> ((s, dir) => {
      // the IO layer inside the gate: CorpusIO write -> read roundtrips in
      // two formats (hive-partitioned parquet with bounded files; jsonl
      // with the explicit schema the reader requires), rolled up per
      // (format, lang) — counts and sums must survive both roundtrips.
      import graft.sources.CorpusIO
      // per-process scratch, wiped on entry: the returned frame reads from
      // it LAZILY, so deletion after return would break the consumer —
      // instead reps/gate runs overwrite one bounded copy
      val tmp = scratchDir("io_roundtrip")
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
      CorpusIO.write(docs, s"$tmp/p", format = "parquet",
        mode = org.apache.spark.sql.SaveMode.Overwrite,
        partitionBy = Seq("lang"), maxRecordsPerFile = 200)
      CorpusIO.write(docs, s"$tmp/j", format = "jsonl",
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      val p = CorpusIO.read(s, s"$tmp/p")
        .withColumn("format", lit("parquet"))
      val j = CorpusIO.read(s, s"$tmp/j", format = "jsonl",
          schema = Some(docs.schema))
        .withColumn("format", lit("jsonl"))
      p.unionByName(j)
        .groupBy("format", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    }),
    "io_warc_roundtrip" -> ((s, dir) => {
      // WARC ingestion (r17): the CommonCrawl source format. 50 docs
      // (doc_id < 50 — deterministic, a BOUNDED driver collect, the
      // io_export_shards accepted cost) serialize into a plain .warc
      // AND a per-record-gzip-member .warc.gz (the crawl convention),
      // both read back DISTRIBUTED through readWarc; the release pins
      // every parsed field + the payload md5 per (source file, record).
      // The oracle replays from documents directly — a parse/format/
      // gzip defect anywhere breaks the hash.
      import graft.sources.WarcIO
      val tmp = scratchDir("warc_roundtrip")
      val rows = readParquet(s, s"$dir/documents.parquet")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")).collect()
        .sortBy(_.getLong(0))
      val recs = rows.map { r =>
        WarcIO.WarcRecord("", "resource", s"doc://${r.getLong(0)}",
          "2026-01-01T00:00:00Z", s"urn:graft:${r.getLong(0)}",
          "text/plain", -1L, r.getString(1).getBytes("UTF-8"))
      }.toSeq
      new java.io.File(tmp).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/part0.warc"), WarcIO.warcBytes(recs))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/part0.warc.gz"),
        WarcIO.gzipPerRecord(recs))
      WarcIO.readWarc(s, s"$tmp/*.warc*")
        .select(
          when(col("file").endsWith(".gz"), "gz").otherwise("plain")
            .as("archive"),
          col("warc_type"), col("target_uri"), col("warc_date"),
          col("record_id"), col("content_type"), col("content_length"),
          md5(col("payload")).as("payload_md5"))
    }),
    "io_warc_http_extract" -> ((s, dir) => {
      // the crawl text chain's NEXT step (r17): WARC `response` records
      // carry raw HTTP responses; httpParts splits status/content-type/
      // body with pure column expressions. 50 docs wrap as HTTP
      // (doc_id % 7 == 0 -> 404 text/plain, else 200 text/html with a
      // minimal html body), round-trip through a per-member .warc.gz,
      // and the release pins (record_id, status, content_type, body
      // md5) — the oracle rebuilds the identical payloads from source.
      import graft.sources.WarcIO
      val tmp = scratchDir("warc_http")
      val rows = readParquet(s, s"$dir/documents.parquet")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text")).collect()
        .sortBy(_.getLong(0))
      val recs = rows.map { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 7 == 0)
            "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" +
              r.getString(1)
          else
            "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
              "\r\nServer: graft\r\n\r\n" +
              s"<html><body>${r.getString(1)}</body></html>"
        WarcIO.WarcRecord("", "response", s"doc://$id",
          "2026-01-01T00:00:00Z", s"urn:graft:$id",
          "application/http;msgtype=response", -1L,
          payload.getBytes("UTF-8"))
      }.toSeq
      new java.io.File(tmp).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/p.warc.gz"),
        WarcIO.gzipPerRecord(recs))
      WarcIO.readWarc(s, s"$tmp/*.warc.gz")
        .select(col("record_id"),
          WarcIO.httpParts(col("payload")).as("h"))
        .select(col("record_id"), col("h.status").as("status"),
          col("h.content_type").as("content_type"),
          md5(col("h.body").cast("binary")).as("body_md5"))
    }),
    "sample_weighted" -> ((s, dir) => {
      // weighted sample without replacement: 100 docs, inclusion odds
      // proportional to length (priority sampling — w/u with a portable
      // md5 uniform; division-only math, so the priorities themselves are
      // bit-reproducible in the oracle).
      CorpusOps.weightedSample(
        readParquet(s, s"$dir/documents.parquet")
          .select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100)
    }),
    "corpus_budget_select" -> ((s, dir) => {
      // token-budget fill: rank by a planted portable quality score
      // (Knuth-hash of doc_id — the fixture has no score column; the oracle
      // replays the same planting) and keep the best-first prefix within
      // 40% of the corpus' total chars. Budget comes from a one-row
      // pre-aggregate, so the query is scale-proportional at any sf.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"),
          ((col("doc_id") * 2654435761L) % 1000).cast("double")./(1000.0)
            .as("score"))
      val total = docs.agg(sum("n_chars")).collect()(0).getLong(0)
      CorpusOps.budgetSelect(docs, "doc_id", "n_chars", "score",
          budget = total * 2 / 5)
        .withColumnRenamed("id", "doc_id")
    }),
    "io_cdc_merge" -> ((s, dir) => {
      // CDC ingest merge: base snapshot + deterministic update batch
      // (every 5th doc re-versioned with a payload change, every 7th
      // tombstoned at a higher version), last-writer-wins compaction via
      // the argmax aggregate (one map-side-combined shuffle, no window
      // sort), tombstone winners dropped. The oracle replays the same
      // union with a row_number window — same rows, independent plan.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "n_chars")
      val base = docs
        .withColumn("version", lit(1L)).withColumn("deleted", lit(false))
      val upserts = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
        .withColumn("version", lit(2L)).withColumn("deleted", lit(false))
      val tombstones = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("version", lit(3L)).withColumn("deleted", lit(true))
      CorpusOps.mergeUpsert(base, upserts.unionByName(tombstones),
          Seq("doc_id"), "version", deleteCol = Some("deleted"))
        .select("doc_id", "version", "n_chars")
    }),
    "io_snapshot_diff" -> ((s, dir) => {
      // DATASET-VERSIONING diff (r18): two snapshot views of documents —
      // the refresh modifies every 5th doc's n_chars, drops every 7th,
      // and adds a shifted-id copy of every 11th — and snapshotDiff
      // releases one row per id with its status plus the old/new
      // compared value (the audit between ingest versions; added ∪
      // changed is the incremental-reprocess input). Replayed as a full
      // outer join with the same null-safe comparison.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
      val old = docs
      val neu = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("n_chars", when(col("doc_id") % 5 === 0,
          col("n_chars") + 1000L).otherwise(col("n_chars")))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars")))
      // -1 sentinels, not NULLs: the gate's exact row compare treats
      // NULL as never-equal (the engine keeps real NULL structs)
      CorpusOps.snapshotDiff(old, neu, "doc_id", Seq("n_chars"))
        .select(col("doc_id"), col("diff_status"),
          coalesce(col("__old.n_chars"), lit(-1L)).as("old_n_chars"),
          coalesce(col("__new.n_chars"), lit(-1L)).as("new_n_chars"))
    }),
    "io_export_shards" -> ((s, dir) => {
      // the pipeline's last mile: deterministic 16-shard export (portable
      // md5 shard assignment, (hash, id)-ordered shard contents) with a
      // manifest computed from the files just WRITTEN — counts, payload,
      // and an order-free xor checksum per shard, all SQL-replayable.
      // Same per-process scratch discipline as io_roundtrip (lazy readers).
      val tmp = scratchDir("export_shards")
      CorpusOps.exportShards(
        readParquet(s, s"$dir/documents.parquet")
          .select("doc_id", "text", "n_chars"),
        "doc_id", "n_chars", tmp, nShards = 16)
    }),
    "io_warc_export" -> ((s, dir) => {
      // DISTRIBUTED WARC export (r18 — the re-crawl last mile; the
      // roundtrip row's driver-side writer stops at gate fixtures):
      // every documents row serializes TASK-side into size-bounded
      // per-record-gzip-member .warc.gz shards — md5 shard split on
      // record_id, archives rolling at 8 KiB of payload via the
      // prefix-sum rule, so every record's (shard, seq) assignment is
      // a deterministic SQL-replayable function of the data. The
      // archives then read BACK distributed and every record releases
      // its fields + payload md5 + the (shard, seq) parsed from the
      // file it actually landed in; the oracle replays all of it from
      // documents alone — a defect anywhere in the write/roll/read
      // chain breaks the hash.
      import graft.sources.WarcIO
      val tmp = exportedWarcShards(s, dir, "warc_export")
      WarcIO.readWarc(s, s"$tmp/shard=*/*.warc.gz")
        .select(col("record_id"), col("target_uri"), col("content_length"),
          md5(col("payload")).as("payload_md5"),
          regexp_extract(col("file"), "shard=(\\d+)", 1).cast("int")
            .as("shard"),
          regexp_extract(col("file"), "part-(\\d+)", 1).cast("long")
            .as("seq"))
    }),
    "corpus_prep" -> ((s, dir) => {
      // the fused end-to-end prep filter: every quality signal (token stats,
      // Gopher repetition, stopword ratio, language id) in ONE scan
      // projection + a deterministic keep/drop rule with drop_reason.
      CorpusOps.prepPipeline(
        readParquet(s, s"$dir/documents.parquet").select("doc_id", "text"),
        "doc_id", "text")
    }),
    "corpus_crawl_prep" -> ((s, dir) => {
      // the FUSED CommonCrawl chain (r18), every stage the REAL
      // operator: documents wrap as HTTP responses (404 plain for
      // doc_id % 7 == 0, else 200 html), export DISTRIBUTED via
      // writeWarcShards, read back via readWarc, split via httpParts,
      // strip via htmlStrip, and score/filter via the SAME prepPipeline
      // rules as corpus_prep. The fixture corpus is tag-, entity- and
      // multi-space-free, so the strip of <html><body>text</body></html>
      // must return text BYTE-EXACTLY — the oracle feeds documents.text
      // straight into the shared prep replay over the 200 arm, and any
      // defect in serialize/gzip/parse/split/strip/score breaks the hash.
      import graft.sources.WarcIO
      val tmp = scratchDir("crawl_prep")
      val body = when(col("doc_id") % 7 === 0,
          concat(lit("HTTP/1.1 404 Not Found\r\nContent-Type: " +
            "text/plain\r\n\r\n"), coalesce(col("text"), lit(""))))
        .otherwise(concat(
          lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
            "charset=utf-8\r\nServer: graft\r\n\r\n<html><body>"),
          coalesce(col("text"), lit("")), lit("</body></html>")))
      val recs = readParquet(s, s"$dir/documents.parquet")
        .select(
          lit("response").as("warc_type"),
          concat(lit("doc://"), col("doc_id")).as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          concat(lit("urn:graft:"), col("doc_id")).as("record_id"),
          lit("application/http;msgtype=response").as("content_type"),
          encode(body, "UTF-8").as("payload"))
      WarcIO.writeWarcShards(recs, tmp, nShards = 4,
        maxPayloadBytesPerArchive = 65536).count()
      val stripped = WarcIO.readWarc(s, s"$tmp/shard=*/*.warc.gz")
        .select(col("record_id"),
          WarcIO.httpParts(col("payload")).as("h"))
        .filter(col("h.status") === 200 &&
          col("h.content_type").startsWith("text/html"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
          graft.ops.TextAnalysis.htmlStrip(col("h.body").cast("string"))
            .as("text"))
      CorpusOps.prepPipeline(stripped, "doc_id", "text")
    }),
    "corpus_c4_filter" -> ((s, dir) => {
      // C4 line+page cleaning (Raffel et al.) over a deterministic planted
      // multi-line body (the fixture corpus is single-line and
      // punctuation-free, so — as with text_url_domains — the query plants
      // the structure and the oracle replicates the construction, while
      // the REAL filter rules run over it): a kept lead line, a too-short
      // line, a rotating-punctuation line, and modular javascript / brace /
      // lorem-ipsum planting that exercises every drop rule.
      val body = concat_ws("\n",
        concat(substring(col("text"), 1, 60), lit(".")),
        lit("short line."),
        concat(substring(col("text"), 61, 60),
          elt(col("doc_id") % 3 + 1, lit("."), lit(""), lit("?"))),
        when(col("doc_id") % 7 === 0,
          lit("Please enable javascript to continue reading.")),
        when(col("doc_id") % 13 === 0, lit("function f() { return 1; }")),
        when(col("doc_id") % 17 === 0, lit("Lorem ipsum dolor sit amet.")))
      CorpusOps.c4Filter(
        readParquet(s, s"$dir/documents.parquet")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
          .withColumn("body", body),
        "body")
        .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
          col("n_sentences"), col("has_brace"), col("has_lorem"), col("keep"),
          md5(col("clean_text")).as("clean_md5"))
    }),
    "sample_temperature" -> ((s, dir) => {
      // temperature-scaled (alpha = 0.5) mixture over a planted 70/20/10
      // skew: rare groups get sqrt-share weight, so g2 keeps a larger
      // fraction of itself than g0. Thresholds are computed IN-PLAN
      // (decimal(38,0) integer arithmetic, bounded-exact sqrt) and the
      // selection is the salted-hash rule — both replayed by the oracle
      // in HUGEINT, so weights, thresholds, and the kept set all
      // hash-match.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("grp", concat(lit("g"),
          when(pmod(col("doc_id"), lit(10)) < 7, lit(0))
            .when(pmod(col("doc_id"), lit(10)) < 9, lit(1))
            .otherwise(lit(2))))
      val thr = CorpusOps.temperatureThresholds(docs, "grp", budgetPpm = 400000L)
      val kept = CorpusOps.applyThresholds(docs, "grp", "doc_id", thr, salt = "#temp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
      // both sides are group-cardinality rows; without the hint the tiny
      // final join planned as a sort-merge (plan-audit finding)
      thr.join(broadcast(kept), Seq("grp"), "left")
        .select(col("grp"), col("n_docs"), col("w"), col("thr"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
    }),
    "corpus_epochs" -> ((s, dir) => {
      // data-constrained epoch repetition (Muennighoff et al. shape):
      // each source replayed toward a 20k-token target as full epochs
      // (capped at 4) plus a deterministic hash-selected fractional
      // epoch; rolled up per source. The explode is a generated sequence
      // — no driver loop, instance count proportional to output tokens.
      CorpusOps.epochRepeat(
          readParquet(s, s"$dir/documents.parquet")
            .select("doc_id", "source", "n_chars"),
          "doc_id", "n_chars", "source", targetTokens = 20000L, maxEpochs = 4)
        .groupBy("source")
        .agg(count(lit(1)).as("n_instances"),
          sum("tokens").cast("long").as("tokens_total"),
          max("epoch").as("max_epoch"))
    }),
    "sample_quota" -> ((s, dir) => {
      // exact-size eval sample: 400 docs total, equal lang shares with
      // integer-waterfill spill (small langs taken whole, surplus
      // redistributed to the big ones) — in-plan window arithmetic over
      // counts, integer end-to-end => the quotas AND the membership are
      // oracle-exact.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("strat", coalesce(col("lang"), lit("??")))
      CorpusOps.quotaSample(docs, "strat", "doc_id", totalK = 400L)
    }),
    "corpus_drift" -> ((s, dir) => {
      // distribution-drift monitor: the events value histogram for days
      // 1-10 vs the rest of the month — the per-ingest check a training
      // pipeline alerts on. Dense 20-bin grid over [0, 500); per-bin
      // cross-multiplied deviation |n_a*tot_b - n_b*tot_a| is exact
      // BIGINT (TV distance = sum/2*tot_a*tot_b caller-side — PSI's ln()
      // is not bit-reproducible across engines, TV ranks drift the same).
      val ev = events(s, dir)
      val cut = 1704931200000000000L // 2024-01-11T00:00:00Z as epoch nanos
      CorpusOps.distributionDrift(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        "value", lo = 0.0, hi = 500.0, buckets = 20)
    }),
    "corpus_drift_mix" -> ((s, dir) => {
      // categorical drift: the language MIX of two corpus snapshots
      // (deterministic even/odd doc_id halves stand in for version A/B) —
      // a category appearing or vanishing surfaces as a one-zero-side
      // row via the full-outer key grid, never a silent drop.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .withColumn("lng", coalesce(col("lang"), lit("??")))
      CorpusOps.categoricalDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), "lng")
    }),
    "corpus_shuffle" -> ((s, dir) => {
      // deterministic seeded global shuffle for training-data order:
      // (shard, pos) are functions of md5(seed#id) only — any engine and
      // any rerun reproduces the identical permutation; one shuffle +
      // per-shard sort at any scale.
      CorpusOps.deterministicShuffle(
        readParquet(s, s"$dir/documents.parquet").select("doc_id"),
        "doc_id", seed = "epoch0", nShards = 8)
    }),
    "io_zorder_export" -> ((s, dir) => {
      // Z-ORDER clustered export (the OPTIMIZE ZORDER idea): orders laid
      // out by the Morton interleave of quantized (custkey, order-day),
      // equal-width z-cut into 16 shard files, each locally boxed in BOTH
      // dimensions. Unlike range-partitioner layouts, every step is
      // deterministic integer arithmetic, so the manifest AND the
      // file-skipping statistics are oracle-exact; prune_violations
      // recomputes the skipping soundness from data (must read 0).
      val tmp = scratchDir("zorder_export")
      val src = readParquet(s, s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("ck"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
      val manifest = graft.ops.Layout.zorderExport(
          src, "o_orderkey", "ck", "day", tmp, bits = 8, nShards = 16)
        .localCheckpoint(false) // consumed twice: probe + output rows
      val probe = graft.ops.Layout.pruneProbe(s, tmp, manifest,
        x1 = 100L, x2 = 400L, y1 = 9131L, y2 = 9861L)
      manifest.crossJoin(broadcast(probe))
    }),
    "io_hilbert_export" -> ((s, dir) => {
      // HILBERT clustered export: the same orders layout problem as
      // io_zorder_export but keyed by the Hilbert curve — consecutive
      // key steps are ADJACENT cells (no quadrant jumps), so the
      // equal-width cut gives tighter per-shard boxes and the same box
      // probe scans fewer files. The xy2d recurrence is deterministic
      // integer arithmetic; the oracle replays it as a generated
      // per-level CTE chain, so manifest, shards and pruning stats are
      // hash-exact end-to-end.
      val tmp = scratchDir("hilbert_export")
      val src = readParquet(s, s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("ck"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
      val manifest = graft.ops.Layout.hilbertExport(
          src, "o_orderkey", "ck", "day", tmp, bits = 8, nShards = 16)
        .localCheckpoint(false) // consumed twice: probe + output rows
      val probe = graft.ops.Layout.pruneProbe(s, tmp, manifest,
        x1 = 100L, x2 = 400L, y1 = 9131L, y2 = 9861L)
      manifest.crossJoin(broadcast(probe))
    }),
    "graph_triangles" -> ((s, dir) => {
      // triangle census of the oracle-verified near-dup pair graph: exact
      // count via the ordered two-join (each triangle a<b<c enumerated
      // once), wedge total from degrees, global clustering coefficient as
      // one IEEE division — the transitivity probe an operator reads
      // before trusting near-dup clusters (high clustering = duplicate
      // sets behave like cliques; low = chained false positives).
      val pairs = Dedup.minHashLSHPortable(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        threshold = 0.6)
      graft.ops.GraphOps.triangleStats(pairs, "id_a", "id_b")
    }),
    "io_table_diff" -> ((s, dir) => {
      // version reconciliation: diff the corpus against a deterministic
      // revision (every 7th doc removed, every surviving 5th lengthened,
      // every 11th re-added under a shifted key), rolled up per diff
      // class. One full-outer shuffle join; null-safe struct comparison
      // so a one-sided-null column counts as changed.
      val base = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "n_chars", "source")
      val revised = base.filter(col("doc_id") % 7 =!= 0)
        .withColumn("n_chars",
          when(col("doc_id") % 5 === 0, col("n_chars") + 1000L)
            .otherwise(col("n_chars")))
        .unionByName(base.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      CorpusOps.tableDiff(base, revised, Seq("doc_id"))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("key_min"), max("doc_id").as("key_max"))
    }),
    "io_compaction" -> ((s, dir) => {
      // lakehouse small-file compaction: a single-writer 50-row-split
      // export simulates the small-file problem, then compactFiles
      // rewrites it into 200-row bins assigned by a deterministic global
      // rank (two-phase prefix sum — bin membership replays in SQL,
      // unlike coalesce()-based compaction). Manifest carries
      // before/after file counts + rows_missing (must be 0).
      val tmp = scratchDir("compaction")
      readParquet(s, s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
        .repartition(1).sortWithinPartitions("doc_id")
        .write.mode("overwrite").option("maxRecordsPerFile", 50)
        .parquet(s"$tmp/small")
      CorpusOps.compactFiles(s, s"$tmp/small", s"$tmp/big", "doc_id",
        targetRows = 200L)
    }),
    "corpus_interleave" -> ((s, dir) => {
      // mixture SCHEDULING: deterministic weighted interleave (virtual-
      // time pacing, rank * grid div weight) — a weight-2 source appears
      // twice as often as a weight-1 source in any prefix of the training
      // order. The gate checks the first-200 global prefix composition
      // (TakeOrdered — bounded, never a global sort) next to each
      // source's weight and total.
      val weights = (0 until 20).map(i => s"src$i" -> ((i % 3) + 1).toLong).toMap
      val inter = CorpusOps.weightedInterleave(
          readParquet(s, s"$dir/documents.parquet"), "doc_id", "source", weights)
        .localCheckpoint(false) // consumed by prefix AND totals
      val prefix = inter.orderBy(col("vt"), col("source"), col("doc_id"))
        .limit(200)
        .groupBy("source").agg(count(lit(1)).as("n_in_prefix"))
      inter.groupBy("source")
        .agg(first("weight").as("weight"), count(lit(1)).as("n_total"))
        .join(broadcast(prefix), Seq("source"), "left")
        .select(col("source"), col("weight"), col("n_total"),
          coalesce(col("n_in_prefix"), lit(0L)).as("n_in_prefix"))
    }),
    "io_incremental_agg" -> ((s, dir) => {
      // incremental aggregate MAINTENANCE: yesterday's per-type rollup
      // (events before day 15) merged with today's delta partial — no
      // re-scan of the base — must equal the full recompute. Count/sum
      // partials merge by addition (the mergeable-state property every
      // sketch in this engine relies on, here made an explicit gate
      // check: n_mismatch is recomputed in-query and must read 0).
      val split = lit("2024-01-15").cast("timestamp")
      val ev = events(s, dir)
        .withColumn("tstamp", expr("timestamp_micros(ts div 1000)"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value"))).cast("double").as("vs"))
      val merged = partial(ev.filter(col("tstamp") < split))
        .unionByName(partial(ev.filter(col("tstamp") >= split)))
        .groupBy("event_type")
        .agg(sum("n").as("n"), sum("vs").cast("double").as("value_floor_sum"))
      val full = partial(ev)
        .select(col("event_type").as("__ft"), col("n").as("__fn"),
          col("vs").as("__fs"))
      merged.join(broadcast(full), col("event_type") === col("__ft"), "full_outer")
        .select(coalesce(col("event_type"), col("__ft")).as("event_type"),
          col("n"), col("value_floor_sum"),
          ((!(col("n") <=> col("__fn"))) ||
            (!(col("value_floor_sum") <=> col("__fs")))).cast("long")
            .as("n_mismatch"))
    }),
    "corpus_hrw_shards" -> ((s, dir) => {
      // rendezvous-hash shard stability under growth: assign every doc
      // under 8 AND 9 shards; keys that move MUST all land on the new
      // shard (n_moved_elsewhere is the invariant, provably 0, recomputed
      // in-query AND by the oracle), at an expected 1/9 move rate —
      // mod-hash resharding would move 8/9 of the corpus instead.
      val docs = readParquet(s, s"$dir/documents.parquet")
      docs.select(col("doc_id"),
          CorpusOps.rendezvousShard(col("doc_id"), 8).as("shard8"),
          CorpusOps.rendezvousShard(col("doc_id"), 9).as("shard9"))
        .groupBy("shard8")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("shard8") =!= col("shard9")).cast("long")).as("n_moved"),
          sum((col("shard8") =!= col("shard9") && col("shard9") =!= 8)
            .cast("long")).as("n_moved_elsewhere"))
    })
  )

  /** documents -> WARC records -> size-bounded .warc.gz shards on disk;
    * returns the export dir. ONE definition for the export gate row and
    * the streaming-ingestion gate row (EntryStream), so their oracles
    * share the same shard/seq window math. The manifest materialization
    * performs the write (idempotent overwrite names — a re-run rewrites
    * the same bytes); the write cost deliberately stays IN each caller's
    * bench reps: the export is the row's workload. */
  private[graft] def exportedWarcShards(s: SparkSession, dir: String,
      scratch: String): String = {
    import graft.sources.WarcIO
    val tmp = scratchDir(scratch)
    val recs = readParquet(s, s"$dir/documents.parquet")
      .select(
        lit("resource").as("warc_type"),
        concat(lit("doc://"), col("doc_id")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        concat(lit("urn:graft:"), col("doc_id")).as("record_id"),
        lit("text/plain").as("content_type"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
    WarcIO.writeWarcShards(recs, tmp, nShards = 4,
      maxPayloadBytesPerArchive = 8192)
      .count() // materialize = write the archives once
    tmp
  }

  /** The corpus-prep replay parameterized on its document source --
    * ONE definition for corpus_prep (straight documents) and
    * corpus_crawl_prep (the WARC->HTTP->strip chain), so the
    * quality-rule replay cannot drift between them. */
  private def prepSqlOver(src: String): String = {
    import OracleFragments._
    s"""WITH d0 AS ($src),
            t AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM d0),
            g AS (
              SELECT doc_id, text, toks,
                     list_transform(range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' ')) AS g2
              FROM t),
            f AS (
              SELECT doc_id, text, toks,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CASE WHEN len(g2) > 0 THEN
                         CAST(list_max(list_transform(list_distinct(g2),
                           d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE)
                           / CAST(len(g2) AS DOUBLE)
                       ELSE 0.0 END AS top_2gram_frac,
                     CASE WHEN len(g2) > 0 THEN
                         CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                           / CAST(len(g2) AS DOUBLE)
                       ELSE 0.0 END AS dup_2gram_frac,
                     CASE WHEN len(toks) > 0 THEN
                         CAST(len(list_distinct(list_intersect(toks, $enStopList))) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END AS stopword_ratio
              FROM g),
            s AS (SELECT *,
                    ${langScores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n                    ")}
                  FROM f),
            x AS (SELECT *, $langMax AS m,
                         len(text) - len(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
                  FROM s),
            y AS (SELECT *,
                    CASE WHEN cjk * 2 > len(text) THEN 'zh'
                         WHEN m <= 0 THEN 'und' $langArms ELSE 'und' END AS lang
                  FROM x),
            z AS (SELECT *,
                    CASE WHEN n_tokens IS NULL THEN 'too_short'
                         WHEN n_tokens < 20 THEN 'too_short'
                         WHEN top_2gram_frac > 0.09 THEN 'repetitive_2gram'
                         WHEN dup_2gram_frac > 0.08 THEN 'dup_2gram'
                         WHEN lang <> 'en' THEN 'non_english'
                         WHEN stopword_ratio < 0.005 THEN 'low_stopword'
                         ELSE NULL END AS drop_reason
                  FROM y)
            SELECT doc_id, n_tokens, top_2gram_frac, dup_2gram_frac,
                   stopword_ratio, lang,
                   (drop_reason IS NULL) AS keep, drop_reason
            FROM z"""
  }

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    Map(
      "approx_heavy_hitters_exact" ->
        """WITH c AS (
             SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item,
                    CAST(count(*) AS BIGINT) AS exact_count
             FROM events GROUP BY 1, 2),
           r AS (
             SELECT *, CAST(row_number() OVER (
               PARTITION BY grp ORDER BY exact_count DESC, item ASC) AS INT) AS rk
             FROM c)
           SELECT grp, item, exact_count, rk FROM r WHERE rk <= 16""",
      // fixed-point integer PageRank replay: identical planted footer, edge
      // extraction, and the 5 unrolled rounds — every division the same
      // exact floor(double/double) form, every sum a BIGINT sum, so the
      // iterative ranks (including the dangling-mass scalar per round)
      // hash-match bit-for-bit
      "graph_pagerank" -> {
        val rounds = (1 to 5).map { i =>
          val p = i - 1
          s"""d$i AS (SELECT CAST(COALESCE(sum(r.rs), 0) AS BIGINT) AS ds
                  FROM r$p r LEFT JOIN od o ON o.node = r.node
                  WHERE o.node IS NULL),
              inc$i AS (SELECT e.dst AS node,
                     CAST(sum(CAST(floor(CAST(r.rs AS DOUBLE)
                          / CAST(o.outdeg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s
                  FROM e JOIN r$p r ON r.node = e.src
                         JOIN od o ON o.node = e.src
                  GROUP BY 1),
              r$i AS (SELECT n.node,
                     CAST(floor(150000000000.0 / (SELECT n FROM nn)) AS BIGINT)
                   + CAST(floor(CAST((COALESCE(i.s, 0)
                       + CAST(floor(CAST((SELECT ds FROM d$i) AS DOUBLE)
                              / CAST((SELECT n FROM nn) AS DOUBLE)) AS BIGINT))
                       * 17 AS DOUBLE) / 20.0) AS BIGINT) AS rs
                  FROM nodes n LEFT JOIN inc$i i ON i.node = n.node)"""
        }.mkString(",\n              ")
        s"""WITH b AS (
              SELECT concat('https://site-', CAST(doc_id % 37 AS VARCHAR),
                       '.example.com/p/', CAST(doc_id AS VARCHAR),
                       ' https://site-', CAST((doc_id * 3 + 1) % 37 AS VARCHAR),
                       '.example.com/q/', CAST(doc_id AS VARCHAR),
                       ' https://cdn-', CAST(doc_id % 11 AS VARCHAR),
                       '.example.org/a/', CAST(doc_id AS VARCHAR)) AS body
              FROM documents),
            u AS (SELECT list_transform(
                     regexp_extract_all(body, 'https?://[^ \t\n\f\r]+'),
                     x -> regexp_extract(x, 'https?://([^/ \t\n\f\r]+)', 1)) AS d
                  FROM b),
            e AS (SELECT DISTINCT d[1] AS src, dst
                  FROM (SELECT d, unnest([d[2], d[3]]) AS dst FROM u)),
            nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
                   FROM e GROUP BY 1),
            r0 AS (SELECT node,
                     CAST(floor(1000000000000.0 / (SELECT n FROM nn)) AS BIGINT) AS rs
                   FROM nodes),
              $rounds
            SELECT node AS domain, rs AS rank_scaled,
                   CAST(rs AS DOUBLE) / 1000000000000.0 AS rank
            FROM r5"""
      },
      // hashed unigram+bigram buckets (portable md5 convention), integer-
      // thousandth pseudo-weights, one division at the end
      "corpus_report" ->
        """SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS n_chars,
                  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dup_docs,
                  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
                    AS n_tokens,
                  CAST(count(*) FILTER (
                    len(regexp_extract_all(
                      CASE WHEN doc_id % 10 = 0
                           THEN coalesce(text, '') || ' https://card-' ||
                                CAST(doc_id % 7 AS VARCHAR) || '.example.com/d'
                           ELSE coalesce(text, '') END,
                      'https?://[^ \t\n\f\r]+')) > 0)
                    AS BIGINT) AS n_docs_with_urls
           FROM documents""",
      // salted portable hash (see applyMixture: salt decorrelates mixture
      // membership from hashSplit buckets); dyadic quarter rates make the
      // integer thresholds exact in both engines
      "sample_mixture" ->
        """SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                  CAST(sum(n_chars) AS BIGINT) AS chars_kept
           FROM documents
           WHERE CAST(CONCAT('0x', substr(md5(CONCAT(CAST(doc_id AS VARCHAR), '#mix')), 1, 15))
                   AS BIGINT) % 1000000
                 < ((CAST(substr(source, 4) AS INT) % 4) + 1) * 250000
           GROUP BY source""",
      "io_roundtrip" ->
        """SELECT f.format, d.lang,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS n_chars
           FROM documents d, unnest(['parquet', 'jsonl']) AS f(format)
           GROUP BY 1, 2""",
      // every WARC field the reader parses, replayed from the source
      // rows: both archives carry identical records, payload md5 over
      // the same UTF-8 bytes on both sides
      "io_warc_roundtrip" ->
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
                a(archive) AS (VALUES ('plain'), ('gz'))
           SELECT a.archive, 'resource' AS warc_type,
                  'doc://' || CAST(doc_id AS VARCHAR) AS target_uri,
                  '2026-01-01T00:00:00Z' AS warc_date,
                  'urn:graft:' || CAST(doc_id AS VARCHAR) AS record_id,
                  'text/plain' AS content_type,
                  CAST(octet_length(encode(text)) AS BIGINT)
                    AS content_length,
                  md5(text) AS payload_md5
           FROM d CROSS JOIN a""",
      // the HTTP split replayed: the oracle rebuilds the exact payload
      // arms and hashes the same body bytes
      "io_warc_http_extract" ->
        """SELECT 'urn:graft:' || CAST(doc_id AS VARCHAR) AS record_id,
                  CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
                  CASE WHEN doc_id % 7 = 0 THEN 'text/plain'
                       ELSE 'text/html; charset=utf-8' END AS content_type,
                  md5(CASE WHEN doc_id % 7 = 0 THEN text
                      ELSE '<html><body>' || text || '</body></html>' END)
                    AS body_md5
           FROM documents WHERE doc_id < 50""",
      // the written-shard manifest replayed from the source table: same
      // portable hash, same mod-16 assignment, same order-free xor
      "sample_weighted" ->
        """SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
                  CAST(n_chars AS DOUBLE) /
                    ((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) + 1) / CAST(1152921504606846976 AS DOUBLE))
                    AS priority
           FROM documents
           ORDER BY priority DESC, doc_id
           LIMIT 100""",
      "corpus_budget_select" ->
        """WITH scored AS (
             SELECT doc_id, n_chars AS len,
                    CAST((doc_id * 2654435761) % 1000 AS DOUBLE)
                      / CAST(1000 AS DOUBLE) AS score
             FROM documents),
           c AS (
             SELECT doc_id, len, score,
                    sum(len) OVER (ORDER BY score DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_tokens
             FROM scored)
           SELECT doc_id, CAST(len AS BIGINT) AS len, score,
                  CAST(cum_tokens AS BIGINT) AS cum_tokens
           FROM c
           WHERE cum_tokens <= (SELECT sum(n_chars) * 2 // 5 FROM documents)""",
      "io_cdc_merge" ->
        """WITH all_rows AS (
             SELECT doc_id, 1 AS version, FALSE AS deleted, n_chars, 0 AS src
             FROM documents
             UNION ALL
             SELECT doc_id, 2, FALSE, n_chars + 1000, 1
             FROM documents WHERE doc_id % 5 = 0
             UNION ALL
             SELECT doc_id, 3, TRUE, n_chars, 1
             FROM documents WHERE doc_id % 7 = 0),
           winners AS (
             SELECT doc_id, version, deleted, n_chars,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY version DESC, src DESC) AS rn
             FROM all_rows)
           SELECT doc_id, CAST(version AS BIGINT) AS version,
                  CAST(n_chars AS BIGINT) AS n_chars
           FROM winners WHERE rn = 1 AND NOT deleted""",
      // the distributed WARC export replayed end to end: shard = md5 of
      // the record id, seq = preceding-payload prefix sum div 8 KiB in
      // (hash, id) order — the exact write-plan rule — and fields +
      // payload hash straight from documents
      "io_warc_export" ->
        """WITH r AS (
             SELECT 'urn:graft:' || CAST(doc_id AS VARCHAR) AS record_id,
                    'doc://' || CAST(doc_id AS VARCHAR) AS target_uri,
                    coalesce(text, '') AS text
             FROM documents),
           h AS (
             SELECT record_id, target_uri, text,
                    CAST(octet_length(encode(text)) AS BIGINT) AS pb,
                    CAST(CONCAT('0x', substr(md5(record_id), 1, 15))
                      AS BIGINT) AS hv
             FROM r)
           SELECT record_id, target_uri, pb AS content_length,
                  md5(text) AS payload_md5,
                  CAST(hv % 4 AS INT) AS shard,
                  CAST(coalesce(sum(pb) OVER (PARTITION BY hv % 4
                      ORDER BY hv, record_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) // 8192 AS BIGINT) AS seq
           FROM h""",
      // the snapshot diff replayed: the same refresh construction, a
      // full outer join, and the same null-safe status logic
      "io_snapshot_diff" ->
        """WITH old AS (SELECT doc_id, n_chars FROM documents),
           neu AS (
             SELECT doc_id,
                    CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
                         ELSE n_chars END AS n_chars
             FROM documents WHERE doc_id % 7 <> 0
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, n_chars
             FROM documents WHERE doc_id % 11 = 0)
           SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
                  CASE WHEN old.doc_id IS NULL THEN 'added'
                       WHEN neu.doc_id IS NULL THEN 'removed'
                       WHEN old.n_chars IS DISTINCT FROM neu.n_chars
                         THEN 'changed'
                       ELSE 'unchanged' END AS diff_status,
                  coalesce(old.n_chars, -1) AS old_n_chars,
                  coalesce(neu.n_chars, -1) AS new_n_chars
           FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id""",
      "io_export_shards" ->
        """WITH h AS (
             SELECT doc_id, n_chars,
                    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) AS hv
             FROM documents)
           SELECT CAST(hv % 16 AS INT) AS shard,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(n_chars) AS BIGINT) AS payload,
                  bit_xor(hv) AS ids_xor
           FROM h GROUP BY 1""",
      "sample_split" ->
        """WITH b AS (
             SELECT source, n_chars,
                    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % 100 AS bucket
             FROM documents)
           SELECT source,
                  CASE WHEN bucket < 80 THEN 'train'
                       WHEN bucket < 90 THEN 'val'
                       ELSE 'test' END AS split,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS n_chars
           FROM b GROUP BY 1, 2""",
      "sample_stratified" ->
        """SELECT o_orderpriority AS stratum, o_orderkey AS id,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS BIGINT) AS rk
           FROM orders
           QUALIFY rk <= 40""",
      // explicit equal-width boundaries make the per-file manifest a pure
      // function of orders: same bucket expression, min/max/count per
      // bucket; overlap/missing are structurally 0 (disjoint buckets,
      // lossless write — a write bug breaks n_total/rows_missing)
      "io_range_export_bounds" ->
        """WITH b AS (
             SELECT least(greatest(CAST(floor(o_totalprice / 37500) AS BIGINT), 0), 15) AS part,
                    o_totalprice
             FROM orders),
           m AS (
             SELECT CAST(part AS INT) AS part,
                    CAST(count(*) AS BIGINT) AS n_rows,
                    min(o_totalprice) AS key_min,
                    max(o_totalprice) AS key_max
             FROM b GROUP BY 1),
           t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM m)
           SELECT m.part, m.n_rows, m.key_min, m.key_max,
                  CAST(0 AS BIGINT) AS overlap_violations,
                  t.n_total, CAST(0 AS BIGINT) AS rows_missing
           FROM m, t""",
      // the bucketed tables hold the same rows, so the co-located join's
      // rollup is the plain join's
      "io_bucketed_join" ->
        """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment""",
      // the fused prep filter: every signal recomputed independently, then
      // the same first-failing-rule CASE chain (rule order defines reason)
      "corpus_prep" -> prepSqlOver("SELECT doc_id, text FROM documents"),
      // the fused CRAWL chain (r18): WARC responses -> HTTP split ->
      // html strip -> the SAME prep rules; the fixture body wraps text
      // as <html><body>text</body></html> and the corpus text is tag-,
      // entity- and multi-space-free, so the REAL strip must return the
      // source text byte-exactly -- the oracle feeds text straight into
      // the shared prep replay over the 200-html arm
      "corpus_crawl_prep" -> prepSqlOver(
        "SELECT doc_id, coalesce(text, '') AS text FROM documents " +
          "WHERE doc_id % 7 <> 0"),
      // C4 replay: identical planted body construction, then the line
      // rules (terminal punct, >=5 words, no 'javascript') as a
      // list_filter lambda and the page rules on the original body;
      // cleaned text verified byte-for-byte via md5
      "corpus_c4_filter" ->
        """WITH b AS (
              SELECT doc_id, concat_ws(chr(10),
                       substr(coalesce(text, ''), 1, 60) || '.',
                       'short line.',
                       substr(coalesce(text, ''), 61, 60) ||
                         CASE doc_id % 3 WHEN 0 THEN '.' WHEN 1 THEN ''
                              ELSE '?' END,
                       CASE WHEN doc_id % 7 = 0 THEN
                         'Please enable javascript to continue reading.' END,
                       CASE WHEN doc_id % 13 = 0 THEN
                         'function f() { return 1; }' END,
                       CASE WHEN doc_id % 17 = 0 THEN
                         'Lorem ipsum dolor sit amet.' END) AS body
              FROM documents),
            k AS (
              SELECT doc_id, body, string_split(body, chr(10)) AS ls,
                     list_filter(string_split(body, chr(10)),
                       l -> regexp_matches(l, '[.!?"'']$')
                            AND len(string_split_regex(trim(l), ' +')) >= 5
                            AND NOT contains(lower(l), 'javascript')) AS kept
              FROM b),
            c AS (SELECT *, array_to_string(kept, chr(10)) AS clean FROM k)
            SELECT doc_id,
                   CAST(len(ls) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_lines_kept,
                   CAST(length(clean)
                     - length(regexp_replace(clean, '[.!?]', '', 'g')) AS BIGINT)
                     AS n_sentences,
                   contains(body, '{') AS has_brace,
                   contains(lower(body), 'lorem ipsum') AS has_lorem,
                   (length(clean)
                      - length(regexp_replace(clean, '[.!?]', '', 'g')) >= 3
                    AND NOT contains(body, '{')
                    AND NOT contains(lower(body), 'lorem ipsum')) AS keep,
                   md5(clean) AS clean_md5
            FROM c""",
      // the sketch value itself is merge-order dependent and NOT hashed;
      // the hashed columns are exact interpolated percentiles (quantile_cont
      // == Spark percentile, proven by text_length_quantiles) plus the
      // GK-guarantee boolean the engine computes and the oracle asserts TRUE
      // portable HLL replay: same md5 60-bit hash, bucket = top 6 bits,
      // rho from the exact bit length of the low 54 bits (bin() string
      // length — integer-exact, no floating log2), exact integer bucket
      // mass, and the estimate as the identical left-to-right double
      // expression (0.709 * 4096 * 2^55 / t)
      // portable CMS replay: same row-salted md5 bucketing (item || '#cms'
      // || j, 60-bit hex prefix, mod 128), integer counters, min-of-rows
      // point estimate at the row_number-deterministic top-5 probe items
      "approx_cms_md5" ->
        """WITH ev AS (
              SELECT event_type, CAST(user_id AS VARCHAR) AS item FROM events),
            js AS (SELECT unnest([0, 1, 2]) AS j),
            sk AS (
              SELECT event_type, j,
                     CAST(CONCAT('0x', substr(md5(CONCAT(item, '#cms',
                          CAST(j AS VARCHAR))), 1, 15)) AS BIGINT) % 128 AS bucket,
                     count(*) AS cnt
              FROM ev CROSS JOIN js GROUP BY 1, 2, 3),
            exact AS (
              SELECT event_type, item, count(*) AS exact_count
              FROM ev GROUP BY 1, 2),
            top5 AS (
              SELECT event_type, item, exact_count FROM (
                SELECT event_type, item, exact_count,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY exact_count DESC, item) AS rk
                FROM exact) WHERE rk <= 5),
            probe AS (
              SELECT t.event_type, t.item, t.exact_count, js.j,
                     CAST(CONCAT('0x', substr(md5(CONCAT(t.item, '#cms',
                          CAST(js.j AS VARCHAR))), 1, 15)) AS BIGINT) % 128 AS bucket
              FROM top5 t CROSS JOIN js)
            SELECT p.event_type, p.item AS user_id,
                   min(COALESCE(s.cnt, 0)) AS est_count,
                   p.exact_count,
                   min(COALESCE(s.cnt, 0)) - p.exact_count AS overcount
            FROM probe p LEFT JOIN sk s
              ON s.event_type = p.event_type AND s.j = p.j AND s.bucket = p.bucket
            GROUP BY p.event_type, p.item, p.exact_count""",
      // KMV/theta replay: bottom-64 distinct salted md5 hashes per group,
      // merged-pair bottom-64 with membership flags, theta = merged kth
      // hash, and the identical estimator expressions (63.0 * 2^60 / h and
      // rho * 2^60 / theta as single double divisions, exact when under k)
      "approx_theta_overlap" ->
        """WITH ev AS (
              SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS item
              FROM events),
            hd AS (
              SELECT DISTINCT g,
                     CAST(CONCAT('0x', substr(md5(CONCAT(item, '#kmv')), 1, 15))
                          AS BIGINT) AS h
              FROM ev),
            sk AS (SELECT g, h FROM (
                     SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
                     FROM hd) WHERE rk <= 64),
            gs AS (SELECT DISTINCT g FROM sk),
            pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
            m AS (SELECT p.ga, p.gb, s.h,
                     max(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
                     max(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
                  FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
                  GROUP BY 1, 2, 3),
            t AS (SELECT * FROM (
                     SELECT m.*, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
                     FROM m) WHERE rk <= 64),
            u AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_u, max(h) AS theta,
                     CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS rho
                  FROM t GROUP BY 1, 2),
            d AS (SELECT g, CAST(count(*) AS BIGINT) AS n_h, max(h) AS kth
                  FROM sk GROUP BY 1),
            ex AS (SELECT g, CAST(count(*) AS BIGINT) AS exact_n FROM ev GROUP BY 1),
            exi AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS exact_int
                    FROM ev a JOIN ev b ON a.item = b.item AND a.g < b.g
                    GROUP BY 1, 2)
            SELECT u.ga, u.gb,
                   CASE WHEN da.n_h < 64 THEN CAST(da.n_h AS DOUBLE)
                        ELSE 63.0 * 1152921504606846976.0 / CAST(da.kth AS DOUBLE)
                   END AS est_a,
                   CASE WHEN db.n_h < 64 THEN CAST(db.n_h AS DOUBLE)
                        ELSE 63.0 * 1152921504606846976.0 / CAST(db.kth AS DOUBLE)
                   END AS est_b,
                   CASE WHEN u.n_u < 64 THEN CAST(u.n_u AS DOUBLE)
                        ELSE 63.0 * 1152921504606846976.0 / CAST(u.theta AS DOUBLE)
                   END AS est_union,
                   CASE WHEN u.n_u < 64 THEN CAST(u.rho AS DOUBLE)
                        ELSE CAST(u.rho AS DOUBLE) * 1152921504606846976.0
                             / CAST(u.theta AS DOUBLE)
                   END AS est_intersect,
                   ea.exact_n AS exact_a, eb.exact_n AS exact_b,
                   ea.exact_n + eb.exact_n - COALESCE(exi.exact_int, 0) AS exact_union,
                   COALESCE(exi.exact_int, 0) AS exact_intersect
            FROM u JOIN d da ON da.g = u.ga JOIN d db ON db.g = u.gb
                   JOIN ex ea ON ea.g = u.ga JOIN ex eb ON eb.g = u.gb
                   LEFT JOIN exi ON exi.ga = u.ga AND exi.gb = u.gb""",
      "approx_distinct_md5" ->
        """WITH h AS (
              SELECT event_type,
                     CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS hv
              FROM events),
            b AS (SELECT event_type, hv >> 54 AS bucket,
                         hv & ((CAST(1 AS BIGINT) << 54) - 1) AS rest
                  FROM h),
            r AS (SELECT event_type, bucket,
                         max(CASE WHEN rest = 0 THEN 55
                                  ELSE 55 - length(bin(rest)) END) AS mx
                  FROM b GROUP BY 1, 2),
            t AS (SELECT event_type,
                         CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) +
                              (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
                              AS BIGINT) AS t_scaled,
                         64 - count(*) AS v
                  FROM r GROUP BY 1),
            e AS (SELECT event_type, t_scaled, v,
                         CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                         CAST(36028797018963968 AS DOUBLE) / CAST(t_scaled AS DOUBLE)
                           AS raw
                  FROM t)
            SELECT event_type,
                   CASE WHEN raw <= CAST(160 AS DOUBLE) AND v > 0
                        THEN CAST(64 AS DOUBLE) *
                             ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE))
                        ELSE raw END AS approx_distinct,
                   t_scaled
            FROM e""",
      // same hash/bucket/estimator arms as approx_distinct_md5, but routed
      // through the per-day sketch + max-union stages the query runs
      "approx_sketch_union_md5" ->
        """WITH h AS (
              SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                     CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS hv
              FROM events),
            b AS (SELECT event_type, day, hv >> 54 AS bucket,
                         hv & ((CAST(1 AS BIGINT) << 54) - 1) AS rest
                  FROM h),
            day_sketch AS (
              SELECT event_type, day, bucket,
                     max(CASE WHEN rest = 0 THEN 55
                              ELSE 55 - length(bin(rest)) END) AS mx
              FROM b GROUP BY 1, 2, 3),
            unioned AS (
              SELECT event_type, bucket, max(mx) AS mx
              FROM day_sketch GROUP BY 1, 2),
            t AS (SELECT event_type,
                         CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) +
                              (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
                              AS BIGINT) AS t_scaled,
                         64 - count(*) AS v
                  FROM unioned GROUP BY 1),
            e AS (SELECT event_type, t_scaled, v,
                         CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                         CAST(36028797018963968 AS DOUBLE) / CAST(t_scaled AS DOUBLE)
                           AS raw
                  FROM t)
            SELECT event_type,
                   CASE WHEN raw <= CAST(160 AS DOUBLE) AND v > 0
                        THEN CAST(64 AS DOUBLE) *
                             ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE))
                        ELSE raw END AS approx_distinct,
                   t_scaled
            FROM e""",
      "approx_percentiles" ->
        """WITH e AS (SELECT event_type, CAST(floor(value) AS DOUBLE) AS v
                      FROM events),
           g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                        quantile_cont(v, 0.5) AS e50,
                        quantile_cont(v, 0.9) AS e90,
                        quantile_cont(v, 0.99) AS e99
                 FROM e GROUP BY event_type),
           q AS (
             SELECT event_type, n_events, CAST(0.5 AS DOUBLE) AS pct,
                    e50 AS exact_pct FROM g
             UNION ALL
             SELECT event_type, n_events, CAST(0.9 AS DOUBLE), e90 FROM g
             UNION ALL
             SELECT event_type, n_events, CAST(0.99 AS DOUBLE), e99 FROM g)
           SELECT event_type, pct, exact_pct, n_events,
                  CAST(ceil((pct - CAST(0.002 AS DOUBLE))
                            * CAST(n_events AS DOUBLE)) AS BIGINT) - 1
                    AS rank_lo_target,
                  CAST(floor((pct + CAST(0.002 AS DOUBLE))
                             * CAST(n_events AS DOUBLE)) AS BIGINT) + 2
                    AS rank_hi_target,
                  TRUE AS within_bound
           FROM q""",
      "sample_temperature" ->
        """WITH d AS (
              SELECT doc_id, n_chars,
                     'g' || (CASE WHEN doc_id % 10 < 7 THEN 0
                                  WHEN doc_id % 10 < 9 THEN 1
                                  ELSE 2 END) AS grp
              FROM documents),
            c AS (SELECT grp, count(*) AS n FROM d GROUP BY 1),
            w AS (SELECT grp, n,
                         CAST(floor(sqrt(CAST(n * 100 AS DOUBLE))) AS HUGEINT) AS w
                  FROM c),
            t AS (SELECT sum(w) AS z_tot, sum(n) AS n_tot FROM w),
            thr AS (SELECT grp, w.n AS n, w.w AS w,
                           least(CAST(1000000 AS HUGEINT),
                                 (CAST(n_tot AS HUGEINT) * 400000 // 1000000)
                                   * w.w * 1000000 // (z_tot * CAST(w.n AS HUGEINT))) AS thr
                    FROM w CROSS JOIN t),
            kept AS (SELECT d.grp, count(*) AS n_kept, sum(n_chars) AS chars_kept
                     FROM d JOIN thr ON d.grp = thr.grp
                     WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)
                             || '#temp'), 1, 15)) AS BIGINT) % 1000000 < thr.thr
                     GROUP BY 1)
           SELECT thr.grp, CAST(thr.n AS BIGINT) AS n_docs,
                  CAST(thr.w AS BIGINT) AS w, CAST(thr.thr AS BIGINT) AS thr,
                  coalesce(kept.n_kept, 0) AS n_kept,
                  CAST(coalesce(kept.chars_kept, 0) AS BIGINT) AS chars_kept
           FROM thr LEFT JOIN kept ON thr.grp = kept.grp""",
      "corpus_epochs" ->
        """WITH g AS (SELECT source, sum(n_chars) AS T FROM documents GROUP BY 1),
            p AS (SELECT source, T, least(4, 20000 // T) AS f,
                         CASE WHEN 20000 // T >= 4 THEN 0
                              ELSE ((20000 % T) * 1000000) // T END AS frac
                  FROM g),
            fe AS (SELECT d.doc_id AS id, d.source, d.n_chars AS tokens,
                          unnest(generate_series(1, CAST(f AS BIGINT))) AS epoch
                   FROM documents d JOIN p USING (source)),
            fr AS (SELECT d.doc_id AS id, d.source, d.n_chars AS tokens,
                          f + 1 AS epoch
                   FROM documents d JOIN p USING (source)
                   WHERE frac > 0
                     AND CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)
                           || '#epoch'), 1, 15)) AS BIGINT) % 1000000 < frac),
            inst AS (SELECT * FROM fe UNION ALL SELECT * FROM fr)
           SELECT source, count(*) AS n_instances,
                  CAST(sum(tokens) AS BIGINT) AS tokens_total,
                  CAST(max(epoch) AS BIGINT) AS max_epoch
           FROM inst GROUP BY 1""",
      "io_zorder_export" -> {
        // Morton interleave of the 8-bit quantized coordinates, unrolled
        // to pure bit arithmetic (the same expression zValue builds)
        val zBits = (0 until 8).map(i =>
          s"(((xq >> $i) & 1) << ${2 * i}) | (((yq >> $i) & 1) << ${2 * i + 1})")
          .mkString(" | ")
        s"""WITH src AS (
              SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
                     CAST(date_diff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) AS BIGINT) AS y
              FROM orders),
            b AS (SELECT min(x) AS xlo, max(x) AS xhi,
                         min(y) AS ylo, max(y) AS yhi FROM src),
            q AS (SELECT o_orderkey, x, y,
                         (x - xlo) * 256 // (xhi - xlo + 1) AS xq,
                         (y - ylo) * 256 // (yhi - ylo + 1) AS yq
                  FROM src CROSS JOIN b),
            z AS (SELECT o_orderkey, x, y, ($zBits) AS z FROM q),
            sh AS (SELECT *, CAST(z * 16 // 65536 AS INTEGER) AS shard FROM z),
            m AS (SELECT shard, count(*) AS n_rows,
                         min(x) AS x_min, max(x) AS x_max,
                         min(y) AS y_min, max(y) AS y_max,
                         min(z) AS z_min, max(z) AS z_max
                  FROM sh GROUP BY 1),
            scanned AS (SELECT shard FROM m
                        WHERE x_min <= 400 AND x_max >= 100
                          AND y_min <= 9861 AND y_max >= 9131),
            boxed AS (SELECT shard FROM sh
                      WHERE x BETWEEN 100 AND 400 AND y BETWEEN 9131 AND 9861),
            probe AS (SELECT
                (SELECT count(*) FROM m) AS files_total,
                (SELECT count(*) FROM scanned) AS files_scanned,
                (SELECT count(*) FROM boxed) AS rows_matched,
                (SELECT count(*) FROM boxed)
                  - (SELECT count(*) FROM boxed JOIN scanned USING (shard))
                  AS prune_violations)
           SELECT m.*, probe.* FROM m CROSS JOIN probe"""
      },
      "io_hilbert_export" -> {
        // the xy2d Hilbert recurrence unrolled to one CTE per level
        // (s = 128 .. 1), generated from the same quadrant table and
        // rotation cases as Layout.hilbertStep; per-level distinct
        // column names so no lateral-alias ambiguity. Quadrant
        // (3*rx)^ry spelled as its value table: (0,0)->0 (0,1)->1
        // (1,1)->2 (1,0)->3.
        val levels = (0 until 8).map { i =>
          val s = 1L << (7 - i)
          val (px, py, pd) = (s"hx$i", s"hy$i", s"hd$i")
          s"""h${i + 1} AS (
              SELECT o_orderkey, x, y,
                CASE WHEN ($py & $s) = 0
                     THEN (CASE WHEN ($px & $s) > 0 THEN ${s - 1} - $py ELSE $py END)
                     ELSE $px END AS hx${i + 1},
                CASE WHEN ($py & $s) = 0
                     THEN (CASE WHEN ($px & $s) > 0 THEN ${s - 1} - $px ELSE $px END)
                     ELSE $py END AS hy${i + 1},
                $pd + ${s * s} * (CASE WHEN ($px & $s) > 0
                     THEN (CASE WHEN ($py & $s) > 0 THEN 2 ELSE 3 END)
                     ELSE (CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END) END)
                  AS hd${i + 1}
              FROM h$i)"""
        }.mkString(",\n")
        s"""WITH src AS (
              SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
                     CAST(date_diff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) AS BIGINT) AS y
              FROM orders),
            b AS (SELECT min(x) AS xlo, max(x) AS xhi,
                         min(y) AS ylo, max(y) AS yhi FROM src),
            q AS (SELECT o_orderkey, x, y,
                         (x - xlo) * 256 // (xhi - xlo + 1) AS xq,
                         (y - ylo) * 256 // (yhi - ylo + 1) AS yq
                  FROM src CROSS JOIN b),
            h0 AS (SELECT o_orderkey, x, y, xq AS hx0, yq AS hy0,
                          CAST(0 AS BIGINT) AS hd0 FROM q),
            $levels,
            hh AS (SELECT o_orderkey, x, y, hd8 AS h FROM h8),
            sh AS (SELECT *, CAST(h * 16 // 65536 AS INTEGER) AS shard FROM hh),
            m AS (SELECT shard, count(*) AS n_rows,
                         min(x) AS x_min, max(x) AS x_max,
                         min(y) AS y_min, max(y) AS y_max,
                         min(h) AS h_min, max(h) AS h_max
                  FROM sh GROUP BY 1),
            scanned AS (SELECT shard FROM m
                        WHERE x_min <= 400 AND x_max >= 100
                          AND y_min <= 9861 AND y_max >= 9131),
            boxed AS (SELECT shard FROM sh
                      WHERE x BETWEEN 100 AND 400 AND y BETWEEN 9131 AND 9861),
            probe AS (SELECT
                (SELECT count(*) FROM m) AS files_total,
                (SELECT count(*) FROM scanned) AS files_scanned,
                (SELECT count(*) FROM boxed) AS rows_matched,
                (SELECT count(*) FROM boxed)
                  - (SELECT count(*) FROM boxed JOIN scanned USING (shard))
                  AS prune_violations)
           SELECT m.*, probe.* FROM m CROSS JOIN probe"""
      },
      "graph_triangles" ->
        s"""WITH pairs AS ($minhashMd5Sql),
            e AS (SELECT DISTINCT least(id_a, id_b) AS a,
                                  greatest(id_a, id_b) AS b
                  FROM pairs WHERE id_a <> id_b),
            deg AS (SELECT v, count(*) AS d FROM (
                      SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
                    GROUP BY 1),
            tri AS (SELECT count(*) AS t FROM e e1 JOIN e e2 ON e2.a = e1.b
                    WHERE EXISTS (SELECT 1 FROM e e3
                                  WHERE e3.a = e1.a AND e3.b = e2.b)),
            agg AS (SELECT
                (SELECT count(*) FROM deg) AS n_nodes,
                (SELECT count(*) FROM e) AS n_edges,
                (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg)
                  AS n_wedges,
                (SELECT t FROM tri) AS n_triangles)
           SELECT n_nodes, n_edges, n_wedges, n_triangles,
                  CASE WHEN n_wedges = 0 THEN 0.0
                       ELSE CAST(n_triangles * 3 AS DOUBLE)
                            / CAST(n_wedges AS DOUBLE) END AS clustering
           FROM agg""",
      "io_table_diff" ->
        """WITH base AS (SELECT doc_id, n_chars, source FROM documents),
            revised AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
                          ELSE n_chars END AS n_chars,
                     source
              FROM base WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000, n_chars, source FROM base
              WHERE doc_id % 11 = 0),
            d AS (
              SELECT coalesce(b.doc_id, r.doc_id) AS doc_id,
                     CASE WHEN b.doc_id IS NULL THEN 'added'
                          WHEN r.doc_id IS NULL THEN 'removed'
                          WHEN (b.n_chars IS DISTINCT FROM r.n_chars)
                            OR (b.source IS DISTINCT FROM r.source)
                            THEN 'changed'
                          ELSE 'unchanged' END AS diff_class
              FROM base b FULL OUTER JOIN revised r ON b.doc_id = r.doc_id)
           SELECT diff_class, count(*) AS n,
                  min(doc_id) AS key_min, max(doc_id) AS key_max
           FROM d GROUP BY 1""",
      "io_compaction" ->
        """WITH r AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY doc_id) - 1 AS rk
              FROM documents),
            b AS (SELECT doc_id, rk // 200 AS bin FROM r),
            m AS (SELECT bin, count(*) AS n_rows,
                         min(doc_id) AS id_min, max(doc_id) AS id_max
                  FROM b GROUP BY 1),
            t AS (SELECT CAST(ceil(count(*) / 50.0) AS BIGINT) AS files_before,
                         CAST(ceil(count(*) / 200.0) AS BIGINT) AS files_after
                  FROM documents)
           SELECT bin, n_rows, id_min, id_max, files_before, files_after,
                  CAST(0 AS BIGINT) AS rows_missing
           FROM m CROSS JOIN t""",
      "corpus_interleave" ->
        """WITH w AS (SELECT source,
                             CAST(substr(source, 4) AS INT) % 3 + 1 AS wt
                      FROM (SELECT DISTINCT source FROM documents)),
            r AS (SELECT doc_id, d.source, wt,
                         row_number() OVER (PARTITION BY d.source
                           ORDER BY md5('interleave#' || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rk
                  FROM documents d JOIN w USING (source)),
            v AS (SELECT doc_id, source, wt, (rk * 1000000) // wt AS vt FROM r),
            p AS (SELECT * FROM v ORDER BY vt, source, doc_id LIMIT 200),
            pc AS (SELECT source, count(*) AS n FROM p GROUP BY 1),
            t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1)
           SELECT t.source, CAST(w.wt AS BIGINT) AS weight, t.n_total,
                  coalesce(pc.n, 0) AS n_in_prefix
           FROM t JOIN w USING (source) LEFT JOIN pc USING (source)""",
      "io_incremental_agg" ->
        """SELECT event_type, count(*) AS n,
                  CAST(sum(floor(value)) AS DOUBLE) AS value_floor_sum,
                  CAST(0 AS BIGINT) AS n_mismatch
           FROM events GROUP BY 1""",
      "corpus_hrw_shards" ->
        """WITH c8 AS (
              SELECT doc_id, shard8 FROM (
                SELECT doc_id, s AS shard8,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY md5(CAST(doc_id AS VARCHAR) || '#hrw#'
                                      || CAST(s AS VARCHAR)) DESC, s) AS rk
                FROM documents, range(0, 8) t(s)) WHERE rk = 1),
            c9 AS (
              SELECT doc_id, shard9 FROM (
                SELECT doc_id, s AS shard9,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY md5(CAST(doc_id AS VARCHAR) || '#hrw#'
                                      || CAST(s AS VARCHAR)) DESC, s) AS rk
                FROM documents, range(0, 9) t(s)) WHERE rk = 1),
            j AS (SELECT c8.doc_id, shard8, shard9
                  FROM c8 JOIN c9 ON c8.doc_id = c9.doc_id)
           SELECT CAST(shard8 AS INTEGER) AS shard8,
                  count(*) AS n_docs,
                  CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_moved,
                  CAST(sum(CASE WHEN shard8 <> shard9 AND shard9 <> 8
                                THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_moved_elsewhere
           FROM j GROUP BY 1""",
      "sample_quota" ->
        """WITH sz AS (SELECT coalesce(lang, '??') AS stratum, count(*) AS sz
                       FROM documents GROUP BY 1),
           rk AS (SELECT stratum, sz,
                         CAST(row_number() OVER (ORDER BY sz, stratum) AS BIGINT) AS rn,
                         sum(sz) OVER (ORDER BY sz, stratum ROWS UNBOUNDED PRECEDING) AS prefix,
                         (SELECT count(*) FROM sz) AS m
                  FROM sz),
           st AS (SELECT *, 400 - (prefix - sz) AS rem, m - rn + 1 AS avail,
                         (sz * (m - rn + 1) <= (400 - (prefix - sz))) AS capped
                  FROM rk),
           lv AS (SELECT rem // avail AS lvl, rem % avail AS r, rn AS t
                  FROM st WHERE NOT capped ORDER BY rn LIMIT 1),
           q AS (SELECT stratum,
                        CASE WHEN lvl IS NULL THEN NULL
                             WHEN capped THEN sz
                             ELSE lvl + CASE WHEN rn - t < r THEN 1 ELSE 0 END
                        END AS quota
                 FROM st LEFT JOIN lv ON TRUE),
           ranked AS (SELECT coalesce(lang, '??') AS stratum, doc_id AS id,
                             CAST(row_number() OVER (
                               PARTITION BY coalesce(lang, '??')
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                               AS BIGINT) AS rk
                      FROM documents)
           SELECT r.stratum, CAST(coalesce(q.quota, -1) AS BIGINT) AS quota,
                  r.id, r.rk
           FROM ranked r JOIN q ON r.stratum = q.stratum
           WHERE q.quota IS NULL OR r.rk <= q.quota""",
      "corpus_drift" ->
        """WITH av AS (
             SELECT least(19, greatest(0, CAST(floor((value - 0.0) / 25.0) AS BIGINT))) AS bucket
             FROM events WHERE epoch_ns(ts) < 1704931200000000000),
           bv AS (
             SELECT least(19, greatest(0, CAST(floor((value - 0.0) / 25.0) AS BIGINT))) AS bucket
             FROM events WHERE epoch_ns(ts) >= 1704931200000000000),
           ga AS (SELECT bucket, count(*) AS n_a FROM av GROUP BY 1),
           gb AS (SELECT bucket, count(*) AS n_b FROM bv GROUP BY 1),
           grid AS (SELECT unnest(range(0, 20)) AS bucket),
           j AS (SELECT g.bucket, coalesce(ga.n_a, 0) AS n_a,
                        coalesce(gb.n_b, 0) AS n_b
                 FROM grid g LEFT JOIN ga ON g.bucket = ga.bucket
                             LEFT JOIN gb ON g.bucket = gb.bucket),
           t AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM j)
           SELECT j.bucket, j.n_a, j.n_b,
                  CAST(t.tot_a AS BIGINT) AS tot_a,
                  CAST(t.tot_b AS BIGINT) AS tot_b,
                  CAST(abs(j.n_a * t.tot_b - j.n_b * t.tot_a) AS BIGINT) AS dev_x
           FROM j CROSS JOIN t""",
      "corpus_drift_mix" ->
        """WITH ca AS (SELECT coalesce(lang, '??') AS category, count(*) AS n_a
                       FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
           cb AS (SELECT coalesce(lang, '??') AS category, count(*) AS n_b
                  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
           j AS (SELECT coalesce(ca.category, cb.category) AS category,
                        coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
                 FROM ca FULL OUTER JOIN cb ON ca.category = cb.category),
           t AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM j)
           SELECT j.category, j.n_a, j.n_b,
                  CAST(t.tot_a AS BIGINT) AS tot_a,
                  CAST(t.tot_b AS BIGINT) AS tot_b,
                  CAST(abs(j.n_a * t.tot_b - j.n_b * t.tot_a) AS BIGINT) AS dev_x
           FROM j CROSS JOIN t""",
      "corpus_shuffle" ->
        """WITH h AS (SELECT doc_id,
                             md5('epoch0#' || CAST(doc_id AS VARCHAR)) AS h
                      FROM documents),
            s AS (SELECT doc_id, h,
                         CAST(CAST(CONCAT('0x', substr(h, 1, 15)) AS BIGINT) % 8
                              AS INTEGER) AS shard
                  FROM h)
           SELECT doc_id, shard,
                  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                       AS BIGINT) AS pos
           FROM s"""
    )
  }
}
