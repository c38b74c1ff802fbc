package graft

import graft.analysis._
import graft.core._
import graft.ops._
import graft.spark._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** structured-streaming tier of the driver contract: the `queries` / `oracleSql`
  * fragments [[SparkEntry]] composes. Split out of SparkEntry.scala in
  * round 8 purely for file size — every entry is verbatim; semantics and
  * the gate are unchanged. See SparkEntry's scaladoc for the conventions
  * (zero-noise DP, integer-valued oracle arithmetic, column aliasing).
  */
private[graft] object EntryStream {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_neardup" -> ((s, dir) => {
      // ingest-time near-dup admission log: per doc, whether ANY earlier
      // doc (smaller id = earlier arrival) clears jaccard 0.6, with the
      // best match (max jaccard, tie -> min id). This is the batch face;
      // the micro-batch ingest fold — within-batch pairs + increment-
      // proportional store matches, one signature store growing per batch
      // — is pinned equal in StreamOpsSpec, including through a REAL
      // foreachBatch drive. Portable md5 minhash => oracle-exact.
      graft.ops.Dedup.onlineNearDupLog(
        readParquet(s, s"$dir/documents.parquet"), "doc_id", "text",
        threshold = 0.6)
    }),
    "ss_drift" -> ((s, dir) => {
      // per-hour mix drift vs the whole-corpus reference mix — the
      // streaming face of categoricalDrift (exact BIGINT cross deviation
      // per (hour, type)); batch face here, streaming parity in
      // StreamOpsSpec via the bounded-stream drive
      val ev = events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      graft.streaming.StreamOps.windowedMixDrift(
        ev, graft.streaming.StreamOps.mixReference(ev, "event_type"))
    }),
    "ss_dp_ldp_tree_fold" -> ((s, dir) => {
      // STREAMING LDP RANGE TREE (r18 — the olhIngestStep shape for the
      // hierarchical oracle): three unit-partitioned micro-batches fold
      // their additive tree cells into the store; the estimate over the
      // folded store must hash-equal the one-shot dp_ldp_range_tree
      // release — zero noise gives identical truthful cells under any
      // unit-partitioned split, so the oracle IS that row's SQL.
      val ev = events(s, dir)
      val batches = Seq(0L, 1L, 2L).map(r =>
        ev.filter(pmod(col("user_id"), lit(3L)) === r))
      var store: Option[DataFrame] = None
      batches.foreach { b =>
        store = Some(graft.spark.LocalDP.ldpTreeIngestStep(b, store,
          "user_id", col("value"), lo = 0.0, hi = 1000.0, bins = 64,
          epsilon = 4.0, noise = NoiseSource.Zero).localCheckpoint(false))
      }
      graft.spark.LocalDP.ldpTreeEstimate(store.get, bins = 64,
          epsilon = 4.0)
        .select(col("__lvl").cast("long").as("lvl"),
          col("__idx").as("idx"), col("dp_count"))
    }),
    "ss_warc_ingest" -> ((s, dir) => {
      // STREAMING crawl ingestion (r18 — the ss_ gate convention: the
      // batch execution of the SAME per-archive rollup whose
      // stream==batch parity StreamOpsSpec proves over a real
      // binaryFile readStream with incremental file pickup): archives
      // exported from documents land in a directory; the ingestion
      // ledger releases per-archive (shard, seq, n_records,
      // payload_bytes, ids_xor) — replayed from documents via the
      // exact shard/seq window math of io_warc_export plus the
      // order-free md5-prefix xor checksum.
      import graft.sources.WarcIO
      val tmp = EntryCorpus.exportedWarcShards(s, dir, "ss_warc_ingest")
      WarcIO.warcIngestStats(WarcIO.readWarc(s, s"$tmp/shard=*/*.warc.gz"))
        .select(
          regexp_extract(col("file"), "shard=(\\d+)", 1).cast("int")
            .as("shard"),
          regexp_extract(col("file"), "part-(\\d+)", 1).cast("long")
            .as("seq"),
          col("n_records"), col("payload_bytes"), col("ids_xor"))
    }),
    "ss_window_agg" -> ((s, dir) => {
      // the streaming rollup's batch equivalent (streaming parity itself is
      // proven in StreamOpsSpec against this exact shape)
      events(s, dir)
        .withColumn("tstamp", expr("timestamp_micros(ts div 1000)"))
        .groupBy(date_format(date_trunc("hour", col("tstamp")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value"))).cast("double").as("value_floor_sum"))
    }),
    "ss_enrich" -> ((s, dir) => {
      // stream-static enrichment rollup (events x broadcast customer dim,
      // per-hour-per-segment counts): the batch execution of the SAME
      // StreamOps function whose stream==batch parity StreamOpsSpec proves
      graft.streaming.StreamOps.enrichedWindowStats(
        events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")),
        readParquet(s, s"$dir/customer.parquet"),
        "c_custkey", "c_mktsegment")
    }),
    "ss_reservoir" -> ((s, dir) => {
      // streaming bounded sample (r16): a <= 5-row uniform per-lang
      // sample of the document stream maintained across 3 micro-batches
      // by the portable bottom-k-hash reservoir — min-k is associative,
      // so the fold equals the one-shot bottom-k of the whole corpus,
      // and the hash rule makes the SAMPLE ITSELF deterministic: the
      // oracle verifies the selected rows (ids + payload), not just
      // counts. Batch 3 REPLAYS part of batch 2 (doc_id % 3 == 1 rows
      // appear in both) — the idempotence contract runs for real.
      val docs = readParquet(s, s"$dir/documents.parquet")
        .select("doc_id", "lang", "n_chars")
      val batches = Seq(
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 === 1),
        docs.filter(col("doc_id") % 3 =!= 0)) // replays the %3==1 rows
      graft.streaming.StreamOps.onlineReservoirIngest(batches,
          Seq("lang"), "doc_id", k = 5)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("__prio")
          .as("prio"))
    }),
    "ss_dedup" -> ((s, dir) => {
      // streaming dedup rollup: distinct users per hour via the chained
      // dropDuplicates + windowed-count rewrite (count DISTINCT is
      // unsupported on streams); streaming parity proven in StreamOpsSpec
      graft.streaming.StreamOps.windowedDistinctUsers(
        events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")))
    }),
    "ss_approx_distinct" -> ((s, dir) => {
      // streaming cardinality via the portable HLL sketch: <= 64 state rows
      // per (window, type) cell instead of one per distinct user — the
      // shape that survives hundred-million-user windows. Batch execution
      // here (deterministic => oracle-exact); streaming parity with the
      // sentinel replay is proven in StreamOpsSpec.
      graft.streaming.StreamOps.windowedApproxDistinct(
        events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")))
    }),
    "ss_dp_percentile" -> ((s, dir) => {
      // streaming DP quantiles: the quantile-tree combiner under the
      // per-release budget model with the ORDER-FREE drop-not-sample
      // contribution bound (over-cap units are excluded from their cell —
      // the only arrival-order-independent Linf bound a stream admits;
      // the cap is 1e6 like the dp siblings — unreachable at ANY gate sf,
      // so the oracle, which has no exclusion arm, stays exact; the
      // exclusion semantics themselves are spec-pinned in StreamOpsSpec).
      // Generous cap + zero noise => the deterministic tree walk per
      // (hour, type) cell, replayed by the same unrolled-descent SQL as
      // dp_percentile over a composite hour|type key. Streaming parity is
      // proven in StreamOpsSpec with the sentinel-replay harness.
      val out = graft.streaming.StreamOps.dpWindowedPercentile(
        events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          .withColumn("v", floor(col("value"))),
        "user_id", "ts", "v", Seq("event_type"), "1 hour",
        Seq(50, 90), epsilon = 1e5, delta = 0.0, maxPerCell = 1000000L,
        lower = 0.0, upper = 500.0, noise = NoiseSource.Zero)
      out.select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("percentile_50"), col("percentile_90"))
    }),
    "ss_session_agg" -> ((s, dir) => {
      // session windows (30-minute inactivity gap per user) — the SAME
      // StreamOps operator runs under Structured Streaming with a watermark
      // (streaming parity proven in StreamOpsSpec); batch output is
      // deterministic and oracle-checked against the classic
      // gaps-and-islands SQL. Timestamps truncated to micros on both sides
      // so gap comparisons agree exactly.
      graft.streaming.StreamOps.sessionEventStats(
        events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")))
    }),
    "ss_attribution" -> ((s, dir) => {
      // stream-stream time-interval join (click -> purchase attribution
      // within 1 hour per user), rolled up per conversion day. The SAME
      // operator runs under Structured Streaming with watermarked state
      // eviction (parity proven in StreamOpsSpec); batch output is
      // deterministic and oracle-checked against the equivalent range join.
      val ev = events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val clicks = ev.filter(col("event_type") === "click")
      val convs = ev.filter(col("event_type") === "purchase")
      graft.streaming.StreamOps.attributionJoin(clicks, convs, "1 hour")
        .groupBy(date_format(col("conv_ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_attributed_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("conv_id")).as("n_conversions"))
    }),
    "ss_abandonment" -> ((s, dir) => {
      // LEFT OUTER stream-stream attribution (abandonment): clicks with
      // no purchase inside the 1-hour horizon surface as null-conv rows —
      // on a stream that null is only emittable once the watermark clears
      // the click's horizon (parity proven in StreamOpsSpec); batch
      // execution here is the plain left join, rolled up per click day.
      val ev = events(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      graft.streaming.StreamOps.abandonmentJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"), "1 hour")
        .groupBy(date_format(col("click_ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("click_id")).as("n_clicks"),
          countDistinct(when(col("conv_id").isNull, col("click_id")))
            .as("n_abandoned"))
    }),
    "ss_dp_continual" -> ((s, dir) => {
      // continual-observation DP counter (binary-tree mechanism): the
      // running per-type count released at EVERY day tick of the 32-day
      // horizon, one Laplace draw per dyadic node. Zero-noise + a
      // non-binding per-tick cap => the released prefix equals the exact
      // running count, which the oracle replays as a window sum over the
      // full generated tick grid (empty ticks release too — that is the
      // mechanism's contract). Day tick = days since 2024-01-01 (the
      // generator's epoch); 19723 = that date's epoch day.
      graft.streaming.StreamOps.dpContinualCount(
        events(s, dir), pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        keyCols = Seq("event_type"), horizon = 32, epsilon = 1.0,
        maxPerTick = 1000000L, noise = graft.core.NoiseSource.Zero)
    }),
    "ss_dp_continual_sharded" -> ((s, dir) => {
      // the KEY-RANGE SHARDED continual counter (the 100 TB
      // key-cardinality path, r15): the 5 event types split into 3
      // deterministic key-range shards, each tree released and written
      // to storage before the next draws — one draw per (key, node) in
      // total (spec-pinned). Zero noise => the same exact running
      // prefixes, so the oracle IS ss_dp_continual's replay.
      val out = java.nio.file.Files
        .createTempDirectory("graft_q_cshard_").toString
      graft.streaming.StreamOps.dpContinualCountSharded(
        events(s, dir), pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        keyCols = Seq("event_type"), horizon = 32, epsilon = 1.0,
        maxPerTick = 1000000L, noise = graft.core.NoiseSource.Zero,
        outDir = out, maxKeysPerShard = 2L)
    }),
    "ss_dp_continual_gauss" -> ((s, dir) => {
      // the GAUSSIAN continual counter: same dyadic release, per-node
      // sigma Balle-Wang-calibrated at L2 = maxPerTick * sqrt(levels+1)
      // ((epsilon, delta)-DP; the echo-scale calibration and draw-once
      // are spec-pinned in StreamOpsSpec). Zero noise => the same exact
      // running prefix, so the oracle IS ss_dp_continual's.
      graft.streaming.StreamOps.dpContinualCount(
        events(s, dir), pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        keyCols = Seq("event_type"), horizon = 32, epsilon = 1.0,
        maxPerTick = 1000000L, noise = graft.core.NoiseSource.Zero,
        publicKeys = None, noiseKind = graft.core.NoiseKind.Gaussian,
        delta = 1e-6)
    }),
    "ss_dp_continual_sum" -> ((s, dir) => {
      // the SUM release of the binary-tree mechanism: running per-type sum
      // of floor(value) at every day tick. Zero-noise + non-binding clamps
      // => the exact running sum (integer-valued doubles, order-free),
      // replayed as the ranged window sum.
      graft.streaming.StreamOps.dpContinualSum(
        events(s, dir).withColumn("v", floor(col("value"))),
        pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        valueCol = "v", keyCols = Seq("event_type"), horizon = 32,
        epsilon = 1.0, maxPerTick = 1000000L,
        minValue = 0.0, maxValue = 1000.0,
        noise = graft.core.NoiseSource.Zero)
    }),
    "ss_dp_continual_sum_sharded" -> ((s, dir) => {
      // the key-range SHARDED continual sum (r15): same clamped-cell
      // bounding, 2-key shards over the 5 event types. Zero noise => the
      // same exact running sums, so the oracle IS ss_dp_continual_sum's
      // replay. Sharded continual MEAN is composition of this and the
      // sharded count (documented on dpContinualSumSharded).
      val out = java.nio.file.Files
        .createTempDirectory("graft_q_csshard_").toString
      graft.streaming.StreamOps.dpContinualSumSharded(
        events(s, dir).withColumn("v", floor(col("value"))),
        pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        valueCol = "v", keyCols = Seq("event_type"), horizon = 32,
        epsilon = 1.0, maxPerTick = 1000000L,
        minValue = 0.0, maxValue = 1000.0,
        noise = graft.core.NoiseSource.Zero, outDir = out,
        maxKeysPerShard = 2L)
    }),
    "ss_range_tree_fold" -> ((s, dir) => {
      // the range tree's STREAMING face (nightly-release pattern): three
      // micro-batches fold their bounded node contributions into the
      // tree-shaped store, then ONE release draws the noise — and must
      // hash-equal the one-shot dp_range_tree SQL (zero noise,
      // non-binding cap, order-free count sums under any batch split).
      val ev = events(s, dir)
      val batches = Seq(ev.filter(col("event_id") % 3 === 0),
        ev.filter(col("event_id") % 3 === 1),
        ev.filter(col("event_id") % 3 === 2))
      var store: Option[DataFrame] = None
      batches.foreach { b =>
        store = Some(graft.spark.RangeTree.rangeTreeIngestStep(b, store,
          "user_id", col("value"), Seq("event_type"), lo = 0.0,
          hi = 1000.0, bins = 64, maxPerUnit = 1000000L)
          .localCheckpoint(false))
      }
      graft.spark.RangeTree.rangeTreeRelease(store.get, Seq("event_type"),
          bins = 64, epsilon = 1.0, maxPerUnit = 1000000L,
          noise = graft.core.NoiseSource.Zero)
        .select(col("__lvl").cast("long").as("lvl"), col("__idx").as("idx"),
          col("event_type"), col("dp_count"))
    }),
    "ss_range_2d_fold" -> ((s, dir) => {
      // the 2-D product tree's streaming face: three micro-batches fold
      // bounded node contributions into the product-shaped store, ONE
      // release draws noise — and must hash-equal the one-shot
      // dp_range_2d SQL (zero noise, non-binding cap, order-free sums
      // under any batch split).
      val ev = events(s, dir)
      val batches = Seq(ev.filter(col("event_id") % 3 === 0),
        ev.filter(col("event_id") % 3 === 1),
        ev.filter(col("event_id") % 3 === 2))
      var store: Option[DataFrame] = None
      batches.foreach { b =>
        store = Some(graft.spark.RangeTree.range2DIngestStep(b, store,
          "user_id", col("value"),
          expr("hour(timestamp_micros(ts div 1000))"), Seq("event_type"),
          loX = 0.0, hiX = 1000.0, binsX = 16,
          loY = 0.0, hiY = 32.0, binsY = 32, maxPerUnit = 1000000L)
          .localCheckpoint(false))
      }
      graft.spark.RangeTree.range2DTreeRelease(store.get,
          Seq("event_type"), binsX = 16, binsY = 32, epsilon = 1.0,
          maxPerUnit = 1000000L, noise = graft.core.NoiseSource.Zero)
        .select(col("__lvx").cast("long").as("lvx"),
          col("__idxx").as("idxx"), col("__lvy").cast("long").as("lvy"),
          col("__idxy").as("idxy"), col("event_type"), col("dp_count"))
    }),
    "ss_dp_continual_mean" -> ((s, dir) => {
      // the MEAN derivation of the continual family: count tree + clamped
      // sum tree on split budget from ONE scan, running mean as pure
      // post-processing (ratio of the two prefix releases). Zero-noise +
      // non-binding caps => exact running mean of floor(value) at every
      // tick, replayed as two ranged window sums and a division.
      graft.streaming.StreamOps.dpContinualMean(
        events(s, dir).withColumn("v", floor(col("value"))),
        pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        valueCol = "v", keyCols = Seq("event_type"), horizon = 32,
        epsilon = 1.0, maxPerTick = 1000000L,
        minValue = 0.0, maxValue = 1000.0,
        noise = graft.core.NoiseSource.Zero)
    }),
    "ss_dp_continual_fold" -> ((s, dir) => {
      // the STREAMING face of the continual counter: three tick-range
      // micro-batches folded through onlineContinualStep (node sums
      // accumulated in the store, per-node noise drawn once and persisted,
      // releases at each step's watermark) must hash-equal the one-shot
      // batch release — the ss_er convention; the oracle IS
      // ss_dp_continual's SQL. Draw-once and the ascending-tick/finality
      // contracts are pinned in StreamOpsSpec. (A step releases only keys
      // seen SO FAR — the fixture's five types all appear in batch 1, so
      // the fold's key universe equals the one-shot's from step 1 on.)
      val ev = events(s, dir)
        .withColumn("__tick", expr("(ts div 86400000000000) - 19723"))
      val plan = Seq(
        (ev.filter(col("__tick") <= 9), -1L, 9L),
        (ev.filter(col("__tick") > 9 && col("__tick") <= 19), 9L, 19L),
        (ev.filter(col("__tick") > 19), 19L, 31L))
      var store: Option[graft.streaming.StreamOps.ContinualStore] = None
      val parts = plan.map { case (b, from, to) =>
        val (rel, grown) = graft.streaming.StreamOps.onlineContinualStep(
          b, store, pidCol = "user_id", tickCol = col("__tick"),
          keyCols = Seq("event_type"), horizon = 32, epsilon = 1.0,
          maxPerTick = 1000000L, noise = graft.core.NoiseSource.Zero,
          releasedThrough = from, releaseThrough = to)
        store = Some(grown.copy(
          nodeSums = grown.nodeSums.localCheckpoint(false),
          nodeNoise = grown.nodeNoise.localCheckpoint(false)))
        rel
      }
      parts.reduce(_.unionByName(_))
    }),
    "ss_dp_continual_window" -> ((s, dir) => {
      // sliding 7-day counts as pure POST-PROCESSING of the continual
      // release (prefix(t) - prefix(t-7)): zero extra budget, zero new
      // noise — the continual-observation dashboard pattern. Zero-noise
      // release => exact rolling window at every tick (partial leading
      // windows difference against 0), replayed as a ranged join.
      val released = graft.streaming.StreamOps.dpContinualCount(
        events(s, dir), pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        keyCols = Seq("event_type"), horizon = 32, epsilon = 1.0,
        maxPerTick = 1000000L, noise = graft.core.NoiseSource.Zero)
      graft.streaming.StreamOps.continualWindowCounts(
        released, Seq("event_type"), windowTicks = 7)
    }),
    "ss_dp_continual_window_sum" -> ((s, dir) => {
      // the SUM analogue: sliding 7-day clamped-mass windows
      // (prefix_sum(t) - prefix_sum(t-7)) as pure post-processing of the
      // continual sum release — "revenue in the last 7 days" at every
      // tick for zero extra budget. Zero noise => the exact rolling sum
      // of floor(value), replayed as a ranged join.
      val released = graft.streaming.StreamOps.dpContinualSum(
        events(s, dir).withColumn("v", floor(col("value"))),
        pidCol = "user_id",
        tickCol = expr("(ts div 86400000000000) - 19723"),
        valueCol = "v", keyCols = Seq("event_type"), horizon = 32,
        epsilon = 1.0, maxPerTick = 1000000L,
        minValue = 0.0, maxValue = 1000.0,
        noise = graft.core.NoiseSource.Zero)
      graft.streaming.StreamOps.continualWindowSums(
        released, Seq("event_type"), windowTicks = 7)
    }),
    "ss_dp_count" -> ((s, dir) => {
      // streaming DP windowed count (per-release budget): per-unit
      // contribution cap -> cell sum -> Laplace noise, the SAME chained-
      // window-aggregation plan batch or streaming (streaming parity in
      // StreamOpsSpec). Oracle-exact here because it runs the engine's
      // Zero-noise source with a cap generous enough to drop nothing —
      // the dp_* convention; the cap path is pinned by the spec.
      graft.streaming.StreamOps.dpWindowedCount(
          events(s, dir).withColumn("tstamp", expr("timestamp_micros(ts div 1000)")),
          pidCol = "user_id", tsCol = "tstamp", keyCols = Seq("event_type"),
          windowLength = "1 hour", epsilon = 1.0, maxPerCell = 1000000L,
          noise = graft.core.NoiseSource.Zero)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("dp_count"))
    }),
    "ss_dp_mean" -> ((s, dir) => {
      // streaming DP windowed mean: count+sum releases in one stateful
      // pass, half the budget each, dp_mean = dp_sum/max(dp_count, 1).
      // Zero-noise + non-binding bounds => exact windowed average of
      // floor(value) — integer-valued double sums, exact division.
      val ev = events(s, dir)
        .withColumn("tstamp", expr("timestamp_micros(ts div 1000)"))
        .withColumn("v", floor(col("value")))
      graft.streaming.StreamOps.dpWindowedMean(ev,
          pidCol = "user_id", tsCol = "tstamp", valueCol = "v",
          keyCols = Seq("event_type"), windowLength = "1 hour",
          epsilon = 1.0, maxPerCell = 1000000L,
          minValue = -1e6, maxValue = 1e6,
          noise = graft.core.NoiseSource.Zero)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("dp_count"), col("dp_sum"), col("dp_mean"))
    }),
    "ss_dp_sum" -> ((s, dir) => {
      // streaming DP windowed sum (clamp -> per-unit cell-sum clamp ->
      // Laplace), Zero-noise + generous bounds for the oracle; value
      // floor()ed so the sum is integer-exact in doubles (the engine-wide
      // float-parity convention). Tight-bound semantics pinned in
      // StreamOpsSpec.
      val ev = events(s, dir)
        .withColumn("tstamp", expr("timestamp_micros(ts div 1000)"))
        .withColumn("v", floor(col("value")))
      graft.streaming.StreamOps.dpWindowedSum(ev,
          pidCol = "user_id", tsCol = "tstamp", valueCol = "v",
          keyCols = Seq("event_type"), windowLength = "1 hour",
          epsilon = 1.0, maxPerCell = 1000000L,
          minValue = -1e6, maxValue = 1e6,
          noise = graft.core.NoiseSource.Zero)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("dp_sum"))
    })
  )

  def oracleSql: Map[String, String] = {
    import OracleFragments._
    Map(
      "ss_neardup" ->
        s"""${minhashPrefixSql(8)}, q AS (
             SELECT id_a, id_b,
                    CASE WHEN szsum - inter = 0 THEN 0.0
                         ELSE inter / (szsum - inter) END AS j
             FROM v
             WHERE (CASE WHEN szsum - inter = 0 THEN 0.0
                         ELSE inter / (szsum - inter) END) >= 0.6),
           b AS (SELECT id_b AS id, max(j) AS mj FROM q GROUP BY 1),
           m AS (SELECT q.id_b AS id, min(q.id_a) AS match_id, b.mj
                 FROM q JOIN b ON q.id_b = b.id AND q.j = b.mj
                 GROUP BY 1, 3)
           SELECT d.doc_id AS id,
                  CASE WHEN m.id IS NULL THEN CAST(0 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) END AS is_dup,
                  CAST(coalesce(m.match_id, -1) AS BIGINT) AS match_id,
                  coalesce(m.mj, 0.0) AS match_jaccard
           FROM documents d LEFT JOIN m ON d.doc_id = m.id""",
      "ss_drift" ->
        """WITH ref AS (SELECT coalesce(CAST(event_type AS VARCHAR), '__null')
                          AS event_type, count(*) AS n_ref FROM events GROUP BY 1),
           rt AS (SELECT sum(n_ref) AS tot_ref FROM ref),
           w AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                        coalesce(CAST(event_type AS VARCHAR), '__null') AS event_type,
                        count(*) AS n_w
                 FROM events GROUP BY 1, 2),
           wt AS (SELECT hour, sum(n_w) AS tot_w FROM w GROUP BY 1)
           SELECT w.hour, w.event_type, w.n_w,
                  CAST(wt.tot_w AS BIGINT) AS tot_w,
                  r.n_ref, CAST(rt.tot_ref AS BIGINT) AS tot_ref,
                  CAST(abs(w.n_w * rt.tot_ref - r.n_ref * wt.tot_w) AS BIGINT) AS dev_x
           FROM w JOIN wt USING (hour) JOIN ref r USING (event_type)
           CROSS JOIN rt""",
      "ss_dp_count" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, CAST(count(*) AS DOUBLE) AS dp_count
           FROM events GROUP BY 1, 2""",
      // prefix(t) - prefix(t-7) replayed as a ranged join over the grid
      "ss_dp_continual_window" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_window_count
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type
            AND pt.t <= grid.t AND pt.t > grid.t - 7
           GROUP BY 1, 2""",
      // the sliding clamped-mass window replayed as a ranged join over
      // the generated tick grid (prefix_sum(t) - prefix_sum(t-7))
      "ss_dp_continual_window_sum" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    sum(least(greatest(floor(value), 0.0), 1000.0)) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_window_sum
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type
            AND pt.t <= grid.t AND pt.t > grid.t - 7
           GROUP BY 1, 2""",
      // the continual release replayed: per-(type, day) exact counts,
      // then the running sum at EVERY tick of the generated 0..31 grid
      // the running clamped sum replayed over the full tick grid (values
      // in [0, 1000] at sf scales, so clamps never bind — the dp_sum
      // convention)
      // the sharded sum is the same mechanism shard by shard
      "ss_dp_continual_sum_sharded" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    sum(least(greatest(floor(value), 0.0), 1000.0)) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_sum
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      "ss_dp_continual_sum" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    sum(least(greatest(floor(value), 0.0), 1000.0)) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_sum
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      // the fold must release the one-shot tree — same oracle
      "ss_range_tree_fold" -> EntryDP.rangeTreeSql,
      // the 2-D fold over any batch split releases the identical
      // one-shot product tree (zero noise, non-binding cap)
      "ss_range_2d_fold" -> EntryDP.range2DTreeSql,
      // count + clamped-sum prefixes over the grid, mean = ratio with the
      // max(count, 1) convention
      "ss_dp_continual_mean" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nc,
                    sum(least(greatest(floor(value), 0.0), 1000.0)) AS ns
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g),
           pfx AS (
             SELECT grid.t, grid.event_type,
                    CAST(coalesce(sum(pt.nc), 0) AS DOUBLE) AS dp_prefix_count,
                    CAST(coalesce(sum(pt.ns), 0) AS DOUBLE) AS dp_prefix_sum
             FROM grid LEFT JOIN pt
               ON pt.event_type = grid.event_type AND pt.t <= grid.t
             GROUP BY 1, 2)
           SELECT t, event_type, dp_prefix_count, dp_prefix_sum,
                  dp_prefix_sum / greatest(dp_prefix_count, 1.0) AS dp_prefix_mean
           FROM pfx""",
      // the fold must equal the one-shot release — same oracle
      "ss_dp_continual_fold" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_count
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      // the sharded release is the same mechanism shard by shard: zero
      // noise replays the identical exact prefixes
      "ss_dp_continual_sharded" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_count
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      // the zero-noise Gaussian release equals the exact prefix — the
      // same replay as ss_dp_continual (sigma calibration spec-pinned)
      "ss_dp_continual_gauss" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_count
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      "ss_dp_continual" ->
        """WITH pt AS (
             SELECT event_type,
                    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                    CAST(count(*) AS BIGINT) AS nt
             FROM events GROUP BY 1, 2),
           grid AS (
             SELECT k.event_type, g.t
             FROM (SELECT DISTINCT event_type FROM events) k
             CROSS JOIN (SELECT unnest(range(0, 32)) AS t) g)
           SELECT grid.t, grid.event_type,
                  CAST(coalesce(sum(pt.nt), 0) AS DOUBLE) AS dp_prefix_count
           FROM grid LEFT JOIN pt
             ON pt.event_type = grid.event_type AND pt.t <= grid.t
           GROUP BY 1, 2""",
      "ss_dp_mean" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type,
              CAST(count(*) AS DOUBLE) AS dp_count,
              CAST(sum(floor(value)) AS DOUBLE) AS dp_sum,
              CAST(sum(floor(value)) AS DOUBLE) / greatest(CAST(count(*) AS DOUBLE), 1.0) AS dp_mean
           FROM events GROUP BY 1, 2""",
      "ss_dp_sum" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, CAST(sum(floor(value)) AS DOUBLE) AS dp_sum
           FROM events GROUP BY 1, 2""",
      // the one-shot bottom-k replay: priority = md5('reservoir#id'),
      // k smallest (priority, id) per lang — fold == one-shot by min-k
      // associativity
      "ss_reservoir" ->
        """SELECT lang, doc_id, n_chars, prio FROM (
             SELECT lang, doc_id, n_chars,
                    md5('reservoir#' || CAST(doc_id AS VARCHAR)) AS prio,
                    row_number() OVER (PARTITION BY lang
                      ORDER BY md5('reservoir#' || CAST(doc_id AS VARCHAR)),
                               doc_id) AS rk
             FROM documents)
           WHERE rk <= 5""",
      "ss_dedup" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, count(DISTINCT user_id) AS distinct_users
           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2""",
      "ss_window_agg" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
              count(*) AS n_events, CAST(sum(floor(value)) AS DOUBLE) AS value_floor_sum
           FROM events GROUP BY 1, 2""",
      // the streaming ingestion ledger replayed from documents: the
      // io_warc_export shard/seq window math grouped per archive, plus
      // the order-free md5-prefix xor of record ids
      "ss_warc_ingest" ->
        """WITH r AS (
             SELECT 'urn:graft:' || CAST(doc_id AS VARCHAR) AS record_id,
                    coalesce(text, '') AS text
             FROM documents),
           h AS (
             SELECT record_id,
                    CAST(octet_length(encode(text)) AS BIGINT) AS pb,
                    CAST(CONCAT('0x', substr(md5(record_id), 1, 15))
                      AS BIGINT) AS hv
             FROM r),
           q AS (
             SELECT record_id, pb, hv,
                    CAST(hv % 4 AS INT) AS shard,
                    CAST(coalesce(sum(pb) OVER (PARTITION BY hv % 4
                        ORDER BY hv, record_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) // 8192 AS BIGINT) AS seq
             FROM h)
           SELECT shard, seq, CAST(count(*) AS BIGINT) AS n_records,
                  CAST(sum(pb) AS BIGINT) AS payload_bytes,
                  bit_xor(hv) AS ids_xor
           FROM q GROUP BY 1, 2""",
      "ss_enrich" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              c_mktsegment AS segment,
              count(*) AS n_events, CAST(sum(floor(value)) AS DOUBLE) AS value_floor_sum
           FROM events JOIN customer ON user_id = c_custkey
           GROUP BY 1, 2""",
      // the dp_percentile tree walk over a composite hour|type key: the
      // unrolled-descent SQL is reused verbatim with the composite string
      // as its partition key, then split back into (hour, event_type)
      "ss_dp_percentile" ->
        s"""WITH src AS (
              SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       || '|' || event_type AS event_type,
                     value
              FROM events),
            tree AS (${pctlTreeSqlFor(Seq(50, 90), "src")})
            SELECT split_part(event_type, '|', 1) AS hour,
                   split_part(event_type, '|', 2) AS event_type,
                   percentile_50, percentile_90
            FROM tree""",
      // the approx_distinct_md5 arms per (hour, event_type) window cell
      "ss_approx_distinct" ->
        """WITH h AS (
              SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                     event_type,
                     CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS hv
              FROM events WHERE user_id IS NOT NULL),
            b AS (SELECT hour, event_type, hv >> 54 AS bucket,
                         hv & ((CAST(1 AS BIGINT) << 54) - 1) AS rest
                  FROM h),
            r AS (SELECT hour, event_type, bucket,
                         max(CASE WHEN rest = 0 THEN 55
                              ELSE 55 - length(bin(rest)) END) AS mx
                  FROM b GROUP BY 1, 2, 3),
            t AS (SELECT hour, event_type,
                         CAST(sum(CAST(1 AS BIGINT) << (55 - mx)) +
                              (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
                              AS BIGINT) AS t_scaled,
                         64 - count(*) AS v
                  FROM r GROUP BY 1, 2),
            e AS (SELECT hour, event_type, t_scaled, v,
                         CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                         CAST(36028797018963968 AS DOUBLE) / CAST(t_scaled AS DOUBLE)
                           AS raw
                  FROM t)
            SELECT hour, event_type,
                   CASE WHEN raw <= CAST(160 AS DOUBLE) AND v > 0
                        THEN CAST(64 AS DOUBLE) *
                             ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE))
                        ELSE raw END AS approx_users,
                   t_scaled
            FROM e""",
      // micros on both sides (epoch_ns // 1000 == the engine's ts div 1000)
      // so interval arithmetic and day formatting agree exactly
      "ss_attribution" ->
        """WITH e AS (
             SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tu
             FROM events),
           c AS (SELECT * FROM e WHERE event_type = 'click'),
           v AS (SELECT * FROM e WHERE event_type = 'purchase')
           SELECT strftime(make_timestamp(v.tu), '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS n_attributed_pairs,
                  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users,
                  CAST(count(DISTINCT v.event_id) AS BIGINT) AS n_conversions
           FROM c JOIN v ON c.user_id = v.user_id
                        AND c.tu <= v.tu AND v.tu <= c.tu + 3600000000
           GROUP BY 1""",
      // Gaps-and-islands replication of session_window (30-minute inactivity
      // gap): a new session starts when the gap since the previous event is
      // >= the gap duration (session_window's boundary semantics — an event
      // exactly at previous+gap is OUTSIDE the window). Timestamps truncated
      // to micros to match the engine's ts div 1000.
      "ss_session_agg" ->
        """WITH e AS (
             SELECT user_id, epoch_ns(ts) // 1000 AS tu, floor(value) AS v
             FROM events),
           m AS (
             SELECT user_id, tu, v,
                    CASE WHEN tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu)
                         >= 1800000000 THEN 1 ELSE 0 END AS brk
             FROM e),
           s AS (
             SELECT user_id, tu, v,
                    SUM(brk) OVER (PARTITION BY user_id ORDER BY tu
                                   ROWS UNBOUNDED PRECEDING) AS sid
             FROM m)
           SELECT user_id, MIN(tu) AS session_start,
                  count(*) AS n_events, SUM(v) AS value_sum
           FROM s GROUP BY user_id, sid""",
      "ss_abandonment" ->
        """WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS ctu,
                             event_id AS click_id
                      FROM events WHERE event_type = 'click'),
            v AS (SELECT user_id, epoch_ns(ts) // 1000 AS vtu,
                         event_id AS conv_id
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT c.click_id, c.ctu, v.conv_id
                  FROM c LEFT JOIN v
                    ON c.user_id = v.user_id
                   AND v.vtu >= c.ctu AND v.vtu <= c.ctu + 3600000000)
           SELECT strftime(make_timestamp(ctu), '%Y-%m-%d') AS day,
                  CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
                  CAST(count(DISTINCT CASE WHEN conv_id IS NULL
                                           THEN click_id END) AS BIGINT)
                    AS n_abandoned
           FROM j GROUP BY 1"""
    )
  }
}
