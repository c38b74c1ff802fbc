package graft.streaming

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Shared normalization (StreamOps.tsToNanos) so the spec exercises the
    * SAME expression the driver path uses — the two cannot drift. */
  private def tsToNanos(df: org.apache.spark.sql.DataFrame) = StreamOps.tsToNanos(df)

  private def readEvents(dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsToNanos(spark.read.parquet(dir + "/events.parquet"))
  }

  /** events parquet replayed as a bounded stream (ts nanos -> timestamp). */
  private def eventStream() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(dir + "/events.parquet").schema
    // readStream wants a directory: stream the testdata dir filtered to the
    // events file
    tsToNanos(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("windowed aggregation over a bounded stream matches the batch result") {
    val agg = StreamOps.windowedEventStats(eventStream(), "1 hour", "10 minutes")
    // complete mode so the bounded replay emits every window deterministically
    StreamOps.runToMemory(spark, agg, "win_agg", OutputMode.Complete)
    val streamed = spark.table("win_agg")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = readEvents("/root/testdata/sf0.001")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode watermark: late-within-window folds in, late-past-watermark drops") {
    // Pins windowedEventStats's late-data contract (the scaladoc): with a
    // 1-hour tumbling window and a 10-minute watermark,
    //   batch 1: 10:05 (window W10) and 12:30 (advances event time)
    //   batch 2: 10:30 — LATE, W10 is past the 12:20 watermark -> DROPPED
    //            12:25 — late vs max event time but its window W12 is
    //                    still open -> FOLDS IN
    //            14:00 — advances the watermark to 13:50, closing W12
    //   batch 3: 16:00 — flushes the final emissions
    // Append mode: each window emits exactly once; W10 must count only
    // the batch-1 row, W12 must count both of its rows.
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, String, Double)]
    val events = input.toDF().toDF("tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"), "yyyy-MM-dd HH:mm"))
    val agg = StreamOps.windowedEventStats(events, "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory")
      .queryName("late_agg").outputMode(OutputMode.Append).start()
    def feed(rows: (String, Long, String, Double)*): Unit = {
      input.addData(rows)
      q.processAllAvailable()
    }
    feed(("2024-03-01 10:05", 1L, "click", 1.0),
      ("2024-03-01 12:30", 2L, "click", 1.0))
    feed(("2024-03-01 10:30", 3L, "click", 1.0), // late past watermark
      ("2024-03-01 12:25", 4L, "click", 1.0), // late but window open
      ("2024-03-01 14:00", 5L, "click", 1.0))
    feed(("2024-03-01 16:00", 6L, "click", 1.0))
    q.stop()
    val out = spark.table("late_agg")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 10:00 window shipped WITHOUT the dropped 10:30 row
    assert(out.get("10:00").contains(1L),
      s"W10 should emit exactly the on-time row: $out")
    // the 12:00 window shipped WITH the late-but-open 12:25 row folded in
    assert(out.get("12:00").contains(2L),
      s"W12 should fold the within-watermark late row: $out")
    // and nothing emitted twice (append = exactly-once per window)
    val n = spark.table("late_agg")
      .groupBy("window_start", "event_type").count()
      .filter(col("count") > 1).count()
    assert(n == 0, "a window emitted more than once in append mode")
  }

  test("stream-static enrichment rollup matches the batch join") {
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val agg = StreamOps.enrichedWindowStats(eventStream(), dim,
      "c_custkey", "c_mktsegment")
    StreamOps.runToMemory(spark, agg, "enrich_agg", OutputMode.Complete)
    val streamed = spark.table("enrich_agg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = StreamOps.enrichedWindowStats(
      readEvents("/root/testdata/sf0.001")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")),
      dim, "c_custkey", "c_mktsegment")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("session windows over a bounded stream match the batch result") {
    val agg = StreamOps.sessionEventStats(eventStream(), "30 minutes", Some("1 hour"))
    // complete mode: the bounded replay emits every session deterministically
    // (append would hold back sessions past the final watermark)
    StreamOps.runToMemory(spark, agg, "sess_agg", OutputMode.Complete)
    val streamed = spark.table("sess_agg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = StreamOps.sessionEventStats(
      readEvents("/root/testdata/sf0.001")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming data-quality monitoring: windowed verifyByGroup == batch") {
    import graft.ops.{DataQuality, InRange, NotNull, Satisfies}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    val checks = Seq(
      NotNull("user_complete", col("user_id")),
      InRange("value_0_400", col("value"), 0.0, 400.0),
      Satisfies("purchase_cap",
        col("event_type") =!= "purchase" || col("value") <= 350.0))
    // the group key must be the RAW window(ts) column — wrapping it in
    // date_format inside the groupBy severs the event-time/watermark
    // linkage and streaming append mode rejects the aggregation; format
    // AFTER the aggregation instead (stateless post-processing)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      DataQuality.verifyByGroup(df,
        Seq("w" -> window(col("ts"), "1 hour")), checks)
        .withColumn("hour", date_format(col("w").getField("start"),
          "yyyy-MM-dd HH:mm:ss"))
        .drop("w")
        .select("hour", "check_index", "check", "kind", "n_rows",
          "n_violations", "passed")
    // sentinel pushes the final watermark past every real window
    val tmp = java.nio.file.Files.createTempDirectory("ss_dq").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "10 minutes")
    StreamOps.runToMemory(spark, keyed(stream), "ss_dq_t", OutputMode.Append)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    val batchRows = keyed(readEvents(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
    val batchSet = asSet(batchRows)
    val streamedSet = asSet(spark.table("ss_dq_t"))
      // the sentinel's own far-future window carries 1 row; drop it by hour
      .filterNot(x => !batchSet.exists(_._1 == x._1))
    assert(streamedSet == batchSet && streamedSet.nonEmpty)
    // every window carries all three check rows (sf0.001 values max at
    // ~328, so the range/cap checks legitimately pass — the TIGHTER range
    // below plants real windowed violations and re-checks parity)
    assert(batchSet.groupBy(_._1).values.forall(_.size == 3))
    def tight(df: org.apache.spark.sql.DataFrame) =
      DataQuality.verifyByGroup(df,
        Seq("w" -> window(col("ts"), "1 hour")),
        Seq(InRange("value_0_100", col("value"), 0.0, 100.0)))
        .withColumn("hour", date_format(col("w").getField("start"),
          "yyyy-MM-dd HH:mm:ss")).drop("w")
        .select("hour", "check", "n_rows", "n_violations", "passed")
    val tightBatch = tight(readEvents(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(tightBatch.exists(x => x._2 > 0 && !x._3),
      s"no windowed violations at the tight range: $tightBatch")
  }

  test("streaming distinct-user dedup rollup matches batch count(DISTINCT)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    // chained stateful operators (dedup -> agg) only run in APPEND mode, and
    // append emits a window only once the watermark passes it — so replay the
    // events plus one far-future sentinel event that pushes the final
    // watermark past every real window
    val tmp = java.nio.file.Files.createTempDirectory("ss_dedup").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.windowedDistinctUsers(stream, "1 hour", Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_dedup_t", OutputMode.Append)
    val streamed = spark.table("ss_dedup_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val batch = StreamOps.windowedDistinctUsers(
      readEvents(dir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming windowed mix drift matches batch exactly") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    // static reference mix from the same corpus (production: last week's)
    val ref = StreamOps.mixReference(
      ev.withColumn("ts", expr("timestamp_micros(ts div 1000)")), "event_type")
      .localCheckpoint(true)
    // sentinel pushes the final watermark past every real window (the
    // chained-agg append-mode convention of the tests above)
    val tmp = java.nio.file.Files.createTempDirectory("ss_drift").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.windowedMixDrift(stream, ref, "1 hour", Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_drift_t", OutputMode.Append)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") =!= "__sentinel")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val streamed = asSet(spark.table("ss_drift_t"))
    val batch = asSet(StreamOps.windowedMixDrift(
      readEvents(dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")), ref))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // a type the reference never saw surfaces with n_ref = 0 AND the
    // LOUDEST deviation (dev_x = n_w * tot_ref), never a silent zero —
    // tot_ref is the sum over the reference actually passed in
    val refNoView = ref.filter(col("event_type") =!= "view")
    val totNoView = refNoView.agg(sum("n_ref")).head.getLong(0)
    val missing = StreamOps.windowedMixDrift(
      readEvents(dir).withColumn("ts", expr("timestamp_micros(ts div 1000)")),
      refNoView).filter(col("event_type") === "view").collect()
    assert(missing.nonEmpty && missing.forall(_.getLong(4) == 0L))
    assert(missing.forall(r => r.getLong(5) == totNoView &&
      r.getLong(6) == r.getLong(2) * totNoView && r.getLong(6) > 0L))
  }

  test("streaming portable-HLL distinct estimate matches batch exactly") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    // same sentinel-replay harness as the dedup rollup: chained stateful
    // aggs (bucket-max -> mass rollup) need append mode + a watermark push
    val tmp = java.nio.file.Files.createTempDirectory("ss_hll").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.windowedApproxDistinct(stream,
      watermark = Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_hll_t", OutputMode.Append)
    val streamed = spark.table("ss_hll_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val batch = StreamOps.windowedApproxDistinct(
        readEvents(dir)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // the sketch is a deterministic function of each cell's item set, so
    // streaming must equal batch EXACTLY (estimate and integer mass alike)
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // sanity: estimates land within HLL error of the exact distinct count
    val exact = readEvents(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rels = streamed.toSeq.map { case (h, t, est, _) =>
      val n = exact((h, t)); math.abs(est - n) / math.max(n.toDouble, 1.0)
    }
    assert(rels.sum / rels.size < 0.25,
      f"mean rel err ${rels.sum / rels.size}%.3f")
  }

  test("dp windowed percentile: NULL values fail loud, never absorb as 0.0") {
    // the typed tree Aggregator's primitive-Double encoder coerces null to
    // 0.0 (an IN-RANGE value silently polluting quantiles) — the guard
    // must trip instead
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"), Some(5.0)),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:11:00"), None)
    ).toDF("user_id", "ts", "v")
      .withColumn("v", col("v").cast("double"))
    val e = intercept[Exception] {
      StreamOps.dpWindowedPercentile(df, "user_id", "ts", "v", Seq.empty,
        "1 hour", Seq(50), epsilon = 1e5, delta = 0.0, maxPerCell = 10L,
        lower = 0.0, upper = 10.0, noise = graft.core.NoiseSource.Zero)
        .collect()
    }
    assert(SparkTestSession.chainMsg(e).contains("NULL value"),
      SparkTestSession.chainMsg(e).take(300))
  }

  test("dp windowed percentile: drop-not-sample bound, streams match batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    val bev = ev.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withColumn("v", floor(col("value")))
    def run(df: org.apache.spark.sql.DataFrame, cap: Long) =
      StreamOps.dpWindowedPercentile(df, "user_id", "ts", "v",
        Seq("event_type"), "1 hour", Seq(50, 90), epsilon = 1e5, delta = 0.0,
        maxPerCell = cap, lower = 0.0, upper = 500.0,
        noise = graft.core.NoiseSource.Zero)

    // drop-not-sample: with cap=1, any unit contributing >= 2 values to a
    // cell is EXCLUDED from that cell — replicate the rule directly
    val capped = run(bev, 1L)
      .select(col("window_start"), col("event_type"), col("percentile_50"))
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    val included = bev
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), first(col("v")).as("v"))
      .filter(col("n") === 1)
    assert(capped.nonEmpty)
    // every released cell's median must lie inside the clamp range and the
    // cell must have at least one single-contribution unit
    val cells = included.select(col("w"), col("event_type")).distinct()
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(capped.keySet.subsetOf(cells),
      "a cell with only over-cap units must not release")

    // streaming parity at a generous cap: sentinel replay, exact equality
    val tmp = java.nio.file.Files.createTempDirectory("ss_dp_pct").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withColumn("v", floor(col("value")))
    val agg = StreamOps.dpWindowedPercentile(stream, "user_id", "ts", "v",
      Seq("event_type"), "1 hour", Seq(50, 90), epsilon = 1e5, delta = 0.0,
      maxPerCell = 1000L, lower = 0.0, upper = 500.0,
      noise = graft.core.NoiseSource.Zero, watermark = Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_dp_pct_t", OutputMode.Append)
    val streamed = spark.table("ss_dp_pct_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    val batch = run(bev, 1000L)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("dp windowed count: caps per-unit contributions, streams match batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    val bev = ev.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    // tight cap (1): each unit counts at most once per (window, type) cell
    // => Zero-noise dp count == distinct units per cell
    val capped = StreamOps.dpWindowedCount(bev, "user_id", "ts",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 1L,
        noise = graft.core.NoiseSource.Zero)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    val distinct = bev
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(countDistinct(col("user_id")).cast("double").as("n"))
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    assert(capped == distinct && capped.nonEmpty)

    // streaming parity: chained stateful aggs run append-mode, so replay
    // with a far-future sentinel that pushes the watermark past every
    // real window (the ss_dedup harness)
    val tmp = java.nio.file.Files.createTempDirectory("ss_dp").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.dpWindowedCount(stream, "user_id", "ts",
      Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 3L,
      noise = graft.core.NoiseSource.Zero, watermark = Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_dp_t", OutputMode.Append)
    val streamed = spark.table("ss_dp_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    val batch = StreamOps.dpWindowedCount(bev, "user_id", "ts",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 3L,
        noise = graft.core.NoiseSource.Zero)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    assert(streamed == batch && streamed.nonEmpty)

    // real noise actually perturbs: seeded Laplace at small epsilon must
    // move at least one cell away from its raw value
    val noisy = StreamOps.dpWindowedCount(bev, "user_id", "ts",
        Seq("event_type"), "1 hour", epsilon = 0.1, maxPerCell = 3L,
        noise = graft.core.NoiseSource.Seeded(11L))
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    assert(noisy.keySet == batch.keySet)
    assert(noisy.exists { case (k, v) => v != batch(k) })

    // dp windowed SUM with min=max=1 and maxPerCell=1 collapses to the
    // distinct-unit count (clamp every value to 1, clamp every unit's cell
    // sum to [1,1]) — pins both clamping stages at once
    val sum11 = StreamOps.dpWindowedSum(bev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 1L,
        minValue = 1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    assert(sum11 == distinct)

    // streaming parity for the SUM (tight clamps, same sentinel replay)
    val sumAgg = StreamOps.dpWindowedSum(stream, "user_id", "ts", "value",
      Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 2L,
      minValue = -1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero,
      watermark = Some("10 minutes"))
    StreamOps.runToMemory(spark, sumAgg, "ss_dps_t", OutputMode.Append)
    val sumStreamed = spark.table("ss_dps_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    val sumBatch = StreamOps.dpWindowedSum(bev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 2L,
        minValue = -1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getDouble(2))).toMap
    assert(sumStreamed == sumBatch && sumStreamed.nonEmpty)
  }

  test("dp windowed mean: count+sum in one pass, tight clamps, streams match batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = readEvents("/root/testdata/sf0.001")
    val bev = ev.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    // zero noise + non-binding bounds: dp_mean is the exact window average
    // of the clamped values; dp_count/dp_sum match the standalone releases
    val mean = StreamOps.dpWindowedMean(bev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 1000000L,
        minValue = -1e6, maxValue = 1e6, noise = graft.core.NoiseSource.Zero)
      .collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val exact = bev
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("value")).as("s"))
      .collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(mean.keySet == exact.keySet && mean.nonEmpty)
    mean.foreach { case (k, (n, s, m)) =>
      val (en, es) = exact(k)
      assert(n == en && math.abs(s - es) < 1e-6)
      assert(m == s / math.max(n, 1.0))
    }

    // tight clamps: min=max=1 and maxPerCell=1 collapses dp_sum AND
    // dp_count to the distinct-unit count, so dp_mean == 1 everywhere
    val ones = StreamOps.dpWindowedMean(bev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 1L,
        minValue = 1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero)
      .collect()
    assert(ones.nonEmpty && ones.forall(r => r.getDouble(4) == 1.0))

    // streaming parity on the sentinel replay
    val tmp = java.nio.file.Files.createTempDirectory("ss_dpm").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.limit(1)
      .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("__sentinel"))
      .write.mode("append").parquet(tmp)
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = StreamOps.dpWindowedMean(stream, "user_id", "ts", "value",
      Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 2L,
      minValue = -1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero,
      watermark = Some("10 minutes"))
    StreamOps.runToMemory(spark, agg, "ss_dpm_t", OutputMode.Append)
    val streamed = spark.table("ss_dpm_t")
      .filter(col("event_type") =!= "__sentinel")
      .collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val batch = StreamOps.dpWindowedMean(bev, "user_id", "ts", "value",
        Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 2L,
        minValue = -1.0, maxValue = 1.0, noise = graft.core.NoiseSource.Zero)
      .collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream attribution join matches the batch range join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    // append-mode stream-stream join emits a pair only once the watermark
    // passes its eviction bound — replay with a far-future sentinel on each
    // side so the final watermark clears every real pair
    val tmp = java.nio.file.Files.createTempDirectory("ss_attr").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    Seq("click", "purchase").foreach { t =>
      ev.limit(1)
        .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
        .withColumn("user_id", lit(-1L))
        .withColumn("event_type", lit(t))
        .write.mode("append").parquet(tmp)
    }
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val joined = StreamOps.attributionJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      "1 hour", watermark = Some("2 hours"))
    StreamOps.runToMemory(spark, joined, "ss_attr_t", OutputMode.Append)
    def triples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = triples(spark.table("ss_attr_t")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "click_id", "conv_id").collect())

    val bev = readEvents(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val batch = triples(StreamOps.attributionJoin(
      bev.filter(col("event_type") === "click"),
      bev.filter(col("event_type") === "purchase"), "1 hour")
      .select("user_id", "click_id", "conv_id").collect())
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("LEFT OUTER stream-stream abandonment join matches the batch left join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val ev = readEvents(dir)
    // outer-join null rows emit only once the watermark clears the click's
    // horizon — the far-future sentinel on each side forces that for every
    // real click in the bounded replay
    val tmp = java.nio.file.Files.createTempDirectory("ss_aband").toString
    ev.write.mode("overwrite").parquet(tmp)
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    Seq("click", "purchase").foreach { t =>
      ev.limit(1)
        .withColumn("ts", lit(maxTs + 10L * 3600L * 1000000000L))
        .withColumn("user_id", lit(-1L))
        .withColumn("event_type", lit(t))
        .write.mode("append").parquet(tmp)
    }
    val stream = spark.readStream.schema(ev.schema).parquet(tmp)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val joined = StreamOps.abandonmentJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"),
      "1 hour", watermark = Some("2 hours"))
    StreamOps.runToMemory(spark, joined, "ss_aband_t", OutputMode.Append)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val streamed = pairs(spark.table("ss_aband_t")
      .filter(col("user_id") =!= -1L).collect())

    val bev = readEvents(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val batchFrame = StreamOps.abandonmentJoin(
      bev.filter(col("event_type") === "click"),
      bev.filter(col("event_type") === "purchase"), "1 hour")
    val batch = pairs(batchFrame.collect())
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the abandonment signal is real on this fixture: some clicks have NO
    // conversion in the horizon (a pure-inner fixture would vacuously pass)
    assert(batch.exists(_._2 == -1L), "fixture has no abandoned clicks")
    assert(batch.exists(_._2 != -1L), "fixture has no attributed clicks")
  }

  test("corpus-prep filter runs unchanged on a stream, matching batch") {
    // the fused quality-filter is a pure projection, so the SAME operator
    // must run under Structured Streaming with identical output — this
    // guards against stream-incompatible constructs (windows without
    // watermarks, non-deterministic exprs) creeping into the hot filter
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docsStream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select("doc_id", "text")
    val streamed = graft.ops.CorpusOps.prepPipeline(docsStream, "doc_id", "text")
    StreamOps.runToMemory(spark, streamed, "prep_stream")
    val got = spark.table("prep_stream").collect()
      .map(r => (r.getLong(0), r.getBoolean(6), Option(r.getString(7)))).toSet
    val batch = graft.ops.CorpusOps.prepPipeline(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getBoolean(6), Option(r.getString(7)))).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("online near-dup ingest: fold == batch face, through a real foreachBatch drive") {
    import org.apache.spark.sql.{DataFrame, Row}
    import graft.ops.Dedup
    val base = "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the woods chasing rabbits all day long without rest"
    def doc(i: Long): String =
      if (i == 2L) base
      else if (i == 5L || i == 20L) base + " with an extra tail" // near-dups of 2
      else if (i == 35L) base + " with an extra tail appended twice over"
      else s"unique content $i " + (s"totally different subject ${i * 13} " * 4)
    val docs = (0L until 40L).map(i => (i, doc(i))).toDF("doc_id", "text")
      .localCheckpoint(true)
    val batches = Seq(
      docs.filter(col("doc_id") < 13),
      docs.filter(col("doc_id") >= 13 && col("doc_id") < 26),
      docs.filter(col("doc_id") >= 26))
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batchLog = asSet(Dedup.onlineNearDupLog(docs, "doc_id", "text"))
    // driver-side fold over the same micro-batches
    assert(asSet(StreamOps.onlineNearDupIngest(batches, "doc_id", "text")) == batchLog)
    // REAL foreachBatch drive: one MemoryStream batch per ingest batch,
    // signature store accumulated across micro-batches in the closure
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    var store: Option[DataFrame] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        // pin the micro-batch before it expires: the grown store outlives
        // this batch, so nothing lazy may still reference the stream
        val stable = b.localCheckpoint(true)
        val (log, grown) = StreamOps.onlineNearDupStep(stable, store, "doc_id", "text")
        seen ++= log.collect()
        store = Some(grown.localCheckpoint(true))
        ()
      }
      .start()
    batches.foreach { b =>
      input.addData(b.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = seen.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batchLog)
    // the cross-batch store path really fired: doc 20 (batch 2) matches an
    // earlier-batch doc (2 or its twin 5, both < 13)
    val r20 = streamed.find(_._1 == 20L).get
    assert(r20._2 == 1L && r20._3 < 13L, s"r20=$r20")
    // and a doc with no earlier match logs clean
    assert(streamed.find(_._1 == 2L).get._2 == 0L)
  }

  test("ingest store contracts fail loud: out-of-order near-dup, replayed link ids") {
    import graft.ops.{ExactField, FuzzyStringField, NumericField}
    // near-dup: batch ids must exceed every store id (the 'earlier doc'
    // contract); a replay/backfill must be rejected, not silently inverted
    val d1 = Seq((10L, "some document text here"), (11L, "other text entirely"))
      .toDF("doc_id", "text")
    val (_, store) = StreamOps.onlineNearDupStep(d1, None, "doc_id", "text")
    val replay = Seq((10L, "some document text here")).toDF("doc_id", "text")
    val e1 = intercept[IllegalStateException](
      StreamOps.onlineNearDupStep(replay, Some(store), "doc_id", "text"))
    assert(e1.getMessage.contains("ascending"), e1.getMessage)
    // an in-order batch still folds
    val next = Seq((12L, "fresh content never seen")).toDF("doc_id", "text")
    val (log2, _) = StreamOps.onlineNearDupStep(next, Some(store), "doc_id", "text")
    assert(log2.count() == 1)
    // linkage: a batch id already in the store would double-generate its
    // pairs through both orientation arms of the incremental join
    val rules = Seq(
      FuzzyStringField("name", col("nm"), maxEdit = 1, 30L, -20L),
      ExactField("segment", col("seg"), 10L, -15L),
      NumericField("balance", col("bal"), 0.01, 20L, -10L))
    val b1 = Seq((1L, "b1", "alice smith", "A", 10.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val (_, lstore) = StreamOps.onlineLinkStep(b1, None, "id", Seq(col("blk")),
      rules, 45L)
    val b2 = Seq((1L, "b1", "alice smith", "A", 10.0),
      (2L, "b1", "alice smyth", "A", 10.005))
      .toDF("id", "blk", "nm", "seg", "bal")
    // the guard is IN-PLAN (r13): it rides the step's pairs output as a
    // 1-row broadcast cross, so it fires on evaluation — no extra job
    val (badPairs, _) =
      StreamOps.onlineLinkStep(b2, Some(lstore), "id", Seq(col("blk")), rules, 45L)
    val e2 = intercept[Exception](badPairs.collect())
    assert(graft.spark.SparkTestSession.chainMsg(e2).contains("NEW ids"),
      graft.spark.SparkTestSession.chainMsg(e2).take(300))
    // and it fires even when the batch generates ZERO pairs (the guard is
    // the broadcast side of the cross — materialized regardless)
    val b2b = Seq((1L, "zz", "nobody here", "Z", 99.0))
      .toDF("id", "blk", "nm", "seg", "bal")
    val (badEmpty, _) =
      StreamOps.onlineLinkStep(b2b, Some(lstore), "id", Seq(col("blk")), rules, 45L)
    val e2b = intercept[Exception](badEmpty.collect())
    assert(graft.spark.SparkTestSession.chainMsg(e2b).contains("NEW ids"),
      graft.spark.SparkTestSession.chainMsg(e2b).take(300))
  }

  test("sessionize state is O(1) and merges endpoints across micro-batches") {
    // the summary must come out identical whether a user's events arrive
    // in one micro-batch or many — the SessionAcc endpoint merge replaced
    // an unbounded event buffer (r12 streaming review), so cross-batch
    // accumulation is the path to pin
    import StreamOps._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val out = sessionize(input.toDS(), gapSeconds = 1)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_acc")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    // batch 1: the MIDDLE of the session; batch 2: both endpoints — the
    // merged summary must use event-time endpoints, not arrival order
    input.addData(SessionEvent(7L, ts(50), "mid"))
    Thread.sleep(300)
    input.addData(SessionEvent(7L, ts(90), "last"), SessionEvent(7L, ts(10), "first"))
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("sessions_acc").count() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    val s = spark.table("sessions_acc").as[SessionSummary].collect().head
    assert(s.user_id == 7L && s.n_events == 3, s.toString)
    assert(s.first_type == "first" && s.last_type == "last", s.toString)
    assert(s.duration_seconds == 80, s.toString)
  }

  test("online record linkage: fold == one-shot, through a real foreachBatch drive") {
    import org.apache.spark.sql.{DataFrame, Row}
    import graft.ops.{ExactField, FuzzyStringField, NumericField, RecordLinkage}
    // ids 1/2 (batch 1) and 4/8 (batches 2/3) are true pairs; 1/8 pairs
    // CROSS-batch (batch-3 member vs the stored batch-1 record)
    val recs = Seq(
      (1L, "b1", "alice smith", "A", 10.0),
      (2L, "b1", "alice smyth", "A", 10.005),
      (3L, "b1", "bob jones", "B", 50.0),
      (4L, "b1", "carol white", "C", 30.0),
      (8L, "b1", "alice smitt", "A", 10.002),
      (9L, "b1", "carol whyte", "C", 30.001)
    ).toDF("id", "blk", "nm", "seg", "bal").localCheckpoint(true)
    val rules = Seq(
      FuzzyStringField("name", col("nm"), maxEdit = 1, 30L, -20L),
      ExactField("segment", col("seg"), 10L, -15L),
      NumericField("balance", col("bal"), 0.01, 20L, -10L))
    val batches = Seq(recs.filter(col("id") <= 2), recs.filter(col("id") === 3 || col("id") === 4),
      recs.filter(col("id") >= 8))
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    val oneShot = asSet(RecordLinkage.linkPairs(recs, "id", Seq(col("blk")),
      rules, 45L))
    // smyth/smitt is 2 edits so (2, 8) drops; (4, 9) is carol/carol
    assert(oneShot == Set((1L, 2L, 60L), (1L, 8L, 60L), (4L, 9L, 60L)))
    // driver-side fold over the same micro-batches
    assert(asSet(StreamOps.onlineLinkIngest(batches, "id", Seq(col("blk")),
      rules, 45L)) == oneShot)
    // REAL foreachBatch drive, store accumulated in the closure
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, String, Double)]
    var store: Option[DataFrame] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = input.toDF().toDF("id", "blk", "nm", "seg", "bal").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val stable = b.localCheckpoint(true)
        val (pairs, grown) = StreamOps.onlineLinkStep(stable, store, "id",
          Seq(col("blk")), rules, 45L)
        seen ++= pairs.collect()
        store = Some(grown.localCheckpoint(true))
        ()
      }
      .start()
    batches.foreach { b =>
      input.addData(b.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3), r.getDouble(4))).toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = seen.map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    assert(streamed == oneShot)
    // the cross-batch path really fired: (1, 8) spans batches 1 and 3
    assert(streamed.contains((1L, 8L, 60L)), s"streamed=$streamed")
    // and within-batch linking too: (1, 2) is inside batch 1
    assert(streamed.contains((1L, 2L, 60L)))
  }

  test("continual counter fold == batch face through a REAL foreachBatch drive") {
    import org.apache.spark.sql.functions._
    // ticks 0..7 over three ascending micro-batches; release watermark
    // follows each batch's max tick (the nightly-release pattern)
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 5L), (4L, 6L), (5L, 7L)).map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    val oneShot = StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = graft.core.NoiseSource.Zero)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    var store: Option[StreamOps.ContinualStore] = None
    var releasedThrough = -1L
    val out = scala.collection.mutable.Map.empty[Long, Double]
    val q = input.toDF().toDF("user_id", "tick", "key").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val stable = b.localCheckpoint(true)
        if (stable.count() > 0) {
          val hi = stable.agg(max(col("tick"))).head().getLong(0)
          val (rel, grown) = StreamOps.onlineContinualStep(stable, store,
            "user_id", col("tick"), Seq("key"), horizon = 8, epsilon = 1.0,
            maxPerTick = 100L, noise = graft.core.NoiseSource.Zero,
            releasedThrough = releasedThrough, releaseThrough = hi)
          rel.collect().foreach(r => out(r.getLong(0)) = r.getDouble(2))
          store = Some(grown.copy(
            nodeSums = grown.nodeSums.localCheckpoint(true),
            nodeNoise = grown.nodeNoise.localCheckpoint(true)))
          releasedThrough = hi
        }
        ()
      }
      .start()
    Seq(rows.take(3), rows.slice(3, 5), rows.drop(5)).foreach { g =>
      input.addData(g)
      q.processAllAvailable()
    }
    q.stop()
    // the final watermark released through tick 7 = the full horizon:
    // the drive's releases must equal the one-shot batch release
    assert(out.toMap == oneShot, s"streamed=$out one-shot=$oneShot")
  }

  test("continual counter fold: == batch face, draw-once across batches, contracts") {
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L),
      (4L, 6L)).map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    object ConstOne extends graft.core.NoiseSource {
      def laplace(b: Double): Double = 1.0
      def gaussian(sigma: Double): Double = 1.0
      def uniform(): Double = 0.5
    }
    def fold(src: graft.core.NoiseSource): Map[Long, Double] = {
      // three steps: ticks {0..2} released through 2, {3..5} through 5,
      // {6..7} through 7 — batch 2 has no tick-4/5 data (empty ticks
      // still release), batch 3 covers the tail
      val plan = Seq((df.filter(col("tick") <= 2), -1L, 2L),
        (df.filter(col("tick") === 3), 2L, 5L),
        (df.filter(col("tick") === 6), 5L, 7L))
      var store: Option[StreamOps.ContinualStore] = None
      val out = scala.collection.mutable.Map.empty[Long, Double]
      plan.foreach { case (b, relFrom, relTo) =>
        val (rel, grown) = StreamOps.onlineContinualStep(b, store, "user_id",
          col("tick"), Seq("key"), horizon = 8, epsilon = 1.0,
          maxPerTick = 100L, noise = src,
          releasedThrough = relFrom, releaseThrough = relTo)
        rel.collect().foreach(r => out(r.getLong(0)) = r.getDouble(2))
        store = Some(grown.copy(
          nodeSums = grown.nodeSums.localCheckpoint(true),
          nodeNoise = grown.nodeNoise.localCheckpoint(true)))
      }
      out.toMap
    }
    val prefix = Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 6.0, 4L -> 6.0,
      5L -> 6.0, 6L -> 7.0, 7L -> 7.0)
    // zero noise: the fold's releases equal the batch face / exact prefix
    assert(fold(graft.core.NoiseSource.Zero) == prefix)
    // draw-once ACROSS batches: with a constant-1 source, release(t) =
    // prefix(t) + popcount(t+1) exactly as in the one-shot mechanism —
    // node (2,0) (covering ticks 0-3) is drawn when tick 3 releases in
    // step 2 and REUSED by later prefixes, never redrawn
    val one = fold(ConstOne)
    (0L to 7L).foreach { t =>
      val want = prefix(t) + java.lang.Long.bitCount(t + 1)
      assert(one(t) == want, s"t=$t got ${one(t)} want $want")
    }
    // contract: a tick at or below the released frontier fails loud
    val (rel1, st1) = StreamOps.onlineContinualStep(df.filter(col("tick") <= 2),
      None, "user_id", col("tick"), Seq("key"), 8, 1.0, 100L,
      graft.core.NoiseSource.Zero, -1L, 4L)
    rel1.collect()
    val late = Seq((9L, 4L, "k")).toDF("user_id", "tick", "key")
    val e = intercept[Exception] {
      StreamOps.onlineContinualStep(late, Some(st1), "user_id", col("tick"),
        Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero, 4L, 6L)
        ._1.collect()
    }
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("ascend"),
      graft.spark.SparkTestSession.chainMsg(e).take(300))
  }

  test("continual fold survives a RESTART: draws persist bit-exact through the parquet store") {
    import org.apache.spark.sql.functions._
    // the 3-batch fold plan of the draw-once spec, but the store is
    // WRITTEN to parquet and re-read COLD between every step (fresh
    // plans rooted at the files, no in-memory lineage) — the restart a
    // real deployment does across JVMs/checkpoints
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L),
      (4L, 6L)).map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object CountingOne extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter.incrementAndGet(); 1.0 }
      def gaussian(sigma: Double): Double = { counter.incrementAndGet(); 1.0 }
      def uniform(): Double = 0.5
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_continual_restart_").toString
    val plan = Seq((df.filter(col("tick") <= 2), -1L, 2L),
      (df.filter(col("tick") === 3), 2L, 5L),
      (df.filter(col("tick") === 6), 5L, 7L))
    val out = scala.collection.mutable.Map.empty[Long, Double]
    plan.zipWithIndex.foreach { case ((b, relFrom, relTo), i) =>
      // every step resumes from the COLD store (none for the first)
      val store = if (i == 0) None
        else Some(StreamOps.loadContinualStore(spark, s"$dir/step$i"))
      val (rel, grown) = StreamOps.onlineContinualStep(b, store, "user_id",
        col("tick"), Seq("key"), horizon = 8, epsilon = 1.0,
        maxPerTick = 100L, noise = CountingOne,
        releasedThrough = relFrom, releaseThrough = relTo)
      rel.collect().foreach(r => out(r.getLong(0)) = r.getDouble(2))
      StreamOps.saveContinualStore(grown, s"$dir/step${i + 1}")
    }
    // the ConstOne popcount identity holds THROUGH the restarts: node
    // (lvl, idx) draws in the step that first releases it and is
    // re-read, never re-drawn, by every later prefix
    val prefix = Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 6.0, 4L -> 6.0,
      5L -> 6.0, 6L -> 7.0, 7L -> 7.0)
    (0L to 7L).foreach { t =>
      val want = prefix(t) + java.lang.Long.bitCount(t + 1)
      assert(out(t) == want, s"t=$t got ${out(t)} want $want")
    }
    // draw-once ACROSS RESTARTS, counted: the 8 prefixes of horizon 8
    // decompose over exactly 8 distinct nodes x 1 key — a resume that
    // re-drew stored nodes would count extras
    assert(counter.get == 8L, s"draws across restarted fold = ${counter.get}")
    // the calibration metadata survives the round-trip and still
    // enforces equality: resuming at a different epsilon fails loud
    val reloaded = StreamOps.loadContinualStore(spark, s"$dir/step3")
    assert(reloaded.maxTick == 6L && reloaded.scale > 0)
    val next = Seq((5L, 7L, "k")).toDF("user_id", "tick", "key")
    val e = intercept[Exception] {
      StreamOps.onlineContinualStep(next, Some(reloaded), "user_id",
        col("tick"), Seq("key"), 8, 2.0, 100L, CountingOne, 7L, 7L)
    }
    assert(graft.spark.SparkTestSession.chainMsg(e)
      .contains("calibration-specific"))
    // a dir with no metadata cannot resume (fail loud, shaped)
    val e2 = intercept[IllegalStateException](
      StreamOps.loadContinualStore(spark, s"$dir/nowhere"))
    assert(e2.getMessage.contains("no calibration metadata"))
    // EMPTY-NOISE edge: a store saved BEFORE any release (ingest-only
    // step — releaseThrough <= releasedThrough draws nothing) must
    // round-trip too: the empty noise frame's parquet must read back
    // with its schema, and the resumed fold from the cold store must
    // still equal the one-shot releases
    val (rel0, st0) = StreamOps.onlineContinualStep(
      df.filter(col("tick") <= 2), None, "user_id", col("tick"),
      Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero,
      releasedThrough = -1L, releaseThrough = -1L)
    assert(rel0.count() == 0L && st0.nodeNoise.count() == 0L)
    StreamOps.saveContinualStore(st0, s"$dir/empty_noise")
    val cold = StreamOps.loadContinualStore(spark, s"$dir/empty_noise")
    assert(cold.nodeNoise.count() == 0L && cold.maxTick == 2L)
    val (rel1b, _) = StreamOps.onlineContinualStep(
      df.filter(col("tick") === 3), Some(cold), "user_id", col("tick"),
      Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero,
      releasedThrough = -1L, releaseThrough = 3L)
    val got = rel1b.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 6.0),
      s"resumed-from-empty-noise release: $got")
  }

  test("windowed DP releases pin their draws for batch consumers (no multi-action redraw)") {
    import org.apache.spark.sql.functions._
    // the r13/r14 continual-family defect class, checked on the WINDOWED
    // family: collecting a batch release twice must NOT draw twice.
    // Draws run in executor tasks, so the count crosses the
    // closure-serialization boundary via an accumulator (the
    // longitudinal-spec lesson — an AtomicLong counts a per-task copy)
    val acc = spark.sparkContext.longAccumulator("dpw_draws")
    class AccLap extends graft.core.NoiseSource with Serializable {
      def laplace(b: Double): Double = { acc.add(1L); 0.0 }
      def gaussian(sigma: Double): Double = { acc.add(1L); 0.0 }
      def uniform(): Double = 0.5
    }
    val rows = (1 to 200).map { i =>
      (i.toLong, new java.sql.Timestamp(3600000L * (i % 3)),
        s"t${i % 2}", i.toDouble)
    }
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val rel = StreamOps.dpWindowedCount(df, "user_id", "ts",
      Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 100L,
      noise = new AccLap)
    val first = rel.collect()
    val drawsAfterFirst = acc.value
    assert(drawsAfterFirst == first.length.toLong,
      s"draws $drawsAfterFirst != cells ${first.length}")
    // second action: the pinned release re-reads, never re-draws
    val second = rel.collect()
    assert(acc.value == drawsAfterFirst,
      s"second collect re-drew: ${acc.value} vs $drawsAfterFirst — a " +
        "batch consumer would silently spend epsilon twice")
    assert(second.map(_.toString).sorted.sameElements(
      first.map(_.toString).sorted))
    // the mean release pins BOTH its draw sets
    val relM = StreamOps.dpWindowedMean(df, "user_id", "ts", "value",
      Seq("event_type"), "1 hour", epsilon = 1.0, maxPerCell = 100L,
      minValue = 0.0, maxValue = 1000.0, noise = new AccLap)
    val before = acc.value
    val m1 = relM.collect()
    val afterM = acc.value
    assert(afterM - before == 2L * m1.length)
    relM.collect()
    assert(acc.value == afterM, "mean release re-drew on second action")
  }

  test("continual fold through a REAL checkpointed StreamingQuery: restart resumes, draw-once holds, replays are idempotent, disagreement fails loud") {
    import org.apache.spark.sql.DataFrame
    // THE full restart surface (r17): a file-source stream driven by
    // three SEPARATE StreamingQuery objects over ONE checkpointLocation —
    // each run drains the new file with Trigger.AvailableNow and stops,
    // the next run is a genuine restart (new query, cold state) that must
    // resume from the checkpoint + persisted store without reprocessing,
    // re-drawing, or double-counting. Extends the cold-reload spec
    // (which drove the folds inside one session) to real checkpoints.
    val root = java.nio.file.Files
      .createTempDirectory("graft_ckpt_restart_").toString
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    val state = s"$root/state"
    new java.io.File(inDir).mkdirs()
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object CountingOne extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter.incrementAndGet(); 1.0 }
      def gaussian(s: Double): Double = { counter.incrementAndGet(); 1.0 }
      def uniform(): Double = 0.5
    }
    def writeFile(name: String, rows: Seq[(Long, Long, String)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$inDir/$name"),
        rows.map { case (u, t, k) =>
          s"""{"user_id":$u,"tick":$t,"key":"$k"}""" }.mkString("\n"))
    def runDrive(): Unit = {
      val q = spark.readStream
        .schema("user_id LONG, tick LONG, key STRING")
        .option("maxFilesPerTrigger", 1)
        .json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          StreamOps.continualCheckpointStep(b, id, state, "user_id",
            col("tick"), Seq("key"), horizon = 8, epsilon = 1.0,
            maxPerTick = 100L, noise = CountingOne)
        }
        .start()
      q.awaitTermination()
    }
    // session 1: ticks 0..2 arrive -> batch 0 releases (-1, 2]
    writeFile("b0.json", Seq((1L, 0L, "k"), (2L, 0L, "k"), (1L, 2L, "k")))
    runDrive()
    // RESTART 1 (new query object, same checkpoint + state): tick 3
    writeFile("b1.json", Seq((1L, 3L, "k"), (2L, 3L, "k"), (3L, 3L, "k")))
    runDrive()
    // RESTART 2: tick 6 -> releases (3, 6]
    writeFile("b2.json", Seq((4L, 6L, "k")))
    runDrive()
    // exactly three batches committed; the restarts did NOT reprocess b0
    val meta = StreamOps.resolveStreamMeta(spark, state,
      "StreamOpsSpec").get
    assert(meta.getAs[Long]("last_batch_id") == 2L &&
      meta.getAs[Long]("released_through") == 6L, meta.toString)
    val streamed = spark.read.parquet(s"$state/releases/batch_0",
        s"$state/releases/batch_1", s"$state/releases/batch_2")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // one-shot equivalence ACROSS the restarts: the same 3-step fold run
    // directly (its own draw counter) must release the identical values
    // with the identical number of draws
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 3L), (4L, 6L)).map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    val counter2 = new java.util.concurrent.atomic.AtomicLong(0)
    object CountingOne2 extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter2.incrementAndGet(); 1.0 }
      def gaussian(s: Double): Double = { counter2.incrementAndGet(); 1.0 }
      def uniform(): Double = 0.5
    }
    val plan = Seq((df.filter(col("tick") <= 2), -1L, 2L),
      (df.filter(col("tick") === 3), 2L, 3L),
      (df.filter(col("tick") === 6), 3L, 6L))
    var store: Option[StreamOps.ContinualStore] = None
    val direct = scala.collection.mutable.Map.empty[Long, Double]
    plan.foreach { case (b, relFrom, relTo) =>
      val (rel, grown) = StreamOps.onlineContinualStep(b, store, "user_id",
        col("tick"), Seq("key"), 8, 1.0, 100L, CountingOne2, relFrom, relTo)
      rel.collect().foreach(r => direct(r.getLong(0)) = r.getDouble(2))
      store = Some(grown.copy(
        nodeSums = grown.nodeSums.localCheckpoint(true),
        nodeNoise = grown.nodeNoise.localCheckpoint(true)))
    }
    assert(streamed == direct.toMap,
      s"restarted-stream releases $streamed != one-shot fold $direct")
    assert(counter.get == counter2.get,
      s"draws across restarts ${counter.get} != one-shot draws " +
        s"${counter2.get} — a restart re-drew persisted nodes")
    // at-least-once REPLAY of the last committed batch is idempotent:
    // the fold is skipped outright — no draws, no meta movement
    val drawsBefore = counter.get
    StreamOps.continualCheckpointStep(
      Seq((4L, 6L, "k")).toDF("user_id", "tick", "key"), 2L, state,
      "user_id", col("tick"), Seq("key"), 8, 1.0, 100L, CountingOne)
    assert(counter.get == drawsBefore, "a committed replay re-folded")
    assert(StreamOps.resolveStreamMeta(spark, state, "StreamOpsSpec").get
      .getAs[Long]("last_batch_id") == 2L)
    // checkpoint/store DISAGREEMENT fails loud: a batch id with a gap
    // (stale/lost store snapshot) and a progressed checkpoint over an
    // empty state dir both surface shaped errors, never silent skips
    val e1 = intercept[IllegalStateException] {
      StreamOps.continualCheckpointStep(
        Seq((5L, 7L, "k")).toDF("user_id", "tick", "key"), 4L, state,
        "user_id", col("tick"), Seq("key"), 8, 1.0, 100L, CountingOne)
    }
    assert(e1.getMessage.contains("DISAGREE"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      StreamOps.continualCheckpointStep(
        Seq((5L, 7L, "k")).toDF("user_id", "tick", "key"), 3L,
        s"$root/empty_state", "user_id", col("tick"), Seq("key"),
        8, 1.0, 100L, CountingOne)
    }
    assert(e2.getMessage.contains("no committed state"), e2.getMessage)
  }

  test("OLH fold through REAL checkpointed restarts via the generic store-fold adapter") {
    import org.apache.spark.sql.DataFrame
    // the generic adapter extends the continual family's restart story
    // to every store-fold op: here the OLH additive-cells fold, driven
    // by three SEPARATE StreamingQuery objects over one checkpoint
    val dom = Seq("a", "b", "c")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sfold_restart_").toString
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    val state = s"$root/state"
    new java.io.File(inDir).mkdirs()
    def writeFile(name: String, ids: Range): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$inDir/$name"),
        ids.map(i => s"""{"uid":$i,"v":"${dom(i % 3)}"}""").mkString("\n"))
    def runDrive(): Unit = {
      val q = spark.readStream.schema("uid LONG, v STRING")
        .option("maxFilesPerTrigger", 1).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          StreamOps.checkpointedStoreFold(b, id, state) { (batch, store) =>
            graft.spark.LocalDP.olhIngestStep(batch, store, "uid",
              col("v"), dom, 1.0, graft.core.NoiseSource.Zero)
          }
        }
        .start()
      q.awaitTermination()
    }
    // unit-partitioned batches (the fold's bounding contract), one per run
    writeFile("b0.json", 1 to 30)
    runDrive()
    writeFile("b1.json", 31 to 60)
    runDrive() // RESTART 1
    writeFile("b2.json", 61 to 90)
    runDrive() // RESTART 2
    // the committed store estimates exactly the one-shot release
    val est = graft.spark.LocalDP.olhEstimate(
        StreamOps.loadCheckpointedStore(spark, state)
          .localCheckpoint(false), dom, 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val oneShot = graft.spark.LocalDP.ldpFrequencyOLH(
        (1 to 90).map(i => (i.toLong, dom(i % 3))).toDF("uid", "v"),
        "uid", col("v"), dom, 1.0, graft.core.NoiseSource.Zero)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(est == oneShot, s"restarted fold $est != one-shot $oneShot")
    // committed replay is idempotent; a gap fails loud
    val cellsBefore = StreamOps.loadCheckpointedStore(spark, state)
      .collect().map(_.toString).sorted.toSeq
    StreamOps.checkpointedStoreFold(
      (61 to 90).map(i => (i.toLong, dom(i % 3))).toDF("uid", "v"),
      2L, state) { (b, st) =>
      graft.spark.LocalDP.olhIngestStep(b, st, "uid", col("v"), dom,
        1.0, graft.core.NoiseSource.Zero)
    }
    assert(StreamOps.loadCheckpointedStore(spark, state)
      .collect().map(_.toString).sorted.toSeq == cellsBefore,
      "a committed replay re-folded the store")
    val e = intercept[IllegalStateException] {
      StreamOps.checkpointedStoreFold(
        Seq((91L, "a")).toDF("uid", "v"), 7L, state) { (b, st) =>
        graft.spark.LocalDP.olhIngestStep(b, st, "uid", col("v"), dom,
          1.0, graft.core.NoiseSource.Zero)
      }
    }
    assert(e.getMessage.contains("DISAGREE"), e.getMessage)
    intercept[IllegalStateException](
      StreamOps.loadCheckpointedStore(spark, s"$root/nowhere"))
  }

  test("streaming reservoir: fold == one-shot under any split, replay-idempotent, uniform") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 300).map(i => (i.toLong, s"k${i % 3}", i * 10))
    val df = rows.toDF("id", "key", "payload")
    def sample(batches: Seq[org.apache.spark.sql.DataFrame]) =
      StreamOps.onlineReservoirIngest(batches, Seq("key"), "id", k = 4)
        .select("key", "id", "payload").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = sample(Seq(df))
    // any batch split folds to the one-shot bottom-k (min-k associativity)
    val split3 = sample(Seq(df.filter(col("id") <= 100),
      df.filter(col("id") > 100 && col("id") <= 200),
      df.filter(col("id") > 200)))
    assert(split3 == oneShot)
    // REPLAYED rows collapse to one slot (idempotence)
    val replayed = sample(Seq(df.filter(col("id") <= 150), df))
    assert(replayed == oneShot)
    // cap holds: 4 per key, 3 keys
    assert(oneShot.size == 12 &&
      oneShot.groupBy(_._1).forall(_._2.size == 4))
    // payloads ride: every sampled row carries its original payload
    assert(oneShot.forall { case (_, id, p) => p == id * 10 })
    // UNIFORMITY across salts: element 1's inclusion rate over 60 salts
    // ~ k/n_key = 4/100; binomial sd = sqrt(.04*.96/60) ~ 0.025 — allow 5 sd
    val hits = (1 to 60).count { s =>
      StreamOps.onlineReservoirStep(df.filter(col("key") === "k1"), None,
          Seq("key"), "id", k = 4, salt = s"s$s")
        .filter(col("id") === 1L).count() > 0
    }
    val rate = hits / 60.0
    assert(rate < 0.04 + 5 * 0.025, s"inclusion rate $rate — not uniform")
    // NULL id fails loud
    val e = intercept[Exception](StreamOps.onlineReservoirStep(
      Seq((null.asInstanceOf[java.lang.Long], "k", 1)).toDF("id", "key", "p"),
      None, Seq("key"), "id", 4).collect())
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("NULL id"))
    // a store accidentally passed as a batch fails loud
    val st = StreamOps.onlineReservoirStep(df, None, Seq("key"), "id", 4)
    val e2 = intercept[IllegalArgumentException](
      StreamOps.onlineReservoirStep(st, None, Seq("key"), "id", 4))
    assert(e2.getMessage.contains("__prio"))
  }

  test("continual fold: mid-stream calibration change fails loud") {
    import org.apache.spark.sql.functions._
    // the store's persisted draws are calibration-specific — a step that
    // changes epsilon (or the noise kind) must be rejected, not silently
    // mixed at wrong scales (r14 advice)
    val df = Seq((1L, 0L, "k"), (2L, 1L, "k")).toDF("user_id", "tick", "key")
    val (rel0, st0) = StreamOps.onlineContinualStep(df, None, "user_id",
      col("tick"), Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero,
      -1L, 1L)
    rel0.collect()
    val next = Seq((3L, 2L, "k")).toDF("user_id", "tick", "key")
    val eEps = intercept[IllegalArgumentException] {
      StreamOps.onlineContinualStep(next, Some(st0), "user_id", col("tick"),
        Seq("key"), 8, 0.5, 100L, graft.core.NoiseSource.Zero, 1L, 2L)
    }
    assert(eEps.getMessage.contains("calibration-specific"), eEps.getMessage)
    val eKind = intercept[IllegalArgumentException] {
      StreamOps.onlineContinualStep(next, Some(st0), "user_id", col("tick"),
        Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero, 1L, 2L,
        noiseKind = graft.core.NoiseKind.Gaussian, delta = 1e-6)
    }
    assert(eKind.getMessage.contains("calibration-specific"), eKind.getMessage)
    // the SAME calibration continues fine
    val (rel2, _) = StreamOps.onlineContinualStep(next, Some(st0), "user_id",
      col("tick"), Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero,
      1L, 2L)
    assert(rel2.collect().nonEmpty)
  }

  test("continual mean: split-budget trees from one pass, ratio post-processing") {
    import org.apache.spark.sql.functions._
    // (user, tick, value) — t1/t4/t5/t7 empty (they still release)
    val df = Seq((1L, 0L, 10.0), (2L, 0L, 4.0), (1L, 2L, 6.0),
      (1L, 3L, 2.0), (2L, 3L, 8.0), (3L, 3L, 100.0), (4L, 6L, 5.0))
      .map { case (u, t, v) => (u, t, v, "k") }
      .toDF("user_id", "tick", "v", "key")
    def mean(src: graft.core.NoiseSource, maxPerTick: Long = 100L,
        maxValue: Double = 1000.0) =
      StreamOps.dpContinualMean(df, "user_id", col("tick"), "v", Seq("key"),
          horizon = 8, epsilon = 1.0, maxPerTick = maxPerTick,
          minValue = 0.0, maxValue = maxValue, noise = src)
        .collect().map(r => r.getLong(0) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // zero noise, non-binding caps: exact running count/sum/mean per tick
    val cPfx = Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 6.0, 4L -> 6.0,
      5L -> 6.0, 6L -> 7.0, 7L -> 7.0)
    val sPfx = Map(0L -> 14.0, 1L -> 14.0, 2L -> 20.0, 3L -> 130.0,
      4L -> 130.0, 5L -> 130.0, 6L -> 135.0, 7L -> 135.0)
    val got = mean(graft.core.NoiseSource.Zero)
    assert(got.keySet == (0L to 7L).toSet, got.keySet.toString)
    (0L to 7L).foreach { t =>
      assert(got(t) == ((cPfx(t), sPfx(t), sPfx(t) / math.max(cPfx(t), 1.0))),
        s"t=$t got ${got(t)}")
    }
    // split-budget structure: a source echoing its scale b as the draw
    // pins BOTH trees' per-node Laplace scales (count: maxPerTick *
    // (levels+1) / (eps/2) = 100*4/0.5 = 800; sum: *maxValue = 800000)
    // AND draw-once per node via the popcount identity — release(t) reads
    // exactly popcount(t+1) nodes of each tree
    object EchoB extends graft.core.NoiseSource {
      def laplace(b: Double): Double = b
      def gaussian(sigma: Double): Double = sigma
      def uniform(): Double = 0.5
    }
    val echoed = mean(EchoB)
    (0L to 7L).foreach { t =>
      val pc = java.lang.Long.bitCount(t + 1)
      val wantC = cPfx(t) + pc * 800.0
      val wantS = sPfx(t) + pc * 800000.0
      assert(echoed(t)._1 == wantC && echoed(t)._2 == wantS,
        s"t=$t got ${echoed(t)} want ($wantC, $wantS)")
      assert(echoed(t)._3 == wantS / math.max(wantC, 1.0))
    }
    // binding caps, zero noise: value clamp to [0, 10], per-unit-tick
    // count capped at 2 — u3's 100.0 clamps to 10, and a unit with 3 rows
    // in one tick would cap (none here, the caps bind on value only)
    val clamped = mean(graft.core.NoiseSource.Zero, maxPerTick = 2L,
      maxValue = 10.0)
    val sClamp = Map(0L -> 14.0, 1L -> 14.0, 2L -> 20.0, 3L -> 40.0,
      4L -> 40.0, 5L -> 40.0, 6L -> 45.0, 7L -> 45.0)
    (0L to 7L).foreach { t =>
      assert(clamped(t) == ((cPfx(t), sClamp(t),
        sClamp(t) / math.max(cPfx(t), 1.0))), s"t=$t got ${clamped(t)}")
    }
    // NULL value fails loud (the family's clipping contract)
    val withNull = Seq((1L, 0L, null.asInstanceOf[java.lang.Double], "k"))
      .toDF("user_id", "tick", "v", "key")
    val e = intercept[Exception](
      StreamOps.dpContinualMean(withNull, "user_id", col("tick"), "v",
        Seq("key"), 8, 1.0, 100L, 0.0, 1000.0,
        graft.core.NoiseSource.Zero).collect())
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("NULL value"),
      graft.spark.SparkTestSession.chainMsg(e).take(300))
  }

  test("sessionization closes sessions after the inactivity gap") {
    import StreamOps._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val events = spark.createDataset(Seq(
      SessionEvent(1L, ts(0), "view"), SessionEvent(1L, ts(30), "click"),
      SessionEvent(2L, ts(10), "view")))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    input.addData(events.collect().toSeq)
    val out = sessionize(input.toDS(), gapSeconds = 1)
    // NOTE: processAllAvailable() is unusable with ProcessingTimeTimeout —
    // the engine keeps scheduling no-data batches (that's how timeouts fire),
    // so "all available" never settles. Poll the sink with a deadline.
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("sessions").count() < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    val sessions = spark.table("sessions").as[SessionSummary].collect()
      .map(s => s.user_id -> s).toMap
    assert(sessions.size == 2, s"sessions=$sessions")
    assert(sessions(1L).n_events == 2 && sessions(1L).duration_seconds == 30)
    assert(sessions(1L).first_type == "view" && sessions(1L).last_type == "click")
    assert(sessions(2L).n_events == 1)
  }

  test("continual release: driver draws once per node across actions; Gaussian calibrated") {
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L))
      .map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    val prefix = Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0, 4L -> 4.0,
      5L -> 4.0, 6L -> 4.0, 7L -> 4.0)
    // counting source: distinct draws expose any re-draw (the r13 hole:
    // every ACTION on a returned release re-sampled all node noise)
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object Counting extends graft.core.NoiseSource {
      def laplace(b: Double): Double = counter.incrementAndGet() * 1000.0
      def gaussian(sigma: Double): Double = counter.incrementAndGet() * 1000.0
      def uniform(): Double = 0.5
    }
    val rel = StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = Counting)
    // draws at release construction, driver-side: (2*8-1) nodes x 1 key
    assert(counter.get == 15, s"draws=${counter.get}")
    def read(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a1 = read(rel)
    val a2 = read(rel) // second action: the SAME draw set
    assert(a1 == a2)
    assert(counter.get == 15, "a second action re-drew node noise")
    // windowed differencing post-processes those same draws — zero new
    StreamOps.continualWindowCounts(rel, Seq("key"), 3).collect()
    assert(counter.get == 15, "continualWindowCounts drew new noise")
    // Gaussian releases: echo-sigma source pins the per-node calibration
    // (Balle-Wang at L2 = maxPerTick * sqrt(levels+1)) through the
    // popcount identity; zero noise stays exact (the oracle anchor)
    object EchoScale extends graft.core.NoiseSource {
      def laplace(b: Double): Double = -b // wrong-kind dispatch shows up
      def gaussian(sigma: Double): Double = sigma
      def uniform(): Double = 0.5
    }
    val sigma = graft.core.DpNoise.gaussianSigma(1.0, 1e-6,
      100.0 * math.sqrt(4.0))
    val g = read(StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), 8, 1.0, 100L, EchoScale, None,
      graft.core.NoiseKind.Gaussian, 1e-6))
    (0L to 7L).foreach { t =>
      val want = prefix(t) + java.lang.Long.bitCount(t + 1) * sigma
      assert(math.abs(g(t) - want) < 1e-9, s"t=$t got ${g(t)} want $want")
    }
    val gz = read(StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), 8, 1.0, 100L, graft.core.NoiseSource.Zero, None,
      graft.core.NoiseKind.Gaussian, 1e-6))
    assert(gz == prefix)
    // the mean splits BOTH eps and delta across its two trees
    val mdf = rows.map { case (u, t, k) => (u, t, 2.0, k) }
      .toDF("user_id", "tick", "v", "key")
    val sigmaC = graft.core.DpNoise.gaussianSigma(0.5, 1e-6,
      100.0 * math.sqrt(4.0))
    val sigmaS = graft.core.DpNoise.gaussianSigma(0.5, 1e-6,
      100.0 * 10.0 * math.sqrt(4.0))
    val gm = StreamOps.dpContinualMean(mdf, "user_id", col("tick"), "v",
      Seq("key"), 8, 1.0, 100L, 0.0, 10.0, EchoScale, None,
      graft.core.NoiseKind.Gaussian, 2e-6)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    (0L to 7L).foreach { t =>
      val pc = java.lang.Long.bitCount(t + 1)
      assert(math.abs(gm(t)._1 - (prefix(t) + pc * sigmaC)) < 1e-9,
        s"t=$t count ${gm(t)._1}")
      assert(math.abs(gm(t)._2 - (2.0 * prefix(t) + pc * sigmaS)) < 1e-9,
        s"t=$t sum ${gm(t)._2}")
    }
    // the STREAMING fold takes the same noiseKind: a two-step Gaussian
    // fold obeys the popcount identity with the persisted-draw store
    // (same calibration as the batch face, draws shared across steps)
    var st: Option[StreamOps.ContinualStore] = None
    val foldOut = scala.collection.mutable.Map.empty[Long, Double]
    Seq((df.filter(col("tick") <= 2), -1L, 2L),
      (df.filter(col("tick") > 2), 2L, 7L)).foreach { case (b, from, to) =>
      val (rel, grown) = StreamOps.onlineContinualStep(b, st, "user_id",
        col("tick"), Seq("key"), 8, 1.0, 100L, EchoScale, from, to,
        noiseKind = graft.core.NoiseKind.Gaussian, delta = 1e-6)
      rel.collect().foreach(r => foldOut(r.getLong(0)) = r.getDouble(2))
      st = Some(grown.copy(nodeSums = grown.nodeSums.localCheckpoint(true),
        nodeNoise = grown.nodeNoise.localCheckpoint(true)))
    }
    (0L to 7L).foreach { t =>
      val want = prefix(t) + java.lang.Long.bitCount(t + 1) * sigma
      assert(math.abs(foldOut(t) - want) < 1e-9,
        s"fold t=$t got ${foldOut(t)} want $want")
    }
  }

  test("sharded continual counter == one-shot; draws once per (key, node) across shards") {
    import org.apache.spark.sql.functions._
    // 5 keys at 2 keys per shard -> 3 shards; zero noise must reproduce
    // the one-shot keyed release exactly
    val df = (0 until 5).flatMap(k =>
      Seq((1L, 0L, s"k$k"), (2L, 3L, s"k$k"), (3L, 6L, s"k$k")))
      .toDF("user_id", "tick", "key")
    def m(t: org.apache.spark.sql.DataFrame) = t.collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("t")) ->
        r.getAs[Double]("dp_prefix_count")).toMap
    val oneShot = m(StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = graft.core.NoiseSource.Zero))
    val dir = java.nio.file.Files.createTempDirectory("graft_cshard_").toString
    val sharded = StreamOps.dpContinualCountSharded(df, "user_id",
      col("tick"), Seq("key"), horizon = 8, epsilon = 1.0,
      maxPerTick = 100L, noise = graft.core.NoiseSource.Zero, outDir = dir,
      maxKeysPerShard = 2L)
    assert(m(sharded) == oneShot)
    assert(oneShot.size == 5 * 8)
    // exactly keys x (2*horizon - 1) draws in total, materialized once:
    // further actions on the read-back trigger zero more
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object Counting extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter.incrementAndGet(); 0.0 }
      def gaussian(sigma: Double): Double = { counter.incrementAndGet(); 0.0 }
      def uniform(): Double = 0.5
    }
    val dir2 = java.nio.file.Files.createTempDirectory("graft_cshard_").toString
    val rel = StreamOps.dpContinualCountSharded(df, "user_id", col("tick"),
      Seq("key"), 8, 1.0, 100L, Counting, dir2, maxKeysPerShard = 2L)
    assert(counter.get == 5L * 15L, s"draws=${counter.get}")
    rel.collect(); rel.collect()
    assert(counter.get == 5L * 15L, "post-release actions must not redraw")
    // the read-back feeds window post-processing unchanged
    val win = StreamOps.continualWindowCounts(sharded, Seq("key"), 2)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("t")) ->
        r.getAs[Double]("dp_window_count")).toMap
    assert(win(("k0", 3L)) == oneShot(("k0", 3L)) - oneShot(("k0", 1L)))
  }

  test("sharded continual SUM == one-shot; clamped cells, draws once per (key, node)") {
    import org.apache.spark.sql.functions._
    val df = (0 until 5).flatMap(k => Seq(
      (1L, 0L, s"k$k", 5.0), (2L, 3L, s"k$k", 50.0), (3L, 6L, s"k$k", -3.0)))
      .toDF("user_id", "tick", "key", "v")
    def m(t: org.apache.spark.sql.DataFrame) = t.collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("t")) ->
        r.getAs[Double]("dp_prefix_sum")).toMap
    val oneShot = m(StreamOps.dpContinualSum(df, "user_id", col("tick"),
      "v", Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      minValue = 0.0, maxValue = 10.0, noise = graft.core.NoiseSource.Zero))
    val dir = java.nio.file.Files.createTempDirectory("graft_csshard_").toString
    val sharded = m(StreamOps.dpContinualSumSharded(df, "user_id",
      col("tick"), "v", Seq("key"), 8, 1.0, 100L, 0.0, 10.0,
      graft.core.NoiseSource.Zero, dir, maxKeysPerShard = 2L))
    assert(sharded == oneShot)
    // per-value clamps bind: 50 -> 10, -3 -> 0; prefix at t=7 = 5+10+0
    assert(oneShot(("k0", 7L)) == 15.0, oneShot(("k0", 7L)).toString)
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    object Counting extends graft.core.NoiseSource {
      def laplace(b: Double): Double = { counter.incrementAndGet(); 0.0 }
      def gaussian(sigma: Double): Double = { counter.incrementAndGet(); 0.0 }
      def uniform(): Double = 0.5
    }
    val dir2 = java.nio.file.Files.createTempDirectory("graft_csshard_").toString
    StreamOps.dpContinualSumSharded(df, "user_id", col("tick"), "v",
      Seq("key"), 8, 1.0, 100L, 0.0, 10.0, Counting, dir2,
      maxKeysPerShard = 2L).collect()
    assert(counter.get == 5L * 15L, s"draws=${counter.get}")
  }

  test("continual DP counter: prefix exactness, node reuse, bounding, guards") {
    import org.apache.spark.sql.functions._
    // ticks 0..7 (horizon 8): per-tick counts 2, 0, 1, 3, 0, 0, 1, 0
    val rows = Seq((1L, 0L), (2L, 0L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L),
      (4L, 6L)).map { case (u, t) => (u, t, "k") }
    val df = rows.toDF("user_id", "tick", "key")
    val zero = StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = graft.core.NoiseSource.Zero)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // zero noise: released value at EVERY tick equals the exact prefix,
    // including empty ticks (8 releases for 7 events)
    val prefix = Map(0L -> 2.0, 1L -> 2.0, 2L -> 3.0, 3L -> 6.0, 4L -> 6.0,
      5L -> 6.0, 6L -> 7.0, 7L -> 7.0)
    assert(zero == prefix, zero.toString)
    // node REUSE structure: with a noise source that returns a constant 1
    // per draw, release(t) - prefix(t) = popcount(t+1) — the number of
    // decomposition nodes — proving one draw per node shared across
    // prefixes (a draw-per-release mechanism would add t+1 instead)
    object ConstOne extends graft.core.NoiseSource {
      def laplace(b: Double): Double = 1.0
      def gaussian(sigma: Double): Double = 1.0
      def uniform(): Double = 0.5
    }
    val one = StreamOps.dpContinualCount(df, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = ConstOne)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (0L to 7L).foreach { t =>
      val want = prefix(t) + java.lang.Long.bitCount(t + 1)
      assert(one(t) == want, s"t=$t got ${one(t)} want $want")
    }
    // contribution bounding: a unit flooding one tick contributes maxPerTick
    val flood = (rows ++ (1 to 50).map(_ => (9L, 1L, "k"))).toDF("user_id", "tick", "key")
    val bounded = StreamOps.dpContinualCount(flood, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 5L,
      noise = graft.core.NoiseSource.Zero)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bounded(1L) == prefix(1L) + 5.0, bounded.toString)
    // sliding windows are pure post-processing of the released prefixes:
    // window(t, 3] = prefix(t) - prefix(t-3), partial leads against 0
    val win = StreamOps.continualWindowCounts(
      StreamOps.dpContinualCount(df, "user_id", col("tick"), Seq("key"),
        horizon = 8, epsilon = 1.0, maxPerTick = 100L,
        noise = graft.core.NoiseSource.Zero),
      Seq("key"), windowTicks = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (0L to 7L).foreach { t =>
      val want = prefix(t) - (if (t >= 3) prefix(t - 3) else 0.0)
      assert(win(t) == want, s"t=$t got ${win(t)} want $want")
    }
    // publicKeys makes the release set data-INDEPENDENT: non-public keys
    // drop before bounding, and a public key with no data still releases
    // (noise-only; zero under Zero) at every tick — key existence
    // discloses nothing
    val mixed = (rows ++ Seq((9L, 1L, "secret"))).toDF("user_id", "tick", "key")
    val pubOut = StreamOps.dpContinualCount(mixed, "user_id", col("tick"),
      Seq("key"), horizon = 8, epsilon = 1.0, maxPerTick = 100L,
      noise = graft.core.NoiseSource.Zero,
      publicKeys = Some(Seq("k", "ghost").toDF("key")))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
    assert(!pubOut.keySet.exists(_._1 == "secret")) // dropped, not released
    assert((0L to 7L).forall(t => pubOut(("ghost", t)) == 0.0)) // empty public key
    assert((0L to 7L).forall(t => pubOut(("k", t)) == prefix(t))) // unchanged
    // the SUM variant: zero-noise running clamped sums; the per-value and
    // per-tick clamps both bind deterministically
    val vrows = Seq((1L, 0L, "k", 5.0), (2L, 0L, "k", 50.0), (1L, 2L, "k", -3.0))
      .toDF("user_id", "tick", "key", "v")
    val sums = StreamOps.dpContinualSum(vrows, "user_id", col("tick"), "v",
      Seq("key"), horizon = 4, epsilon = 1.0, maxPerTick = 100L,
      minValue = 0.0, maxValue = 10.0, noise = graft.core.NoiseSource.Zero)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // tick 0: 5 + clamp(50 -> 10) = 15; tick 2 adds clamp(-3 -> 0)
    assert(sums == Map(0L -> 15.0, 1L -> 15.0, 2L -> 15.0, 3L -> 15.0), sums.toString)
    // NULL key fails loud instead of silently dropping from the joins
    val nullKey = Seq((1L, 0L, null.asInstanceOf[String])).toDF("user_id", "tick", "key")
    val eNull = intercept[Exception] {
      StreamOps.dpContinualCount(nullKey, "user_id", col("tick"), Seq("key"),
        horizon = 8, epsilon = 1.0, maxPerTick = 5L,
        noise = graft.core.NoiseSource.Zero).collect()
    }
    assert(graft.spark.SparkTestSession.chainMsg(eNull).contains("NULL key"),
      graft.spark.SparkTestSession.chainMsg(eNull).take(300))
    // guards: non-power-of-two horizon; tick outside the horizon
    intercept[IllegalArgumentException](
      StreamOps.dpContinualCount(df, "user_id", col("tick"), Seq("key"),
        horizon = 12, epsilon = 1.0, maxPerTick = 5L,
        noise = graft.core.NoiseSource.Zero))
    val bad = Seq((1L, 9L, "k")).toDF("user_id", "tick", "key")
    val e = intercept[Exception] {
      StreamOps.dpContinualCount(bad, "user_id", col("tick"), Seq("key"),
        horizon = 8, epsilon = 1.0, maxPerTick = 5L,
        noise = graft.core.NoiseSource.Zero).collect()
    }
    assert(graft.spark.SparkTestSession.chainMsg(e).contains("tick outside"),
      graft.spark.SparkTestSession.chainMsg(e).take(300))
  }

  test("streaming WARC ingestion: binaryFile readStream == batch; new archives picked up incrementally") {
    import graft.sources.WarcIO
    val root = java.nio.file.Files
      .createTempDirectory("graft_warc_stream_").toString
    val landing = s"$root/landing"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    def writeArchive(name: String, ids: Range): Unit = {
      val recs = ids.map(i => WarcIO.WarcRecord("", "resource",
        s"doc://$i", "2026-01-01T00:00:00Z", s"urn:graft:$i",
        "text/plain", -1L, ("payload " * 4 + i).getBytes("UTF-8")))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/$name"),
        WarcIO.gzipPerRecord(recs))
    }
    writeArchive("a0.warc.gz", 1 to 30)
    writeArchive("a1.warc.gz", 31 to 50)
    def drive(): Unit = {
      val q = WarcIO.warcIngestStats(
          WarcIO.readWarcStream(spark, s"$landing/*.warc.gz"))
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
        .format("memory").queryName("warc_ingest")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drive()
    def table() = spark.table("warc_ingest").collect()
      .map(r => (new java.io.File(r.getString(0)).getName,
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def batch() = WarcIO.warcIngestStats(
        WarcIO.readWarc(spark, s"$landing/*.warc.gz")).collect()
      .map(r => (new java.io.File(r.getString(0)).getName,
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // stream == batch over the same archives (the shared-parse contract)
    val first = table()
    assert(first == batch(), s"stream $first != batch ${batch()}")
    assert(first.map(_._2).sum == 50L)
    // a NEW archive lands; a RESTARTED query (same checkpoint) picks up
    // ONLY the new file (exactly-once file tracking) and the complete-
    // mode ledger now covers all three
    writeArchive("a2.warc.gz", 51 to 90)
    drive()
    val second = table()
    assert(second == batch(), "incremental pickup diverged from batch")
    assert(second.map(_._1) == Set("a0.warc.gz", "a1.warc.gz", "a2.warc.gz"))
    assert(second.map(_._2).sum == 90L)
  }

  test("streaming crawl prep: the WARC -> HTTP -> strip -> quality chain runs incrementally == batch") {
    // the corpus_crawl_prep chain as a STREAM: archives land, each
    // micro-batch parses only the new ones, and the whole map-only
    // chain (httpParts split, htmlStrip, prepPipeline scoring) runs
    // per batch in append mode — the incremental crawl-prep DAG.
    import graft.sources.WarcIO
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_crawl_stream_").toString
    val landing = s"$root/landing"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    val txt = (1 to 60).map(i =>
      s"the quick brown fox $i jumps over the lazy dog and runs far " +
        ("word " * (i % 7)).trim)
    def writeArchive(name: String, ids: Range): Unit = {
      val recs = ids.map { i =>
        val payload =
          if (i % 5 == 0)
            s"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope"
          else
            "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
              s"\r\n\r\n<html><body>${txt(i - 1)}</body></html>"
        WarcIO.WarcRecord("", "response", s"doc://$i",
          "2026-01-01T00:00:00Z", s"urn:graft:$i",
          "application/http;msgtype=response", -1L,
          payload.getBytes("UTF-8"))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/$name"),
        WarcIO.gzipPerRecord(recs))
    }
    def chain(records: org.apache.spark.sql.DataFrame) =
      graft.ops.CorpusOps.prepPipeline(
        records
          .select(col("record_id"), WarcIO.httpParts(col("payload")).as("h"))
          .filter(col("h.status") === 200 &&
            col("h.content_type").startsWith("text/html"))
          .select(regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
            .cast("long").as("doc_id"),
            graft.ops.TextAnalysis.htmlStrip(col("h.body").cast("string"))
              .as("text")),
        "doc_id", "text")
    writeArchive("w0.warc.gz", 1 to 25)
    val outDir = s"$root/out"
    def drive(): Unit = {
      // parquet sink, not memory: the memory sink cannot RECOVER from a
      // checkpoint, and the restart-across-waves behavior is the point
      val q = chain(WarcIO.readWarcStream(spark, s"$landing/*.warc.gz"))
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drive()
    def streamed() = spark.read.parquet(outDir).collect()
      .map(_.toString).sorted.toSeq
    def batch() = chain(WarcIO.readWarc(spark, s"$landing/*.warc.gz"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed() == batch(), "streamed chain != batch chain (wave 1)")
    assert(streamed().length == 20) // 25 minus the 404 arm
    // wave 2 lands; the restarted stream processes ONLY the new archive
    // and the appended table equals the batch over everything
    writeArchive("w1.warc.gz", 26 to 60)
    drive()
    assert(streamed() == batch(), "streamed chain != batch chain (wave 2)")
    assert(streamed().length == 48) // 60 minus the 12 404s
  }

  test("stream_meta commit is atomic: a crash mid-flip never loses the pointer") {
    // r18 fix: the old protocol mode("overwrite")-wrote ONE stream_meta dir,
    // deleting the previous pointer before the new one was durable. Now each
    // commit writes a NEW versioned dir; readers take the highest
    // _SUCCESS-marked version, so a partial dir from a crash is ignored.
    val state = java.nio.file.Files
      .createTempDirectory("graft_meta_atomic_").toString
    def foldBatch(id: Long, ids: Range): Unit =
      StreamOps.checkpointedStoreFold(
        ids.map(i => (i.toLong, "a")).toDF("uid", "v"), id, state) {
        (b, st) => graft.spark.LocalDP.olhIngestStep(b, st, "uid",
          col("v"), Seq("a", "b"), 1.0, graft.core.NoiseSource.Zero)
      }
    foldBatch(0L, 1 to 10)
    foldBatch(1L, 11 to 20)
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 1L)
    // simulate the crash window: a partial stream_meta_b2 exists (no
    // _SUCCESS) — the pointer must still be batch 1, and the store readable
    val partial = new java.io.File(s"$state/stream_meta_b2")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$state/stream_meta_b2/part-00000.parquet"),
      "garbage-not-parquet")
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 1L,
      "a _SUCCESS-less partial meta dir was treated as a commit")
    assert(StreamOps.loadCheckpointedStore(spark, state).count() > 0)
    // the replayed batch 2 commits OVER its own partial dir and wins
    foldBatch(2L, 21 to 30)
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 2L)
    // legacy single-dir state (pre-r18) still resolves: demote the current
    // commit to the old layout (one stream_meta dir, no versioned metas)
    val meta2 = spark.read.parquet(s"$state/stream_meta_b2")
    meta2.coalesce(1).write.parquet(s"$state/stream_meta")
    new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("stream_meta_b"))
      .foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(d))
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 2L, "legacy fallback broken")
    // ...and the next commit supersedes + janitors the legacy pointer
    foldBatch(3L, 31 to 40)
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 3L)
    assert(!new java.io.File(s"$state/stream_meta").exists(),
      "the superseded legacy pointer was not janitored")
  }

  test("stream_meta commits survive disabled _SUCCESS markers; invisible histories fail loud") {
    // r19: commitStreamMeta writes its OWN _GRAFT_COMMIT marker, so a
    // deployment that disables mapreduce.fileoutputcommitter
    // .marksuccessfuljobs (common with object-store committers) cannot
    // make every commit invisible to restart.
    val state = java.nio.file.Files
      .createTempDirectory("graft_meta_marker_").toString
    def foldBatch(id: Long, ids: Range): Unit =
      StreamOps.checkpointedStoreFold(
        ids.map(i => (i.toLong, "a")).toDF("uid", "v"), id, state) {
        (b, st) => graft.spark.LocalDP.olhIngestStep(b, st, "uid",
          col("v"), Seq("a", "b"), 1.0, graft.core.NoiseSource.Zero)
      }
    foldBatch(0L, 1 to 10)
    foldBatch(1L, 11 to 20)
    // the engine-owned marker exists in the committed dir...
    assert(new java.io.File(s"$state/stream_meta_b1/_GRAFT_COMMIT").exists(),
      "commitStreamMeta did not write its own marker")
    // ...and resolution works with every Spark _SUCCESS stripped
    new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("stream_meta_b"))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(_.getName == "_SUCCESS").foreach(_.delete())
    assert(StreamOps.resolveStreamMeta(spark, state, "spec").get
      .getAs[Long]("last_batch_id") == 1L,
      "resolution must not depend on Spark's _SUCCESS")
    // a SINGLE unmarked dir (crash mid-first-commit) resolves to None...
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_meta_fresh_").toString
    new java.io.File(s"$fresh/stream_meta_b0").mkdirs()
    assert(StreamOps.resolveStreamMeta(spark, fresh, "spec").isEmpty)
    // ...but MULTIPLE unmarked dirs are an invisible commit history and
    // must fail loud instead of silently restarting from scratch
    new java.io.File(s"$fresh/stream_meta_b1").mkdirs()
    val e = intercept[IllegalStateException](
      StreamOps.resolveStreamMeta(spark, fresh, "spec"))
    assert(e.getMessage.contains("NONE carries a commit marker"))
  }
}
