package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** MemoryStream-driven checks for the streaming transforms: feed a
  * crafted event sequence, process all available batches, and assert
  * against the in-memory sink.
  */
/** Top-level so the encoder's codegen'd serializer can call the field
  * accessors statically — nested in the Spec class, Janino fails on the
  * outer-instance reference and Spark falls back to interpreted
  * projections (WARN noise + slower test runs).
  */
private[streaming] case class Ev(ts: Timestamp, user_id: Long,
    event_type: String, value: Double, event_id: Long)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def runStream(name: String, events: Seq[Ev],
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String) = {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(events: _*)
    val q = f(src.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  test("session_window merges events within the gap and splits on silence") {
    val events = Seq(
      Ev(ts(0), 1, "click", 1.0, 0), Ev(ts(5), 1, "click", 2.0, 1),
      Ev(ts(9), 1, "purchase", 3.0, 2), // session A: 0-9 (+gap)
      Ev(ts(40), 1, "click", 4.0, 3), // session B after 31-min silence
      Ev(ts(2), 2, "click", 5.0, 4)) // user 2, own session
    val out = runStream("sessions", events,
      EventStreams.sessionCounts(_, gap = "10 minutes"), "complete")
      .select($"user_id", $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 3L, 6.0), (1L, 1L, 4.0), (2L, 1L, 5.0)))
  }

  test("tumbling window counts per type") {
    val events = Seq(
      Ev(ts(10), 1, "click", 0, 0), Ev(ts(50), 2, "click", 0, 1),
      Ev(ts(70), 1, "error", 0, 2), Ev(ts(80), 3, "click", 0, 3))
    val out = runStream("tumbling", events,
      EventStreams.tumblingTypeCounts(_, width = "1 hour"), "update")
      .select(unix_timestamp($"window_start") / 60, $"event_type", $"n")
      .as[(Double, String, Long)].collect().toSet
    assert(out === Set((0.0, "click", 2L), (60.0, "error", 1L), (60.0, "click", 1L)))
  }

  test("flatMapGroupsWithState keeps a running per-user rollup across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStreams.userRollups(src.toDS())
      .writeStream.format("memory").queryName("rollups").outputMode("update").start()
    try {
      // start at minute 10: an epoch-0 event time ties with the initial
      // watermark and gets dropped by the late-row filter
      src.addData((ts(10), 1L, 2.0), (ts(11), 1L, 3.0), (ts(12), 2L, 7.0))
      q.processAllAvailable()
      src.addData((ts(15), 1L, 5.0)) // second batch folds into existing state
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("rollups")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"total_value")).as("s"))
      .select($"user_id", $"s.n_events", $"s.total_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(last === Set((1L, 3L, 10.0), (2L, 1L, 7.0)))
  }

  test("stream-static enrichment join equals the batch join and keeps unmatched types") {
    val dim = Seq(("click", 2.0), ("purchase", 10.0)).toDF("event_type", "weight")
    val events = Seq(
      Ev(ts(0), 1, "click", 1.5, 0), Ev(ts(1), 2, "purchase", 2.0, 1),
      Ev(ts(2), 3, "error", 4.0, 2)) // no dim row: weight coalesces to 0
    val out = runStream("enriched", events,
      EventStreams.enrichEvents(_, dim), "append")
      .select($"event_id", $"weighted_value")
      .as[(Long, Double)].collect().toSet
    assert(out === Set((0L, 3.0), (1L, 20.0), (2L, 0.0)))
    // batch twin: same transform over a plain DataFrame (tuples — the
    // inner Ev case class has no batch toDF encoder scope)
    val batch = EventStreams.enrichEvents(
      events.map(e => (e.ts, e.user_id, e.event_type, e.value, e.event_id))
        .toDF("ts", "user_id", "event_type", "value", "event_id"), dim)
      .select($"event_id", $"weighted_value")
      .as[(Long, Double)].collect().toSet
    assert(batch === out)
  }

  test("parquet sink with AvailableNow drains exactly once and resumes from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    def drain(): Long = {
      val q = EventStreams.parquetSink(src.toDF(), s"$out/data", s"$out/chk")
      q.awaitTermination()
      spark.read.parquet(s"$out/data").count()
    }
    src.addData(Ev(ts(0), 1, "click", 1.0, 0), Ev(ts(1), 2, "view", 2.0, 1))
    assert(drain() === 2L)
    // re-run with no new data: the checkpoint makes it a no-op
    assert(drain() === 2L)
    // new data after restart lands incrementally
    src.addData(Ev(ts(2), 3, "click", 3.0, 2))
    assert(drain() === 3L)
  }

  test("streaming session_window over the real events table equals the batch sessionize") {
    val dir = "/root/testdata/sf0.001"
    // stream schema = whatever the file ships (BIGINT nanos or
    // TIMESTAMP_NTZ); Tables.tsUs adapts, rebuild a TIMESTAMP from it
    val sch = spark.read.parquet(s"$dir/events.parquet").schema
    // readStream wants a directory; stage the single parquet file into one
    val staged = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val raw = spark.readStream.schema(sch).parquet(staged.toString)
    val stream = raw
      .withColumn("ts", timestamp_micros(graft.ops.Tables.tsUs(raw)))
    val q = EventStreams.sessionCounts(stream, gap = "10 minutes")
      .writeStream.format("memory").queryName("real_sessions")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("real_sessions")
      .select($"user_id", unix_micros($"session_start").as("start_us"), $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    // the batch twin (oracle-checked as q54) with the same 10-min gap
    val batch = graft.ops.Text.q54Sessionize(spark, dir)
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SCD2 closed intervals over the real events equal batch q98") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the ordering contract: per-user event-time order across batches —
    // a global (ts, event_id) sort delivers it; split into 3 batches
    val ordered = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy { case (_, _, tsUs, eid) => (tsUs, eid) }
    val src = MemoryStream[(Long, String, Long, Long)]
    val q = EventStreams.scd2Stream(src.toDS())
      .writeStream.format("memory").queryName("scd2_closed")
      .outputMode("append").start()
    try {
      ordered.grouped((ordered.size + 2) / 3).foreach { chunk =>
        src.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("scd2_closed")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    // batch q98's finalized rows: everything not current
    val batch = graft.ops.Text.q98Scd2Compaction(spark, dir)
      .where(!$"is_current")
      .select($"user_id", $"version", $"state", $"valid_from_us",
        $"valid_to_us", $"n_events")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SCD2 tolerates WITHIN-batch disorder (sorts per group per batch)") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: view,view,click,view in event time — delivered shuffled
    // inside one batch; the operator's per-batch (ts, event_id) sort
    // must reconstruct the runs exactly
    val src = MemoryStream[(Long, String, Long, Long)]
    val q = EventStreams.scd2Stream(src.toDS())
      .writeStream.format("memory").queryName("scd2_disorder")
      .outputMode("append").start()
    try {
      src.addData(
        (1L, "view", 4000000L, 13L), (1L, "click", 3000000L, 12L),
        (1L, "view", 1000000L, 10L), (1L, "view", 2000000L, 11L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd2_disorder")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, "view", 1000000L, 3000000L, 2L),
      (1L, 2L, "click", 3000000L, 4000000L, 1L)))
  }

  test("streaming dedup ingestion converges to batch q30's survivor set; re-run appends nothing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("dedup-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ckpt").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .sortBy(_._1) // doc_id order: greedy first-wins == min-id election
    val src = MemoryStream[(Long, String)]
    def drain(): Unit = {
      val q = EventStreams.dedupIngest(
        src.toDF().toDF("doc_id", "text"), staged, ckpt)
      q.awaitTermination() // AvailableNow: runs until drained
    }
    docs.grouped((docs.size + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      drain()
    }
    val got = spark.read.parquet(s"$staged/corpus_digests")
      .as[(String, Long)].collect().toSet
    val batch = graft.ops.Dedup.q30ExactDedup(spark, dir)
      .select($"norm_hash", $"canonical_id")
      .as[(String, Long)].collect().toSet
    assert(got === batch)
    // exactly-once: a drained re-run with the same checkpoint is a no-op
    drain()
    val again = spark.read.parquet(s"$staged/corpus_digests").count()
    assert(again === got.size.toLong)
  }

  test("session_window drops past-watermark late events and finalizes closed sessions") {
    // the risky behavior of withWatermark is the DROP boundary on
    // out-of-order data — in-order equivalence (test above) can pass
    // with a broken watermark. Three hand-stepped batches: open a
    // session, advance the watermark far past it, then feed a late
    // event from inside the closed session.
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(src.toDF(), gap = "10 minutes",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 session [0, 15) — stays open (watermark 0)
      src.addData(Ev(ts(0), 1, "click", 1.0, 0), Ev(ts(5), 1, "click", 2.0, 1))
      q.processAllAvailable()
      // batch 2: max event time jumps to minute 120 → the NEXT batch
      // runs with watermark 120 - 30 = minute 90
      src.addData(Ev(ts(120), 9, "click", 9.0, 2))
      q.processAllAvailable()
      // batch 3: minute 3 is far below watermark 90 → must be dropped,
      // NOT merged into (or re-opening) user 1's session; the eviction
      // pass of this batch also finalizes+emits that session
      src.addData(Ev(ts(3), 1, "click", 100.0, 3))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_sessions")
      .select($"user_id", $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().toSet
    // exactly the pre-late-event session: two events, late value absent;
    // user 9's session is still open (append emits only closed sessions)
    assert(out === Set((1L, 2L, 3.0)))
  }

  test("dedup keeps state only within the watermark horizon and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(src.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_dedup")
      .outputMode("append").start()
    try {
      // batch 1: ids 100, 101 pass and enter dedup state (start at
      // minute 10 — an epoch-0 event ties with the initial watermark
      // and is dropped by the late-row filter)
      src.addData(Ev(ts(10), 1, "a", 1.0, 100), Ev(ts(15), 1, "a", 1.0, 101))
      q.processAllAvailable()
      // batch 2: event time 130 → next batch's watermark = minute 100,
      // which evicts both ids' state (kept only 30 min past event time)
      src.addData(Ev(ts(130), 2, "a", 1.0, 200))
      q.processAllAvailable()
      // batch 3: a LATE never-seen id (minute 12 < watermark 100) must
      // be dropped by the watermark filter, not emitted as new; a
      // REPLAYED id 100 at minute 110 (> watermark, state already
      // evicted) is correctly re-emitted — "within watermark" is the
      // guarantee, and this is its boundary
      src.addData(Ev(ts(12), 3, "a", 1.0, 102), Ev(ts(110), 1, "a", 1.0, 100))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late_dedup")
      .select($"event_id", unix_timestamp($"ts") / 60)
      .as[(Long, Double)].collect().toSet
    assert(out === Set((100L, 10.0), (101L, 15.0), (200L, 130.0), (100L, 110.0)))
  }

  test("streaming dedup drops same-id events within the watermark") {
    val events = Seq(
      Ev(ts(0), 1, "click", 1.0, 100), Ev(ts(1), 1, "click", 1.0, 100),
      Ev(ts(2), 2, "click", 1.0, 101))
    val out = runStream("dedup", events, EventStreams.dedupEvents(_), "append")
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(out === Seq(100L, 101L))
  }

  test("stream-stream attribution join matches only clicks inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = EventStreams
      .attributionPairs(clicks.toDF(), purchases.toDF(), horizon = "30 minutes")
      .writeStream.format("memory").queryName("attr_pairs")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(ts(10), 1, "click", 0.0, 10), // inside horizon of purchase@35
        Ev(ts(34), 1, "click", 0.0, 11), // inside, latest
        Ev(ts(4), 1, "click", 0.0, 12), // minute 4 < 35-30: outside
        Ev(ts(20), 2, "click", 0.0, 13)) // other user: no purchase
      purchases.addData(Ev(ts(35), 1, "purchase", 9.0, 50))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("attr_pairs")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(out === Set((50L, 10L), (50L, 11L)))
  }

  test("left-outer stream-stream join emits unmatched purchases only after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = EventStreams.attributionPairs(clicks.toDF(), purchases.toDF(),
        horizon = "30 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      // batch 1: a clickless purchase at minute 10 — must NOT emit yet:
      // a matching click could still arrive until the watermark passes
      // minute 10 + horizon
      purchases.addData(Ev(ts(10), 1, "purchase", 5.0, 50))
      q.processAllAvailable()
      assert(spark.table("attr_outer").count() === 0)
      // batch 2: both sides jump to ~minute 120 → watermark reaches
      // min(120,121) - 30 = minute 90, past the purchase's close at 40;
      // the engine's eviction batch emits the null-click outer row
      // (user 9's own click→purchase pair also matches, inner-style)
      clicks.addData(Ev(ts(120), 9, "click", 0.0, 1))
      purchases.addData(Ev(ts(121), 9, "purchase", 1.0, 51))
      q.processAllAvailable()
      // batch 3: nudge once more in case eviction rode the next trigger
      clicks.addData(Ev(ts(125), 9, "click", 0.0, 2))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("attr_outer")
      .select($"purchase_id",
        when($"click_id".isNull, -1L).otherwise($"click_id").as("cid"))
      .as[(Long, Long)].collect().toSet
    assert(out.contains((50L, -1L)), out) // closed clickless purchase: null click
    assert(out.contains((51L, 1L)), out) // matched pair flows as in inner
  }

  test("streaming hopping windows over the real events table equal the batch q77") {
    val dir = "/root/testdata/sf0.001"
    val sch = spark.read.parquet(s"$dir/events.parquet").schema
    val staged = java.nio.file.Files.createTempDirectory("events-hop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val raw = spark.readStream.schema(sch).parquet(staged.toString)
    val stream = raw
      .withColumn("tsm", timestamp_micros(graft.ops.Tables.tsUs(raw)))
    val q = stream
      .groupBy(window($"tsm", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros($"window.start").as("w_start_us"), $"event_type",
        $"n_events")
      .writeStream.format("memory").queryName("hop").outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("hop")
      .as[(Long, String, Long)].collect().toSet
    val batch = graft.ops.Text.q77HoppingWindow(spark, dir)
      .select($"w_start_us", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream join state is evicted once the watermark passes the horizon") {
    // the scaladoc's central claim — state holds ONE horizon per side —
    // must be visible in the state-store metrics, not just asserted
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = EventStreams.attributionPairs(clicks.toDF(), purchases.toDF(),
        horizon = "30 minutes")
      .writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      // batch 1: 20 clicks + 2 purchases enter join state
      clicks.addData((0 until 20).map(i => Ev(ts(i), i.toLong, "click", 0.0, i)): _*)
      purchases.addData(Ev(ts(10), 1, "purchase", 1.0, 100),
        Ev(ts(12), 2, "purchase", 1.0, 101))
      q.processAllAvailable()
      val loaded = q.lastProgress.stateOperators.head.numRowsTotal
      assert(loaded >= 20, s"expected both sides in state, saw $loaded")
      // batch 2+3: both sides jump 10 hours → watermark far past every
      // batch-1 row + horizon; the eviction pass must drain them
      clicks.addData(Ev(ts(600), 999, "click", 0.0, 900))
      purchases.addData(Ev(ts(600), 998, "purchase", 0.0, 901))
      q.processAllAvailable()
      clicks.addData(Ev(ts(601), 999, "click", 0.0, 902))
      purchases.addData(Ev(ts(601), 998, "purchase", 0.0, 903))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after <= 6, s"batch-1 rows must be evicted, state still holds $after")
    } finally q.stop()
  }

  test("stream-stream attribution pairs over the real events table equal the batch join") {
    val dir = "/root/testdata/sf0.001"
    val sch = spark.read.parquet(s"$dir/events.parquet").schema
    val staged = java.nio.file.Files.createTempDirectory("events-attr")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    def typed(df: org.apache.spark.sql.DataFrame, t: String) =
      df.where($"event_type" === t)
    val raw = spark.readStream.schema(sch).parquet(staged.toString)
    val stream = raw
      .withColumn("ts", timestamp_micros(graft.ops.Tables.tsUs(raw)))
    val q = EventStreams
      .attributionPairs(typed(stream, "click"), typed(stream, "purchase"))
      .writeStream.format("memory").queryName("real_attr")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("real_attr")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    // batch twin: the same code path over the batch-loaded table (its
    // latest-click argmax is the oracle-checked q67_click_attribution)
    val ev = graft.ops.Tables.eventsTsUs(spark, dir)
      .withColumn("ts", timestamp_micros($"ts_us"))
    val batch = EventStreams
      .attributionPairs(typed(ev, "click"), typed(ev, "purchase"))
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
