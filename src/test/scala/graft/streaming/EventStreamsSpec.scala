package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** MemoryStream-driven checks for the streaming transforms: feed a
  * crafted event sequence, process all available batches, and assert
  * against the in-memory sink.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private case class Ev(ts: Timestamp, user_id: Long, event_type: String,
      value: Double, event_id: Long)

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

  test("streaming session_window over the real events table equals the batch sessionize") {
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    // ts arrives as BIGINT epoch-nanos (nanosAsLong); rebuild a timestamp
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // readStream wants a directory; stage the single parquet file into one
    val staged = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val stream = spark.readStream.schema(sch).parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  test("streaming dedup drops same-id events within the watermark") {
    val events = Seq(
      Ev(ts(0), 1, "click", 1.0, 100), Ev(ts(1), 1, "click", 1.0, 100),
      Ev(ts(2), 2, "click", 1.0, 101))
    val out = runStream("dedup", events, EventStreams.dedupEvents(_), "append")
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(out === Seq(100L, 101L))
  }
}
