package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyByType: streaming tumbling agg over two micro-batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingOps.hourlyByType(
        ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      ms.addData((ts("2026-01-01 10:05:00"), "click", 1.0),
        (ts("2026-01-01 10:55:00"), "click", 2.0),
        (ts("2026-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      ms.addData((ts("2026-01-01 11:30:00"), "view", 7.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .groupBy("win_start", "event_type")
        .agg(max("n").as("n"), max("sum_value").as("s"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got(("2026-01-01 10:00:00.0", "click")) == ((2L, 3.0)))
      assert(got(("2026-01-01 11:00:00.0", "view")) == ((2L, 12.0)))
    } finally q.stop()
  }

  test("runningUserTotals: state accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.runningUserTotals(ms.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(StreamingOps.runningTotalsOutputMode.toString.toLowerCase).start()
    try {
      ms.addData(StreamingOps.UserEvent(1L, ts("2026-01-01 10:00:00"), 2.0),
        StreamingOps.UserEvent(1L, ts("2026-01-01 10:01:00"), 3.0),
        StreamingOps.UserEvent(2L, ts("2026-01-01 10:02:00"), 10.0))
      q.processAllAvailable()
      ms.addData(StreamingOps.UserEvent(1L, ts("2026-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      val last = spark.table("totals").groupBy("user_id")
        .agg(max("n").as("n"), max("total").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(1L) == ((3L, 10.0)))
      assert(last(2L) == ((1L, 10.0)))
    } finally q.stop()
  }

  test("stream/batch parity: hourlyByType over the events file source") {
    // the file stream source wants a directory: stage the events file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val raw = spark.read.parquet(path)
    def normalize(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sources.normalizeTimestamps(
        if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else df)
    val stream = spark.readStream.schema(raw.schema).parquet(path)
    val q = StreamingOps.hourlyByType(normalize(stream))
      .writeStream.format("memory").queryName("parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity")
        .orderBy("win_start", "event_type").collect().toSeq
      val batch = StreamingOps.hourlyByType(normalize(raw))
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("sessionizeStateful: sessions emit when the watermark passes last + gap") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.sessionizeStateful(ms.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session A: two events close together
      ms.addData(StreamingOps.UserEvent(1L, ts("2026-01-01 10:00:00"), 1.0),
        StreamingOps.UserEvent(1L, ts("2026-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // advance event time far enough that the watermark (max - 2h)
      // passes session A's close (10:10 + 30m = 10:40): need max >= 12:40
      ms.addData(StreamingOps.UserEvent(2L, ts("2026-01-01 13:00:00"), 5.0))
      q.processAllAvailable()
      // one more batch so the timeout fires after the watermark update
      ms.addData(StreamingOps.UserEvent(2L, ts("2026-01-01 13:01:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSeq
      assert(got.contains(
        (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:40:00.0", 2L, 3.0)),
        got.toString)
    } finally q.stop()
  }

  test("slidingUserActivity: an event lands in all 4 overlapping 1h/15m panes") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val q = StreamingOps.slidingUserActivity(
        ms.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    try {
      ms.addData((ts("2026-01-01 10:31:00"), 7L))
      q.processAllAvailable()
      val wins = spark.table("sliding")
        .collect().map(r => r.getTimestamp(0).toString).sorted.toSeq
      assert(wins == Seq(
        "2026-01-01 09:45:00.0", "2026-01-01 10:00:00.0",
        "2026-01-01 10:15:00.0", "2026-01-01 10:30:00.0"))
    } finally q.stop()
  }

  test("streamingDedup: duplicate ids within the watermark are dropped across batches") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamingOps.streamingDedup(
        ms.toDF().toDF("event_id", "ts", "value"), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts("2026-01-01 10:00:00"), 1.0),
        (1L, ts("2026-01-01 10:00:05"), 1.0), // dup in same batch
        (2L, ts("2026-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      ms.addData((1L, ts("2026-01-01 10:02:00"), 9.9), // dup across batches
        (3L, ts("2026-01-01 10:03:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize: batch semantics — 30min gap splits sessions") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (1L, ts("2026-01-01 10:20:00"), 2.0),  // same session (gap 20m)
      (1L, ts("2026-01-01 10:50:00"), 3.0),  // gap exactly 30m -> still merges
      (1L, ts("2026-01-01 12:00:00"), 4.0),  // new session
      (2L, ts("2026-01-01 10:00:00"), 9.0)
    ).toDF("user_id", "ts", "value")
    val got = StreamingOps.sessionize(events)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(2), r.getTimestamp(0).toString, r.getLong(3), r.getDouble(4)))
    // an event at exactly prev_ts + gap MERGES (Spark treats the session
    // close as inclusive for merging); only gaps strictly > 30m split
    assert(got.toSeq == Seq(
      (1L, "2026-01-01 10:00:00.0", 3L, 6.0),
      (1L, "2026-01-01 12:00:00.0", 1L, 4.0),
      (2L, "2026-01-01 10:00:00.0", 1L, 9.0)))
  }

  test("streamingMergeStore: multi-batch foreachBatch merge == batch aggregate") {
    // 3 range-partitioned files + maxFilesPerTrigger=1 force 3 REAL
    // micro-batches; user 1 spans all three, so its row is built by
    // repeated merges, not one aggregation
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "click", 2.0),
      (2L, ts("2026-01-01 10:05:00"), 1L, "view", 3.0),
      (3L, ts("2026-01-01 10:10:00"), 2L, "click", 10.0),
      (4L, ts("2026-01-01 11:00:00"), 1L, "purchase", 5.0),
      (5L, ts("2026-01-01 11:30:00"), 3L, "view", 7.0),
      (6L, ts("2026-01-01 09:00:00"), 1L, "signup", 1.0) // older than batch-1 events
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_test_").toString
    events.repartitionByRange(3, col("event_id")).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val store = StreamingOps.streamingMergeStore(stream,
        onBatch = _ => { batches.incrementAndGet(); () })
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
          r.getAs[Timestamp]("last_ts").toString, r.getAs[String]("last_type"))))
      .toMap
    assert(batches.get() == 3, s"expected 3 micro-batches, got ${batches.get()}")
    assert(store(1L) == ((4L, 11.0, "2026-01-01 11:00:00.0", "purchase")))
    assert(store(2L) == ((1L, 10.0, "2026-01-01 10:10:00.0", "click")))
    assert(store(3L) == ((1L, 7.0, "2026-01-01 11:30:00.0", "view")))
  }
}
