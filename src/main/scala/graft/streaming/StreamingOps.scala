package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each transform is a plain `DataFrame => DataFrame` usable identically
  * on a batch frame or a `readStream` frame — the Structured Streaming
  * contract. Watermarks bound state: hourly windows keep ≤ (watermark /
  * window) panes per key; session state evicts when the watermark passes
  * the gap. At scale, state lives in the state store partitioned by the
  * grouping key — no driver involvement.
  */
object StreamingOps {

  /** Tumbling hourly counts/sums per event type, 2h watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1h window every 30m per event type — the streaming twin of
    * the q46 batch query (same columns, same 2dp rounding, so the two
    * share one oracle). */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1h window every 15m per user — overlap = 4 panes/event. */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("user_id"), col("n"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on an id column: duplicates arriving within
    * the watermark window are dropped; state for ids older than the
    * watermark is evicted (bounded state — the streaming face of
    * [[graft.ops.Dedup.exactGroups]]). */
  def streamingDedup(
      events: DataFrame,
      idCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  // ── custom state: running per-user totals via mapGroupsWithState ──

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserTotals(user_id: Long, n: Long, total: Double)

  /** Running lifetime totals per user — the `mapGroupsWithState` shape for
    * semantics windows can't express (monotone cross-batch accumulation).
    * ProcessingTimeTimeout-free: state is a single (n, total) pair per
    * user, O(users) not O(events). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserTotals](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[(Long, Double)]) =>
          val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var t = t0
          it.foreach { e => n += 1; t += e.value }
          state.update((n, t))
          UserTotals(uid, n, t)
      }
  }

  /** Output mode for [[runningUserTotals]] sinks. */
  val runningTotalsOutputMode: OutputMode = OutputMode.Update()

  case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  /** Internal session accumulator (public: the state encoder's generated
    * code must be able to reach the accessors). */
  /** Batch twin of [[sessionizeStateful]]: the same inclusive-gap
    * sessionization via typed `flatMapGroups` — the KeyValueGroupedDataset
    * path for when session assembly needs imperative per-group logic.
    * Per-user events are sorted in memory (per-user volume is bounded;
    * a heavy-hitter-safe variant would pre-repartition by user and use
    * sortWithinPartitions secondary sort). Emits the same schema and
    * values as the declarative [[sessionize]] (q24's oracle checks both:
    * merge at exactly last + gap, end = last + gap, 2dp sums). */
  def sessionizeTyped(events: DataFrame, gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // Timestamp.getTime is millisecond-precision; event times carry
    // microseconds, so all arithmetic runs on a µs epoch (the ms-only
    // form truncated session bounds and broke oracle parity)
    def toUs(ts: java.sql.Timestamp): Long =
      java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    def fromUs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(java.lang.Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val gapUs = gapMs * 1000L
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[UserEvent]) =>
        val sorted = it.toIndexedSeq.sortBy(e => (toUs(e.ts), e.value))
        val out = Seq.newBuilder[SessionOut]
        var start = 0L; var last = 0L; var n = 0L; var total = 0.0
        sorted.foreach { e =>
          val t = toUs(e.ts)
          if (n == 0) { start = t; last = t; n = 1; total = e.value }
          else if (t - last <= gapUs) {
            last = math.max(last, t); n += 1; total += e.value
          } else {
            out += SessionOut(uid, fromUs(start), fromUs(last + gapUs), n, total)
            start = t; last = t; n = 1; total = e.value
          }
        }
        if (n > 0)
          out += SessionOut(uid, fromUs(start), fromUs(last + gapUs), n, total)
        out.result().iterator
      }
      .select(col("session_start"), col("session_end"), col("user_id"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
  }

  case class SessionState(
      startMs: Long, lastMs: Long, n: Long, total: Double)

  /** Custom-state sessionizer via flatMapGroupsWithState: sessions close
    * (and emit) when the event-time watermark passes last-event + gap —
    * semantics `session_window` can't express when the *emission* must be
    * a custom record (e.g. enriched session summaries) or the close
    * condition isn't a fixed gap. State per user is O(1); event-time
    * timeout + watermark bound it. Append-mode sink. */
  def sessionizeStateful(
      events: Dataset[UserEvent],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed last + gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid,
              new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case null =>
                  cur = SessionState(t, t, 1, e.value)
                case s if t - s.lastMs <= gapMs =>
                  cur = SessionState(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.total + e.value)
                case s => // gap exceeded inside the batch: emit, start anew
                  closed += SessionOut(uid, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.total)
                  cur = SessionState(t, t, 1, e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming MERGE into a keyed serving store — the `foreachBatch`
    * upsert shape every production ingest uses (Delta/Iceberg
    * `MERGE INTO` fed by a stream). Each micro-batch is reduced to one
    * row per user (count, sum, and the latest event by (ts, event_id))
    * and merged into the running store: counters add, the newer "last
    * event" wins. The merged result is INDEPENDENT of how the source was
    * chopped into micro-batches — counts/sums are associative and
    * "latest" is a total order — which is exactly what makes the pattern
    * safe under retries and repartitioned replays.
    *
    * Scale shape: the per-batch reduction is a map-side-combined
    * hash-agg over the batch only; the merge is one full-outer equi-join
    * on the store key (broadcast while the batch is small, SMJ at
    * scale). Here the store is an in-JVM lineage-truncated frame; a real
    * deployment points the same merge at a table and lets the engine's
    * MERGE do the join. Returns the final store after the stream drains.
    */
  def streamingMergeStore(
      stream: DataFrame,
      onBatch: Long => Unit = _ => ()): DataFrame = {
    def reduceBatch(df: DataFrame): DataFrame =
      df.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum("value").as("sum_value"),
          max(struct(col("ts"), col("event_id"), col("event_type"))).as("_m"))
        .select(col("user_id"), col("n_events"), col("sum_value"),
          col("_m.ts").as("last_ts"), col("_m.event_id").as("last_eid"),
          col("_m.event_type").as("last_type"))
    var store: DataFrame = null
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        onBatch(batchId)
        val b = reduceBatch(batch.toDF())
        store = if (store == null) b.localCheckpoint()
        else {
          val t = store.as("t")
          val u = b.as("u")
          val newer = struct(col("u.last_ts"), col("u.last_eid")) >
            struct(col("t.last_ts"), col("t.last_eid"))
          t.join(u, col("t.user_id") === col("u.user_id"), "full")
            .select(
              coalesce(col("t.user_id"), col("u.user_id")).as("user_id"),
              (coalesce(col("t.n_events"), lit(0L)) +
                coalesce(col("u.n_events"), lit(0L))).as("n_events"),
              (coalesce(col("t.sum_value"), lit(0.0)) +
                coalesce(col("u.sum_value"), lit(0.0))).as("sum_value"),
              when(col("t.user_id").isNull || newer, col("u.last_ts"))
                .otherwise(col("t.last_ts")).as("last_ts"),
              when(col("t.user_id").isNull || newer, col("u.last_eid"))
                .otherwise(col("t.last_eid")).as("last_eid"),
              when(col("t.user_id").isNull || newer, col("u.last_type"))
                .otherwise(col("t.last_type")).as("last_type"))
            // truncate lineage per batch or the plan grows with batch count
            .localCheckpoint()
        }
        (): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    store
  }
}
