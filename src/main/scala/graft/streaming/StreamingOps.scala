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
}
