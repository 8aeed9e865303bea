package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming forms of the event-analytics operators: session windows and
  * the stream-stream interval join. Each mirrors its batch twin
  * ([[graft.operators.Analytics.sessionWindows]],
  * [[graft.operators.Joins.viewsWithinHour]]) so batch-vs-stream
  * agreement is testable the same way the reference cross-checks its
  * three supplier-stats engines (SURVEY.md §5.3).
  */
object EventStreams {

  /** Streaming session windows (gap-merged) per user. Append mode emits
    * a session exactly once, when the watermark passes `last event +
    * gap` — Spark's session state store merges overlapping windows
    * per key as events arrive, the same incremental shape Flink keeps
    * in keyed window state. Expects columns `user_id, ts (timestamp),
    * value`. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermarkDelay: String = "10 seconds"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2)
          .as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("session_value"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's views from the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state
    * store can expire view rows once `view time + 1h` falls behind the
    * purchase-side watermark — bounded state at any input volume, the
    * property that makes the join runnable indefinitely. Expects
    * columns `p_event_id, p_user, p_ts` / `v_event_id, v_user, v_ts,
    * v_value`. */
  def purchasesWithRecentViews(purchases: DataFrame, views: DataFrame,
                               watermarkDelay: String = "10 seconds"): DataFrame =
    purchases.withWatermark("p_ts", watermarkDelay)
      .join(views.withWatermark("v_ts", watermarkDelay),
        expr("p_user = v_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"))
      .select(col("p_event_id").as("event_id"), col("p_user").as("user_id"),
        col("v_event_id").as("view_id"), col("v_value").as("view_value"))
}
