package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.5): the streaming form of the
  * events analytics. Batch mirror = `q_events_windowed` (same aggregates,
  * so the oracle checks the semantics; the streaming spec checks the
  * incremental execution against the batch result).
  */
object EventsStream {

  /** Tumbling-window counts with a watermark: late events beyond the
    * watermark are dropped, state is bounded — the 100 TB/day posture
    * (state size ∝ windows in flight × event types, not events). */
  def windowedCounts(events: DataFrame,
                     watermark: String = "1 hour",
                     windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value_c"))

  /** Running per-user event counters via stateful aggregation — streaming
    * upsert (Update mode) keyed by user; state is one row per user. */
  def userActivity(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           max(col("ts")).as("last_seen"))
}
