package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking.
  *
  * The reference has NO windows or watermarks (SURVEY §2.9) — all its state
  * is global-over-all-time, which cannot survive 100 TB/unbounded streams.
  * These operators are the scale path: bounded state via watermark-driven
  * eviction, offered alongside the parity (unbounded) semantics.
  */
object WindowedOps {

  /** Tumbling-window rollup: count + sum per (window, key). The watermark
    * bounds state: windows older than `watermark` behind max event time are
    * finalized and evicted from the state store. */
  def tumblingRollup(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowLen: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Sliding-window variant (overlapping windows — e.g. 1h windows every
    * 15 min). */
  def slidingRollup(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowLen: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Session windows: gap-based grouping per key (dynamic window length). */
  def sessionRollup(
      events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))
}
