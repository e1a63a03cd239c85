package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

final case class TrendEvt(ts: Timestamp, event_type: String)

/** Streaming twin of w4's trending top-k: the STREAMED state is the
  * update-mode windowed counts (WindowedOps.tumblingRollup — bounded by
  * the watermark); the per-window top-3 is derived AT READ by the same
  * `trendingTopkFrom` the batch gate ranks with. Ranking at read rather
  * than in-stream means a late-arriving count updates one (window, type)
  * row and the next read re-ranks — the stream never materializes a
  * per-window leaderboard that an update would have to retract. The spec
  * pins: on every fed prefix, ranking the latest streamed counts equals
  * the batch pipeline over the same prefix, including the
  * (cnt DESC, type ASC) tie order. */
class StreamingTrendingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    TrendEvt(t("2024-01-01 10:05:00"), "view"),
    TrendEvt(t("2024-01-01 10:10:00"), "view"),
    TrendEvt(t("2024-01-01 10:15:00"), "click"),
    TrendEvt(t("2024-01-01 10:20:00"), "cart"),
    TrendEvt(t("2024-01-01 10:25:00"), "buy"),   // 4 types: one falls off top-3
    TrendEvt(t("2024-01-01 11:05:00"), "click"))
  private val batch2 = Seq(
    TrendEvt(t("2024-01-01 10:40:00"), "cart"),  // late update to hour 10
    TrendEvt(t("2024-01-01 10:45:00"), "cart"),  // cart overtakes view
    TrendEvt(t("2024-01-01 11:20:00"), "view"),
    TrendEvt(t("2024-01-01 11:25:00"), "view"))

  private def batchRanks(prefix: Seq[TrendEvt]): Seq[(Long, String, Long, Int)] =
    RelationalQueries.trendingTopkFrom(
      prefix.map(e => (e.ts.getTime / 3600000L, e.event_type))
        .toDF("hour_bucket", "event_type")
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt")))
      .as[(Long, String, Long, Int)].collect().toSeq

  test("rank-at-read over streamed counts equals the batch top-3 per prefix") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TrendEvt]
    // value column unused by the count side; feed a constant
    val q = WindowedOps.tumblingRollup(
        in.toDF().withColumn("value", lit(1.0)), "ts", "event_type", "value",
        windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("trend_counts")
      .outputMode("update").start()
    try {
      for ((batch, prefix) <- Seq(
          (batch1, batch1), (batch2, batch1 ++ batch2))) {
        in.addData(batch: _*)
        q.processAllAvailable()
        // latest count per (window, type): update mode re-emits rows, the
        // memory sink appends — max(n) per key IS the latest (counts only
        // grow), the same read a serving store would do by upsert
        val latest = spark.table("trend_counts")
          .groupBy(col("window_start"), col("event_type"))
          .agg(max(col("n")).as("cnt"))
          .select((unix_timestamp(col("window_start")) / 3600L).cast("long")
            .as("hour_bucket"), col("event_type"), col("cnt"))
        val streamed = RelationalQueries.trendingTopkFrom(latest)
          .as[(Long, String, Long, Int)].collect().toSeq
        assert(streamed == batchRanks(prefix),
          s"prefix of ${prefix.size} diverged:\n$streamed\nvs\n${batchRanks(prefix)}")
      }
    } finally q.stop()
  }
}
