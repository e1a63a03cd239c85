package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

final case class DocEvent(ts: Timestamp, doc_id: Long, text: String, source: String)

/** Streaming twin of the c1 corpus pipeline's per-record stages: incoming
  * docs are content-fingerprint deduped inside the watermark horizon, pass
  * the per-row quality rules, and feed per-source counts in update mode —
  * the ingest-time half of corpus cleaning. (The corpus-wide stages — LSH
  * near-dup pairs and cluster collapse — are inherently cross-record and
  * stay batch, the standard lambda split the SCALE.md streaming section
  * documents.) Asserts the streaming answer equals the batch pipeline over
  * the same records.
  */
class StreamingCorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming dedup + quality filter + per-source counts equals the batch run") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DocEvent]

    def qualityPipeline(df: org.apache.spark.sql.DataFrame) = {
      val toks = TextOps.tokens(col("text"))
      df.withColumn("__n", size(toks))
        .withColumn("__d", size(array_distinct(toks)))
        // per-row quality rules (the streaming-computable subset of t10):
        // enough tokens, and not dominated by repeats
        .filter(col("__n") >= 3 && col("__d").cast("double") / col("__n") >= 0.5)
    }

    val cleaned = qualityPipeline(
      JoinOps.dedupWithinWatermark(in.toDF(), "ts", Seq("text"), "1 hour"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"))
    val q = cleaned.writeStream.format("memory").queryName("corpus_stream")
      .outputMode("update").start()

    val batch1 = Seq(
      DocEvent(t("2024-01-01 10:00:00"), 1L, "alpha beta gamma delta", "a"),
      DocEvent(t("2024-01-01 10:00:01"), 2L, "alpha beta gamma delta", "a"), // exact dup -> dropped
      DocEvent(t("2024-01-01 10:00:02"), 3L, "spam spam spam spam spam", "a"), // repetition -> dropped
      DocEvent(t("2024-01-01 10:00:03"), 4L, "one two", "b")) // too short -> dropped
    val batch2 = Seq(
      DocEvent(t("2024-01-01 10:10:00"), 5L, "alpha beta gamma delta", "b"), // dup of doc 1 (cross-batch, in-horizon) -> dropped
      DocEvent(t("2024-01-01 10:10:01"), 6L, "epsilon zeta eta theta", "b"),
      DocEvent(t("2024-01-01 10:10:02"), 7L, "iota kappa lambda mu nu", "a"))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()

      val streamed = spark.table("corpus_stream")
        .groupBy($"source").agg(max($"docs_kept").as("docs_kept"))
        .as[(String, Long)].collect().toMap

      // batch reference over the SAME records: exact dedup keeps the
      // earliest fingerprint occurrence, then the same per-row rules
      val all = (batch1 ++ batch2).toDF()
      val firstSeen = all
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("ts").asc, col("doc_id").asc)))
        .filter(col("rn") === 1).drop("rn")
      val batchRef = qualityPipeline(firstSeen)
        .groupBy(col("source")).agg(count(lit(1)).as("docs_kept"))
        .as[(String, Long)].collect().toMap

      assert(streamed == batchRef)
      assert(streamed == Map("a" -> 2L, "b" -> 1L)) // docs 1, 7 / 6
    } finally q.stop()
  }
}
