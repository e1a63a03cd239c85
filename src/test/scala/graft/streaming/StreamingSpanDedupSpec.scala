package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of d8's span dedup: the segment-frequency table is a
  * mergeable aggregate (per-batch DISTINCT (segment, doc) counts add up,
  * because a doc arrives in exactly one batch), so an ingest pipeline
  * maintains it incrementally and re-scores docs against the running table
  * — the same maintain-the-small-state / rescan-nothing shape as the CMS
  * twin ([[StreamingSketchSpec]]). Asserts the incrementally merged
  * frequency table equals the batch-built one over the union of batches,
  * and that the final drop decisions match batch [[TextOps.spanDedup]]. */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def segFreq(docs: DataFrame, segLen: Int): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), expr(s"(size(__t) + ${segLen - 1}) div $segLen").cast("int") - 1),
        i => array_join(slice(col("__t"), i * segLen + 1, lit(segLen)), " "))).as("seg"))
      .select(md5(col("seg").cast("binary")).as("seg_md5"), col("doc_id"))
      .distinct()
      .groupBy(col("seg_md5"))
      .agg(count(lit(1)).as("doc_freq"))

  test("incrementally merged segment frequencies equal the batch table and drive the same drops") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var acc: DataFrame = null

    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val g = segFreq(batch, segLen = 2)
        acc = (if (acc == null) g
               else acc.unionAll(g).groupBy(col("seg_md5"))
                 .agg(sum(col("doc_freq")).as("doc_freq")))
          .localCheckpoint(true)
        ()
      }
      .start()
    val b1 = Seq((1L, "shared legal unique one"), (2L, "totally different text here"))
    val b2 = Seq((3L, "shared legal other words"), (4L, "more fresh content again"))
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val allDocs = (b1 ++ b2).toDF("doc_id", "text")
    val whole = segFreq(allDocs, segLen = 2)
    val diff = acc.unionAll(whole)
      .groupBy(col("seg_md5"))
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_freq")).as("d"))
      .filter(col("c") =!= 2 || col("d") =!= 1)
    assert(diff.isEmpty, "streamed frequency table differs from batch table")

    // the running table reproduces batch spanDedup's drop decisions: docs
    // 1 and 3 each lose the 'shared legal' segment, 2 and 4 lose nothing
    val batchDrops = TextOps.spanDedup(allDocs, "doc_id", "text", segLen = 2, minDocs = 2)
      .select($"doc_id", $"n_dropped").as[(Long, Long)].collect().toMap
    assert(batchDrops === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val hot = acc.filter($"doc_freq" >= 2).select($"seg_md5").as[String].collect().toSet
    val streamDrops = allDocs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), expr("(size(__t) + 1) div 2").cast("int") - 1),
        i => array_join(slice(col("__t"), i * 2 + 1, lit(2)), " "))).as("seg"))
      .withColumn("seg_md5", md5(col("seg").cast("binary")))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("seg_md5").isInCollection(hot), 1L).otherwise(0L)).as("n_dropped"))
      .as[(Long, Long)].collect().toMap
    assert(streamDrops === batchDrops)
  }
}
