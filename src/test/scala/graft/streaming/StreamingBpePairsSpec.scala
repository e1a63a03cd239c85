package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of t20's BPE pair counting: pair counts are a MERGEABLE
  * aggregate (plain integer addition per pair), so each micro-batch counts
  * its own documents and merges into the running table by summation —
  * tokenizer-training statistics maintained under ingest without re-reading
  * the corpus. Asserts the incrementally merged counts equal the batch
  * counts over the union of all fed documents, after every batch. */
class StreamingBpePairsSpec extends SparkSpec {
  import spark.implicits._

  test("incrementally merged pair counts equal the batch counts on every fed prefix") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var acc: DataFrame = null

    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val g = TextOps.bpePairCounts(batch, "text")
        acc = (if (acc == null) g
               else acc.unionAll(g).groupBy(col("pair"))
                 .agg(sum(col("cnt")).as("cnt")))
          .localCheckpoint(true)
        ()
      }
      .start()

    val batches = Seq(
      Seq((1L, "abab ab"), (2L, "x yz")),
      Seq((3L, "zz zz zz"), (4L, "")),
      Seq((5L, "abab")))
    try {
      var fed = Seq.empty[(Long, String)]
      for (b <- batches) {
        in.addData(b: _*)
        q.processAllAvailable()
        fed = fed ++ b
        val whole = TextOps.bpePairCounts(fed.toDF("doc_id", "text"), "text")
          .as[(String, Long)].collect().toMap
        val streamed = acc.as[(String, Long)].collect().toMap
        assert(streamed == whole, s"divergence after ${fed.size} docs")
      }
    } finally q.stop()
  }
}
