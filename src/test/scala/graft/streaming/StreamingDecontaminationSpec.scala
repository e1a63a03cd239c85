package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of cross-corpus decontamination (d7/d9's serving shape):
  * the EVAL side is a fixed, broadcastable artifact, so screening arriving
  * training docs is stateless per-micro-batch scan work — no state store,
  * no history. Each batch's flagged (train, eval) pairs must equal the
  * batch operator's output restricted to that batch's doc ids, for both
  * the exact-overlap (d7) and the banded near-dup (d9) modalities. */
class StreamingDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (200L, "pack my box with five dozen liquor jugs"))
  private val trainDocs = Seq(
    (1L, "the quick brown fox jumps over a sleepy dog today"), // near-dup of 100
    (2L, "completely unrelated text about spark plans"),
    (3L, "pack my box with five dozen liquor jugs please"), // near-dup of 200
    (4L, "another unrelated document entirely different words"))

  test("per-batch screening equals the batch operator on both modalities") {
    implicit val ctx = spark.sqlContext
    val eval = evalDocs.toDF("doc_id", "text")
    val all = trainDocs.toDF("doc_id", "text")

    val batchExact = TextOps.decontaminationPairs(all, eval, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val batchNear = TextOps.crossCorpusNearDups(all, eval, "doc_id", "text")
      .select($"train_id", $"eval_id").as[(Long, Long)].collect().toSet

    val in = MemoryStream[(Long, String)]
    val gotExact = scala.collection.mutable.Set[(Long, Long, Long)]()
    val gotNear = scala.collection.mutable.Set[(Long, Long)]()
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        gotExact ++= TextOps.decontaminationPairs(b, eval, "doc_id", "text")
          .as[(Long, Long, Long)].collect()
        gotNear ++= TextOps.crossCorpusNearDups(b, eval, "doc_id", "text")
          .select($"train_id", $"eval_id").as[(Long, Long)].collect()
        ()
      }
      .start()
    try {
      in.addData(trainDocs.take(2): _*)
      q.processAllAvailable()
      in.addData(trainDocs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(gotExact.toSet == batchExact,
      s"streamed exact-overlap pairs ${gotExact.toSet} != batch $batchExact")
    assert(gotNear.toSet == batchNear,
      s"streamed near-dup pairs ${gotNear.toSet} != batch $batchNear")
    assert(gotNear.map(_._1).intersect(Set(1L, 3L)).nonEmpty,
      "construction broken: the planted near-dups were never flagged")
  }
}
