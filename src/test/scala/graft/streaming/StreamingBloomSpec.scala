package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of a10's bloom semi-join pruning: each micro-batch of
  * build-side keys contributes its own bit set, merged into the running set
  * by distinct union — bits only turn ON, so the merge is monotone and
  * never re-reads history (the property [[graft.operators.SketchSpec]]
  * pins statically for corpus shards). Asserts the incrementally
  * maintained set equals the batch-built set over the union of all
  * batches, AND that every probe-side prune decision is identical —
  * equality of the filter, not just the bits. */
class StreamingBloomSpec extends SparkSpec {
  import spark.implicits._

  test("incrementally merged bloom bits equal the batch set and make identical prune decisions") {
    implicit val ctx = spark.sqlContext
    val m = 64
    val in = MemoryStream[String]
    var acc: DataFrame = null

    val q = in.toDF().toDF("k")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bits = Sketch.bloomBits(batch, "k", m)
        acc = (if (acc == null) bits else acc.unionAll(bits).distinct())
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      in.addData("u1", "u2", "u1")
      q.processAllAvailable()
      in.addData("u3", "u2", "u4")
      q.processAllAvailable()
    } finally q.stop()

    val whole = Sketch.bloomBits(
      Seq("u1", "u2", "u1", "u3", "u2", "u4").toDF("k"), "k", m)
    assert(acc.exceptAll(whole).isEmpty && whole.exceptAll(acc).isEmpty,
      "streamed bit set differs from batch bit set")

    // identical prune decisions on a probe mix of members and outsiders:
    // the maybe flag from the streamed set must equal the batch set's flag
    // row for row (false negatives are impossible by construction; equal
    // bits make even the false POSITIVES identical)
    val probe = Seq("u1", "u2", "u3", "u4", "z1", "z2", "z3").toDF("k")
    val streamed = Sketch.bloomMaybe(probe, "k", acc, m)
      .as[(String, Boolean)].collect().toMap
    val batch = Sketch.bloomMaybe(probe, "k", whole, m)
      .as[(String, Boolean)].collect().toMap
    assert(streamed == batch,
      s"prune decisions diverge: streamed=$streamed batch=$batch")
    Seq("u1", "u2", "u3", "u4").foreach(k =>
      assert(streamed(k), s"member $k lost — bloom false negative"))
  }
}
