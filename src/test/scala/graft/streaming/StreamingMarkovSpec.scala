package graft.streaming

import graft.SparkSpec
import graft.queries.RelationalQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of x13's transition matrix: per-user chaining through a
  * three-field state must emit exactly the transitions the batch lead
  * window derives, on every fed prefix, with within-batch disorder
  * tolerated (the handler sorts its slice). */
class StreamingMarkovSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, event_type, ts_us); within-batch order scrambled
  private val batch1 = Seq(
    MarkovEvent(1L, 12L, "C", 300L), MarkovEvent(1L, 10L, "A", 100L),
    MarkovEvent(1L, 11L, "B", 200L),
    MarkovEvent(2L, 20L, "B", 100L))
  private val batch2 = Seq(
    MarkovEvent(2L, 21L, "A", 200L), MarkovEvent(2L, 22L, "B", 300L),
    MarkovEvent(1L, 13L, "A", 400L),
    MarkovEvent(3L, 30L, "C", 50L)) // single event: no transition yet

  private def batchMatrix(events: Seq[MarkovEvent]) =
    RelationalQueries.markovFrom(
      events.map(e => (e.userId, e.eventId, e.eventType, e.tsUs))
        .toDF("user_id", "event_id", "event_type", "ts_us"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_trans"))
      .toMap

  test("incremental transitions equal the batch lead window on every fed prefix") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MarkovEvent]
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = StatefulOps.markovTransitions(in.toDS())
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
        got ++= b.collect(); ()
      }
      .start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      val afterB1 = got.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(afterB1 == batchMatrix(batch1).map { case (k, n) => k -> n },
        s"prefix 1 diverged: $afterB1")

      in.addData(batch2: _*)
      q.processAllAvailable()
      val afterB2 = got.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(afterB2 == batchMatrix(batch1 ++ batch2).map { case (k, n) => k -> n },
        s"prefix 2 diverged: $afterB2")
    } finally q.stop()
  }

  test("cross-batch chaining: a user's tail event links to its next batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MarkovEvent]
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = StatefulOps.markovTransitions(in.toDS())
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
        got ++= b.collect(); ()
      }
      .start()
    try {
      in.addData(MarkovEvent(9L, 1L, "A", 10L))
      q.processAllAvailable()
      assert(got.isEmpty, "single event must emit no transition")
      in.addData(MarkovEvent(9L, 2L, "B", 20L))
      q.processAllAvailable()
      assert(got.toSeq == Seq(("A", "B")), s"got $got")
    } finally q.stop()
  }
}
