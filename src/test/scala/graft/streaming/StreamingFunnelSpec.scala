package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of x8's funnel: per-user running state under in-order
  * delivery must land on exactly the batch semantics — first view, then
  * first click at-or-after it, clicks BEFORE any view never convert, an
  * equal-timestamp click converts (the batch ≥ comparison), and state is
  * two longs per user. Out-of-order WITHIN a batch is tolerated (the
  * handler sorts its slice); across batches time advances per key. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("running funnel state equals the batch first-view/first-click semantics") {
    implicit val ctx = spark.sqlContext
    // user 1: converts (view 10 -> click 30; the click at 5 is BEFORE any
    //   view and must not count)
    // user 2: click only -> never converts
    // user 3: view only -> never converts
    // user 4: click at the SAME ts as the view -> converts with gap 0
    val batch1 = Seq(
      FunnelEvent(1L, "click", 5L), FunnelEvent(1L, "view", 10L),
      FunnelEvent(2L, "click", 7L),
      FunnelEvent(4L, "view", 50L), FunnelEvent(4L, "click", 50L))
    val batch2 = Seq(
      FunnelEvent(1L, "click", 30L), FunnelEvent(1L, "click", 40L),
      FunnelEvent(3L, "view", 90L))

    val in = MemoryStream[FunnelEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.funnel(in.toDS())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3))
        ()
      }
      .start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got(1L) == ((10L, 30L)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((-1L, -1L)), "click before any view must not convert")
    assert(got(3L) == ((90L, -1L)), "view-only user keeps firstClick = -1")
    assert(got(4L) == ((50L, 50L)), "equal-timestamp click must convert (>= semantics)")
  }

  test("funnelAligned converges when an equal-ts click lands a batch BEFORE its view") {
    implicit val ctx = spark.sqlContext
    // the documented caveat case plain funnel cannot solve: user 4's click
    // arrives one micro-batch before a view with the SAME timestamp; the
    // watermark-aligned variant holds both until the watermark strictly
    // passes 50s, then folds them sorted view-first -> batch `>=` answer.
    // delay=20s is the disorder budget: Spark's late filter drops rows at
    // or below the watermark, so the split events must stay inside it.
    val in = MemoryStream[FunnelEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.funnelAligned(in.toDS(), delay = "20 seconds")
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3))
        ()
      }
      .start()
    try {
      // ts in µs; watermark math is in ms
      in.addData(FunnelEvent(1L, "view", 10000000L), FunnelEvent(4L, "click", 50000000L))
      q.processAllAvailable() // watermark after this batch: 50s - 20s = 30s
      in.addData(FunnelEvent(1L, "click", 50000000L), FunnelEvent(4L, "view", 50000000L))
      q.processAllAvailable() // u1 view (10s < 30s) folds; the 50s events hold
      in.addData(FunnelEvent(9L, "view", 100000000L)) // wm -> 80s after this batch
      q.processAllAvailable()
      in.addData(FunnelEvent(9L, "click", 110000000L)) // wm=80s: u1/u4 timeouts fire
      q.processAllAvailable()
    } finally q.stop()

    assert(got(1L) == ((10000000L, 50000000L)), s"in-order user drifted: ${got(1L)}")
    assert(got(4L) == ((50000000L, 50000000L)),
      s"equal-ts click split a batch BEFORE its view must still convert: ${got(4L)}")
    assert(got(9L) == ((-1L, -1L)),
      "events inside the watermark delay must stay buffered, not fold early")
  }
}
