package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream join + streaming dedup semantics over micro-batches. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream join matches within tolerance, across batches, not beyond") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp, String)]
    val views = MemoryStream[(String, Timestamp, String)]
    val joined = JoinOps.streamStreamJoin(
      clicks.toDF().toDF("user", "cts", "click_id"),
      views.toDF().toDF("user", "vts", "view_id").withColumnRenamed("user", "user2")
        .withColumnRenamed("user2", "user"),
      Seq("user"), "cts", "vts", tolerance = "10 minutes", watermark = "30 minutes")
    val q = joined.selectExpr("click_id", "view_id")
      .writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      // view first (batch 1), matching click later (batch 2) — the join
      // buffers across micro-batches
      views.addData(("u1", ts(0), "v1"), ("u1", ts(30), "v2"), ("u2", ts(5), "v3"))
      q.processAllAvailable()
      clicks.addData(
        ("u1", ts(5), "c1"),  // within 10 min of v1 only
        ("u1", ts(25), "c2"), // within 10 min of v2 only
        ("u1", ts(15), "c3"), // 15 min from both -> no match (append mode drops)
        ("u3", ts(5), "c4"))  // no views for u3
      q.processAllAvailable()
      val got = spark.table("ss_join").as[(String, String)].collect().toSet
      assert(got == Set(("c1", "v1"), ("c2", "v2")))
    } finally q.stop()
  }

  test("dedupWithinWatermark keeps first occurrence, drops in-horizon duplicates") {
    implicit val ctx = spark.sqlContext
    val docs = MemoryStream[(String, Timestamp, String)]
    val deduped = JoinOps.dedupWithinWatermark(
      docs.toDF().toDF("fp", "ts", "doc_id"), "ts", Seq("fp"), "1 hour")
    val q = deduped.selectExpr("doc_id")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      docs.addData(("h1", ts(0), "d1"), ("h2", ts(1), "d2"), ("h1", ts(2), "d3"))
      q.processAllAvailable()
      docs.addData(("h1", ts(10), "d4"), ("h3", ts(11), "d5")) // h1 dup across batches
      q.processAllAvailable()
      val got = spark.table("dedup_stream").as[String].collect().toSet
      assert(got == Set("d1", "d2", "d5"))
    } finally q.stop()
  }
}
