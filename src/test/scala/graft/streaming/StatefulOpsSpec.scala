package graft.streaming

import graft.SparkSpec
import graft.music.{CountEntry, TicketConfirmation, TopPerKey}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-semantics specs: batch-mode folds (deterministic oracle) plus
  * real micro-batch runs over MemoryStream, asserting state carries across
  * batches — the per-batch analog of the reference's per-record emission
  * (SURVEY §7.4.1: one record per batch reproduces the reference exactly).
  */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches[T](q: StreamingQuery): Unit = q.processAllAvailable()

  // ------------------------------------------------------------ batch mode

  test("capacityLedger (batch): golden capacity-5 countdown") {
    val reqs = (1 to 8).map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong))
    val out = StatefulOps.capacityLedger(reqs.toDS())
      .collect().sortBy(_.ticketId)
    assert(out.take(5).forall(_.confirmationStatus == "CONFIRMED"))
    assert(out.drop(5).forall(_.confirmationStatus == "REJECTED"))
    assert(out.map(_.remaining).toSeq == Seq(4.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -3.0))
  }

  test("capacityLedger (batch) sorts the group slice by seq, not arrival") {
    // feed reversed: without the in-group sort, verdicts would invert
    val reqs = (1 to 8).reverse.map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong))
    val out = StatefulOps.capacityLedger(reqs.toDS())
      .collect().sortBy(_.ticketId)
    assert(out.take(5).forall(_.confirmationStatus == "CONFIRMED"))
    assert(out.drop(5).forall(_.confirmationStatus == "REJECTED"))
  }

  // ------------------------------------------------------- streaming mode

  test("capacityLedger (streaming): state persists across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TicketReq]
    val q = StatefulOps.capacityLedger(in.toDS())
      .writeStream.format("memory").queryName("ledger_out").outputMode("update").start()
    try {
      in.addData((1 to 3).map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong)))
      runBatches(q)
      in.addData((4 to 8).map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong)))
      runBatches(q)
      val out = spark.table("ledger_out").as[TicketConfirmation]
        .collect().sortBy(_.ticketId)
      assert(out.length == 8)
      assert(out.take(5).forall(_.confirmationStatus == "CONFIRMED"))
      assert(out.drop(5).forall(_.confirmationStatus == "REJECTED"))
      assert(out.map(_.remaining).toSeq == Seq(4.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -3.0))
    } finally q.stop()
  }

  test("latestByKey (streaming): later batches overwrite, stale seqs don't") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.latestByKey(in.toDS())
      .writeStream.format("memory").queryName("latest_out").outputMode("update").start()
    try {
      in.addData(Keyed("k1", 1L, "v1"), Keyed("k2", 1L, "w1"))
      runBatches(q)
      in.addData(Keyed("k1", 5L, "v2"))
      runBatches(q)
      in.addData(Keyed("k1", 3L, "stale")) // older than state → must NOT win
      runBatches(q)
      val byKey = spark.table("latest_out").as[Keyed[String]].collect()
        .groupBy(_.key).map { case (k, vs) => k -> vs.maxBy(_.seq).value }
      assert(byKey == Map("k1" -> "v2", "k2" -> "w1"))
    } finally q.stop()
  }

  test("latestByKeyTtl evicts idle state; the key re-learns from scratch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    // ProcessingTimeTimeout keeps scheduling clock-check batches, so (a) a
    // real trigger interval, not the ASAP default, and (b) NO
    // processAllAvailable — it never returns under this timeout mode (see
    // latestByKeyTtl scaladoc). Poll the sink with a deadline instead.
    val q = StatefulOps.latestByKeyTtl(in.toDS(), ttlMs = 500L)
      .writeStream.format("memory").queryName("latest_ttl_out")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def awaitSink(deadlineMs: Long)(cond: Set[String] => Boolean): Set[String] = {
      val deadline = System.currentTimeMillis() + deadlineMs
      var seen = Set.empty[String]
      while (System.currentTimeMillis() < deadline && !cond(seen)) {
        Thread.sleep(100)
        seen = spark.table("latest_ttl_out").as[Keyed[String]].collect()
          .filter(_.key == "k1").map(_.value).toSet
      }
      seen
    }
    // poll for the eviction ITSELF (state rows removed across recent
    // progress reports) rather than sleeping a fixed interval: on a loaded
    // host the timeout batch can land arbitrarily late, and injecting the
    // low-seq record while seq=10 state is still alive would both lose the
    // race and re-arm the TTL timer — a spurious failure
    def totalRemoved: Long = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsRemoved).sum
    def awaitEviction(deadlineMs: Long): Boolean = {
      val deadline = System.currentTimeMillis() + deadlineMs
      while (System.currentTimeMillis() < deadline && totalRemoved == 0)
        Thread.sleep(100)
      totalRemoved > 0
    }
    try {
      in.addData(Keyed("k1", 10L, "old-high-seq"))
      assert(awaitSink(30000)(_.contains("old-high-seq")).contains("old-high-seq"))
      assert(awaitEviction(60000), "TTL eviction batch never removed k1's state")
      // k1's state is gone: a LOWER seq now wins and gets emitted (with
      // live state, maxBy would re-emit old-high-seq/seq=10 instead)
      in.addData(Keyed("k1", 2L, "fresh-low-seq"))
      val seen = awaitSink(30000)(_.contains("fresh-low-seq"))
      assert(seen.contains("fresh-low-seq"),
        s"expected evicted state to let seq=2 win, got emissions $seen")
    } finally q.stop()
  }

  test("runningCount (streaming): counts accumulate per batch (update emission)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.runningCount(in.toDS())
      .writeStream.format("memory").queryName("count_out").outputMode("update").start()
    try {
      in.addData(Keyed("c1", 1L, "x"))
      runBatches(q)
      in.addData(Keyed("c1", 2L, "x"), Keyed("c2", 3L, "x"))
      runBatches(q)
      in.addData(Keyed("c1", 4L, "x"))
      runBatches(q)
      // reference golden behavior (CustomerStreamCounterTest.java:70-96):
      // running count 1,2,3 for customer 1; 1 for customer 2
      val emitted = spark.table("count_out").as[(String, Long)].collect().toSeq
      assert(emitted.filter(_._1 == "c1").map(_._2).sorted == Seq(1L, 2L, 3L))
      assert(emitted.filter(_._1 == "c2").map(_._2) == Seq(1L))
    } finally q.stop()
  }

  test("topKCounter (streaming): ordered top-3 with stable ties across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.topKCounter(in.toDS(), 3)
      .writeStream.format("memory").queryName("topk_out").outputMode("update").start()
    try {
      // arrival order a2,a2,a5,a5 then a3,a3,a3 — mirrors the reference's
      // stable-tie golden (TopCustomerArtistsTest.java:94-113)
      in.addData(Keyed("c1", 1L, "a2"), Keyed("c1", 2L, "a2"),
        Keyed("c1", 3L, "a5"), Keyed("c1", 4L, "a5"))
      runBatches(q)
      in.addData(Keyed("c1", 5L, "a3"), Keyed("c1", 6L, "a3"), Keyed("c1", 7L, "a3"))
      runBatches(q)
      // two update emissions for c1 (one per batch); identify by content —
      // the memory sink doesn't guarantee row order across batches
      val emissions = spark.table("topk_out").as[TopPerKey].collect()
      assert(emissions.length == 2)
      val Seq(afterB1, afterB2) = emissions.sortBy(_.top.length).toSeq
      // batch 1: ties broken by first-increment order: a2 before a5
      assert(afterB1.top == Seq(CountEntry("a2", 2), CountEntry("a5", 2)))
      assert(afterB2.top == Seq(CountEntry("a3", 3), CountEntry("a2", 2), CountEntry("a5", 2)))
    } finally q.stop()
  }
}
