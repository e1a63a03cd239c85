package graft.streaming

import graft.SparkSpec
import graft.music._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Whole-topology streaming integration: the reference's test style
  * (TopologyTestDriver piping records through the full DAG — SURVEY §3.2)
  * reproduced as Structured Streaming micro-batches: dimension streams
  * deduped latest-by-key, fact stream joined and aggregated in update mode.
  *
  * Mirrors the reference's join-ordering caveat ("Artist must be processed
  * before stream to ensure the join works",
  * TopStreamingArtistByStateTest.java:153-155): dimensions land in batch 1,
  * facts in batch 2 — the stream-static shape every topology uses.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("topCustomerArtists topology end-to-end over micro-batches") {
    implicit val ctx = spark.sqlContext
    val listens = MemoryStream[Listen]
    // full pipeline: stream → per-(customer, artist) counts, update mode
    val counts = listens.toDF()
      .groupBy(col("customerid"), col("artistid"))
      .agg(count(lit(1)).as("cnt"))
    val q = counts.writeStream.format("memory").queryName("stream_counts")
      .outputMode("update").start()
    try {
      listens.addData(
        Listen("l1", "c1", "a2", "t"), Listen("l2", "c1", "a2", "t"),
        Listen("l3", "c1", "a5", "t"))
      q.processAllAvailable()
      listens.addData(
        Listen("l4", "c1", "a3", "t"), Listen("l5", "c1", "a3", "t"),
        Listen("l6", "c1", "a3", "t"), Listen("l7", "c1", "a5", "t"))
      q.processAllAvailable()
      // the memory sink accumulates updates; latest value per key wins
      val finalCounts = spark.table("stream_counts")
        .groupBy("customerid", "artistid").agg(max("cnt").as("cnt"))
        .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
      assert(finalCounts.toSeq == Seq(("c1", "a2", 2L), ("c1", "a3", 3L), ("c1", "a5", 2L)))
    } finally q.stop()
  }

  test("ticket confirmation topology: stream-static join + stateful ledger") {
    implicit val ctx = spark.sqlContext
    // static dimension (events table), streaming facts (tickets) — the
    // reference's KStream⋈KTable with the table fully materialized
    val events = Seq(Event("e1", "a1", "v1", 3, "today")).toDF()
    val tickets = MemoryStream[Ticket]
    val reqs = tickets.toDS().toDF()
      .join(events.select(col("id").as("eventid"), col("capacity")), "eventid")
      .select(col("id").as("ticketId"), col("customerid"), col("eventid"),
        col("capacity"),
        // arrival order within the stream: ticket id is monotone in tests
        expr("cast(substring(id, 2, 10) as long)").as("seq"))
      .as[TicketReq]
    val q = StatefulOps.capacityLedger(reqs)
      .writeStream.format("memory").queryName("ledger_pipeline")
      .outputMode("update").start()
    try {
      tickets.addData(Ticket("t1", "c1", "e1", 10.0), Ticket("t2", "c2", "e1", 10.0))
      q.processAllAvailable()
      tickets.addData(Ticket("t3", "c3", "e1", 10.0), Ticket("t4", "c4", "e1", 10.0))
      q.processAllAvailable()
      val out = spark.table("ledger_pipeline").as[TicketConfirmation]
        .collect().sortBy(_.ticketId)
      assert(out.map(_.confirmationStatus).toSeq ==
        Seq("CONFIRMED", "CONFIRMED", "CONFIRMED", "REJECTED"))
      assert(out.map(_.remaining).toSeq == Seq(2.0, 1.0, 0.0, -1.0))
    } finally q.stop()
  }

  test("latest-by-key dimension + enrichment join (temporal join semantics)") {
    implicit val ctx = spark.sqlContext
    val artistUpdates = MemoryStream[Keyed[String]] // artist id → genre updates
    val dim = StatefulOps.latestByKey(artistUpdates.toDS())
    val q = dim.writeStream.format("memory").queryName("artist_dim")
      .outputMode("update").start()
    try {
      artistUpdates.addData(Keyed("a1", 1L, "Rock"), Keyed("a2", 2L, "Pop"))
      q.processAllAvailable()
      artistUpdates.addData(Keyed("a1", 3L, "Jazz")) // upsert wins
      q.processAllAvailable()
      val latest = spark.table("artist_dim").as[Keyed[String]].collect()
        .groupBy(_.key).map { case (k, vs) => k -> vs.maxBy(_.seq).value }
      assert(latest == Map("a1" -> "Jazz", "a2" -> "Pop"))
      // enrichment side: the maintained snapshot joins facts as-of now —
      // batch join against the latest state reproduces the KTable view
      val facts = Seq(("l1", "a1"), ("l2", "a2")).toDF("listen", "artistid")
      val snapshot = latest.toSeq.toDF("artistid", "genre")
      val enriched = facts.join(snapshot, "artistid")
        .select("listen", "genre").as[(String, String)].collect().sortBy(_._1)
      assert(enriched.toSeq == Seq(("l1", "Jazz"), ("l2", "Pop")))
    } finally q.stop()
  }

  test("full produce→confirm→email path: ledger confirmations stream into the flaky mail sink") {
    // the reference's whole K3 pipeline in one query — tickets stream →
    // capacity ledger (flatMapGroupsWithState) → ForeachWriter SMTP sink
    // with the deterministic flaky transport — where MailSinkSpec feeds
    // the writer canned confirmations and the ledger spec stops at the
    // memory sink. Asserts the emails AND the retry/dead-letter
    // accounting across two micro-batches.
    import scala.jdk.CollectionConverters._
    MailSinkSpec.inbox.clear()
    implicit val ctx = spark.sqlContext
    val events = Seq(Event("e9", "a1", "v1", 3, "today")).toDF()
    val tickets = MemoryStream[Ticket]
    val reqs = tickets.toDS().toDF()
      .join(events.select(col("id").as("eventid"), col("capacity")), "eventid")
      .select(col("id").as("ticketId"), col("customerid"), col("eventid"),
        col("capacity"),
        expr("cast(substring(id, 2, 10) as long)").as("seq"))
      .as[TicketReq]
    val ticketRows = Seq(
      Ticket("t1", "c1", "e9", 10.0), Ticket("t2", "c2", "e9", 10.0),
      Ticket("t3", "c3", "e9", 10.0), Ticket("t4", "c4", "e9", 10.0))
    // capacity 3 → t1-t3 CONFIRMED, t4 REJECTED; the expected emails are
    // pure functions of that, so the fixture can aim the transient-fail
    // bucket at a message it is guaranteed to contain
    val expected = Seq(
      TicketConfirmation("t1", "c1", "e9", "CONFIRMED", 2.0),
      TicketConfirmation("t2", "c2", "e9", "CONFIRMED", 1.0),
      TicketConfirmation("t3", "c3", "e9", "CONFIRMED", 0.0),
      TicketConfirmation("t4", "c4", "e9", "REJECTED", -1.0))
      .map(Mail.confirmationEmail)
    def bucket(m: Mail.Message): Int =
      math.floorMod((m.to + "|" + m.subject).hashCode, 10)
    val failBucket = bucket(expected.head)
    val transient = expected.count(bucket(_) == failBucket)
    val sent = spark.sparkContext.longAccumulator("e2e_mail_sent")
    val retried = spark.sparkContext.longAccumulator("e2e_mail_retried")
    val failed = spark.sparkContext.longAccumulator("e2e_mail_failed")
    val writer = new Mail.ConfirmationMailWriter(
      new Mail.FlakyTransport(new MailSinkSpec.RecordingTransport,
        failBucket = failBucket, hardFailBucket = -1, sleepBucket = -1, sleepMs = 0L),
      sent, retried, failed, maxAttempts = 3)
    val q = StatefulOps.capacityLedger(reqs)
      .writeStream.foreach(writer).outputMode("update").start()
    try {
      tickets.addData(ticketRows(0), ticketRows(1))
      q.processAllAvailable()
      tickets.addData(ticketRows(2), ticketRows(3))
      q.processAllAvailable()
    } finally q.stop()
    assert(MailSinkSpec.inbox.asScala.toSet == expected.toSet,
      "delivered mailbox diverges from the ledger's confirmations")
    assert(expected.count(_.body == "Your ticket has been CONFIRMED!") == 3)
    assert(expected.count(_.body == "Your ticket has been REJECTED!") == 1)
    assert(sent.value == 4L, "every confirmation must eventually send")
    assert(retried.value == transient.toLong,
      "each transient-bucket message retries exactly once per epoch it appears in")
    assert(failed.value == 0L)
  }
}
