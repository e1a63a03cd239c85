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
}
