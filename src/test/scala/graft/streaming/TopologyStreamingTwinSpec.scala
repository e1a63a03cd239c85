package graft.streaming

import graft.SparkSpec
import graft.music._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins for the two remaining phase-3 topologies: the SAME
  * [[Topologies]] code that the batch oracle gates runs here as a streaming
  * DAG — dimension streams deduped latest-by-key into KTable snapshots,
  * facts arriving in a later micro-batch (the reference's ordering caveat:
  * "Artist must be processed before stream to ensure the join works",
  * TopStreamingArtistByStateTest.java:153-155).
  *
  * Each test also upserts a dimension row BEFORE the facts arrive, pinning
  * the KTable semantics the reference relies on: the latest version of a
  * key, not the first, is what facts join against.
  */
class TopologyStreamingTwinSpec extends SparkSpec {
  import spark.implicits._

  /** Latest-version-per-key snapshot of a `latestByKey` update stream that
    * was materialized to a memory sink (update mode appends every emission,
    * so the table holds all versions; max_by(seq) recovers the KTable). */
  private def snapshot(table: String): DataFrame =
    spark.table(table)
      .groupBy($"key")
      .agg(max_by($"value", $"seq").as("v"))
      .select($"v.*")

  test("topStreamingArtistByState twin: dim streams -> KTable snapshots -> streaming counts") {
    implicit val ctx = spark.sqlContext

    // -- batch 1: dimension streams, deduped latest-by-key ---------------
    val artistUpd = MemoryStream[Keyed[Artist]]
    val addrUpd = MemoryStream[Keyed[Address]]
    val qa = StatefulOps.latestByKey(artistUpd.toDS())
      .writeStream.format("memory").queryName("twin_artists")
      .outputMode("update").start()
    val qd = StatefulOps.latestByKey(addrUpd.toDS())
      .writeStream.format("memory").queryName("twin_addrs")
      .outputMode("update").start()

    def addr(id: String, cust: String, state: String) =
      Address(id, cust, "F1", "HOME", "1 Main St", "", "City", state,
        "55555", "1234", "USA", 0.0, 0.0)

    try {
      artistUpd.addData(
        Keyed("a1", 1L, Artist("a1", "Prince", "Funk")),
        Keyed("a2", 1L, Artist("a2", "Dylan", "Folk")),
        // upsert: the name facts must see is the LATEST version
        Keyed("a1", 2L, Artist("a1", "The Artist", "Funk")))
      addrUpd.addData(
        Keyed("ad1", 1L, addr("ad1", "c1", "MN")),
        Keyed("ad2", 1L, addr("ad2", "c2", "MN")),
        Keyed("ad3", 1L, addr("ad3", "c3", "WI")),
        // upsert: c2 moved to WI before any listens arrive
        Keyed("ad2", 2L, addr("ad2", "c2", "WI")))
      qa.processAllAvailable()
      qd.processAllAvailable()
      val artists = snapshot("twin_artists")
      val addrs = snapshot("twin_addrs")
      assert(artists.filter($"id" === "a1").select($"name").as[String].head() == "The Artist")

      // -- batch 2: the fact stream through the PRODUCTION topology ------
      val listens = MemoryStream[Listen]
      val counts = Topologies.artistStateCounts(listens.toDF(), artists, addrs)
      val qc = counts.writeStream.format("memory").queryName("twin_counts")
        .outputMode("update").start()
      try {
        val facts = Seq(
          Listen("l1", "c1", "a1", "t"), Listen("l2", "c1", "a1", "t"),
          Listen("l3", "c2", "a1", "t"), // c2 counts toward WI, not MN
          Listen("l4", "c3", "a2", "t"), Listen("l5", "c3", "a2", "t"),
          Listen("l6", "c2", "a2", "t"))
        listens.addData(facts: _*)
        qc.processAllAvailable()

        // latest count per (artist, state); counts only grow, so max wins
        val streamed = spark.table("twin_counts")
          .groupBy($"artistid", $"state")
          .agg(max_by(struct($"artistName", $"cnt"), $"cnt").as("v"))
          .select($"artistid", $"state", $"v.artistName", $"v.cnt")
        val got = streamed.as[(String, String, String, Long)].collect().toSet
        assert(got == Set(
          ("a1", "MN", "The Artist", 2L),
          ("a1", "WI", "The Artist", 1L),
          ("a2", "WI", "Dylan", 3L)))

        // the per-state winner (the topology's windowed tail runs on the
        // maintained counts) must equal the batch topology over the same
        // snapshots — streaming and batch answers coincide
        val batch = Topologies.topStreamingArtistByState(facts.toDF(), artists, addrs)
          .select($"state", $"artistid", $"artistName", $"cnt")
          .as[(String, String, String, Long)].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"state").orderBy($"cnt".desc, $"artistid".asc)
        val winners = streamed
          .withColumn("rank", row_number().over(w)).filter($"rank" === 1)
          .select($"state", $"artistid", $"artistName", $"cnt")
          .as[(String, String, String, Long)].collect().toSet
        assert(winners == batch)
        assert(winners == Set(("MN", "a1", "The Artist", 2L), ("WI", "a2", "Dylan", 3L)))
      } finally qc.stop()
    } finally { qa.stop(); qd.stop() }
  }

  test("outOfStateSales twin: 4-way join pipeline over KTable snapshots") {
    implicit val ctx = spark.sqlContext

    // -- batch 1: dimensions (addresses, events, venues) -----------------
    val addrUpd = MemoryStream[Keyed[Address]]
    val eventUpd = MemoryStream[Keyed[Event]]
    val venueUpd = MemoryStream[Keyed[Venue]]
    val qd = StatefulOps.latestByKey(addrUpd.toDS())
      .writeStream.format("memory").queryName("oos_addrs")
      .outputMode("update").start()
    val qe = StatefulOps.latestByKey(eventUpd.toDS())
      .writeStream.format("memory").queryName("oos_events")
      .outputMode("update").start()
    val qv = StatefulOps.latestByKey(venueUpd.toDS())
      .writeStream.format("memory").queryName("oos_venues")
      .outputMode("update").start()

    def addr(id: String, cust: String, state: String) =
      Address(id, cust, "F1", "HOME", "1 Main St", "", "City", state,
        "55555", "1234", "USA", 0.0, 0.0)

    try {
      addrUpd.addData(
        Keyed("ad-v1", 1L, addr("ad-v1", "", "MN")), // venue address
        Keyed("ad-c1", 1L, addr("ad-c1", "c1", "WI")),
        Keyed("ad-c2", 1L, addr("ad-c2", "c2", "MN")),
        Keyed("ad-c3", 1L, addr("ad-c3", "c3", "MN")),
        // upsert: c3 moved out of state before buying — latest must win
        Keyed("ad-c3", 2L, addr("ad-c3", "c3", "WI")))
      eventUpd.addData(Keyed("e1", 1L, Event("e1", "a1", "v1", 100, "today")))
      venueUpd.addData(Keyed("v1", 1L, Venue("v1", "ad-v1", "First Ave", 1500)))
      qd.processAllAvailable(); qe.processAllAvailable(); qv.processAllAvailable()
      val addrs = snapshot("oos_addrs")
      val events = snapshot("oos_events")
      val venues = snapshot("oos_venues")

      // -- batch 2: ticket facts through the PRODUCTION topology ---------
      val tickets = MemoryStream[Ticket]
      val sales = Topologies.outOfStateSales(tickets.toDF(), addrs, events, venues)
      val qs = sales.writeStream.format("memory").queryName("oos_sales")
        .outputMode("update").start()
      try {
        val facts = Seq(
          Ticket("t1", "c1", "e1", 50.0), // WI buyer, MN venue -> counts
          Ticket("t2", "c2", "e1", 50.0), // MN buyer, MN venue -> no
          Ticket("t3", "c3", "e1", 50.0)) // c3 is WI NOW -> counts
        tickets.addData(facts: _*)
        qs.processAllAvailable()

        val streamed = spark.table("oos_sales")
          .groupBy($"venueid").agg(max($"outOfStateSales").as("outOfStateSales"))
          .as[(String, Long)].collect().toSet
        val batch = Topologies.outOfStateSales(facts.toDF(), addrs, events, venues)
          .as[(String, Long)].collect().toSet
        assert(streamed == batch)
        assert(streamed == Set(("v1", 2L)))
      } finally qs.stop()
    } finally { qd.stop(); qe.stop(); qv.stop() }
  }
}
