package graft.music

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-scenario specs mirroring the reference's TopologyTestDriver tests
  * (SURVEY.md §5, FIXTURES.md §3). Batch frames are the oracle — the
  * reference's test driver is synchronous-deterministic, so batch
  * equivalence is the right comparison (SURVEY §5 "Our strategy").
  */
class TopologiesSpec extends SparkSpec {
  import spark.implicits._

  // -- TargetCustomerFilter (TargetCustomerFilterTest.java:69-91) ----------

  private def cust(id: String, birthdt: String) =
    Customer(id, "PREMIUM", "M", "F", "M", "L", "FML", "", "", birthdt, "2022-01-02")

  test("targetCustomerFilter keeps exactly the 1990s decade (boundary years)") {
    val current = Seq(cust("1", "1989-12-31"), cust("2", "1990-01-01")).toDF()
    val legacy = Seq(cust("3", "1999-12-31"), cust("4", "2000-01-01")).toDF()
    val kept = Topologies.targetCustomerFilter(current, legacy)
      .select("id").as[String].collect().sorted
    assert(kept.toSeq == Seq("2", "3"))
  }

  test("targetCustomerFilter merges both sources (merge semantics, P5)") {
    val current = Seq(cust("a", "1995-06-15")).toDF()
    val legacy = Seq(cust("b", "1992-03-01")).toDF()
    val kept = Topologies.targetCustomerFilter(current, legacy)
      .select("id").as[String].collect().sorted
    assert(kept.toSeq == Seq("a", "b"))
  }

  // -- AddressSortAndStringify (AddressSortAndStringifyTest.java:79-106) ---

  test("addressSortAndStringify produces the reference's golden string and routes MN") {
    val addrs = Seq(
      Address("address-123", "cust-678", "cd", "HOME", "111 1st St", "Apt 2",
        "Madison", "WI", "55555", "1234", "USA", 0.0, 0.0),
      Address("address-456", "cust-679", "cd", "HOME", "222 2nd St", "Unit 1",
        "Minneapolis", "MN", "55401", "0000", "USA", 0.0, 0.0)).toDF()
    val out = Topologies.addressSortAndStringify(addrs)
      .select("state", "formatted", "route").as[(String, String, String)]
      .collect().sortBy(_._1)
    assert(out(1) == (("WI", "111 1st St, Apt 2, Madison, WI 55555-1234 USA", "default")))
    assert(out(0)._3 == "priority")
  }

  // -- PurchaseEventTicket (PurchaseEventTicketTest.java:77-139) -----------

  test("purchaseEventTicket: capacity 5 -> 5 CONFIRMED then 3 REJECTED, remaining runs negative") {
    val events = Seq(Event("exciting-event-123", "artist-1", "venue-1", 5, "today")).toDF()
    val tickets = (1 to 8).map(i =>
      Ticket(f"t$i%02d", s"cust-$i", "exciting-event-123", 25.0)).toDF()
    val out = Topologies.purchaseEventTicket(tickets, events, col("id"))
      .orderBy("ticketId")
      .select("confirmationStatus", "remaining").as[(String, Double)].collect()
    assert(out.take(5).map(_._1).forall(_ == "CONFIRMED"))
    assert(out.drop(5).map(_._1).forall(_ == "REJECTED"))
    assert(out.map(_._2).toSeq == Seq(4.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -3.0))
  }

  test("confirmationRoute: rejected / low-stock / confirmed 3-way branch") {
    val events = Seq(Event("e1", "a1", "v1", 10, "today")).toDF()
    val tickets = (1 to 12).map(i => Ticket(f"t$i%02d", s"c$i", "e1", 10.0)).toDF()
    val conf = Topologies.purchaseEventTicket(tickets, events, col("id"))
    val routed = Topologies.confirmationRoute(conf, events)
      .orderBy("ticketId").select("route").as[String].collect()
    // capacity 10: seats 1-7 plain confirmed (>20% left), seat 8 hits exactly
    // 20% remaining → low-stock (reference: remainingPercentage() <= 20.0),
    // 9-10 low-stock, 11-12 rejected
    assert(routed.take(7).forall(_ == "confirmed"))
    assert(routed.slice(7, 10).forall(_ == "confirmed-low-stock"))
    assert(routed.drop(10).forall(_ == "rejected"))
  }

  // -- TopCustomerArtists (TopCustomerArtistsTest.java:81-113) -------------

  test("topCustomerArtists: top-3 with stable ties (insertion order wins)") {
    // listens in arrival order: a2,a2,a5,a5,a3,a3,a3 → expect a3(3), a2(2), a5(2)
    val listens = Seq(
      Listen("l1", "c1", "a2", "t"), Listen("l2", "c1", "a2", "t"),
      Listen("l3", "c1", "a5", "t"), Listen("l4", "c1", "a5", "t"),
      Listen("l5", "c1", "a3", "t"), Listen("l6", "c1", "a3", "t"),
      Listen("l7", "c1", "a3", "t")).toDF()
    val top = Topologies.topCustomerArtists(listens).as[TopPerKey].collect()
    assert(top.length == 1)
    assert(top.head.top == Seq(CountEntry("a3", 3), CountEntry("a2", 2), CountEntry("a5", 2)))
  }

  // -- TopStreamingArtistByState (TopStreamingArtistByStateTest) -----------

  test("topStreamingArtistByState picks the max-count artist per state") {
    val artists = Seq(Artist("a1", "Artist One", "Rock"), Artist("a2", "Artist Two", "Pop")).toDF()
    val addrs = Seq(
      Address("ad1", "c1", "", "", "", "", "", "WI", "", "", "", 0, 0),
      Address("ad2", "c2", "", "", "", "", "", "WI", "", "", "", 0, 0),
      Address("ad3", "c3", "", "", "", "", "", "MN", "", "", "", 0, 0)).toDF()
    val listens = Seq(
      Listen("l1", "c1", "a1", "t"), Listen("l2", "c2", "a1", "t"),
      Listen("l3", "c1", "a2", "t"), Listen("l4", "c3", "a2", "t")).toDF()
    val out = Topologies.topStreamingArtistByState(listens, artists, addrs)
      .select("state", "artistid", "cnt").as[(String, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(("MN", "a2", 1L), ("WI", "a1", 2L)))
  }

  // -- OutOfStateSales (OutOfStateSalesTest) -------------------------------

  test("outOfStateSales counts only cross-state tickets per venue") {
    val addrs = Seq(
      Address("ad-c1", "c1", "", "", "", "", "", "WI", "", "", "", 0, 0),
      Address("ad-c2", "c2", "", "", "", "", "", "MN", "", "", "", 0, 0),
      Address("ad-v1", "", "", "", "", "", "", "MN", "", "", "", 0, 0)).toDF()
    val venues = Seq(Venue("v1", "ad-v1", "The Venue", 100)).toDF()
    val events = Seq(Event("e1", "a1", "v1", 50, "today")).toDF()
    val tickets = Seq(
      Ticket("t1", "c1", "e1", 20.0), // WI customer at MN venue → out of state
      Ticket("t2", "c2", "e1", 20.0)) // MN customer at MN venue → in state
      .toDF()
    val out = Topologies.outOfStateSales(tickets, addrs, events, venues)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("v1", 1L)))
  }

  // -- TopSellingGenreByVenue (TopSellingGenreByVenueTest) -----------------

  test("topSellingGenreByVenue ranks genres per venue with deterministic ties") {
    val artists = Seq(Artist("a1", "A1", "Rock"), Artist("a2", "A2", "Pop"),
      Artist("a3", "A3", "Jazz")).toDF()
    val events = Seq(Event("e1", "a1", "v1", 50, "d"), Event("e2", "a2", "v1", 50, "d"),
      Event("e3", "a3", "v1", 50, "d"), Event("e4", "a1", "v2", 50, "d")).toDF()
    val tickets = Seq(
      Ticket("t1", "c1", "e1", 1), Ticket("t2", "c2", "e1", 1), Ticket("t3", "c3", "e1", 1),
      Ticket("t4", "c1", "e2", 1), Ticket("t5", "c2", "e2", 1),
      Ticket("t6", "c1", "e3", 1),
      Ticket("t7", "c9", "e4", 1)).toDF()
    val out = Topologies.topSellingGenreByVenue(tickets, events, artists)
      .select("venueid", "genre", "cnt", "rank").as[(String, String, Long, Int)]
      .collect().sortBy(t => (t._1, t._4)).toSeq
    assert(out == Seq(
      ("v1", "Rock", 3L, 1), ("v1", "Pop", 2L, 2), ("v1", "Jazz", 1L, 3),
      ("v2", "Rock", 1L, 1)))
  }

  // -- Exercises ------------------------------------------------------------

  test("customerStreamCount counts listens per customer") {
    val listens = Seq(Listen("l1", "c1", "a1", "t"), Listen("l2", "c1", "a2", "t"),
      Listen("l3", "c2", "a1", "t")).toDF()
    val out = Topologies.customerStreamCount(listens)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("c1", 2L), ("c2", 1L)))
  }

  test("artistTicketCount counts tickets per artist through events") {
    val events = Seq(Event("e1", "a1", "v1", 5, "d"), Event("e2", "a2", "v1", 5, "d")).toDF()
    val tickets = Seq(Ticket("t1", "c1", "e1", 1), Ticket("t2", "c2", "e1", 1),
      Ticket("t3", "c3", "e2", 1)).toDF()
    val out = Topologies.artistTicketCount(tickets, events)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a1", 2L), ("a2", 1L)))
  }
}
