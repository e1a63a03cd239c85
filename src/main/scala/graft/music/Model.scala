package graft.music

/** The nine entity record types of the reference's data model (SURVEY.md
  * §1.2; field lists pinned by the reference's own tests — see FIXTURES.md).
  *
  * All keys are strings; `birthdt`/`joindt` are "YYYY-MM-DD" strings, as in
  * the reference (exercises/stateless/TargetCustomerFilter.java:14-15).
  */
final case class Customer(
    id: String, custtype: String, gender: String, fname: String, mname: String,
    lname: String, fullname: String, suffix: String, title: String,
    birthdt: String, joindt: String)

final case class Address(
    id: String, customerid: String, formatcode: String, addrtype: String,
    line1: String, line2: String, citynm: String, state: String,
    zip5: String, zip4: String, countrycd: String,
    latitude: Double, longitude: Double)

final case class Artist(id: String, name: String, genre: String)

final case class Event(
    id: String, artistid: String, venueid: String, capacity: Int,
    eventdate: String)

/** A listen ("stream" in the reference — renamed to avoid the Spark term). */
final case class Listen(id: String, customerid: String, artistid: String, streamtime: String)

final case class Ticket(id: String, customerid: String, eventid: String, price: Double)

final case class Venue(id: String, addressid: String, name: String, maxcapacity: Int)

final case class Email(id: String, customerid: String, email: String)

final case class Phone(id: String, customerid: String, phone: String)

// ------------------------------------------------------ derived row types
// (SURVEY.md §1.3 — the reference's join-product POJOs, as case classes)

/** One (artist, count) entry of an ordered top-K result. The reference emits
  * an insertion-ordered LinkedHashMap; Spark maps are unordered, so ordered
  * output is an array of these (SURVEY §1.4). */
final case class CountEntry(id: String, count: Long)

final case class TopPerKey(key: String, top: Seq[CountEntry])

/** Ticket verdict, mirroring EventTicketConfirmation
  * (samples/PurchaseEventTicket.java:168-178). */
final case class TicketConfirmation(
    ticketId: String, customerid: String, eventid: String,
    confirmationStatus: String, remaining: Double)
