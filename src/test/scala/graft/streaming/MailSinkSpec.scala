package graft.streaming

import graft.SparkSpec
import graft.music.TicketConfirmation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** K3 side-effect sink (SURVEY §2.2, TicketConfirmationConsumer.java):
  * golden email strings vs the reference, at-least-once delivery with
  * deterministic flaky-transport retries, and dead-letter accounting. */
object MailSinkSpec {
  // driver-readable mailbox: local-mode executors share the JVM, so a
  // static concurrent buffer plays the role of the SMTP server
  val inbox = java.util.concurrent.ConcurrentHashMap.newKeySet[Mail.Message]()
  final class RecordingTransport extends Mail.Transport {
    override def send(m: Mail.Message): Unit = { inbox.add(m); () }
  }
}

class MailSinkSpec extends SparkSpec {
  import MailSinkSpec._
  import spark.implicits._

  private def confirmations(n: Int): Seq[TicketConfirmation] =
    (1 to n).map(i => TicketConfirmation(
      s"ticket-$i", s"cust-$i", s"event-${i % 7}",
      if (i % 5 == 0) "REJECTED" else "CONFIRMED", (100 - i).toDouble))

  test("email formatting matches the reference's strings verbatim") {
    val m = Mail.confirmationEmail(
      TicketConfirmation("tkt-42", "cust-9", "evt-3", "CONFIRMED", 57.0))
    assert(m.from == "tickets@utopia.com")
    assert(m.to == "cust-9@email.com")
    assert(m.subject == "Ticket Confirmation (tkt-42) - Event evt-3")
    assert(m.body == "Your ticket has been CONFIRMED!")
  }

  test("foreach sink delivers every record despite transient failures, with retry accounting") {
    inbox.clear()
    val sent = spark.sparkContext.longAccumulator("mail_sent")
    val retried = spark.sparkContext.longAccumulator("mail_retried")
    val failed = spark.sparkContext.longAccumulator("mail_failed")
    val writer = new Mail.ConfirmationMailWriter(
      new Mail.FlakyTransport(new RecordingTransport, failBucket = 5,
        hardFailBucket = -1, sleepBucket = -1, sleepMs = 0L),
      sent, retried, failed, maxAttempts = 3)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TicketConfirmation]
    val rows = confirmations(60)
    in.addData(rows)
    val q = in.toDS().writeStream.foreach(writer).start()
    try q.processAllAvailable() finally q.stop()

    val expected = rows.map(Mail.confirmationEmail).toSet
    val transient = expected.count(m =>
      math.floorMod((m.to + "|" + m.subject).hashCode, 10) == 5)
    assert(transient > 0, "fixture never hits the transient bucket — widen it")
    import scala.jdk.CollectionConverters._
    assert(inbox.asScala.toSet == expected, "delivered set diverges from the input")
    assert(sent.value == rows.size)
    assert(retried.value == transient, "each transient failure retries exactly once")
    assert(failed.value == 0)
  }

  test("a hard-failing recipient is counted as dead-lettered, not crashed or silently dropped") {
    inbox.clear()
    val sent = spark.sparkContext.longAccumulator("mail_sent2")
    val retried = spark.sparkContext.longAccumulator("mail_retried2")
    val failed = spark.sparkContext.longAccumulator("mail_failed2")
    val writer = new Mail.ConfirmationMailWriter(
      new Mail.FlakyTransport(new RecordingTransport, failBucket = -1,
        hardFailBucket = 5, sleepBucket = -1, sleepMs = 0L),
      sent, retried, failed, maxAttempts = 2)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TicketConfirmation]
    val rows = confirmations(60)
    in.addData(rows)
    val q = in.toDS().writeStream.foreach(writer).start()
    try q.processAllAvailable() finally q.stop()

    val expected = rows.map(Mail.confirmationEmail).toSet
    val hard = expected.count(m =>
      math.floorMod((m.to + "|" + m.subject).hashCode, 10) == 5)
    assert(hard > 0, "fixture never hits the hard-fail bucket — widen it")
    import scala.jdk.CollectionConverters._
    assert(inbox.asScala.toSet == expected.filterNot(m =>
      math.floorMod((m.to + "|" + m.subject).hashCode, 10) == 5))
    assert(sent.value == rows.size - hard)
    assert(failed.value == hard.toLong)
    assert(retried.value == hard.toLong, "one retry per hard failure before dead-lettering (maxAttempts=2)")
  }
}
