package graft.streaming

import graft.music.TicketConfirmation
import org.apache.spark.sql.ForeachWriter
import org.apache.spark.util.LongAccumulator

/** K3 — the reference's SMTP side-effect sink
  * (simple/TicketConfirmationConsumer.java:55-131) re-expressed as a
  * Structured Streaming [[ForeachWriter]], the Spark-native shape for a
  * per-record external side effect:
  *
  *  - the reference runs a hand-rolled consumer poll loop and calls
  *    `sendMail` per record; here the streaming engine owns the loop and
  *    the writer owns ONLY the side effect — open/process/close per
  *    partition per epoch, which is what scales the sink to as many
  *    executors as the topic has partitions;
  *  - the reference simulates flakiness (random 1-in-10 hard failure,
  *    1-in-10 one-second stall) and DROPS a failed send after printing
  *    the stack trace; this writer adds what a deployment needs on top:
  *    bounded in-process retries and failure accounting through Spark
  *    accumulators (executor → driver merge, visible in the UI and to
  *    tests) instead of a silent drop — the failed count is the
  *    dead-letter feed;
  *  - delivery is AT-LEAST-ONCE (a replayed epoch re-sends — same as the
  *    reference, whose commitSync after the batch re-delivers on crash).
  *    Exactly-once email needs an idempotent receiver keyed on
  *    (confirmation id); the formatted message carries that key.
  *
  * The mail-facing strings mirror the reference verbatim (sender
  * `tickets@utopia.com`, recipient `<customerid>@email.com`, subject
  * `Ticket Confirmation (<id>) - Event <eventid>`, body
  * `Your ticket has been <status>!`); our deterministic confirmation id
  * is the ticketId where the reference minted a UUID.
  */
object Mail {

  final case class Message(from: String, to: String, subject: String, body: String)

  /** Transport boundary — the seam the reference hides inside `sendMail`.
    * Implementations must be serializable: the writer (and its transport)
    * ship to executors. */
  trait Transport extends Serializable {
    /** Throws on failure; the writer owns retries. */
    def send(m: Message): Unit
  }

  val Sender = "tickets@utopia.com"

  /** Pure formatting half of the reference's `sendMail` (strings at
    * TicketConfirmationConsumer.java:88-122). */
  def confirmationEmail(c: TicketConfirmation): Message = Message(
    from = Sender,
    to = s"${c.customerid}@email.com",
    subject = s"Ticket Confirmation (${c.ticketId}) - Event ${c.eventid}",
    body = s"Your ticket has been ${c.confirmationStatus}!")

  /** The reference's failure simulation made DETERMINISTIC (its
    * `random.nextInt(10)` draw becomes a hash of the recipient+subject, so
    * specs and replays see the same ~10%/~10% behavior): bucket
    * `failBucket` throws on the FIRST attempt of a message (transient —
    * the retry path), `hardFailBucket` throws on every attempt (the
    * dead-letter path), `sleepBucket` stalls `sleepMs` (the reference's
    * "I'm feeling sleepy" branch). Buckets are 0..9; pass -1 to disable
    * a branch. */
  final class FlakyTransport(
      underlying: Transport,
      failBucket: Int = 5,
      hardFailBucket: Int = -1,
      sleepBucket: Int = 6,
      sleepMs: Long = 1000L) extends Transport {
    // per-task-instance first-attempt memory for the transient branch; a
    // simulation double, so the unbounded set is fine — a real flaky
    // transport owns no such state (the writer's retry loop is the seam)
    private val attempted = scala.collection.mutable.HashSet[String]()
    override def send(m: Message): Unit = {
      val key = m.to + "|" + m.subject
      val bucket = math.floorMod(key.hashCode, 10)
      if (bucket == hardFailBucket)
        throw new java.io.IOException(s"simulated hard SMTP failure for $key")
      if (bucket == failBucket && attempted.add(key))
        throw new java.io.IOException(s"simulated transient SMTP failure for $key")
      if (bucket == sleepBucket && sleepMs > 0) Thread.sleep(sleepMs)
      underlying.send(m)
    }
  }

  /** Per-record side-effect writer with bounded retries and accumulator
    * accounting. `sent`/`retried`/`failed` are driver-registered
    * [[LongAccumulator]]s (pass `spark.sparkContext.longAccumulator(...)`);
    * a record that still fails after `maxAttempts` counts as failed and
    * does NOT abort the epoch — the reference's catch-and-continue,
    * with the drop made visible. */
  final class ConfirmationMailWriter(
      transport: Transport,
      sent: LongAccumulator,
      retried: LongAccumulator,
      failed: LongAccumulator,
      maxAttempts: Int = 3) extends ForeachWriter[TicketConfirmation] {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

    override def open(partitionId: Long, epochId: Long): Boolean = true

    override def process(c: TicketConfirmation): Unit = {
      val m = confirmationEmail(c)
      var attempt = 0
      var done = false
      // NonFatal only: an InterruptedException from task cancellation (or
      // any fatal error) must abort the task, not count as a mail failure
      while (!done && attempt < maxAttempts) {
        attempt += 1
        try { transport.send(m); done = true; sent.add(1) }
        catch {
          case scala.util.control.NonFatal(_) if attempt < maxAttempts => retried.add(1)
          case scala.util.control.NonFatal(_) => failed.add(1)
        }
      }
    }

    override def close(errorOrNull: Throwable): Unit = ()
  }
}
