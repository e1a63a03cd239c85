package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextOps.redactPII]] / [[TextOps.piiCounts]]: placeholder
  * substitution, global (not first-match) replacement, the email→IP→phone
  * replacement order, and count-before-redact semantics. */
class PiiRedactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (String, Long, Long, Long) = {
    val df = Seq(text).toDF("t")
    val counts = TextOps.piiCounts($"t").map { case (n, c) => c.as(n) }
    val row = df.select(TextOps.redactPII($"t").as("r") +: counts: _*).head()
    (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  test("each PII type is replaced with its typed placeholder") {
    val (r, e, ip, ph) =
      run("mail bob.smith+x@corp.example.org ip 192.168.0.12 tel 555-0188 end")
    assert(r == "mail <EMAIL> ip <IP> tel <PHONE> end")
    assert((e, ip, ph) == (1L, 1L, 1L))
  }

  test("replacement is global, not first-match") {
    val (r, e, _, _) = run("a@b.co x a@b.co")
    assert(r == "<EMAIL> x <EMAIL>")
    assert(e == 2L)
  }

  test("email leaves the string before numeric patterns scan it") {
    // the digits+dots inside a redacted email host can never be re-matched
    // as an IP, and its digit runs never as a phone
    val (r, _, ip, ph) = run("u1@10.2.3.4mail.com only")
    assert(!r.contains("<IP>") && !r.contains("<PHONE>"), r)
    assert(r == "<EMAIL> only")
    // counts are taken on the RAW text, so the embedded IP shape counts
    assert(ip == 1L && ph == 0L)
  }

  test("clean text passes through byte-identical with zero counts") {
    val (r, e, ip, ph) = run("the quick brown fox 12.3 end")
    assert(r == "the quick brown fox 12.3 end")
    assert((e, ip, ph) == (0L, 0L, 0L))
  }
}
