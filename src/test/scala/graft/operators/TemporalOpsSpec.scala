package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden-scenario tests for the temporal operator family (as-of join,
  * interval self-join, sessionization) — boundary semantics pinned
  * explicitly: inclusive/exclusive edges, ties, and no-match rows. */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches latest at-or-before right row; earlier-only; null when none") {
    // user 1: quotes at t=10, 20, 30; user 2: none
    val quotes = Seq((1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"))
      .toDF("uid", "qt", "qval")
      .select(col("uid"), col("qt"), col("qval"), col("qt").as("quote_ts"))
    val trades = Seq(
      (1L, 5L, "t-before-any"), // before every quote -> nulls
      (1L, 20L, "t-tie"),       // exactly at a quote -> inclusive match q20
      (1L, 25L, "t-mid"),       // between 20 and 30 -> q20
      (1L, 99L, "t-late"),      // after all -> q30
      (2L, 50L, "t-no-quotes")  // key with no right rows -> nulls
    ).toDF("uid", "tt", "tval")

    val out = Relational.asofJoin(trades, quotes, Seq("uid"), "tt", "qt",
      Seq("qval", "quote_ts"))
      .orderBy("uid", "tt")
      .collect()
      .map(r => (r.getAs[String]("tval"), Option(r.getAs[String]("qval"))))

    assert(out.toSeq == Seq(
      ("t-before-any", None),
      ("t-tie", Some("q20")),
      ("t-mid", Some("q20")),
      ("t-late", Some("q30")),
      ("t-no-quotes", None)))
  }

  test("asofJoin forward attaches earliest at-or-after right row; mirror semantics") {
    val quotes = Seq((1L, 10L, "q10"), (1L, 20L, "q20"), (1L, 30L, "q30"))
      .toDF("uid", "qt", "qval")
      .select(col("uid"), col("qt"), col("qval"), col("qt").as("quote_ts"))
    val trades = Seq(
      (1L, 5L, "t-before-any"), // before every quote -> q10 (next)
      (1L, 20L, "t-tie"),       // exactly at a quote -> inclusive match q20
      (1L, 25L, "t-mid"),       // between 20 and 30 -> q30 (next)
      (1L, 99L, "t-late"),      // after all -> nulls
      (2L, 50L, "t-no-quotes")  // key with no right rows -> nulls
    ).toDF("uid", "tt", "tval")

    val out = Relational.asofJoin(trades, quotes, Seq("uid"), "tt", "qt",
      Seq("qval", "quote_ts"), direction = "forward")
      .orderBy("uid", "tt")
      .collect()
      .map(r => (r.getAs[String]("tval"), Option(r.getAs[String]("qval"))))

    assert(out.toSeq == Seq(
      ("t-before-any", Some("q10")),
      ("t-tie", Some("q20")),
      ("t-mid", Some("q30")),
      ("t-late", None),
      ("t-no-quotes", None)))
  }

  test("asofJoin matches a per-key sort-based oracle on random data") {
    val rnd = new scala.util.Random(7)
    val right = (0 until 200).map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"r$k-$t") }
    val left = (0 until 300).map(i => (rnd.nextInt(6).toLong, rnd.nextInt(1100).toLong, i.toLong))
    val rightDf = right.toDF("k", "rt", "payload")
    val leftDf = left.toDF("k", "lt", "row_id")

    val got = Relational.asofJoin(leftDf, rightDf, Seq("k"), "lt", "rt", Seq("payload"))
      .select("row_id", "payload").as[(Long, Option[String])].collect().toMap

    val byKey = right.groupBy(_._1)
    left.foreach { case (k, lt, id) =>
      val expect = byKey.get(k).flatMap(rs =>
        rs.filter(_._2 <= lt).sortBy(_._2).lastOption.map(_._3))
      assert(got(id) == expect, s"row $id key $k t=$lt")
    }
  }

  test("intervalSelfJoin: strict lower edge, inclusive upper edge, cross-bucket pairs") {
    // window 100; times chosen so pairs straddle bucket boundaries:
    // (10,110) dt=100 -> IN (inclusive upper, crosses bucket 0->1)
    // (10,10)  dt=0   -> OUT (strict lower)
    // (110,205) dt=95 -> IN (within+across bucket 1->2)
    // (10,205) dt=195 -> OUT (beyond window)
    val e = Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 110L), (1L, 4L, 205L),
      (2L, 5L, 50L)).toDF("uid", "eid", "t")
    val pairs = Relational.intervalSelfJoin(e, Seq("uid"), "eid", "t", 100L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // id1=1,id2=3 (10->110); id1=2,id2=3 (10->110); id1=3,id2=4 (110->205)
    assert(pairs == Set((1L, 3L), (2L, 3L), (3L, 4L)))
  }

  test("intervalSelfJoin equals the naive quadratic join on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i => (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(2000).toLong))
    val df = rows.toDF("uid", "eid", "t")
    val w = 150L
    val got = Relational.intervalSelfJoin(df, Seq("uid"), "eid", "t", w)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val expect = (for {
      (k1, i1, t1) <- rows; (k2, i2, t2) <- rows
      if k1 == k2 && t2 > t1 && t2 <= t1 + w
    } yield (i1, i2)).toSet
    assert(got == expect)
  }

  test("sessionize: gap strictly-greater splits; boundary gap stays in session") {
    val gap = 100L
    val e = Seq(
      (1L, 1L, 0L), (1L, 2L, 100L),  // dt=100 == gap -> same session
      (1L, 3L, 201L),                 // dt=101 > gap -> new session
      (1L, 4L, 250L),
      (2L, 5L, 9999L)                 // separate key restarts numbering
    ).toDF("uid", "eid", "t")
    val out = Relational.sessionize(e, Seq("uid"), "t",
      Seq(col("t").asc, col("eid").asc), gap)
      .select("eid", "session_no").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1))
  }

  test("payloadMeta reports exact bytes, md5, head hex and frame count") {
    import graft.operators.{Multimodal, MediaRecord}
    val payload = ("abcdefgh" * 40).getBytes("UTF-8") // 320 bytes -> 2 frames
    val media = Seq(MediaRecord(7L, "image", payload, "test", payload.length.toLong))
      .toDS()
    val Row(id: Long, nb: Long, md: String, hx: String, nf: Long) =
      Multimodal.payloadMeta(media).collect().head
    assert(id == 7L && nb == 320L && nf == 2L)
    assert(md == java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString)
    assert(hx == "abcdefgh".getBytes("UTF-8").map("%02X".format(_)).mkString)
  }
}
