package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.SparkSpec
import graft.music.{CountEntry, TicketConfirmation, TopPerKey}
import graft.operators.{Layout, Similarity, Sketch}
import graft.queries.RelationalQueries

/** Streaming TOTALITY twins: every stateful / windowed / serve twin must
  * survive an EMPTY FIRST MICRO-BATCH — the streaming analog of the
  * zero-row corner `TotalitySpec` pins for all 124 batch queries. An
  * empty first batch is exactly what a production job sees when it starts
  * before its topic has traffic: state must initialize to nothing (no
  * crash, no spurious emission), and once data arrives the results must
  * converge to the all-data-at-once run.
  *
  * Each test (a) feeds an empty first block and PROVES the zero-row
  * micro-batch actually executed (`recentProgress` shows numInputRows=0 —
  * MemoryStream advances its offset even for an empty block, so the
  * engine schedules a real batch; without this assert the leg would be
  * vacuous), (b) asserts nothing was emitted by it, then (c) feeds the
  * data and compares against the batch oracle.
  *
  * Deliberate exclusions, with reasons:
  *   - [[StatefulOps.latestByKeyTtl]]: ProcessingTimeTimeout schedules
  *     clock-check batches unconditionally, so `processAllAvailable`
  *     never returns (see its scaladoc) — and by construction its
  *     existing spec already executes many ZERO-ROW batches between data
  *     batches (every clock tick), so empty-batch totality is exercised
  *     there continuously; its state-init path is [[StatefulOps
  *     .latestByKey]]'s, covered here.
  *   - k-means assign serve: the exact same stateless foreachBatch shape
  *     as the ANN serve twin below (model broadcast, per-batch scan
  *     scoring, no state store) — the ANN leg subsumes it and more
  *     (coarse quantizer + PQ rerank on top of the same argmin fold).
  *   - graph-route / span-dedup / decontamination / BPE / corpus-pipeline
  *     twins: all foreachBatch-over-batch-operator shapes with no
  *     streaming state store; their empty-batch behavior is the batch
  *     operators' zero-row totality, already pinned in `TotalitySpec`.
  */
class StreamingTotalitySpec extends SparkSpec {
  import spark.implicits._

  /** Feed an empty first block, run it, and prove a zero-row micro-batch
    * genuinely executed (not silently skipped). */
  private def emptyFirstBatch[T](in: MemoryStream[T], q: StreamingQuery): Unit = {
    in.addData(Seq.empty[T])
    q.processAllAvailable()
    assert(q.recentProgress.exists(_.numInputRows == 0L),
      "the empty first micro-batch never executed — the totality leg is vacuous")
  }

  // ------------------------------------------------- mapGroupsWithState core

  test("latestByKey (CDC compaction state) initializes on an empty first batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.latestByKey(in.toDS())
      .writeStream.format("memory").queryName("tot_latest")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_latest").isEmpty, "empty batch must emit nothing")
      in.addData(Keyed("k1", 1L, "v1"), Keyed("k2", 2L, "w1"))
      q.processAllAvailable()
      in.addData(Keyed("k1", 5L, "v2"))
      q.processAllAvailable()
      val byKey = spark.table("tot_latest").as[Keyed[String]].collect()
        .groupBy(_.key).map { case (k, vs) => k -> vs.maxBy(_.seq).value }
      assert(byKey == Map("k1" -> "v2", "k2" -> "w1"))
    } finally q.stop()
  }

  test("runningCount starts from zero state after an empty first batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.runningCount(in.toDS())
      .writeStream.format("memory").queryName("tot_count")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_count").isEmpty, "empty batch must emit nothing")
      in.addData(Keyed("c1", 1L, "x"))
      q.processAllAvailable()
      in.addData(Keyed("c1", 2L, "x"), Keyed("c2", 3L, "x"))
      q.processAllAvailable()
      val emitted = spark.table("tot_count").as[(String, Long)].collect().toSeq
      assert(emitted.filter(_._1 == "c1").map(_._2).sorted == Seq(1L, 2L))
      assert(emitted.filter(_._1 == "c2").map(_._2) == Seq(1L))
    } finally q.stop()
  }

  test("capacityLedger golden countdown is unchanged by an empty first batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TicketReq]
    val q = StatefulOps.capacityLedger(in.toDS())
      .writeStream.format("memory").queryName("tot_ledger")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_ledger").isEmpty, "empty batch must emit nothing")
      in.addData((1 to 3).map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong)))
      q.processAllAvailable()
      in.addData((4 to 8).map(i => TicketReq(f"t$i%02d", s"c$i", "e1", 5, i.toLong)))
      q.processAllAvailable()
      val out = spark.table("tot_ledger").as[TicketConfirmation]
        .collect().sortBy(_.ticketId)
      assert(out.take(5).forall(_.confirmationStatus == "CONFIRMED"))
      assert(out.drop(5).forall(_.confirmationStatus == "REJECTED"))
      assert(out.map(_.remaining).toSeq == Seq(4.0, 3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -3.0))
    } finally q.stop()
  }

  test("topKCounter stable-tie order survives an empty first batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.topKCounter(in.toDS(), 3)
      .writeStream.format("memory").queryName("tot_topk")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_topk").isEmpty, "empty batch must emit nothing")
      in.addData(Keyed("c1", 1L, "a2"), Keyed("c1", 2L, "a2"),
        Keyed("c1", 3L, "a5"), Keyed("c1", 4L, "a5"))
      q.processAllAvailable()
      in.addData(Keyed("c1", 5L, "a3"), Keyed("c1", 6L, "a3"), Keyed("c1", 7L, "a3"))
      q.processAllAvailable()
      val emissions = spark.table("tot_topk").as[TopPerKey].collect()
      assert(emissions.length == 2)
      val afterB2 = emissions.maxBy(_.top.length)
      assert(afterB2.top ==
        Seq(CountEntry("a3", 3), CountEntry("a2", 2), CountEntry("a5", 2)))
    } finally q.stop()
  }

  // -------------------------------------------- analytics twins (x8/x9/x10/x13)

  private val funnelEvents = Seq(
    FunnelEvent(1L, "click", 5L), FunnelEvent(1L, "view", 10L),
    FunnelEvent(2L, "click", 7L),
    FunnelEvent(4L, "view", 50L), FunnelEvent(4L, "click", 50L),
    FunnelEvent(1L, "click", 30L), FunnelEvent(3L, "view", 90L))

  test("funnel converges to the all-data-at-once run after an empty first batch") {
    implicit val ctx = spark.sqlContext
    val oracle = StatefulOps.funnel(funnelEvents.toDS())
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val in = MemoryStream[FunnelEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.funnel(in.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3)); ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(got.isEmpty, "empty batch must emit nothing")
      in.addData(funnelEvents.take(5): _*)
      q.processAllAvailable()
      in.addData(funnelEvents.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == oracle, s"streamed $got vs batch $oracle")
  }

  test("funnelAligned: empty first batch leaves the watermark unset, then converges") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.funnelAligned(in.toDS(), delay = "20 seconds")
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3)); ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(got.isEmpty, "empty batch must emit nothing")
      // same schedule as StreamingFunnelSpec's caveat case — the empty
      // opening batch must not advance the watermark or pre-create state
      in.addData(FunnelEvent(1L, "view", 10000000L), FunnelEvent(4L, "click", 50000000L))
      q.processAllAvailable()
      in.addData(FunnelEvent(1L, "click", 50000000L), FunnelEvent(4L, "view", 50000000L))
      q.processAllAvailable()
      in.addData(FunnelEvent(9L, "view", 100000000L))
      q.processAllAvailable()
      in.addData(FunnelEvent(9L, "click", 110000000L))
      q.processAllAvailable()
    } finally q.stop()
    assert(got(1L) == ((10000000L, 50000000L)))
    assert(got(4L) == ((50000000L, 50000000L)),
      "equal-ts pair split across batches must still convert after an empty opener")
    assert(got(9L) == ((-1L, -1L)))
  }

  test("retention converges to the all-data-at-once run after an empty first batch") {
    implicit val ctx = spark.sqlContext
    val usPerDay = 86400000000L
    val events = Seq(
      RetentionEvent(1L, 0L), RetentionEvent(1L, 7L * usPerDay),
      RetentionEvent(1L, 21L * usPerDay), RetentionEvent(2L, 5L * usPerDay))
    val oracle = StatefulOps.retention(events.toDS())
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val in = MemoryStream[RetentionEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.retention(in.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3)); ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(got.isEmpty, "empty batch must emit nothing")
      in.addData(events.take(2): _*)
      q.processAllAvailable()
      in.addData(events.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == oracle, s"streamed $got vs batch $oracle")
  }

  test("regressionStats converges to the all-data-at-once run after an empty first batch") {
    implicit val ctx = spark.sqlContext
    val obs = Seq(
      RegObs("g1", 1L, 10L), RegObs("g1", 2L, 20L), RegObs("g1", 3L, 31L),
      RegObs("g2", 1L, 5L), RegObs("g2", 4L, 9L))
    val oracle = StatefulOps.regressionStats(obs.toDS())
      .collect().toMap
    val in = MemoryStream[RegObs]
    val got = scala.collection.mutable.Map[String, RegState]()
    val q = StatefulOps.regressionStats(in.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, RegState)], _: Long) =>
        b.collect().foreach(r => got(r._1) = r._2); ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(got.isEmpty, "empty batch must emit nothing")
      in.addData(obs.take(3): _*)
      q.processAllAvailable()
      in.addData(obs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == oracle, s"streamed $got vs batch $oracle")
  }

  test("markovTransitions emits the all-data-at-once transition multiset after an empty first batch") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      MarkovEvent(1L, 1L, "a", 100L), MarkovEvent(1L, 2L, "b", 200L),
      MarkovEvent(1L, 3L, "a", 300L), MarkovEvent(1L, 4L, "c", 400L),
      MarkovEvent(2L, 5L, "b", 150L), MarkovEvent(2L, 6L, "b", 250L))
    val oracle = StatefulOps.markovTransitions(events.toDS())
      .collect().sorted.toSeq
    val in = MemoryStream[MarkovEvent]
    val q = StatefulOps.markovTransitions(in.toDS())
      .writeStream.format("memory").queryName("tot_markov")
      .outputMode("append").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_markov").isEmpty, "empty batch must emit nothing")
      in.addData(events.take(3): _*)
      q.processAllAvailable()
      in.addData(events.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("tot_markov").as[(String, String)]
        .collect().sorted.toSeq
      assert(got == oracle, s"streamed $got vs batch $oracle")
    } finally q.stop()
  }

  // ------------------------------------------------- windowed / rank-at-read

  test("trending (windowed counts + rank-at-read) after an empty first batch") {
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      TrendEvt(t("2024-01-01 10:05:00"), "view"),
      TrendEvt(t("2024-01-01 10:10:00"), "view"),
      TrendEvt(t("2024-01-01 10:15:00"), "click"),
      TrendEvt(t("2024-01-01 10:20:00"), "cart"),
      TrendEvt(t("2024-01-01 11:05:00"), "click"),
      TrendEvt(t("2024-01-01 11:20:00"), "view"))
    val oracle = RelationalQueries.trendingTopkFrom(
      events.map(e => (e.ts.getTime / 3600000L, e.event_type))
        .toDF("hour_bucket", "event_type")
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt")))
      .as[(Long, String, Long, Int)].collect().toSeq
    val in = MemoryStream[TrendEvt]
    val q = WindowedOps.tumblingRollup(
        in.toDF().withColumn("value", lit(1.0)), "ts", "event_type", "value",
        windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("tot_trend")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_trend").isEmpty, "empty batch must emit nothing")
      in.addData(events.take(4): _*)
      q.processAllAvailable()
      in.addData(events.drop(4): _*)
      q.processAllAvailable()
      val latest = spark.table("tot_trend")
        .groupBy(col("window_start"), col("event_type"))
        .agg(max(col("n")).as("cnt"))
        .select((unix_timestamp(col("window_start")) / 3600L).cast("long")
          .as("hour_bucket"), col("event_type"), col("cnt"))
      val streamed = RelationalQueries.trendingTopkFrom(latest)
        .as[(Long, String, Long, Int)].collect().toSeq
      assert(streamed == oracle, s"streamed $streamed vs batch $oracle")
    } finally q.stop()
  }

  test("layout histogram twin reproduces the batch layout after an empty first batch") {
    implicit val ctx = spark.sqlContext
    import graft.functions.MortonInterleave.morton_interleave
    val pts = Seq(
      LayoutPt(1, 1), LayoutPt(1, 1), LayoutPt(2, 5),
      LayoutPt(7, 0), LayoutPt(0, 7), LayoutPt(3, 3), LayoutPt(63, 63))
    def buckets(hist: DataFrame): Seq[(Long, Long, Int, Long)] =
      Layout.histNtileBuckets(
          hist.withColumn("z", morton_interleave(col("px"), col("sx"))),
          4, Seq(col("z")), col("cnt"))
        .select(col("px"), col("sx"), col("bucket"), col("cnt_in_bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sorted.toSeq
    val in = MemoryStream[LayoutPt]
    val q = in.toDS().toDF()
      .groupBy(col("px"), col("sx"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("tot_hist")
      .outputMode("update").start()
    try {
      emptyFirstBatch(in, q)
      assert(spark.table("tot_hist").isEmpty, "empty batch must emit nothing")
      in.addData(pts: _*)
      q.processAllAvailable()
      val live = spark.table("tot_hist")
        .groupBy(col("px"), col("sx"))
        .agg(max(col("cnt")).as("cnt"))
      val rebuilt = pts.toDF()
        .groupBy(col("px"), col("sx"))
        .agg(count(lit(1)).as("cnt"))
      assert(buckets(live) == buckets(rebuilt),
        "streamed histogram diverged from batch rebuild after an empty opener")
    } finally q.stop()
  }

  // ------------------------------------------------------- foreachBatch twins

  test("CMS sketch merge absorbs an empty first batch (empty grid is the identity)") {
    implicit val ctx = spark.sqlContext
    val width = 8
    val in = MemoryStream[String]
    var acc: DataFrame = null
    val q = in.toDF().toDF("k")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyed = batch.groupBy(col("k")).agg(count(lit(1)).as("n"))
        val g = Sketch.cmsGrid(keyed, "k", "n", width)
        acc = (if (acc == null) g
               else acc.unionAll(g).groupBy(col("j"), col("bucket"))
                 .agg(sum(col("cell")).as("cell")))
          .localCheckpoint(true)
        ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(acc != null && acc.isEmpty,
        "an empty batch must produce the empty (identity) grid, not crash")
      in.addData("u1", "u2", "u1")
      q.processAllAvailable()
      in.addData("u3", "u1", "u2", "u4")
      q.processAllAvailable()
    } finally q.stop()
    val all = Seq("u1", "u2", "u1", "u3", "u1", "u2", "u4").toDF("k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val whole = Sketch.cmsGrid(all, "k", "n", width)
    val diff = acc.unionAll(whole)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"), countDistinct(col("cell")).as("d"))
      .filter(col("c") =!= 2 || col("d") =!= 1)
    assert(diff.isEmpty, "grid merged over an empty opener differs from the batch grid")
  }

  test("ANN serve scores an empty query batch to nothing, then matches the batch search") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    val docs = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0f, 0f, 0f) else Array(0f, 0f, 1.0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.05f))
    }
    val corpus = docs.toDF("vec_id", "embedding")
    val (m, k, coarseK, dims) = (2, 2, 2, 4)
    val (a, c, codes, books) = Similarity.coarsePqModels(corpus, coarseK, 2, m, k, 2, dims)
    val queries = docs.take(4)
    val expect = Similarity.ivfPqSearchFrom(
      a, c, codes, books, queries.toDF("vec_id", "embedding"), m, dims / m, 3, 2)
      .as[(Long, Long, Int, Double)].collect().toSet
    val in = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Set[(Long, Long, Int, Double)]()
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= Similarity.ivfPqSearchFrom(
          a, c, codes, books, b, m, dims / m, 3, 2)
          .as[(Long, Long, Int, Double)].collect()
        ()
      }.start()
    try {
      emptyFirstBatch(in, q)
      assert(got.isEmpty, "an empty query batch must return no neighbors")
      in.addData(queries: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(expect.nonEmpty, "degenerate fixture: the batch search returned nothing")
    assert(got.toSet == expect,
      "serve over an empty opener diverges from the batch search")
  }
}
