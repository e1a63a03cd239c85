package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of x9's cohort retention: per-user running state (cohort
  * day + active-week bitmask, two longs) must land on exactly the batch
  * aggregation's numbers — cohort sizes, per-week distinct actives, and
  * retention ratios — on every fed prefix, not just at the end. */
class StreamingRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val usPerDay = 86400000000L

  /** Aggregate the latest per-user states the way a downstream consumer
    * would: users per cohort, bit-w count per (cohort, week), ratio. */
  private def fromStates(states: Map[Long, (Long, Long)]): Set[(Long, Long, Long, Long, Double)] = {
    val byCohort = states.values.groupBy(_._1)
    (for {
      (cohort, members) <- byCohort
      size = members.size.toLong
      wk <- 0L to 3L
      active = members.count(m => (m._2 & (1L << wk)) != 0).toLong
      if active > 0
    } yield (cohort, wk, active, size,
      math.floor(active.toDouble / size * 10000 + 0.5) / 10000)).toSet
  }

  private def fromBatch(fed: Seq[RetentionEvent]): Set[(Long, Long, Long, Long, Double)] =
    graft.queries.RelationalQueries.retentionFrom(
      fed.map(e => (e.userId, e.tsUs)).toDF("user_id", "ts_us"))
      .select(col("cohort_day"), col("wk"), col("active_users"),
        col("cohort_size"), col("retention"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet

  test("incremental cohort/active counts equal the batch aggregation on every fed prefix") {
    implicit val ctx = spark.sqlContext
    def d(day: Long, offUs: Long = 0L) = day * usPerDay + offUs
    // user 1: cohort day 0, active weeks 0, 1, 3
    // user 2: cohort day 0, active week 0 only
    // user 3: cohort day 9, active weeks 0 and 2; a week-5 event ignored
    val batch1 = Seq(
      RetentionEvent(1L, d(0)), RetentionEvent(1L, d(2, 500L)),
      RetentionEvent(2L, d(0, 42L)))
    val batch2 = Seq(
      RetentionEvent(1L, d(8)), // week 1
      RetentionEvent(3L, d(9)))
    val batch3 = Seq(
      RetentionEvent(1L, d(21)), // week 3
      RetentionEvent(3L, d(23)), // week 2 for cohort 9
      RetentionEvent(3L, d(9 + 5 * 7))) // week 5 -> outside the horizon
    val feed = Seq(batch1, batch2, batch3)

    val in = MemoryStream[RetentionEvent]
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = StatefulOps.retention(in.toDS())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach(r => got(r._1) = (r._2, r._3))
        ()
      }
      .start()
    try {
      var fed = Seq.empty[RetentionEvent]
      for (batch <- feed) {
        in.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        assert(fromStates(got.toMap) == fromBatch(fed),
          s"divergence after feeding ${fed.size} events")
      }
    } finally q.stop()

    // final sanity: the planted shape, not just self-consistency
    assert(got(1L) == ((0L, (1L << 0) | (1L << 1) | (1L << 3))))
    assert(got(2L) == ((0L, 1L)))
    assert(got(3L) == ((9L, (1L << 0) | (1L << 2))))
  }
}
