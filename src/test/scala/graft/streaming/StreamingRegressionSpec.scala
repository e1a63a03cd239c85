package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of x10's per-group OLS: running sufficient statistics
  * (six longs per group) must equal the batch aggregation's on every fed
  * prefix — and, because the statistics determine the line, the derived
  * slope must match regressionFrom's closed form bit-exactly. Batches are
  * deliberately fed out of time order: sufficient statistics carry no
  * order contract, unlike the funnel/retention twins. */
class StreamingRegressionSpec extends SparkSpec {
  import spark.implicits._

  private def fromBatch(fed: Seq[RegObs]): Map[String, (Long, Long, Long, Long, Long, Long)] =
    graft.queries.RelationalQueries.regressionSuffStats(
      fed.map(o => (o.group, o.x, o.yc)).toDF("event_type", "x", "yc"))
      .selectExpr("event_type", "n", "sx", "syc", "sxx", "sxy", "syy")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("incremental sufficient statistics equal the batch aggregate on every fed prefix") {
    implicit val ctx = spark.sqlContext
    // group "a": the exact line y = 3.25x + 7 (yc = 325x + 700), scattered
    // across batches in NON-chronological order; group "b": two points
    val batches = Seq(
      Seq(RegObs("a", 5L, 2325L), RegObs("a", 0L, 700L), RegObs("b", 2L, 100L)),
      Seq(RegObs("a", 3L, 1675L), RegObs("b", 9L, 4000L)),
      Seq(RegObs("a", 1L, 1025L), RegObs("a", 4L, 2000L), RegObs("a", 2L, 1350L)))

    val in = MemoryStream[RegObs]
    val got = scala.collection.mutable.Map[String, RegState]()
    val q = StatefulOps.regressionStats(in.toDS())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, RegState)], _: Long) =>
        b.collect().foreach(r => got(r._1) = r._2)
        ()
      }
      .start()
    try {
      var fed = Seq.empty[RegObs]
      for (batch <- batches) {
        in.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val want = fromBatch(fed)
        val have = got.toMap.map { case (g, s) =>
          g -> ((s.n, s.sx, s.syc, s.sxx, s.sxy, s.syy))
        }
        assert(have == want, s"divergence after feeding ${fed.size} observations")
      }
    } finally q.stop()

    // the planted line is recoverable from the final state: slope num/den
    val a = got("a")
    val num = a.n * a.sxy - a.sx * a.syc
    val den = a.n * a.sxx - a.sx * a.sx
    assert(num.toDouble / den.toDouble / 100.0 == 3.25)
  }
}
