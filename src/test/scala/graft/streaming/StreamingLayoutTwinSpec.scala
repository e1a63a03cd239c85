package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MortonInterleave.morton_interleave
import graft.operators.Layout

/** A point on the bounded 64×64 hashed plane the x12/x15 layout family
  * buckets over. */
case class LayoutPt(px: Long, sx: Long)

/** Streaming twin of the layout family (x12/x15's round-9 shape): the
  * cell HISTOGRAM — the only corpus-sized artifact in the family — is
  * maintained as CDC state by a streaming aggregation (update-mode
  * counts per cell; the memory sink's latest row per key is the live
  * count), and after EVERY micro-batch [[Layout.histNtileBuckets]] runs
  * over the live histogram under BOTH production sort orders (the
  * Morton key and the (px, sx) single-column order) and must be
  * bit-identical to a batch rebuild over the full prefix. The stream
  * mutates the histogram in every way a write-time layout maintainer
  * would see: existing cells grow (bucket boundaries shift), new cells
  * appear (the domain itself grows), and totals cross an uneven-ntile
  * point (n mod nb ≠ 0, exercising the fat/thin bucket split). Mirrors
  * `StreamingGraphRouteSpec`'s shape: batch semantics are pinned by
  * `LayoutSpec`; this pins the same arithmetic fed from the streaming
  * state machine. */
class StreamingLayoutTwinSpec extends SparkSpec {
  import spark.implicits._

  private val nb = 4

  // batch 1: 10 points over 6 cells, uneven counts
  private val batch1 = Seq(
    LayoutPt(1, 1), LayoutPt(1, 1), LayoutPt(1, 1),
    LayoutPt(2, 5), LayoutPt(2, 5),
    LayoutPt(7, 0), LayoutPt(0, 7),
    LayoutPt(3, 3), LayoutPt(3, 3), LayoutPt(63, 63))
  // batch 2: grow existing cells only — boundaries shift, domain fixed
  private val batch2 = Seq(
    LayoutPt(7, 0), LayoutPt(7, 0), LayoutPt(7, 0),
    LayoutPt(0, 7), LayoutPt(1, 1))
  // batch 3: new cells appear, including plane corners (z extremes)
  private val batch3 = Seq(
    LayoutPt(0, 0), LayoutPt(32, 16), LayoutPt(16, 32),
    LayoutPt(63, 63), LayoutPt(5, 40))

  private def withZ(hist: DataFrame): DataFrame =
    hist.withColumn("z", morton_interleave(col("px"), col("sx")))

  /** cell × bucket assignment under one sort order, canonicalized. */
  private def buckets(hist: DataFrame, sortCols: Seq[String]): Seq[(Long, Long, Int, Long)] =
    Layout.histNtileBuckets(withZ(hist), nb, sortCols.map(col), col("cnt"))
      .select(col("px"), col("sx"), col("bucket"), col("cnt_in_bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq

  test("streamed cell histogram reproduces the batch layout on every prefix") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[LayoutPt]
    val q = in.toDS().toDF()
      .groupBy(col("px"), col("sx"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("cell_hist")
      .outputMode("update").start()
    try {
      val seen = scala.collection.mutable.ArrayBuffer.empty[LayoutPt]
      for ((batch, i) <- Seq(batch1, batch2, batch3).zipWithIndex) {
        in.addData(batch: _*)
        q.processAllAvailable()
        seen ++= batch
        // live histogram: update-mode sink appends a row per updated key
        // per batch; counts are monotone, so max = the latest state
        val live = spark.table("cell_hist")
          .groupBy(col("px"), col("sx"))
          .agg(max(col("cnt")).as("cnt"))
        val rebuilt = seen.toSeq.toDF("px", "sx")
          .groupBy(col("px"), col("sx"))
          .agg(count(lit(1)).as("cnt"))
        for (sortCols <- Seq(Seq("z"), Seq("px", "sx"))) {
          val s = buckets(live, sortCols)
          val b = buckets(rebuilt, sortCols)
          assert(s == b,
            s"streamed vs batch layout diverged after batch ${i + 1} under " +
              s"sort ${sortCols.mkString(",")}:\n  streamed: $s\n  batch: $b")
          // non-vacuity: exact-ntile invariants on the streamed side —
          // every point assigned, bucket sizes differ by at most 1
          assert(s.map(_._4).sum == seen.size,
            s"assigned mass ${s.map(_._4).sum} != ${seen.size} points")
          val sizes = s.groupBy(_._3).view.mapValues(_.map(_._4).sum).values.toSeq
          assert(sizes.max - sizes.min <= 1,
            s"exact-ntile balance violated after batch ${i + 1}: $sizes")
        }
      }
    } finally q.stop()
  }
}
