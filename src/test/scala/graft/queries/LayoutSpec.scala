package graft.queries

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins both scale-safe exact-ntile paths ([[Layout.histNtileBuckets]],
  * [[Layout.rangeNtile]]) against the window-ntile reference — the
  * single-partition `ntile(nb).over(Window.orderBy(...))` formulation
  * they replace (x15's pre-round-9 shape, the one scale-weak plan in the
  * repo). Identity is checked at the strongest granularity the layout
  * semantics define: the per-(cell, bucket) row-count map, on the REAL
  * x15 point cloud (both sort keys) and on synthetic edge geometries
  * (n < nb, n divisible by nb, n with remainder, single-row buckets). */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val nb = 64

  /** Reference: per-(cell, bucket) counts under the window ntile. */
  private def windowRef(pts: DataFrame, sortCols: Seq[Column]): Array[(Long, Long, Int, Long)] =
    pts.withColumn("bucket", ntile(nb).over(Window.orderBy(sortCols: _*)))
      .groupBy(col("px"), col("sx"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))

  test("histNtileBuckets reproduces the window ntile on both x15 layouts") {
    val pts = RelationalQueries.mortonPoints(spark, sf).localCheckpoint(true)
    val hist = pts.groupBy(col("px"), col("sx"), col("z"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    for (sortCols <- Seq(Seq(col("z")), Seq(col("px"), col("sx")))) {
      val got = Layout.histNtileBuckets(hist, nb, sortCols)
        .select(col("px"), col("sx"), col("bucket"), col("cnt_in_bucket"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      assert(got.toSeq == windowRef(pts, sortCols).toSeq,
        s"hist ntile diverged from window ntile on sort ${sortCols.mkString(",")}")
    }
  }

  test("rangeNtile reproduces the window ntile on both x15 layouts") {
    val pts = RelationalQueries.mortonPoints(spark, sf).localCheckpoint(true)
    for (sortCols <- Seq(Seq(col("z")), Seq(col("px"), col("sx")))) {
      val got = Layout.rangeNtile(pts, nb, sortCols, parts = 7)
        .groupBy(col("px"), col("sx"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      assert(got.toSeq == windowRef(pts, sortCols).toSeq,
        s"range ntile diverged from window ntile on sort ${sortCols.mkString(",")}")
    }
  }

  test("edge geometries: n<nb, n==nb, divisible, remainder, heavy ties") {
    import spark.implicits._
    // (px, sx) synthetic cells; z mirrors px so one sort key suffices.
    // counts chosen to straddle bucket boundaries: a 40-row cell in a
    // 100-row corpus under nb=64 spans many single-row buckets.
    val geometries = Seq(
      Seq.fill(10)(1L) ++ Seq.fill(40)(2L) ++ Seq.fill(50)(3L), // n=100, rem=36
      (1L to 64L),                                              // n=nb, one row each
      Seq.fill(128)(5L) ++ Seq.fill(64)(9L),                    // n=192, divisible
      Seq(1L, 2L, 3L))                                          // n<nb
    for (rows <- geometries) {
      val pts = rows.map(p => (p, p % 7, p)).toDF("px", "sx", "z")
        .localCheckpoint(true)
      val hist = pts.groupBy(col("px"), col("sx"), col("z"))
        .agg(count(lit(1)).as("cnt"))
      val ref = windowRef(pts, Seq(col("z")))
      val gotHist = Layout.histNtileBuckets(hist, nb, Seq(col("z")))
        .select(col("px"), col("sx"), col("bucket"), col("cnt_in_bucket"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      assert(gotHist.toSeq == ref.toSeq, s"hist ntile wrong on n=${rows.size}")
      val gotRange = Layout.rangeNtile(pts, nb, Seq(col("z")), parts = 3)
        .groupBy(col("px"), col("sx"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      assert(gotRange.toSeq == ref.toSeq, s"range ntile wrong on n=${rows.size}")
    }
  }

  test("randomized geometries × bucket counts match the window ntile (seeded)") {
    import spark.implicits._
    // every other case in this suite runs at nb=64; the closed-form
    // bucket arithmetic (fat region = the first n%nb buckets, one extra
    // row each) takes DIFFERENT branches as nb varies relative to n and
    // to the cell sizes, so sweep both with a seeded generator: small
    // prime nb against big cells (one cell straddles many buckets),
    // big nb against few rows (q=0, all-fat region), and mixtures.
    val rng = new scala.util.Random(42)
    val nbs = Seq(2, 3, 5, 7, 17, 31, 64, 100)
    for (nbx <- nbs) {
      val nCells = 1 + rng.nextInt(40)
      val counts = Seq.fill(nCells)(1L + rng.nextInt(if (rng.nextBoolean()) 9 else 120))
      val rows = counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c.toInt)((i.toLong + 1, (i.toLong + 1) % 7, i.toLong + 1))
      }
      val pts = rows.toDF("px", "sx", "z").localCheckpoint(true)
      val ref = pts
        .withColumn("bucket", ntile(nbx).over(Window.orderBy(col("z"))))
        .groupBy(col("px"), col("bucket")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      val hist = pts.groupBy(col("px"), col("sx"), col("z"))
        .agg(count(lit(1)).as("cnt"))
      val gotHist = Layout.histNtileBuckets(hist, nbx, Seq(col("z")))
        .select(col("px"), col("bucket"), col("cnt_in_bucket"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      assert(gotHist.toSeq == ref.toSeq,
        s"hist ntile diverged at nb=$nbx, cells=$counts")
      val gotRange = Layout.rangeNtile(pts, nbx, Seq(col("z")), parts = 3)
        .groupBy(col("px"), col("bucket")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      assert(gotRange.toSeq == ref.toSeq,
        s"range ntile diverged at nb=$nbx, cells=$counts")
    }
  }

  test("histNtileBuckets drops zero-count cells instead of fabricating buckets") {
    import spark.implicits._
    // a cnt=0 domain row makes __start = __end + 1; without the guard,
    // sequence(lo, hi) with lo > hi DESCENDS and would emit phantom
    // bucket rows for an empty cell
    val hist = Seq((1L, 1L, 1L, 30L), (2L, 2L, 2L, 0L), (3L, 3L, 3L, 70L))
      .toDF("px", "sx", "z", "cnt")
    val got = Layout.histNtileBuckets(hist, nb, Seq(col("z")))
      .select(col("px"), col("bucket"), col("cnt_in_bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(!got.exists(_._1 == 2L), "zero-count cell produced bucket rows")
    assert(got.map(_._3).sum == 100L, "bucket weights must cover exactly the 100 rows")
    val ref = (Seq.fill(30)((1L, 1L, 1L)) ++ Seq.fill(70)((3L, 3L, 3L)))
      .toDF("px", "sx", "z")
    val refMap = windowRef(ref, Seq(col("z"))).map(t => (t._1, t._3) -> t._4).toMap
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == refMap,
      "guarded hist ntile diverged from the window reference")
  }

  test("histNtileBuckets fails fast on duplicate sort keys") {
    import spark.implicits._
    // a tied sort key makes the window order non-total: WHICH tied cell
    // straddles a bucket boundary would vary run to run — wrong data,
    // silently. The in-plan guard (lag over the same WindowExec) must
    // surface it as an error instead.
    val hist = Seq((1L, 1L, 5L, 10L), (2L, 2L, 5L, 20L), (3L, 3L, 7L, 30L))
      .toDF("px", "sx", "z", "cnt")
    val e = intercept[Exception](
      Layout.histNtileBuckets(hist, nb, Seq(col("z"))).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("sort keys must be unique")),
      s"expected the unique-key guard, got: $e")
  }

  test("x12 on an empty corpus: zero counts, booleans true, efficiency null") {
    // the groupless aggregate still emits one row on empty input; the
    // coalesce(sum, 0) contract keeps the per-rect counts at 0 (not
    // null, which would poison the soundness booleans) while efficiency
    // stays null — honestly undefined with nothing scanned
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("px", LongType), StructField("sx", LongType),
      StructField("z", LongType), StructField("cnt", LongType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val rows = RelationalQueries.x12FromHist(empty).collect()
    assert(rows.length == 2, "one row per rect even on empty input")
    for (r <- rows) {
      assert(r.getLong(r.fieldIndex("n_rect")) == 0L)
      assert(r.getLong(r.fieldIndex("n_zrange")) == 0L)
      assert(r.getBoolean(r.fieldIndex("superset_ok")))
      assert(r.getBoolean(r.fieldIndex("exact_ok")))
      assert(r.isNullAt(r.fieldIndex("efficiency")))
    }
  }

  test("x15 output is identical under hist-ntile and the window-ntile reference") {
    // end-to-end twin of the committed gate: the PRODUCTION zone-map
    // tail (x15FromLayouts — exactly what the gate runs) is driven by
    // the window-ntile reference layout (per-row, cnt_in_bucket = 1)
    // and must match the gate's hist-ntile output row-for-row; only the
    // layout stage differs, so drift in the shared tail can't hide here
    val got = RelationalQueries.x15ZonemapPrune(spark, sf).collect().map(_.toSeq)
    val pts = RelationalQueries.mortonPoints(spark, sf).localCheckpoint(true)
    def layoutOf(tag: String, sortCols: Seq[Column]): DataFrame =
      pts.withColumn("bucket", ntile(nb).over(Window.orderBy(sortCols: _*)))
        .select(lit(tag).as("layout"), col("bucket"), col("px"), col("sx"),
          lit(1L).as("cnt_in_bucket"))
    val layouts = layoutOf("zorder", Seq(col("z")))
      .union(layoutOf("single_col", Seq(col("px"), col("sx"))))
    val ref = RelationalQueries.x15FromLayouts(layouts)
      .collect().map(_.toSeq)
    assert(got.toSeq == ref.toSeq, "x15 output changed under the hist-ntile plan")
  }
}
