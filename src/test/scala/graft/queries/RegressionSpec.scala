package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** x10's closed form must recover a representable-slope perfect line
  * EXACTLY: the sufficient statistics are integers, 3.25 = 13/4 and the
  * day-index x are dyadic-friendly, so every double op in the closed form
  * is exact — slope 3.25, intercept 7.0, r² 1.0, no tolerance. Also pins
  * the mergeability story: the statistics from two disjoint halves,
  * summed, give the same line (the whole point of the sufficient-statistic
  * formulation at 100 TB). */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def line(xs: Seq[Long], g: String) =
    xs.map(x => (g, x, 325L * x + 700L)).toDF("event_type", "x", "yc")

  test("perfect line y = 3.25x + 7 is recovered bit-exactly") {
    val out = RelationalQueries.regressionFrom(line(0L to 29L, "a")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("slope") == 3.25)
    assert(r.getAs[Double]("intercept") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Long]("n") == 30L)
  }

  test("statistics merge: union of disjoint halves equals the whole") {
    val whole = RelationalQueries.regressionFrom(
      line(0L to 29L, "a")).collect().head
    val halves = RelationalQueries.regressionFrom(
      line(0L to 14L, "a").union(line(15L to 29L, "a"))
        .repartition(4)).collect().head
    assert(whole == halves)
  }

  test("two groups regress independently; flat group has slope 0") {
    val flat = (0L to 9L).map(x => ("b", x, 500L)).toDF("event_type", "x", "yc")
    val out = RelationalQueries.regressionFrom(line(0L to 9L, "a").union(flat))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("a").getAs[Double]("slope") == 3.25)
    assert(out("b").getAs[Double]("slope") == 0.0)
    // r² of a zero-variance-y group is 0/0 — NULL on both engines
    assert(out("b").isNullAt(out("b").fieldIndex("r2")))
  }
}
