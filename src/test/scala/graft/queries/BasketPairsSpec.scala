package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x14's co-purchase edge build generates ordered part pairs from
  * per-basket arrays (one basket-keyed shuffle, pairs formed in the scan
  * stage) instead of a fact-scale self-join. The two formulations must
  * agree on the weighted pair MULTISET — including duplicate parts within
  * a basket, where each (row_i, row_j) combination counts once — or the
  * thresholded edge list (and every triangle statistic downstream of it)
  * silently drifts. This spec pins that equivalence on randomized baskets
  * with deliberate within-basket duplicates. */
class BasketPairsSpec extends SparkSpec {
  import spark.implicits._

  test("basket-array pair generation equals the self-join pair multiset") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // ~40 baskets of size 1..6 over a 12-part vocabulary: small enough
      // to brute-force, collision-heavy enough to exercise duplicates
      val rows = (1 to 40).flatMap { ok =>
        Seq.fill(1 + rnd.nextInt(6))((ok.toLong, (1 + rnd.nextInt(12)).toLong))
      }
      val li = rows.toDF("ok", "p")

      val joined = li.select(col("ok"), col("p").as("u"))
        .join(li.select(col("ok"), col("p").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))

      val basket = li.groupBy(col("ok"))
        .agg(collect_list(col("p")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, x -> transform(filter(ps, y -> x < y)," +
            " y -> named_struct('u', x, 'v', y))))")).as("pr"))
        .select(col("pr.u").as("u"), col("pr.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))

      val a = joined.orderBy(col("u"), col("v")).collect().toSeq
      val b = basket.orderBy(col("u"), col("v")).collect().toSeq
      assert(a == b, s"trial $trial: self-join and basket pairs diverged")
    }
  }
}
