package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TopKByCount]] against the window formulation it replaces: same
  * rows, same order, same (cnt DESC, key ASC) tie-break — on random data
  * with forced ties, groups larger than the trim bound (so partial-buffer
  * trimming actually fires), and string keys (interpreted ordering). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"cnt".desc, $"key".asc)
    df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"g", $"key", $"cnt", $"rank")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(AggregateFunctions.top_k_by_count(struct($"cnt", $"key"), k).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.key", $"col.cnt", ($"pos" + 1).cast("int").as("rank"))

  test("aggregate equals window top-k on random data with ties and oversized groups") {
    val rnd = new scala.util.Random(13)
    // group 0 has 300 members (> the 64-candidate trim bound); counts are
    // drawn from a small range so ties are everywhere
    val rows = (0 until 300).map(i => (0L, s"m$i", rnd.nextInt(5).toLong + 1)) ++
      (1 to 20).flatMap(g => (0 until rnd.nextInt(30) + 1)
        .map(i => (g.toLong, s"m$i", rnd.nextInt(4).toLong + 1)))
    val df = rows.toDF("g", "key", "cnt").repartition(8)
    for (k <- Seq(1, 3, 10)) {
      val expect = windowTopK(df, k).as[(Long, String, Long, Int)]
        .collect().sortBy(r => (r._1, r._4)).toSeq
      val got = aggTopK(df, k).as[(Long, String, Long, Int)]
        .collect().sortBy(r => (r._1, r._4)).toSeq
      assert(got == expect, s"k=$k: aggregate diverges from window")
    }
  }

  test("long keys and single-row groups work; null struct fields are skipped") {
    val df = Seq((1L, Some(7L), 5L), (1L, None, 9L), (2L, Some(1L), 1L))
      .toDF("g", "key", "cnt")
    val got = df.groupBy($"g")
      .agg(AggregateFunctions.top_k_by_count(struct($"cnt", $"key"), 2).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.key", $"col.cnt")
      .as[(Long, Long, Long)].collect().toSet
    // the null-key row is skipped, not ranked
    assert(got == Set((1L, 7L, 5L), (2L, 1L, 1L)))
  }

  test("bottom-k-by-hash sampling is mergeable and prefix-stable (a15's contract)") {
    import graft.functions.AggregateFunctions.top_k_by_count
    val ids = (0L until 500L).toDF("id")
      .withColumn("h",
        conv(substring(md5($"id".cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long"))
    def sample(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      df.agg(top_k_by_count(struct((-$"h").as("cnt"), $"id".as("key")), k).as("s"))
        .select(explode($"s")).select($"col.key").as[Long].collect().toSeq
    val whole10 = sample(ids, 10)
    // mergeable: bottom-10 of the union == bottom-10 of the two shard
    // bottom-10s (the KMV identity the scaladoc claims)
    val shardA = sample(ids.filter($"id" % 2 === 0), 10)
    val shardB = sample(ids.filter($"id" % 2 =!= 0), 10)
    val merged = sample(ids.filter($"id".isin(shardA ++ shardB: _*)), 10)
    assert(merged == whole10, s"merge of shard samples diverged: $merged vs $whole10")
    // prefix-stable: the bottom-5 is the first half of the bottom-10
    assert(sample(ids, 5) == whole10.take(5))
  }
}
