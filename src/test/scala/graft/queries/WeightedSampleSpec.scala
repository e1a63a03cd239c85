package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** a16's Efraimidis–Spirakis weighted sampler: the bounded-aggregate
  * formulation must equal the row_number window over the same quantized
  * keys, and skewed weights must actually bias the sample. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  // ids 1..1000 split by parity; ids ending in 0 or 5 carry weight 100
  // (10% of EACH parity group — i%10==0 alone would leave "odd" heavyless)
  private def pop: DataFrame =
    (1 to 1000).map { i =>
      (if (i % 2 == 0) "even" else "odd", i.toLong,
        if (i % 5 == 0) 100.0 else 1.0)
    }.toDF("grp", "id", "w")

  private def quantKey(df: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.withColumn("__q", floor(log(u) / col("w") * lit(4294967296.0)).cast("long"))
  }

  private def aggSample(k: Int): DataFrame = {
    import graft.functions.AggregateFunctions.top_k_by_count
    quantKey(pop)
      .groupBy(col("grp"))
      .agg(top_k_by_count(struct(col("__q").as("cnt"), col("id").as("key")), k)
        .as("__s"))
      .select(col("grp"), posexplode(col("__s")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("id"))
  }

  private def windowSample(k: Int): DataFrame =
    quantKey(pop)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("__q").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank").cast("int"), col("id"))

  test("bounded-aggregate sample equals the row_number window formulation") {
    for (k <- Seq(5, 50)) {
      val a = aggSample(k).collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val w = windowSample(k).collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(a == w, s"k=$k")
    }
  }

  test("top-k is a prefix of top-2k (subset stability)") {
    val small = aggSample(10).collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val big = aggSample(20).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .filter(_._2 <= 10).toSet
    assert(small == big)
  }

  test("skewed weights overrepresent heavy items") {
    // heavy ids (w=100) are 10% of each group; with 100:1 weight they
    // should dominate a k=50-per-group sample
    val sampled = aggSample(50).collect()
    val heavyFrac = sampled.count(_.getLong(2) % 5 == 0).toDouble / sampled.length
    assert(heavyFrac > 0.5, s"heavy fraction $heavyFrac not > 0.5")
  }
}
