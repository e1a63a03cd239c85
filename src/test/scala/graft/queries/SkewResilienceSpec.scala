package graft.queries

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Skew resilience of the two shapes a hot key hits hardest — the
  * catalog's test data is uniform, so without this pin a skewed
  * production distribution (one key owning half the corpus) would be the
  * first time the plans meet real skew.
  *
  * 1. The dims-first fact⋈dims equi-join (r1/j_multiway/a4's shape, with
  *    the broadcast escape hatch disabled the way a 100 TB dims side
  *    disables it): AQE's skew-join splitting must ENGAGE — the executed
  *    plan carries skew-handled shuffle reads — and the result must be
  *    exactly the uniform-semantics answer. Thresholds are scaled to
  *    test-size bytes (the production defaults are 256 MB-class); what
  *    is pinned is that the plan SHAPE leaves AQE free to split (no
  *    artificial coalesce/exchange between the shuffle and the join),
  *    which is partition-count- and scale-independent.
  * 2. The w2 sessionize window (lag + running sum over one per-key sort):
  *    a window partition CANNOT be split — per-key sequential order is
  *    the semantic — so the pin is totality + exactness under a 50 %-hot
  *    key, and the scale story (documented in SCALE.md) is that the cost
  *    is bounded by the hot KEY's rows, never the corpus: one task scans
  *    the hot user while every other key proceeds in parallel, and the
  *    streaming twin absorbs the same key incrementally.
  */
class SkewResilienceSpec extends SparkSpec {
  import spark.implicits._

  test("AQE skew-join splitting engages on the dims-first join shape under a 50%-hot key") {
    val hot = 20000
    // fact: key 0 owns half the rows; 2000 cold keys share the rest. The
    // payload must be (a) INCOMPRESSIBLE — map-output sizes are measured
    // on compressed shuffle blocks, and a padded constant deflates below
    // any threshold — and (b) REFERENCED downstream, or column pruning
    // strips it at the shuffle and the hot partition never crosses the
    // byte threshold (both found empirically building this spec)
    val fact = spark.range(2 * hot).select(
      when($"id" < hot, 0L).otherwise(pmod($"id", lit(2000L)) + 1L).as("key"),
      concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
        md5(($"id" + 2).cast("string")), md5(($"id" + 3).cast("string")))
        .as("payload"))
    val dims = spark.range(2001).select($"id".as("key"),
      concat(lit("d"), $"id".cast("string")).as("dim"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dims, Seq("key"))
        .groupBy($"dim")
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      // exactness under skew: hot key -> 'd0' with `hot` rows; cold keys
      // 1..2000 each appear hot/2000 times; payload is 4 md5 hexes = 128 chars
      val expect = (("d0", hot.toLong, hot * 128L) +:
        (1 to 2000).map(k =>
          (s"d$k", (hot / 2000).toLong, (hot / 2000) * 128L))).sorted
      assert(got == expect, s"skewed join result wrong: ${got.take(3)}...")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"),
        "join did not execute adaptively")
      assert(plan.contains("skew=true"),
        s"AQE skew-join splitting did not engage:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splitting engages on a1's fact-fact shape, and the explicit repartition(custkey) does not block it") {
    // a1_top3_parts_per_customer's exact shape (RelationalQueries.scala:184):
    // lineitem⋈orders on orderkey, then ONE explicit repartition(custkey)
    // serving both the (custkey, partkey) count and the top-K window. Here
    // the JOIN key is skewed — orderkey 0 owns half the fact — and the pin
    // is that the downstream user repartition leaves AQE free to split the
    // join's hot partition (the join output flows into another exchange, so
    // no distribution contract forbids the split), with exact results.
    val hot = 20000
    val li = spark.range(2 * hot).select(
      when($"id" < hot, 0L).otherwise(pmod($"id", lit(2000L)) + 1L).as("l_orderkey"),
      pmod($"id", lit(10L)).as("l_partkey"),
      concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
        md5(($"id" + 2).cast("string")), md5(($"id" + 3).cast("string")))
        .as("payload"))
    val o = spark.range(2001).select($"id".as("o_orderkey"),
      pmod($"id", lit(50L)).as("o_custkey"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val counted = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .repartition(col("o_custkey"))
        .groupBy(col("o_custkey"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"), sum(length($"payload")).as("bytes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("cnt").desc, col("l_partkey").asc)
      val top = counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      val got = top.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .sorted.toSeq
      // custkey 0 owns the hot order (orderkey 0: `hot` rows, partkeys 0-9
      // at hot/10 each) plus cold orderkeys 50,100,…,2000 (40 orders × 10
      // rows, all at partkey 9) -> top-3 = partkey 9 at 2400, then 0 and 1
      // at 2000; every other custkey c has all 400 of its rows on the single
      // partkey (c-1)%10. Payload is 4 md5 hexes = 128 bytes per row.
      val expect = (Seq(
        (0L, 9L, 2400L, 2400 * 128L, 1),
        (0L, 0L, 2000L, 2000 * 128L, 2),
        (0L, 1L, 2000L, 2000 * 128L, 3)) ++
        (1 to 49).map(c => (c.toLong, ((c - 1) % 10).toLong, 400L, 400 * 128L, 1))).sorted
      assert(got == expect, s"fact-fact result wrong under skew: ${got.take(4)}...")
      val plan = top.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"),
        "query did not execute adaptively")
      assert(plan.contains("skew=true"),
        s"AQE skew splitting did not engage on the fact-fact join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sessionize stays exact and total under a 50%-hot user") {
    val gap = 100L
    // hot user: 10k events alternating inside/over the gap -> sessions of
    // exactly 2 events each; 50 cold users with 4 events, one session each
    val hotEvents = (0 until 10000).map { i =>
      // pairs: (2k, 2k+1) are `gap/2` apart; the next pair starts gap*2 later
      ("hot", i.toLong, (i / 2) * 3 * gap + (i % 2) * (gap / 2))
    }
    val coldEvents = for (u <- 1 to 50; i <- 0 until 4)
      yield (s"u$u", i.toLong, i * (gap / 2))
    val ev = (hotEvents ++ coldEvents).toDF("user_id", "event_id", "ts_us")
    val out = Relational.sessionize(ev, Seq("user_id"), "ts_us",
      Seq($"ts_us".asc, $"event_id".asc), gap)
      .groupBy($"user_id")
      .agg(max($"session_no").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val expect = (("hot", 5000, 10000L) +:
      (1 to 50).map(u => (s"u$u", 1, 4L))).sorted
    assert(out == expect, s"sessionize wrong under skew: ${out.take(3)}...")
  }
}
