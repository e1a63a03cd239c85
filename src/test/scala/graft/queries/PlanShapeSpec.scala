package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.execution.ExplainMode

/** Regression guards for the plan properties the 100 TB design depends on —
  * a correctness gate can't see a plan rot from broadcast to cartesian or
  * from pushed-down scan to full scan, so these pin the plan text itself
  * (on sf0.001 inputs; plan SHAPE does not depend on the scale factor).
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q1 scan pushes the shipdate filter and prunes unread columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: ["), "no filter pushdown on the lineitem scan")
    assert(p.contains("l_shipdate"), "shipdate filter not at the scan")
    assert(!p.contains("l_comment"), "ReadSchema carries an unused column")
  }

  test("the events ts-normalization layer does not block column pruning") {
    // Tables.events projects ts -> epoch-micros on every read; a query
    // that never touches ts must still get a scan with NO ts column —
    // losing this means every events query at 100 TB drags the widest
    // column through the scan for nothing
    val p = plan("a6_distinct_users")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("ts"), s"unused ts survived into the events scan: $read")
    assert(read.contains("user_id") && read.contains("event_type"),
      s"expected a pruned 2-column events scan: $read")
  }

  test("multiway join broadcasts its dimension sides and never goes cartesian") {
    val p = plan("j_multiway_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    assert(!p.contains("CartesianProduct"), "cartesian product in the join tree")
  }

  test("e15's ADC join is a broadcast hash join keyed on (cell, sub, code)") {
    val p = plan("e15_ivf_pq_search")
    assert(p.contains("BroadcastHashJoin"), "ADC join lost its broadcast")
    val keyed = p.linesIterator.exists { l =>
      l.contains("Left keys [3]") && l.contains("cell")
    }
    assert(keyed, "ADC join is not keyed on the 3-column (cell, sub, code) tuple")
    assert(!p.contains("CartesianProduct"), "cartesian product in e15")
  }

  test("a11's top-k aggregate runs a partial (map-side) phase") {
    val p = plan("a11_topk_agg")
    assert(p.contains("partial_top_k_by_count"),
      "TopKByCount lost its partial phase — the shuffle would carry the full member distribution")
  }

  test("t20's global top-k aggregate runs a partial (map-side) phase") {
    // a GLOBAL top-k is the worst case for the window formulation (every
    // row to ONE reducer); the partial phase is what bounds the reduce
    val p = plan("t20_bpe_pairs")
    assert(p.contains("partial_top_k_by_count"),
      "t20's TopKByCount lost its partial phase — the single-group reduce would receive the pair distribution")
  }

  test("minhash banding never plans a cartesian pair join") {
    val p = plan("d2_minhash_pairs")
    assert(!p.contains("CartesianProduct"), "LSH banding degenerated to all-pairs")
  }

  test("hot scan paths stay inside WholeStageCodegen") {
    // the custom expressions exist precisely to keep per-row work codegen'd;
    // a plan that loses its WholeStageCodegen spans has fallen back to
    // interpreted eval somewhere load-bearing
    // AQE's pre-execution formatted plan carries no codegen annotations
    // (WholeStageCodegen wraps when the adaptive plan actually runs), so
    // this one check plans with AQE off; codegen'd operators then carry
    // "[codegen id : N]"
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("q1_pricing_summary", "e1_knn_brute", "d1_exact_dedup",
        "t1_lang_id", "a11_topk_agg")) {
        assert(plan(name).contains("codegen id :"),
          s"$name has no WholeStageCodegen span")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("Tables.load is a bare scan — no exchange decorates the load edge") {
    // round-8 A/B: a blanket key-hash fan-out at the load edge LOST to the
    // bare scan (20.6 s vs 18.9 s over the 16 affected queries; SCALE.md
    // §Scan edge) — the extra exchange per scan costs more than the
    // parallelism it buys, and at 100 TB a load-edge repartition of the
    // corpus would be a pure pessimization. Compute-heavy scan stages
    // apply their own inline repartition (e.g. shingleFrame);
    // Relational.fanout remains only as an escape hatch with no current
    // call sites. This pins the rejected decoration so it can't silently
    // return.
    for (t <- Seq("lineitem", "events", "documents", "embeddings")) {
      val p = graft.Tables.load(spark, sf, t).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange"),
        s"Tables.load($t) plans an exchange at the scan edge:\n$p")
    }
  }

  test("x15's layout build never sorts the corpus — cell histogram, then exact-ntile arithmetic") {
    // round-9 fix of the repo's last scale-weak plan: the pre-round-9
    // shape sorted the WHOLE point cloud through one task per layout
    // (ntile over an unpartitioned window). Now the corpus is touched
    // exactly once, by a map-side-combining cell-histogram aggregate,
    // and both layouts bucket via Layout.histNtileBuckets arithmetic on
    // the checkpointed ≤4096-row histogram. Two pins:
    // (a) the histogram build — the only plan that sees corpus-sized
    //     data — is scan → partial agg → exchange → final agg, with NO
    //     Sort and no single-partition exchange; pinned on the
    //     PRODUCTION expression (mortonHistBuild, exactly what the
    //     fixture checkpoints), not an inline reconstruction that
    //     could drift from the code path the gate runs
    val histPlan = RelationalQueries.mortonHistBuild(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(histPlan.contains("HashAggregate"), "histogram lost its hash aggregate")
    assert(!histPlan.contains("Sort"), s"corpus-sized sort in the histogram build:\n$histPlan")
    assert(!histPlan.contains("SinglePartition"),
      s"single-partition exchange in the histogram build:\n$histPlan")
    // (b) the query's own plan (post-checkpoint tail) never re-reads the
    //     corpus: its windows/sorts run over the histogram RDD only
    val p = plan("x15_zonemap_prune")
    assert(!p.contains("Scan parquet"),
      s"x15's post-histogram plan re-entered the corpus scan:\n$p")
  }

  test("NO catalog query plans a CartesianProduct (broadcast NLJ of tiny frames is the only cross-join form)") {
    // "explainString" itself only plans, but CONSTRUCTING some frames
    // (kmeans/PQ/LSH families) runs their eager localCheckpoint training
    // jobs first — on sf0.001 that keeps the sweep under a minute, and
    // the asserted plans are the post-checkpoint tails of each query.
    // Every deliberate crossJoin in this repo is crossJoin(broadcast(tiny))
    // which compiles to BroadcastNestedLoopJoin, never CartesianProduct
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }
}
