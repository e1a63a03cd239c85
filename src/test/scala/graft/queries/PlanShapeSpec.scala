package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}

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

  // --- dims-first join-shape pins (round-9 wins; round-10 regression guards) ---
  // Asserted on the OPTIMIZED LOGICAL plan, not the physical text: at
  // sf0.001 stats make every join a BroadcastHashJoin, so "one fact-side
  // shuffle join" is not physically observable at test scale — what IS
  // scale-independent is the join TREE (the fact leaf participates in
  // exactly one join because the dimension chain collapsed first) and the
  // broadcast HINTS on the structurally-tiny sides, which at 100 TB are
  // exactly what keep the fact table to a single orderkey shuffle.

  private def optimizedPlanOf(name: String): LogicalPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan

  /** A leaf "is" a table iff it still outputs that table's marker column
    * (join keys survive column pruning by construction). */
  private def hasLeaf(p: LogicalPlan, marker: String): Boolean =
    p.collectLeaves().exists(_.output.exists(_.name == marker))

  private def joinsOf(p: LogicalPlan): Seq[Join] = p.collect { case j: Join => j }

  private def assertBroadcastHinted(joins: Seq[Join], marker: String, who: String): Unit = {
    val dimJoins = joins.filter(j =>
      j.right.collectLeaves().size == 1 && hasLeaf(j.right, marker))
    assert(dimJoins.nonEmpty, s"no join with $who as its sole right side — shape drifted")
    for (j <- dimJoins)
      assert(j.hint.rightHint.exists(_.strategy.contains(BROADCAST)),
        s"$who side lost its broadcast hint: ${j.hint}")
  }

  test("r1 and j_multiway are dims-first: lineitem rides exactly ONE join; nation/region broadcast") {
    for (name <- Seq("r1_rollup_revenue", "j_multiway_revenue")) {
      val joins = joinsOf(optimizedPlanOf(name))
      val factJoins = joins.filter(hasLeaf(_, "l_orderkey"))
      assert(factJoins.size == 1,
        s"$name: lineitem participates in ${factJoins.size} joins — the dims " +
          s"chain must collapse to (o_orderkey, dims) BEFORE touching the fact table")
      assertBroadcastHinted(joins, "n_nationkey", s"$name nation")
      assertBroadcastHinted(joins, "r_regionkey", s"$name region")
      // and the fact join's dims side is the collapsed orders⋈customer chain,
      // not a bare orders leaf followed by a second fact-side customer join
      val dimsSide = factJoins.head.right
      assert(hasLeaf(dimsSide, "o_orderkey") && hasLeaf(dimsSide, "c_custkey"),
        s"$name: the single fact join's right side is not the collapsed dims chain")
    }
  }

  test("a4 is dims-first: lineitem rides one dims join plus one broadcast-hinted supplier join") {
    val joins = joinsOf(optimizedPlanOf("a4_out_of_nation"))
    val factJoins = joins.filter(hasLeaf(_, "l_orderkey"))
    assert(factJoins.size == 2,
      s"a4: expected the fact leaf under exactly 2 joins (supplier broadcast + " +
        s"collapsed orders⋈customer dims), found ${factJoins.size}")
    assertBroadcastHinted(joins, "s_suppkey", "a4 supplier")
    // orders⋈customer collapsed off the fact spine: exactly one join has
    // neither fact leaf nor supplier leaf, and it is the o⋈c dims join
    val dimsOnly = joins.filterNot(j => hasLeaf(j, "l_orderkey") || hasLeaf(j, "s_suppkey"))
    assert(dimsOnly.size == 1 &&
      hasLeaf(dimsOnly.head, "o_orderkey") && hasLeaf(dimsOnly.head, "c_custkey"),
      "a4: orders⋈customer no longer collapses before the fact join")
  }

  test("the dims-first family plans broadcast joins and no cartesian at bench scale") {
    for (name <- Seq("r1_rollup_revenue", "a4_out_of_nation")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: dimension joins should broadcast")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian product in the join tree")
    }
  }

  test("t19's post-checkpoint tail never re-scans or re-explodes the corpus") {
    // round-10 fusion: ONE explode + per-doc aggregate builds the
    // checkpointed position frame G, and every derived statistic (per-doc
    // bigrams, unigram counts, vocab, corpus bigram counts) reads G. The
    // tail plan the query returns must therefore contain NO parquet scan
    // and NO Generate — losing this means a chain re-tokenizes the corpus
    // per branch again (the three-pass shape the fusion replaced)
    val p = plan("t19_bigram_lm")
    assert(!p.contains("Scan parquet"),
      s"t19's tail re-entered the corpus scan:\n$p")
    assert(!p.contains("Generate"),
      s"t19's tail re-explodes token positions:\n$p")
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
