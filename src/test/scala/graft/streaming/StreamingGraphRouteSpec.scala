package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Graph

/** Route stability of the size-routed graph operators under a STREAMING
  * CDC-maintained edge list: the changelog streams through
  * [[StatefulOps.latestByKey]] (per-edge compaction, the KTable
  * semantic — upsert/delete per (src,dst) key), and after EVERY
  * micro-batch the live edge list feeds [[Graph.connectedComponents]]
  * and [[Graph.pagerankInt]] twice — once on the default route (these
  * entity graphs fit one task, so the single-task fast path runs) and
  * once with `localMaxEdges = 0` forcing the distributed iteration. The
  * two routes must be bit-identical on every prefix, while the graph
  * itself is CHANGING shape across batches (an edge delete splits a
  * component; a later upsert re-bridges it) — the guarantee that a
  * deployment crossing the size threshold mid-stream never sees a
  * result change from the route flip. Batch twins of the fast paths are
  * pinned by GraphSpec; this spec pins the route through the streaming
  * state machine. */
class StreamingGraphRouteSpec extends SparkSpec {
  import spark.implicits._

  // key = "src-dst", value = "op:weight"
  private def kv(src: Long, dst: Long, seq: Long, op: String, w: Long = 1L) =
    Keyed(s"$src-$dst", seq, s"$op:$w")

  // batch 1: two components {1,2,3} (triangle) and {10,11}
  private val batch1 = Seq(
    kv(1, 2, 1L, "upsert"), kv(2, 3, 2L, "upsert"), kv(1, 3, 3L, "upsert", 2L),
    kv(10, 11, 4L, "upsert"))
  // batch 2: delete 2-3 and 1-3 (splits 3 off), bridge 3-10
  private val batch2 = Seq(
    kv(2, 3, 10L, "upsert", 5L), kv(2, 3, 11L, "delete"),
    kv(1, 3, 12L, "delete"), kv(3, 10, 13L, "upsert", 3L))
  // batch 3: stale delete of 1-2 (seq behind batch 1's upsert? no —
  // compaction is by max seq, so use a LOWER seq to prove staleness is
  // dropped) plus a fresh weight bump on 10-11
  private val batch3 = Seq(
    kv(1, 2, 0L, "delete"),          // stale: must NOT remove 1-2
    kv(10, 11, 20L, "upsert", 7L))

  /** Live edge list from the compacted memory-sink state: latest change
    * per (src,dst) key, deletes dropped. */
  private def liveEdges(): DataFrame =
    spark.table("edge_state")
      .groupBy(col("key"))
      .agg(max(struct(col("seq"), col("value"))).as("c"))
      .select(col("key"), col("c.value").as("value"))
      .filter(col("value").startsWith("upsert"))
      .select(
        split(col("key"), "-").getItem(0).cast("long").as("src"),
        split(col("key"), "-").getItem(1).cast("long").as("dst"),
        split(col("value"), ":").getItem(1).cast("long").as("w"))
      .localCheckpoint(true)

  private def ccBoth(e: DataFrame): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val pairs = e.select(col("src").as("id1"), col("dst").as("id2"))
    def run(localMax: Long) =
      Graph.connectedComponents(pairs, localMaxEdges = localMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    (run(4L << 20), run(0L))
  }

  private def prBoth(e: DataFrame): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    // symmetrize: pagerank is directed; the CDC list is undirected edges
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    def run(localMax: Long) =
      Graph.pagerankInt(sym, nodes, iters = 3, localMaxEdges = localMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    (run(4L << 20), run(0L))
  }

  test("local and distributed routes agree on every CDC prefix while the graph mutates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.latestByKey(in.toDS())
      .writeStream.format("memory").queryName("edge_state")
      .outputMode("update").start()
    try {
      val expectedComps = Seq(
        // after batch 1: {1,2,3} labeled 1, {10,11} labeled 10
        Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L),
        // after batch 2: 3 re-bridged to {10,11}: {1,2} and {3,10,11}
        Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 3L, 11L -> 3L),
        // after batch 3: stale delete ignored — same components
        Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 3L, 11L -> 3L))
      for ((batch, i) <- Seq(batch1, batch2, batch3).zipWithIndex) {
        in.addData(batch: _*)
        q.processAllAvailable()
        val e = liveEdges()
        val (ccFast, ccDist) = ccBoth(e)
        assert(ccFast == ccDist, s"CC route divergence after batch ${i + 1}")
        assert(ccFast == expectedComps(i).sorted,
          s"CC wrong on the live edge list after batch ${i + 1}")
        val (prFast, prDist) = prBoth(e)
        assert(prFast == prDist, s"pagerank route divergence after batch ${i + 1}")
        assert(prFast.map(_._2).sum > 0L, "degenerate pagerank fixture")
      }
    } finally q.stop()
  }
}
