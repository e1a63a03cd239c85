package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-collapse
  * step of a dedup pipeline: near-dup PAIRS (LSH+verify output) become
  * GROUPS, each labeled by its minimum member id, so a corpus keeps one
  * representative per group (reference semantics: same min-id convention as
  * [[TextOps.canonicalDocs]] uses for byte-identical docs).
  *
  * Algorithm: min-label propagation. Every node starts as its own label;
  * each round, every node takes the minimum label among itself and its
  * neighbors; fixpoint when no label changes. Rounds = graph diameter —
  * near-dup graphs are unions of near-cliques (diameter 2-3), so this
  * converges in a handful of rounds. Each round is one join + one aggregate
  * on the (symmetrized, persisted) edge list: fully distributed, nothing
  * driver-side except the one-row convergence count — the Pregel iteration
  * pattern expressed relationally.
  *
  * Scale notes: per-round cost is O(|E|) shuffle on node id. For graphs
  * with large diameter (chains — not the dedup shape) the
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") reaches O(log n) rounds with the
  * same per-round join shape — that is the swap-in at adversarial
  * diameters. Growing LINEAGE is the other iteration hazard — and persist
  * alone does NOT fix it: caching stores the physical data, but each
  * round's logical plan still nests every previous round's, so Catalyst
  * analysis cost compounds until planning dwarfs execution. Each round's
  * labels are therefore eagerly `localCheckpoint`ed — a fresh leaf plan
  * per round, O(1) planning forever (production with fault-tolerance
  * needs: reliable `checkpoint` to durable storage instead).
  *
  * Only nodes that appear in an edge are labeled (singletons are not dup
  * candidates and stay out of the output, exactly like a pair list).
  */
object Graph {

  /** (id, comp) per node of the undirected edge list `edges` (columns
    * `id1`, `id2`); `comp` = min node id reachable. `maxIter` bounds the
    * rounds; an IllegalStateException at the bound beats silently wrong
    * clusters. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // persist (CacheManager-backed, so the explicit unpersist below works;
    // its lineage is one union deep — no truncation needed)
    val sym = edges.select(col("id1"), col("id2"))
      .union(edges.select(col("id2").as("id1"), col("id1").as("id2")))
      .persist()
    // per-round labels use eager localCheckpoint: materialize AND cut
    // lineage (see scaladoc). Dataset.unpersist is a no-op for
    // checkpointed frames (their blocks belong to an internal RDD, not the
    // CacheManager); dropping each round's reference lets ContextCleaner
    // reclaim its blocks after driver GC — bounded by GC cadence, not
    // session lifetime.
    var labels = sym.select(col("id1").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIter) {
        // min label among each node's neighbors...
        val neighborMin = sym
          .join(labels, sym("id1") === labels("id"))
          .groupBy(sym("id2").as("id"))
          .agg(min(col("comp")).as("nmin"))
        // ...folded with the node's own label
        val next = labels.as("l")
          .join(neighborMin.as("n"), Seq("id"), "left")
          .select(col("id"),
            least(col("l.comp"), coalesce(col("n.nmin"), col("l.comp"))).as("comp"))
          .localCheckpoint(true)
        val changed = next.as("a").join(labels.as("b"), "id")
          .filter(col("a.comp") =!= col("b.comp"))
          .limit(1).count() // one tiny driver-side number per round
        labels = next // previous round's reference dropped → ContextCleaner
        converged = changed == 0
        iter += 1
      }
    } finally sym.unpersist() // incl. mid-round failures: don't pin 2|E| rows
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds the bound — switch to star contractions)")
    labels
  }
}
