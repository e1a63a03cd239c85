package graft.operators

import graft.SparkSpec
import scala.util.Random

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labeling: path-compress everything, roots are minima by merge rule
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)], localMaxEdges: Long = 4L << 20): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("id1", "id2"),
        localMaxEdges = localMaxEdges)
      .as[(Long, Long)].collect().toMap

  test("connectedComponents equals a union-find reference on random graphs") {
    // every graph here is under the fast-path bound, so the default run
    // exercises the single-task union-find; localMaxEdges = 0 forces the
    // distributed min-label iteration — both must agree with the
    // reference (and therefore each other) on every trial
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial $trial diverged (fast path)")
      assert(run(edges, localMaxEdges = 0L) == unionFind(edges),
        s"trial $trial diverged (iteration)")
    }
  }

  test("starContractComponents equals union-find on random graphs") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = Graph.starContractComponents(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(edges), s"trial $trial diverged")
    }
  }

  test("maxIter hit auto-switches to star contraction (10k-node path)") {
    // a 10 000-node path: diameter 9 999 ≫ any min-label bound. The old
    // behavior threw; now the star-contraction fallback finishes in
    // O(log² n) rounds with the same labels. localMaxEdges = 0 keeps the
    // fast path out so the maxIter → star-contraction route is the one
    // under test.
    val n = 10000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = Graph.connectedComponents(chain.toDF("id1", "id2"), maxIter = 3,
        localMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("chain graphs converge (diameter bound) and label by min id") {
    // a 20-node chain: worst diameter shape for label propagation —
    // forced onto the iteration path (the fast path has its own trials)
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = run(chain, localMaxEdges = 0L)
    assert(got.size == 20 && got.values.forall(_ == 0L))
    // two disjoint cliques keep distinct labels
    val cliques = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)) ++
      (for { a <- 10 to 13; b <- 10 to 13 if a < b } yield (a.toLong, b.toLong))
    val g2 = run(cliques, localMaxEdges = 0L)
    assert(g2.filter(_._1 < 10).values.toSet == Set(0L))
    assert(g2.filter(_._1 >= 10).values.toSet == Set(10L))
  }

  private def pr(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
      iters: Int, localMaxEdges: Long = 4L << 20): Map[Long, Long] =
    Graph.pagerankInt(edges.toDF("src", "dst", "w"),
        nodes.toDF("id"), iters, localMaxEdges = localMaxEdges)
      .as[(Long, Long)].collect().toMap

  test("pagerankInt: hand-computed fixed-point values on a 3-node graph") {
    // A=1→B=2, B→A, C=3→A; nothing points to C
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val r1 = pr(edges, Seq(1L, 2L, 3L), iters = 1)
    // prA = 0.15e9 + 85*(1e9 + 1e9) div 100; prB keeps exactly 1e9;
    // prC = teleport only
    assert(r1 == Map(1L -> 1850000000L, 2L -> 1000000000L, 3L -> 150000000L))
    // the forced distributed iteration is bit-identical to the fast path
    assert(pr(edges, Seq(1L, 2L, 3L), iters = 1, localMaxEdges = 0L) == r1)
    // a symmetric 2-cycle is the fixpoint 1e9 at every iteration count
    val cyc = Seq((1L, 2L, 3L), (2L, 1L, 3L))
    for (k <- Seq(1, 4))
      assert(pr(cyc, Seq(1L, 2L), k) == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("pagerankInt fast path equals the distributed iteration on a random weighted graph") {
    val rnd = new Random(99)
    val n = 30
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        (rnd.nextInt(9) + 1).toLong))
      .filter(e => e._1 != e._2).distinct
    val nodes = (0L until n.toLong)
    assert(pr(edges, nodes, iters = 4) ==
      pr(edges, nodes, iters = 4, localMaxEdges = 0L))
  }

  test("pagerankInt is invariant to uniform weight scaling (floor((7a)/(7b)) = floor(a/b))") {
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 5L), (2L, 1L, 1L), (3L, 1L, 4L), (3L, 2L, 1L))
    val nodes = Seq(1L, 2L, 3L)
    val base = pr(edges, nodes, iters = 5)
    val scaled = pr(edges.map { case (s, d, w) => (s, d, w * 7L) }, nodes, iters = 5)
    assert(base == scaled)
    // mass decays (floor residue + no dangling redistribution), never grows
    assert(base.values.sum <= 3L * 1000000000L)
  }
}
