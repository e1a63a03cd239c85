package graft.operators

import graft.SparkSpec

/** Triangle census on pencil-sized graphs: the degree-ordered orientation
  * must count each triangle exactly once, the wedge denominator comes off
  * the degree distribution, and hub-heavy shapes (the orientation's whole
  * point) stay correct. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: (Long, Long)*) =
    Graph.triangleStats(edges.toDF("u", "v")).collect().head

  test("K4: four triangles, clustering coefficient 1") {
    val r = stats((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("gcc") == 1.0)
  }

  test("path graph has wedges but no triangle") {
    val r = stats((1L, 2L), (2L, 3L))
    assert(r.getAs[Long]("n_wedges") == 1L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("gcc") == 0.0)
  }

  test("star hub with one closing edge: exactly one triangle, counted once") {
    // hub 0 (degree 5) + leaves 1..5; closing edge (1,2) makes {0,1,2}
    val r = stats((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (1L, 2L))
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_wedges") == 12L) // C(5,2) at the hub + 1 + 1
    assert(r.getAs[Double]("gcc") == 0.25)
  }

  test("two disjoint triangles count independently") {
    val r = stats((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    assert(r.getAs[Long]("n_triangles") == 2L)
    assert(r.getAs[Long]("n_nodes") == 6L)
  }

  test("single-task fast path equals the distributed plan on random graphs") {
    // every pencil-sized case above runs the fast path; localMaxEdges = 0
    // forces the distributed adjacency-intersection plan — the two must
    // emit identical rows on arbitrary (distinct, canonical u<v) graphs
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 15
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val fast = Graph.triangleStats(edges.toDF("u", "v")).collect().head
      val dist = Graph.triangleStats(edges.toDF("u", "v"), localMaxEdges = 0L)
        .collect().head
      assert(fast == dist, s"trial $trial diverged: fast=$fast dist=$dist")
    }
  }
}
