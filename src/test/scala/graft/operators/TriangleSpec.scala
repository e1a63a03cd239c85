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
}
