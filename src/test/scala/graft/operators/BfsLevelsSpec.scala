package graft.operators

import graft.SparkSpec

/** bfsLevels on a hand graph: chain with a shortcut and a cycle must get
  * true shortest levels, disconnected nodes stay null, and the round
  * budget honestly truncates the frontier. */
class BfsLevelsSpec extends SparkSpec {
  import spark.implicits._

  //  0→1→2→3→4  with shortcut 0→2 and back-edge 3→0 (cycle); 9 isolated
  private val edges = Seq(
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L), (3L, 0L))
    .toDF("src", "dst")
  private val nodes = Seq(0L, 1L, 2L, 3L, 4L, 9L).toDF("id")

  private def levels(iters: Int, localMaxEdges: Long = 4L << 20): Map[Long, Option[Long]] =
    Graph.bfsLevels(edges, nodes, src = 0L, iters = iters,
        localMaxEdges = localMaxEdges)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("shortest levels with shortcut and cycle; unreached stays null") {
    val expected = Map(
      0L -> Some(0L), 1L -> Some(1L), 2L -> Some(1L), // via the 0→2 shortcut
      3L -> Some(2L), 4L -> Some(3L), 9L -> None)
    assert(levels(6) == expected) // single-task fast path
    assert(levels(6, localMaxEdges = 0L) == expected) // forced iteration
  }

  test("a fixed round budget truncates the frontier honestly") {
    val expected = Map(
      0L -> Some(0L), 1L -> Some(1L), 2L -> Some(1L),
      3L -> Some(2L), 4L -> None, 9L -> None)
    assert(levels(2) == expected)
    assert(levels(2, localMaxEdges = 0L) == expected)
  }
}
