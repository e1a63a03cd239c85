package graft.queries

import graft.SparkSpec

/** d10's canonical selection on constructed clusters: quality ranks the
  * survivor, equal quality falls back to the lowest doc_id, and the dropped
  * token mass counts every non-survivor. */
class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  // 40 distinct filler tokens -> high type-token ratio; repeating one token
  // lowers n_distinct and with it the quality blend, deterministically
  private def doc(rep: Int, distinct: Int): String =
    ((0 until distinct).map(i => s"w$i") ++ Seq.fill(rep)("w0")).mkString(" ")

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def members(rows: (Long, Long)*) =
    rows.toDF("doc_id", "cluster")

  test("higher quality survives regardless of doc_id order") {
    // doc 7: 40 distinct tokens; doc 3: same length, 20 repeated -> lower ttr
    val out = TextQueries.survivorshipFrom(
      members((3L, 3L), (7L, 3L)),
      docs((3L, doc(20, 20)), (7L, doc(0, 40))))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("survivor_id") == 7L)
    assert(r.getAs[Long]("n_members") == 2L)
    assert(r.getAs[Long]("tokens_dropped") == 40L) // doc 3's 40 tokens
  }

  test("equal quality ties break to the lowest doc_id") {
    val same = doc(0, 40)
    val out = TextQueries.survivorshipFrom(
      members((9L, 5L), (5L, 5L), (12L, 5L)),
      docs((9L, same), (5L, same), (12L, same)))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("survivor_id") == 5L)
    assert(out.head.getAs[Long]("n_members") == 3L)
    assert(out.head.getAs[Long]("tokens_dropped") == 80L)
  }

  test("clusters select independently") {
    val out = TextQueries.survivorshipFrom(
      members((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)),
      docs((1L, doc(0, 40)), (2L, doc(30, 10)),
        (10L, doc(35, 5)), (11L, doc(0, 40))))
      .collect().map(r => r.getAs[Long]("cluster") -> r).toMap
    assert(out(1L).getAs[Long]("survivor_id") == 1L)
    assert(out(10L).getAs[Long]("survivor_id") == 11L)
  }
}
