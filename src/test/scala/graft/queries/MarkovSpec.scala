package graft.queries

import graft.SparkSpec

/** x13's transition matrix on hand-computed paths: the per-user sequencing,
  * the (ts, event_id) tie-break, and the row normalization must match the
  * values you get with a pencil. */
class MarkovSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, event_type, ts_us)
  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "event_id", "event_type", "ts_us")

  test("hand-computed two-user paths") {
    // user 1 path: A -> B -> A   (transitions A->B, B->A)
    // user 2 path: B -> A        (transition  B->A)
    val out = RelationalQueries.markovFrom(ev(
      (1L, 10L, "A", 100L), (1L, 11L, "B", 200L), (1L, 12L, "A", 300L),
      (2L, 20L, "B", 100L), (2L, 21L, "A", 200L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("A", "B"), ("B", "A")))
    assert(out(("A", "B")).getAs[Long]("n_trans") == 1L)
    assert(out(("A", "B")).getAs[Long]("n_src") == 1L)
    assert(out(("A", "B")).getAs[Double]("prob") == 1.0)
    assert(out(("B", "A")).getAs[Long]("n_trans") == 2L)
    assert(out(("B", "A")).getAs[Double]("prob") == 1.0)
  }

  test("row normalization sums each src row to 1 over a branching state") {
    // from A: 3 transitions, 2 to B, 1 to C -> P = 0.6667 / 0.3333
    val out = RelationalQueries.markovFrom(ev(
      (1L, 1L, "A", 1L), (1L, 2L, "B", 2L),
      (2L, 3L, "A", 1L), (2L, 4L, "B", 2L),
      (3L, 5L, "A", 1L), (3L, 6L, "C", 2L)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("A", "B")).getAs[Double]("prob") == 0.6667)
    assert(out(("A", "C")).getAs[Double]("prob") == 0.3333)
    assert(out(("A", "B")).getAs[Long]("n_src") == 3L)
  }

  test("same-timestamp events order by event_id (the determinism tie-break)") {
    // both events at ts 100: event_id 5 ("A") precedes event_id 6 ("B")
    val out = RelationalQueries.markovFrom(ev(
      (1L, 5L, "A", 100L), (1L, 6L, "B", 100L)))
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "A" && out.head.getString(1) == "B")
  }

  test("users never chain across each other; single-event users emit nothing") {
    val out = RelationalQueries.markovFrom(ev(
      (1L, 1L, "A", 100L), (2L, 2L, "B", 200L)))
      .collect()
    assert(out.isEmpty)
  }
}
