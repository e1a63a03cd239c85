package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Relational.fuzzyMatchNames]]'s blocking semantics — including
  * the deliberate recall trade a gate over real data can't isolate: a
  * close pair split across blocks is NEVER compared. */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("in-block pairs match by edit distance; cross-block near-pairs are deliberately missed") {
    val names = Seq(
      ("cat ring", 5L), ("cat ding", 3L), // in-block, dist 1 -> matched
      ("cat gearbox", 2L), // in-block but dist > 3 -> not matched
      ("bat ring", 7L), // dist 1 from "cat ring" but different block -> missed
      ("dog bolt", 1L)) // lone block
      .toDF("name", "n")
    val got = Relational.fuzzyMatchNames(names, "name", "n", maxDist = 3)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(("cat ding", "cat ring", 1L, 3L, 5L)),
      s"expected exactly the in-block near pair, got $got")
  }

  test("ties and ordering: name1 < name2 always; counts ride along unswapped") {
    val names = Seq(("z a", 1L), ("z b", 2L), ("z c", 3L)).toDF("name", "n")
    val got = Relational.fuzzyMatchNames(names, "name", "n", maxDist = 1)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("z a", "z b", 1L, 1L, 2L),
      ("z a", "z c", 1L, 1L, 3L),
      ("z b", "z c", 1L, 2L, 3L)))
  }
}
