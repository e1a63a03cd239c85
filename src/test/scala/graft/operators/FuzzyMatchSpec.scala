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

  test("equals a naive blocked reference on random names") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(31)
    val firsts = Vector("red", "blue", "cold")
    val seconds = Vector("rod", "ring", "bolt", "rd", "ringg")
    val names = (0 until 40).map { _ =>
      s"${firsts(rnd.nextInt(firsts.size))} ${seconds(rnd.nextInt(seconds.size))}"
    }.distinct.map(n => (n, rnd.nextInt(9).toLong + 1))
    val expected = (for {
      (n1, c1) <- names; (n2, c2) <- names
      if n1 < n2 && n1.split(" ")(0) == n2.split(" ")(0)
      d = lev(n1, n2) if d <= 3
    } yield (n1, n2, d.toLong, c1, c2)).toSet
    val got = Relational.fuzzyMatchNames(
      names.toDF("name", "n"), "name", "n", maxDist = 3)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("a hot block (one token owning ~all names) matches the naive blocked reference under salting") {
    // one first token owns nearly the whole dictionary — the skew shape
    // that made the unsalted join put a quadratic block in one task; the
    // salted join must still produce every pair exactly once
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(77)
    val tails = Vector("rod", "ring", "bolt", "rd", "ringg", "rong", "bott")
    val hot = (0 until 60).map(_ => s"the ${tails(rnd.nextInt(tails.size))}${rnd.nextInt(4)}")
    val cold = Seq("lone wolf", "odd duck")
    val names = (hot ++ cold).distinct.map(n => (n, rnd.nextInt(9).toLong + 1))
    val expected = (for {
      (n1, c1) <- names; (n2, c2) <- names
      if n1 < n2 && n1.split(" ")(0) == n2.split(" ")(0)
      d = lev(n1, n2) if d <= 3
    } yield (n1, n2, d.toLong, c1, c2)).toSet
    assert(expected.nonEmpty, "degenerate case: the hot block produced no pairs")
    val got = Relational.fuzzyMatchNames(
      names.toDF("name", "n"), "name", "n", maxDist = 3, saltBuckets = 4)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === expected)
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
