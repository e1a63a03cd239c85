package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextOps.bpePairCounts]] against a naive in-memory reference:
  * pair formation (2-char substrings within whitespace tokens), multi-
  * token and single-char edge cases, and exact corpus-wide counts. */
class BpePairsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(texts: Seq[String]): Map[String, Long] =
    texts
      .flatMap(_.split(" ", -1))
      .flatMap(w => if (w.length < 2) Seq.empty else w.sliding(2).toSeq)
      .groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }

  test("counts every adjacent pair within tokens, never across spaces") {
    val docs = Seq((1L, "abab ab"), (2L, "x yz"), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // "abab" -> ab, ba, ab; "ab" -> ab; "x" too short; "yz" -> yz
    assert(got == Map("ab" -> 3L, "ba" -> 1L, "yz" -> 1L))
    assert(got == naive(Seq("abab ab", "x yz", "")))
  }

  test("equals the naive reference on random multi-token corpora") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcde!?3 " // includes space runs and non-alpha symbols
    val texts = (0 until 50).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val got = TextOps.bpePairCounts(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text").as[(String, Long)].collect().toMap
    assert(got == naive(texts))
  }
}
