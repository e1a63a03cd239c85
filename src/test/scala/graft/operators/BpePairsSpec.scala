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

  test("iterated training: merge, re-count, and merge merged symbols") {
    // tokens: aaab, aaab, ab
    //   round 1: aa=4, ab=3            -> merge "aa" = U+E000 (call it A)
    //   tokens become Aab, Aab, ab
    //   round 2: Aa=2, ab=3            -> merge "ab" = U+E001 (call it B)
    //   tokens become AB, AB, B
    //   round 3: AB=2                  -> merge "AB" (two sentinels!)
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainMerges(docs, "text", 3)
      .orderBy(col("iter")).as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "aa", 4L), (2, "ab", 3L), (3, "", 2L)))
  }

  test("segment stats: the merge fold reproduces training's rewrites per document") {
    // same corpus as the iterated-training golden: merges are
    //   round 1 "aa"→A, round 2 "ab"→B, round 3 "AB"→C
    // doc 1 "aaab aaab": raw 8 chars; "aaab"→"Aab"→"AB"→"C" = 1 symbol
    //   per token → n_symbols 2, ratio 8/2 = 4.0
    // doc 2 "ab": raw 2; "ab"→"B" → 1 symbol, ratio 2.0
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextOps.bpeSegmentStats(docs, "text", 3)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 8L, 2L, 6L, 4.0), (2L, 2L, 1L, 1L, 2.0)))
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // "aaaa" under merge "aa" must become two sentinels (never three
    // overlapping matches); "aaa" becomes sentinel + trailing 'a'
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainMerges(docs, "text", 2)
      .orderBy(col("iter")).as[(Int, String, Long)].collect().toSeq
    // round 1: pairs aa=3+2 -> merge "aa"; tokens: E000 E000, E000 a
    // round 2: pairs (E000,E000)=1 and (E000,a)=1 tie -> pair asc picks
    //   E000+'a' ('a' = U+0061 sorts below U+E000; UTF-8 byte order ==
    //   codepoint order on both engines)
    assert(got == Seq((1, "aa", 5L), (2, "a", 1L)))
  }
}
