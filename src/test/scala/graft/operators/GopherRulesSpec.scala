package graft.operators

import graft.SparkSpec

/** Pins [[TextOps.gopherRules]] on hand-computable docs: exact mean word
  * length, duplicate-2-gram fraction (including total repetition and the
  * one-token degenerate case), and each rule flag's boundary. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(text: String) =
    TextOps.gopherRules(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      minTokens = 4, mwlLo = 2.0, mwlHi = 4.0, maxDup2 = 0.5, minStop = 1)
      .select($"n_tokens", $"mwl", $"dup2_frac", $"sw_hits", $"keep")
      .as[(Long, Double, Double, Long, Boolean)].head()

  test("mean word length and dup-2-gram fraction are exact") {
    // tokens: the(3) cat(3) sat(3) the(3) cat(3) -> mwl 3.0
    // 2-grams: "the cat","cat sat","sat the","the cat" -> 1 dup of 4 = 0.25
    assert(rules("the cat sat the cat") == ((5L, 3.0, 0.25, 2L, true)))
  }

  test("fully repeated text maxes the dup fraction and fails ok_rep") {
    val (n, _, dup2, _, keep) = rules("ab ab ab ab ab")
    assert(n == 5L && dup2 == 0.75 && !keep) // 4 bigrams, 1 distinct -> 3/4
  }

  test("single-token doc has zero 2-grams and dup fraction 0") {
    val (n, mwl, dup2, _, _) = rules("the")
    assert(n == 1L && mwl == 3.0 && dup2 == 0.0)
  }

  test("each flag gates independently") {
    val df = TextOps.gopherRules(
      Seq((1L, "the a of and to in is the")).toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 99)
    val r = df.select($"ok_len", $"ok_stop").as[(Boolean, Boolean)].head()
    assert(r == ((false, true)))
  }
}
