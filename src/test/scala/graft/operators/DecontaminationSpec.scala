package graft.operators

import graft.SparkSpec

/** Pins [[TextOps.decontaminationPairs]] semantics with a planted-overlap
  * corpus: the threshold is inclusive, counts are over DISTINCT shingles,
  * and a sub-threshold overlap never flags. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("planted overlaps flag at the threshold, not below") {
    // eval doc 100 has exactly 3 trigrams: (q1 q2 q3) (q2 q3 q4) (q3 q4 q5)
    val eval = Seq((100L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val train = Seq(
      1L -> "q1 q2 q3 q4 q5 zz", // shares all 3 eval trigrams → flagged
      2L -> "q1 q2 q3 q4 yy zz", // shares 2 → below threshold
      3L -> "q1 q2 q3 q1 q2 q3", // repeated run: DISTINCT shingles → 1 shared
      4L -> "aa bb cc dd ee ff" // disjoint
    ).toDF("doc_id", "text")
    val got = TextOps.decontaminationPairs(train, eval, "doc_id", "text",
      n = 3, minOverlap = 3)
      .select($"train_id", $"eval_id", $"n_overlap")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 3L)))
    // threshold 1 picks up every sharing doc with its distinct-count
    val loose = TextOps.decontaminationPairs(train, eval, "doc_id", "text",
      n = 3, minOverlap = 1)
      .select($"train_id", $"n_overlap").as[(Long, Long)].collect().toMap
    assert(loose == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }
}
