package graft.operators

import graft.SparkSpec

/** Pins [[TextOps.chunkTokens]] boundary semantics: tail-covering chunk
  * counts, exact window offsets/overlap, end clipping, and full coverage. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private def chunks(n: Int): Seq[(Int, Long, Long)] =
    TextOps.chunkTokens(doc(n), "doc_id", "text", chunkSize = 32, overlap = 8)
      .orderBy($"chunk_no")
      .select($"chunk_no", $"start_tok", $"n_tokens")
      .as[(Int, Long, Long)].collect().toSeq

  test("chunk boundaries: exact fit, one-over, stride-aligned tail, short doc") {
    assert(chunks(32) == Seq((0, 1L, 32L)))
    assert(chunks(33) == Seq((0, 1L, 32L), (1, 25L, 9L)))
    assert(chunks(56) == Seq((0, 1L, 32L), (1, 25L, 32L)))
    assert(chunks(57) == Seq((0, 1L, 32L), (1, 25L, 32L), (2, 49L, 9L)))
    assert(chunks(10) == Seq((0, 1L, 10L)))
  }

  test("chunks cover every token and overlap by exactly `overlap` when full") {
    for (n <- Seq(32, 33, 70, 99)) {
      val cs = chunks(n)
      val covered = cs.flatMap { case (_, s, len) => s until (s + len) }.toSet
      assert(covered == (1L to n.toLong).toSet, s"n=$n coverage hole")
      cs.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) if l1 == 32L =>
          assert(s1 + 32 - s2 == 8L, s"n=$n overlap wrong between $s1 and $s2")
        case _ => ()
      }
    }
  }

  test("chunk content hash is the window's space-joined tokens") {
    val got = TextOps.chunkTokens(doc(33), "doc_id", "text", 32, 8)
      .orderBy($"chunk_no").select($"chunk_md5").as[String].collect()
    def md5(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s.getBytes("UTF-8"))
    assert(got(0) == md5((1 to 32).map(i => s"w$i").mkString(" ")))
    assert(got(1) == md5((25 to 33).map(i => s"w$i").mkString(" ")))
  }
}
