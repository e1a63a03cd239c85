package graft.queries

import graft.SparkSpec

/** The session-fixture contract ([[SessionMemo]], via [[Dedup]] /
  * [[Models]]): build ONCE per (SparkContext, dataset dir, tag), and keep
  * datasets strictly isolated — a fixture trained on one scale factor must
  * never be served for another, or every downstream gate silently computes
  * against the wrong corpus. This spec pins both halves with the live
  * dedup fixtures on two real dataset dirs in one session.
  */
class SessionMemoSpec extends SparkSpec {

  private val small = "/root/testdata/sf0.001"
  private val big = "/root/testdata/sf0.01"

  test("same (dataset, tag) memo-hits the identical frame instance") {
    val a = Dedup.canonDocs(spark, small)
    val b = Dedup.canonDocs(spark, small)
    assert(a eq b,
      "second call rebuilt the fixture — the memo must hand back the same frame")
  }

  test("different dataset dirs get independent fixtures") {
    val a = Dedup.canonDocs(spark, small)
    val b = Dedup.canonDocs(spark, big)
    assert(!(a eq b), "sf0.001 and sf0.01 shared one fixture instance")
    // each fixture must match a fresh (memo-free) derivation from its own
    // parquet — the generator ships 500 documents at BOTH these scales
    // (and zero shared texts), so the distinguishing check is CONTENT:
    // the fingerprint set of each served fixture equals its own dataset's
    // and differs from the other's
    import org.apache.spark.sql.functions.{col, md5}
    def fps(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(md5(col("text").cast("binary")).as("fp"))
        .collect().map(_.getString(0)).toSet
    val (fa, fb) = (fps(a), fps(b))
    assert(fa != fb, "the two datasets' fixtures serve identical content")
    assert(fa == fps(graft.operators.TextOps.canonicalDocs(
        graft.Tables.documents(spark, small), "doc_id", "text")),
      "sf0.001 fixture content drifted from a fresh derivation")
    assert(fb == fps(graft.operators.TextOps.canonicalDocs(
        graft.Tables.documents(spark, big), "doc_id", "text")),
      "sf0.01 fixture content drifted from a fresh derivation")
  }

  test("downstream fixtures chain within their own dataset") {
    // components is the end of the memo chain (canon -> shingles -> pairs
    // -> components); every id it labels must be a canonical doc of the
    // SAME dataset
    val comp = Dedup.components(spark, small)
    val canonIds = Dedup.canonDocs(spark, small)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val compIds = comp.select("id").collect().map(_.getLong(0)).toSet
    assert(compIds.subsetOf(canonIds),
      "component labels reference ids outside the dataset's canonical docs")
  }
}
