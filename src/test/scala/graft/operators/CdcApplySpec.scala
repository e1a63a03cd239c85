package graft.operators

import graft.SparkSpec

/** cdcApply's MERGE semantics on a hand-built snapshot + changelog:
  * every outcome path (kept / updated / inserted / deleted /
  * delete-of-absent no-op) plus latest-wins compaction independent of
  * input order. The x16 gate's events feed never produces an insert
  * (user 0's last change is a tombstone), so the insert path is pinned
  * here. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    .toDF("key", "val")

  // deliberately fed out of order: per-key latest is (seq, seq2) max
  private val changes = Seq(
    (2L, 5L, 1L, "upsert", 21.0),   // stale — overridden below
    (2L, 9L, 1L, "upsert", 22.0),   // latest for key 2 → updated
    (3L, 7L, 2L, "delete", 0.0),    // stale delete …
    (3L, 7L, 5L, "upsert", 33.0),   // … same seq, higher seq2 wins → updated
    (4L, 8L, 1L, "delete", 0.0),    // latest for key 4 → deleted
    (5L, 6L, 1L, "upsert", 50.0),   // absent from snapshot → inserted
    (6L, 6L, 1L, "delete", 0.0))    // delete of absent key → no row
    .toDF("key", "seq", "seq2", "op", "newval")

  test("merge applies latest-wins upserts, deletes, and inserts") {
    val got = Relational.cdcApply(snapshot, changes)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val want = Set(
      (1L, 10.0, "kept"),
      (2L, 22.0, "updated"),
      (3L, 33.0, "updated"),
      (5L, 50.0, "inserted"))
    assert(got == want, s"got $got")
  }

  test("compaction is input-order independent") {
    val shuffled = changes.orderBy(org.apache.spark.sql.functions.rand(42))
    val a = Relational.cdcApply(snapshot, changes)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val b = Relational.cdcApply(snapshot, shuffled)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(a == b)
  }
}
