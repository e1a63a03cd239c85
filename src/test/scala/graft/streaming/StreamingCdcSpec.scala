package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

/** Streaming twin of x16's CDC merge: the changelog streams through
  * [[StatefulOps.latestByKey]] — per-key compaction as running state,
  * the KTable semantic — and the apply join runs AT READ against the
  * snapshot with the exact batch operator. On every fed prefix the
  * merged result must equal batch `cdcApply` over the same prefix:
  * streamed state IS the compaction half of the MERGE, so a deployment
  * keeps only (key → latest change) state and applies on serve. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    ("a", 10.0), ("b", 20.0), ("c", 30.0))
    .toDF("key", "val")

  // Keyed.seq carries the (seq, seq2) order as a composite; value is
  // "op:newval". Batch 2 stales-out nothing from batch 1 except b.
  private val batch1 = Seq(
    Keyed("b", 51L, "upsert:21.0"),
    Keyed("c", 52L, "delete:0.0"),
    Keyed("d", 53L, "upsert:40.0"))
  private val batch2 = Seq(
    Keyed("b", 91L, "upsert:22.0"),   // later change to b wins
    Keyed("d", 41L, "delete:0.0"))    // STALE delete — must not undo d

  private def asChanges(rows: Seq[Keyed[String]]) =
    rows.map { k =>
      val Array(op, nv) = k.value.split(":")
      (k.key, k.seq, 0L, op, nv.toDouble)
    }.toDF("key", "seq", "seq2", "op", "newval")

  private def merged(changes: org.apache.spark.sql.DataFrame): Set[(String, Double, String)] =
    Relational.cdcApply(snapshot, changes)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet

  test("streamed compaction + apply-at-read equals batch merge per prefix") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed[String]]
    val q = StatefulOps.latestByKey(in.toDS())
      .writeStream.format("memory").queryName("cdc_state")
      .outputMode("update").start()
    try {
      for ((batch, prefix) <- Seq(
          (batch1, batch1), (batch2, batch1 ++ batch2))) {
        in.addData(batch: _*)
        q.processAllAvailable()
        // the serving read: latest emitted compaction per key (seq max —
        // update mode re-emits, the upsert store keeps the last write)
        val compacted = spark.table("cdc_state")
          .groupBy(col("key"))
          .agg(max(struct(col("seq"), col("value"))).as("c"))
          .select(col("key"), col("c.seq").as("seq"), col("c.value").as("value"))
          .as[Keyed[String]].collect().toSeq
        assert(merged(asChanges(compacted)) == merged(asChanges(prefix)),
          s"prefix of ${prefix.size} diverged")
      }
      // the final state must reflect the STALE delete being ignored
      assert(merged(asChanges(batch1 ++ batch2)) == Set(
        ("a", 10.0, "kept"), ("b", 22.0, "updated"), ("d", 40.0, "inserted")))
    } finally q.stop()
  }
}
