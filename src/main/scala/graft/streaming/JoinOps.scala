package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins and streaming dedup — the watermark-bounded state
  * patterns the reference never needed (its dimensions were KTables and its
  * state global-over-all-time) but any 100 TB streaming deployment does.
  *
  * Both operators bound their state with watermarks: a stream-stream join
  * buffers each side only until the watermark says no counterpart can still
  * arrive; streaming dedup keeps a key's fingerprint only within the
  * watermark horizon. Unbounded variants exist (drop the watermark) with
  * the reference's grow-forever semantics.
  */
object JoinOps {

  /** Stream-stream inner equi-join with an event-time proximity bound:
    * left ⋈ right on `keys`, accepting matches whose right timestamp lies
    * in [leftTs − tolerance, leftTs + tolerance]. The time bound is what
    * makes the state PRUNABLE: each side buffers `tolerance + watermark` of
    * data and the state store evicts the rest — without it, both sides
    * buffer forever.
    *
    * Column convention: `leftTs`/`rightTs` are event-time timestamp columns
    * (already watermarked by this operator; callers pass raw frames).
    */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val rangeCond =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $tolerance") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $tolerance")
    l.join(r, keyCond && rangeCond, "inner")
  }

  /** Streaming exact dedup by fingerprint columns: first occurrence wins,
    * duplicates arriving within the watermark horizon are dropped. State =
    * one entry per distinct fingerprint seen inside the horizon — the
    * streaming twin of [[graft.operators.TextOps.exactDedup]]. Late
    * duplicates beyond the watermark are the documented trade (they pass
    * through; a periodic batch dedup sweep catches them — the standard
    * lambda repair for streaming dedup at scale). */
  def dedupWithinWatermark(
      stream: DataFrame, tsCol: String, fingerprintCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(fingerprintCols)
}
