package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payloads + typed metadata
  * ([[graft.operators.Multimodal]]). The payload corpus derives
  * deterministically from `documents` (text bytes as opaque media), so the
  * binary plumbing — byte lengths, digests, head-byte hex, frame math — is
  * oracle-checkable even though this container ships no codecs.
  */
object MultimodalQueries {

  /** Ingest-manifest metadata per payload: exact bytes, md5, first 8 bytes
    * hex, 256-byte frame count. Column expressions over binary — runs at
    * scan speed, no decode. */
  def m1PayloadMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.payloadMeta(Multimodal.mediaFromDocuments(s, d))
      .withColumnRenamed("media_id", "doc_id")
      .orderBy(col("doc_id"))

  /** Frame-sampling fan-out per video payload: explode frames (64-BYTE
    * windows cut on the binary payload, standing in for keyframe grabs),
    * then re-aggregate counts and byte totals per asset — gating the
    * explode path of the multimodal pipeline (one Generate, no shuffle
    * before the re-aggregation). The oracle recomputes both in closed form
    * (ceil-division frame count, total payload bytes). */
  def m2FrameExplode(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleStub(Multimodal.mediaFromDocuments(s, d), stride = 64)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("frame_bytes_total"))
      .orderBy(col("media_id"))

  /** The decode/feature-extract path itself under the oracle: every scalar
    * the stub decoder emits, plus a fingerprint of the 16-dim feature
    * vector. The decoder seeds from md5(payload), so DuckDB recomputes the
    * identical integers from the raw text; the feature floats are x/2^15−1
    * for 16-bit x (exact in Float), so round((f+1)·2^15) recovers x
    * losslessly and both engines fingerprint the same ','-joined integer
    * string. This is the real mapPartitions decode running under a hash
    * gate — only the codec call inside it is fake. */
  def m3DecodeFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeStub(Multimodal.mediaFromDocuments(s, d)).toDF()
      .select(
        col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("channels"),
        md5(concat_ws(",",
          transform(col("feature"), f =>
            round((f.cast("double") + 1.0d) * 32768.0d).cast("int").cast("string"))))
          .as("feat_fp"))
      .orderBy(col("media_id"))
}
