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

  /** Frame-sampling fan-out per video payload: explode frames (64-char
    * windows standing in for keyframe grabs), then re-aggregate counts and
    * byte totals per asset — gating the explode path of the multimodal
    * pipeline (one Generate, no shuffle before the re-aggregation). The
    * oracle recomputes both in closed form (ceil-division frame count,
    * total payload bytes). */
  def m2FrameExplode(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleStub(Multimodal.mediaFromDocuments(s, d), stride = 64)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("frame_bytes_total"))
      .orderBy(col("media_id"))
}
