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
}
