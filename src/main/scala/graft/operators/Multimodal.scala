package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset as carried through the pipeline: opaque bytes + typed
  * metadata. At 100 TB the payload column dominates storage — everything
  * here is written so Parquet column pruning can drop `payload` whenever a
  * stage only needs metadata. */
final case class MediaRecord(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    source: String,
    n_bytes: Long)

/** Decoded-media features (the output shape of a real decoder). */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    duration_ms: Long,
    channels: Int,
    feature: Array[Float])

/** Multimodal-column operators: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features from the payload bytes.
  * Everything AROUND the stub is the real pipeline shape:
  *   - binary payload column + pruned metadata columns,
  *   - `mapPartitions` batch processing (one decoder init per partition —
  *     the Scala analog of `mapInPandas` batch semantics: amortize model /
  *     codec setup across a partition, stream records through it),
  *   - explicit repartitioning so decode parallelism is CPU-bound, not
  *     file-layout-bound,
  *   - features flowing straight into the Similarity operators (ANN over
  *     the extracted embedding).
  *
  * Swap `fakeDecode` for a real codec (JNI/FFI) and nothing else changes.
  */
object Multimodal {

  /** Deterministic fake corpus: documents' text bytes as media payloads.
    * Real deployments read `binaryFile` sources or parquet with a binary
    * column; the shape (id, kind, payload, source, n_bytes) is identical. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        col("source"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake in place of a real codec.
    * Derives stable pseudo-features from payload bytes so tests (and the
    * downstream ANN plumbing) are reproducible. The seed is the first 32
    * bits of md5(payload) and everything after it is integer arithmetic, so
    * an external engine can recompute every output from the payload alone —
    * that is what lets the m3 gate hash-verify this path end-to-end. Each
    * feature value is x/2^15 − 1 for a 16-bit x: exact in Float, so the
    * integer x is exactly recoverable downstream. */
  private[operators] def fakeDecode(r: MediaRecord): MediaFeatures = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(r.payload).substring(0, 8), 16)
    val dim = 16
    val feature = Array.tabulate(dim) { i =>
      // stable per-(payload, i) pseudo-value in [-1, 1)
      val x = (h * 31 + i * 2654435761L) % 65536
      (x / 32768.0f) - 1.0f
    }
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      width = (64 + h % 1024).toInt,
      height = (64 + (h / 7) % 1024).toInt,
      duration_ms = if (r.kind == "image") 0L else r.n_bytes * 10,
      channels = if (r.kind == "audio") 2 else 3,
      feature = feature)
  }

  /** Decode + feature-extract over partition batches. One decoder context
    * per partition (`init` once, then stream) — the performance contract a
    * real codec needs. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val par = media.sparkSession.sparkContext.defaultParallelism
    media
      .repartition(par)
      .mapPartitions { batch =>
        // real impl: val codec = Codec.init() — amortized across the batch
        batch.map(fakeDecode)
      }
  }

  /** Frame sampling stub for video payloads: every `stride`-byte window
    * stands in for a frame grab; real impl seeks keyframes. Output stays
    * (media_id, frame_no, frame_bytes) so downstream ops are shape-real.
    *
    * BYTE-TRUE slicing: frame offsets are computed with integer math and
    * cut with `substring` ON THE BINARY column (Spark's substring over
    * BinaryType slices bytes) — no string round-trip. A cast-to-string
    * split would corrupt real media bytes, which are not valid UTF-8; this
    * path reassembles any payload byte-exactly (spec'd with a non-UTF-8
    * payload). The last frame is short when length % stride != 0, exactly
    * like a real container's tail fragment. */
  def frameSampleStub(media: Dataset[MediaRecord], stride: Int = 64): DataFrame = {
    val m = media.toDF()
    m.filter(col("kind") === "video" && length(col("payload")) > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0),
          expr(s"(length(payload) + ${stride - 1}) div $stride").cast("int") - 1))
          .as("frame_no"))
      .select(col("media_id"), col("frame_no"),
        expr(s"substring(payload, frame_no * $stride + 1, $stride)").as("frame_bytes"))
  }

  /** Byte-level payload metadata: exact byte length, content digest, head
    * bytes (hex), and fixed-size frame count — the manifest row a media
    * ingest writes per asset before any decode happens. Pure column
    * expressions over the binary payload (codegen'd; no decode, no UDF), so
    * it runs at scan speed and is the one multimodal stage that needs no
    * stub. `frameBytes` is the fixed frame size the count is quoted in.
    */
  def payloadMeta(media: Dataset[MediaRecord], frameBytes: Int = 256): DataFrame =
    media.toDF()
      .select(
        col("media_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(substring(col("payload"), 1, 8)).as("head8_hex"),
        expr(s"(length(payload) + ${frameBytes - 1}) div $frameBytes")
          .cast("long").as("n_frames"))

  /** Metadata-only profile — demonstrates payload pruning: this plan never
    * reads the binary column (check ReadSchema in explain). */
  def mediaProfile(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("n_bytes")).as("avg_bytes"))

  /** End-to-end: binary payload → decode stub → embedding → brute-force ANN
    * over the extracted features (Similarity reuse). */
  def nearestMedia(media: Dataset[MediaRecord], queryIds: Seq[Long], k: Int): DataFrame = {
    val feats = decodeStub(media).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val queries = feats.filter(col("vec_id").isin(queryIds.map(Long.box): _*))
    Similarity.knnBruteForce(feats, queries, k)
  }
}
