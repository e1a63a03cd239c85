package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("mediaFromDocuments builds a typed binary-payload table") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val rows = media.limit(5).collect()
    assert(rows.forall(r => r.payload.nonEmpty && r.n_bytes == r.payload.length))
    assert(rows.forall(r => Set("image", "audio", "video")(r.kind)))
  }

  test("decodeStub is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val f1 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.feature.forall(v => v >= -1.0f && v < 1.0f)))
    // images carry no duration; audio is stereo
    assert(f1.filter(_.kind == "image").forall(_.duration_ms == 0))
    assert(f1.filter(_.kind == "audio").forall(_.channels == 2))
  }

  test("mediaProfile never reads the payload column (column pruning)") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val plan = Multimodal.mediaProfile(media).queryExecution.executedPlan.toString
    // the parquet ReadSchema must not include the text→payload source column
    assert(!plan.contains("payload"), s"payload column not pruned:\n$plan")
    val out = Multimodal.mediaProfile(media).collect()
    assert(out.length == 3)
  }

  test("nearestMedia: binary → decode stub → ANN end-to-end") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val nn = Multimodal.nearestMedia(media, Seq(0L, 1L), 3)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect()
    assert(nn.length == 6)
    assert(nn.forall { case (q, n, _) => q != n })
    assert(nn.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2, 3)))
  }

  test("frameSampleStub round-trips non-UTF-8 payloads byte-exactly") {
    // real media bytes are NOT valid UTF-8 — 0xFF/0x80/0x00 sequences would
    // be mangled by any cast-to-string slicing. 150 bytes at stride 64 →
    // frames of 64 + 64 + 22 bytes reassembling to the exact input.
    val payload = Array.tabulate(150)(i => ((i * 37 + 255) % 256).toByte)
    val media = Seq(MediaRecord(1L, "video", payload, "test", payload.length.toLong))
      .toDS()
    val frames = Multimodal.frameSampleStub(media, stride = 64)
      .orderBy("frame_no")
      .select("frame_no", "frame_bytes")
      .as[(Int, Array[Byte])].collect()
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2))
    assert(frames.map(_._2.length).toSeq == Seq(64, 64, 22))
    assert(frames.flatMap(_._2).toSeq == payload.toSeq)
    // stride-aligned payload: no trailing empty frame
    val aligned = Seq(MediaRecord(2L, "video", payload.take(128), "test", 128L)).toDS()
    val af = Multimodal.frameSampleStub(aligned, stride = 64)
      .select("frame_bytes").as[Array[Byte]].collect()
    assert(af.map(_.length).toSeq == Seq(64, 64))
    assert(af.flatten.toSeq == payload.take(128).toSeq)
  }

  test("frameSampleStub emits per-frame rows for video only") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.frameSampleStub(media, stride = 64)
    val kinds = frames.join(media.toDF(), "media_id").select("kind").distinct()
      .as[String].collect().toSeq
    assert(kinds == Seq("video"))
    assert(frames.count() > 0)
  }
}
