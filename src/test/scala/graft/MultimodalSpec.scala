package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.multimodal.Multimodal

/** Binary/multimodal plumbing: format sniffing, metadata profile, and
  * the per-partition feature-extraction pipeline (stub decoder). */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def pngBytes(payload: String): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++ payload.getBytes
  private def jpegBytes(payload: String): Array[Byte] =
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++ payload.getBytes
  private def wavBytes(payload: String): Array[Byte] =
    "RIFF".getBytes ++ Array[Byte](1, 2, 3, 4) ++ "WAVE".getBytes ++ payload.getBytes
  private def mp4Bytes(payload: String): Array[Byte] =
    Array[Byte](0, 0, 0, 0x18) ++ "ftypmp42".getBytes ++ payload.getBytes

  private lazy val mediaDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, pngBytes("imagedata-1")),
      (2L, jpegBytes("photo-2")),
      (3L, wavBytes("audio-3")),
      (4L, mp4Bytes("video-4")),
      (5L, "garbage-bytes".getBytes)
    ).toDF("media_id", "content")
  }

  test("sniffFormat identifies magic bytes, unknown otherwise") {
    val out = mediaDf.select(col("media_id"), Multimodal.sniffFormat(col("content")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "png", 2L -> "jpeg", 3L -> "wav", 4L -> "mp4", 5L -> "unknown")
  }

  test("binaryMetadata groups size stats by sniffed format") {
    val rows = Multimodal.binaryMetadata(mediaDf, "content").collect()
      .map(r => r.getAs[String]("format") -> r.getAs[Long]("n_files")).toMap
    rows.keySet shouldBe Set("png", "jpeg", "wav", "mp4", "unknown")
    rows.values.sum shouldBe 5L
    val png = Multimodal.binaryMetadata(mediaDf, "content")
      .filter(col("format") === "png").head()
    png.getAs[Long]("min_bytes") shouldBe (8 + "imagedata-1".length).toLong
  }

  test("extractFeatures passes string/UUID ids through with their type") {
    val s = spark
    import s.implicits._
    val stringIds = Seq(
      ("a-1", pngBytes("imagedata-1")),
      ("b95b8c15-0a9f-4d5e-9f5e-2b8c15f0a9f4", jpegBytes("photo-2"))
    ).toDF("media_id", "content")
    val out = Multimodal.extractFeatures(stringIds, "media_id", "content")
    out.schema("id").dataType shouldBe org.apache.spark.sql.types.StringType
    out.select("id").collect().map(_.getString(0)).sorted shouldBe
      Array("a-1", "b95b8c15-0a9f-4d5e-9f5e-2b8c15f0a9f4")
  }

  test("extractFeatures: declared schema, one row per input, deterministic") {
    val f1 = Multimodal.extractFeatures(mediaDf, "media_id", "content")
    f1.columns shouldBe Array("id", "format", "width", "height", "n_frames", "embedding")
    val rows = f1.orderBy("id").collect()
    rows should have length 5
    // Stub decode is deterministic: a second run is bit-identical.
    val rows2 = Multimodal.extractFeatures(mediaDf, "media_id", "content")
      .orderBy("id").collect()
    rows.map(_.toSeq.toString) shouldBe rows2.map(_.toSeq.toString)
    // Plausible media dimensions and a fixed-width embedding.
    all(rows.map(_.getAs[Int]("width"))) should (be >= 16 and be < 4096)
    all(rows.map(_.getSeq[Float](5).length)) shouldBe 16
  }

  test("extractFeatures: only video formats get multiple frames") {
    val byId = Multimodal.extractFeatures(mediaDf, "media_id", "content")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("n_frames")).toMap
    byId(4L) should be > 1 // mp4
    byId(1L) shouldBe 1 // png
    byId(3L) shouldBe 1 // wav
  }

  test("sampleFramePlan emits evenly spaced frame indices for videos only") {
    val features = Multimodal.extractFeatures(mediaDf, "media_id", "content")
    val plan = Multimodal.sampleFramePlan(features, n = 4).collect()
    plan.map(_.getAs[Long]("id")).distinct shouldBe Array(4L)
    val idx = plan.map(_.getAs[Long]("frame_index"))
    idx.head shouldBe 0L
    idx shouldBe idx.sorted
  }

  test("resizePlan fits into the box preserving aspect, never upscales") {
    val s = spark
    import s.implicits._
    val features = Seq(
      (1L, "png", 4096, 2048),  // downscale, width-bound
      (2L, "jpeg", 100, 4000),  // downscale, height-bound
      (3L, "png", 100, 50),     // already fits: untouched
      (4L, "jpeg", 3, 4000))    // extreme aspect: clamps to >= 1
      .toDF("id", "format", "width", "height")
    val out = Multimodal.resizePlan(features, 512, 512)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("out_width"), r.getAs[Int]("out_height")))).toMap
    out(1L) shouldBe ((512, 256))
    out(2L) shouldBe ((13, 512))
    out(3L) shouldBe ((100, 50))
    out(4L) shouldBe ((1, 512))
  }

  test("a custom decoder plugs in without touching the plumbing") {
    object ConstDecoder extends Multimodal.BinaryDecoder {
      def decode(format: String, bytes: Array[Byte]): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(format, 100, 100, 1, Array.fill(16)(0.5f))
    }
    val rows = Multimodal.extractFeatures(mediaDf, "media_id", "content", ConstDecoder)
      .select("width").distinct().collect()
    rows.map(_.getInt(0)) shouldBe Array(100)
  }
}
