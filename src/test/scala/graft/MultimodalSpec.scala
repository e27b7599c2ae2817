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
    val f1 = Multimodal.extractFeatures(mediaDf, "media_id", "content", Multimodal.StubDecoder)
    f1.columns shouldBe Array("id", "format", "width", "height", "n_frames",
      "channels", "sample_rate", "embedding")
    val rows = f1.orderBy("id").collect()
    rows should have length 5
    // Stub decode is deterministic: a second run is bit-identical.
    val rows2 = Multimodal.extractFeatures(mediaDf, "media_id", "content", Multimodal.StubDecoder)
      .orderBy("id").collect()
    rows.map(_.toSeq.toString) shouldBe rows2.map(_.toSeq.toString)
    // Plausible media dimensions and a fixed-width embedding.
    all(rows.map(_.getAs[Int]("width"))) should (be >= 16 and be < 4096)
    all(rows.map(_.getSeq[Float](7).length)) shouldBe 16
  }

  test("extractFeatures (stub): only video formats get multiple frames") {
    val byId = Multimodal.extractFeatures(mediaDf, "media_id", "content", Multimodal.StubDecoder)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("n_frames")).toMap
    byId(4L) should be > 1 // mp4
    byId(1L) shouldBe 1 // png
    byId(3L) shouldBe 1 // wav
  }

  // ---- HeaderDecoder: real byte-arithmetic parsing -------------------

  /** PNG signature + IHDR for the given dimensions. */
  private def realPng(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0)
  }

  /** SOI + APP0(JFIF) + SOF0 — the scanner must skip APP0 by length. */
  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      (Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(16) ++
        "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      (Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++ Array[Byte](3))
  }

  /** RIFF/WAVE with a 16-byte fmt chunk and an (undelivered) data size. */
  private def realWav(channels: Int, rate: Int, sampleFrames: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val blockAlign = channels * 2
    "RIFF".getBytes ++ le32(36 + sampleFrames * blockAlign) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      "data".getBytes ++ le32(sampleFrames * blockAlign)
  }

  test("HeaderDecoder parses real PNG/JPEG/GIF/WAV headers, zeros on truncation") {
    val s = spark
    import s.implicits._
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00) // 320×200
    val df = Seq(
      (1L, realPng(640, 480)),
      (2L, realJpeg(600, 400)),
      (3L, realWav(2, 44100, 100)),
      (4L, gif),
      (5L, pngBytes("truncated")), // sniffs png, header incomplete
      (6L, mp4Bytes("video"))) // mp4 with no moov: honest zeros
      .toDF("media_id", "content")
    val rows = Multimodal.extractFeatures(df, "media_id", "content")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    (rows(1L).getAs[Int]("width"), rows(1L).getAs[Int]("height")) shouldBe ((640, 480))
    (rows(2L).getAs[Int]("width"), rows(2L).getAs[Int]("height")) shouldBe ((600, 400))
    rows(3L).getAs[Int]("channels") shouldBe 2
    rows(3L).getAs[Int]("sample_rate") shouldBe 44100
    rows(3L).getAs[Int]("n_frames") shouldBe 100 // data bytes / block align
    (rows(4L).getAs[Int]("width"), rows(4L).getAs[Int]("height")) shouldBe ((320, 200))
    // Truncated header: honest zeros, never fabricated dimensions.
    (rows(5L).getAs[Int]("width"), rows(5L).getAs[Int]("height")) shouldBe ((0, 0))
    // A video container whose header the decoder cannot parse also
    // yields zeros — never pseudo-metadata a user could mistake for
    // real (StubDecoder remains available EXPLICITLY as a plug point).
    (rows(6L).getAs[Int]("width"), rows(6L).getAs[Int]("n_frames")) shouldBe ((0, 0))
  }

  // ---- Video container headers: pure public byte arithmetic ----------

  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def be32a(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32a(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** ftyp + moov(mvhd to skip, audio trak with 0×0 to skip, visual
    * trak) — the walk must skip both before finding the dimensions. */
  private def realMp4(w: Int, h: Int, version: Int = 0): Array[Byte] = {
    def tkhd(tw: Int, th: Int): Array[Byte] = {
      val times = if (version == 1) 32 else 20
      box("tkhd", Array[Byte](version.toByte, 0, 0, 0) ++
        Array.fill[Byte](times)(0) ++ Array.fill[Byte](52)(0) ++
        be16(tw) ++ be16(0) ++ be16(th) ++ be16(0)) // 16.16 fixed point
    }
    val audioTrak = box("trak", tkhd(0, 0))
    val videoTrak = box("trak", tkhd(w, h))
    val mvhd = box("mvhd", Array.fill[Byte](100)(0))
    box("ftyp", "isom".getBytes ++ be32a(0x200)) ++
      box("moov", mvhd ++ audioTrak ++ videoTrak)
  }

  /** EBML header + Segment(Info to skip, Tracks → audio TrackEntry
    * without Video → video TrackEntry with PixelWidth/PixelHeight). */
  private def realMkv(w: Int, h: Int): Array[Byte] = {
    def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      idBytes ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    val video = el(Array(0xE0.toByte),
      el(Array(0xB0.toByte), be16(w)) ++ el(Array(0xBA.toByte), be16(h)))
    val audioEntry = el(Array(0xAE.toByte), Array[Byte](0xD7.toByte, 0x81.toByte, 1)) // TrackNumber only
    val videoEntry = el(Array(0xAE.toByte), video)
    val tracks = el(Array(0x16.toByte, 0x54.toByte, 0xAE.toByte, 0x6B.toByte),
      audioEntry ++ videoEntry)
    val info = el(Array(0x15.toByte, 0x49.toByte, 0xA9.toByte, 0x66.toByte), Array[Byte](0, 0))
    val ebmlHeader = el(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte),
      Array[Byte](0x42.toByte, 0x86.toByte, 0x81.toByte, 1))
    val segment = el(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte),
      info ++ tracks)
    ebmlHeader ++ segment
  }

  test("HeaderDecoder parses mp4 tkhd (v0+v1) and Matroska pixel dimensions") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, realMp4(1920, 1080)),
      (2L, realMp4(640, 360, version = 1)), // 64-bit-time tkhd variant
      (3L, realMkv(1280, 720)),
      (4L, realMp4(0, 0)), // no visual trak at all → zeros
      (5L, realMkv(1280, 720).take(30))) // truncated mid-structure → zeros
      .toDF("media_id", "content")
    val rows = Multimodal.extractFeatures(df, "media_id", "content")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("format"), r.getAs[Int]("width"), r.getAs[Int]("height")))).toMap
    rows(1L) shouldBe (("mp4", 1920, 1080))
    rows(2L) shouldBe (("mp4", 640, 360))
    rows(3L) shouldBe (("mkv", 1280, 720))
    rows(4L) shouldBe (("mp4", 0, 0))
    rows(5L) shouldBe (("mkv", 0, 0))
  }

  test("sampleFramePlan emits evenly spaced frame indices for videos only") {
    val features = Multimodal.extractFeatures(mediaDf, "media_id", "content", Multimodal.StubDecoder)
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
        Multimodal.MediaFeatures(format, 100, 100, 1, 0, 0, Array.fill(16)(0.5f))
    }
    val rows = Multimodal.extractFeatures(mediaDf, "media_id", "content", ConstDecoder)
      .select("width").distinct().collect()
    rows.map(_.getInt(0)) shouldBe Array(100)
  }

  // ---- perceptual hashes over uncompressed pixels --------------------

  /** P6 PPM with the given per-pixel RGB function (row-major). */
  private def ppmBytes(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val pix = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      pix(3 * (y * w + x)) = r.toByte
      pix(3 * (y * w + x) + 1) = g.toByte
      pix(3 * (y * w + x) + 2) = b.toByte
    }
    header ++ pix
  }

  /** 24-bit BMP (bottom-up, 4-byte padded rows) with the same pixel fn. */
  private def bmpBytes(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                   // reserved, pixel offset
      .putInt(40).putInt(w).putInt(h)          // DIB size, width, height (bottom-up)
      .putShort(1).putShort(24).putInt(0)      // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
      }
      for (_ <- w * 3 until rowBytes) buf.put(0.toByte)
    }
    buf.array()
  }

  test("PixelDecoder: PPM and BMP of the same pixels give identical luma and hashes") {
    def px(x: Int, y: Int) = ((x * 7 + y) % 256, (y * 13) % 256, (x + y * 3) % 256)
    val s = spark
    import s.implicits._
    val df = Seq((1L, ppmBytes(18, 16)(px)), (2L, bmpBytes(18, 16)(px)))
      .toDF("img_id", "content")
    val out = Multimodal.imageHashes(df, "img_id", "content")
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "ppm"
    out(1).getString(1) shouldBe "bmp"
    out(0).getInt(2) shouldBe 18
    out(0).getInt(3) shouldBe 16
    out(0).getLong(4) shouldBe out(1).getLong(4) // dhash equal
    out(0).getLong(5) shouldBe out(1).getLong(5) // ahash equal
    out(0).getString(6) should fullyMatch regex "[0-9a-f]{16}"
  }

  test("dhash bits are ground-truthable: horizontal gradient → all ones") {
    // luma strictly increases left-to-right → every comparison is 1
    val s = spark
    import s.implicits._
    val df = Seq((1L, ppmBytes(9, 8)((x, _) => (x * 20, x * 20, x * 20))))
      .toDF("img_id", "content")
    val r = Multimodal.imageHashes(df, "img_id", "content").head()
    r.getLong(4) shouldBe -1L           // 64 one-bits
    r.getString(6) shouldBe "ffffffffffffffff"
  }

  test("near-identical images pair under the Manku-blocked Hamming join; distinct ones do not") {
    // gid must change the GRADIENT structure, not just add a constant
    // offset — dhash is invariant to uniform brightness shifts.
    def img(gid: Int, flip: Boolean) = ppmBytes(9, 8) { (x, y) =>
      val v0 = (x * x * (gid % 5 + 1) + y * (3 + gid % 7) + x * y * (gid + 1)) % 97 * 2 % 256
      val v = if (flip && x == 4 && y == 3) (v0 + 50) % 256 else v0
      (v, v, v)
    }
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, img(0, flip = false)), (1L, img(0, flip = true)),
      (2L, img(9, flip = false)), (3L, img(9, flip = true)),
      (4L, "not an image".getBytes)).toDF("img_id", "content")
    val hashes = Multimodal.imageHashes(df, "img_id", "content")
    val keys = graft.dedup.Dedup.blockKeysFromSketches(
      hashes, "id", "dhash", maxHamming = 4, blocks = 6)
    val pairs = graft.dedup.Dedup.simhashNearDupPairsFromKeys(
      keys, maxHamming = 4, maxBucketOccupancy = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain allOf ((0L, 1L), (2L, 3L))
    pairs.foreach { case (a, b) => Set((0L, 1L), (2L, 3L)) should contain ((a, b)) }
  }

  // ---- audio energy hashes over real PCM ------------------------------

  /** Mono-or-stereo 16-bit PCM WAV with channel-0 samples from fn. */
  private def wavPcmBytes(channels: Int, rate: Int, n: Int)(s0: Int => Int): Array[Byte] = {
    val dataSize = n * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    for (i <- 0 until n; c <- 0 until channels)
      buf.putShort((if (c == 0) s0(i) else -1 - s0(i)).toShort)
    buf.array()
  }

  test("audio energy hash: monotone-energy ramp → all ones; stereo reads channel 0") {
    val s = spark
    import s.implicits._
    // 130 samples, 2 per frame; |sample| strictly increases → every
    // frame-energy comparison is 1
    val mono = wavPcmBytes(1, 8000, 130)(i => i * 10)
    val stereo = wavPcmBytes(2, 44100, 130)(i => i * 10)
    val df = Seq((1L, mono), (2L, stereo)).toDF("a_id", "content")
    val out = Multimodal.audioHashes(df, "a_id", "content").orderBy("id").collect()
    out(0).getString(6) shouldBe "ffffffffffffffff"
    out(0).getInt(2) shouldBe 1
    out(0).getLong(4) shouldBe 130L
    // stereo: channel 0 is identical → identical hash; channel count parsed
    out(1).getString(6) shouldBe out(0).getString(6)
    out(1).getInt(2) shouldBe 2
    out(1).getInt(3) shouldBe 44100
  }

  test("audio energy hash: too-short, non-PCM and truncated audio → null hash") {
    val s = spark
    import s.implicits._
    val short = wavPcmBytes(1, 8000, 30)(i => i)          // < 65 samples
    val truncated = wavPcmBytes(1, 8000, 130)(i => i).take(40)
    val df = Seq((1L, short), (2L, truncated)).toDF("a_id", "content")
    val out = Multimodal.audioHashes(df, "a_id", "content").orderBy("id").collect()
    out(0).isNullAt(5) shouldBe true
    out(0).getLong(4) shouldBe 30L  // decoded fine, just unhashable
    out(1).isNullAt(5) shouldBe true
    out(1).getLong(4) shouldBe 0L
  }

  test("property: dHash and aHash are invariant to unsaturated uniform brightness shifts") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random gray values capped at 200 so +55
    // never saturates: comparisons (dhash) and mean-threshold (ahash)
    // are both order-preserved under a uniform shift
    def px(seed: Int, shift: Int)(x: Int, y: Int) = {
      val v = ((seed * 31 + x * 7919 + y * 104729) % 201 + shift).min(255)
      (v, v, v)
    }
    val rows = (0 until 8).flatMap { seed =>
      Seq((seed * 2L, ppmBytes(18, 16)(px(seed, 0))),
        (seed * 2L + 1, ppmBytes(18, 16)(px(seed, 55))))
    }
    val out = Multimodal.imageHashes(rows.toDF("img_id", "content"), "img_id", "content")
      .orderBy("id").collect()
    out.grouped(2).foreach { pair =>
      pair(0).getLong(4) shouldBe pair(1).getLong(4) // dhash
      pair(0).getLong(5) shouldBe pair(1).getLong(5) // ahash
    }
  }

  test("property: audio energy hash is invariant to waveform negation") {
    val s = spark
    import s.implicits._
    def sample(i: Int) = ((i * 37) % 3001) - 1500
    val df = Seq(
      (1L, wavPcmBytes(1, 8000, 300)(sample)),
      (2L, wavPcmBytes(1, 8000, 300)(i => -sample(i)))).toDF("a_id", "content")
    val out = Multimodal.audioHashes(df, "a_id", "content").orderBy("id").collect()
    out(0).getLong(5) shouldBe out(1).getLong(5)
  }

  test("crafted headers (dimension/size overflow) yield null hashes, never a crash") {
    val s = spark
    import s.implicits._
    // PPM claiming 65536×65536: w*h*3 wraps 32-bit to 0 — must be rejected
    val hugePpm = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++ Array.fill(300)(1.toByte)
    // BMP with a wrapped-arithmetic width field
    val hugeBmp = {
      val b = bmpBytes(4, 4)((_, _) => (1, 2, 3))
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(18, 0x20000000) // width: (w*3+3) wraps int
      b
    }
    // WAV whose data-chunk size field wraps i+8+size past Int.MaxValue
    val hugeWav = {
      val b = wavPcmBytes(1, 8000, 130)(i => i)
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(40, 0x7FFFFFF0) // data size
      b
    }
    val imgs = Seq((1L, hugePpm), (2L, hugeBmp)).toDF("img_id", "content")
    val imgOut = Multimodal.imageHashes(imgs, "img_id", "content").orderBy("id").collect()
    imgOut.foreach { r => r.isNullAt(4) shouldBe true; r.getInt(2) shouldBe 0 }
    val wavs = Seq((1L, hugeWav)).toDF("a_id", "content")
    val wavOut = Multimodal.audioHashes(wavs, "a_id", "content").collect()
    wavOut(0).isNullAt(5) shouldBe true
  }

  test("undecodable and truncated images keep their row with null hashes") {
    val s = spark
    import s.implicits._
    val truncated = ppmBytes(18, 16)((_, _) => (1, 2, 3)).take(40)
    val df = Seq((1L, truncated), (2L, "garbage".getBytes)).toDF("img_id", "content")
    val out = Multimodal.imageHashes(df, "img_id", "content").orderBy("id").collect()
    out.foreach { r =>
      r.isNullAt(4) shouldBe true
      r.isNullAt(6) shouldBe true
      r.getInt(2) shouldBe 0
    }
    out(0).getString(1) shouldBe "ppm" // sniffed, but honestly undecodable
  }

  // ---- baseline JPEG decode (JpegWriter → JpegDecoder) ------------------

  test("JPEG baseline: DC-only grayscale with restart markers decodes to exact flat blocks") {
    // Q0 = 16 → a DC-only block's every sample is exactly 2·dc + 128
    // (the IDCT of a lone DC term is flat dc·Q0/8, no rounding
    // ambiguity). DRI = 2 exercises RSTn handling + predictor resets.
    val dc = Array(-15, -5, 5, 15)
    val bytes = graft.multimodal.JpegWriter.grayDcOnly(16, 16, dc, q = 16, restartInterval = 2)
    val Some((w, h, lum)) = Multimodal.PixelDecoder.decodeLuma("jpeg", bytes)
    w shouldBe 16
    h shouldBe 16
    for (y <- 0 until 16; x <- 0 until 16) {
      val block = (y / 8) * 2 + (x / 8)
      withClue(s"($x,$y): ") { lum(y * 16 + x) shouldBe 2 * dc(block) + 128 }
    }
  }

  test("JPEG baseline: 4:2:0 color with neutral chroma returns the luma plane exactly") {
    // Cb = Cr = 128 (all-zero chroma coefficients) → YCbCr→RGB→luma
    // round-trips to Y; exercises the 3-component MCU interleave and
    // the chroma upsampling grid.
    val dcY = Array(20, 13, 6, -1)
    val bytes = graft.multimodal.JpegWriter.colorDcOnly420(16, 16, dcY, q = 16)
    val Some((w, h, lum)) = Multimodal.PixelDecoder.decodeLuma("jpeg", bytes)
    w shouldBe 16
    h shouldBe 16
    for (y <- 0 until 16; x <- 0 until 16) {
      val block = (y / 8) * 2 + (x / 8)
      withClue(s"($x,$y): ") { lum(y * 16 + x) shouldBe 2 * dcY(block) + 128 }
    }
  }

  test("JPEG baseline: AC spectrum decodes through Huffman run-length + IDCT") {
    // One block, zigzag coefficients dc=0, AC(u=1,v=0)=4 (zigzag index
    // 1), Q=16: s(x,y) = (4·16)/(4·√2)·cos((2x+1)π/16) — constant per
    // column. Expected per-row samples (round(s)+128), hand-computed:
    // 139 137 134 130 126 122 119 117.
    val zz = new Array[Int](64)
    zz(1) = 4
    val bytes = graft.multimodal.JpegWriter.grayFromCoefs(8, 8, Array(zz), q = 16)
    val Some((_, _, lum)) = Multimodal.PixelDecoder.decodeLuma("jpeg", bytes)
    val expectedRow = Seq(139, 137, 134, 130, 126, 122, 119, 117)
    for (y <- 0 until 8) {
      withClue(s"row $y: ") { (0 until 8).map(x => lum(y * 8 + x)) shouldBe expectedRow }
    }
    // Long zero run: coefficient at zigzag index 40 forces ZRL (>15
    // zeros) coding; verify against an independent reference IDCT.
    val zigzag = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val zz2 = new Array[Int](64)
    zz2(0) = 10
    zz2(40) = -3
    val bytes2 = graft.multimodal.JpegWriter.grayFromCoefs(8, 8, Array(zz2), q = 16)
    val Some((_, _, lum2)) = Multimodal.PixelDecoder.decodeLuma("jpeg", bytes2)
    def refIdct(x: Int, y: Int): Int = {
      var s = 0.0
      for (k <- 0 until 64 if zz2(k) != 0) {
        val nat = zigzag(k)
        val u = nat % 8
        val v = nat / 8
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        s += cu * cv * (zz2(k) * 16.0) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      val vOut = math.round(s / 4.0).toInt + 128
      math.max(0, math.min(255, vOut))
    }
    for (y <- 0 until 8; x <- 0 until 8) {
      withClue(s"($x,$y): ") { lum2(y * 8 + x) shouldBe refIdct(x, y) }
    }
  }

  test("JPEG: progressive, truncated, and non-JPEG streams return None (honest nulls)") {
    Multimodal.PixelDecoder.decodeLuma("jpeg",
      graft.multimodal.JpegWriter.progressiveStub(16, 16)) shouldBe None
    val good = graft.multimodal.JpegWriter.grayDcOnly(16, 16, Array(1, 2, 3, 4))
    Multimodal.PixelDecoder.decodeLuma("jpeg", good.take(good.length / 2)) shouldBe None
    Multimodal.PixelDecoder.decodeLuma("jpeg", "not a jpeg".getBytes) shouldBe None
    // the generic 4-byte sniff header alone (no frame) is undecodable
    Multimodal.PixelDecoder.decodeLuma("jpeg", jpegBytes("photo")) shouldBe None
  }

  test("JPEG: out-of-range SOS Huffman table ids return None, not a crash") {
    // One flipped nibble in the SOS component spec must yield the
    // honest null-hash row — never ArrayIndexOutOfBoundsException in
    // the imageHashes mapPartitions job.
    val good = graft.multimodal.JpegWriter.grayDcOnly(16, 16, Array(1, 2, 3, 4))
    def sosTtOffset(b: Array[Byte]): Int = {
      val p = b.indices.find(i =>
        (b(i) & 0xff) == 0xff && i + 1 < b.length && (b(i + 1) & 0xff) == 0xda).get
      p + 6 // FF DA len(2) ns(1) id(1) → tt
    }
    for (bad <- Seq(0x40, 0x04, 0xff, 0x4f, 0xf4)) {
      val crafted = good.clone()
      crafted(sosTtOffset(crafted)) = bad.toByte
      Multimodal.PixelDecoder.decodeLuma("jpeg", crafted) shouldBe None
    }
    // and the unpatched stream still decodes
    Multimodal.PixelDecoder.decodeLuma("jpeg", good) should not be None
  }

  test("JPEG: single-component frame with 2x2 sampling factors decodes non-interleaved (T.81 A.2)") {
    // A grayscale JPEG declaring 2x2 factors is a one-component scan →
    // NON-interleaved: blocks in raster order over the full-resolution
    // component, identical pixels to the 1x1 stream.
    val dc = Array(-20, 0, 10, 30)
    val plain = graft.multimodal.JpegWriter.grayDcOnly(16, 16, dc, q = 16)
    val sampled = graft.multimodal.JpegWriter.grayDcOnlySampled(16, 16, dc, q = 16)
    val Some((w1, h1, lum1)) = Multimodal.PixelDecoder.decodeLuma("jpeg", plain)
    val Some((w2, h2, lum2)) = Multimodal.PixelDecoder.decodeLuma("jpeg", sampled)
    (w2, h2) shouldBe ((w1, h1))
    lum2 shouldBe lum1
    // 2x1 and 1x4 factor shapes ride the same rule
    val s21 = graft.multimodal.JpegWriter.grayDcOnlySampled(16, 16, dc, q = 16, hs = 2, vs = 1)
    val Some((_, _, lum3)) = Multimodal.PixelDecoder.decodeLuma("jpeg", s21)
    lum3 shouldBe lum1
  }

  test("JPEG: crafted huge-dims header is rejected before plane allocation") {
    // A few-hundred-byte stream claiming 8192x8192 cannot carry one
    // entropy bit per declared block — the budget check must refuse it
    // without allocating the ~256 MB plane.
    val tiny = graft.multimodal.JpegWriter.grayDcOnly(8, 8, Array(0))
    val p = tiny.indices.find(i =>
      (tiny(i) & 0xff) == 0xff && i + 1 < tiny.length && (tiny(i + 1) & 0xff) == 0xc0).get
    val crafted = tiny.clone()
    // FF C0 len(2) prec(1) h(2) w(2): patch dims to 8192x8192
    crafted(p + 5) = 0x20; crafted(p + 6) = 0x00
    crafted(p + 7) = 0x20; crafted(p + 8) = 0x00
    val before = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    Multimodal.PixelDecoder.decodeLuma("jpeg", crafted) shouldBe None
    val after = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    // loose pin: no quarter-gigabyte allocation happened
    (after - before) should be < 200L * 1024 * 1024
  }

  test("JPEG and PPM of the same pixel grid produce identical perceptual hashes") {
    // Cross-decoder consistency: a grayscale JPEG (flat DC blocks) and
    // a PPM whose gray pixels equal the decoded JPEG samples must land
    // on the SAME dhash/ahash — JPEG rows dedupe against uncompressed
    // rows in mm7's Manku-blocked join.
    val dc = Array(-20, 0, 10, 30)
    def grayAt(x: Int, y: Int): Int = 2 * dc((y / 8) * 2 + (x / 8)) + 128
    val jpeg = graft.multimodal.JpegWriter.grayDcOnly(16, 16, dc, q = 16)
    val ppm = ppmBytes(16, 16)((x, y) => { val v = grayAt(x, y); (v, v, v) })
    val s = spark
    import s.implicits._
    val out = Multimodal.imageHashes(
        Seq((1L, jpeg), (2L, ppm)).toDF("img_id", "content"), "img_id", "content")
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "jpeg"
    out(1).getString(1) shouldBe "ppm"
    out(0).getInt(2) shouldBe 16
    out(0).getLong(4) shouldBe out(1).getLong(4) // dhash equal
    out(0).getLong(5) shouldBe out(1).getLong(5) // ahash equal
  }

  // ---------------------------------------------------------------- PNG

  private def pngLum(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  test("PNG: 8-bit grayscale round-trips exactly through all five scanline filters") {
    val w = 11; val h = 10 // odd width: Sub/Paeth offsets off the word grain
    val lum = pngLum(w, h)((x, y) => (7 * x * x + 13 * y + x * y * 3) % 256)
    for (ft <- 0 to 4) {
      val bytes = graft.multimodal.PngWriter.gray8(w, h, lum, _ => ft)
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("png", bytes)
      (dw, dh) shouldBe ((w, h))
      out shouldBe lum
    }
    // and the cycling-filter default (every row a different filter)
    val Some((_, _, out)) = Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.gray8(w, h, lum))
    out shouldBe lum
  }

  test("PNG: RGB and RGBA with r=g=b decode to the same luma as grayscale; alpha is ignored") {
    val w = 9; val h = 7
    val lum = pngLum(w, h)((x, y) => (31 * x + 57 * y) % 256)
    val g = Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.gray8(w, h, lum)).get._3
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.grayAsRgb8(w, h, lum)).get._3 shouldBe g
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.grayAsRgba8(w, h, lum)).get._3 shouldBe g
    // two RGBA images differing ONLY in alpha decode identically
    val s1 = lum.flatMap(v => Array(v, v, v, 0))
    val s2 = lum.flatMap(v => Array(v, v, v, 255))
    Multimodal.PixelDecoder.decodeLuma(
        "png", graft.multimodal.PngWriter.png8(w, h, 6, s1)).get._3 shouldBe
      Multimodal.PixelDecoder.decodeLuma(
        "png", graft.multimodal.PngWriter.png8(w, h, 6, s2)).get._3
  }

  test("PNG: truecolor luma uses the shared integer formula") {
    val w = 8; val h = 6
    val samples = Array.tabulate(w * h * 3) { i => (i * 41 + 17) % 256 }
    val bytes = graft.multimodal.PngWriter.png8(w, h, 2, samples)
    val Some((_, _, out)) = Multimodal.PixelDecoder.decodeLuma("png", bytes)
    val expect = Array.tabulate(w * h) { p =>
      (299 * samples(3 * p) + 587 * samples(3 * p + 1) + 114 * samples(3 * p + 2)) / 1000
    }
    out shouldBe expect
  }

  test("PNG: decoder agrees pixel-for-pixel with javax.imageio (independent implementation)") {
    // The writer's forward filter and the decoder's unfilter are
    // inverse implementations by the same author — a matched bug
    // could hide in the round-trip. ImageIO is the JDK's independent
    // PNG decoder: agreement on every pixel across all five filters
    // and three color types rules that out.
    val w = 13; val h = 9
    val lum = pngLum(w, h)((x, y) => (5 * x * y + 11 * x + 3 * y * y) % 256)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 29 + 7) % 256)
    val fixtures = Seq(
      graft.multimodal.PngWriter.gray8(w, h, lum),
      graft.multimodal.PngWriter.grayAsRgba8(w, h, lum),
      graft.multimodal.PngWriter.png8(w, h, 2, rgb)) ++
      (0 to 4).map(ft => graft.multimodal.PngWriter.gray8(w, h, lum, _ => ft))
    for (bytes <- fixtures) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("png", bytes)
      (dw, dh) shouldBe ((img.getWidth, img.getHeight))
      // raw raster samples, NOT getRGB — getRGB pushes grayscale
      // through a CS_GRAY → sRGB color-space conversion
      val raster = img.getRaster
      val color = raster.getNumBands >= 3
      for (y <- 0 until dh; x <- 0 until dw) {
        val expect =
          if (color)
            (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
              114 * raster.getSample(x, y, 2)) / 1000
          else raster.getSample(x, y, 0)
        withClue(s"($x,$y): ") { out(y * dw + x) shouldBe expect }
      }
    }
  }

  test("PNG: Adam7 interlaced decodes pixel-identical to the sequential layout") {
    // every dim shape that matters: multiples of 8, odd/prime dims
    // (partial passes), and tiny images where most passes are EMPTY
    for ((w, h) <- Seq((16, 16), (13, 9), (7, 5), (3, 3), (2, 3), (1, 1), (8, 1), (1, 8))) {
      val lum = pngLum(w, h)((x, y) => (11 * x + 29 * y + x * y * 5) % 256)
      val Some((sw, sh, seqLum)) = Multimodal.PixelDecoder.decodeLuma(
        "png", graft.multimodal.PngWriter.gray8(w, h, lum))
      val Some((iw, ih, interLum)) = Multimodal.PixelDecoder.decodeLuma(
        "png", graft.multimodal.PngWriter.interlaced8(w, h, 0, lum))
      withClue(s"${w}x$h: ") {
        (iw, ih) shouldBe ((sw, sh))
        interLum shouldBe seqLum
        interLum shouldBe lum
      }
    }
    // color types + every fixed filter ride the same pass machinery
    val lum = pngLum(12, 10)((x, y) => (7 * x + 13 * y) % 256)
    val rgba = lum.zipWithIndex.flatMap { case (v, i) => Array(v, v, v, i % 256) }
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.interlaced8(12, 10, 6, rgba)).get._3 shouldBe lum
    for (ft <- 0 to 4)
      Multimodal.PixelDecoder.decodeLuma("png",
        graft.multimodal.PngWriter.interlaced8(12, 10, 0, lum, _ => ft)).get._3 shouldBe lum
  }

  test("PNG: interlaced fixtures agree pixel-for-pixel with javax.imageio") {
    for ((w, h) <- Seq((16, 16), (13, 9), (5, 7))) {
      val lum = pngLum(w, h)((x, y) => (3 * x * x + 17 * y + 7 * x * y) % 256)
      val bytes = graft.multimodal.PngWriter.interlaced8(w, h, 0, lum)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("png", bytes)
      (dw, dh) shouldBe ((img.getWidth, img.getHeight))
      val raster = img.getRaster
      for (y <- 0 until dh; x <- 0 until dw)
        withClue(s"${w}x$h ($x,$y): ") {
          out(y * dw + x) shouldBe raster.getSample(x, y, 0)
        }
    }
  }

  test("PNG: indexed-color decodes through the palette with the shared luma formula") {
    val w = 10; val h = 6
    val pal = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 130, 201), (250, 250, 250))
    val idx = Array.tabulate(w * h)(i => (i * 3 + i / w) % pal.size)
    val bytes = graft.multimodal.PngWriter.palette8(w, h, pal, idx)
    val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("png", bytes)
    (dw, dh) shouldBe ((w, h))
    val palLum = pal.map { case (r, g, b) => (299 * r + 587 * g + 114 * b) / 1000 }
    out shouldBe idx.map(palLum)
    // independent implementation agrees (getRGB — the palette resolves
    // straight to sRGB, no gray-colorspace conversion in play)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val expect = (299 * ((argb >> 16) & 0xff) + 587 * ((argb >> 8) & 0xff) +
        114 * (argb & 0xff)) / 1000
      withClue(s"($x,$y): ") { out(y * w + x) shouldBe expect }
    }
    // interlaced palette rides the same pass machinery — but the
    // interlaced writer is typed for direct samples, so pin via the
    // palette entries being index-identity grayscale instead
    val grayPal = (0 until 256).map(v => (v, v, v))
    val lumIdx = Array.tabulate(w * h)(i => (i * 37 + 11) % 256)
    val seqB = graft.multimodal.PngWriter.palette8(w, h, grayPal, lumIdx)
    Multimodal.PixelDecoder.decodeLuma("png", seqB).get._3 shouldBe lumIdx
    // out-of-range index → None (spec 11.2.2: an error, never a guess)
    val shortPal = graft.multimodal.PngWriter.palette8(
      w, h, pal.take(3), idx.map(_ % 3))
    Multimodal.PixelDecoder.decodeLuma("png", shortPal) should not be None
    val oob = graft.multimodal.PngWriter.palette8(w, h, pal.take(3), idx.map {
      i => if (i == 0) 200 else i % 3 }) // index 200 >= 3 entries
    Multimodal.PixelDecoder.decodeLuma("png", oob) shouldBe None
  }

  test("PNG: truncated-interlaced, 16-bit, sub-byte palette, truncated, and corrupt streams return None") {
    // an interlaced header over an 8-byte raw stream — far short of
    // the Adam7 passes — is the interlaced-path truncation case
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.interlacedStub(8, 8)) shouldBe None
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.sixteenBitStub(8, 8)) shouldBe None
    Multimodal.PixelDecoder.decodeLuma(
      "png", graft.multimodal.PngWriter.paletteStub(8, 8)) shouldBe None
    val good = graft.multimodal.PngWriter.gray8(16, 16,
      pngLum(16, 16)((x, y) => (x * 16 + y) % 256))
    Multimodal.PixelDecoder.decodeLuma("png", good) should not be None
    // truncation at every prefix length: None, never a crash
    for (cut <- Seq(7, 20, 40, good.length - 5, good.length - 1)) {
      Multimodal.PixelDecoder.decodeLuma("png", good.take(cut)) shouldBe None
    }
    // a flipped IDAT byte fails the CRC check
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    Multimodal.PixelDecoder.decodeLuma("png", corrupt) shouldBe None
  }

  test("PNG: crafted huge-dims header is rejected by the inflate budget before allocation") {
    // Re-declare a tiny image's IHDR as 16384x16384 (with a VALID
    // re-computed CRC, so the refusal is provably the inflate-ratio
    // budget, not the CRC): a few-hundred-byte IDAT cannot legally
    // inflate to a gigabyte of scanlines.
    val tiny = graft.multimodal.PngWriter.gray8(8, 8, pngLum(8, 8)((x, y) => x + y))
    val crafted = tiny.clone()
    def putBe32(off: Int, v: Long): Unit = {
      crafted(off) = ((v >>> 24) & 0xff).toByte
      crafted(off + 1) = ((v >>> 16) & 0xff).toByte
      crafted(off + 2) = ((v >>> 8) & 0xff).toByte
      crafted(off + 3) = (v & 0xff).toByte
    }
    putBe32(16, 16384L) // IHDR width (sig 8 + len 4 + type 4)
    putBe32(20, 16384L) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(crafted, 12, 4 + 13)
    putBe32(12 + 4 + 13, crc.getValue)
    val before = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    Multimodal.PixelDecoder.decodeLuma("png", crafted) shouldBe None
    val after = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    (after - before) should be < 200L * 1024 * 1024
  }

  test("PNG: FDICT zlib header returns None (terminates), critical chunk fatal, ancillary skipped") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def be32(v: Long): Unit = {
        out += ((v >>> 24) & 0xff).toByte; out += ((v >>> 16) & 0xff).toByte
        out += ((v >>> 8) & 0xff).toByte; out += (v & 0xff).toByte
      }
      be32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out ++= tb; out ++= data
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      be32(crc.getValue)
      out.toArray
    }
    val good = graft.multimodal.PngWriter.gray8(8, 8, pngLum(8, 8)((x, y) => x + y))
    // FDICT: zlib CMF=0x78 FLG=0x20 (FDICT set, FCHECK valid:
    // 0x7820 = 30752 = 31*992) + a DICTID. Inflater.inflate() then
    // returns 0 with needsDictionary() true while finished() and
    // needsInput() both stay false — without the corrupt-state guard
    // the inflate loop would spin forever on this one crafted image.
    val fdictIdat = Array(0x78, 0x20, 0xaa, 0xbb, 0xcc, 0xdd, 0x01).map(_.toByte)
    val ihdrEnd = 8 + 12 + 13 // sig + (len,type,crc) + IHDR payload
    val fdictPng = good.take(ihdrEnd) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.emptyByteArray)
    val t0 = System.nanoTime()
    Multimodal.PixelDecoder.decodeLuma("png", fdictPng) shouldBe None
    (System.nanoTime() - t0) should be < 5_000_000_000L // returned, not spun
    // An unrecognized CRITICAL chunk (uppercase first letter) between
    // IHDR and IDAT is fatal per the spec; the same bytes under an
    // ancillary name (lowercase first letter) are skippable.
    val payload = Array[Byte](1, 2, 3, 4)
    val rest = good.drop(ihdrEnd)
    Multimodal.PixelDecoder.decodeLuma("png",
      good.take(ihdrEnd) ++ chunk("QRST", payload) ++ rest) shouldBe None
    val Some((aw, ah, alum)) = Multimodal.PixelDecoder.decodeLuma("png",
      good.take(ihdrEnd) ++ chunk("qRST", payload) ++ rest)
    val Some((gw, gh, glum)) = Multimodal.PixelDecoder.decodeLuma("png", good)
    (aw, ah) shouldBe ((gw, gh))
    alum shouldBe glum
  }

  // ---------------------------------------------------------------- GIF

  test("GIF: grayscale round-trips exactly, sequential and 4-pass interlaced") {
    for ((w, h) <- Seq((16, 16), (13, 9), (7, 5), (1, 1), (9, 1), (1, 9), (20, 17))) {
      val lum = pngLum(w, h)((x, y) => (19 * x + 41 * y + 3 * x * y) % 256)
      val Some((sw, sh, seqOut)) = Multimodal.PixelDecoder.decodeLuma(
        "gif", graft.multimodal.GifWriter.gray(w, h, lum))
      (sw, sh) shouldBe ((w, h))
      seqOut shouldBe lum
      val Some((_, _, interOut)) = Multimodal.PixelDecoder.decodeLuma(
        "gif", graft.multimodal.GifWriter.gray(w, h, lum, interlaced = true))
      withClue(s"${w}x$h interlaced: ") { interOut shouldBe lum }
    }
    // a LOCAL color table wins over the (absent) global one
    val lum = pngLum(8, 8)((x, y) => (x * 8 + y * 3) % 256)
    Multimodal.PixelDecoder.decodeLuma("gif",
      graft.multimodal.GifWriter.gray(8, 8, lum, localTable = true)).get._3 shouldBe lum
  }

  test("GIF: color palette resolves through the shared luma formula; agrees with javax.imageio") {
    val w = 11; val h = 7
    val pal = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 130, 201), (200, 150, 99))
    val idx = Array.tabulate(w * h)(i => (i * 7 + i / w) % pal.size)
    for (interlaced <- Seq(false, true)) {
      val bytes = graft.multimodal.GifWriter.gif(w, h, pal, idx, interlaced = interlaced)
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("gif", bytes)
      (dw, dh) shouldBe ((w, h))
      val palLum = pal.map { case (r, g, b) => (299 * r + 587 * g + 114 * b) / 1000 }
      out shouldBe idx.map(palLum)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val expect = (299 * ((argb >> 16) & 0xff) + 587 * ((argb >> 8) & 0xff) +
          114 * (argb & 0xff)) / 1000
        withClue(s"interlaced=$interlaced ($x,$y): ") { out(y * w + x) shouldBe expect }
      }
    }
  }

  test("GIF: LZW width growth decodes real compressed streams (javax.imageio fixture)") {
    // Our writer never grows the code width; a REAL encoder does. Let
    // ImageIO's GIF writer produce a conventionally-compressed stream
    // and pin our decoder against the known pixels.
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val lum = pngLum(w, h)((x, y) => (x * x + 3 * y + (x * y) % 31) % 256)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, lum(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos) shouldBe true
    val bytes = bos.toByteArray
    val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("gif", bytes)
    (dw, dh) shouldBe ((w, h))
    // ImageIO quantizes gray through its own palette: compare against
    // what ImageIO itself reads back, not the pre-quantization pixels
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val argb = back.getRGB(x, y)
      val expect = (299 * ((argb >> 16) & 0xff) + 587 * ((argb >> 8) & 0xff) +
        114 * (argb & 0xff)) / 1000
      withClue(s"($x,$y): ") { out(y * dw + x) shouldBe expect }
    }
  }

  test("GIF: crafted huge-dims header is rejected by the LZW budget before allocation") {
    // patch a tiny GIF's logical-screen AND image-descriptor dims to
    // 16384x16384: its few dozen LZW bytes cannot legally emit 268M
    // indices, so the refusal must come before the index planes exist.
    val tiny = graft.multimodal.GifWriter.gray(8, 8, pngLum(8, 8)((x, y) => x + y))
    val crafted = tiny.clone()
    def putLe16(off: Int, v: Int): Unit = {
      crafted(off) = (v & 0xff).toByte
      crafted(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putLe16(6, 16384); putLe16(8, 16384) // logical screen
    val desc = 6 + 7 + 768 // header + screen descriptor + global table
    putLe16(desc + 5, 16384); putLe16(desc + 7, 16384) // image w, h
    val before = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    Multimodal.PixelDecoder.decodeLuma("gif", crafted) shouldBe None
    val after = Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    (after - before) should be < 200L * 1024 * 1024
  }

  test("GIF: animated, partial-frame, truncated, and corrupt streams return None") {
    Multimodal.PixelDecoder.decodeLuma(
      "gif", graft.multimodal.GifWriter.animatedStub(8, 8)) shouldBe None
    Multimodal.PixelDecoder.decodeLuma(
      "gif", graft.multimodal.GifWriter.partialFrameStub(8, 8)) shouldBe None
    val good = graft.multimodal.GifWriter.gray(16, 16,
      pngLum(16, 16)((x, y) => (x + 16 * y) % 256))
    Multimodal.PixelDecoder.decodeLuma("gif", good) should not be None
    for (cut <- Seq(5, 12, 700, good.length - 3, good.length - 1))
      Multimodal.PixelDecoder.decodeLuma("gif", good.take(cut)) shouldBe None
  }

  test("GIF and PPM of the same pixel grid produce identical perceptual hashes") {
    val lum = pngLum(18, 16)((x, y) => (25 * x + 7 * y + 2 * x * y) % 256)
    val gif = graft.multimodal.GifWriter.gray(18, 16, lum)
    val ppm = ppmBytes(18, 16)((x, y) => { val v = lum(y * 18 + x); (v, v, v) })
    val s = spark
    import s.implicits._
    val out = Multimodal.imageHashes(
        Seq((1L, gif), (2L, ppm)).toDF("img_id", "content"), "img_id", "content")
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "gif"
    out(1).getString(1) shouldBe "ppm"
    out(0).getLong(4) shouldBe out(1).getLong(4)
    out(0).getLong(5) shouldBe out(1).getLong(5)
  }

  // ---------------------------------------------------------------- TIFF

  test("TIFF: uncompressed 8-bit decodes exactly — both byte orders, strips, polarity, RGB") {
    val w = 13; val h = 11
    val lum = pngLum(w, h)((x, y) => (23 * x + 31 * y + x * y) % 256)
    for (le <- Seq(true, false); rps <- Seq(0, 1, 4)) {
      val bytes = graft.multimodal.TiffWriter.gray(w, h, lum,
        littleEndian = le, rowsPerStrip = rps)
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("tiff", bytes)
      withClue(s"le=$le rps=$rps: ") { (dw, dh) shouldBe ((w, h)); out shouldBe lum }
    }
    // white-is-zero stores inverted samples; decode must invert back
    val wiz = graft.multimodal.TiffWriter.gray(w, h, lum, whiteIsZero = true)
    Multimodal.PixelDecoder.decodeLuma("tiff", wiz).get._3 shouldBe lum
    // RGB lands on the shared integer luma
    val rgbS = Array.tabulate(w * h * 3)(i => (i * 53 + 19) % 256)
    val Some((_, _, rgbOut)) = Multimodal.PixelDecoder.decodeLuma(
      "tiff", graft.multimodal.TiffWriter.rgb(w, h, rgbS))
    rgbOut shouldBe Array.tabulate(w * h)(p =>
      (299 * rgbS(3 * p) + 587 * rgbS(3 * p + 1) + 114 * rgbS(3 * p + 2)) / 1000)
  }

  test("TIFF: decoder agrees pixel-for-pixel with javax.imageio") {
    val w = 12; val h = 9
    val lum = pngLum(w, h)((x, y) => (7 * x * x + 13 * y + 3 * x * y) % 256)
    val rgbS = Array.tabulate(w * h * 3)(i => (i * 37 + 5) % 256)
    val fixtures = Seq(
      graft.multimodal.TiffWriter.gray(w, h, lum),
      graft.multimodal.TiffWriter.gray(w, h, lum, littleEndian = false),
      graft.multimodal.TiffWriter.gray(w, h, lum, rowsPerStrip = 2),
      graft.multimodal.TiffWriter.rgb(w, h, rgbS))
    for (bytes <- fixtures) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
      val Some((dw, dh, out)) = Multimodal.PixelDecoder.decodeLuma("tiff", bytes)
      (dw, dh) shouldBe ((img.getWidth, img.getHeight))
      val raster = img.getRaster
      val color = raster.getNumBands >= 3
      for (y <- 0 until dh; x <- 0 until dw) {
        val expect =
          if (color)
            (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
              114 * raster.getSample(x, y, 2)) / 1000
          else raster.getSample(x, y, 0)
        withClue(s"($x,$y): ") { out(y * dw + x) shouldBe expect }
      }
    }
  }

  test("TIFF: compressed, multi-page, truncated, and corrupt streams return None") {
    Multimodal.PixelDecoder.decodeLuma(
      "tiff", graft.multimodal.TiffWriter.compressedStub(8, 8)) shouldBe None
    Multimodal.PixelDecoder.decodeLuma(
      "tiff", graft.multimodal.TiffWriter.multiPageStub(8, 8)) shouldBe None
    val good = graft.multimodal.TiffWriter.gray(16, 16,
      pngLum(16, 16)((x, y) => (x + 16 * y) % 256))
    Multimodal.PixelDecoder.decodeLuma("tiff", good) should not be None
    for (cut <- Seq(3, 7, 20, 300, good.length - 5, good.length - 1))
      Multimodal.PixelDecoder.decodeLuma("tiff", good.take(cut)) shouldBe None
  }

  test("TIFF and PPM of the same pixel grid produce identical perceptual hashes") {
    val lum = pngLum(18, 16)((x, y) => (5 * x + 11 * y + 3 * x * y) % 256)
    val tif = graft.multimodal.TiffWriter.gray(18, 16, lum)
    val ppm = ppmBytes(18, 16)((x, y) => { val v = lum(y * 18 + x); (v, v, v) })
    val s = spark
    import s.implicits._
    val out = Multimodal.imageHashes(
        Seq((1L, tif), (2L, ppm)).toDF("img_id", "content"), "img_id", "content")
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "tiff"
    out(1).getString(1) shouldBe "ppm"
    out(0).getLong(4) shouldBe out(1).getLong(4)
    out(0).getLong(5) shouldBe out(1).getLong(5)
  }

  test("PNG and PPM of the same pixel grid produce identical perceptual hashes") {
    val lum = pngLum(18, 16)((x, y) => (9 * x + 23 * y + x * y) % 256)
    val png = graft.multimodal.PngWriter.gray8(18, 16, lum)
    val ppm = ppmBytes(18, 16)((x, y) => { val v = lum(y * 18 + x); (v, v, v) })
    val s = spark
    import s.implicits._
    val out = Multimodal.imageHashes(
        Seq((1L, png), (2L, ppm)).toDF("img_id", "content"), "img_id", "content")
      .orderBy("id").collect()
    out(0).getString(1) shouldBe "png"
    out(1).getString(1) shouldBe "ppm"
    out(0).getInt(2) shouldBe 18
    out(0).getLong(4) shouldBe out(1).getLong(4) // dhash equal
    out(0).getLong(5) shouldBe out(1).getLong(5) // ahash equal
  }
}
