package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata — north-star scope; the reference has no binary handling.
  *
  * Design for 100 TB: media bytes stay opaque `binary` columns that are
  * NEVER shuffled — format sniffing and size stats are map-side column
  * expressions over byte prefixes, and feature extraction runs
  * per-partition (the Scala analogue of `mapInPandas`: one iterator
  * pass per partition, batch shape = partition, output schema declared
  * up front via the Encoder) so codec state is initialized once per
  * partition, not per row.
  *
  * The container has no image/audio codecs, so the default
  * [[BinaryDecoder]] is an explicitly-marked DETERMINISTIC STUB: it
  * derives pseudo-metadata and a pseudo-embedding from a rolling hash
  * of the bytes. The Spark-side plumbing — schemas, partition
  * iteration, decoder plug point — is real and tested; production
  * swaps the stub for a codec-backed decoder with the same trait.
  */
object Multimodal {

  /** Container format sniffed from magic bytes — pure codegen'd
    * expressions over the first bytes (no decode, no UDF). */
  def sniffFormat(bin: Column): Column = {
    val h = hex(substring(bin, 1, 12)) // hex of the first 12 bytes
    when(bin.isNull, lit(null))
      .when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("474946383"), "gif")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", "wav") // RIFF....WAVE
      .when(substring(h, 9, 8) === "66747970", "mp4") // ....ftyp
      .when(h.startsWith("4F676753"), "ogg")
      .when(h.startsWith("1A45DFA3"), "mkv")
      .when(h.startsWith("49492A00") || h.startsWith("4D4D002A"), "tiff") // II*\0 / MM\0*
      .when(h.startsWith("424D"), "bmp") // "BM"
      .when(h.startsWith("5036"), "ppm") // "P6"
      .otherwise("unknown")
  }

  /** One-pass metadata profile of a binary column: per sniffed format,
    * count + byte-size stats. Scans only byte prefixes and lengths. */
  def binaryMetadata(df: DataFrame, binCol: String): DataFrame =
    df.select(sniffFormat(col(binCol)).as("format"),
        length(col(binCol)).cast("long").as("n_bytes"))
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_files"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        sum(col("n_bytes")).as("total_bytes"))

  /** Decoded-media features: what a real decoder would produce.
    * `width`/`height` apply to images, `channels`/`sampleRate` to
    * audio; `nFrames` is video frames or audio sample frames. Fields a
    * decoder cannot determine are 0. */
  final case class MediaFeatures(
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
      channels: Int,
      sampleRate: Int,
      embedding: Array[Float])

  /** Decoder plug point. Implementations must be serializable (shipped
    * to executors) and cheap to construct per partition. */
  trait BinaryDecoder extends Serializable {
    def decode(format: String, bytes: Array[Byte]): MediaFeatures
  }

  /** STUB decoder — the container has no codec libraries. Deterministic
    * pseudo-features from an FNV-1a rolling hash of the bytes: same
    * bytes → same features, different bytes → (almost surely)
    * different features. Replace with a codec-backed implementation in
    * production; everything around it is real. */
  object StubDecoder extends BinaryDecoder {
    private def fnv1a(bytes: Array[Byte], seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }
    /** The deterministic pseudo-embedding, shared with [[HeaderDecoder]]
      * (a real embedding needs pixel/sample decode — codec territory). */
    private[multimodal] def pseudoEmbedding(bytes: Array[Byte]): Array[Float] =
      Array.tabulate(16) { i =>
        (math.floorMod(fnv1a(bytes, 1000L + i), 2000L) - 1000L).toFloat / 1000f
      }
    def decode(format: String, bytes: Array[Byte]): MediaFeatures = {
      def dim(seed: Int, lo: Int, hi: Int): Int =
        lo + math.floorMod(fnv1a(bytes, seed.toLong), (hi - lo).toLong).toInt
      MediaFeatures(format, dim(1, 16, 4096), dim(2, 16, 4096),
        if (format == "mp4" || format == "mkv") dim(3, 1, 1000) else 1, 0, 0,
        pseudoEmbedding(bytes))
    }
  }

  /** Header-parsing decoder — THE DEFAULT for [[extractFeatures]]:
    * real dimensions/audio parameters for the formats whose headers
    * are pure public byte arithmetic, no codec required:
    *   - PNG: IHDR width/height (big-endian u32 at offsets 16/20 —
    *     the IHDR chunk is mandatory-first per the PNG spec);
    *   - JPEG: marker scan to the first SOFn frame header (skipping
    *     APPn/DQT/… segments by their declared lengths); height/width
    *     are the big-endian u16s after the precision byte;
    *   - GIF: logical-screen width/height (little-endian u16 at 6/8);
    *   - RIFF/WAVE: chunk walk for `fmt ` (channels, sample rate,
    *     block align) and `data` (byte length); nFrames = sample
    *     frames = data length / block align.
    *   - MP4 (ISO BMFF): box walk `moov` → `trak` → `tkhd`; width and
    *     height are 16.16 fixed-point u32s at fixed offsets past the
    *     version-dependent times/ids/matrix block — the first trak
    *     with nonzero dimensions (the visual one; audio traks carry
    *     0×0) wins. Pure size+type arithmetic, 64-bit `largesize`
    *     honored, no codec.
    *   - Matroska/WebM: EBML walk Segment → Tracks → TrackEntry →
    *     Video → PixelWidth/PixelHeight (vint ids/sizes per the
    *     public EBML spec; unknown-size elements extend to the parent
    *     end).
    * Frame COUNTS for container video need the sample tables — codec
    * territory — so video nFrames is 0 here. Formats with no
    * codec-free header at all (ogg, unknown bytes) yield all-zero
    * fields: a header decoder must never fabricate metadata a user
    * could mistake for real ([[StubDecoder]] remains the explicit
    * plug-point stand-in for a codec-backed implementation).
    * Truncated or corrupt headers yield 0 for the affected fields,
    * never a fabricated value. The embedding remains the deterministic
    * pseudo-embedding in all cases. */
  object HeaderDecoder extends BinaryDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Long =
      (be16(b, i).toLong << 16) | be16(b, i + 2)
    private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
    private def le32(b: Array[Byte], i: Int): Long =
      (le16(b, i + 2).toLong << 16) | le16(b, i)
    private def clampInt(v: Long): Int = if (v < 0 || v > Int.MaxValue) 0 else v.toInt

    private def png(b: Array[Byte]): (Int, Int) =
      // 8-byte signature, 4-byte length, "IHDR", then width/height.
      if (b.length >= 24 && new String(b, 12, 4, "US-ASCII") == "IHDR")
        (clampInt(be32(b, 16)), clampInt(be32(b, 20)))
      else (0, 0)

    private def jpeg(b: Array[Byte]): (Int, Int) = {
      var i = 2 // past SOI
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return (0, 0) // broken marker stream
        val m = u8(b, i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
        else if (m == 0xd9 || m == 0xda) return (0, 0) // EOI/SOS before any SOF
        else {
          val len = be16(b, i + 2)
          if (len < 2) return (0, 0)
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof)
            return if (i + 8 < b.length) (be16(b, i + 7), be16(b, i + 5)) else (0, 0)
          i += 2 + len
        }
      }
      (0, 0)
    }

    private def gif(b: Array[Byte]): (Int, Int) =
      if (b.length >= 10) (le16(b, 6), le16(b, 8)) else (0, 0)

    /** (channels, sampleRate, sampleFrames) from the fmt/data chunks. */
    private def wav(b: Array[Byte]): (Int, Int, Int) = {
      var off = 12 // past RIFF size WAVE
      var channels = 0
      var rate = 0
      var blockAlign = 0
      var dataLen = 0L
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = le32(b, off + 4)
        if (id == "fmt " && sz >= 16 && off + 24 <= b.length) {
          channels = le16(b, off + 10)
          rate = clampInt(le32(b, off + 12))
          blockAlign = le16(b, off + 20)
        } else if (id == "data") dataLen = sz
        if (sz < 0 || sz > Int.MaxValue - 9) return (channels, rate, 0)
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      (channels, rate, if (blockAlign > 0) clampInt(dataLen / blockAlign) else 0)
    }

    /** First child box of type `typ` in `[start, end)` of an ISO BMFF
      * stream, as its payload range. Honors 64-bit `largesize`
      * (size == 1) and to-end boxes (size == 0); any inconsistent size
      * aborts the walk — zeros, never a guess. */
    private def findBox(b: Array[Byte], start: Int, end: Int, typ: String): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val sz = be32(b, off)
        val tt = new String(b, off + 4, 4, "US-ASCII")
        var hdr = 8
        val boxEnd: Long =
          if (sz == 1L) {
            if (off + 16 > end) return None
            hdr = 16
            off + ((be32(b, off + 8) << 32) | be32(b, off + 12))
          } else if (sz == 0L) end.toLong
          else off + sz
        if (boxEnd < off + hdr || boxEnd > end) return None
        if (tt == typ) return Some((off + hdr, boxEnd.toInt))
        off = boxEnd.toInt
      }
      None
    }

    /** (width, height) from the first visual trak's `tkhd`: 16.16
      * fixed-point u32s after the version-dependent prefix (v0: 76
      * bytes past the payload start; v1: 88 — the 64-bit times/
      * duration variant). Audio traks carry 0×0 and are skipped. */
    private def mp4(b: Array[Byte]): (Int, Int) = {
      findBox(b, 0, b.length, "moov") match {
        case None => (0, 0)
        case Some((moovStart, moovEnd)) =>
          var off = moovStart
          while (off < moovEnd) {
            findBox(b, off, moovEnd, "trak") match {
              case None => return (0, 0)
              case Some((trakStart, trakEnd)) =>
                findBox(b, trakStart, trakEnd, "tkhd").foreach { case (p, pEnd) =>
                  if (p < b.length) {
                    val wOff = p + (if (u8(b, p) == 1) 88 else 76)
                    if (wOff + 8 <= pEnd && wOff + 8 <= b.length) {
                      val w = clampInt(be32(b, wOff) >> 16)
                      val h = clampInt(be32(b, wOff + 4) >> 16)
                      if (w > 0 && h > 0) return (w, h)
                    }
                  }
                }
                off = trakEnd
            }
          }
          (0, 0)
      }
    }

    /** EBML variable-width integer at `off`: (value, width-in-bytes).
      * Element IDs keep the length-marker bit (the spec compares ids
      * with it); sizes strip it. */
    private def vint(b: Array[Byte], off: Int, keepMarker: Boolean): Option[(Long, Int)] = {
      if (off >= b.length) return None
      val first = u8(b, off)
      if (first == 0) return None // > 8-byte vints don't occur in ids/sizes we walk
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (off + len > b.length) return None
      var v: Long = if (keepMarker) first.toLong else (first & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | u8(b, off + i); i += 1 }
      Some((v, len))
    }

    /** First EBML child element with `id` in `[start, end)`, as its
      * payload range. An all-ones "unknown size" extends to the parent
      * end (legal on Segment/Cluster). */
    private def findEbml(b: Array[Byte], start: Int, end: Int, id: Long): Option[(Int, Int)] = {
      var off = start
      while (off < end) {
        val (idVal, idLen) = vint(b, off, keepMarker = true).getOrElse(return None)
        val (szVal, szLen) = vint(b, off + idLen, keepMarker = false).getOrElse(return None)
        val payload = off + idLen + szLen
        val unknownSize = szVal == (1L << (7 * szLen)) - 1
        val pEnd: Long = if (unknownSize) end.toLong else payload.toLong + szVal
        if (pEnd < payload || pEnd > end) return None
        if (idVal == id) return Some((payload, pEnd.toInt))
        off = pEnd.toInt
      }
      None
    }

    /** (PixelWidth, PixelHeight) from the first TrackEntry carrying a
      * Video element: Segment → Tracks → TrackEntry* → Video →
      * PixelWidth/PixelHeight as big-endian unsigned ints. */
    private def mkv(b: Array[Byte]): (Int, Int) = {
      def uint(range: (Int, Int)): Int = {
        val (s, e) = range
        if (e - s > 8 || e > b.length) return 0
        var v = 0L; var i = s
        while (i < e) { v = (v << 8) | u8(b, i); i += 1 }
        clampInt(v)
      }
      val dims = for {
        seg <- findEbml(b, 0, b.length, 0x18538067L)
        tracks <- findEbml(b, seg._1, seg._2, 0x1654AE6BL)
      } yield {
        var off = tracks._1
        while (off < tracks._2) {
          findEbml(b, off, tracks._2, 0xAEL) match {
            case None => return (0, 0)
            case Some((eStart, eEnd)) =>
              findEbml(b, eStart, eEnd, 0xE0L).foreach { case (vStart, vEnd) =>
                val w = findEbml(b, vStart, vEnd, 0xB0L).map(uint).getOrElse(0)
                val h = findEbml(b, vStart, vEnd, 0xBAL).map(uint).getOrElse(0)
                if (w > 0 && h > 0) return (w, h)
              }
              off = eEnd
          }
        }
        (0, 0)
      }
      dims.getOrElse((0, 0))
    }

    def decode(format: String, bytes: Array[Byte]): MediaFeatures = format match {
      case "png" =>
        val (w, h) = png(bytes)
        MediaFeatures(format, w, h, 1, 0, 0, StubDecoder.pseudoEmbedding(bytes))
      case "jpeg" =>
        val (w, h) = jpeg(bytes)
        MediaFeatures(format, w, h, 1, 0, 0, StubDecoder.pseudoEmbedding(bytes))
      case "gif" =>
        val (w, h) = gif(bytes)
        MediaFeatures(format, w, h, 1, 0, 0, StubDecoder.pseudoEmbedding(bytes))
      case "wav" =>
        val (c, r, frames) = wav(bytes)
        MediaFeatures(format, 0, 0, frames, c, r, StubDecoder.pseudoEmbedding(bytes))
      case "mp4" =>
        val (w, h) = mp4(bytes)
        MediaFeatures(format, w, h, 0, 0, 0, StubDecoder.pseudoEmbedding(bytes))
      case "mkv" =>
        val (w, h) = mkv(bytes)
        MediaFeatures(format, w, h, 0, 0, 0, StubDecoder.pseudoEmbedding(bytes))
      case _ =>
        // No codec-free header (ogg, unknown): all-zero fields, never
        // fabricated metadata. StubDecoder stays available explicitly.
        MediaFeatures(format, 0, 0, 0, 0, 0, StubDecoder.pseudoEmbedding(bytes))
    }
  }

  /** Feature extraction over a binary column — the `mapInPandas`
    * analogue: per-partition iterator, decoder constructed once per
    * partition, output rows (id, format, width, height, n_frames,
    * channels, sample_rate, embedding). Media bytes never leave their
    * input partition. The id passes through with its source type
    * (long, string/UUID, …) via a Row encoder — no silent cast. The
    * default [[HeaderDecoder]] parses real dimensions for the
    * codec-free formats and stubs the rest. */
  def extractFeatures(
      df: DataFrame, idCol: String, binCol: String,
      decoder: BinaryDecoder = HeaderDecoder): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Decode is orders of magnitude more CPU per byte than columnar
    // work (inflate/LZW/Huffman+IDCT), so a poorly-split input (one
    // parquet row group) must fan out before the per-partition decode
    // or the whole corpus decodes on one core — the ungated-spread
    // contract (no-op at real scale, where scans arrive in thousands
    // of splits).
    val withFormat = graft.util.Partitioning.spread(df).select(
      col(idCol).as("id"),
      sniffFormat(col(binCol)).as("format"),
      col(binCol).as("bytes"))
    val outSchema = StructType(Seq(
      StructField("id", withFormat.schema("id").dataType),
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    withFormat.mapPartitions { it =>
      // Per-partition decoder setup happens here (stub: nothing).
      it.map { row =>
        val f = decoder.decode(row.getString(1), row.getAs[Array[Byte]](2))
        Row(row.get(0), f.format, f.width, f.height, f.nFrames,
          f.channels, f.sampleRate, f.embedding)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame sampling plan for video rows: emits (id, frame_index) pairs
    * for `n` evenly spaced frames — the plumbing a real frame decoder
    * would consume; pure expressions, no decode. */
  def sampleFramePlan(features: DataFrame, n: Int = 4): DataFrame =
    features.filter(col("n_frames") > 1)
      .select(col("id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          greatest((col("n_frames") / n).cast("long"), lit(1L)))).as("frame_index"))

  /** Resize plan over decoded features: fit each (width, height) into
    * a maxW × maxH box preserving aspect ratio, never upscaling —
    * emits (id, format, width, height, out_width, out_height). Pure
    * integer/double column math (the geometry a resize kernel
    * consumes); the pixel transform itself belongs to the decoder plug
    * point like every other codec operation. Output dims round to
    * nearest and clamp to ≥ 1. */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"target box must be positive: ${maxW}x$maxH")
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    features.select(col("id"), col("format"), col("width"), col("height"),
      greatest(round(col("width") * scale).cast("int"), lit(1)).as("out_width"),
      greatest(round(col("height") * scale).cast("int"), lit(1)).as("out_height"))
  }

  /** Pixel access for the image formats this library decodes
    * honestly: PPM (P6 binary, maxval ≤ 255, no comment lines), BMP
    * (24-bit BI_RGB, bottom-up or top-down), baseline-sequential JPEG
    * ([[JpegDecoder]]), 8-bit PNG including Adam7-interlaced and
    * indexed-color ([[PngDecoder]]), GIF ([[GifDecoder]]) and
    * uncompressed TIFF ([[TiffDecoder]]). Everything else stays
    * behind the [[BinaryDecoder]] plug point. Returns the image as row-major TOP-DOWN integer luma
    * (`(299·r + 587·g + 114·b) / 1000`, integer division — exactly
    * replayable arithmetic, no float rounding). */
  object PixelDecoder {
    /** Dimension sanity cap: 16384² is far beyond any honest fixture
      * and keeps every w·h·3 product safely inside Int (and every
      * allocation bounded) even on crafted headers. */
    private val MaxPixelDim = 16384

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
    private def le32(b: Array[Byte], i: Int): Long =
      (le16(b, i + 2).toLong << 16) | le16(b, i)

    private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

    /** P6 header: "P6" <ws> width <ws> height <ws> maxval <single ws>
      * then raw RGB triples. */
    private def ppm(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 11 || b(0) != 'P' || b(1) != '6') return None
      var i = 2
      def skipWs(): Unit = while (i < b.length && Character.isWhitespace(b(i))) i += 1
      def readInt(): Option[Int] = {
        skipWs()
        var v = 0
        var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); any = true; i += 1
        }
        if (any) Some(v) else None
      }
      for {
        w <- readInt(); h <- readInt(); maxv <- readInt()
        if w > 0 && h > 0 && maxv > 0 && maxv <= 255
        // Long arithmetic + a hard dimension cap: a corrupt/crafted
        // header like "P6 65536 65536 255" must yield None (the
        // null-hash row), never an int-overflowed bounds check that
        // later crashes the task with AIOOBE / a multi-GB allocation.
        if w <= MaxPixelDim && h <= MaxPixelDim
        _ = { i += 1 } // the single whitespace after maxval
        if (b.length - i).toLong >= w.toLong * h * 3
      } yield {
        val out = new Array[Int](w * h)
        var p = 0
        while (p < w * h) {
          out(p) = luma(u8(b, i + 3 * p), u8(b, i + 3 * p + 1), u8(b, i + 3 * p + 2))
          p += 1
        }
        (w, h, out)
      }
    }

    /** 24-bit uncompressed BMP; rows 4-byte padded, BGR order,
      * bottom-up unless the DIB height is negative. */
    private def bmp(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val off = le32(b, 10).toInt
      val w = le32(b, 18).toInt
      val rawH = le32(b, 22).toInt
      val topDown = rawH < 0
      val h = math.abs(rawH)
      val bpp = le16(b, 28)
      val compression = le32(b, 30)
      if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
      // Same crafted-header hardening as ppm(): cap dimensions and do
      // the size check in Long so wrapped int arithmetic can never
      // admit a buffer the pixel loop then overruns.
      // h <= 0 also catches abs(Int.MinValue), which stays negative
      if (w > MaxPixelDim || h <= 0 || h > MaxPixelDim) return None
      val rowBytes = (w * 3 + 3) / 4 * 4
      if (off < 0 || (b.length - off).toLong < rowBytes.toLong * h) return None
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val base = off + srcRow * rowBytes
        var x = 0
        while (x < w) {
          // BGR on disk
          out(y * w + x) =
            luma(u8(b, base + 3 * x + 2), u8(b, base + 3 * x + 1), u8(b, base + 3 * x))
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }

    def decodeLuma(format: String, bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
      format match {
        case "ppm" => ppm(bytes)
        case "bmp" => bmp(bytes)
        // Baseline-sequential JPEG (SOF0/SOF1, Huffman, 8-bit) — the
        // dominant real image format, decoded for real in
        // [[JpegDecoder]]; progressive/arithmetic/12-bit return None
        // (the honest null-hash row), same discipline as a corrupt
        // PPM header.
        case "jpeg" => JpegDecoder.decodeLuma(bytes)
        // 8-bit PNG, sequential or Adam7, direct or indexed — chunk
        // walk, JDK Inflater, the five scanline filters
        // ([[PngDecoder]]); 16-bit / sub-byte depths return None (the
        // honest null-hash row), same discipline as a corrupt PPM
        // header.
        case "png" => PngDecoder.decodeLuma(bytes)
        // GIF87a/89a single-frame stills, sequential or 4-pass
        // interlace, full LZW ([[GifDecoder]]); animated and
        // partial-frame GIFs return None.
        case "gif" => GifDecoder.decodeLuma(bytes)
        // Uncompressed 8-bit baseline TIFF, both byte orders, strip
        // layout, gray (either polarity) / RGB(A) ([[TiffDecoder]]);
        // compressed/tiled/multi-page/palette return None.
        case "tiff" => TiffDecoder.decodeLuma(bytes)
        case _ => None
      }

    /** Point-sample `gw × gh` grid positions: `sx(c) = c·w / gw`,
      * `sy(r) = r·h / gh` (integer division) — deterministic nearest
      * sampling, the replayable stand-in for area-average downscale
      * (which needs a real resize kernel behind the decoder plug
      * point). */
    private[multimodal] def sampleGrid(
        w: Int, h: Int, lum: Array[Int], gw: Int, gh: Int): Array[Int] = {
      val out = new Array[Int](gw * gh)
      var r = 0
      while (r < gh) {
        val sy = r * h / gh
        var c = 0
        while (c < gw) {
          out(r * gw + c) = lum(sy * w + c * w / gw)
          c += 1
        }
        r += 1
      }
      out
    }

    /** dHash: 9×8 sampled luma, bit (row, c) = luma(row, c+1) >
      * luma(row, c); bits pack row-major, first comparison = MSB. */
    private[multimodal] def dhash64(w: Int, h: Int, lum: Array[Int]): Long = {
      val g = sampleGrid(w, h, lum, 9, 8)
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          hash = (hash << 1) | (if (g(r * 9 + c + 1) > g(r * 9 + c)) 1L else 0L)
          c += 1
        }
        r += 1
      }
      hash
    }

    /** aHash: 8×8 sampled luma, bit = luma > mean (mean = sum/64.0,
      * exact in double); bits pack row-major, first pixel = MSB. */
    private[multimodal] def ahash64(w: Int, h: Int, lum: Array[Int]): Long = {
      val g = sampleGrid(w, h, lum, 8, 8)
      var sum = 0L
      var i = 0
      while (i < 64) { sum += g(i); i += 1 }
      val mean = sum / 64.0
      var hash = 0L
      i = 0
      while (i < 64) {
        hash = (hash << 1) | (if (g(i) > mean) 1L else 0L)
        i += 1
      }
      hash
    }
  }

  /** PCM sample access for RIFF/WAVE audio — the one audio container a
    * codec-free engine can decode honestly (16-bit PCM, any channel
    * count; channel 0 is taken for fingerprinting). Compressed audio
    * stays behind the [[BinaryDecoder]] plug point. */
  object AudioDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
    private def le16s(b: Array[Byte], i: Int): Int = {
      val v = le16(b, i)
      if (v >= 0x8000) v - 0x10000 else v
    }
    private def le32(b: Array[Byte], i: Int): Long =
      (le16(b, i + 2).toLong << 16) | le16(b, i)

    /** Walks the RIFF chunks for fmt (PCM, 16-bit) and data; returns
      * (channels, sampleRate, channel-0 samples). */
    def pcm16Samples(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var i = 12
      var channels = 0
      var rate = 0
      var bits = 0
      var fmtOk = false
      var data: Option[(Int, Int)] = None
      while (i + 8 <= b.length && data.isEmpty) {
        val id = new String(b.slice(i, i + 4), "US-ASCII")
        val size = le32(b, i + 4).toInt
        // Long comparison: a crafted size near Int.MaxValue would wrap
        // i+8+size negative and bypass the truncation guard
        if (size < 0 || i.toLong + 8 + size > b.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          val audioFormat = le16(b, i + 8)
          channels = le16(b, i + 10)
          rate = le32(b, i + 12).toInt
          bits = le16(b, i + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1
        } else if (id == "data") {
          data = Some((i + 8, size))
        }
        // chunks are word-aligned: odd sizes carry one pad byte
        i += 8 + size + (size & 1)
      }
      if (!fmtOk) return None
      data.map { case (off, size) =>
        val frameBytes = channels * 2
        val nFrames = size / frameBytes
        val out = new Array[Int](nFrames)
        var f = 0
        while (f < nFrames) {
          out(f) = le16s(b, off + f * frameBytes) // channel 0
          f += 1
        }
        (channels, rate, out)
      }
    }

    /** 64-bit audio energy hash — the temporal analogue of
      * [[PixelDecoder.dhash64]]: the samples split into 65 equal-count
      * frames (`frame f = samples[f·n/65, (f+1)·n/65)`, integer
      * bounds), per-frame energy = Σ |sample| (exact integer), bit f =
      * energy(f+1) > energy(f), packed MSB-first. Needs ≥ 65 samples
      * (one per frame) — else None. Loudness-scale-sensitive by
      * design at this tier; a production acoustic fingerprint swaps in
      * spectral bands behind the same shape. */
    def energyHash64(samples: Array[Int]): Option[Long] = {
      val frames = 65
      if (samples.length < frames) return None
      val energy = new Array[Long](frames)
      var f = 0
      while (f < frames) {
        // Long bounds: f·length overflows Int past ~33M samples (a
        // perfectly valid ~13-minute 44.1 kHz file) — and the DuckDB
        // oracle computes these bounds exactly, so int wraparound
        // would diverge before it crashed.
        val lo = (f.toLong * samples.length / frames).toInt
        val hi = ((f + 1).toLong * samples.length / frames).toInt
        var s = 0L
        var i = lo
        while (i < hi) { s += math.abs(samples(i).toLong); i += 1 }
        energy(f) = s
        f += 1
      }
      var hash = 0L
      f = 0
      while (f < 64) {
        hash = (hash << 1) | (if (energy(f + 1) > energy(f)) 1L else 0L)
        f += 1
      }
      Some(hash)
    }
  }

  /** Audio fingerprints over a binary column — the audio counterpart
    * of [[imageHashes]]: per decodable PCM WAV row, the 64-bit energy
    * hash plus its hex rendering; undecodable/too-short rows keep
    * their row with null hashes. Same per-partition plan shape (bytes
    * never shuffle); feed `ehash` into
    * [[graft.dedup.Dedup.blockKeysFromSketches]] for audio near-dup
    * dedup on the shared Manku-blocked Hamming join. */
  def audioHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Decode is orders of magnitude more CPU per byte than columnar
    // work (inflate/LZW/Huffman+IDCT), so a poorly-split input (one
    // parquet row group) must fan out before the per-partition decode
    // or the whole corpus decodes on one core — the ungated-spread
    // contract (no-op at real scale, where scans arrive in thousands
    // of splits).
    val withFormat = graft.util.Partitioning.spread(df).select(
      col(idCol).as("id"),
      sniffFormat(col(binCol)).as("format"),
      col(binCol).as("bytes"))
    val outSchema = StructType(Seq(
      StructField("id", withFormat.schema("id").dataType),
      StructField("format", StringType),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("ehash", LongType, nullable = true),
      StructField("ehash_hex", StringType, nullable = true)))
    withFormat.mapPartitions { it =>
      it.map { row =>
        val format = row.getString(1)
        val parsed =
          if (format == "wav") AudioDecoder.pcm16Samples(row.getAs[Array[Byte]](2))
          else None
        parsed match {
          case Some((ch, rate, samples)) =>
            AudioDecoder.energyHash64(samples) match {
              case Some(h) =>
                Row(row.get(0), format, ch, rate, samples.length.toLong, h, f"$h%016x")
              case None =>
                Row(row.get(0), format, ch, rate, samples.length.toLong, null, null)
            }
          case None => Row(row.get(0), format, 0, 0, 0L, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Perceptual image hashes over a binary column — the signal image
    * near-dup dedup runs on (the multimodal counterpart of the text
    * MinHash/SimHash sketches): per decodable row, 64-bit dHash and
    * aHash plus their 16-hex-char renderings. Undecodable rows (wrong
    * format, truncated, compressed) keep their row with null hashes
    * and 0×0 dims — honest nulls, no fabricated signal.
    *
    * Plan: per-partition iterator like [[extractFeatures]] (bytes
    * never shuffle; only id + 2 longs + dims leave the scan). Feed
    * `dhash` into [[graft.dedup.Dedup.blockKeysFromSketches]] +
    * [[graft.dedup.Dedup.simhashNearDupPairsFromKeys]] for the
    * Manku-blocked Hamming join — identical plan shape to text
    * simhash near-dup at any corpus size. */
  def imageHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Decode is orders of magnitude more CPU per byte than columnar
    // work (inflate/LZW/Huffman+IDCT), so a poorly-split input (one
    // parquet row group) must fan out before the per-partition decode
    // or the whole corpus decodes on one core — the ungated-spread
    // contract (no-op at real scale, where scans arrive in thousands
    // of splits).
    val withFormat = graft.util.Partitioning.spread(df).select(
      col(idCol).as("id"),
      sniffFormat(col(binCol)).as("format"),
      col(binCol).as("bytes"))
    val outSchema = StructType(Seq(
      StructField("id", withFormat.schema("id").dataType),
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = true),
      StructField("ahash", LongType, nullable = true),
      StructField("dhash_hex", StringType, nullable = true),
      StructField("ahash_hex", StringType, nullable = true)))
    withFormat.mapPartitions { it =>
      it.map { row =>
        val format = row.getString(1)
        PixelDecoder.decodeLuma(format, row.getAs[Array[Byte]](2)) match {
          case Some((w, h, lum)) =>
            val d = PixelDecoder.dhash64(w, h, lum)
            val a = PixelDecoder.ahash64(w, h, lum)
            Row(row.get(0), format, w, h, d, a, f"$d%016x", f"$a%016x")
          case None =>
            Row(row.get(0), format, 0, 0, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
