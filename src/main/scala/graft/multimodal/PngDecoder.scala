package graft.multimodal

import java.util.zip.{CRC32, DataFormatException, Inflater}

/** PNG (ISO/IEC 15948) still-image decoder for the non-interlaced
  * 8-bit truecolor/grayscale subset — the other dominant real web
  * format next to baseline JPEG. Chunk walk (IHDR → IDAT* → IEND),
  * zlib inflate via the public JDK (`java.util.zip.Inflater`),
  * the five scanline filters (None/Sub/Up/Average/Paeth, §9), and
  * both interlace methods (sequential and Adam7), feeding
  * the same [[Multimodal.PixelDecoder]] → dHash/aHash → Manku-block
  * dedup chain as PPM/BMP/JPEG. Reference scope: the reference has no
  * media handling at all; this is a north-star LLM-pipeline component.
  *
  * Honesty contract (the [[Multimodal.StubDecoder]] discipline):
  * anything this decoder cannot decode EXACTLY returns None — the
  * null-hash row — never fabricated pixels. That includes bit depths
  * other than 8 (16-bit and the sub-byte palette depths), unknown
  * color types, out-of-range palette indices, missing/duplicated/
  * misplaced PLTE, bad CRCs on critical chunks, truncated or
  * over-long zlib streams, and malformed chunk layout. Indexed-color
  * (PLTE palette, 8-bit indices) decodes for real — entry luma via
  * the shared formula, tRNS alpha ignored like every other alpha. Adam7 INTERLACED images
  * decode for real (seven strided passes, each with its own filter
  * context, §8.2) — pinned pixel-identical to their sequential
  * twins and to javax.imageio in MultimodalSpec.
  * Accepted color types: 0 (gray), 2 (RGB), 3 (indexed), 4
  * (gray+alpha), 6 (RGBA); alpha is ignored for hashing (the luma of
  * the stored samples, the same convention every hash consumer here
  * uses).
  *
  * Output: row-major TOP-DOWN integer luma — gray returns the sample
  * directly; color applies the shared `(299·R + 587·G + 114·B) / 1000`
  * integer formula, so PNG rows hash under exactly the same arithmetic
  * as PPM/BMP/JPEG rows (MultimodalSpec pins PNG ≡ PPM of the same
  * pixel grid).
  *
  * 100 TB shape: pure per-row byte work inside `mapPartitions`
  * ([[Multimodal.imageHashes]]) — bytes never shuffle, nothing
  * collects; cost is linear in pixels. */
private[multimodal] object PngDecoder {

  /** Same crafted-header cap as the other pixel decoders. */
  private val MaxPixelDim = 16384

  /** DEFLATE's hard expansion ceiling is 1032:1 (a 258-byte match per
    * 2 coded bits); a declared raw size beyond that for the available
    * IDAT bytes cannot inflate fully, so reject it BEFORE allocating —
    * the same crafted-header/zip-bomb budget discipline as
    * [[JpegDecoder]]'s entropy-bit bound. */
  private val MaxInflateRatio = 1032L

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Samples per pixel for the accepted color types; -1 = refused.
    * Indexed-color (3) is one index byte per pixel, resolved through
    * the PLTE palette at luma time. */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // indexed-color (PLTE required)
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => -1 // anything unknown: honest None
  }

  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 8 + 25) return None // signature + IHDR + IEND can't fit
    var i = 0
    while (i < 8) { if (u8(b, i) != Signature(i)) return None; i += 1 }

    // ---- chunk walk: IHDR first, IDAT payloads concatenated in
    // order, stop at IEND. Ancillary chunks are skipped; critical
    // chunks get a CRC check (corruption → None, never wrong pixels).
    var pos = 8
    var width = 0
    var height = 0
    var channels = -1
    var interlaced = false
    var paletted = false
    var palette: Array[Int] = null // luma per PLTE entry
    var sawIhdr = false
    var sawIend = false
    var idatLen = 0L
    val idatParts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val crc = new CRC32
    while (!sawIend) {
      if (pos + 12 > b.length) return None // truncated chunk header/crc
      val len = be32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
      val dataOff = pos + 8
      val typ = new String(b, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def crcOk(): Boolean = {
        crc.reset()
        crc.update(b, pos + 4, 4 + len.toInt)
        crc.getValue == be32(b, dataOff + len.toInt)
      }
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13 || !crcOk()) return None
          sawIhdr = true
          val w = be32(b, dataOff)
          val h = be32(b, dataOff + 4)
          val bitDepth = u8(b, dataOff + 8)
          val colorType = u8(b, dataOff + 9)
          val compression = u8(b, dataOff + 10)
          val filterMethod = u8(b, dataOff + 11)
          val interlace = u8(b, dataOff + 12)
          channels = channelsOf(colorType)
          // 8-bit, standard compression/filter, sequential or Adam7;
          // 16-bit / sub-byte depths, palette → honest None.
          if (w <= 0 || h <= 0 || w > MaxPixelDim || h > MaxPixelDim ||
              bitDepth != 8 || channels < 0 || compression != 0 ||
              filterMethod != 0 || interlace > 1) return None
          width = w.toInt
          height = h.toInt
          interlaced = interlace == 1
          paletted = colorType == 3
        case "PLTE" =>
          // critical for indexed-color: 1..256 RGB triples, before
          // any IDAT; duplicated/odd-length/late PLTE → None
          if (!sawIhdr || !crcOk()) return None
          if (paletted) {
            if (palette != null || idatParts.nonEmpty ||
                len == 0 || len % 3 != 0 || len > 256 * 3) return None
            val n = len.toInt / 3
            palette = Array.tabulate(n)(k => luma(
              u8(b, dataOff + 3 * k), u8(b, dataOff + 3 * k + 1),
              u8(b, dataOff + 3 * k + 2)))
          }
        case "IDAT" =>
          if (!sawIhdr || !crcOk()) return None
          idatParts += ((dataOff, len.toInt))
          idatLen += len
        case "IEND" =>
          if (!sawIhdr || len != 0 || !crcOk()) return None
          sawIend = true
        case _ =>
          if (!sawIhdr) return None // IHDR must be the first chunk
          // An unrecognized CRITICAL chunk (uppercase first type
          // letter, ancillary bit clear) is a fatal error per the PNG
          // spec — decoding pixels past one would contradict the
          // file's own declared requirements. Lowercase ancillary
          // chunks are skipped: CRC not enforced — they carry no
          // pixel data on accepted paths.
          if ((b(pos + 4) & 0x20) == 0) return None
      }
      pos += 12 + len.toInt
    }
    if (idatParts.isEmpty) return None
    if (paletted && palette == null) return None

    // ---- pass geometry (§8.2): sequential is the single full-image
    // pass; Adam7 is seven strided passes, each its own scanline
    // group (its own filter context, empty passes absent entirely).
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced)
        Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      else Array((0, 0, 1, 1))
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
      (pw, ph)
    }

    // ---- inflate budget, then the zlib stream itself. Raw stream =
    // per live pass, ph scanlines of (1 filter byte + pw·channels).
    val rawLen = passDims.map { case (pw, ph) =>
      if (pw > 0 && ph > 0) ph.toLong * (1L + pw.toLong * channels) else 0L
    }.sum
    if (rawLen == 0 || rawLen > Int.MaxValue || rawLen > MaxInflateRatio * idatLen) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      var outOff = 0
      var part = 0
      while (outOff < raw.length) {
        if (inf.needsInput()) {
          if (part >= idatParts.length) return None // truncated stream
          val (off, len) = idatParts(part)
          inf.setInput(b, off, len)
          part += 1
        }
        val n = inf.inflate(raw, outOff, raw.length - outOff)
        if (n == 0 && inf.finished()) return None // short stream
        // A zlib header with the FDICT flag set makes inflate() return
        // 0 with needsDictionary() true while neither finished() nor
        // needsInput() fires — neither exit condition above would ever
        // trigger and this loop would spin forever on one crafted
        // image (CRCs can be valid on such a file). PNG forbids preset
        // dictionaries, so the state is simply corrupt input → None.
        if (n == 0 && !inf.finished() && !inf.needsInput()) return None
        outOff += n
      }
      // Drain: a conforming stream ends exactly at rawLen. Feed any
      // remaining parts so `finished()` can be observed; extra RAW
      // bytes beyond rawLen mean a dimension/stream mismatch → None.
      val scratch = new Array[Byte](64)
      var guard = idatParts.length + 4
      while (!inf.finished() && guard > 0) {
        if (inf.needsInput()) {
          if (part >= idatParts.length) return None
          val (off, len) = idatParts(part)
          inf.setInput(b, off, len)
          part += 1
        }
        if (inf.inflate(scratch, 0, scratch.length) > 0) return None
        guard -= 1
      }
      if (!inf.finished()) return None
    } catch {
      case _: DataFormatException => return None
    } finally inf.end()

    // ---- unfilter (§9): per scanline, filter byte then bytes; the
    // reconstruction references are Recon(a)=left, Recon(b)=up,
    // Recon(c)=up-left, at `bpp` byte offsets, zero off-image —
    // per PASS (each pass restarts with a zero row above it), pixels
    // landing at the pass's strided positions.
    val bpp = channels
    val lum = new Array[Int](width * height)
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = passDims(pi)
      if (pw > 0 && ph > 0) {
        val stride = pw * channels
        val cur = new Array[Int](stride)
        val prev = new Array[Int](stride) // zeros above the pass's first row
        var y = 0
        while (y < ph) {
          val ft = u8(raw, base)
          if (ft > 4) return None
          var x = 0
          while (x < stride) {
            val v = u8(raw, base + 1 + x)
            val a = if (x >= bpp) cur(x - bpp) else 0
            val up = prev(x)
            val c = if (x >= bpp) prev(x - bpp) else 0
            val recon = ft match {
              case 0 => v
              case 1 => v + a
              case 2 => v + up
              case 3 => v + ((a + up) >> 1)
              case 4 => // Paeth predictor (§9.4)
                val p = a + up - c
                val pa = math.abs(p - a)
                val pb = math.abs(p - up)
                val pc = math.abs(p - c)
                val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
                v + pred
            }
            cur(x) = recon & 0xff
            x += 1
          }
          var px = 0
          while (px < pw) {
            val o = px * channels
            lum((y0 + y * dy) * width + (x0 + px * dx)) =
              if (paletted) {
                val idx = cur(o)
                if (idx >= palette.length) return None // §11.2.2: an error
                palette(idx)
              } else channels match {
                case 1 | 2 => cur(o) // gray (alpha, if any, ignored)
                case _ => luma(cur(o), cur(o + 1), cur(o + 2))
              }
            px += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          base += 1 + stride
          y += 1
        }
      }
      pi += 1
    }
    Some((width, height, lum))
  }
}
