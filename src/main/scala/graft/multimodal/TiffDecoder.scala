package graft.multimodal

/** Baseline TIFF 6.0 still-image decoder for the UNCOMPRESSED 8-bit
  * subset — the scanned-document/archival staple next to the web
  * formats: header (both byte orders, "II*\0" / "MM\0*"), first-IFD
  * tag walk, strip-table resolve, and contiguous-planar sample read,
  * feeding the same [[Multimodal.PixelDecoder]] → dHash/aHash →
  * Manku-block dedup chain as PPM/BMP/JPEG/PNG/GIF. Reference scope:
  * the reference has no media handling at all; this is a north-star
  * LLM-pipeline component.
  *
  * Honesty contract (the [[Multimodal.StubDecoder]] discipline):
  * anything this decoder cannot decode EXACTLY returns None — the
  * null-hash row — never fabricated pixels. That includes every
  * Compression other than 1 (none), bit depths other than 8,
  * palette/YCbCr/CMYK photometric interpretations, planar
  * configuration 2, tiled images, multi-IFD (multi-page) files where
  * pixels would be ambiguous (only the FIRST IFD is read; a nonzero
  * next-IFD offset → None), missing/inconsistent strip tables, and
  * truncation anywhere. PhotometricInterpretation 0 (white-is-zero)
  * inverts honestly; 1 (black-is-zero) reads direct; 2 (RGB, 3 or 4
  * samples with extra alpha ignored) lands on the shared integer
  * luma formula, so TIFF rows hash under exactly the same arithmetic
  * as every other decoder here.
  *
  * 100 TB shape: pure per-row byte work inside `mapPartitions`
  * ([[Multimodal.imageHashes]]) — bytes never shuffle, nothing
  * collects; cost is linear in pixels. */
private[multimodal] object TiffDecoder {

  /** Same crafted-header cap as the other pixel decoders. */
  private val MaxPixelDim = 16384

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 8) return None
    val le =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
      else return None

    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int =
      if (le) (u8(i + 1) << 8) | u8(i) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u16(i + 2).toLong << 16) | u16(i)
      else (u16(i).toLong << 16) | u16(i + 2)

    val ifdOff = u32(4)
    if (ifdOff < 8 || ifdOff + 2 > b.length) return None
    val ifd = ifdOff.toInt
    val nTags = u16(ifd)
    if (ifd + 2 + 12 * nTags + 4 > b.length) return None
    if (u32(ifd + 2 + 12 * nTags) != 0) return None // multi-page → None

    // ---- tag walk: SHORT(3) and LONG(4) scalar/array values only —
    // everything this subset needs; RATIONAL resolution tags are
    // skipped unread.
    final case class Entry(typ: Int, count: Long, at: Int)
    var width = -1L
    var height = -1L
    var photometric = -1
    var compression = 1
    var samplesPerPixel = 1
    var planarConfig = 1
    var bitsEntry: Option[Entry] = None
    var stripOffsets: Option[Entry] = None
    var stripCounts: Option[Entry] = None
    var rowsPerStrip = Long.MaxValue // default: one strip of all rows

    def entryValue(e: Entry, k: Int): Long = e.typ match {
      case 3 => u16(e.at + 2 * k).toLong
      case 4 => u32(e.at + 4 * k)
      case _ => -1L
    }
    def scalar(e: Entry): Long = if (e.count == 1) entryValue(e, 0) else -1L

    var t = 0
    while (t < nTags) {
      val p = ifd + 2 + 12 * t
      val tag = u16(p)
      val typ = u16(p + 2)
      val count = u32(p + 4)
      val elemSize = typ match {
        case 1 | 2 | 6 | 7 => 1L
        case 3 => 2L
        case 4 => 4L
        case 5 | 10 => 8L
        case _ => -1L
      }
      if (elemSize > 0) {
        val byteLen = elemSize * count
        val at = if (byteLen <= 4) p + 8 else u32(p + 8).toInt
        if (byteLen > 4 && (at < 8 || at + byteLen > b.length)) return None
        val e = Entry(typ, count, at)
        tag match {
          case 0x100 => width = scalar(e)
          case 0x101 => height = scalar(e)
          case 0x102 => bitsEntry = Some(e)
          case 0x103 => compression = scalar(e).toInt
          case 0x106 => photometric = scalar(e).toInt
          case 0x111 => stripOffsets = Some(e)
          case 0x115 => samplesPerPixel = scalar(e).toInt
          case 0x116 => rowsPerStrip = scalar(e)
          case 0x117 => stripCounts = Some(e)
          case 0x11c => planarConfig = scalar(e).toInt
          case _ => () // resolution/software/etc.: pixels unaffected
        }
      }
      t += 1
    }

    // ---- subset checks
    if (width <= 0 || height <= 0 ||
        width > MaxPixelDim || height > MaxPixelDim) return None
    if (compression != 1 || planarConfig != 1) return None
    val channels = photometric match {
      case 0 | 1 => 1 // gray (0 = white-is-zero, inverted below)
      case 2 => samplesPerPixel // RGB (+ ignored extra samples)
      case _ => return None // palette/YCbCr/CMYK/…: honest None
    }
    if (photometric == 2 && (samplesPerPixel < 3 || samplesPerPixel > 4)) return None
    if (photometric != 2 && samplesPerPixel != 1) return None
    bitsEntry match {
      case None => return None // BitsPerSample defaults to 1-bit: not this subset
      case Some(e) =>
        if (e.count != channels) return None
        var k = 0
        while (k < channels) {
          if (entryValue(e, k) != 8) return None
          k += 1
        }
    }
    val (offs, cnts) = (stripOffsets, stripCounts) match {
      case (Some(o), Some(c)) if o.count == c.count && o.count > 0 => (o, c)
      case _ => return None
    }
    val rps = if (rowsPerStrip <= 0) return None else math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps
    if (nStrips != offs.count) return None

    // ---- gather strips into the contiguous sample stream; every
    // strip must hold exactly its rows × rowBytes (no padding, no
    // overlap ambiguity — inconsistent tables are corrupt files).
    val w = width.toInt
    val h = height.toInt
    val rowBytes = w.toLong * channels
    val lum = new Array[Int](w * h)
    var strip = 0
    var row = 0
    while (strip < nStrips.toInt) {
      val off = entryValue(offs, strip)
      val cnt = entryValue(cnts, strip)
      val rows = math.min(rps, height - strip * rps).toInt
      if (off < 0 || cnt != rows * rowBytes ||
          off + cnt > b.length) return None
      var r = 0
      while (r < rows) {
        val base = (off + r * rowBytes).toInt
        var x = 0
        while (x < w) {
          val v = channels match {
            case 1 =>
              val g = u8(base + x)
              if (photometric == 0) 255 - g else g
            case _ =>
              luma(u8(base + x * channels), u8(base + x * channels + 1),
                u8(base + x * channels + 2))
          }
          lum(row * w + x) = v
          x += 1
        }
        row += 1
        r += 1
      }
      strip += 1
    }
    Some((w, h, lum))
  }
}
