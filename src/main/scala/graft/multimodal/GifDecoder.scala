package graft.multimodal

/** GIF (GIF87a/GIF89a) still-image decoder — the last of the major
  * legacy web image formats next to JPEG/PNG: logical-screen +
  * color-table parse, extension-block skip, and a full LZW
  * decompressor (variable 3–12-bit codes, LSB-first packing, clear/
  * end codes, deferred-clear tolerance), feeding the same
  * [[Multimodal.PixelDecoder]] → dHash/aHash → Manku-block dedup
  * chain as PPM/BMP/JPEG/PNG. Reference scope: the reference has no
  * media handling at all; this is a north-star LLM-pipeline
  * component.
  *
  * Honesty contract (the [[Multimodal.StubDecoder]] discipline):
  * anything this decoder cannot decode EXACTLY returns None — the
  * null-hash row — never fabricated pixels. That includes ANIMATED
  * GIFs (any second image descriptor — frame 1 alone is not "the
  * image"), frames that don't cover the full logical screen,
  * missing color tables, out-of-range pixel indices, invalid LZW
  * codes, short or over-long index streams, and truncation anywhere.
  * Both row layouts decode: sequential and the 4-pass GIF interlace.
  * 89a extension blocks (GCE/comment/application) are skipped;
  * transparency is ignored for hashing like every alpha channel here.
  *
  * Output: row-major TOP-DOWN integer luma — palette entries through
  * the shared `(299·R + 587·G + 114·B) / 1000` formula, so GIF rows
  * hash under exactly the same arithmetic as the other decoders
  * (MultimodalSpec pins GIF ≡ PPM on the same pixel grid and
  * pixel-for-pixel agreement with javax.imageio).
  *
  * 100 TB shape: pure per-row byte work inside `mapPartitions`
  * ([[Multimodal.imageHashes]]) — bytes never shuffle, nothing
  * collects; cost is linear in pixels. */
private[multimodal] object GifDecoder {

  /** Same crafted-header cap as the other pixel decoders. */
  private val MaxPixelDim = 16384

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** The 4-pass interlace row sequence (§ Appendix E): row offsets
    * 0/4/2/1 with strides 8/8/4/2. */
  private val InterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val screenW = le16(b, 6)
    val screenH = le16(b, 8)
    if (screenW <= 0 || screenH <= 0 ||
        screenW > MaxPixelDim || screenH > MaxPixelDim) return None
    val packed = u8(b, 10)
    // bytes 11 (background index) and 12 (aspect ratio) don't affect pixels
    var pos = 13
    var globalPal: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07) // 2^(size+1) entries
      if (pos + 3 * n > b.length) return None
      globalPal = Array.tabulate(n)(k =>
        luma(u8(b, pos + 3 * k), u8(b, pos + 3 * k + 1), u8(b, pos + 3 * k + 2)))
      pos += 3 * n
    }

    def skipSubBlocks(p0: Int): Int = {
      var p = p0
      while (true) {
        if (p >= b.length) return -1
        val len = u8(b, p)
        if (len == 0) return p + 1
        p += 1 + len
      }
      -1
    }

    // ---- walk to the FIRST image descriptor, skipping extensions
    var lum: Array[Int] = null
    var sawImage = false
    var done = false
    while (!done) {
      if (pos >= b.length) return None // truncated before the trailer
      u8(b, pos) match {
        case 0x3b => // trailer
          if (!sawImage) return None
          done = true
        case 0x21 => // extension: label byte + sub-blocks
          if (pos + 2 > b.length) return None
          pos = skipSubBlocks(pos + 2)
          if (pos < 0) return None
        case 0x2c => // image descriptor
          if (sawImage) return None // ANIMATED: honest None, not frame 1
          if (pos + 10 > b.length) return None
          val left = le16(b, pos + 1)
          val top = le16(b, pos + 3)
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val ip = u8(b, pos + 9)
          // the one frame must BE the image: full-screen, origin 0
          if (left != 0 || top != 0 || w != screenW || h != screenH) return None
          val interlaced = (ip & 0x40) != 0
          pos += 10
          var pal = globalPal
          if ((ip & 0x80) != 0) { // local color table wins
            val n = 2 << (ip & 0x07)
            if (pos + 3 * n > b.length) return None
            pal = Array.tabulate(n)(k =>
              luma(u8(b, pos + 3 * k), u8(b, pos + 3 * k + 1), u8(b, pos + 3 * k + 2)))
            pos += 3 * n
          }
          if (pal == null) return None // no color table at all
          if (pos >= b.length) return None
          val mcs = u8(b, pos)
          pos += 1
          if (mcs < 2 || mcs > 8) return None
          // Allocation budget (the JPEG/PNG crafted-header guard's
          // LZW shape): k codes of ≥3 bits can emit at most
          // k·(k+1)/2 indices below the 4096-entry cap and ~4096·k
          // beyond it, so the declared pixel count bounds the
          // MINIMUM stream size — reject a few-byte stream claiming
          // gigapixel dims BEFORE allocating the index planes.
          val maxCodes = (b.length - pos).toLong * 8 / 3
          val maxIndices =
            if (maxCodes <= 4096) maxCodes * (maxCodes + 1) / 2
            else 4096L * 4097 / 2 + 4096L * (maxCodes - 4096)
          if (w.toLong * h > maxIndices) return None
          val idx = new Array[Int](w * h)
          val end = lzwDecode(b, pos, mcs, idx)
          if (end < 0) return None
          pos = end
          // indices → luma through the palette, undoing the 4-pass
          // interlace row order if declared
          lum = new Array[Int](w * h)
          var outRow = 0
          val rowOrder: Int => Int =
            if (!interlaced) (r: Int) => r
            else {
              val order = new Array[Int](h)
              var k = 0
              for ((start, step) <- InterlacePasses) {
                var r = start
                while (r < h) { order(k) = r; k += 1; r += step }
              }
              order(_)
            }
          while (outRow < h) {
            val destRow = rowOrder(outRow)
            var x = 0
            while (x < w) {
              val v = idx(outRow * w + x)
              if (v >= pal.length) return None // out-of-range index
              lum(destRow * w + x) = pal(v)
              x += 1
            }
            outRow += 1
          }
          sawImage = true
        case _ => return None // unknown block label
      }
    }
    Some((screenW, screenH, lum))
  }

  /** LZW decompress (§ Appendix F) from the sub-block stream at `p0`
    * into exactly `out.length` indices. Returns the position after
    * the terminating 0-length sub-block, or -1 on any error: invalid
    * code, stream ending early, or MORE indices than the frame holds
    * (a size mismatch is a corrupt file, not data to truncate). */
  private def lzwDecode(b: Array[Byte], p0: Int, mcs: Int, out: Array[Int]): Int = {
    val clear = 1 << mcs
    val endCode = clear + 1
    // dictionary as prefix links: suffix(c) = last index of entry c,
    // prefix(c) = previous code (−1 for roots)
    val MaxCodes = 4096
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Int](MaxCodes)
    var dictSize = clear + 2
    var width = mcs + 1
    var p = p0 // byte position
    var blockLeft = 0 // bytes left in the current sub-block
    var bitBuf = 0
    var bits = 0
    var outPos = 0
    var prev = -1
    val stack = new Array[Int](MaxCodes)

    def readCode(): Int = {
      while (bits < width) {
        if (blockLeft == 0) {
          if (p >= b.length) return -1
          blockLeft = u8(b, p); p += 1
          if (blockLeft == 0) return -1 // terminator mid-stream
        }
        if (p >= b.length) return -1
        bitBuf |= u8(b, p) << bits
        bits += 8
        p += 1
        blockLeft -= 1
      }
      val code = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width
      bits -= width
      code
    }

    var finished = false
    while (!finished) {
      val code = readCode()
      if (code < 0) return -1
      if (code == clear) {
        dictSize = clear + 2
        width = mcs + 1
        prev = -1
      } else if (code == endCode) {
        finished = true
      } else {
        // expand `code` (or the prev+head special case) onto the stack
        var sp = 0
        var cur = code
        if (code >= dictSize) {
          if (code != dictSize || prev < 0) return -1
          // KwKwK: entry = prev expansion + its own first index
          var h = prev
          while (h >= clear + 2) h = prefix(h)
          stack(sp) = if (h < clear) h else return -1
          sp += 1
          cur = prev
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp >= MaxCodes) return -1
        }
        if (cur >= clear) return -1 // dangling clear/end inside a chain
        stack(sp) = cur; sp += 1
        if (outPos + sp > out.length) return -1 // too MANY indices
        var i = sp - 1
        while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (prev >= 0 && dictSize < MaxCodes) {
          prefix(dictSize) = prev
          suffix(dictSize) = stack(sp - 1) // first index of this expansion
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (outPos != out.length) return -1 // too FEW indices
    // drain to the stream terminator: any unread bytes of the current
    // sub-block, then the 0-length block
    p += blockLeft
    if (p >= b.length) return -1
    var len = u8(b, p); p += 1
    while (len != 0) {
      p += len
      if (p >= b.length) return -1
      len = u8(b, p); p += 1
    }
    p
  }
}
