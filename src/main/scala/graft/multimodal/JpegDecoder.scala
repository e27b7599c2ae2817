package graft.multimodal

/** Baseline-sequential JPEG decoder — the one Huffman + IDCT path
  * (ITU-T T.81 baseline: SOF0/SOF1, 8-bit samples, Huffman entropy
  * coding, 1- or 3-component, any 1–2× sampling factors, restart
  * markers). This closes the dominant real-image gap in the
  * perceptual-hash dedup chain: `mm6`/`mm7` previously saw pixels only
  * for the codec-free formats (PPM/BMP); JPEG now decodes through the
  * same [[Multimodal.PixelDecoder]] → dHash/aHash → Manku-block
  * pipeline. Reference scope: the reference has no media handling at
  * all; this is a north-star LLM-pipeline component.
  *
  * Honesty contract (the [[Multimodal.StubDecoder]] discipline):
  * anything this decoder cannot decode EXACTLY returns None — the
  * null-hash row — never fabricated pixels. That includes progressive
  * (SOF2) and every other non-baseline frame type, arithmetic coding,
  * 12-bit precision, 16-bit quantization tables, component counts
  * other than 1 or 3, truncated streams, and invalid Huffman codes.
  *
  * Output: row-major TOP-DOWN integer luma. Grayscale returns Y
  * directly. Color converts JFIF YCbCr → RGB per pixel
  * (`R = Y + 1.402·(Cr−128)` etc., rounded, clamped) with
  * nearest-sample chroma upsampling (`sx = x·Hc/Hmax`, integer
  * division — same deterministic grid rule as
  * [[Multimodal.PixelDecoder.sampleGrid]]), then applies the shared
  * integer luma formula `(299·R + 587·G + 114·B) / 1000`, so JPEG
  * rows hash under exactly the same arithmetic as PPM/BMP rows.
  *
  * IDCT is the direct double-precision 2-D separable form with
  * round-to-nearest — bit-stable across platforms for the fixture
  * coefficients (the gate uses DC-only blocks whose IDCT is exact in
  * binary floating point); a production SIMD/AAN kernel would slot in
  * behind the same block interface.
  *
  * 100 TB shape: pure per-row byte work inside `mapPartitions`
  * ([[Multimodal.imageHashes]]) — bytes never shuffle, nothing
  * collects; cost is linear in pixels. */
private[multimodal] object JpegDecoder {

  /** Same crafted-header cap as the other pixel decoders. */
  private val MaxPixelDim = 16384

  /** Zigzag index: position k of the scan order → natural (row-major)
    * coefficient index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(x)(u) = cos((2x+1)·u·π/16). */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman decode table (T.81 F.2.2.3): `bits(l)` = number
    * of codes of length l+1, `vals` in code order. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** Next Huffman-coded symbol, or -1 on exhausted/invalid input. */
    def decode(r: BitReader): Int = {
      var code = r.nextBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16 && (maxcode(l) < 0 || code > maxcode(l))) {
        val b = r.nextBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      if (l > 16) -1
      else {
        val idx = valptr(l) + code - mincode(l)
        if (idx < 0 || idx >= vals.length) -1 else vals(idx)
      }
    }
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing. Hitting a real
    * marker (0xFF followed by non-zero) stops bit delivery and leaves
    * `pos` at the 0xFF so the caller can inspect/consume the marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var atMarker = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (atMarker || pos >= b.length) return -1
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { atMarker = true; return -1 }
          val m = b(pos + 1) & 0xff
          if (m == 0) { pos += 2; bitBuf = 0xff; bitCnt = 8 }
          else { atMarker = true; return -1 }
        } else { pos += 1; bitBuf = v; bitCnt = 8 }
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    /** `n` raw bits MSB-first, or -1 on exhaustion. n ≤ 16. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return -1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def consumeRst(): Boolean = {
      bitCnt = 0
      atMarker = false
      if (pos + 1 >= b.length) return false
      val ff = b(pos) & 0xff
      val m = b(pos + 1) & 0xff
      if (ff == 0xff && m >= 0xd0 && m <= 0xd7) { pos += 2; true }
      else false
    }
  }

  /** DIFF extension (T.81 F.2.2.1): map `v` of category `t` to its
    * signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Dequantize + dezigzag + IDCT + level shift → 64 clamped samples
    * row-major. */
  private def idctBlock(zz: Array[Int], quant: Array[Int]): Array[Int] = {
    val coef = new Array[Double](64)
    var k = 0
    while (k < 64) {
      coef(Zigzag(k)) = (zz(k) * quant(k)).toDouble
      k += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            s += cu * cv * coef(v * 8 + u) * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = clamp255(math.round(s / 4.0).toInt + 128)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode one block's zigzag coefficient vector; returns the new DC
    * predictor or None on any entropy error. */
  private def decodeBlock(
      r: BitReader, dc: Huff, ac: Huff, pred: Int,
      zz: Array[Int]): Option[Int] = {
    java.util.Arrays.fill(zz, 0)
    val t = dc.decode(r)
    if (t < 0 || t > 11) return None
    val dv = if (t == 0) 0 else { val v = r.receive(t); if (v < 0) return None; extend(v, t) }
    val dcVal = pred + dv
    zz(0) = dcVal
    var k = 1
    while (k < 64) {
      val rs = ac.decode(r)
      if (rs < 0) return None
      val run = rs >> 4
      val size = rs & 0xf
      if (size == 0) {
        if (run == 0) k = 64 // EOB
        else if (run == 15) k += 16 // ZRL
        else return None
      } else {
        k += run
        if (k > 63) return None
        val v = r.receive(size)
        if (v < 0) return None
        zz(k) = extend(v, size)
        k += 1
      }
    }
    Some(dcVal)
  }

  /** Decode a baseline JPEG to (width, height, top-down luma), or
    * None on anything non-baseline, truncated, or invalid. */
  def decodeLuma(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var pos = 2

    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      // skip fill bytes
      while (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length) return None
      val marker = b(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => return None // EOI before any scan
        case 0x01 => () // TEM, no payload
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, no payload
        case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
          if (pos + 2 > b.length) return None
          val len = u16(pos)
          if (pos + len > b.length || len < 8) return None
          val precision = b(pos + 2) & 0xff
          height = u16(pos + 3)
          width = u16(pos + 5)
          val nc = b(pos + 7) & 0xff
          if (precision != 8 || (nc != 1 && nc != 3)) return None
          if (width <= 0 || height <= 0 ||
            width > MaxPixelDim || height > MaxPixelDim) return None
          if (len != 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = b(o + 1) & 0xff
            Component(b(o) & 0xff, hv >> 4, hv & 0xf, b(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
            return None
          pos += len
        case m if (m >= 0xc2 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // progressive, lossless, arithmetic, hierarchical: honest None
        case 0xc8 | 0xcc => return None // JPG extension / DAC
        case 0xc4 => // DHT (possibly several tables)
          if (pos + 2 > b.length) return None
          val len = u16(pos)
          if (pos + len > b.length) return None
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            if (o + 17 > end) return None
            val tc = (b(o) & 0xff) >> 4
            val th = (b(o) & 0xff) & 0xf
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
            val n = bits.sum
            if (o + 17 + n > end || n > 256) return None
            val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
            val huff = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
            o += 17 + n
          }
          pos += len
        case 0xdb => // DQT (possibly several tables)
          if (pos + 2 > b.length) return None
          val len = u16(pos)
          if (pos + len > b.length) return None
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            val pq = (b(o) & 0xff) >> 4
            val tq = (b(o) & 0xff) & 0xf
            if (pq != 0 || tq > 3) return None // 16-bit tables: not baseline
            if (o + 65 > end) return None
            var i = 0
            while (i < 64) { quant(tq)(i) = b(o + 1 + i) & 0xff; i += 1 }
            quantSeen(tq) = true
            o += 65
          }
          pos += len
        case 0xdd => // DRI
          if (pos + 4 > b.length) return None
          val len = u16(pos)
          if (len != 4) return None
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda => // SOS → decode the single sequential scan
          if (comps == null) return None
          if (pos + 2 > b.length) return None
          val len = u16(pos)
          if (pos + len > b.length) return None
          val ns = b(pos + 2) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cid = b(pos + 3 + 2 * i) & 0xff
            val tt = b(pos + 4 + 2 * i) & 0xff
            // Table-id range check (baseline restricts ids to 0–1; ≤3
            // matches the table-array size — same guard SOF/DHT apply).
            if ((tt >> 4) > 3 || (tt & 0xf) > 3) return None
            comps.find(_.id == cid) match {
              case Some(c) => c.dcTab = tt >> 4; c.acTab = tt & 0xf
              case None => return None
            }
            i += 1
          }
          return decodeScan(b, pos + len, comps, width, height,
            quant, quantSeen, dcTabs, acTabs, restartInterval)
        case _ => // APPn, COM, anything else with a length: skip
          if (pos + 2 > b.length) return None
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
      }
    }
    None
  }

  private def decodeScan(
      b: Array[Byte], start: Int, comps0: Array[Component],
      width: Int, height: Int,
      quant: Array[Array[Int]], quantSeen: Array[Boolean],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int): Option[(Int, Int, Array[Int])] = {
    // T.81 A.2: a scan with ONE component is non-interleaved — the MCU
    // is a single data unit and blocks cover the component at full
    // resolution in raster order, regardless of declared sampling
    // factors. With nc == 1, h/hmax = v/vmax = 1, so decoding with
    // effective 1×1 factors is exactly that order.
    val comps =
      if (comps0.length == 1 && (comps0(0).h > 1 || comps0(0).v > 1))
        Array(comps0(0).copy(h = 1, v = 1))
      else comps0
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val nc = comps.length
    // sanity: required tables present
    var i = 0
    while (i < nc) {
      val c = comps(i)
      if (!quantSeen(c.tq) || dcTabs(c.dcTab) == null || acTabs(c.acTab) == null)
        return None
      i += 1
    }
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    // Allocation budget: unlike PPM/BMP, header dims alone don't bound
    // the payload, so a few-hundred-byte stream could claim gigabyte
    // planes. Every coded block consumes ≥ 1 entropy bit (its DC
    // symbol), so the declared block count can't exceed 8× the
    // remaining entropy bytes for any decodable stream — reject
    // anything larger before allocating.
    val totalBlocks = (0 until nc).map(ci =>
      mcusX.toLong * mcusY.toLong * comps(ci).h * comps(ci).v).sum
    if (totalBlocks > 8L * math.max(0, b.length - start)) return None
    val planes = Array.tabulate(nc)(ci => new Array[Int](planeW(ci) * planeH(ci)))
    val preds = new Array[Int](nc)
    val zz = new Array[Int](64)
    val r = new BitReader(b, start)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!r.consumeRst()) return None
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < nc) {
          val c = comps(ci)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              decodeBlock(r, dcTabs(c.dcTab), acTabs(c.acTab), preds(ci), zz) match {
                case Some(p) => preds(ci) = p
                case None => return None
              }
              val samples = idctBlock(zz, quant(c.tq))
              val bx = (mx * c.h + bh) * 8
              val by = (my * c.v + bv) * 8
              val pw = planeW(ci)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((by + yy) * pw + bx + xx) = samples(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // Compose top-down luma.
    val out = new Array[Int](width * height)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out(y * width + x) = planes(0)(y * pw + x); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sampleOf(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hmax
            val sy = y * c.v / vmax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yv = sampleOf(0)
          val cb = sampleOf(1) - 128
          val cr = sampleOf(2) - 128
          val rr = clamp255(math.round(yv + 1.402 * cr).toInt)
          val gg = clamp255(math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt)
          val bb = clamp255(math.round(yv + 1.772 * cb).toInt)
          out(y * width + x) = luma(rr, gg, bb)
          x += 1
        }
        y += 1
      }
    }
    Some((width, height, out))
  }
}
