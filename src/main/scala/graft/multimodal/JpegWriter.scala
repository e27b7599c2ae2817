package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Minimal baseline-JPEG writer for DC-only images — the fixture
  * generator behind the `mm9_jpeg_dhash` gate and the JpegDecoder
  * specs. It emits fully standard T.81 baseline streams (SOI, JFIF
  * APP0, DQT, SOF0, DHT, optional DRI + restart markers, SOS, Huffman
  * entropy data with 0xFF byte stuffing, EOI) whose blocks carry ONLY
  * a quantized DC coefficient. DC-only blocks make the decoded pixels
  * exactly computable — the IDCT of a lone DC term is the flat value
  * `dc·Q₀/8`, so with Q₀ = 16 every sample is `2·dc + 128` with no
  * rounding ambiguity — which is what lets a SQL oracle reproduce the
  * decoder's output bit-for-bit while the decoder itself still runs
  * the full Huffman → dequant → IDCT path (the AC machinery is
  * exercised separately in MultimodalSpec with hand-computed IDCTs).
  *
  * Tables: the standard Annex K.3.1 DC-luminance Huffman table, and a
  * deliberately minimal-but-legal AC table holding the single EOB
  * symbol (one 1-bit code) — every block's AC spectrum is empty, so
  * nothing else is ever coded. */
private[graft] object JpegWriter {

  /** T.81 Annex K.3.1 DC luminance table: code counts per length
    * 1..16, then values (categories 0..11) in code order. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  /** Minimal AC table: the EOB symbol (0x00) as the single 1-bit code. */
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0x00)

  /** T.81 Annex K.3.2 AC luminance table — used by [[grayFromCoefs]],
    * whose blocks may carry real AC spectra (run-length coded). */
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical (code, length) per symbol value. */
  private def codesOf(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        m += vals(k) -> ((code, l))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    m.result()
  }
  private val DcCodes = codesOf(DcBits, DcVals)
  private val AcCodes = codesOf(AcBits, AcVals)

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var buf = 0
    private var cnt = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out += buf.toByte
          if (buf == 0xff) out += 0x00.toByte // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 convention). */
    def flush(): Unit = if (cnt > 0) { write((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  private def seg(out: ArrayBuffer[Byte], marker: Int, payload: Array[Int]): Unit = {
    out += 0xff.toByte
    out += marker.toByte
    val len = payload.length + 2
    out += ((len >> 8) & 0xff).toByte
    out += (len & 0xff).toByte
    payload.foreach(v => out += (v & 0xff).toByte)
  }

  private def app0: Array[Int] =
    Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)

  private def dqt(tq: Int, q: Int): Array[Int] = (tq +: Array.fill(64)(q))

  private def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
    ((tc << 4) | th) +: (bits ++ vals)

  /** sof0 payload: precision 8, height, width, then (id, HV, tq) per
    * component. */
  private def sof0(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Int] =
    Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, comps.length) ++
      comps.flatMap { case (id, hs, vs, tq) => Seq(id, (hs << 4) | vs, tq) }

  private def sos(comps: Seq[(Int, Int, Int)]): Array[Int] =
    ((comps.length +: comps.flatMap { case (id, dc, ac) => Seq(id, (dc << 4) | ac) }) ++
      Seq(0, 63, 0)).toArray

  /** DC category (bit length of |diff|). */
  private def category(diff: Int): Int =
    if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))

  private def writeDcOnlyBlock(w: BitWriter, diff: Int): Unit = {
    val cat = category(diff)
    val (code, len) = DcCodes(cat)
    w.write(code, len)
    if (cat > 0) {
      val v = if (diff >= 0) diff else diff + (1 << cat) - 1
      w.write(v, cat)
    }
    val (eob, eobLen) = AcCodes(0x00)
    w.write(eob, eobLen)
  }

  /** Grayscale DC-only baseline JPEG: `dc(by·blocksX + bx)` is each
    * block's ABSOLUTE quantized DC value; every decoded sample of that
    * block is `clamp(dc·q/8 + 128)`. `restartInterval` > 0 emits DRI
    * and RSTn markers every that-many MCUs (one block = one MCU). */
  def grayDcOnly(w: Int, h: Int, dc: Array[Int], q: Int = 16,
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"fixture dims must be block-aligned: ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(dc.length == bx * by, s"need ${bx * by} DC values, got ${dc.length}")
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    seg(out, 0xe0, app0)
    seg(out, 0xdb, dqt(0, q))
    seg(out, 0xc0, sof0(w, h, Seq((1, 1, 1, 0))))
    seg(out, 0xc4, dht(0, 0, DcBits, DcVals))
    seg(out, 0xc4, dht(1, 0, AcBits, AcVals))
    if (restartInterval > 0)
      seg(out, 0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(out, 0xda, sos(Seq((1, 0, 0))))
    var bw = new BitWriter(out)
    var pred = 0
    var rst = 0
    var i = 0
    while (i < dc.length) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.flush()
        out += 0xff.toByte
        out += (0xd0 + (rst % 8)).toByte
        rst += 1
        pred = 0
        bw = new BitWriter(out)
      }
      writeDcOnlyBlock(bw, dc(i) - pred)
      pred = dc(i)
      i += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** Grayscale baseline JPEG from full QUANTIZED coefficient blocks
    * (zigzag order, 64 entries each, raster block order) — real DC
    * categories plus run-length AC coding under the standard Annex
    * K.3.2 AC table (ZRL for >15-zero runs, EOB for trailing zeros).
    * Exercises the decoder's complete entropy path; used by the AC
    * IDCT specs. */
  def grayFromCoefs(w: Int, h: Int, blocks: Array[Array[Int]],
      q: Int = 16): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"fixture dims must be block-aligned: ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(blocks.length == bx * by, s"need ${bx * by} blocks, got ${blocks.length}")
    require(blocks.forall(_.length == 64), "each block needs 64 zigzag coefficients")
    val acCodes = codesOf(AcLumBits, AcLumVals)
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte
    seg(out, 0xe0, app0)
    seg(out, 0xdb, dqt(0, q))
    seg(out, 0xc0, sof0(w, h, Seq((1, 1, 1, 0))))
    seg(out, 0xc4, dht(0, 0, DcBits, DcVals))
    seg(out, 0xc4, dht(1, 0, AcLumBits, AcLumVals))
    seg(out, 0xda, sos(Seq((1, 0, 0))))
    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { zz =>
      val diff = zz(0) - pred
      pred = zz(0)
      val cat = category(diff)
      val (dcCode, dcLen) = DcCodes(cat)
      bw.write(dcCode, dcLen)
      if (cat > 0) {
        val v = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.write(v, cat)
      }
      var k = 1
      var run = 0
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) {
            val (zrl, zrlLen) = acCodes(0xf0)
            bw.write(zrl, zrlLen)
            run -= 16
          }
          val size = category(zz(k))
          val (code, len) = acCodes((run << 4) | size)
          bw.write(code, len)
          val v = if (zz(k) >= 0) zz(k) else zz(k) + (1 << size) - 1
          bw.write(v, size)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (eob, eobLen) = acCodes(0x00); bw.write(eob, eobLen) }
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }

  /** Color 4:2:0 DC-only baseline JPEG with NEUTRAL chroma (Cb = Cr =
    * 128, i.e. chroma coefficients all zero): dims must be multiples
    * of 16 (one 16×16 MCU = 4 luma blocks + 1 Cb + 1 Cr). `dcY` is
    * indexed by luma block raster position (by·(w/8) + bx); decoded
    * luma of a block is `clamp(dc·q/8 + 128)` — with neutral chroma
    * the YCbCr→RGB→luma round trip returns Y exactly. */
  def colorDcOnly420(w: Int, h: Int, dcY: Array[Int], q: Int = 16): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, s"4:2:0 fixture dims must be MCU-aligned: ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(dcY.length == bx * by, s"need ${bx * by} luma DC values, got ${dcY.length}")
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte
    seg(out, 0xe0, app0)
    seg(out, 0xdb, dqt(0, q))
    seg(out, 0xdb, dqt(1, q))
    seg(out, 0xc0, sof0(w, h, Seq((1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1))))
    seg(out, 0xc4, dht(0, 0, DcBits, DcVals))
    seg(out, 0xc4, dht(1, 0, AcBits, AcVals))
    seg(out, 0xda, sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))))
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    val mcusX = w / 16
    val mcusY = h / 16
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // luma: 2×2 blocks, v-major then h (T.81 MCU interleave order)
        var v = 0
        while (v < 2) {
          var hh = 0
          while (hh < 2) {
            val blk = (my * 2 + v) * bx + (mx * 2 + hh)
            writeDcOnlyBlock(bw, dcY(blk) - preds(0))
            preds(0) = dcY(blk)
            hh += 1
          }
          v += 1
        }
        writeDcOnlyBlock(bw, 0 - preds(1)); preds(1) = 0 // Cb flat 128
        writeDcOnlyBlock(bw, 0 - preds(2)); preds(2) = 0 // Cr flat 128
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }

  /** Grayscale DC-only baseline JPEG whose SOF declares sampling
    * factors `hs`×`vs` > 1×1. Per T.81 A.2 a single-component scan is
    * NON-interleaved regardless of declared factors: the MCU is one
    * data unit and blocks cover the full-resolution component in
    * raster order — exactly the `grayDcOnly` block order. So this
    * fixture must decode to the SAME pixels as `grayDcOnly(w, h, dc,
    * q)`; a decoder that wrongly interleaves (hs·vs blocks per MCU)
    * either scrambles the order or over-reads. */
  def grayDcOnlySampled(w: Int, h: Int, dc: Array[Int], q: Int = 16,
      hs: Int = 2, vs: Int = 2): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"fixture dims must be block-aligned: ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(dc.length == bx * by, s"need ${bx * by} DC values, got ${dc.length}")
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte
    seg(out, 0xe0, app0)
    seg(out, 0xdb, dqt(0, q))
    seg(out, 0xc0, sof0(w, h, Seq((1, hs, vs, 0))))
    seg(out, 0xc4, dht(0, 0, DcBits, DcVals))
    seg(out, 0xc4, dht(1, 0, AcBits, AcVals))
    seg(out, 0xda, sos(Seq((1, 0, 0))))
    val bw = new BitWriter(out)
    var pred = 0
    var i = 0
    while (i < dc.length) {
      writeDcOnlyBlock(bw, dc(i) - pred)
      pred = dc(i)
      i += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }

  /** A well-formed PROGRESSIVE (SOF2) stub: the decoder must return
    * None — the honest null-hash row — never guess. */
  def progressiveStub(w: Int, h: Int): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out += 0xff.toByte; out += 0xd8.toByte
    seg(out, 0xe0, app0)
    seg(out, 0xdb, dqt(0, 16))
    seg(out, 0xc2, sof0(w, h, Seq((1, 1, 1, 0)))) // SOF2: progressive
    seg(out, 0xc4, dht(0, 0, DcBits, DcVals))
    seg(out, 0xda, sos(Seq((1, 0, 0))))
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }
}
