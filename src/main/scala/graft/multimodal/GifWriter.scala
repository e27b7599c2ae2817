package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Minimal GIF89a writer — the fixture generator behind the
  * `mm12_gif_dhash` gate and the GifDecoder specs. Emits fully
  * standard streams (header, logical screen descriptor, global OR
  * local color table, image descriptor with optional 4-pass
  * interlace, LZW image data in ≤255-byte sub-blocks, trailer) whose
  * LZW stream uses the classic "uncompressed" encoding: a CLEAR code
  * then root-literal codes in groups small enough that the code
  * width never grows (a fresh CLEAR before the dictionary would
  * cross a width boundary) — byte-exact, decodable by any conforming
  * decoder, and trivially replayable. Refused-variant stubs
  * (animated, partial-frame) cover the honesty contract. */
private[graft] object GifWriter {

  /** LSB-first bit writer packing into ≤255-byte GIF sub-blocks. */
  private final class LzwStream {
    private val bytes = ArrayBuffer.empty[Byte]
    private var bitBuf = 0
    private var bits = 0
    def put(code: Int, width: Int): Unit = {
      bitBuf |= code << bits
      bits += width
      while (bits >= 8) {
        bytes += (bitBuf & 0xff).toByte
        bitBuf >>>= 8
        bits -= 8
      }
    }
    def subBlocks(): Array[Byte] = {
      if (bits > 0) { bytes += (bitBuf & 0xff).toByte; bits = 0 }
      val out = ArrayBuffer.empty[Byte]
      var i = 0
      while (i < bytes.length) {
        val n = math.min(255, bytes.length - i)
        out += n.toByte
        out ++= bytes.slice(i, i + n)
        i += n
      }
      out += 0 // block terminator
      out.toArray
    }
  }

  /** Uncompressed-style LZW for an 8-bit index stream (mcs = 8,
    * clear = 256, end = 257, all codes 9-bit): CLEAR, then ≤254
    * literals per group — the decoder's dictionary stays below 512,
    * so the width never grows. */
  private def lzw8(indices: Array[Int]): Array[Byte] = {
    val s = new LzwStream
    val clear = 256
    var i = 0
    while (i < indices.length) {
      s.put(clear, 9)
      val n = math.min(254, indices.length - i)
      var k = 0
      while (k < n) { s.put(indices(i + k), 9); k += 1 }
      i += n
    }
    if (indices.isEmpty) s.put(clear, 9)
    s.put(clear + 1, 9) // end
    s.subBlocks()
  }

  private def le16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
  }

  private def table256(pal: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(pal.size <= 256, s"palette size ${pal.size}")
    val full = pal ++ Seq.fill(256 - pal.size)((0, 0, 0))
    full.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray
  }

  /** The 4-pass interlace row sequence (matches the decoder). */
  private def interlaceOrder(h: Int): Array[Int] = {
    val order = ArrayBuffer.empty[Int]
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { order += r; r += step }
    }
    order.toArray
  }

  /** General writer: 8-bit indices into a ≤256-entry palette (padded
    * to 256 on disk — mcs is fixed at 8), sequential or interlaced
    * row layout, palette in the global or the local table. */
  def gif(w: Int, h: Int, pal: Seq[(Int, Int, Int)], indices: Array[Int],
      interlaced: Boolean = false, localTable: Boolean = false): Array[Byte] = {
    require(indices.length == w * h, s"need ${w * h} indices, got ${indices.length}")
    val out = ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    le16(out, w); le16(out, h)
    out += (if (localTable) 0x00 else 0xf7).toByte // global flag + size 7
    out += 0 // background color index
    out += 0 // pixel aspect ratio
    if (!localTable) out ++= table256(pal)
    out += 0x2c.toByte // image descriptor
    le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
    out += (((if (localTable) 0x87 else 0x00) |
      (if (interlaced) 0x40 else 0x00)) & 0xff).toByte
    if (localTable) out ++= table256(pal)
    out += 8 // LZW minimum code size
    val rows =
      if (interlaced) interlaceOrder(h).flatMap(r =>
        indices.slice(r * w, (r + 1) * w))
      else indices
    out ++= lzw8(rows)
    out += 0x3b.toByte // trailer
    out.toArray
  }

  /** Grayscale convenience: identity 256-gray palette, pixel = index. */
  def gray(w: Int, h: Int, lum: Array[Int],
      interlaced: Boolean = false, localTable: Boolean = false): Array[Byte] =
    gif(w, h, (0 until 256).map(v => (v, v, v)), lum, interlaced, localTable)

  /** TWO image descriptors — an animation. Must return None (frame 1
    * alone is not "the image"). */
  def animatedStub(w: Int, h: Int): Array[Byte] = {
    val one = gray(w, h, new Array[Int](w * h))
    val out = ArrayBuffer.empty[Byte]
    out ++= one.dropRight(1) // keep everything up to (not incl.) trailer
    // second frame: descriptor + data, then the trailer
    out += 0x2c.toByte
    le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
    out += 0x00
    out += 8
    out ++= lzw8(new Array[Int](w * h))
    out += 0x3b.toByte
    out.toArray
  }

  /** A frame that does NOT cover the logical screen (left = 1):
    * compositing territory — must return None. */
  def partialFrameStub(w: Int, h: Int): Array[Byte] = {
    val full = gray(w, h, new Array[Int](w * h))
    // patch the image descriptor's left from 0 to 1: descriptor starts
    // after header(6)+screen(7)+global table(768); left at +1..2
    val at = 6 + 7 + 768 + 1
    full(at) = 1
    // shrink width by 1 so left+w == screen width stays in range
    val wAt = at + 4
    full(wAt) = ((w - 1) & 0xff).toByte
    full(wAt + 1) = (((w - 1) >> 8) & 0xff).toByte
    full
  }
}
