package graft.multimodal

import java.util.zip.{CRC32, Deflater}
import scala.collection.mutable.ArrayBuffer

/** Minimal PNG (ISO/IEC 15948) writer — the fixture generator behind
  * the `mm10_png_dhash` gate and the PngDecoder specs. Emits fully
  * standard non-interlaced 8-bit streams (signature, IHDR, one IDAT,
  * IEND, CRC-32 on every chunk, zlib via `java.util.zip.Deflater`)
  * for the four accepted color types, applying a caller-chosen
  * scanline filter per row so the decoder's unfilter path
  * (None/Sub/Up/Average/Paeth) is exercised end-to-end — the filter
  * transform here is the spec's forward form, the decoder implements
  * the inverse, and MultimodalSpec additionally pins hand-filtered
  * byte fixtures so a matched writer/decoder bug cannot hide in the
  * round-trip.
  *
  * Also provides the refused-variant stubs (interlaced, 16-bit,
  * palette) that must yield the honest null-hash row. */
private[graft] object PngWriter {

  private def be32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += ((v >>> 24) & 0xff).toByte
    out += ((v >>> 16) & 0xff).toByte
    out += ((v >>> 8) & 0xff).toByte
    out += (v & 0xff).toByte
  }

  private def chunk(out: ArrayBuffer[Byte], typ: String, data: Array[Byte]): Unit = {
    be32(out, data.length.toLong)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out ++= tb
    out ++= data
    val crc = new CRC32
    crc.update(tb)
    crc.update(data)
    be32(out, crc.getValue)
  }

  private def ihdr(w: Int, h: Int, bitDepth: Int, colorType: Int,
      interlace: Int): Array[Byte] = {
    val d = ArrayBuffer.empty[Byte]
    be32(d, w.toLong); be32(d, h.toLong)
    d += bitDepth.toByte; d += colorType.toByte
    d += 0; d += 0; d += interlace.toByte
    d.toArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    def_.setInput(raw)
    def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = ArrayBuffer.empty[Byte]
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      out ++= buf.take(n)
    }
    def_.end()
    out.toArray
  }

  /** Forward scanline filter (spec §9): `filtered = raw − pred mod
    * 256`, with Recon(a)/Recon(b)/Recon(c) at `bpp` byte offsets and
    * zero off-image — the exact inverse of the decoder's unfilter. */
  private def filterRows(w: Int, h: Int, channels: Int,
      samples: Array[Int], filterOf: Int => Int): Array[Byte] = {
    val stride = w * channels
    val raw = new Array[Byte]((1 + stride) * h)
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft")
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val v = samples(y * stride + x)
        val a = if (x >= channels) samples(y * stride + x - channels) else 0
        val up = if (y > 0) samples((y - 1) * stride + x) else 0
        val c = if (x >= channels && y > 0) samples((y - 1) * stride + x - channels) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) >> 1
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(y * (1 + stride) + 1 + x) = ((v - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** General 8-bit writer: `samples` is row-major channel-interleaved
    * (length w·h·channels, each 0..255); `colorType` one of 0/2/4/6;
    * `filterOf(row)` picks each scanline's filter (default cycles all
    * five so every filter path is exercised in every image ≥ 5 rows
    * tall). */
  def png8(w: Int, h: Int, colorType: Int, samples: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"color type $t")
    }
    require(samples.length == w * h * channels,
      s"need ${w * h * channels} samples, got ${samples.length}")
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 8, colorType, 0))
    chunk(out, "IDAT", deflate(filterRows(w, h, channels, samples, filterOf)))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  /** Grayscale (color type 0) from a luma grid. */
  def gray8(w: Int, h: Int, lum: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] =
    png8(w, h, 0, lum, filterOf)

  /** Truecolor (type 2) with r=g=b=v — decodes to luma exactly v. */
  def grayAsRgb8(w: Int, h: Int, lum: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] =
    png8(w, h, 2, lum.flatMap(v => Array(v, v, v)), filterOf)

  /** Truecolor+alpha (type 6) with r=g=b=v and a varying alpha the
    * decoder must IGNORE. */
  def grayAsRgba8(w: Int, h: Int, lum: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] =
    png8(w, h, 6, lum.zipWithIndex.flatMap { case (v, i) =>
      Array(v, v, v, (37 * i + 11) % 256) }, filterOf)

  /** Adam7 pass geometry (§8.2): (x0, y0, dx, dy) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Adam7-INTERLACED 8-bit writer: the same samples as [[png8]] laid
    * out as seven strided passes, each its own scanline group with
    * its own filter context (filters restart per pass — a zero row
    * above each pass's first scanline). `filterOf(globalRow)` picks
    * the filter per emitted scanline, counted across passes, so the
    * default cycles all five filters through the interlace too. */
  def interlaced8(w: Int, h: Int, colorType: Int, samples: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"color type $t")
    }
    require(samples.length == w * h * channels,
      s"need ${w * h * channels} samples, got ${samples.length}")
    val raw = ArrayBuffer.empty[Byte]
    var globalRow = 0
    for ((x0, y0, dx, dy) <- Adam7) {
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        // gather the pass's samples, then reuse the sequential
        // forward filter over the gathered pw×ph sub-image
        val sub = new Array[Int](pw * ph * channels)
        for (y <- 0 until ph; x <- 0 until pw; ch <- 0 until channels)
          sub((y * pw + x) * channels + ch) =
            samples(((y0 + y * dy) * w + (x0 + x * dx)) * channels + ch)
        val from = globalRow
        raw ++= filterRows(pw, ph, channels, sub, r => filterOf(from + r))
        globalRow += ph
      }
    }
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 8, colorType, 1))
    chunk(out, "IDAT", deflate(raw.toArray))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  /** An interlaced header over a TOO-SHORT zlib stream (8 raw bytes
    * where the Adam7 passes need far more): must return None — the
    * truncation honesty case for the interlaced path. */
  def interlacedStub(w: Int, h: Int): Array[Byte] = {
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 8, 0, 1))
    chunk(out, "IDAT", deflate(new Array[Byte](8)))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  /** 16-bit-depth stub (bitDepth=16): must return None. */
  def sixteenBitStub(w: Int, h: Int): Array[Byte] = {
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 16, 0, 0))
    chunk(out, "IDAT", deflate(new Array[Byte]((1 + 2 * w) * h)))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  /** Real indexed-color (colorType=3, 8-bit indices) writer: `pal`
    * is up to 256 (r, g, b) entries, `indices` row-major into it. */
  def palette8(w: Int, h: Int, pal: Seq[(Int, Int, Int)], indices: Array[Int],
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(pal.nonEmpty && pal.size <= 256, s"palette size ${pal.size}")
    require(indices.length == w * h, s"need ${w * h} indices, got ${indices.length}")
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 8, 3, 0))
    chunk(out, "PLTE", pal.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray)
    chunk(out, "IDAT", deflate(filterRows(w, h, 1, indices, filterOf)))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }

  /** Sub-byte-depth indexed stub (bitDepth=4): must return None —
    * the firm palette refusal (8-bit indices decode for real). */
  def paletteStub(w: Int, h: Int): Array[Byte] = {
    val out = ArrayBuffer[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    chunk(out, "IHDR", ihdr(w, h, 4, 3, 0))
    chunk(out, "PLTE", Array.tabulate(24)(i => (i * 10).toByte))
    chunk(out, "IDAT", deflate(new Array[Byte]((1 + (w + 1) / 2) * h)))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toArray
  }
}
