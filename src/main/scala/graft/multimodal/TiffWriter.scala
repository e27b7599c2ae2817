package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal baseline-TIFF writer — the fixture generator behind the
  * `mm13_tiff_dhash` gate and the TiffDecoder specs. Emits fully
  * standard TIFF 6.0 streams (either byte order, sorted first-IFD
  * tag list, strip layout with configurable RowsPerStrip,
  * uncompressed contiguous samples) for 8-bit grayscale (both
  * photometric polarities) and RGB. */
private[graft] object TiffWriter {

  /** `samples`: row-major, channel-interleaved (w·h·channels values
    * 0..255). `photometric`: 0 white-is-zero (gray), 1 black-is-zero
    * (gray), 2 RGB. `rowsPerStrip` 0 = one strip of all rows. */
  def tiff(w: Int, h: Int, samples: Array[Int], photometric: Int,
      littleEndian: Boolean = true, rowsPerStrip: Int = 0): Array[Byte] = {
    val channels = if (photometric == 2) 3 else 1
    require(samples.length == w * h * channels,
      s"need ${w * h * channels} samples, got ${samples.length}")
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val nStrips = (h + rps - 1) / rps
    val rowBytes = w * channels

    // layout: header(8) | strip data | aux value arrays | IFD
    val stripLens = (0 until nStrips).map(s => math.min(rps, h - s * rps) * rowBytes)
    val stripOffs = stripLens.scanLeft(8)(_ + _).take(nStrips)
    var auxAt = 8 + stripLens.sum
    val aux = ArrayBuffer.empty[Byte]
    def order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    def auxShorts(vs: Seq[Int]): Int = {
      val at = auxAt
      val bb = ByteBuffer.allocate(2 * vs.length).order(order)
      vs.foreach(v => bb.putShort(v.toShort))
      aux ++= bb.array(); auxAt += 2 * vs.length
      at
    }
    def auxLongs(vs: Seq[Int]): Int = {
      val at = auxAt
      val bb = ByteBuffer.allocate(4 * vs.length).order(order)
      vs.foreach(bb.putInt)
      aux ++= bb.array(); auxAt += 4 * vs.length
      at
    }

    // tag entries: (tag, type, count, inline-or-offset value)
    val bitsVal =
      if (channels == 1) 8 else auxShorts(Seq.fill(channels)(8))
    val offsVal =
      if (nStrips == 1) stripOffs.head else auxLongs(stripOffs)
    val cntsVal =
      if (nStrips == 1) stripLens.head else auxLongs(stripLens)
    val Short_ = 3; val Long_ = 4
    val tags = Seq(
      (0x100, Long_, 1, w),
      (0x101, Long_, 1, h),
      (0x102, Short_, channels, bitsVal),
      (0x103, Short_, 1, 1), // no compression
      (0x106, Short_, 1, photometric),
      (0x111, Long_, nStrips, offsVal),
      (0x115, Short_, 1, channels),
      (0x116, Long_, 1, rps),
      (0x117, Long_, nStrips, cntsVal))

    val ifdAt = auxAt
    val total = ifdAt + 2 + 12 * tags.length + 4
    val out = ByteBuffer.allocate(total).order(order)
    // header
    if (littleEndian) { out.put('I'.toByte).put('I'.toByte).putShort(42) }
    else { out.put('M'.toByte).put('M'.toByte).putShort(42) }
    out.putInt(ifdAt)
    // strip data
    var i = 0
    while (i < samples.length) { out.put(samples(i).toByte); i += 1 }
    // aux arrays
    out.put(aux.toArray)
    // IFD
    out.putShort(tags.length.toShort)
    for ((tag, typ, count, value) <- tags) {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      val inline = (if (typ == Short_) 2 else 4) * count <= 4
      if (typ == Short_ && inline) {
        // SHORT scalars sit in the value field's FIRST two bytes
        out.putShort(value.toShort)
        if (count == 1) out.putShort(0) else out.putShort(0) // pad
      } else out.putInt(value)
    }
    out.putInt(0) // no next IFD
    out.array()
  }

  def gray(w: Int, h: Int, lum: Array[Int], littleEndian: Boolean = true,
      rowsPerStrip: Int = 0, whiteIsZero: Boolean = false): Array[Byte] =
    tiff(w, h, if (whiteIsZero) lum.map(255 - _) else lum,
      photometric = if (whiteIsZero) 0 else 1, littleEndian, rowsPerStrip)

  def rgb(w: Int, h: Int, samples: Array[Int], littleEndian: Boolean = true,
      rowsPerStrip: Int = 0): Array[Byte] =
    tiff(w, h, samples, photometric = 2, littleEndian, rowsPerStrip)

  /** LZW-compressed stub (Compression=5 declared over raw bytes):
    * must return None — the compressed-TIFF refusal. */
  def compressedStub(w: Int, h: Int): Array[Byte] = {
    val t = gray(w, h, new Array[Int](w * h))
    // compression tag value: find entry 0x103 in the IFD and patch it
    patchShortTag(t, 0x103, 5)
    t
  }

  /** Two-page stub: a valid first page whose next-IFD pointer is
    * nonzero — must return None (pixels would be ambiguous). */
  def multiPageStub(w: Int, h: Int): Array[Byte] = {
    val t = gray(w, h, new Array[Int](w * h))
    // next-IFD pointer is the file's last 4 bytes; point it anywhere
    val le = t(0) == 'I'
    val bb = ByteBuffer.wrap(t).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    bb.putInt(t.length - 4, 8)
    t
  }

  private def patchShortTag(t: Array[Byte], tag: Int, v: Int): Unit = {
    val le = t(0) == 'I'
    val bb = ByteBuffer.wrap(t).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xffff
    for (k <- 0 until n) {
      val p = ifd + 2 + 12 * k
      if ((bb.getShort(p) & 0xffff) == tag) bb.putShort(p + 8, v.toShort)
    }
  }
}
