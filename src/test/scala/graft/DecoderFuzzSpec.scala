package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.multimodal.{GifWriter, JpegWriter, Multimodal, PngWriter, TiffWriter}

/** Crash-proofness fuzz for every byte decoder that faces UNTRUSTED
  * corpus content (the threat model behind the r20 JPEG hardening:
  * one flipped nibble must yield the honest None/null-hash row, never
  * an exception that kills the whole `imageHashes`/`audioHashes`
  * mapPartitions task). Deterministic seeds — a failure reproduces.
  *
  * Three fuzz families per format:
  *   - random bytes behind a valid magic prefix (parser entry fuzz)
  *   - single-byte mutations of a VALID stream (the corrupt-byte case
  *     CRCs/budget checks must catch)
  *   - truncations of a valid stream at every-ish prefix length
  */
class DecoderFuzzSpec extends AnyFunSuite with Matchers {

  private def lum(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  /** Valid fixtures per sniffable format. */
  private def validFixtures: Seq[(String, Array[Byte])] = {
    val g = lum(16, 16)((x, y) => (x * 13 + y * 7) % 256)
    val ppm = {
      val hdr = "P6\n16 16\n255\n".getBytes("US-ASCII")
      hdr ++ g.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    }
    val bmp = {
      val buf = java.nio.ByteBuffer.allocate(54 + 48 * 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + 48 * 16).putInt(0).putInt(54)
        .putInt(40).putInt(16).putInt(16).putShort(1).putShort(24).putInt(0)
        .putInt(48 * 16).putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (y <- 15 to 0 by -1; x <- 0 until 16) {
        val v = g(y * 16 + x).toByte
        buf.put(v).put(v).put(v)
      }
      buf.array()
    }
    Seq(
      ("ppm", ppm),
      ("bmp", bmp),
      ("jpeg", JpegWriter.grayDcOnly(16, 16, Array(1, -2, 3, -4), q = 16)),
      ("jpeg", JpegWriter.colorDcOnly420(16, 16, Array(1, -2, 3, -4), q = 16)),
      ("png", PngWriter.grayAsRgba8(16, 16, g)),
      ("png", PngWriter.gray8(16, 16, g)),
      ("png", PngWriter.interlaced8(16, 16, 0, g)),
      ("png", PngWriter.palette8(16, 16, (0 until 256).map(v => (v, v, v)), g)),
      ("gif", GifWriter.gray(16, 16, g)),
      ("gif", GifWriter.gray(16, 16, g, interlaced = true)),
      ("tiff", TiffWriter.gray(16, 16, g)),
      ("tiff", TiffWriter.gray(16, 16, g, littleEndian = false, rowsPerStrip = 3)))
  }

  private def decodeNeverThrows(format: String, bytes: Array[Byte]): Unit =
    try { Multimodal.PixelDecoder.decodeLuma(format, bytes); () }
    catch {
      case e: Throwable =>
        fail(s"$format decoder threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
          s"on ${bytes.length} bytes (hex head: " +
          bytes.take(64).map(b => f"$b%02x").mkString + ")")
    }

  test("random bytes behind each magic prefix never throw (seeded, 300 cases per format)") {
    val magics = Seq(
      ("ppm", Array[Byte]('P', '6')),
      ("bmp", Array[Byte]('B', 'M')),
      ("jpeg", Array(0xff, 0xd8, 0xff).map(_.toByte)),
      ("gif", "GIF89a".getBytes("US-ASCII")),
      ("tiff", Array('I'.toByte, 'I'.toByte, 42.toByte, 0.toByte)),
      ("tiff", Array('M'.toByte, 'M'.toByte, 0.toByte, 42.toByte)),
      ("png", Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
    for ((format, magic) <- magics) {
      val rnd = new scala.util.Random(format.hashCode ^ 0x5eed)
      for (_ <- 0 until 300) {
        val body = new Array[Byte](rnd.nextInt(2000))
        rnd.nextBytes(body)
        decodeNeverThrows(format, magic ++ body)
      }
    }
  }

  test("single-byte mutations of valid streams never throw (seeded, 400 per format)") {
    for ((format, valid) <- validFixtures) {
      val rnd = new scala.util.Random(format.hashCode ^ 0xf1e1d)
      for (_ <- 0 until 400) {
        val mutated = valid.clone()
        val at = rnd.nextInt(mutated.length)
        mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
        decodeNeverThrows(format, mutated)
      }
      // the unmutated stream still decodes — the fixture is real
      Multimodal.PixelDecoder.decodeLuma(format, valid) should not be None
    }
  }

  test("every truncation of a valid stream returns None or decodes, never throws") {
    for ((format, valid) <- validFixtures; cut <- 0 until valid.length)
      decodeNeverThrows(format, valid.take(cut))
  }

  test("audio fingerprint never throws on random or mutated RIFF bytes") {
    def wav(n: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      buf.put("data".getBytes).putInt(2 * n)
      for (i <- 0 until n) buf.putShort(((i * 131) % 65536 - 32768).toShort)
      buf.array()
    }
    val valid = wav(200)
    def never(bytes: Array[Byte]): Unit =
      try { Multimodal.AudioDecoder.pcm16Samples(bytes); () }
      catch {
        case e: Throwable =>
          fail(s"audio decoder threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    val rnd = new scala.util.Random(0xa0d10)
    for (_ <- 0 until 300) {
      val body = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(body)
      never("RIFF".getBytes ++ body)
    }
    for (_ <- 0 until 300) {
      val mutated = valid.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 + rnd.nextInt(255))).toByte
      never(mutated)
    }
    for (cut <- 0 until valid.length) never(valid.take(cut))
  }
}
