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

  /** Decoded-media features: what a real decoder would produce. */
  final case class MediaFeatures(
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
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
    def decode(format: String, bytes: Array[Byte]): MediaFeatures = {
      val h = fnv1a(bytes, 0L)
      def dim(seed: Int, lo: Int, hi: Int): Int =
        lo + math.floorMod(fnv1a(bytes, seed.toLong), (hi - lo).toLong).toInt
      val emb = Array.tabulate(16) { i =>
        (math.floorMod(fnv1a(bytes, 1000L + i), 2000L) - 1000L).toFloat / 1000f
      }
      MediaFeatures(format, dim(1, 16, 4096), dim(2, 16, 4096),
        if (format == "mp4" || format == "mkv") dim(3, 1, 1000) else 1, emb)
    }
  }

  /** Feature extraction over a binary column — the `mapInPandas`
    * analogue: per-partition iterator, decoder constructed once per
    * partition, output rows (id, format, width, height, n_frames,
    * embedding). Media bytes never leave their input partition. The id
    * passes through with its source type (long, string/UUID, …) via a
    * Row encoder — no silent cast. */
  def extractFeatures(
      df: DataFrame, idCol: String, binCol: String,
      decoder: BinaryDecoder = StubDecoder): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val withFormat = df.select(
      col(idCol).as("id"),
      sniffFormat(col(binCol)).as("format"),
      col(binCol).as("bytes"))
    val outSchema = StructType(Seq(
      StructField("id", withFormat.schema("id").dataType),
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    withFormat.mapPartitions { it =>
      // Per-partition decoder setup happens here (stub: nothing).
      it.map { row =>
        val f = decoder.decode(row.getString(1), row.getAs[Array[Byte]](2))
        Row(row.get(0), f.format, f.width, f.height, f.nFrames, f.embedding)
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
}
