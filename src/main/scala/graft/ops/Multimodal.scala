package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches. The DECODE step is a clearly-marked deterministic STUB (the
  * real codec libraries are not in this container); everything Spark-side —
  * schema, batch iteration, partitioning, output shape — is real and
  * tested, so swapping `decodeStub` for a real decoder is a one-function
  * change.
  *
  * In PySpark this would be `mapInPandas`; the Scala-native equivalent is
  * a typed `mapPartitions` over an Iterator of rows, which preserves the
  * same batch-at-a-time contract without serializing through Python.
  */
object Multimodal {

  final case class MediaMeta(
      url: String,
      n_bytes: Int,
      content_hash: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Double])

  private val PngSig: Array[Int] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

  /** REAL header parse for one format: PNG IHDR width/height (pure byte
    * reads from the spec'd layout — signature, then the mandatory first
    * IHDR chunk at offset 8 with big-endian dims at 16/20). No codec
    * library needed; returns None for non-PNG bytes so the caller falls
    * back to the stub. Pixel DECODE stays stubbed — this makes the
    * metadata column real for PNG payloads, which is the part a training
    * pipeline filters/partitions on. */
  def decodePngDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 24) return None
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != PngSig(i)) return None
      i += 1
    }
    // first chunk must be IHDR (length 13): bytes 8-11 = 0 0 0 13, 12-15 = "IHDR"
    if (bytes(8) != 0 || bytes(9) != 0 || bytes(10) != 0 || bytes(11) != 13) return None
    if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R') return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    val w = be32(16); val h = be32(20)
    if (w <= 0 || h <= 0) None else Some((w, h))
  }

  /** REAL JPEG dimensions: walk the marker stream from SOI to the first
    * SOF frame header (C0-CF minus DHT/JPG/DAC), skipping the variable-
    * length APP/DQT/COM segments in front of it — the layout every camera
    * or web JPEG has. Height/width are big-endian at SOF payload offsets
    * 1/3 (after the precision byte). Pure byte reads, no codec; None on
    * anything that is not a well-formed JPEG header stream. */
  def decodeJpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None // not a marker: corrupt
      var marker = bytes(i + 1) & 0xff
      while (marker == 0xff && i + 2 < bytes.length) { i += 1; marker = bytes(i + 1) & 0xff } // fill bytes
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
      if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // standalone RSTn/TEM: no length field
      } else {
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= bytes.length) return None
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** REAL GIF dimensions: the logical-screen descriptor directly after the
    * GIF87a/GIF89a signature — width/height little-endian at offsets 6/8.
    * (Frame COUNT for animated GIFs would need a full block walk through
    * sub-block chains; n_frames stays the stub's value.) */
  def decodeGifDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 13) return None
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') ||
        bytes(5) != 'a') return None
    val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Decode dispatch: real header parses for the three formats a crawler
    * actually sees (PNG IHDR, JPEG SOF, GIF logical screen) — the
    * width/height a training pipeline filters and partitions on are TRUE
    * values for all three; the deterministic stub handles everything else.
    * Pixel decode / the feature vector stay stubbed (no codec libraries
    * in this container). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) =
    decodePngDims(bytes).orElse(decodeJpegDims(bytes)).orElse(decodeGifDims(bytes)) match {
      case Some((w, h)) =>
        val (_, _, _, feat) = decodeStub(bytes) // feature vector stays stubbed
        (w, h, 1, feat)
      case None => decodeStub(bytes)
    }

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg/ffmpeg.
    * Derives plausible metadata and an 8-dim "embedding" purely from the
    * bytes so tests are reproducible. Replace with a real codec to go
    * live; the pipeline around it does not change. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val width = 160 + (math.abs(h % 8) * 80).toInt
    val height = 120 + (math.abs((h >> 8) % 8) * 60).toInt
    val frames = 1 + math.abs((h >> 16) % 4).toInt
    val feat = Array.tabulate(8) { d =>
      val z = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      (z % 1000).toDouble / 1000.0
    }
    (width, height, frames, feat)
  }

  /** Batch feature extraction over (url STRING, html/bytes BINARY) rows.
    * Partition-parallel, no shuffle: the decode cost dominates, so the
    * right plan is a straight map over the scan. */
  def extractFeatures(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col("html").as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (url, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val (w, h, f, feat) = decode(b)
          var hash = 1125899906842597L
          var i = 0
          while (i < b.length) { hash = hash * 31 + (b(i) & 0xff); i += 1 }
          MediaMeta(url, b.length, hash, w, h, f, feat)
        }
      }
  }

  /** Frame-sampling stub: expand each media row into n_frames typed frame
    * rows (the explode shape a video pipeline needs), deterministic. */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().select(col("url"), col("width"), col("height"),
        posexplode(array_repeat(col("content_hash"), col("n_frames")))
          .as(Seq("frame_no", "frame_seed")))
      .withColumn("frame_hash",
        xxhash64(col("frame_seed"), col("frame_no")))
      .drop("frame_seed")
}
