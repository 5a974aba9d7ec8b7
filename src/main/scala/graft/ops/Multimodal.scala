package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * What is REAL (no codec library involved — pure JVM byte/zlib work):
  *  - PNG: FULL pixel decode for 8-bit RGBA non-interlaced images — IDAT
  *    chunks inflated with `java.util.zip.Inflater` (zlib is part of the
  *    JDK), scanlines de-filtered per the PNG spec (None/Sub/Up/Average/
  *    Paeth), and the 8-dim feature vector computed from the ACTUAL
  *    pixels ([[pixelFeature]]).
  *  - PNG/JPEG/GIF header metadata: true width/height from IHDR / the
  *    SOF marker walk / the logical-screen descriptor.
  *  - GIF frame COUNT: a full data-stream block walk
  *    ([[decodeGifFrameCount]]) counting image descriptors through
  *    extension and sub-block chains — real animation lengths.
  *
  *  - GIF: first-frame LZW pixel decode (pure-JVM [[lzwDecode]]) with
  *    de-interlacing, palette lookup, and background compositing.
  *  - JPEG: FULL pixel decode via the JDK's built-in ImageIO JPEG plugin
  *    ([[decodeJpegPixels]] — `javax.imageio` ships a complete
  *    baseline/progressive JPEG codec in `java.desktop`; no external
  *    library, works headless).
  *
  * What stays a clearly-marked deterministic STUB ([[decodeStub]]):
  * unrecognized/corrupt payloads, and video/audio formats that genuinely
  * need an external codec stack (ffmpeg).
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
      // the fill-byte loop advanced i — re-check before the length reads
      // below (a stream truncated right after fill bytes, e.g.
      // FF D8 FF FF FF FF, would otherwise read past the array)
      if (i + 3 >= bytes.length) return None
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

  /** Hard ceiling on decoded-pixel allocations (width*height*channels):
    * a crawled payload DECLARING absurd dims must fall back to the stub,
    * never allocate gigabytes inside an executor task. 64 MPix RGBA =
    * 256 MB — far above any thumbnail/web image, far below task memory. */
  private val MaxPixelBytes: Long = 256L * 1024 * 1024

  /** REAL full JPEG pixel decode via the JDK's BUILT-IN ImageIO JPEG
    * plugin (`javax.imageio`, module `java.desktop` — a complete
    * baseline+progressive JPEG codec shipped with every JDK; no external
    * dependency, headless-safe). Returns (w, h, 3, rgb) row-major like the
    * PNG/GIF decoders.
    *
    * Hardening mirrors [[decodePngPixels]]: the cheap header walk
    * ([[decodeJpegDims]]) bounds the allocation BEFORE any codec work (a
    * payload declaring absurd dims is rejected without decoding), the
    * decoded image must agree with the declared dims, and the whole body
    * is exception-fenced so a truncated or hostile payload can never kill
    * a task — the caller falls back to header dims + stub features. */
  def decodeJpegPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      decodeJpegDims(bytes).flatMap { case (w, h) =>
        if (w.toLong * h * 3 > MaxPixelBytes) None
        else {
          // MemoryCacheImageInputStream keeps the decode in-memory for
          // THIS read only (ImageIO.read would consult the JVM-global
          // temp-file-cache setting, which is not ours to mutate)
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          val img =
            if (!readers.hasNext) null
            else {
              val r = readers.next()
              try { r.setInput(iis); r.read(0) } finally r.dispose()
            }
          if (img == null || img.getWidth != w || img.getHeight != h) None
          else {
            // row-strip conversion: a full-frame getRGB would allocate a
            // 4-byte-per-pixel int[] on top of the raster and the output
            // (~3.5× the cap at the limit); one reused row buffer keeps
            // peak memory at raster + output, like the PNG path
            val row = new Array[Int](w)
            val out = new Array[Byte](w * h * 3)
            var o = 0
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val p = row(x)
                out(o) = ((p >> 16) & 0xff).toByte
                out(o + 1) = ((p >> 8) & 0xff).toByte
                out(o + 2) = (p & 0xff).toByte
                x += 1
                o += 3
              }
              y += 1
            }
            Some((w, h, 3, out))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL full PNG pixel decode for the common web-PNG shapes (8-bit
    * grayscale / RGB / RGBA, non-interlaced): concatenates the IDAT
    * chunks, inflates them with the JDK's zlib, and de-filters every
    * scanline per the PNG spec (filter types 0-4: None/Sub/Up/Average/
    * Paeth — the de-filter `left` distance is the per-pixel byte count).
    * Returns (w, h, channels, pixels) with the raw bytes row-major.
    * None for any PNG this path can't fully decode (16-bit, palette,
    * gray+alpha, interlaced, truncated or corrupt IDAT) — the caller then
    * falls back to header dims + stub features. All size arithmetic is in
    * Long and the whole body is exception-fenced, so a malformed or
    * hostile payload (truncated IHDR, 2^31-ish chunk length, absurd
    * declared dims) can never kill a task. */
  def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try decodePngPixelsUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodePngPixelsUnsafe(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    // the IHDR layout check below reads bytes 24-28; decodePngDims only
    // guarantees 24 bytes, so re-check length first (ADVICE r5 #1)
    if (bytes.length < 29) return None
    val dims = decodePngDims(bytes).getOrElse(return None)
    val (w, h) = dims
    // IHDR payload: depth 8, color type 0 (gray) / 2 (RGB) / 6 (RGBA),
    // deflate, filter 0, non-interlaced — the layouts this decoder speaks
    val channels = (bytes(25): Int) match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return None
    }
    if (bytes(24) != 8 || bytes(26) != 0 || bytes(27) != 0 || bytes(28) != 0)
      return None
    // reject declared dims whose pixel buffer would be absurd BEFORE any
    // allocation; all arithmetic in Long so w*h*channels cannot wrap
    val strideL = w.toLong * channels
    if (h.toLong * (1L + strideL) > MaxPixelBytes) return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    // walk chunks, concatenating IDAT payloads; chunk bounds in Long so a
    // hostile length near 2^31 cannot overflow the guard
    val idat = new java.io.ByteArrayOutputStream()
    var i = 0L
    i = 8L
    var done = false
    while (!done) {
      if (i + 8 > bytes.length) return None
      val len = be32(i.toInt).toLong & 0xffffffffL
      if (i + 12 + len > bytes.length) return None
      val ctype = new String(bytes, i.toInt + 4, 4, "US-ASCII")
      if (ctype == "IDAT") idat.write(bytes, i.toInt + 8, len.toInt)
      if (ctype == "IEND") done = true
      i += 12 + len
    }
    val stride = strideL.toInt
    val raw = new Array[Byte]((h.toLong * (1 + stride)).toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      val probe = new Array[Byte](1)
      // run to the zlib finish marker: a stream that truncates OR inflates
      // past the declared (h, stride) size is rejected — this is what
      // catches a color-type declaration that doesn't match the data
      while (!inf.finished()) {
        if (off < raw.length) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          // FDICT streams stall inflate() without needing input or
          // finishing — without this check the loop would spin forever
          // on a hostile zlib header (preset dictionaries are illegal in
          // PNG anyway, RFC 2083 §2.2)
          if (n == 0 && inf.needsDictionary()) return None
          off += n
        } else {
          if (inf.inflate(probe, 0, 1) > 0) return None // oversized stream
          if (inf.needsInput()) return None // truncated: no finish marker
          if (inf.needsDictionary()) return None // FDICT stall (see above)
        }
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // de-filter scanlines in place into the output
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= channels) out(dst + x - channels) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= channels) out(dst - stride + x - channels) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur + pred
        }
        out(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, channels, out))
  }

  /** REAL 8-dim feature vector from DECODED pixels (row-major, `channels`
    * bytes per pixel, first three = RGB): channel means, mean luma
    * (ITU-R 601 weights), luma standard deviation, mean absolute
    * horizontal and vertical luma gradients (texture energy), and the
    * bright-pixel fraction (luma above the mean). All values in [0, 1];
    * pure deterministic arithmetic, so the driver-side oracle can pin the
    * distributed path bit-for-bit. */
  def pixelFeature(width: Int, height: Int, channels: Int,
                   px: Array[Byte]): Array[Double] = {
    val n = width * height
    require(px.length == n * channels, s"pixel buffer ${px.length} != $n*$channels")
    val luma = new Array[Double](n)
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0
    var i = 0
    while (i < n) {
      // grayscale: the single sample IS r=g=b (ITU weights sum to 1)
      val r = px(i * channels) & 0xff
      val g = if (channels >= 3) px(i * channels + 1) & 0xff else r
      val b = if (channels >= 3) px(i * channels + 2) & 0xff else r
      val l = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
      luma(i) = l
      sr += r; sg += g; sb += b; sl += l
      i += 1
    }
    val meanL = sl / n
    var varL = 0.0; var bright = 0.0
    i = 0
    while (i < n) {
      val d = luma(i) - meanL
      varL += d * d
      if (luma(i) > meanL) bright += 1.0
      i += 1
    }
    var gh = 0.0; var nh = 0L
    var gv = 0.0; var nv = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val idx = y * width + x
        if (x + 1 < width) { gh += math.abs(luma(idx + 1) - luma(idx)); nh += 1 }
        if (y + 1 < height) { gv += math.abs(luma(idx + width) - luma(idx)); nv += 1 }
        x += 1
      }
      y += 1
    }
    Array(
      sr / n / 255.0, sg / n / 255.0, sb / n / 255.0, meanL,
      math.sqrt(varL / n),
      if (nh > 0) gh / nh else 0.0,
      if (nv > 0) gv / nv else 0.0,
      bright / n)
  }

  /** REAL GIF dimensions: the logical-screen descriptor directly after the
    * GIF87a/GIF89a signature — width/height little-endian at offsets 6/8. */
  def decodeGifDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 13) return None
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') ||
        bytes(5) != 'a') return None
    val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** REAL animated-GIF frame count: a full data-stream block walk per the
    * GIF89a spec — skip the header, logical-screen descriptor and global
    * color table, then iterate blocks: `0x21` extensions (label byte +
    * sub-block chain), `0x2C` image descriptors (9-byte descriptor +
    * optional local color table + LZW min-code byte + sub-block chain),
    * `0x3B` trailer. Every image descriptor is one frame. None for a
    * stream that does not terminate cleanly at a trailer. */
  def decodeGifFrameCount(bytes: Array[Byte]): Option[Int] = {
    if (decodeGifDims(bytes).isEmpty) return None
    val packed = bytes(10) & 0xff
    var i = 13
    if ((packed & 0x80) != 0) i += 3 * (2 << (packed & 0x07)) // global color table
    var frames = 0
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < bytes.length && (bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
      if (p >= bytes.length) -1 else p + 1 // past the 0 terminator
    }
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x3b => return Some(frames)
        case 0x21 => // extension: introducer + label, then sub-blocks
          i = skipSubBlocks(i + 2)
          if (i < 0) return None
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return None
          frames += 1
          val flags = bytes(i + 9) & 0xff
          var p = i + 10
          if ((flags & 0x80) != 0) p += 3 * (2 << (flags & 0x07)) // local color table
          p += 1 // LZW minimum code size
          i = skipSubBlocks(p)
          if (i < 0) return None
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** REAL GIF first-frame pixel decode: finds the first image descriptor
    * (skipping extension blocks), selects the local or global color
    * table, concatenates the LZW sub-blocks and runs a full GIF-LZW
    * decode ([[lzwDecode]]) — variable code width 3..12 bits, LSB-first
    * bit packing, clear/EOI codes, KwKwK case — then maps the color
    * indices through the palette onto an RGB canvas of the LOGICAL
    * SCREEN (frames smaller than the screen are blitted at their
    * left/top offset over the background color, per the spec's
    * compositing model). Interlaced frames are de-interlaced with the
    * standard 8/8/4/2 pass schedule. None for anything this path can't
    * fully decode (missing color table, corrupt LZW stream, truncated
    * sub-blocks); exception-fenced like the PNG path so hostile payloads
    * degrade to the stub instead of killing the task. */
  def decodeGifPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try decodeGifPixelsUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGifPixelsUnsafe(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val (sw, sh) = decodeGifDims(bytes).getOrElse(return None)
    if (sw.toLong * sh * 3 > MaxPixelBytes) return None
    val packed = bytes(10) & 0xff
    val bgIndex = bytes(11) & 0xff
    var gct: Array[Byte] = null
    var i = 13
    if ((packed & 0x80) != 0) {
      val n = 3 * (2 << (packed & 0x07))
      if (i + n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, i, i + n)
      i += n
    }
    // walk to the first image descriptor
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < bytes.length && (bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
      if (p >= bytes.length) -1 else p + 1
    }
    while (i < bytes.length && (bytes(i) & 0xff) != 0x2c) {
      (bytes(i) & 0xff) match {
        case 0x21 => i = skipSubBlocks(i + 2); if (i < 0) return None
        case _ => return None // trailer (or junk) before any image
      }
    }
    if (i + 10 > bytes.length) return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val left = le16(i + 1); val top = le16(i + 3)
    val fw = le16(i + 5); val fh = le16(i + 7)
    val flags = bytes(i + 9) & 0xff
    if (fw <= 0 || fh <= 0 || left + fw > sw || top + fh > sh) return None
    var p = i + 10
    var palette = gct
    if ((flags & 0x80) != 0) {
      val n = 3 * (2 << (flags & 0x07))
      if (p + n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, p, p + n)
      p += n
    }
    if (palette == null) return None
    val nColors = palette.length / 3
    if (p >= bytes.length) return None
    val minCode = bytes(p) & 0xff
    p += 1
    // concatenate the LZW sub-block chain
    val data = new java.io.ByteArrayOutputStream()
    while (p < bytes.length && (bytes(p) & 0xff) != 0) {
      val n = bytes(p) & 0xff
      if (p + 1 + n > bytes.length) return None
      data.write(bytes, p + 1, n)
      p += 1 + n
    }
    if (p >= bytes.length) return None
    val indices = lzwDecode(minCode, data.toByteArray, fw * fh).getOrElse(return None)
    // de-interlace: pass schedule (start,step) = (0,8),(4,8),(2,4),(1,2)
    val rows: Array[Int] = if ((flags & 0x40) != 0) {
      val order = new Array[Int](fh)
      var r = 0
      for ((s0, st) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- s0 until fh by st) {
        order(r) = y; r += 1
      }
      order
    } else Array.tabulate(fh)(identity)
    // composite onto the logical-screen canvas over the background color
    val out = new Array[Byte](sw * sh * 3)
    val bg = if (gct != null && bgIndex < nColors) bgIndex else 0
    var q = 0
    while (q < sw * sh) {
      out(q * 3) = palette(bg * 3); out(q * 3 + 1) = palette(bg * 3 + 1)
      out(q * 3 + 2) = palette(bg * 3 + 2)
      q += 1
    }
    var r = 0
    while (r < fh) {
      val y = rows(r)
      var x = 0
      while (x < fw) {
        val ci = indices(r * fw + x) & 0xff
        if (ci >= nColors) return None
        val dst = ((top + y) * sw + (left + x)) * 3
        out(dst) = palette(ci * 3); out(dst + 1) = palette(ci * 3 + 1)
        out(dst + 2) = palette(ci * 3 + 2)
        x += 1
      }
      r += 1
    }
    Some((sw, sh, 3, out))
  }

  /** Full GIF-LZW decode of `nPixels` color indices from the concatenated
    * sub-block payload: LSB-first variable-width codes (minCode+1 .. 12
    * bits), clear resets the table, EOI ends the stream, the KwKwK case
    * (code == next table slot) emits prev-sequence + its first byte.
    * None on any malformed stream (code beyond the table, truncated
    * bitstream before nPixels indices, oversized expansion). */
  def lzwDecode(minCode: Int, data: Array[Byte], nPixels: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8 || nPixels < 0) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outN = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0; var k = 0
      while (k < codeSize) {
        val b = bitPos + k
        v |= ((data((b >> 3).toInt) >> (b & 7).toInt) & 1) << k
        k += 1
      }
      bitPos += codeSize
      v
    }
    // expand `code`'s byte sequence reversed into `stack`; -1 on a cycle
    def expand(code: Int): Int = {
      var c = code; var sp = 0
      while (c >= clear + 2) {
        if (sp >= stack.length) return -1
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (c >= clear) return -1 // chain must root at a literal
      stack(sp) = c.toByte
      sp + 1
    }
    while (outN < nPixels) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None
        out(outN) = code.toByte; outN += 1
        prev = code
      } else {
        val cur = if (code < dictSize) code
                  else if (code == dictSize && dictSize < 4096) prev
                  else return None
        var sp = expand(cur)
        if (sp < 0) return None
        val firstB = stack(sp - 1)
        if (code == dictSize) { // KwKwK: sequence is prev-seq + first(prev-seq)
          if (outN + sp + 1 > nPixels) return None
          var k = sp - 1
          while (k >= 0) { out(outN) = stack(k); outN += 1; k -= 1 }
          out(outN) = firstB; outN += 1
        } else {
          if (outN + sp > nPixels) return None
          var k = sp - 1
          while (k >= 0) { out(outN) = stack(k); outN += 1; k -= 1 }
        }
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = firstB; dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** Decode dispatch, most-real path first:
    *  - PNG with decodable pixels (8-bit gray/RGB/RGBA) → REAL dims +
    *    REAL pixel features;
    *  - JPEG with decodable pixels (JDK ImageIO codec) → REAL dims +
    *    REAL pixel features;
    *  - GIF with a decodable first frame → real dims + REAL LZW-decoded
    *    pixel features + REAL frame count from the block walk;
    *  - PNG/JPEG header-only (truncated/corrupt entropy data) → real
    *    dims, stub features;
    *  - anything else → the deterministic stub. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) =
    decodePngPixels(bytes).orElse(decodeJpegPixels(bytes)) match {
      case Some((w, h, ch, px)) => (w, h, 1, pixelFeature(w, h, ch, px))
      case None =>
        decodePngDims(bytes).orElse(decodeJpegDims(bytes)) match {
          case Some((w, h)) =>
            val (_, _, _, feat) = decodeStub(bytes)
            (w, h, 1, feat)
          case None =>
            decodeGifDims(bytes) match {
              case Some((w, h)) =>
                val (_, _, stubFrames, feat) = decodeStub(bytes)
                val frames = decodeGifFrameCount(bytes)
                  .filter(_ > 0).getOrElse(stubFrames)
                val realFeat = decodeGifPixels(bytes)
                  .map { case (gw, gh, ch, px) => pixelFeature(gw, gh, ch, px) }
                  .getOrElse(feat)
                (w, h, frames, realFeat)
              case None => decodeStub(bytes)
            }
        }
    }

  /** STUB decoder — deterministic fake standing in for e.g. ffmpeg
    * (video/audio) and for corrupt image payloads past header parse.
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
