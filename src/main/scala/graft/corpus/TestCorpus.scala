package graft.corpus

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** One row of the `pages` input table — exactly BASELINE.json:input_hint:
  * pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  * `text` is the oracle-defined visible text: the engine's ExtractText(html)
  * must reproduce it byte-identically (the per-row invariant). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic Common-Crawl-style corpus (seed-pure; no
  * external data — FIXTURES.md §1). The generator CONSTRUCTS html and the
  * expected visible text together from the same fragments, so the
  * byte-identity test of ExtractText is constructive, not circular.
  *
  * Construct inventory exercises every reference quirk:
  * tilde paths (HTMLParser.kt:114-120), ?query / #fragment suffixes
  * (:113,:122), out-of-scope links (:121), self links (:123), duplicate
  * links (:124), script/style exclusion, &nbsp;, stopwords incl. the
  * dropped 'z', short-stem words, metric-prefix words, copyright dates.
  */
object TestCorpus {

  /** Zipf-ish host sizes: host0 is the hot host. */
  final case class Spec(
      hosts: Int,
      basePagesPerHost: Int,
      seed: Long = 42L,
      zipfExponent: Double = 1.0,
      copyrightEvery: Int = 7,
      nullTsEvery: Int = 13,
      robots: Boolean = true)

  val tiny: Spec = Spec(hosts = 4, basePagesPerHost = 12)
  val small: Spec = Spec(hosts = 8, basePagesPerHost = 260)
  def bench(hosts: Int, basePagesPerHost: Int): Spec =
    Spec(hosts = hosts, basePagesPerHost = basePagesPerHost)

  def seedUrl: String = "https://host0.test/"
  /** Scope filter — reference semantics are substring-contains, so a
    * suffix shared by every in-corpus host scopes the crawl. */
  def filterPrefix: String = ".test/"

  /** Simple 64-bit LCG (MMIX constants) — deterministic across JVMs. */
  final class Lcg(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(n: Int): Int = {
      val v = (nextLong() >>> 33).toInt
      ((v % n) + n) % n
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  // Word inventory: stopwords (incl. 'z' — NOT effective), short-stem words,
  // stemmable words pinning Porter behavior (see PorterSpec).
  private val stopWords = Vector("the", "of", "and", "in", "on", "is", "it", "as", "at", "z")
  private val shortStem = Vector("ties", "dying", "ab", "sky")
  private val contentWords = Vector(
    "universities", "research", "researchers", "engineering", "computing",
    "networks", "systems", "happy", "relational", "generalization",
    "organiser", "kilograms", "programming", "algorithms", "databases",
    "learning", "science", "hong", "kong", "connection", "optimization",
    "conditional", "motoring", "falling", "agreed", "plastered",
    "visualization", "graphics", "compilers", "theory", "robotics",
    "vision", "language", "models", "distributed", "storage", "crawler",
    "ranking", "indexing", "retrieval")

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def collapse(s: String): String =
    s.replaceAll("[\\s ]+", " ").trim

  /** Builds html and expected visible text from the same fragments. */
  private final class PageBuilder {
    private val html = new StringBuilder
    private val textParts = ArrayBuffer.empty[String]
    def raw(s: String): this.type = { html.append(s); this }
    def visible(s: String): this.type = {
      html.append(escapeHtml(s))
      val c = collapse(s)
      if (c.nonEmpty) textParts += c
      this
    }
    /** visible fragment whose html form uses &nbsp; between the two words */
    def visibleNbsp(a: String, b: String): this.type = {
      html.append(escapeHtml(a)).append("&nbsp;").append(escapeHtml(b))
      textParts += collapse(a + " " + b)
      this
    }
    def bytes: Array[Byte] = html.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def text: String = textParts.mkString(" ")
  }

  private def hostName(h: Int): String = s"host$h.test"

  /** Page urls for a host: the root page (h==0 only has the crawl seed as
    * its root), plain pages, and tilde directory pages (whose canonical
    * form ends in '/'). */
  private def pageUrls(spec: Spec): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    for (h <- 0 until spec.hosts) {
      val host = hostName(h)
      // Zipf host sizing: host h gets base / (h+1)^z pages (min 3)
      val n = math.max(3,
        (spec.basePagesPerHost / math.pow(h + 1, spec.zipfExponent)).toInt)
      out += s"https://$host/"
      for (i <- 0 until n) out += s"https://$host/p$i.html"
      val tildeUsers = math.max(1, n / 6)
      for (k <- 0 until tildeUsers) out += s"https://$host/~u$k/"
      if (spec.robots) {
        // a disallowed subtree that IS linked (exercises robots filtering)
        out += s"https://$host/private/x.html"
      }
    }
    out.toVector
  }

  def generate(spec: Spec): Vector[PageRow] = {
    val rng = new Lcg(spec.seed)
    val urls = pageUrls(spec)
    val urlIdx = urls.zipWithIndex.toMap
    val baseTs = 1546300800000L // 2019-01-01T00:00:00Z

    val rows = urls.zipWithIndex.map { case (url, i) =>
      val host = graft.html.UrlCanon.hostOf(url)
      val b = new PageBuilder

      // --- head ---
      // title-construct inventory pinning HTMLParser.kt:186-195 semantics:
      //  i%19==7  → NO title element        → title "Unauthorized"
      //  i%23==9  → empty <title></title>   → lastChild null → title ""
      //  i%11==4  → nested tag in the title → title = lastChild subtree text
      //  otherwise a plain one-text-node title
      val titleWords = (0 to rng.nextInt(3)).map(_ =>
        contentWords(rng.nextInt(contentWords.length)))
      b.raw("<html><head>")
      if (i % 19 == 7) {
        // no <title> at all
      } else if (i % 23 == 9) {
        b.raw("<title></title>")
      } else if (i % 11 == 4) {
        b.raw("<title>")
        b.visible(titleWords.mkString(" ") + " ")
        b.raw("<b>")
        b.visible("page " + i) // the <b> subtree is the lastChild → the title
        b.raw("</b></title>")
      } else {
        b.raw("<title>")
        b.visible(titleWords.mkString(" ") + " page " + i)
        b.raw("</title>")
      }
      b.raw("<script>var hidden = \"<b>never text</b>\";</script>" +
        "<style>.x{color:red}</style></head><body>")

      // --- paragraphs ---
      val nPara = 1 + rng.nextInt(3)
      for (_ <- 0 until nPara) {
        b.raw("<p>")
        val nw = 4 + rng.nextInt(10)
        val words = (0 until nw).map { _ =>
          rng.nextInt(4) match {
            case 0 => stopWords(rng.nextInt(stopWords.length))
            case 1 if rng.nextInt(3) == 0 => shortStem(rng.nextInt(shortStem.length))
            case _ => contentWords(rng.nextInt(contentWords.length))
          }
        }
        b.visible(words.mkString(" "))
        if (rng.nextInt(3) == 0) { b.raw(" "); b.visibleNbsp("hong", "kong") }
        b.raw("</p>")
      }

      // --- links ---
      val sameHost = urls.filter(u => u.contains(host) && u != url)
      val nLinks = math.min(2 + rng.nextInt(5), sameHost.size)
      val targets = ArrayBuffer.empty[String]
      // chain link keeps the host graph connected: page i → page i+1 (global)
      if (i + 1 < urls.length) targets += urls(i + 1)
      for (_ <- 0 until nLinks)
        targets += sameHost(rng.nextInt(sameHost.size))
      // occasional cross-host link
      if (rng.nextInt(3) == 0)
        targets += urls(rng.nextInt(urls.length))
      // root page links to every host's root (reachability)
      if (url == seedUrl)
        for (h <- 0 until spec.hosts) targets += s"https://${hostName(h)}/"

      var linkNo = 0
      targets.foreach { t =>
        // noise variants exercising the canonicalization pipeline
        val href = rng.nextInt(8) match {
          case 0 => t + "?session=abc"
          case 1 => t + "#section2"
          case 2 if t.endsWith("/") && t.contains("~") => t + "deep/page.html" // tilde-truncates back to t
          case 3 => "https://outside.example/away.html"                        // out of scope
          case 4 => url // self link
          case _ => t
        }
        b.raw(s"""<a href="$href">""")
        b.visible("link " + linkNo)
        b.raw("</a> ")
        linkNo += 1
      }
      // duplicate link (deduped by the pipeline)
      if (targets.nonEmpty) {
        b.raw(s"""<a href="${targets.head}">""")
        b.visible("again")
        b.raw("</a>")
      }
      // the fragment-quirk link: out-of-scope page kept because its
      // FRAGMENT contains the scope substring (HTMLParser.kt:121-122 order)
      if (rng.nextInt(17) == 0) {
        b.raw("""<a href="https://outside.example/trap#x.test/y">""")
        b.visible("trap")
        b.raw("</a>")
      }

      // --- copyright paragraph (date-extraction fallback input) ---
      // two variants, both reference-faithful: the date-LAST form is the
      // only one whose extraction SUCCEEDS (anything after the date makes
      // the reference's `Timestamp.valueOf(split("on")[1]+" 00:00:00")`
      // throw → default); the suffixed form pins the failure path
      if (i % spec.copyrightEvery == 3) {
        b.raw("""<p class="copyright">""")
        val date = s"2019-0${1 + rng.nextInt(9)}-1${rng.nextInt(9)}"
        if ((i / spec.copyrightEvery) % 2 == 0)
          b.visible(s"Copyright updated on $date")
        else
          b.visible(s"Copyright updated on $date by webmaster")
        b.raw("</p>")
      }
      b.raw("</body></html>")

      val ts = if (i % spec.nullTsEvery == 5) null
               else new Timestamp(baseTs + i * 3600000L)
      PageRow(url, ts, b.bytes, b.text, "en")
    }

    val robotsRows = if (spec.robots) {
      (0 until spec.hosts).map { h =>
        val url = s"https://${hostName(h)}/robots.txt"
        val body =
          if (h % 2 == 0) s"User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n"
          else "User-agent: *\n" // allow-all
        PageRow(url, new Timestamp(baseTs), body.getBytes("UTF-8"),
          collapse(body), "en")
      }
    } else Nil

    rows ++ robotsRows
  }

  /** Deterministic REAL PNG files (signature + spec-correct IHDR with true
    * dimensions + CRC32s + a filler IDAT + IEND) for the multimodal
    * pipeline: the `html` column carries the binary payload, `text` is
    * empty (opaque media, not markup). Kept SEPARATE from generate() so
    * the crawl/index fixtures' page set is untouched. */
  def mediaRows(n: Int, seed: Long = 42L): Vector[PageRow] = {
    val rng = new Lcg(seed ^ 0x504e47L) // "PNG"
    Vector.tabulate(n) { i =>
      val width = 16 + rng.nextInt(2032)
      val height = 16 + rng.nextInt(1520)
      val bytes = pngBytes(width, height, rng)
      PageRow(s"https://cdn.test/img$i.png",
        new Timestamp(1546300800000L + i * 60000L), bytes, "", "und")
    }
  }

  /** Deterministic REAL JPEG header streams: SOI + APP0/JFIF + a DQT
    * filler segment + SOF0 carrying the true dimensions + EOI. The SOF
    * walk in Multimodal.decodeJpegDims must skip the two leading
    * variable-length segments, exactly as in a camera JPEG. Entropy data
    * is omitted — these rows pin the truncated-payload fallback (header
    * dims + stub features); [[jpegPixelRows]] carries the decodable
    * shape. */
  def jpegRows(n: Int, seed: Long = 42L): Vector[PageRow] = {
    val rng = new Lcg(seed ^ 0x4a504547L) // "JPEG"
    Vector.tabulate(n) { i =>
      val width = 16 + rng.nextInt(4064)
      val height = 16 + rng.nextInt(3024)
      PageRow(s"https://cdn.test/photo$i.jpg",
        new Timestamp(1546300800000L + i * 60000L),
        jpegBytes(width, height, rng), "", "und")
    }
  }

  /** Deterministic fully-DECODABLE JPEGs: small true dimensions, real
    * entropy-coded scan data produced by the JDK's built-in ImageIO JPEG
    * ENCODER from a deterministic gradient+noise image (every 3rd photo
    * grayscale — the single-component JPEG shape). These feed the REAL
    * JPEG pixel-decode path (Multimodal.decodeJpegPixels); [[jpegRows]]
    * keeps the header-only shape to pin the truncated-payload fallback.
    * Encoding is in-process and seeded, so the bytes are stable for a
    * given JDK — the pixel gates pin decode(bytes), never the bytes. */
  def jpegPixelRows(n: Int, seed: Long = 42L): Vector[PageRow] = {
    val rng = new Lcg(seed ^ 0x4a504758L) // "JPGX"
    Vector.tabulate(n) { i =>
      val width = 16 + rng.nextInt(80)
      val height = 16 + rng.nextInt(60)
      PageRow(s"https://cdn.test/photo_px$i.jpg",
        new Timestamp(1546300800000L + i * 60000L),
        jpegEncodedBytes(width, height, rng, gray = i % 3 == 2), "", "und")
    }
  }

  private def jpegEncodedBytes(width: Int, height: Int, rng: Lcg,
                               gray: Boolean): Array[Byte] = {
    val imgType = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
                  else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(width, height, imgType)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // smooth gradient + bounded noise — compressible but non-trivial
        val r = (x * 255 / width + rng.nextInt(16)) min 255
        val g = (y * 255 / height + rng.nextInt(16)) min 255
        val b = ((x + y) * 255 / (width + height) + rng.nextInt(16)) min 255
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  /** Deterministic REAL GIF data streams: GIF89a signature + logical-screen
    * descriptor with true little-endian dimensions + a 4-entry global
    * color table + per-frame (graphic-control extension, image descriptor,
    * LZW sub-block chain) + trailer — so the block-walk frame counter has
    * true animation lengths (1-4 frames) to find. */
  def gifRows(n: Int, seed: Long = 42L): Vector[PageRow] = {
    val rng = new Lcg(seed ^ 0x474946L) // "GIF"
    Vector.tabulate(n) { i =>
      val width = 16 + rng.nextInt(1000)
      val height = 16 + rng.nextInt(800)
      val frames = 1 + (i % 4) // deterministic, decoupled from the rng
      PageRow(s"https://cdn.test/anim$i.gif",
        new Timestamp(1546300800000L + i * 60000L),
        // every 4th GIF stores its first frame interlaced (8/8/4/2 pass
        // schedule) so the gate pins the de-interlacer too
        gifBytes(width, height, frames, rng, interlaced = i % 4 == 3), "", "und")
    }
  }

  /** Deterministic fully-DECODABLE PNGs: small true dimensions, real
    * filtered + zlib-deflated pixel data (gradient + noise), cycling the
    * three 8-bit color types the decoder speaks — RGBA (6), RGB (2),
    * grayscale (0) — so the gate pins all three layouts. These feed the
    * REAL pixel-decode path (Multimodal.decodePngPixels) and its
    * pixel-derived feature vector; [[mediaRows]] keeps the garbage-IDAT
    * shape to pin the corrupt-payload fallback. */
  def pngPixelRows(n: Int, seed: Long = 42L): Vector[PageRow] = {
    val rng = new Lcg(seed ^ 0x504e4758L) // "PNGX"
    val colorTypes = Array(6, 2, 0)
    Vector.tabulate(n) { i =>
      val width = 16 + rng.nextInt(80)
      val height = 16 + rng.nextInt(60)
      PageRow(s"https://cdn.test/pix$i.png",
        new Timestamp(1546300800000L + i * 60000L),
        pngBytes(width, height, rng, decodable = true,
          colorType = colorTypes(i % 3)), "", "und")
    }
  }

  private def jpegBytes(width: Int, height: Int, rng: Lcg): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int*): Unit = v.foreach(x => out.write(x & 0xff))
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    b(0xff, 0xd8) // SOI
    b(0xff, 0xe0); be16(16) // APP0/JFIF: version 1.2, dpi units, 1x1 density
    b('J', 'F', 'I', 'F', 0, 1, 2, 1, 0, 1, 0, 1, 0, 0)
    b(0xff, 0xdb); be16(2 + 1 + 64); b(0) // DQT, table 0
    (0 until 64).foreach(_ => out.write(1 + rng.nextInt(255)))
    b(0xff, 0xc0); be16(8 + 3 * 3) // SOF0: precision 8, 3 components
    b(8); be16(height); be16(width); b(3)
    b(1, 0x22, 0); b(2, 0x11, 1); b(3, 0x11, 1)
    b(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** GIF-LZW ENCODER for the fixtures (Multimodal.lzwDecode is the
    * decoder; this side is written independently from the spec so a
    * round-trip pins both): variable code width minCode+1..12 bits packed
    * LSB-first, dictionary keyed (prefixCode, byte), clear emitted at
    * table-full, EOI terminator. */
  def lzwEncode(minCode: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    val dict = new java.util.HashMap[Int, Int]()
    var next = eoi + 1
    put(clear)
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = (prefix << 12) | (indices(i) & 0xff)
      val e = dict.getOrDefault(k, -1)
      if (e >= 0) prefix = e
      else {
        put(prefix)
        if (next < 4096) {
          dict.put(k, next)
          // widen when the just-assigned code crosses the current width —
          // the decoder mirrors this after reconstructing the same entry
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          next += 1
        } else { // table full: reset, like real encoders do
          put(clear)
          dict.clear(); next = eoi + 1; codeSize = minCode + 1
        }
        prefix = indices(i) & 0xff
      }
      i += 1
    }
    put(prefix); put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Interlace row order (8/8/4/2 pass schedule) — the order an
    * interlaced GIF stores its scanlines in. */
  def gifInterlaceOrder(h: Int): Array[Int] =
    (Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s0, st) =>
      s0 until h by st
    }).toArray

  private def gifBytes(width: Int, height: Int, frames: Int, rng: Lcg,
                       interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    "GIF89a".foreach(c => out.write(c.toInt))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x91) // GCT present, 2-entry-exponent size bits → 4 entries
    out.write(rng.nextInt(4)) // background color index
    out.write(0) // aspect ratio
    (0 until 4 * 3).foreach(_ => out.write(rng.nextInt(256))) // GCT RGB
    (0 until frames).foreach { f =>
      // graphic control extension (the block an animation player reads)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0x04); le16(10 + f) // disposal/delay
      out.write(0); out.write(0) // transparent idx, terminator
      // image descriptor: full-frame, no local color table
      out.write(0x2c)
      le16(0); le16(0); le16(width); le16(height)
      out.write(if (interlaced) 0x40 else 0)
      // REAL LZW pixel data: deterministic 4-color index pattern
      // (diagonal bands + LCG noise) encoded with the real encoder —
      // frame 0 is what Multimodal.decodeGifPixels reconstructs
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          px(y * width + x) =
            (if (rng.nextInt(5) == 0) rng.nextInt(4)
             else ((x + 2 * y + f) / 7) % 4).toByte
          x += 1
        }
        y += 1
      }
      val stored =
        if (!interlaced) px
        else {
          val o = new Array[Byte](px.length)
          val order = gifInterlaceOrder(height)
          var r = 0
          while (r < height) {
            System.arraycopy(px, order(r) * width, o, r * width, width)
            r += 1
          }
          o
        }
      out.write(2) // LZW min code size (4 colors)
      val lzw = lzwEncode(2, stored)
      var p = 0
      while (p < lzw.length) { // ≤255-byte sub-block chain
        val n = math.min(255, lzw.length - p)
        out.write(n)
        out.write(lzw, p, n)
        p += n
      }
      out.write(0) // sub-block chain terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL PNG files: spec-correct chunks AND a genuinely decodable image —
    * deterministic RGBA pixels (gradient + LCG noise), each scanline
    * FILTERED with the spec filter `y % 5` (None/Sub/Up/Average/Paeth, so
    * a decoder must implement all five), zlib-deflated into IDAT. A
    * `decodable=false` variant keeps the old shape (IHDR + garbage IDAT)
    * to exercise the corrupt-payload fallback. */
  private def pngBytes(width: Int, height: Int, rng: Lcg,
                       decodable: Boolean = false,
                       colorType: Int = 6): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => sys.error(s"fixture colorType $colorType unsupported")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val body = ctype.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(be32(crc.getValue.toInt))
    }
    // bit depth 8, deflate, no filter, no interlace; color type 0/2/6
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    if (!decodable) {
      chunk("IDAT", Array.fill(64 + rng.nextInt(192))(rng.nextLong().toByte))
    } else {
      val stride = width * channels
      val px = new Array[Byte](height * stride) // raw samples, row-major
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val o = y * stride + x * channels
          px(o) = ((x * 255 / math.max(width - 1, 1)) & 0xff).toByte
          if (channels >= 3) {
            px(o + 1) = ((y * 255 / math.max(height - 1, 1)) & 0xff).toByte
            px(o + 2) = rng.nextInt(256).toByte
          }
          if (channels == 4) px(o + 3) = 0xff.toByte
          x += 1
        }
        y += 1
      }
      // filter each scanline with type y % 5 (the decoder must invert all)
      val raw = new Array[Byte](height * (1 + stride))
      y = 0
      while (y < height) {
        val ft = y % 5
        raw(y * (1 + stride)) = ft.toByte
        var x = 0
        while (x < stride) {
          val cur = px(y * stride + x) & 0xff
          val left = if (x >= channels) px(y * stride + x - channels) & 0xff else 0
          val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
          val upLeft = if (y > 0 && x >= channels) px((y - 1) * stride + x - channels) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case 4 =>
              val p = left + up - upLeft
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - upLeft)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
          }
          raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflated = {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      }
      chunk("IDAT", deflated)
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
