package graft.html

import scala.collection.mutable.ArrayBuffer

/** Parsed view of one HTML page: everything the engine extracts from the
  * `html: BINARY` column in a single scan.
  *
  * From-scratch replacement for the reference's org.htmlparser beans
  * (reference: `src/main/kotlin/util/HTMLParser.kt:102-126,141-223`,
  * `StringBean`/`LinkBean`/`Parser`). The observable contract (pinned by
  * the fixture corpus, see FIXTURES.md §1):
  *
  *  - `text`: all text nodes outside `<script>`/`<style>`, entities
  *    decoded (`&nbsp;` → ordinary space), tag boundaries acting as
  *    whitespace, every whitespace run collapsed to a single space,
  *    leading/trailing whitespace trimmed. This is the byte-identical
  *    per-url invariant vs the `pages.text` column.
  *  - `title`: the LAST CHILD of the first `<title>` element, as plain
  *    decoded text (HTMLParser.kt:186-195: `elementAt(0)?.lastChild?.
  *    toPlainTextString() ?: ""`). For a plain title the last child is its
  *    single text node; for `<title>A <b>B</b></title>` it is the `<b>`
  *    subtree → "B"; for `<title></title>` lastChild is null → Some("").
  *    None when no `<title>` exists at all (the reference then throws
  *    ArrayIndexOutOfBounds out of `elementAt(0)` and the catch yields
  *    "Unauthorized" — the CALLER maps None to that fallback).
  *  - `hrefs`: `href` attribute of every `<a>` tag in document order,
  *    entity-decoded, NOT resolved or canonicalized.
  *  - `copyright`: decoded plain text of the FIRST `<p class="copyright">`
  *    (HTMLParser.kt:207-215), inner tags stripped, un-collapsed.
  */
final case class ParsedPage(
    text: String,
    title: Option[String],
    hrefs: Vector[String],
    copyright: Option[String])

object Html {

  def parseBytes(html: Array[Byte]): ParsedPage =
    parse(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def parse(html: String): ParsedPage = {
    val n = html.length
    val text = new java.lang.StringBuilder(n / 2)
    val hrefs = ArrayBuffer.empty[String]
    var title: String = null
    var copyright: String = null

    // --- first-<title> lastChild tracking (HTMLParser.kt:191) -------------
    var inTitle = false          // inside the FIRST <title> element
    var titleClosed = false      // that element has been closed
    var titleDepth = 0           // element nesting depth inside the title
    var titleCur: java.lang.StringBuilder = null // open child (text node @depth 0, element subtree @depth>0)
    var titleLast: String = null // last COMPLETED top-level child's plain text
    def titlePushCur(): Unit =
      if (titleCur != null) { titleLast = titleCur.toString; titleCur = null }
    def titleFinish(): Unit = {
      titlePushCur()
      title = if (titleLast != null) titleLast else "" // no children → lastChild null → ""
      inTitle = false; titleClosed = true
    }

    var copyBuf: java.lang.StringBuilder = null     // non-null while inside first <p class=copyright>
    var lastWasSpace = true                          // collapse state; true ⇒ swallow leading ws

    def emit(c: Char): Unit = {
      if (inTitle) {
        if (titleCur == null) titleCur = new java.lang.StringBuilder
        titleCur.append(c)
      }
      if (copyBuf != null) copyBuf.append(c)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u00a0') {
        if (!lastWasSpace) { text.append(' '); lastWasSpace = true }
      } else { text.append(c); lastWasSpace = false }
    }

    def emitTagBreak(): Unit = {
      if (!lastWasSpace) { text.append(' '); lastWasSpace = true }
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          emitTagBreak()
        } else {
          val tagEnd = findTagEnd(html, i)
          if (tagEnd < 0) { i = n } // truncated tag: drop the rest
          else {
            val rawTag = html.substring(i + 1, tagEnd)
            val closing = rawTag.startsWith("/")
            val body = if (closing) rawTag.substring(1) else rawTag
            val name = tagName(body)
            val selfClosing = !closing && rawTag.endsWith("/")
            emitTagBreak()
            if (!closing) {
              if (name == "script" || name == "style") {
                // skip raw content until the matching close tag
                val close = indexOfIgnoreCase(html, "</" + name, tagEnd + 1)
                i = if (close < 0) n
                    else {
                      val gt = html.indexOf('>', close)
                      if (gt < 0) n else gt + 1
                    }
              } else {
                if (name == "a")
                  attrValue(body, "href").foreach(h => hrefs += decodeEntities(h))
                if (name == "title" && !inTitle && !titleClosed) {
                  inTitle = true; titleDepth = 0; titleCur = null; titleLast = null
                } else if (inTitle && name != "title") {
                  // a nested element starts/extends a non-text child node
                  if (titleDepth == 0) {
                    titlePushCur() // close the open text node
                    if (selfClosing) titleLast = "" // childless element node
                    else { titleDepth = 1; titleCur = new java.lang.StringBuilder }
                  } else if (!selfClosing) titleDepth += 1
                } else if (name == "p" && copyright == null && copyBuf == null &&
                           attrValue(body, "class").contains("copyright")) {
                  copyBuf = new java.lang.StringBuilder
                }
                i = tagEnd + 1
              }
            } else {
              // buffers already received decoded chars via emit()
              if (name == "title" && inTitle) {
                titleFinish()
              } else if (inTitle && titleDepth > 0) {
                titleDepth -= 1
                if (titleDepth == 0) titlePushCur() // element child completed
              } else if (name == "p" && copyBuf != null) {
                copyright = copyBuf.toString; copyBuf = null
              }
              i = tagEnd + 1
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntityAt(html, i)
        var j = 0
        while (j < decoded.length) { emit(decoded.charAt(j)); j += 1 }
        i = next
      } else {
        emit(c)
        i += 1
      }
    }

    // EOF with the title element still open: flush as if closed (the
    // reference's scanner auto-closes dangling composites at EOF)
    if (inTitle) titleFinish()

    // trim the single trailing space the collapse may have left
    val t = text.toString
    val trimmed = if (t.nonEmpty && t.charAt(t.length - 1) == ' ') t.substring(0, t.length - 1) else t
    ParsedPage(trimmed, Option(title), hrefs.toVector, Option(copyright))
  }

  private def tagName(tagBody: String): String = {
    var i = 0
    val n = tagBody.length
    while (i < n && isNameChar(tagBody.charAt(i))) i += 1
    // Locale.ROOT: under a Turkish default locale "TITLE".toLowerCase is
    // "tıtle" (dotless ı) — tag dispatch must be locale-independent
    tagBody.substring(0, i).toLowerCase(java.util.Locale.ROOT)
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  // attribute NAMES additionally allow '-', '_' and ':' (data-href,
  // xml:lang) — without these the tokenizer would split "data-href" into
  // two names and resurrect the substring-match bug
  private def isAttrNameChar(c: Char): Boolean =
    isNameChar(c) || c == '-' || c == '_' || c == ':'

  /** Value of an attribute inside a tag body; supports double-, single-,
    * and un-quoted values. Returns the raw (undecoded) value.
    *
    * A real left-to-right attribute TOKENIZER, not a substring search:
    * the previous `indexOf(attr)` form matched "href" inside a
    * preceding `data-href` name (the '-' passed the boundary guard) and
    * inside other attributes' QUOTED VALUES (`alt="href=evil"`), either
    * way returning the wrong value and dropping the real link. Walking
    * name → '=' → value and skipping complete quoted values makes both
    * impossible. Only attributes WITH '=' can match (same contract as
    * before — a bare boolean `href` never returns). */
  private[html] def attrValue(tagBody: String, attr: String): Option[String] = {
    val n = tagBody.length
    var i = 0
    while (i < n && isNameChar(tagBody.charAt(i))) i += 1 // skip tag name
    while (i < n) {
      val c = tagBody.charAt(i)
      if (!isAttrNameChar(c)) { i += 1 } // separator / stray char
      else {
        val ns = i
        while (i < n && isAttrNameChar(tagBody.charAt(i))) i += 1
        val name = tagBody.substring(ns, i)
        var j = i
        while (j < n && Character.isWhitespace(tagBody.charAt(j))) j += 1
        if (j < n && tagBody.charAt(j) == '=') {
          j += 1
          while (j < n && Character.isWhitespace(tagBody.charAt(j))) j += 1
          val matches = name.equalsIgnoreCase(attr)
          if (j >= n) { if (matches) return Some("") else i = j }
          else {
            val q = tagBody.charAt(j)
            if (q == '"' || q == '\'') {
              val end = tagBody.indexOf(q, j + 1)
              val v = if (end < 0) tagBody.substring(j + 1)
                      else tagBody.substring(j + 1, end)
              if (matches) return Some(v)
              i = if (end < 0) n else end + 1
            } else {
              var end = j
              while (end < n && !Character.isWhitespace(tagBody.charAt(end))) end += 1
              if (matches) return Some(tagBody.substring(j, end))
              i = end
            }
          }
        }
        // no '=': boolean attribute — never a match target, keep walking
      }
    }
    None
  }

  /** End of the tag opened at `start` ('<'), skipping '>' inside quoted
    * attribute values (`<a onclick="if(a>b)f()" href=…>` must not cut the
    * tag at the comparison). A quote only OPENS a value when the previous
    * non-whitespace char is '=' — a stray unmatched quote elsewhere in a
    * malformed tag can then never swallow the rest of the document. */
  private def findTagEnd(html: String, start: Int): Int = {
    var i = start + 1
    var quote: Char = 0
    var quoteOpen = -1
    var prevNonWs: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) {
        if (c == quote) { quote = 0; prevNonWs = c }
      } else if ((c == '"' || c == '\'') && prevNonWs == '=') {
        quote = c; quoteOpen = i
      } else if (c == '>') {
        return i
      } else if (!Character.isWhitespace(c)) prevNonWs = c
      i += 1
    }
    // Unterminated quoted attribute value (ADVICE r6 #1): the scan ran off
    // the document end still inside the quote. Degrade to the next raw '>'
    // after the quote opened — the pre-quote-aware recovery — so a single
    // unclosed quote costs ONE bad tag, not every remaining byte of text
    // and links. A document with no '>' at all is genuinely truncated.
    if (quote != 0) html.indexOf('>', quoteOpen) else -1
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val ln = needle.toLowerCase
    var i = math.max(from, 0)
    val limit = s.length - needle.length
    while (i <= limit) {
      if (s.regionMatches(true, i, ln, 0, ln.length)) return i
      i += 1
    }
    -1
  }

  /** Decode one entity starting at position i ('&'); returns (text, nextIndex). */
  private def decodeEntityAt(s: String, i: Int): (String, Int) = {
    // BOUNDED scan: entity names are ≤ 10 chars, so look at most 11 chars
    // ahead — an unbounded indexOf made parse() quadratic on '&'-dense
    // pages with few semicolons (a 1 MB page of '&'s scanned to EOF per
    // char: ~10^11 comparisons hanging one executor task)
    val limit = math.min(s.length, i + 12)
    var semi = -1
    var j = i + 1
    while (j < limit && semi < 0) { if (s.charAt(j) == ';') semi = j else j += 1 }
    if (semi < 0) return ("&", i + 1)
    val name = s.substring(i + 1, semi)
    def codePoint(cp: Int): String =
      // supplementary-plane refs (&#128512;) need the surrogate PAIR —
      // Int.toChar silently truncated them to an unrelated BMP char
      if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
    val decoded = name match {
      case "nbsp" => " " // StringBean-style non-breaking-space replacement
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" => "'"
      case _ if name.startsWith("#x") || name.startsWith("#X") =>
        try codePoint(Integer.parseInt(name.substring(2), 16))
        catch { case _: Exception => null }
      case _ if name.startsWith("#") =>
        try codePoint(Integer.parseInt(name.substring(1)))
        catch { case _: Exception => null }
      case _ => null
    }
    if (decoded == null) ("&", i + 1) else (decoded, semi + 1)
  }

  private[html] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (d, next) = decodeEntityAt(s, i)
        // inside attributes/captures, nbsp decodes to the same space
        sb.append(d)
        i = next
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
