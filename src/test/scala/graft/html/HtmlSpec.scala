package graft.html

import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  private val page =
    """<html><head><title>CSE &amp; Research</title>
      |<script>var x = "<b>ignored</b>";</script>
      |<style>.a { color: red; }</style></head>
      |<body>
      |<p>Hello&nbsp;world, this   is
      |text.</p>
      |<!-- a comment <a href="http://comment.test/"> -->
      |<a href="https://host0.test/p1.html">link one</a>
      |<a HREF='p2.html#frag'>relative</a>
      |<a name="anchor-without-href">no href</a>
      |<p class="copyright">Copyright updated on 2019-03-01 by CSE</p>
      |</body></html>""".stripMargin

  private val parsed = Html.parse(page)

  test("text: entities decoded, script/style/comments skipped, whitespace collapsed") {
    assert(parsed.text ==
      "CSE & Research Hello world, this is text. link one relative no href Copyright updated on 2019-03-01 by CSE")
  }

  test("title: first <title> content, entities decoded") {
    assert(parsed.title.contains("CSE & Research"))
  }

  test("title is the LAST CHILD of the first <title> (HTMLParser.kt:191)") {
    // plain text after a nested tag → that trailing text node wins
    assert(Html.parse("<title>Hello <b>World</b></title>").title.contains("World"))
    assert(Html.parse("<title>A <b>B</b> tail</title>").title.contains(" tail"))
    // nested-in-nested stays one top-level child
    assert(Html.parse("<title>A <b>B <i>C</i> D</b></title>").title.contains("B C D"))
    // entity inside the last child decodes
    assert(Html.parse("<title>x <b>R&amp;D</b></title>").title.contains("R&D"))
    // empty title: lastChild null → "" (reference elvis), NOT Unauthorized
    assert(Html.parse("<title></title>").title.contains(""))
    // second <title> ignored
    assert(Html.parse("<title>first</title><title>second</title>").title.contains("first"))
    // unterminated title flushes at EOF
    assert(Html.parse("<title>dangling").title.contains("dangling"))
  }

  test("hrefs: <a href> values in document order, unresolved") {
    assert(parsed.hrefs == Vector("https://host0.test/p1.html", "p2.html#frag"))
  }

  test("copyright: first <p class=copyright> plain text") {
    assert(parsed.copyright.contains("Copyright updated on 2019-03-01 by CSE"))
  }

  test("no title / no copyright → None") {
    val p = Html.parse("<html><body>plain</body></html>")
    assert(p.title.isEmpty && p.copyright.isEmpty && p.text == "plain")
  }

  test("nested tags inside copyright paragraph are stripped") {
    val p = Html.parse("""<p class="copyright">Made <b>on</b> 2020-01-02</p>""")
    assert(p.copyright.contains("Made on 2020-01-02"))
  }

  test("copyright date pins MIDNIGHT UTC semantics (documented divergence " +
       "from the reference's JVM-local-zone Timestamp.valueOf)") {
    // engine contract: the extracted date is timezone-INDEPENDENT —
    // 2019-03-01 parses to 2019-03-01T00:00:00Z regardless of JVM zone
    // (HTMLParser.kt:181,222 would shift by the serving JVM's offset;
    // SURVEY §2 documents UTC as the deterministic spec)
    val html = """<p class="copyright">Copyright updated on 2019-03-01</p>"""
      .getBytes("UTF-8")
    val micros = graft.functions.ExprImpl.extractCopyrightDateMicros(html)
    val expected = java.time.LocalDate.of(2019, 3, 1).toEpochDay * 86400L * 1000000L
    assert(micros == expected)
    // failure steps of the chain → null (caller coalesces the 1990 default).
    // NB trailing text after the date is a FAILURE — faithful to the
    // reference, whose `split("on")[1] + " 00:00:00"` feeds
    // "2019-03-01byCSE 00:00:00" to Timestamp.valueOf, which throws:
    assert(graft.functions.ExprImpl.extractCopyrightDateMicros(
      """<p class="copyright">Copyright updated on 2019-03-01 by CSE</p>"""
        .getBytes("UTF-8")) == null)
    assert(graft.functions.ExprImpl.extractCopyrightDateMicros(
      """<p class="copyright">no marker word here</p>""".getBytes("UTF-8")) == null)
    assert(graft.functions.ExprImpl.extractCopyrightDateMicros(
      """<p>Copyright updated on 2019-03-01</p>""".getBytes("UTF-8")) == null)
  }

  test("attribute tokenizer: data-href must not shadow href; href inside " +
       "another attribute's quoted value must not match; boolean attrs walk on") {
    assert(Html.parse("""<a data-href="#" href="real.html">x</a>""").hrefs ==
      Vector("real.html"))
    assert(Html.parse("""<a alt="href=evil" href="real.html">x</a>""").hrefs ==
      Vector("real.html"))
    assert(Html.parse("""<a download href="real.html">x</a>""").hrefs ==
      Vector("real.html"))
    // no real href at all → nothing extracted, even with decoys
    assert(Html.parse("""<a data-href="#" alt="href=evil">x</a>""").hrefs.isEmpty)
  }

  test("tag end: '>' inside a quoted attribute value does not truncate the " +
       "tag; stray quotes without '=' cannot swallow the document") {
    val p = Html.parse("""<a onclick="if(a>b)f()" href="x.html">click</a> tail""")
    assert(p.hrefs == Vector("x.html"))
    assert(p.text == "click tail")
    // a lone quote in a weird place must not quote the rest of the page
    val q = Html.parse("""<p "oops>one</p><a href="y.html">two</a>""")
    assert(q.hrefs == Vector("y.html"))
    // UNTERMINATED quoted value (ADVICE r6 #1): no closing quote anywhere
    // after — degrades to ONE bad tag (recover at the next raw '>'), the
    // rest of the document keeps its text and links
    val r = Html.parse("""<a href='broken>gone</a> kept <a href=z.html>two</a>""")
    assert(r.hrefs.contains("z.html"))
    assert(r.text.contains("kept") && r.text.contains("two"))
    // truly truncated document (no '>' after the quote) drops only the tag
    val s = Html.parse("""text <a href="open""")
    assert(s.text.trim == "text" && s.hrefs.isEmpty)
  }

  test("numeric refs outside the BMP decode to surrogate pairs; invalid " +
       "code points degrade to a literal '&'") {
    assert(Html.parse("<p>&#128512;</p>").text == new String(Character.toChars(128512)))
    assert(Html.parse("<p>&#x1F600;</p>").text == new String(Character.toChars(0x1F600)))
    assert(Html.parse("<p>&#-60;x</p>").text == "&#-60;x")
    assert(Html.parse("<p>&#1114112;x</p>").text == "&#1114112;x") // > U+10FFFF
  }

  test("entity scan is bounded: a page dense in '&' with no semicolons " +
       "parses in linear time") {
    val dense = "<p>" + ("&" * 200000) + "</p>"
    val t0 = System.nanoTime()
    val p = Html.parse(dense)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(p.text == "&" * 200000)
    assert(secs < 5.0, f"quadratic entity scan: $secs%.1fs for 200k '&'s")
  }
}

class UrlCanonSpec extends AnyFunSuite {

  test("query string stripped before tilde truncation") {
    assert(UrlCanon.stripQueryAndTilde("https://h.test/a.html?q=1") == "https://h.test/a.html")
    assert(UrlCanon.stripQueryAndTilde("https://h.test/~user/deep/page.html") == "https://h.test/~user/")
  }

  test("tilde with no following slash yields the empty string (reference quirk)") {
    assert(UrlCanon.stripQueryAndTilde("https://h.test/~user") == "")
  }

  test("fragment strip is separate (runs after the scope filter)") {
    assert(UrlCanon.stripFragment("https://h.test/a.html#sec") == "https://h.test/a.html")
  }

  test("full pipeline: order of filter vs fragment strip (reference quirk)") {
    // the scope filter sees the fragment: an out-of-scope page whose
    // FRAGMENT contains the seed prefix is (wrongly but faithfully) kept
    val links = UrlCanon.extractLinks(
      hrefs = Seq("https://other.test/page#https://seed.test/"),
      pageUrl = "https://seed.test/index.html",
      filterPrefix = "https://seed.test/", self = true)
    assert(links == Vector("https://other.test/page"))
  }

  test("full pipeline: resolution, dedup, self-exclusion") {
    val links = UrlCanon.extractLinks(
      hrefs = Seq("p1.html", "./p1.html?x=2", "/p2.html", "#top",
        "https://seed.test/index.html", "https://elsewhere.test/x"),
      pageUrl = "https://seed.test/index.html",
      filterPrefix = "https://seed.test/", self = false)
    // p1 deduped (query stripped), #top resolves to the page itself (self-dropped),
    // absolute self dropped, out-of-scope dropped
    assert(links == Vector("https://seed.test/p1.html", "https://seed.test/p2.html"))
  }

  test("case-insensitive scope filter") {
    val links = UrlCanon.extractLinks(
      hrefs = Seq("HTTPS://SEED.TEST/P1.HTML"),
      pageUrl = "https://seed.test/",
      filterPrefix = "https://seed.test/", self = true)
    assert(links.nonEmpty)
  }

  test("host and path helpers") {
    assert(UrlCanon.hostOf("https://Host3.TEST/~u/p.html") == "host3.test")
    assert(UrlCanon.pathOf("https://host3.test/~u/p.html") == "/~u/p.html")
    assert(UrlCanon.pathOf("https://host3.test") == "/")
  }
}
