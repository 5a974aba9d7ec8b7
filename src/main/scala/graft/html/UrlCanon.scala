package graft.html

/** URL canonicalization, exactly the reference's link post-processing
  * pipeline (reference: `src/main/kotlin/util/HTMLParser.kt:109-126`).
  *
  * Order of operations is load-bearing and matches the reference:
  *   1. resolve the href against the base url (LinkBean resolution);
  *   2. drop the query string: `split("?")[0]`;
  *   3. tilde-truncate: a url containing '~' is cut just after the first
  *      '/' FOLLOWING the '~' (`…/~user/rest` → `…/~user/`); when no '/'
  *      follows the '~' the result is the EMPTY string (indexOf = -1,
  *      substring(0, 0));
  *   4. scope filter: keep only urls containing the seed prefix,
  *      case-insensitively — applied BEFORE the fragment strip;
  *   5. drop the fragment after '#';
  *   6. optional self-exclusion (result != the fetched page's url);
  *   7. per-page dedup preserving first-occurrence order.
  */
object UrlCanon {

  /** Steps 2+3: query strip then tilde truncation. */
  def stripQueryAndTilde(url: String): String = {
    val q = url.indexOf('?')
    val noQuery = if (q >= 0) url.substring(0, q) else url
    val t = noQuery.indexOf('~')
    if (t >= 0) {
      val slash = noQuery.indexOf('/', t)
      noQuery.substring(0, slash + 1) // slash == -1 ⇒ ""
    } else noQuery
  }

  /** Step 5. */
  def stripFragment(url: String): String = {
    val h = url.indexOf('#')
    if (h >= 0) url.substring(0, h) else url
  }

  def containsIgnoreCase(haystack: String, needle: String): Boolean = {
    val n = needle.length
    if (n == 0) return true
    var i = 0
    val limit = haystack.length - n
    while (i <= limit) {
      if (haystack.regionMatches(true, i, needle, 0, n)) return true
      i += 1
    }
    false
  }

  /** Step 1: resolve an href against the page url with java.net.URL
    * semantics (matching the reference's org.htmlparser LinkTag/LinkBean
    * resolution for the constructs the fixture corpus uses). None for
    * malformed urls — the reference's parser drops those silently. */
  def resolve(base: String, href: String): Option[String] =
    try Some(new java.net.URL(new java.net.URL(base), href).toExternalForm)
    catch { case _: Exception => None }

  /** Full per-page link extraction pipeline (steps 1-7).
    * @param self when false, links equal to `pageUrl` are dropped
    *             (SpiderMain.kt:114 passes self=false for the child pass). */
  def extractLinks(hrefs: Seq[String], pageUrl: String, filterPrefix: String,
                   self: Boolean): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    hrefs.foreach { href =>
      resolve(pageUrl, href).foreach { abs =>
        val canon = stripQueryAndTilde(abs)
        if (containsIgnoreCase(canon, filterPrefix)) {
          val noFrag = stripFragment(canon)
          if (self || noFrag != pageUrl) seen += noFrag
        }
      }
    }
    seen.toVector
  }

  /** Host of an absolute url (authority without userinfo/port), lowercase;
    * "" when unparsable. Used for politeness grouping and robots scoping —
    * engine-side concepts (north_rule), absent from the reference. */
  def hostOf(url: String): String =
    try {
      val h = new java.net.URI(url).getHost
      if (h == null) "" else h.toLowerCase
    } catch { case _: Exception => "" }

  /** Path component of an absolute url ("/" when empty). */
  def pathOf(url: String): String =
    try {
      val p = new java.net.URI(url).getRawPath
      if (p == null || p.isEmpty) "/" else p
    } catch { case _: Exception => "/" }
}
