package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Distributed synthetic corpus for throughput benchmarking: every page is
  * a PURE FUNCTION of its global index (seeded splitmix per page), so
  * generation runs as `spark.range(n).mapPartitions` — no driver-side
  * materialization, scales to arbitrarily large frontiers (the 10^10-URL
  * shape of BASELINE.json, sampled down to sandbox size).
  *
  * Host sizes follow a Zipf distribution (host0 is the hot host) so the
  * politeness/salting machinery sees realistic skew. Pages are lighter
  * than TestCorpus fixtures (no oracle-pinned quirk constructs) — the
  * bench measures frontier throughput, not extraction exactness.
  */
object BenchCorpus {

  final case class Shape(hosts: Int, totalPages: Int, seed: Long = 42L,
                         zipfExponent: Double = 1.0, linksPerPage: Int = 16,
                         /** pages per directory page (v3 topology): each
                           * host root links its ⌈n/dirSpan⌉ directory
                           * pages; slices cover the host. */
                         dirSpan: Int = 512)

  /** per-host page counts (Zipf), prefix offsets, total. */
  def hostLayout(shape: Shape): (Array[Int], Array[Int]) = {
    val weights = Array.tabulate(shape.hosts)(h => 1.0 / math.pow(h + 1, shape.zipfExponent))
    val wsum = weights.sum
    val counts = weights.map(w => math.max(2, (w / wsum * shape.totalPages).toInt))
    val offsets = counts.scanLeft(0)(_ + _)
    (counts, offsets)
  }

  def urlOf(host: Int, i: Int): String =
    if (i == 0) s"https://bh$host.test/" else s"https://bh$host.test/p$i.html"

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val words = Array("crawl", "frontier", "index", "rank", "shard",
    "merge", "fetch", "parse", "token", "research", "systems", "networks",
    "hong", "kong", "universities", "learning", "data", "engine")

  /** Build one page from its global index — pure, executor-side. */
  def buildPage(globalIdx: Long, counts: Array[Int], offsets: Array[Int],
                shape: Shape): PageRow = {
    // locate (host, i) by offset scan (hosts is small; binary search not needed)
    var host = java.util.Arrays.binarySearch(offsets, globalIdx.toInt + 1)
    if (host < 0) host = -host - 1
    host -= 1
    val i = globalIdx.toInt - offsets(host)
    val n = counts(host)
    val url = urlOf(host, i)

    var r = mix(shape.seed ^ globalIdx)
    def next(bound: Int): Int = { r = mix(r); (((r >>> 33) % bound).toInt + bound) % bound }

    val sb = new java.lang.StringBuilder(1024)
    sb.append("<html><head><title>")
    sb.append(words(next(words.length))).append(' ').append(words(next(words.length)))
      .append(" page ").append(globalIdx)
    sb.append("</title></head><body>")
    // parse-heavy body: several paragraphs so the fetch join's extraction
    // cost dominates fixed per-round driver overhead at bench scale
    var para = 0
    val nPara = 8 + next(4)
    while (para < nPara) {
      sb.append("<p>")
      val nw = 50 + next(40)
      var w = 0
      while (w < nw) { sb.append(words(next(words.length))).append(' '); w += 1 }
      sb.append("</p>")
      para += 1
    }
    // links: chain to i+1 (connectivity), root fan-out, random same-host,
    // occasional cross-host + noise suffixes
    def a(href: String): Unit =
      sb.append("<a href=\"").append(href).append("\">l</a>")
    if (i + 1 < n) a(urlOf(host, i + 1))
    if (i == 0 && host == 0) {
      // the seed is the global sitemap hub: it links every host root AND
      // every host's directory pages, so round 1 fetches all directories
      // and round 2 is one giant bulk round (~95% of the corpus)
      var h = 0
      while (h < shape.hosts) {
        a(urlOf(h, 0))
        val hDirs = (counts(h) + shape.dirSpan - 1) / shape.dirSpan
        var j = 1
        while (j <= math.min(hDirs, counts(h) - 1)) { a(urlOf(h, j)); j += 1 }
        h += 1
      }
    }
    // v3 topology: a DIRECTORY layer per host — the root links every
    // directory page, each directory page links a contiguous ~dirSpan-page
    // slice, together covering the whole host. BFS therefore converges in
    // 4 level-synchronous rounds (seed → roots → directories → bulk) with
    // ~99% of the fetch work in ONE giant round — the round-size-to-
    // overhead ratio of a real 10^10-url frontier, whose rounds hold 10^7+
    // urls each, instead of a 7-round trickle where the parallelism-
    // independent per-round driver latency (~0.45 s) caps measurable
    // scaling efficiency (PLANS.md §9).
    val nDirs = (n + shape.dirSpan - 1) / shape.dirSpan
    if (i == 0) { var j = 1; while (j <= math.min(nDirs, n - 1)) { a(urlOf(host, j)); j += 1 } }
    if (i >= 1 && i <= nDirs) {
      val lo = (i - 1) * shape.dirSpan
      val hi = math.min(lo + shape.dirSpan, n)
      var j = lo
      while (j < hi) { if (j != i) a(urlOf(host, j)); j += 1 }
    }
    var l = 0
    val nl = shape.linksPerPage / 2 + next(shape.linksPerPage)
    while (l < nl) {
      val kind = next(10)
      if (kind < 7) a(urlOf(host, next(n)))
      else if (kind < 9) { val oh = next(shape.hosts); a(urlOf(oh, next(counts(oh)))) }
      else a(urlOf(host, next(n)) + (if (kind == 9) "?s=1" else "#frag"))
      l += 1
    }
    sb.append("</body></html>")
    val html = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    PageRow(url, new Timestamp(1546300800000L + globalIdx * 1000L), html,
      graft.html.Html.parse(sb.toString).text, "en")
  }

  def seedUrl: String = urlOf(0, 0)
  def filterPrefix: String = ".test/"

  /** Distributed generation → DataFrame with the pages(input_hint) schema. */
  def generate(spark: SparkSession, shape: Shape): DataFrame = {
    import spark.implicits._
    val (counts, offsets) = hostLayout(shape)
    val total = offsets.last
    spark.range(total)
      .mapPartitions { it =>
        it.map(idx => buildPage(idx, counts, offsets, shape))
      }
      .toDF()
  }
}
