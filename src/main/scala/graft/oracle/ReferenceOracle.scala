package graft.oracle

import scala.collection.mutable
import graft.corpus.PageRow
import graft.html.{Html, UrlCanon}
import graft.text.TextPipeline

/** Single-threaded, deterministic re-implementation of the reference's
  * rules (the reference's own traversal is racy — parallelStream over
  * shared mutable sets, SpiderMain.kt:47-61 — so the canonical spec is the
  * sequential equivalent; see SURVEY.md §5, FIXTURES.md §2). The Spark
  * engine must match this oracle EXACTLY on: URL-seen set, url_id
  * assignment, adjacency, PageRank (1e-6), word ids, postings, 6-dp tfidf,
  * doc lengths, per-query score breakdowns, top-50 ordering.
  *
  * Canonical crawl spec (level-synchronous BFS rounds — the deterministic
  * reading of SpiderMain.kt:47-61's recursive expansion):
  *   - state: seen (= reference urlSet: every DISCOVERED link), visited
  *     (fetched), frontier (discovered, unfetched) with first-discovery depth;
  *   - frontier starts at the seed list (depth 0); seen starts EMPTY — the
  *     reference never adds the seed to urlSet unless some page links to it;
  *   - each round, candidates = frontier ordered by (depth asc, url asc);
  *     per-host politeness keeps the first B per host (north_rule N1;
  *     B=∞ ≡ reference); robots disallow-prefixes filter candidates when
  *     enabled (north_rule N2; allow-all ≡ reference);
  *   - fetch = look the url up in the pages table; missing pages produce
  *     no links but still count as visited;
  *   - links = the reference's extractLink pipeline with self=true
  *     (SpiderMain.kt:54); all links join `seen`; links not seen before and
  *     not visited join the frontier at depth+1 (min across parents);
  *   - stop when seen.size > maxSeen, checked BETWEEN rounds (the
  *     reference checks on node entry, SpiderMain.kt:52), or the frontier
  *     empties, or an optional round/depth cap hits.
  */
object ReferenceOracle {

  final case class CrawlParams(
      seeds: Seq[String],
      filter: String,
      maxSeen: Long = Long.MaxValue,
      hostBudget: Int = Int.MaxValue,
      maxDepth: Int = Int.MaxValue,
      respectRobots: Boolean = false,
      maxRounds: Int = Int.MaxValue)

  final case class RoundMetrics(
      round: Int, selected: Long, fetched: Long, linksExtracted: Long,
      newSeen: Long, seenTotal: Long, frontierNext: Long)

  final case class CrawlState(
      seen: Set[String],
      visited: Set[String],
      frontier: Map[String, Int], // url → depth
      rounds: Vector[RoundMetrics])

  def robotsDisallows(pages: Seq[PageRow]): Map[String, Vector[String]] =
    pages.filter(_.url.endsWith("/robots.txt")).map { p =>
      val host = UrlCanon.hostOf(p.url)
      val prefixes = new String(p.html, "UTF-8").linesIterator
        .map(_.trim).filter(_.toLowerCase.startsWith("disallow:"))
        .map(_.substring("disallow:".length).trim).filter(_.nonEmpty).toVector
      host -> prefixes
    }.toMap

  def crawl(pages: Seq[PageRow], params: CrawlParams): CrawlState = {
    val byUrl = pages.map(p => p.url -> p).toMap
    val disallow = if (params.respectRobots) robotsDisallows(pages) else Map.empty[String, Vector[String]]

    val seen = mutable.Set.empty[String]
    val visited = mutable.Set.empty[String]
    var frontier = mutable.SortedMap.empty[String, Int] // url → depth
    params.seeds.foreach(s => frontier(s) = 0)
    val metrics = Vector.newBuilder[RoundMetrics]

    var round = 0
    var done = false
    while (!done && round < params.maxRounds && frontier.nonEmpty && seen.size <= params.maxSeen) {
      val candidates = frontier.toVector
        .filter { case (u, d) => d <= params.maxDepth }
        .filter { case (u, _) =>
          !params.respectRobots || {
            val host = UrlCanon.hostOf(u)
            val path = UrlCanon.pathOf(u)
            !disallow.getOrElse(host, Vector.empty).exists(path.startsWith)
          }
        }
        .sortBy { case (u, d) => (d, u) }

      val perHost = mutable.Map.empty[String, Int]
      val selected = candidates.filter { case (u, _) =>
        val h = UrlCanon.hostOf(u)
        val c = perHost.getOrElse(h, 0)
        if (c < params.hostBudget) { perHost(h) = c + 1; true } else false
      }
      if (selected.isEmpty) { done = true }
      else {
        val seenBefore = seen.size
        var fetched = 0L
        var linksTotal = 0L
        val newFrontier = mutable.Map.empty[String, Int]
        selected.foreach { case (url, depth) =>
          visited += url
          byUrl.get(url).foreach { page =>
            fetched += 1
            val links = UrlCanon.extractLinks(Html.parseBytes(page.html).hrefs,
              url, params.filter, self = true)
            linksTotal += links.size
            links.foreach { l =>
              if (!seen.contains(l) && !visited.contains(l) && !frontier.contains(l)) {
                val d = newFrontier.getOrElse(l, Int.MaxValue) min (depth + 1)
                newFrontier(l) = d
              }
              seen += l
            }
          }
        }
        selected.foreach { case (u, _) => frontier.remove(u) }
        newFrontier.foreach { case (u, d) =>
          if (!visited.contains(u) && !frontier.contains(u)) frontier(u) = d
        }
        metrics += RoundMetrics(round, selected.size, fetched, linksTotal,
          seen.size - seenBefore, seen.size, frontier.size)
        round += 1
      }
    }
    CrawlState(seen.toSet, visited.toSet, frontier.toMap, metrics.result())
  }

  // ---------------- indexing (SpiderMain.kt:105-188, TfIdfMain.kt) ----------

  final case class Index(
      urlIds: Map[String, Long],             // sorted-url dense rank (T1)
      urlsById: Vector[String],
      links: Map[Long, Vector[Long]],        // src → dst ids (per-page order, deduped)
      docWords: Map[Long, Vector[Long]],     // forward index (word ids in doc order)
      wordIds: Map[String, Long],            // first-encounter scanning ascending url_id
      wordCountList: Map[Long, Vector[(Long, Int)]], // count desc, first-occurrence stable
      postings: Map[Long, Map[Long, Int]],   // word → doc → tf
      tfidfRaw: Map[(Long, Long), Double],   // (doc, word) → raw
      tfidfR6: Map[(Long, Long), Double],    // (doc, word) → 6-dp rounded
      docLen: Map[Long, Double],             // sqrt Σ raw² (docs with ≥1 word only)
      titles: Map[Long, String],
      n: Long)

  def round6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def buildIndex(pages: Seq[PageRow], seen: Set[String], filter: String): Index = {
    val byUrl = pages.map(p => p.url -> p).toMap
    val sortedUrls = seen.toVector.sorted
    val urlIds = sortedUrls.zipWithIndex.map { case (u, i) => u -> i.toLong }.toMap

    // adjacency: re-extract with self=false (SpiderMain.kt:113-123); the
    // inner url_dict join silently drops targets outside the seen set
    val links = sortedUrls.map { u =>
      val id = urlIds(u)
      val dsts = byUrl.get(u).map { p =>
        UrlCanon.extractLinks(Html.parseBytes(p.html).hrefs, u, filter, self = false)
          .flatMap(urlIds.get)
      }.getOrElse(Vector.empty)
      id -> dsts
    }.toMap

    // word ids: first encounter scanning docs in ascending url_id
    val wordIds = mutable.LinkedHashMap.empty[String, Long]
    val docWords = mutable.Map.empty[Long, Vector[Long]]
    val wordCountList = mutable.Map.empty[Long, Vector[(Long, Int)]]
    val postings = mutable.Map.empty[Long, mutable.Map[Long, Int]]
    val titles = mutable.Map.empty[Long, String]

    sortedUrls.foreach { u =>
      val id = urlIds(u)
      val page = byUrl.get(u)
      // lastChild of the first <title>; missing page OR missing title →
      // "Unauthorized" (HTMLParser.kt:186-195: any fetch/parse failure,
      // including elementAt(0) on an empty node list, hits the catch)
      titles(id) = page.flatMap(p => Html.parseBytes(p.html).title)
        .getOrElse("Unauthorized")
      val words = page.map(p => TextPipeline.tokenize(p.text)).getOrElse(Vector.empty)
      val ids = words.map { w =>
        wordIds.getOrElseUpdate(w, wordIds.size.toLong)
      }
      docWords(id) = ids
      // per-doc counts in first-occurrence order (Kotlin LinkedHashMap)
      val counts = mutable.LinkedHashMap.empty[Long, Int]
      ids.foreach { wid => counts(wid) = counts.getOrElse(wid, 0) + 1 }
      // stable sort by count desc (SpiderMain.kt:171-173)
      wordCountList(id) = counts.toVector.sortBy { case (_, c) => -c }
      counts.foreach { case (wid, c) =>
        postings.getOrElseUpdate(wid, mutable.Map.empty)(id) = c
      }
    }

    val n = sortedUrls.size.toLong
    val logTwo = math.log(2.0)
    val tfidfRaw = mutable.Map.empty[(Long, Long), Double]
    val tfidfR6 = mutable.Map.empty[(Long, Long), Double]
    val docLen = mutable.Map.empty[Long, Double]

    sortedUrls.foreach { u =>
      val id = urlIds(u)
      val wc = wordCountList(id)
      if (wc.nonEmpty) { // TfIdfMain.kt:26 skips empty docs
        var sumSq = 0.0
        wc.foreach { case (wid, c) =>
          val df = postings(wid).size
          val t = c.toDouble * math.log(n.toDouble / df.toDouble) / logTwo
          tfidfRaw((id, wid)) = t
          tfidfR6((id, wid)) = round6(t)
          sumSq += t * t
        }
        docLen(id) = math.sqrt(sumSq)
      }
    }

    Index(urlIds, sortedUrls, links, docWords.toMap, wordIds.toMap,
      wordCountList.toMap, postings.map { case (k, v) => k -> v.toMap }.toMap,
      tfidfRaw.toMap, tfidfR6.toMap, docLen.toMap, titles.toMap, n)
  }

  // ---------------- PageRank (SpiderMain.kt:201-263) ------------------------

  /** rank ← 0.15 + 0.85 · Σ_in rank(src)/outdeg(src); init 1.0; no dangling
    * redistribution, no 1/N scaling; zero in-degree ⇒ 0.15 after iter 1. */
  def pageRank(index: Index, iters: Int): Array[Double] = {
    val n = index.n.toInt
    val ranks = Array.fill(n)(1.0)
    val outDeg = Array.tabulate(n)(i => index.links.getOrElse(i.toLong, Vector.empty).size)
    var it = 0
    while (it < iters) {
      val next = Array.fill(n)(0.0)
      var src = 0
      while (src < n) {
        val dsts = index.links.getOrElse(src.toLong, Vector.empty)
        if (dsts.nonEmpty) {
          val w = ranks(src) / outDeg(src)
          dsts.foreach(d => next(d.toInt) += w)
        }
        src += 1
      }
      var i = 0
      while (i < n) { ranks(i) = 0.15 + 0.85 * next(i); i += 1 }
      it += 1
    }
    ranks
  }

  // ---------------- query scoring (Ranker.kt, WebController.kt) -------------

  final case class Scored(urlId: Long, total: Double, cos: Double, pr: Double,
                          title: Double)

  /** countMatches-style non-overlapping phrase count (Ranker.kt:64-76). */
  def countPhrase(words: Vector[Long], phrase: Vector[Long]): Int = {
    if (phrase.isEmpty || phrase.size > words.size) return 0
    var count = 0
    var i = 0
    while (i <= words.size - phrase.size) {
      var j = 0
      var ok = true
      while (ok && j < phrase.size) { if (words(i + j) != phrase(j)) ok = false; j += 1 }
      if (ok) { count += 1; i += phrase.size } else i += 1
    }
    count
  }

  def search(query: String, index: Index, ranks: Array[Double], topK: Int = 50): Vector[(Int, Scored)] = {
    val groups = TextPipeline.tokenizeQuery(query)
    // findWordId (Ranker.kt:100-119): unknown word in a phrase kills the
    // phrase; unknown single word is dropped
    val idGroups = groups.flatMap { g =>
      val isPhrase = g.size > 1
      val resolved = mutable.ListBuffer.empty[Long]
      var killed = false
      g.foreach { w =>
        if (!killed) index.wordIds.get(w) match {
          case Some(id) => resolved += id
          case None => if (isPhrase) { resolved.clear(); killed = true }
        }
      }
      if (resolved.nonEmpty) Some(resolved.toVector) else None
    }

    val scores = mutable.Map.empty[Long, Double]
    idGroups.foreach { g =>
      if (g.size > 1) {
        index.docLen.keys.foreach { docId =>
          val words = index.docWords.getOrElse(docId, Vector.empty)
          val c = countPhrase(words, g)
          if (c > 0) {
            val termSum = g.map(t => index.tfidfR6((docId, t))).sum
            scores(docId) = scores.getOrElse(docId, 0.0) + termSum * c
          }
        }
      } else {
        val w = g.head
        index.postings.getOrElse(w, Map.empty).foreach { case (docId, tf) =>
          scores(docId) = scores.getOrElse(docId, 0.0) + tf.toDouble * index.tfidfR6((docId, w))
        }
      }
    }

    val queryLength = math.sqrt(idGroups.map(_.size).sum.toDouble)
    val normScores = scores.map { case (d, s) => d -> s / (index.docLen(d) * queryLength) }

    if (normScores.isEmpty) return Vector.empty
    val meanScore = normScores.values.sum / (normScores.size * 3)
    val maxPR = ranks.max * 3
    val flatStems = groups.flatten

    val results = normScores.toVector.map { case (docId, s) =>
      val maxTf = index.wordCountList(docId).head._2
      val normCos = s / maxTf.toDouble
      val title = index.titles(docId)
      val titleTerms = TextPipeline.tokenize(title)
      var titleScore = 0.0
      flatStems.foreach { t =>
        if (titleTerms.contains(t) || UrlCanon.containsIgnoreCase(title, t))
          titleScore += meanScore
      }
      val prScore = ranks(docId.toInt) / maxPR
      Scored(docId, normCos + prScore + titleScore, normCos, prScore, titleScore)
    }

    results.sortBy(r => (-r.total, r.urlId)).take(topK)
      .zipWithIndex.map { case (r, i) => (i + 1, r) }
  }
}
