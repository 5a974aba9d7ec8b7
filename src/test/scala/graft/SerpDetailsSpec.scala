package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.TestCorpus
import graft.crawler.{CrawlConfig, Crawler}
import graft.index.Indexer
import graft.oracle.ReferenceOracle
import graft.oracle.ReferenceOracle.CrawlParams
import graft.rank.{PageRankSpark, Searcher}

/** A3/T4/J7/S6/F11 fixtures: the word-count list ordering, top-5 terms,
  * SERP metadata joins, CSV fixture encoding, 6-dp string form. */
class SerpDetailsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = TestCorpus.generate(TestCorpus.tiny)
  private lazy val pagesDf = spark.createDataset(corpus).toDF().cache()
  private val seeds = Seq(TestCorpus.seedUrl)
  private val filter = TestCorpus.filterPrefix
  private lazy val oCrawl = ReferenceOracle.crawl(corpus, CrawlParams(seeds, filter))
  private lazy val oIdx = ReferenceOracle.buildIndex(corpus, oCrawl.seen, filter)
  private lazy val eCrawl = Crawler.run(spark, pagesDf, CrawlConfig(seeds, filter))
  private lazy val eIdx = Indexer.build(spark, pagesDf, eCrawl.seen, filter, 4)

  test("A3: word-count list = count desc, first-occurrence-stable ties") {
    val engine = eIdx.urlWordCount
      .select(col("url_id"), col("pairs"))
      .as[(Long, Seq[(Long, Int)])].collect().toMap
    val oracle = oIdx.wordCountList.filter(_._2.nonEmpty)
    assert(engine.keySet == oracle.keySet)
    oracle.foreach { case (d, wc) =>
      assert(engine(d) == wc, s"word-count list mismatch for doc $d") }
  }

  test("T4/J7/F12: serpDetails metadata block matches the oracle index") {
    val ranks = PageRankSpark.run(eIdx.links, eIdx.urlDict.select("url_id"), 40)
    val prepared = Searcher.prepare(eIdx, ranks)
    val serp = Searcher.search(spark, prepared, "research systems")
    val details = Searcher.serpDetails(prepared, serp)
    assert(details.count() == serp.count())

    val row = details.orderBy("rank").head()
    val id = row.getAs[Long]("url_id")
    // top-5 terms = first 5 of the oracle's count-desc list
    val gotTerms = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top_terms")
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    val wordById = oIdx.wordIds.map(_.swap)
    val expTerms = oIdx.wordCountList(id).take(5)
      .map { case (w, c) => (wordById(w), c) }
    assert(gotTerms == expTerms)
    // child/parent lists match the oracle adjacency (as url sets)
    val urlById = oIdx.urlsById
    val expChildren = oIdx.links(id).map(i => urlById(i.toInt)).sorted
    assert(row.getAs[scala.collection.Seq[String]]("child_urls").toSeq == expChildren)
    val expParents = oIdx.links.toSeq.collect {
      case (s, ds) if ds.contains(id) => urlById(s.toInt) }.sorted
    assert(row.getAs[scala.collection.Seq[String]]("parent_urls").toSeq == expParents)
    // HKT render shape
    assert(row.getAs[String]("last_modified_hkt")
      .matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))
  }

  test("cache hygiene: repeated search() calls do not grow the persisted-plan set") {
    val ranks = PageRankSpark.run(eIdx.links, eIdx.urlDict.select("url_id"), 5)
    val prepared = Searcher.prepare(eIdx, ranks)
    Searcher.search(spark, prepared, "research systems") // warm
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 3).foreach { _ =>
      Searcher.search(spark, prepared, "research systems").count()
      Searcher.search(spark, prepared, "the of and").count() // 0-result path
    }
    // growth check by RDD id (not total count): the ContextCleaner may
    // concurrently reclaim DEAD persisted RDDs (e.g. an old crawl
    // localCheckpoint whose reference was dropped) — shrinkage is fine,
    // what search() must never do is ADD a persisted plan per query
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty,
      s"per-query caches must be released after the SERP materializes: $added")
    prepared.close()
  }

  test("concurrent serves on the dedicated session: two racing search() " +
       "calls while the parent runs an AQE query — results exact, parent " +
       "conf untouched (r6 verdict #7)") {
    val ranks = PageRankSpark.run(eIdx.links, eIdx.urlDict.select("url_id"), 40)
    val prepared = Searcher.prepare(eIdx, ranks)
    // reference results, computed single-threaded first
    def serpOf(q: String): Seq[(Int, Long, Double)] =
      Searcher.search(spark, prepared, q)
        .select("rank", "url_id", "total")
        .as[(Int, Long, Double)].collect().toSeq
    val exp1 = serpOf("research systems")
    val exp2 = serpOf("\"hong kong\" research")
    val parentAqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val parentSpBefore = spark.conf.get("spark.sql.shuffle.partitions")

    val results = new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Long, Double)]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(3)
    val t1 = new Thread(() => {
      try { barrier.await(); results.put("q1", serpOf("research systems")) }
      catch { case e: Throwable => errors.add(e) }
    })
    val t2 = new Thread(() => {
      try { barrier.await(); results.put("q2", serpOf("\"hong kong\" research")) }
      catch { case e: Throwable => errors.add(e) }
    })
    val t3 = new Thread(() => { // a PARENT-session AQE query racing the serves
      try {
        barrier.await()
        (1 to 3).foreach { _ =>
          pagesDf.groupBy(length(col("url")) % 7).count().collect()
        }
      } catch { case e: Throwable => errors.add(e) }
    })
    Seq(t1, t2, t3).foreach(_.start()); Seq(t1, t2, t3).foreach(_.join())
    assert(errors.isEmpty, s"concurrent serve threw: ${errors.peek()}")
    assert(results.get("q1") == exp1, "racing serve changed q1's SERP")
    assert(results.get("q2") == exp2, "racing serve changed q2's SERP")
    // the parent session's conf was never touched by the serves
    assert(spark.conf.get("spark.sql.adaptive.enabled") == parentAqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == parentSpBefore)
    prepared.close()
  }

  test("S6: quoted-CSV fixture encoding matches the reference's opencsv form") {
    val df = Seq((Seq(3L, 17L, 42L), Seq("a", "b"))).toDF("ids", "ws")
    val got = df.select(Indexer.csvQuoted(col("ids")).as("c1"),
      Indexer.csvQuoted(col("ws")).as("c2")).head()
    assert(got.getString(0) == "\"3\",\"17\",\"42\"") // CSVParser.kt example form
    assert(got.getString(1) == "\"a\",\"b\"")
  }

  test("F11: %.6f string form of tfidf matches the oracle's storage string") {
    val engine = eIdx.tfidf
      .select(col("url_id"), col("word_id"), format_string("%.6f", col("tfidf")).as("s"))
      .as[(Long, Long, String)].collect()
      .map { case (d, w, s) => (d, w) -> s }.toMap
    oIdx.tfidfRaw.foreach { case (k, raw) =>
      assert(engine(k) == "%.6f".format(raw), s"string form mismatch at $k") }
  }
}
