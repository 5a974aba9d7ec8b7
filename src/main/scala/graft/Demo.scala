package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.TestCorpus
import graft.crawler.{CrawlConfig, Crawler}
import graft.index.Indexer
import graft.rank.{PageRankSpark, Searcher}

/** spark-submit-able end-to-end driver: synthesize a pages corpus, crawl it
  * with politeness + robots + snapshot checkpoints, build the index, run
  * PageRank, serve a query. Usage:
  *
  *   runMain graft.Demo <workDir> [query] [--resume] [--maxRounds N]
  *                      [--budget B] [--robots] [--hosts H] [--pages P]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(sys.error("usage: Demo <workDir> [query] [flags]"))
    // flags that CONSUME the next argument — their values must not be
    // mistaken for the query (`Demo /w --maxRounds 3` used to search "3")
    val valueFlags = Set("--maxRounds", "--budget", "--hosts", "--pages")
    val query = {
      var q: Option[String] = None
      var i = 1
      while (q.isEmpty && i < args.length) {
        if (valueFlags.contains(args(i))) i += 2
        else if (args(i).startsWith("--")) i += 1
        else { q = Some(args(i)) }
      }
      q.getOrElse("\"hong kong\" research")
    }
    def flag(name: String): Option[String] = {
      val i = args.indexOf(name); if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val resume = args.contains("--resume")
    val maxRounds = flag("--maxRounds").map(_.toInt).getOrElse(Int.MaxValue)
    val budget = flag("--budget").map(_.toInt).getOrElse(Int.MaxValue)
    val robots = args.contains("--robots")
    val hosts = flag("--hosts").map(_.toInt).getOrElse(4)
    val pagesPerHost = flag("--pages").map(_.toInt).getOrElse(12)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // pages table lives under the work dir (write once, reuse on resume)
    val pagesPath = s"$workDir/pages"
    if (!new java.io.File(pagesPath).exists()) {
      val corpus = TestCorpus.generate(TestCorpus.bench(hosts, pagesPerHost))
      spark.createDataset(corpus).toDF().write.mode("overwrite").parquet(pagesPath)
    }
    val pages = spark.read.parquet(pagesPath)
    println(s"[demo] pages table: ${pages.count()} rows")

    val cfg = CrawlConfig(
      seeds = Seq(TestCorpus.seedUrl), filter = TestCorpus.filterPrefix,
      hostBudget = budget, respectRobots = robots, maxRounds = maxRounds,
      workDir = Some(s"$workDir/crawl"))
    val t0 = System.nanoTime()
    val crawl = if (resume) Crawler.resume(spark, pages, cfg)
                else Crawler.run(spark, pages, cfg)
    val crawlSec = (System.nanoTime() - t0) / 1e9
    crawl.rounds.foreach(r => println(
      f"[demo] round ${r.round}%2d: selected=${r.selected}%5d fetched=${r.fetched}%5d " +
      f"links=${r.linksExtracted}%6d newSeen=${r.newSeen}%5d seenTotal=${r.seenTotal}%6d " +
      f"frontier=${r.frontierNext}%5d ${r.wallMillis}ms"))
    val seenCount = crawl.seen.count()
    println(f"[demo] crawl: $seenCount urls seen in $crawlSec%.1fs " +
      f"(${seenCount / math.max(crawlSec, 1e-9)}%.0f urls/sec incl. index-free rounds)" +
      (if (resume) s" [resumed from round ${crawl.resumedFromRound}]" else ""))

    val frontierLeft = crawl.frontier.count()
    if (frontierLeft > 0 && maxRounds != Int.MaxValue) {
      println(s"[demo] stopped early at maxRounds=$maxRounds with frontier " +
        s"$frontierLeft — rerun with --resume to continue")
      spark.stop(); return
    }

    val index = Indexer.build(spark, pages, crawl.seen, cfg.filter,
      partitions = cpus.toInt)
    println(s"[demo] index: N=${index.n} docs, ${index.wordDict.count()} words, " +
      s"${index.links.count()} edges, ${index.postings.count()} postings")

    val ranks = PageRankSpark.run(index.links, index.urlDict.select("url_id"), 40)
    val prepared = Searcher.prepare(index, ranks)
    println(s"""[demo] query: $query""")
    val serp = Searcher.search(spark, prepared, query)
    serp.show(10, truncate = 60)
    println(s"[demo] ${serp.count()} results")
    spark.stop()
  }
}
