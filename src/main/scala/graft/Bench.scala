package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.BenchCorpus
import graft.crawler.{CrawlConfig, Crawler}

/** Benchmark harness (driver-run per round → BENCH_r{N}.json).
  *
  * Two measurements:
  *  1. headline operator queries on SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS;
  *  2. the BASELINE.json north metric — URLs fetched+deduped/sec on a
  *     synthetic Zipf-skewed frontier — run at TWO parallelism levels
  *     (local[8] and local[32]) on the SAME generated corpus, reporting
  *     throughput at both plus scaling efficiency = (T32/T8)/4 (the
  *     sandbox substitute for the N→4N-executor criterion; BASELINE.md).
  *
  * Prints exactly ONE JSON line.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One crawl over the shared bench corpus; returns (urlsSeen, seconds). */
  private def crawlThroughput(cpus: Int, pagesPath: String): (Long, Double) = {
    val spark = session(cpus)
    val pages = spark.read.parquet(pagesPath)
    val t0 = System.nanoTime()
    val res = Crawler.run(spark, pages, CrawlConfig(
      seeds = Seq(BenchCorpus.seedUrl), filter = BenchCorpus.filterPrefix,
      bloomExpectedItems = 1L << 21))
    val seen = res.seen.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (seen, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "120000").toInt

    // ---- headline operator queries ---------------------------------------
    val headline = Seq("q_agg_groupby", "q_join_revenue", "q_window_politeness",
      "q_tfidf", "q_jaccard_pairs", "q_minhash_lsh", "q_cosine_topk",
      "q_dedup_exact", "q_antijoin", "q_topk")
    val spark0 = session(cpus)
    val queryTimes = headline.map { name =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark0, sfDir).count()
              catch { case _: Throwable => -1L }
      name -> BigDecimal((System.nanoTime() - t0) / 1e9)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    // ---- frontier throughput at two parallelism levels --------------------
    val pagesPath = s"/tmp/graft-bench-pages-$benchPages"
    if (!new java.io.File(pagesPath).exists()) {
      BenchCorpus.generate(spark0,
        BenchCorpus.Shape(hosts = 64, totalPages = benchPages))
        .write.mode("overwrite").parquet(pagesPath)
    }
    spark0.stop()

    val (seen8, sec8) = crawlThroughput(8, pagesPath)
    val (seen32, sec32) = crawlThroughput(32, pagesPath)
    val ups8 = seen8 / sec8
    val ups32 = seen32 / sec32
    val efficiency = (ups32 / ups8) / 4.0

    def f(x: Double): String = BigDecimal(x)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    val qs = (queryTimes ++ Seq(
      "crawl_urls_per_sec_local8" -> BigDecimal(f(ups8)).toDouble,
      "crawl_urls_per_sec_local32" -> BigDecimal(f(ups32)).toDouble,
      "crawl_seconds_local8" -> BigDecimal(f(sec8)).toDouble,
      "crawl_seconds_local32" -> BigDecimal(f(sec32)).toDouble,
      "scaling_efficiency_8_to_32" -> BigDecimal(f(efficiency)).toDouble))
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

    val total = queryTimes.map(_._2).sum
    println(s"""{"metric":"urls_fetched_deduped_per_sec_local32","value":${f(ups32)},"unit":"urls/sec","headline_total_sec":${f(total)},"crawl_corpus_pages":$seen32,"scaling_efficiency":${f(efficiency)},"queries":$qs,"sf":"$sfDir"}""")
  }
}
