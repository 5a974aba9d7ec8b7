package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiments for the round-7 optimization pass (not part of the
  * bench protocol; numbers cited in OPTIMIZATION_r07.md come from
  * BenchExtra / the frozen Bench). Each experiment times sub-steps of a
  * hot query or a candidate rewrite side by side. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-44s $s%8.3f s  ($r)")
    }
    def doc = spark.read.parquet(s"$sfDir/documents.parquet")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def ord = spark.read.parquet(s"$sfDir/orders.parquet")

    val which = args.headOption.getOrElse("all")

    if (which == "all" || which == "jaccard") {
      doc.count()
      val arrs = doc.repartition(cpus).select(col("doc_id"),
        gfn.trigram_shingles(col("text")).as("shingles")).persist()
      t("arrs count") { arrs.count() }
      val exploded = arrs.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      val a = exploded.toDF("a", "shingle")
      val b = exploded.toDF("b", "shingle")
      def interCur() = a.join(b, "shingle").filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      t("self-join inter string key (current)") { interCur().count() }
      t("self-join inter string key warm") { interCur().count() }
      // hash-keyed join with string residual: exact (residual equality)
      val ah = exploded.select(col("doc_id").as("a"),
        xxhash64(col("shingle")).as("h"), col("shingle").as("sha"))
      val bh = exploded.select(col("doc_id").as("b"),
        xxhash64(col("shingle")).as("h"), col("shingle").as("shb"))
      def interHash() = ah.join(bh,
          ah("h") === bh("h") && col("a") < col("b") && col("sha") === col("shb"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      t("self-join inter hash+residual") { interHash().count() }
      t("self-join inter hash+residual warm") { interHash().count() }
      // hash-only (exactness caveat — measuring the string-compare cost)
      val ah2 = exploded.select(col("doc_id").as("a"), xxhash64(col("shingle")).as("h"))
      val bh2 = exploded.select(col("doc_id").as("b"), xxhash64(col("shingle")).as("h"))
      def interHashOnly() = ah2.join(bh2, Seq("h")).filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      t("self-join inter hash only (diagnostic)") { interHashOnly().count() }
      t("self-join inter hash only warm") { interHashOnly().count() }
      arrs.unpersist()
      // full current op for reference
      t("full jaccardPairs current") { graft.ops.TrainingOps.jaccardPairs(doc, 0.4).count() }
    }

    if (which == "all" || which == "joinrev") {
      li.count(); ord.count()
      def current() = {
        val l = li.withColumn("rev",
          gfn.round_exact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .cast("decimal(18,2)"))
        l.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(sum("rev").cast("double").as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(100)
      }
      def preagg() = {
        val l = li.select(col("l_orderkey"),
            gfn.round_exact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
              .cast("decimal(18,2)").as("rev"))
          .groupBy("l_orderkey")
          .agg(sum("rev").as("rev_sum"), count(lit(1)).as("cnt"))
        l.join(ord.select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(sum("rev_sum").cast("double").as("revenue"),
            sum("cnt").as("n_items"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(100)
      }
      t("joinrev current") { current().count() }
      t("joinrev current warm") { current().count() }
      t("joinrev preagg") { preagg().count() }
      t("joinrev preagg warm") { preagg().count() }
    }

    if (which == "cosine") {
      // dot-product kernel A/B: codegen'd expression vs the HOF form, on
      // the exact all-pairs op (the dot-dominated extreme)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      emb.count()
      def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      def pairsWith(dotf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
        val e = emb.repartition(cpus).select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        val a = e.toDF("a", "va")
        val b = e.toDF("b", "vb")
        a.crossJoin(b).filter(col("a") < col("b"))
          .withColumn("cos", gfn.round_exact(dotf(col("va"), col("vb")) /
            (sqrt(dotf(col("va"), col("va"))) * sqrt(dotf(col("vb"), col("vb")))), 4))
          .filter(col("cos") >= 0.4).count()
      }
      t("cosine_pairs HOF dot cold") { pairsWith(hofDot) }
      t("cosine_pairs HOF dot warm") { pairsWith(hofDot) }
      t("cosine_pairs codegen dot cold") { pairsWith(gfn.dot_product) }
      t("cosine_pairs codegen dot warm") { pairsWith(gfn.dot_product) }
    }

    if (which == "demo") {
      // decompose the serp_index_build residual via the REAL memoized path
      t("q_crawl_seen (demo crawl)") {
        SparkEntry.queries("q_crawl_seen")(spark, sfDir).count() }
      t("q_pagerank (index build + pagerank)") {
        SparkEntry.queries("q_pagerank")(spark, sfDir).count() }
      t("q_serp (prepare + first search)") {
        SparkEntry.queries("q_serp")(spark, sfDir).count() }
      t("q_serp warm") {
        SparkEntry.queries("q_serp")(spark, sfDir).count() }
      t("q_topk sf (warmup component)") {
        SparkEntry.queries("q_topk")(spark, sfDir).count() }
    }

    if (which == "prodsplit") {
      // decompose the prod-mode overhead (VERDICT r6 #4): one config
      // dimension at a time on the bench corpus, 2 reps each, best-of
      import graft.crawler.{CrawlConfig, Crawler}
      val pages = spark.read.parquet("/tmp/graft-bench-pages-v3-400000")
      val base = CrawlConfig(
        seeds = Seq(graft.corpus.BenchCorpus.seedUrl),
        filter = graft.corpus.BenchCorpus.filterPrefix,
        bloomExpectedItems = 1L << 20, bloomMinSeen = 1L << 22,
        broadcastMaxRows = 400000L, collectMetrics = false, pagesBuckets = 64)
      def cpuSec(): Double =
        java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
          .getProcessCpuTime / 1e9
      def crawl(tag: String, cfg: CrawlConfig, snap: Boolean): Unit = {
        val best = (1 to 2).map { rep =>
          val wd = if (snap) {
            val d = java.nio.file.Files.createTempDirectory(s"prodsplit-$tag").toString
            Some(d)
          } else None
          val c0 = cpuSec(); val t0 = System.nanoTime()
          val r = Crawler.run(spark, pages, cfg.copy(workDir = wd))
          val n = r.seen.count()
          val s = (System.nanoTime() - t0) / 1e9
          val c = cpuSec() - c0
          println(f"[prodsplit] $tag rep$rep rounds=${r.rounds.size} n=$n wall=$s%.1f cpu=$c%.1f")
          (s, c)
        }.minBy(_._1)
        println(f"[prodsplit] $tag BEST wall=${best._1}%.1f cpu=${best._2}%.1f")
      }
      crawl("mem", base, snap = false)
      crawl("polite", base.copy(hostBudget = 16384), snap = false)
      crawl("polite+robots", base.copy(hostBudget = 16384, respectRobots = true), snap = false)
      crawl("polite+bloom", base.copy(hostBudget = 16384, bloomMinSeen = 100000L), snap = false)
      crawl("polite+snap", base.copy(hostBudget = 16384), snap = true)
      crawl("prod(all)", base.copy(hostBudget = 16384, respectRobots = true,
        bloomMinSeen = 100000L), snap = true)
    }

    if (which == "all" || which == "pagerank") {
      // demo-scale pagerank: AQE-on parent session vs AQE-off child session
      import spark.implicits._
      val pages = spark.createDataset(
        graft.corpus.TestCorpus.generate(SparkEntry.demoSpec)).toDF().cache()
      var crawl: graft.crawler.CrawlResult = null
      t("demo crawl") {
        crawl = graft.crawler.Crawler.run(spark, pages,
          graft.crawler.CrawlConfig(Seq(graft.corpus.TestCorpus.seedUrl),
            graft.corpus.TestCorpus.filterPrefix))
        crawl.seen.count()
      }
      var index: graft.index.IndexTables = null
      t("demo Indexer.build") {
        index = graft.index.Indexer.build(spark, pages, crawl.seen,
          graft.corpus.TestCorpus.filterPrefix, 8)
        index.tfidf.count()
      }
      t("pagerank AQE-on parent (current)") {
        graft.rank.PageRankSpark.run(index.links,
          index.urlDict.select("url_id"), 40).count()
      }
      t("pagerank AQE-on parent warm") {
        graft.rank.PageRankSpark.run(index.links,
          index.urlDict.select("url_id"), 40).count()
      }
      val child = spark.newSession()
      child.conf.set("spark.sql.adaptive.enabled", "false")
      child.conf.set("spark.sql.shuffle.partitions", "1")
      index.links.createOrReplaceGlobalTempView("probe_links")
      index.urlDict.select("url_id").createOrReplaceGlobalTempView("probe_verts")
      val clinks = child.table("global_temp.probe_links")
      val cverts = child.table("global_temp.probe_verts")
      t("pagerank AQE-off 1-part child") {
        graft.rank.PageRankSpark.run(clinks, cverts, 40).count()
      }
      t("pagerank AQE-off 1-part child warm") {
        graft.rank.PageRankSpark.run(clinks, cverts, 40).count()
      }
    }
    spark.stop()
  }
}
