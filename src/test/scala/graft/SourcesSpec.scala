package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PagesTable

/** Source-layout coverage: the catalog-bucketed pages table and its plan
  * contract (pages side never shuffles in the fetch join). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def shuffles(p: SparkPlan): Int =
    p.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed pages table: fetch join shuffles ONLY the frontier side, " +
       "result identical to the plain-parquet join") {
    val corpus = graft.corpus.TestCorpus.generate(
      graft.corpus.TestCorpus.Spec(hosts = 3, basePagesPerHost = 8))
    val pagesDf = spark.createDataset(corpus).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    spark.sql("DROP TABLE IF EXISTS graft_pages_bucketed")
    PagesTable.writeBucketed(pagesDf, "graft_pages_bucketed",
      s"$dir/pages", buckets = 8)
    val bucketed = PagesTable.readBucketed(spark, "graft_pages_bucketed")

    // a frontier far past any broadcast threshold (what a 10^10-page
    // production round selects); force the shuffle-join regime and a
    // stable plan (no AQE rewrites, no broadcast)
    val old = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val frontier = spark.range(200000)
        .select(concat(lit("https://host0.test/p"), col("id"), lit(".html")).as("url"),
          lit(0).as("depth"))
      def fetchJoin(pages: org.apache.spark.sql.DataFrame) =
        pages.join(frontier, Seq("url"), "inner")
          .select(col("url"), col("depth"), length(col("html")).as("n"))

      val bucketedPlan = fetchJoin(bucketed).queryExecution.executedPlan
      val plainPlan = fetchJoin(pagesDf).queryExecution.executedPlan
      // plain join: BOTH sides exchange; bucketed: the pages scan's
      // on-disk HashPartitioning(url, 8) already satisfies the join
      // distribution — only the frontier is shuffled (into 8 partitions)
      assert(shuffles(plainPlan) == 2,
        s"plain join should shuffle both sides:\n$plainPlan")
      assert(shuffles(bucketedPlan) == 1,
        s"bucketed join must shuffle only the frontier:\n$bucketedPlan")

      // row-identical results (the layout is an optimization, not a
      // semantics change)
      val a = fetchJoin(bucketed).orderBy("url").collect().toSeq
      val b = fetchJoin(pagesDf).orderBy("url").collect().toSeq
      assert(a == b)
      assert(a.nonEmpty) // the synthetic frontier must actually hit pages
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed table round-trips content exactly (url/ts/html/text/lang)") {
    val corpus = graft.corpus.TestCorpus.generate(
      graft.corpus.TestCorpus.Spec(hosts = 2, basePagesPerHost = 5))
    val pagesDf = spark.createDataset(corpus).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed2").toString
    spark.sql("DROP TABLE IF EXISTS graft_pages_bucketed_rt")
    PagesTable.writeBucketed(pagesDf, "graft_pages_bucketed_rt",
      s"$dir/pages", buckets = 4, sorted = false)
    val back = PagesTable.readBucketed(spark, "graft_pages_bucketed_rt")
    val want = pagesDf.orderBy("url")
      .select(col("url"), col("warc_ts"), xxhash64(col("html")), col("text"), col("lang"))
      .collect().toSeq
    val got = back.orderBy("url")
      .select(col("url"), col("warc_ts"), xxhash64(col("html")), col("text"), col("lang"))
      .collect().toSeq
    assert(got == want)
  }
}
