package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Structured-Streaming operators driven deterministically: MemoryStream
  * batches + processAllAvailable, results in memory sinks. Each test
  * checks cross-batch STATE semantics (the part a batch test can't). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private var qn = 0
  private def nextName(): String = { qn += 1; s"streamspec_$qn" }

  test("seenFilter emits each url exactly once ACROSS micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamOps.seenFilter(in.toDF().toDF("url"))
      .writeStream.format("memory").queryName(nextName())
      .outputMode("append").start()
    in.addData("a", "b", "a")
    q.processAllAvailable()
    in.addData("b", "c", "a") // re-discoveries from earlier batches
    q.processAllAvailable()
    val got = spark.table(s"streamspec_$qn").select("url")
      .as[String].collect().sorted.toSeq
    q.stop()
    assert(got == Seq("a", "b", "c"))
  }

  test("fetchRateByHost: watermarked tumbling windows count per host") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "host")
    val q = StreamOps.fetchRateByHost(df, "ts", "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName(nextName())
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    in.addData((ts(1), "h1"), (ts(3), "h1"), (ts(4), "h2"), (ts(12), "h1"))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    in.addData((ts(40), "h2"))
    q.processAllAvailable()
    val got = spark.table(s"streamspec_$qn")
      .select(col("window_start").cast("long"), col("host"), col("fetches"))
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(got.contains((0L, "h1", 2L)))
    assert(got.contains((0L, "h2", 1L)))
    assert(got.contains((10L, "h1", 1L)))
  }

  test("politenessGate: per-host budget persists across micro-batches " +
       "(custom mapGroupsWithState state)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StreamOps.FetchRequest]
    val q = StreamOps.politenessGate(in.toDS(), budget = 2)
      .writeStream.format("memory").queryName(nextName())
      .outputMode("append").start()
    in.addData(StreamOps.FetchRequest("h1", "u1"),
      StreamOps.FetchRequest("h1", "u2"), StreamOps.FetchRequest("h2", "u3"))
    q.processAllAvailable()
    // second batch: h1 already spent its budget of 2 — MUST be deferred
    in.addData(StreamOps.FetchRequest("h1", "u4"),
      StreamOps.FetchRequest("h2", "u5"))
    q.processAllAvailable()
    val got = spark.table(s"streamspec_$qn")
      .as[StreamOps.GatedFetch].collect()
      .map(g => (g.host, g.url) -> g.allowed).toMap
    q.stop()
    assert(got(("h1", "u1")) && got(("h1", "u2")))
    assert(!got(("h1", "u4")), "h1's third request must exceed budget 2")
    assert(got(("h2", "u3")) && got(("h2", "u5")))
  }

  test("politenessTagByRound: one-pass tag — blocked rows never consume " +
       "budget, ranking is (eligible DESC, depth, url), budget resets per " +
       "batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StreamOps.PoliteTaggedRequest]
    val q = StreamOps.politenessTagByRound(in.toDS(), budget = 2)
      .writeStream.format("memory").queryName(nextName())
      .outputMode("append").start()
    // h1: an INELIGIBLE row that sorts first by (depth, url) — it must
    // rank AFTER every eligible row and must not eat a budget slot
    in.addData(
      StreamOps.PoliteTaggedRequest("h1", "a_blocked", 0, eligible = false),
      StreamOps.PoliteTaggedRequest("h1", "b", 1, eligible = true),
      StreamOps.PoliteTaggedRequest("h1", "c", 0, eligible = true),
      StreamOps.PoliteTaggedRequest("h1", "d", 1, eligible = true),
      StreamOps.PoliteTaggedRequest("h2", "e", 2, eligible = true))
    q.processAllAvailable()
    val b1 = spark.table(s"streamspec_$qn")
      .as[StreamOps.RoundTagged].collect().map(r => r.url -> r.kind).toMap
    // budget 2 on h1 → c (depth 0) and b (depth 1 < d by url); d deferred
    assert(b1 == Map("a_blocked" -> "blocked", "c" -> "fetch",
      "b" -> "fetch", "d" -> "deferred", "e" -> "fetch"))
    // second batch: NO state carries over — h1 gets a fresh budget of 2
    in.addData(
      StreamOps.PoliteTaggedRequest("h1", "d", 1, eligible = true),
      StreamOps.PoliteTaggedRequest("h1", "f", 3, eligible = true))
    q.processAllAvailable()
    val b2 = spark.table(s"streamspec_$qn")
      .as[StreamOps.RoundTagged].collect().drop(5)
      .map(r => r.url -> r.kind).toMap
    q.stop()
    assert(b2 == Map("d" -> "fetch", "f" -> "fetch"))
  }

  test("END-TO-END: streamed crawl rounds (crawlDataflow fed back in BFS " +
       "order) reproduce the batch crawler's seen set EXACTLY") {
    implicit val sc = spark.sqlContext
    import graft.corpus.TestCorpus
    import graft.crawler.{CrawlConfig, Crawler}
    val corpus = TestCorpus.generate(TestCorpus.Spec(hosts = 3, basePagesPerHost = 8))
    val pages = spark.createDataset(corpus).toDF().cache()
    val batch = Crawler.run(spark, pages,
        CrawlConfig(Seq(TestCorpus.seedUrl), TestCorpus.filterPrefix))
      .seen.select("url", "depth").as[(String, Int)].collect().toSet

    val in = MemoryStream[(String, Int)]
    val sink = nextName()
    val q = StreamOps.crawlDataflow(in.toDF().toDF("url", "depth"), pages,
        TestCorpus.filterPrefix)
      .select("url", "depth")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    // drive BFS rounds: each micro-batch's NEW emissions (minus seeds —
    // the batch crawler never re-queues a seed) become the next frontier
    var offset = 0
    var rounds = 0
    in.addData((TestCorpus.seedUrl, 0))
    q.processAllAvailable()
    var all = spark.table(sink).as[(String, Int)].collect()
    while (all.length > offset && rounds < 40) {
      val next = all.drop(offset).filterNot(_._1 == TestCorpus.seedUrl)
      offset = all.length
      rounds += 1
      if (next.nonEmpty) {
        in.addData(next.toIndexedSeq: _*)
        q.processAllAvailable()
        all = spark.table(sink).as[(String, Int)].collect()
      }
    }
    q.stop()
    assert(all.length == all.map(_._1).distinct.length, "a url emitted twice")
    assert(all.toSet == batch,
      s"streaming seen (${all.length}) != batch seen (${batch.size})")
    assert(rounds > 2, "corpus must exercise multiple micro-batch rounds")
  }

  test("END-TO-END: streamed POLITE crawl (robots + per-round host budget " +
       "composed between frontier and fetch) reproduces the batch polite " +
       "crawler's seen set AND final frontier") {
    implicit val sc = spark.sqlContext
    import graft.corpus.TestCorpus
    import graft.crawler.{CrawlConfig, Crawler}
    val corpus = TestCorpus.generate(TestCorpus.Spec(hosts = 3, basePagesPerHost = 8))
    val pages = spark.createDataset(corpus).toDF().cache()
    val batchRes = Crawler.run(spark, pages,
      CrawlConfig(Seq(TestCorpus.seedUrl), TestCorpus.filterPrefix,
        hostBudget = 2, respectRobots = true))
    val batchSeen = batchRes.seen.select("url", "depth")
      .as[(String, Int)].collect().toSet
    val batchFrontier = batchRes.frontier.select("url", "depth")
      .as[(String, Int)].collect().toSet
    assert(batchFrontier.nonEmpty, "fixture must leave robots-blocked leftovers")

    val in = MemoryStream[(String, Int)]
    val sink = nextName()
    val q = StreamOps.politeCrawlDataflow(in.toDF().toDF("url", "depth"), pages,
        TestCorpus.filterPrefix, budget = 2)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()

    // drive rounds: each micro-batch is one crawl round; the next frontier
    // is (new discoveries ∖ seeds) ∪ deferred ∪ blocked — the exact batch
    // frontier recurrence (frontier ∖ selected) ∪ frontierAdd
    var offset = 0
    var rounds = 0
    var frontier = Vector((TestCorpus.seedUrl, 0))
    var discoveredAll = Vector.empty[(String, Int)]
    var done = false
    while (!done && rounds < 40) {
      in.addData(frontier: _*)
      q.processAllAvailable()
      val all = spark.table(sink).as[(String, Int, String)].collect()
      val batch = all.drop(offset)
      offset = all.length
      rounds += 1
      val disc = batch.filter(_._3 == "discovered").map(r => (r._1, r._2))
      val defr = batch.filter(_._3 == "deferred").map(r => (r._1, r._2))
      val blk = batch.filter(_._3 == "blocked").map(r => (r._1, r._2))
      discoveredAll ++= disc
      frontier = (disc.filterNot(_._1 == TestCorpus.seedUrl) ++ defr ++ blk)
        .toVector.distinct
      done = disc.isEmpty && defr.isEmpty
    }
    q.stop()
    assert(done, "polite stream did not drain within 40 rounds")
    assert(rounds > 3, "budget=2 must force multi-round draining")
    assert(discoveredAll.map(_._1).distinct.length == discoveredAll.length,
      "a url was discovered twice")
    assert(discoveredAll.toSet == batchSeen,
      s"streamed seen (${discoveredAll.length}) != batch (${batchSeen.size})")
    assert(frontier.toSet == batchFrontier,
      "terminal frontier (robots-blocked leftovers) diverged")
  }

  test("CHECKPOINT RECOVERY: polite streamed crawl through a real " +
       "checkpointLocation + parquet file sink, killed between micro-batches " +
       "with data in flight, resumes exactly-once and matches the batch run") {
    implicit val sc = spark.sqlContext
    import graft.corpus.TestCorpus
    import graft.crawler.{CrawlConfig, Crawler}
    val corpus = TestCorpus.generate(TestCorpus.Spec(hosts = 3, basePagesPerHost = 8))
    val pages = spark.createDataset(corpus).toDF().cache()
    val batchSeen = Crawler.run(spark, pages,
        CrawlConfig(Seq(TestCorpus.seedUrl), TestCorpus.filterPrefix,
          hostBudget = 2, respectRobots = true))
      .seen.select("url", "depth").as[(String, Int)].collect().toSet

    val work = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
    val outDir = s"$work/out"
    val ckDir = s"$work/chk"
    val in = MemoryStream[(String, Int)]
    def startQuery() = StreamOps.politeCrawlDataflow(
        in.toDF().toDF("url", "depth"), pages, TestCorpus.filterPrefix, budget = 2)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append").start()

    // multiset snapshot of the committed sink (deferred/blocked tuples
    // legitimately repeat across rounds, so per-round deltas are count
    // diffs, not set diffs); the parquet read honors _spark_metadata, so
    // only exactly-once-committed files are visible
    def snap(): Map[(String, Int, String), Int] =
      try spark.read.parquet(outDir).as[(String, Int, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      catch { // sink dir absent or still empty → nothing committed yet
        case _: org.apache.spark.sql.AnalysisException => Map.empty }
    def delta(prev: Map[(String, Int, String), Int],
              cur: Map[(String, Int, String), Int]): Seq[(String, Int, String)] =
      cur.toSeq.flatMap { case (k, n) =>
        Seq.fill(n - prev.getOrElse(k, 0))(k)
      }

    var q = startQuery()
    var prev = snap()
    var rounds = 0
    var killed = false
    var frontier = Vector((TestCorpus.seedUrl, 0))
    var discoveredAll = Vector.empty[(String, Int)]
    var done = false
    while (!done && rounds < 40) {
      in.addData(frontier: _*)
      if (rounds == 2 && !killed) {
        // KILL with this round's frontier IN FLIGHT (added, not processed):
        // the restarted query must replay it from the checkpointed offset
        // and the file sink must commit it exactly once
        q.stop()
        killed = true
        q = startQuery()
      }
      q.processAllAvailable()
      val cur = snap()
      val batch = delta(prev, cur)
      prev = cur
      rounds += 1
      val disc = batch.filter(_._3 == "discovered").map(r => (r._1, r._2))
      val defr = batch.filter(_._3 == "deferred").map(r => (r._1, r._2))
      val blk = batch.filter(_._3 == "blocked").map(r => (r._1, r._2))
      discoveredAll ++= disc
      frontier = (disc.filterNot(_._1 == TestCorpus.seedUrl) ++ defr ++ blk)
        .toVector.distinct
      done = disc.isEmpty && defr.isEmpty
    }
    q.stop()
    assert(done, "polite stream did not drain within 40 rounds")
    assert(killed, "the kill/restart must actually have happened")
    assert(rounds > 3, "budget=2 must force multi-round draining")
    // exactly-once across the kill: no url discovered twice, seen set ==
    // the uninterrupted batch crawler's
    assert(discoveredAll.map(_._1).distinct.length == discoveredAll.length,
      "a url was discovered twice across the restart")
    assert(discoveredAll.toSet == batchSeen,
      s"streamed seen (${discoveredAll.length}) != batch (${batchSeen.size})")
  }

  test("seenFilterWatermarked dedups within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("warc_ts", "url")
    val q = StreamOps.seenFilterWatermarked(df, "warc_ts", "10 seconds")
      .writeStream.format("memory").queryName(nextName())
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
    q.processAllAvailable()
    in.addData((ts(5), "a")) // still within horizon → dropped
    q.processAllAvailable()
    val got = spark.table(s"streamspec_$qn").select("url")
      .as[String].collect().sorted.toSeq
    q.stop()
    assert(got == Seq("a", "b"))
  }
}
