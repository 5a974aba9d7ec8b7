package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.TestCorpus
import graft.crawler.{CrawlConfig, Crawler}
import graft.snapshot.SnapshotLog

/** North_rule checkpoint semantics: a crawl killed mid-run resumes from the
  * latest Iceberg-style snapshot with IDENTICAL ordering — the resumed
  * run's rounds and final state must be indistinguishable from an
  * uninterrupted run. */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = TestCorpus.generate(TestCorpus.tiny)
  private lazy val pagesDf = spark.createDataset(corpus).toDF().cache()
  private val seeds = Seq(TestCorpus.seedUrl)
  private val filter = TestCorpus.filterPrefix

  test("kill at round k + resume ≡ uninterrupted run (seen, frontier, rounds)") {
    val full = Crawler.run(spark, pagesDf,
      CrawlConfig(seeds, filter, hostBudget = 3))

    val dir = Files.createTempDirectory("graft-resume").toString
    val cfgK = CrawlConfig(seeds, filter, hostBudget = 3,
      maxRounds = 2, workDir = Some(dir))
    val killed = Crawler.run(spark, pagesDf, cfgK)
    assert(killed.rounds.size == 2)

    val resumed = Crawler.resume(spark, pagesDf,
      cfgK.copy(maxRounds = Int.MaxValue))
    assert(resumed.resumedFromRound == 2)

    // identical final state
    assert(resumed.seen.select("url").as[String].collect().toSet ==
      full.seen.select("url").as[String].collect().toSet)
    assert(resumed.frontier.count() == full.frontier.count())
    // identical per-round trajectory after the kill point
    val fullTail = full.rounds.drop(2).map(r => (r.round, r.selected, r.newSeen, r.seenTotal))
    val resTail = resumed.rounds.map(r => (r.round, r.selected, r.newSeen, r.seenTotal))
    assert(resTail == fullTail)
  }

  test("snapshot manifests: chained ids, cumulative deltas, lineage rows sum to delta size") {
    val dir = Files.createTempDirectory("graft-snap").toString
    Crawler.run(spark, pagesDf,
      CrawlConfig(seeds, filter, maxRounds = 3, workDir = Some(dir)))
    val log = new SnapshotLog(s"$dir")
    val ids = log.listIds
    assert(ids == Vector(0, 1, 2))
    val snaps = ids.map(log.read)
    assert(snaps.map(_.round) == Vector(0, 1, 2))
    snaps.foreach { s =>
      assert(s.seenDeltaPaths.size == s.round + 1) // cumulative
      val deltaRows = spark.read.parquet(s.seenDeltaPaths.last).count()
      assert(s.lineage.map(_.rows).sum == deltaRows)
      assert(s.metrics.newSeen == deltaRows)
    }
    // seenCount is monotone and equals the union of deltas
    assert(snaps.map(_.seenCount) == snaps.map(_.seenCount).sorted)
    val totalSeen = spark.read.parquet(snaps.last.seenDeltaPaths: _*).count()
    assert(totalSeen == snaps.last.seenCount)
  }
}
