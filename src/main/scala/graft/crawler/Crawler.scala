package graft.crawler

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.gfn
import graft.functions.{Bloom, BloomAggExpr, BloomProbeExpr}
import graft.snapshot.{PartitionLineage, RoundMetrics, Snapshot, SnapshotLog}

/** Crawl configuration. Neutral defaults reproduce the reference exactly:
  * unlimited per-host budget (the reference has no politeness,
  * SpiderMain.kt:58), robots ignored, count cap only (SpiderMain.kt:52
  * caps urlSet size, not depth — we support both). */
final case class CrawlConfig(
    seeds: Seq[String],
    filter: String,
    maxSeen: Long = Long.MaxValue,
    hostBudget: Int = Int.MaxValue,
    maxDepth: Int = Int.MaxValue,
    respectRobots: Boolean = false,
    maxRounds: Int = Int.MaxValue,
    bloomExpectedItems: Long = 1L << 22,
    bloomFpp: Double = 0.03,
    /** Bloom pre-filter activation threshold on the SEEN count. Below it
      * the exact shuffle-hash anti-join alone is cheaper than maintaining
      * the filter: per round, the bloom costs a multi-hundred-KB aggregate
      * buffer per partition merged on the driver, plus a re-broadcast —
      * all parallelism-INDEPENDENT latency — to route rows around ONE
      * distributed shuffle whose input is small anyway at that scale. At
      * 10⁸+ seen urls the trade inverts hard (the filter skips shuffling
      * ~all-new links against a 10-billion-row table). Crossing the
      * threshold triggers a one-time rebuild from the full seen table;
      * exactness NEVER depends on the bloom (false positives only add
      * anti-join work), proven by the bloom-on ≡ bloom-off fixtures. */
    bloomMinSeen: Long = 1L << 22,
    /** frontier-side broadcast cutoff for the fetch join (rows). Below it
      * the frontier broadcasts (the pages side is scanned in place, never
      * shuffled); above it the join shuffles both sides — a broadcast
      * build is serial driver latency, so past ~10⁵ rows the distributed
      * shuffle wins the scaling ratio even when the absolute wall is
      * close. */
    broadcastMaxRows: Long = 400000L,
    saltBuckets: Int = 16,
    workDir: Option[String] = None,
    /** false skips the metrics-only jobs (fetch/link/dedup counts) — the
      * throughput-bench mode; state-machine counts (newSeen, frontier) are
      * always exact. */
    collectMetrics: Boolean = true,
    /** >0 ⇒ the pages table is hive-partitioned by a `bucket` column equal
      * to pmod(xxhash64(url), pagesBuckets); the fetch join then includes
      * bucket equality so dynamic partition pruning reads ONLY the buckets
      * the frontier touches — small rounds stop paying a full-table scan.
      * This is the sandbox stand-in for bucketed/Iceberg-partitioned page
      * storage on a real cluster.
      *
      * CONTRACT: the value MUST equal the modulus the table was written
      * with — the join matches on bucket equality, so a mismatched
      * modulus silently drops most fetches (residues only coincide by
      * accident). The engine cannot introspect the stored layout from a
      * DataFrame; callers own this invariant (Bench threads one constant
      * through writer and config for exactly this reason). */
    pagesBuckets: Int = 0,
    /** memory-mode seen-delta compaction period (see the seen-plan comment
      * in Crawler.runInternal). Per-run (r3 ADVICE: a JVM-wide env-read
      * val meant two crawls in one process shared one period and a test
      * setting the env after class-load silently no-opped); the env var
      * only seeds the DEFAULT at config construction. */
    compactEvery: Int =
      // <= 0 means DISABLE compaction (never trigger) — the naive reading
      // of 0 would make `deltas.length >= compactEvery` true every round,
      // re-checkpointing the full cumulative seen set per round (the exact
      // O(R·N) pathology compaction exists to avoid)
      sys.env.get("SPARK_GRAFT_SEEN_COMPACT_EVERY").map(_.trim.toInt) match {
        case Some(n) if n > 0 => n
        case Some(_)          => Int.MaxValue // 0/negative = disabled
        case None             => 16
      }) {
  /** Normalized compaction period (ADVICE r6 #2): the <=0-means-disabled
    * rule must hold for PROGRAMMATIC construction too, not only the env
    * default above — CrawlConfig(compactEvery = 0) would otherwise make
    * `deltas.length >= compactEvery` true every round and re-checkpoint
    * the full cumulative seen set per round (the exact O(R·N) pathology
    * compaction exists to avoid). All engine code reads THIS value. */
  val compactEveryEff: Int = if (compactEvery <= 0) Int.MaxValue else compactEvery

  def configHash: String =
    java.lang.Long.toHexString(graft.functions.ExprImpl.hashCfg(
      s"$seeds|$filter|$maxSeen|$hostBudget|$maxDepth|$respectRobots"))
}

final case class CrawlResult(
    seen: DataFrame,     // url, url_hash, depth
    frontier: DataFrame, // url, host, depth (unfetched remainder)
    rounds: Vector[RoundMetrics],
    resumedFromRound: Int)

/** Spark-native URL-frontier crawler: a driver loop of level-synchronous
  * BFS rounds over the `pages` table (the deterministic Spark reading of
  * the reference's racy recursive expansion, SpiderMain.kt:47-61; canonical
  * spec in graft.oracle.ReferenceOracle's scaladoc — engine and oracle
  * implement the same spec and must match EXACTLY).
  *
  * Scale design (north_rule):
  *   - "fetch" = equi-join frontier✕pages on url — broadcast the frontier
  *     side when small, shuffle join otherwise (AQE re-plans at runtime);
  *   - URL-seen set: exact `left_anti` join against the seen table, with a
  *     driver-merged broadcast Bloom pre-filter that routes
  *     definitely-new URLs around the join (false positives only add work
  *     to the exact join; false negatives are impossible — exactness never
  *     depends on the Bloom);
  *   - per-host politeness via two-phase windowing: a first row_number
  *     inside (host, salt) buckets caps hot hosts without a single-task
  *     skew partition, a second row_number over the ≤ B·S survivors picks
  *     the exact per-host top-B by (depth, url) — identical output to the
  *     single-window plan, no hot-host straggler;
  *   - every round commits an Iceberg-style snapshot (seen delta + frontier
  *     + metrics + per-partition lineage) so a killed crawl resumes with
  *     identical ordering (graft.snapshot.SnapshotLog).
  */
object Crawler {

  def run(spark: SparkSession, pages: DataFrame, cfg: CrawlConfig): CrawlResult =
    runInternal(spark, pages, cfg, resume = false)

  /** Continue from the latest snapshot in cfg.workDir. */
  def resume(spark: SparkSession, pages: DataFrame, cfg: CrawlConfig): CrawlResult =
    runInternal(spark, pages, cfg, resume = true)

  private def emptySeen(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("url", StringType, nullable = false),
        StructField("url_hash", LongType, nullable = false),
        StructField("depth", IntegerType, nullable = false))))
  }

  /** host → ARRAY(disallow prefixes), parsed from `…/robots.txt` rows of
    * the pages table (north_rule N2; same parse as the oracle). */
  def robotsTable(pages: DataFrame): DataFrame =
    pages.filter(col("url").endsWith("/robots.txt"))
      // cast, not decode(…, 'UTF-8'): under ANSI mode (Spark 4 default)
      // decode THROWS on malformed byte sequences, so one binary blob
      // served at /robots.txt would abort the whole crawl; the binary→
      // string cast decodes leniently (replacement chars), which at worst
      // mis-parses that one host's rules
      .select(gfn.url_host(col("url")).as("host"),
        explode(split(col("html").cast("string"), "\n")).as("line"))
      .select(col("host"), trim(col("line")).as("line"))
      .filter(lower(col("line")).startsWith("disallow:"))
      .select(col("host"), trim(substring(col("line"), 10, 100000)).as("prefix"))
      .filter(length(col("prefix")) > 0)
      .groupBy("host").agg(collect_list("prefix").as("prefixes"))

  /** One-pass candidate selection: TAGS every frontier row instead of
    * filtering, so the deferred remainder (frontier ∖ selected) falls out
    * of the same pass as the selection. The previous shape computed
    * `selected` with the politeness windows and then recovered the
    * remainder with `frontier LEFT ANTI JOIN selected` — two extra
    * url-shuffles of the ENTIRE frontier per round, pure politeness-mode
    * tax at 10^10-frontier scale. Here the windows order by
    * (eligible DESC, depth, url): eligible rows rank 1..E ahead of every
    * ineligible row, so `eligible && rn <= B` is exactly the old per-host
    * top-B-of-eligible and everything else is the deferred remainder —
    * two filters over ONE materialized tagged plan, no join.
    *
    * Selection semantics are unchanged (EngineOracleSpec pins per-round
    * selected counts, the seen set, and frontier contents+depths vs the
    * reference oracle):
    *   - budget = ∞: eligibility alone decides; no window at all;
    *   - salts > 1: phase 1 caps each (host, salt) bucket at B without a
    *     hot-host single-task partition (a row in the global per-host
    *     top-B is in its bucket's top-B a fortiori); phase 2 ranks the
    *     ≤ B·S survivors per host — survivors are all eligible, so phase
    *     2 orders by (depth, url) alone;
    *   - salts = 1: one window over the host.
    *
    * Returns (selected, deferred): selected ⊎ deferred ≡ frontier
    * (projected to url/host/depth), both as filters over the eagerly
    * checkpointed tagged plan — the returned DFs' lineage keeps the
    * checkpoint blocks reachable until the next round's checkpoint
    * truncates it, so no extra lifecycle bookkeeping is needed. */
  private def tagAndSplit(frontier: DataFrame, eligible: Column,
                          budget: Int, salts: Int)
      : (DataFrame, DataFrame) = {
    val outCols = Seq(col("url"), col("host"), col("depth"))
    // drop the robots `prefixes` array BEFORE any materialization: it is
    // per-host metadata and would otherwise be copied into every row of
    // the checkpoint
    val base = frontier.withColumn("__elig", eligible)
      .select(outCols :+ col("__elig"): _*)
    if (budget == Int.MaxValue) {
      // eligibility alone decides — both branches are shuffle-free filters
      // (the robots join is a broadcast), so one materialization suffices
      val ann = base.localCheckpoint(true)
      (ann.filter(col("__elig")).select(outCols: _*),
       ann.filter(!col("__elig")).select(outCols: _*))
    } else if (salts > 1) {
      val w1 = Window.partitionBy(col("host"), pmod(xxhash64(col("url")), lit(salts)))
        .orderBy(col("__elig").desc, col("depth").asc, col("url").asc)
      val ann1 = base.withColumn("__rn1", row_number().over(w1)).localCheckpoint(true)
      val sel1 = col("__elig") && col("__rn1") <= budget
      val w2 = Window.partitionBy(col("host"))
        .orderBy(col("depth").asc, col("url").asc)
      val ann2 = ann1.filter(sel1).withColumn("__rn", row_number().over(w2))
        .localCheckpoint(true)
      val selected = ann2.filter(col("__rn") <= budget).select(outCols: _*)
      val deferred = ann1.filter(!sel1).select(outCols: _*)
        .unionByName(ann2.filter(col("__rn") > budget).select(outCols: _*))
      (selected, deferred)
    } else {
      val w = Window.partitionBy(col("host"))
        .orderBy(col("__elig").desc, col("depth").asc, col("url").asc)
      val ann = base.withColumn("__rn", row_number().over(w)).localCheckpoint(true)
      val sel = col("__elig") && col("__rn") <= budget
      (ann.filter(sel).select(outCols: _*),
       ann.filter(!sel).select(outCols: _*))
    }
  }

  private def runInternal(spark: SparkSession, pages: DataFrame,
                          cfg: CrawlConfig, resume: Boolean): CrawlResult = {
    import spark.implicits._
    val log = cfg.workDir.map(new SnapshotLog(_))
    // WRITE-FENCE token: all data files this run writes (seen deltas,
    // frontier snapshots) carry a per-run suffix, so a run that will LOSE
    // the manifest CAS (stale resumer, concurrent writer, accidental
    // fresh run on a used workDir) can never overwrite data files already
    // referenced by committed manifests — the loser's files are merely
    // orphaned. Readers always go through manifest-recorded paths.
    val runToken = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong() | 1L)
    val bloomShape = Bloom.shapeFor(cfg.bloomExpectedItems, cfg.bloomFpp)
    var driverBloom = new Bloom(bloomShape._1, bloomShape._2)

    var round = 0
    var resumedFrom = 0
    var seenCount = 0L
    var snapshotId = 0
    var seenDeltaPaths = Vector.empty[String]

    var seen: DataFrame = emptySeen(spark)
    var seenDeltas = Vector.empty[DataFrame] // memory mode: checkpointed per-round deltas
    var frontier: DataFrame =
      cfg.seeds.toDF("url")
        .select(col("url"), gfn.url_host(col("url")).as("host"), lit(0).as("depth"))

    // bloom maintenance state: active from the start only when the
    // threshold is disabled; otherwise activated (with a one-time rebuild)
    // the first round the seen count crosses cfg.bloomMinSeen
    var bloomActive = cfg.bloomMinSeen <= 0L

    def rebuildBloom(): Unit = if (seenCount > 0) {
      val bytes = seen.select(
        org.apache.spark.sql.graft.Bridge.column(
          BloomAggExpr(org.apache.spark.sql.graft.Bridge.expression(col("url_hash")),
            bloomShape._1, bloomShape._2).toAggregateExpression()).as("b"))
        .head().getAs[Array[Byte]](0)
      driverBloom = Bloom.deserialize(bytes)
    }

    val resumeState = if (resume) log.flatMap(_.latest) else None
    resumeState match {
      case Some(snap) =>
        // the manifest records the config the chain was built under; a
        // resume with different seeds/filter/budget/depth would silently
        // mix incompatible crawl state — fail loudly instead
        require(snap.configHash == cfg.configHash,
          s"resume config mismatch: snapshot v${snap.id} was written under " +
            s"configHash=${snap.configHash}, current config hashes to " +
            s"${cfg.configHash} — resume with the original CrawlConfig or " +
            "start a fresh workDir")
        round = snap.round + 1
        resumedFrom = round
        snapshotId = snap.id + 1
        seenCount = snap.seenCount
        seenDeltaPaths = snap.seenDeltaPaths
        seen = if (snap.seenDeltaPaths.nonEmpty)
          spark.read.parquet(snap.seenDeltaPaths: _*) else emptySeen(spark)
        frontier = spark.read.parquet(snap.frontierPath)
        // rebuild the pre-filter from the recovered seen set (if active)
        if (bloomActive) rebuildBloom()
      case None => ()
    }

    // robots rules are collected ONCE to a driver-local relation (round 7,
    // VERDICT r6 #4): the per-round `broadcast(robots)` used to re-run a
    // distributed scan-and-collect job over the persisted table on EVERY
    // politeness wave — pure per-wave serial latency on an unchanged
    // table. The rules are driver-sized by construction (a broadcast
    // collects them to the driver anyway); building the broadcast from a
    // LocalRelation costs no Spark job at all.
    val robots = if (cfg.respectRobots) {
      val rt = robotsTable(pages)
      val rows = rt.collect()
      Some(spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), rt.schema))
    } else None

    val metrics = Vector.newBuilder[RoundMetrics]
    var stop = false
    var lastFrontierCount: Long =
      if (resumeState.isDefined) -1L else cfg.seeds.size.toLong

    while (!stop && round < cfg.maxRounds && seenCount <= cfg.maxSeen) {
      val t0 = System.currentTimeMillis()

      // --- candidate selection: depth cap, robots, politeness -------------
      // when nothing filters the frontier, selected ≡ frontier and its
      // size is already known from the previous round — saves one count
      // job per round
      val noFilters = cfg.hostBudget == Int.MaxValue &&
        !cfg.respectRobots && cfg.maxDepth == Int.MaxValue
      val (selected, deferred) =
        if (noFilters) (frontier, frontier.limit(0))
        else {
          val withRules = robots match {
            case Some(r) => frontier.join(broadcast(r), Seq("host"), "left")
            case None    => frontier
          }
          val allowed: Column = robots match {
            case Some(_) => coalesce(
              !exists(col("prefixes"), p => gfn.url_path(col("url")).startsWith(p)),
              lit(true))
            case None => lit(true)
          }
          val depthOk: Column =
            if (cfg.maxDepth == Int.MaxValue) lit(true)
            else col("depth") <= cfg.maxDepth
          tagAndSplit(withRules, depthOk && allowed, cfg.hostBudget, cfg.saltBuckets)
        }
      val selCount = if (noFilters && lastFrontierCount >= 0) lastFrontierCount
                     else selected.count()

      if (selCount == 0) {
        stop = true
      } else {
        // --- fetch: join the pages table; broadcast small frontiers -------
        val selKeyed =
          if (cfg.pagesBuckets > 0)
            selected.withColumn("bucket",
              pmod(xxhash64(col("url")), lit(cfg.pagesBuckets)).cast("int"))
          else selected
        val joinKeys = if (cfg.pagesBuckets > 0) Seq("bucket", "url") else Seq("url")
        // TINY rounds (seeds, stragglers): collect the whole frontier once —
        // the bucket-IN set AND the broadcast both derive from the local
        // rows, so the round pays ONE collect job instead of a distinct-
        // buckets job plus a broadcast-build job (per-round serial latency
        // is the scaling-efficiency tax; see PLANS.md §9)
        val selLocal: Option[Array[org.apache.spark.sql.Row]] =
          if (selCount <= 4096L) Some(selKeyed.collect()) else None
        // manual partition pruning: Spark's DPP heuristic won't fire for an
        // unfiltered frontier side, so when the frontier is small enough
        // that it plausibly misses buckets, collect its ≤pagesBuckets
        // distinct bucket ids (tiny driver action) and push a static IN
        // filter — the scan then reads only the touched partitions
        val pagesSide =
          if (cfg.pagesBuckets > 0 && selLocal.isDefined) {
            val buckets = selLocal.get
              .map(_.getAs[Int]("bucket")).distinct.toSeq
            pages.filter(col("bucket").isInCollection(buckets))
          } else if (cfg.pagesBuckets > 0 && selCount < 8L * cfg.pagesBuckets) {
            val buckets = selKeyed.select("bucket").distinct()
              .collect().map(_.getInt(0)).toSeq
            pages.filter(col("bucket").isInCollection(buckets))
          } else pages
        val selForJoin = selLocal match {
          case Some(rows) => broadcast(spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), selKeyed.schema))
          case None =>
            if (selCount <= cfg.broadcastMaxRows) broadcast(selKeyed) else selKeyed
        }
        // the parsed-links intermediate is cached ONLY when the metrics
        // pass re-reads it; in throughput mode it streams straight into the
        // per-round dedup (caching it would write every link array to
        // memory for a single consumer)
        val fetched0 = pagesSide.join(selForJoin, joinKeys, "inner")
          .select(col("url"), col("depth"),
            gfn.extract_links(col("html"), col("url"), lit(cfg.filter), lit(true))
              .as("links"))
        val fetched = if (cfg.collectMetrics) fetched0.persist(StorageLevel.MEMORY_AND_DISK)
                      else fetched0
        val (fetchCount, linksExtracted) = if (cfg.collectMetrics) {
          val a = fetched.agg(count(lit(1)),
            coalesce(sum(size(col("links"))), lit(0L))).head()
          (a.getLong(0), a.getLong(1))
        } else (-1L, -1L)

        // --- per-round link dedup with min discovery depth -----------------
        // persisted ONLY in metrics mode (round 7): the throughput path has
        // exactly one consumer (the seen anti-join, or the eager
        // localCheckpoint on the bloom branch), so the persist was a pure
        // memory-store write of every link row per round; metrics mode
        // reads it twice (count + anti-join) and keeps the cache
        val roundLinks0 = fetched
          .select(explode(col("links")).as("url"), (col("depth") + 1).as("depth"))
          .groupBy("url")
          .agg(min("depth").as("depth"))
        val roundLinks = if (cfg.collectMetrics)
          roundLinks0.persist(StorageLevel.MEMORY_AND_DISK) else roundLinks0
        val distinctLinks = if (cfg.collectMetrics) roundLinks.count() else -1L

        // --- seen-set dedup: bloom pre-filter + exact anti-join ------------
        // activate (and one-time-rebuild) the bloom at the threshold
        if (!bloomActive && seenCount >= cfg.bloomMinSeen) {
          rebuildBloom()
          bloomActive = true
        }
        val newSeen = if (seenCount == 0) {
          roundLinks.select(col("url"), xxhash64(col("url")).as("url_hash"),
            col("depth"))
        } else if (!bloomActive) {
          // below bloomMinSeen: the exact anti-join alone (see the config
          // scaladoc — the filter's serial maintenance dominates there)
          roundLinks
            .join(seen.select("url").hint("shuffle_hash"), Seq("url"), "left_anti")
            .select(col("url"), xxhash64(col("url")).as("url_hash"), col("depth"))
        } else {
          // MATERIALIZE the per-round dedup ONCE before the two probe
          // branches consume it. An eager localCheckpoint (not persist):
          // the branches' filter-over-cache plans were observed to MISS the
          // InMemoryRelation and recompute the whole 146-task
          // fetch+extract+dedup per branch — event-log forensics showed the
          // newSeen materialization stage repeating the full scan shape,
          // making bloom mode 2.31× exact mode (+236 cpu-s) in the round-5
          // bench. Checkpointing truncates the plan to the materialized
          // RDD, so a recompute is impossible by construction.
          val rl = roundLinks.localCheckpoint(true)
          val bc = spark.sparkContext.broadcast(driverBloom)
          val probe = org.apache.spark.sql.graft.Bridge.column(BloomProbeExpr(
            org.apache.spark.sql.graft.Bridge.expression(xxhash64(col("url"))), bc))
          // the seen side must NEVER be broadcast: it grows every round, and
          // a broadcast rebuild is a serial driver collect per round (and at
          // 10^10-url scale an OOM). shuffle_hash keeps the anti-join fully
          // distributed; the bloom pre-filter has already shrunk the probe
          // side to likely-dups only.
          val maybeSeen = rl.filter(probe)
            .join(seen.select("url").hint("shuffle_hash"), Seq("url"), "left_anti")
          val definitelyNew = rl.filter(!probe)
          definitelyNew.unionByName(maybeSeen)
            .select(col("url"), xxhash64(col("url")).as("url_hash"), col("depth"))
        }

        // --- persist the round: snapshot delta or in-memory checkpoint -----
        val (newSeenStable, lineage) = log match {
          case Some(l) =>
            val deltaPath = s"${l.dir}/seen/delta_r${round}_$runToken"
            newSeen.write.mode("overwrite").parquet(deltaPath)
            seenDeltaPaths = seenDeltaPaths :+ deltaPath
            val back = spark.read.parquet(deltaPath)
            // per-partition lineage straight from the written parquet
            // FOOTERS — driver-side metadata reads. The previous
            // groupBy(spark_partition_id) recount was a full extra Spark
            // job per round: pure snapshot-mode tax (the round-4 bench
            // measured resumable mode at 2.8× memory mode; this and the
            // per-file chmod forks were the serial parts)
            // Footer reads run CONCURRENTLY (round-4 ADVICE): on a remote
            // store (HDFS/S3) a sequential loop would be N serial metadata
            // round-trips per round — the opposite of the speedup. Each
            // read is one ~8-byte-footer-length + footer fetch, so a small
            // I/O pool covers the latency without a Spark job.
            val hconf = spark.sessionState.newHadoopConf()
            val dp = new org.apache.hadoop.fs.Path(deltaPath)
            val dfs = dp.getFileSystem(hconf)
            val statuses = dfs.listStatus(dp)
              .filter(_.getPath.getName.startsWith("part-"))
              .sortBy(_.getPath.getName).zipWithIndex.toVector
            val lin = {
              import scala.concurrent.{Await, Future}
              import scala.concurrent.duration.Duration
              import scala.concurrent.ExecutionContext.Implicits.global
              Await.result(Future.traverse(statuses) { case (st, i) =>
                Future {
                  val in = org.apache.parquet.hadoop.util.HadoopInputFile
                    .fromStatus(st, hconf)
                  val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                  try PartitionLineage(i, r.getRecordCount) finally r.close()
                }
              }, Duration.Inf)
            }
            (back, lin)
          case None =>
            // LAZY checkpoint: the statsRow aggregation below materializes
            // it, so delta-materialize + count + seed-hits + bloom-shard is
            // ONE Spark job per round, not two — per-round driver latency
            // is parallelism-independent and was the main scaling-efficiency
            // tax at high core counts (7 rounds × ~0.3 s)
            val cp = newSeen.localCheckpoint(false)
            (cp, Vector.empty[PartitionLineage])
        }
        // one pass over the materialized delta: row count, seed hits (for
        // the frontier arithmetic below), and — only while the filter is
        // active — the bloom shard; instead of three separate jobs. With
        // the bloom below threshold the aggregate carries 16-byte buffers
        // per partition instead of filter-sized ones.
        val baseAggs = Seq(
          count(lit(1)),
          coalesce(sum(when(col("url").isInCollection(cfg.seeds), 1L)
            .otherwise(0L)), lit(0L)))
        val aggs = if (bloomActive) baseAggs :+
          org.apache.spark.sql.graft.Bridge.column(
            BloomAggExpr(org.apache.spark.sql.graft.Bridge.expression(col("url_hash")),
              bloomShape._1, bloomShape._2).toAggregateExpression())
          else baseAggs
        val statsRow = newSeenStable.agg(aggs.head, aggs.tail: _*).head()
        val newCount = statsRow.getLong(0)
        val newSeenSeeds = statsRow.getLong(1)
        if (bloomActive && newCount > 0)
          driverBloom.mergeInPlace(Bloom.deserialize(statsRow.getAs[Array[Byte]](2)))
        seenCount += newCount

        // --- next state -----------------------------------------------------
        // only seeds can sit in frontier∖seen, so "already known to the
        // frontier or already visited" ⇔ "is a seed" for newly-seen urls
        val frontierAdd = newSeenStable
          .filter(!col("url").isInCollection(cfg.seeds))
          .select(col("url"), gfn.url_host(col("url")).as("host"), col("depth"))
        // the deferred remainder is already two filters over this round's
        // checkpointed tagged plan — no anti-join (see tagAndSplit)
        val frontierNextRaw =
          if (noFilters) frontierAdd
          else deferred.unionByName(frontierAdd)

        val frontierNext = log match {
          case Some(l) =>
            val p = s"${l.dir}/frontier/r${round}_$runToken"
            frontierNextRaw.write.mode("overwrite").parquet(p)
            spark.read.parquet(p)
          case None =>
            // filters + union over already-materialized checkpoints (the
            // tagged plan and this round's seen delta) — nothing new to
            // materialize; next round's tagAndSplit checkpoint re-truncates
            // the lineage, so plan depth stays O(1)
            frontierNextRaw
        }
        // |frontierNext| is arithmetic: deferred ⊎ selected ≡ frontier, and
        // frontierAdd = newSeen ∖ seeds is disjoint from the old frontier
        // (frontier residents are already in the seen set, newSeen is not).
        // The one real count left is the first round after a resume, where
        // the recovered frontier's size is unknown.
        val frontierCount =
          if (noFilters) newCount - newSeenSeeds // frontierAdd, arithmetically
          else if (lastFrontierCount >= 0)
            (lastFrontierCount - selCount) + (newCount - newSeenSeeds)
          else frontierNext.count()
        lastFrontierCount = frontierCount

        // keep the seen plan FLAT and CHEAP: one multi-path parquet scan in
        // snapshot mode; in memory mode a lazy union of the per-round
        // checkpointed deltas — each delta was already materialized once,
        // so re-checkpointing the whole seen set every round would copy
        // O(total) rows per round (O(R·N) over the crawl) for nothing.
        // The delta list is COMPACTED every compactEveryEff rounds (union
        // of K checkpointed deltas → one checkpoint): without it the plan
        // is a left-deep union re-analyzed every round — O(R²) total
        // planning cost, a real driver tax at 10³-round depth (round-2
        // ADVICE). Compaction copies each row O(R/K) times total; K=16
        // balances the copy cost against plan depth ≤ K.
        //
        seen = log match {
          case Some(_) => spark.read.parquet(seenDeltaPaths: _*)
          case None =>
            seenDeltas = seenDeltas :+ newSeenStable
            if (seenDeltas.length >= cfg.compactEveryEff) {
              val compacted = seenDeltas.reduce(_ unionByName _).localCheckpoint(true)
              seenDeltas = Vector(compacted)
              compacted
            } else seenDeltas.reduce(_ unionByName _)
        }

        val m = RoundMetrics(round, selCount, fetchCount, linksExtracted,
          dedupDropped = if (cfg.collectMetrics) distinctLinks - newCount else -1L,
          newSeen = newCount, seenTotal = seenCount,
          frontierNext = frontierCount,
          wallMillis = System.currentTimeMillis() - t0)
        metrics += m
        log.foreach { l =>
          l.commit(Snapshot(snapshotId, snapshotId - 1, round, seenDeltaPaths,
            s"${l.dir}/frontier/r${round}_$runToken", seenCount, cfg.configHash, m, lineage))
          snapshotId += 1
          // SNAPSHOT-mode seen-delta compaction (round 7 — VERDICT r6 #1,
          // the resumable path's only unbounded-growth term): every K
          // rounds the accumulated delta files are rewritten into ONE
          // write-fenced parquet delta, bounding the manifest's path list,
          // the per-round multi-path seen scan, and the per-round file
          // listings at ≤ K+1 instead of O(rounds) — the Iceberg
          // manifest-compaction contract, mirroring memory mode above.
          // Runs AFTER this round's commit so every manifest invariant is
          // unchanged (the list's last entry is always the round's own
          // delta, matching the lineage field), and a crash anywhere in
          // the compaction write is harmless: the committed chain still
          // references the original files (orphaned, never deleted) and
          // the NEXT commit is what atomically publishes the compacted
          // list. Each row is copied O(R/K) times total, the same
          // amortized cost memory mode already pays.
          if (seenDeltaPaths.length >= cfg.compactEveryEff) {
            val cp = s"${l.dir}/seen/compact_r${round}_$runToken"
            seen.write.mode("overwrite").parquet(cp)
            seenDeltaPaths = Vector(cp)
            seen = spark.read.parquet(cp)
          }
        }

        frontier = frontierNext
        fetched.unpersist(); roundLinks.unpersist()
        // tagged-checkpoint lifecycle needs no extra bookkeeping: the lazy
        // `frontier` plan references this round's checkpointed RDDs, and
        // the next round's eager tagAndSplit checkpoint truncates that
        // lineage — at which point the old blocks become unreachable and
        // the ContextCleaner reclaims them (unpersist on a checkpointed DF
        // is a no-op, so explicit release would do nothing anyway)
        round += 1
        if (frontierCount == 0) stop = true
      }
    }

    CrawlResult(seen, frontier, metrics.result(), resumedFrom)
  }
}
