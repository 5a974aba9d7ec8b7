package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank as an iterative edge-list join-aggregate — the idiomatic Spark
  * form of the reference's dense matrix power iteration
  * (SpiderMain.kt:201-263), with identical semantics:
  *
  *   rank ← 0.15 + 0.85 · Σ_{src→dst} rank(src) / outdeg(src)
  *
  * init 1.0; NO dangling-mass redistribution; NO 1/N scaling; no
  * convergence test — the reference runs exactly 40 iterations
  * (SpiderMain.kt:229). Zero-in-degree vertices coalesce to 0.15 via the
  * left join back to the full vertex set. Lineage is truncated with
  * localCheckpoint every few iterations (driver-loop best practice for
  * iterative DataFrame jobs). Floating-point reassociation across the
  * shuffle is absorbed by the 1e-6 fixture tolerance (BASELINE.json).
  */
object PageRankSpark {

  /** @param links    (src LONG, dst LONG) deduplicated edges
    * @param vertices one column `url_id` covering ALL ids (rows with no
    *                 in/out links still rank 0.15)
    * @return (url_id, rank) */
  def run(links: DataFrame, vertices: DataFrame, iters: Int,
          checkpointEvery: Int = 5): DataFrame = {
    val outDeg = links.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // static across iterations: weight of each edge = 1/outdeg(src).
    // Hash-partitioned on src BEFORE the persist so every iteration's
    // ranks⋈edges join reuses the cached partitioning and shuffles ONLY
    // the (small, changing) ranks side — the (much larger) edge table is
    // never re-exchanged across the 40 iterations (PLANS.md §8).
    val weighted = links.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("out_deg")).as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    weighted.count()

    // same trick for the vertex table: partitioned on url_id, the
    // contribs⋈verts left join re-exchanges only the contribs side (which
    // arrives already hash-partitioned on url_id from its groupBy)
    val verts = vertices.select(col("url_id"))
      .repartition(col("url_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = verts.withColumn("rank", lit(1.0))
    var i = 0
    while (i < iters) {
      val contribs = weighted
        .join(ranks.withColumnRenamed("url_id", "src"), Seq("src"))
        .groupBy(col("dst").as("url_id"))
        .agg(sum(col("w") * col("rank")).as("incoming"))
      ranks = verts.join(contribs, Seq("url_id"), "left")
        .select(col("url_id"),
          (lit(0.15) + lit(0.85) * coalesce(col("incoming"), lit(0.0))).as("rank"))
      i += 1
      if (i % checkpointEvery == 0 || i == iters)
        ranks = ranks.localCheckpoint(true)
    }
    // the final ranks is an eager localCheckpoint (self-contained), so the
    // iteration-only caches can be released NOW — without this a session
    // running PageRank more than once accumulates two edge-table-sized
    // CacheManager entries per run
    weighted.unpersist(); verts.unpersist()
    ranks
  }
}
