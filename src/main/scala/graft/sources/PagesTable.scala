package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-bucketed storage for the pages table — the shuffle-free form of
  * the crawl's fetch join at 10^10-URL scale.
  *
  * The crawler's fetch join (Crawler.scala) keys on `url`. For SMALL
  * frontiers the frontier side broadcasts and the pages scan is pruned by
  * the hive-partition `bucket` column (CrawlConfig.pagesBuckets — manual
  * DPP). But a production round over a 10-billion-row pages table selects
  * MILLIONS of urls: far past any broadcast threshold, so the join
  * shuffles — and shuffling the PAGES side means moving the multi-KB
  * `html` payload of every matched row across the cluster every round.
  *
  * Bucketing the table BY the join key removes that side of the shuffle
  * entirely: `bucketBy(n, "url")` records the hash-layout in the catalog,
  * and Catalyst's EnsureRequirements recognizes the scan's
  * HashPartitioning(url, n) as already satisfying the join's distribution
  * requirement — only the (tiny, url+depth) frontier is exchanged, into n
  * partitions matched to the table's layout. This is the same contract an
  * Iceberg `bucket(n, url)` partition transform gives (the Iceberg runtime
  * is not available offline — SURVEY.md §7.3; the catalog-bucketed parquet
  * table is the API-equivalent sandbox form, with identical plan shape).
  *
  * Verified in SourcesSpec: the fetch-join plan over a bucketed table has
  * exactly ONE shuffle (frontier side), and the joined result is
  * row-identical to the plain-parquet join.
  */
object PagesTable {

  /** Write `pages` as a catalog table bucketed by url. `buckets` should be
    * sized so one bucket's html payload fits an executor's scan partition
    * budget (at 10^10 pages × ~5 KB, 2^15 buckets ≈ 1.5 GB/bucket of raw
    * html — splittable further by parquet row-groups within a bucket). */
  def writeBucketed(pages: DataFrame, name: String, path: String,
                    buckets: Int, sorted: Boolean = true,
                    key: String = "url"): Unit = {
    val w = pages.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
    // sortBy(key) within buckets: the join degenerates to a sort-merge
    // with the sort already on disk, and point lookups skip row-groups
    (if (sorted) w.sortBy(key) else w).saveAsTable(name)
  }

  /** Read the bucketed table back WITH its layout metadata (a plain
    * spark.read.parquet(path) would lose the bucket spec — only the
    * catalog carries it). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
