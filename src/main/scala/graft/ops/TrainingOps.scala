package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.gfn

/** Large-scale training-data pipeline operators over the `documents` /
  * `embeddings` tables — first-class engine components beyond the
  * reference's own surface (deduplication, similarity search, text
  * analysis). Every SQL-expressible op here has a matching DuckDB oracle
  * in SparkEntry.oracleSql; hash choices (md5) are deliberately portable
  * so Spark and DuckDB compute IDENTICAL values.
  *
  * Scale notes: every pairwise op is bucketed (shingle / band / cell) so
  * the self-join is candidate-bounded instead of O(n²); aggregations are
  * map-side-combinable; doubles destined for the oracle compare are
  * rounded at the boundary.
  */
object TrainingOps {

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** whitespace tokens, empties dropped — `list_filter(string_split(…))`
    * in the DuckDB oracle. */
  def wsTokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  // ------------------------------------------------------------------
  // text analysis
  // ------------------------------------------------------------------

  /** token counting: whitespace tokens + a BPE-ish `[a-z0-9]+` regex count. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(wsTokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("re_tokens"),
        length(col("text")).as("chars"))
      .orderBy("doc_id")

  /** quality scoring: length, punctuation density, stopword-ish density,
    * mean token length. All expressible with portable string primitives. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val chars = length(col("text")).cast("double")
    val toks = size(wsTokens(col("text"))).cast("double")
    val punct = (length(col("text")) -
      length(translate(col("text"), ".,;:!?", ""))).cast("double")
    val theCount = ((length(col("text")) -
      length(replace(col("text"), lit(" the "), lit("")))) / lit(5)).cast("double")
    docs.select(col("doc_id"),
        round(chars / greatest(toks, lit(1.0)), 4).as("mean_tok_len"),
        round(punct / greatest(chars, lit(1.0)), 4).as("punct_ratio"),
        round(theCount / greatest(toks, lit(1.0)), 4).as("the_ratio"),
        round(
          least(chars / lit(500.0), lit(1.0)) * lit(0.5)
            + least(theCount / greatest(toks, lit(1.0)) * lit(10.0), lit(1.0)) * lit(0.3)
            + (lit(1.0) - least(punct / greatest(chars, lit(1.0)) * lit(5.0), lit(1.0))) * lit(0.2),
          4).as("quality"))
      .orderBy("doc_id")
  }

  /** language id: deterministic n-gram/stopword heuristic — counts of
    * common English function words vs text length. */
  def langId(docs: DataFrame): DataFrame = {
    def occ(token: String): Column =
      ((length(col("text")) - length(replace(lower(col("text")), lit(token), lit(""))))
        / lit(token.length)).cast("double")
    val en = occ(" the ") + occ(" and ") + occ(" of ") + occ(" to ")
    val toks = size(wsTokens(col("text"))).cast("double")
    docs.select(col("doc_id"), col("lang"),
        round(en / greatest(toks, lit(1.0)), 4).as("en_score"),
        when(en / greatest(toks, lit(1.0)) > 0.02, lit("en"))
          .otherwise(lit("other")).as("predicted"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // deduplication
  // ------------------------------------------------------------------

  /** exact dedup: content-hash groups with a deterministic keeper. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"), min("doc_id").as("keeper"))
      .filter(col("c") > 1)
      .orderBy("h")

  /** exact dedup summary: corpus size before/after hash dedup. */
  def exactDupSummary(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("total_docs"),
      countDistinct(md5(col("text"))).as("distinct_docs"))

  /** distinct word-trigram shingles per doc (doc_id, shingle) — the shared
    * building block of the Jaccard and MinHash paths. lead() windows keep
    * the construction identical to the SQL oracle. */
  def trigramShingles(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs.select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), lead("tok", 1).over(w), lead("tok", 2).over(w))
          .as("shingle"),
        lead("tok", 2).over(w).isNotNull.as("full"))
      .filter(col("full"))
      .select("doc_id", "shingle")
      .distinct()
  }

  /** n-gram Jaccard near-dup pairs: shingle-bucketed self-join (the join
    * explodes only where shingles collide — candidate-bounded, not O(n²)),
    * exact Jaccard ≥ threshold. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = trigramShingles(docs).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.toDF("a", "shingle")
    val b = sh.toDF("b", "shingle")
    val inter = a.join(b, "shingle").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("a", "sa"), "a")
      .join(sizes.toDF("b", "sb"), "b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** MinHash signatures: k md5-salted lexicographic-min hashes over the
    * shingle set (md5 is portable to the DuckDB oracle; at production
    * scale swap for xxhash64 — same plan shape). */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val sh = trigramShingles(docs)
    val aggs = (0 until k).map(i =>
      min(md5(concat(col("shingle"), lit(s"#salt$i")))).as(s"mh$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: band signatures (rows-per-band hashes
    * concatenated) bucket the corpus; docs sharing any band bucket are
    * candidates. k=6, bands of 2 → 3 bands. */
  def minhashLshPairs(docs: DataFrame, k: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val sig = minhashSignatures(docs, k)
    val bands = (0 until k / rowsPerBand).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}"))
      sig.select(col("doc_id"), lit(bnd).as("band"), concat(cols: _*).as("sig"))
    }.reduce(_ unionByName _)
    val l = bands.toDF("a", "band", "sig")
    val r = bands.toDF("b", "band", "sig")
    l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .orderBy("a", "b")
  }

  /** SimHash near-dup fingerprints (xxhash64-based custom expression;
    * fixture-tested, no SQL oracle). */
  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), gfn.simhash(wsTokens(col("text"))).as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs within Hamming distance `maxHamming`, bucketed
    * by 16-bit quarters (a pair within Hamming ≤3 must agree exactly on at
    * least one of the four quarters — pigeonhole), so the self-join is
    * bucket-bounded. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = docs.select(col("doc_id"),
      gfn.simhash(wsTokens(col("text"))).as("sh"))
    val quartered = (0 until 4).map { q =>
      sims.select(col("doc_id"), col("sh"), lit(q).as("q"),
        shiftright(col("sh"), q * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
    }.reduce(_ unionByName _)
    val l = quartered.toDF("a", "sha", "q", "bucket")
    val r = quartered.toDF("b", "shb", "q", "bucket")
    l.join(r, Seq("q", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** winnowing fingerprint overlap pairs (rows-only; fixture-tested). */
  def winnowPairs(docs: DataFrame, minShared: Int): DataFrame = {
    val fp = docs.select(col("doc_id"),
      explode(gfn.winnow_fingerprints(col("text"), lit(8), lit(4))).as("fp"))
    val l = fp.toDF("a", "fp")
    val r = fp.toDF("b", "fp")
    l.join(r, "fp").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy("a", "b")
  }

  // ------------------------------------------------------------------
  // similarity search over embeddings
  // ------------------------------------------------------------------

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** brute-force cosine top-k: every query vector scored against the whole
    * table (the exact baseline an ANN variant must approximate). The query
    * side is broadcast; the scan side never shuffles. */
  def bruteForceCosineTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) /
        (norm(col("v")) * norm(col("qv"))), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor"), col("cos"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-style ANN: coarse cells = per-label centroids (the table ships a
    * label column; production would k-means); a query probes only the
    * `nprobe` nearest cells. Returns the same shape as the brute-force
    * baseline; recall is fixture-tested against it. */
  def ivfCosineTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                    nprobe: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v")).persist()

    // centroids: element-wise mean per label (posexplode → avg → re-assemble)
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("cv"))

    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

    // pick nprobe closest cells per query (tiny: #labels × #queries)
    val wCell = Window.partitionBy("query_id").orderBy(desc("csim"), asc("label"))
    val cells = q.crossJoin(broadcast(cent))
      .withColumn("csim", dot(col("qv"), col("cv")) /
        (norm(col("qv")) * norm(col("cv"))))
      .withColumn("r", row_number().over(wCell))
      .filter(col("r") <= nprobe)
      .select("query_id", "qv", "label")

    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    e.join(broadcast(cells), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) /
        (norm(col("v")) * norm(col("qv"))), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor"), col("cos"))
      .orderBy("query_id", "rnk")
  }
}
