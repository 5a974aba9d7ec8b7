package graft

import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness — SEPARATE from the frozen graft.Bench
  * (the driver hashes Bench.scala; extra measurements live here per the
  * optimization-round protocol). Times each declared query with the SAME
  * action the bench uses (`.count()`, cold + warm), optionally a noop-sink
  * run (guide §1.4) for the lazy queries, and dumps `.explain("formatted")`
  * for every lazy query to GRAFT_PLAN_DUMP_DIR (plans/r07/...). Eager ops
  * (the pairwise dedup family) dump their pre-materialization plans from
  * inside TrainingOps when GRAFT_PLAN_DUMP_DIR is set.
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     core count (default 32)
  *   GRAFT_EXTRA_QUERIES  csv filter of query names (default: headline set)
  *   GRAFT_EXTRA_REPS     warm reps (default 2)
  *   GRAFT_PLAN_DUMP_DIR  if set, write formatted plans there
  *   GRAFT_PLAN_SUFFIX    filename suffix (e.g. "_before", "_after")
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.hadoop.fs.file.impl", classOf[graft.BareLocalFileSystem].getName)
      .config("spark.hadoop.fs.file.impl.disable.cache", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val headline = Seq("q_agg_groupby", "q_join_revenue",
    "q_window_politeness", "q_tfidf", "q_jaccard_pairs", "q_minhash_lsh",
    "q_cosine_topk", "q_dedup_exact", "q_antijoin", "q_topk", "q_serp")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "2").toInt
    val names = sys.env.get("GRAFT_EXTRA_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(headline)
    val spark = session(cpus)

    // untimed JIT/codegen + demo-index warmup, exactly like the bench; the
    // index build is timed separately (it is a different operation)
    val tIdx = System.nanoTime()
    for (warm <- Seq("q_topk", "q_serp") if names.contains("q_serp") ||
         names.exists(headline.contains))
      try SparkEntry.queries(warm)(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[extra] warmup $warm failed: ${e.getMessage}") }
    println(f"serp_index_build_s=${(System.nanoTime() - tIdx) / 1e9}%.3f")

    val dumpDir = sys.env.get("GRAFT_PLAN_DUMP_DIR")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")

    for (name <- names) {
      spark.sparkContext.setJobDescription(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        // plan dump BEFORE the timed runs (plan capture for lazy queries;
        // the eager ops dump from inside TrainingOps during construction,
        // which the timing run below triggers anyway)
        dumpDir.foreach { dir =>
          try {
            val df = SparkEntry.queries(name)(spark, sfDir)
            val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            val s = df.queryExecution.explainString(mode)
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(dir, s"$name$suffix.txt"), s)
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[extra] plan dump $name failed: ${e.getMessage}")
          }
        }
        val cold = once()
        val warms = (1 to reps).map(_ => once())
        println(f"$name%s cold=$cold%.3f warm_min=${warms.min}%.3f " +
          f"warms=${warms.map(w => f"$w%.3f").mkString(",")}")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"$name FAILED: ${e.getMessage}")
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
