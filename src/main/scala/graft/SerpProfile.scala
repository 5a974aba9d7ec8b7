package graft

import org.apache.spark.sql.SparkSession

/** scratch profiler for the SERP serve path (round-5 item #2) — not part
  * of the library surface; deleted once the latency work lands. */
object SerpProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("serp-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.BareLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = for { s <- i.submissionTime; c <- i.completionTime } yield c - s
        println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
          f"dur=${dur.getOrElse(-1L)}ms name=${i.name.take(80)}")
      }
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"[job] start ${j.jobId} stages=${j.stageIds.mkString(",")}")
    })

    // cold: index build via the same memoized path q_serp uses
    time("q_serp cold (incl demoIndex)") {
      SparkEntry.queries("q_serp")(spark, "/root/testdata/sf0.001").count()
    }
    // piecewise: same index, separate prepare vs search
    val (index, ranks) = time("demoIndex (memo hit)") {
      SparkEntry.demoIndexForProfile(spark)
    }
    val prepared = time("prepare") { graft.rank.Searcher.prepare(index, ranks) }
    for (i <- 1 to 3)
      time(s"search only $i") {
        graft.rank.Searcher.search(spark, prepared, "\"hong kong\" research").count()
      }
    for (i <- 1 to 2)
      time(s"prepare+search $i") {
        val p = graft.rank.Searcher.prepare(index, ranks)
        graft.rank.Searcher.search(spark, p, "\"hong kong\" research").count()
      }
    // how much of the wall is AQE per-stage replanning + job fan-out?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (i <- 1 to 3)
      time(s"search aqe=off sp=32 $i") {
        graft.rank.Searcher.search(spark, prepared, "\"hong kong\" research").count()
      }
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    for (i <- 1 to 3)
      time(s"search aqe=off sp=4 $i") {
        graft.rank.Searcher.search(spark, prepared, "\"hong kong\" research").count()
      }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for (i <- 1 to 3)
      time(s"search aqe=on sp=4 $i") {
        graft.rank.Searcher.search(spark, prepared, "\"hong kong\" research").count()
      }
    spark.stop()
  }
}
