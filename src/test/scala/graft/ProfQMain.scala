package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-job profiler for catalog queries: mirrors the Bench
  * session config, runs each named query twice (cold, warm-JIT cold
  * cache), printing per-job wall times with stage task counts.
  */
object ProfQMain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q99").split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.quietBenignWarns()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val listener = new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      @volatile var verbose = false
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, 0L)
        val sec = (System.nanoTime() - t0) / 1e9
        if (verbose && sec >= 0.15)
          println(f"[job] id=${j.jobId} $sec%.2f s")
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val m = si.taskMetrics
        if (verbose && m != null && m.executorRunTime >= 150)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"runMs=${m.executorRunTime} cpuMs=${m.executorCpuTime / 1000000L} " +
            si.name.takeWhile(_ != '\n').take(50))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def freeAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    for (name <- names) {
      val fn = SparkEntry.queries.keys.find(_.contains(name))
        .map(SparkEntry.queries)
        .getOrElse(sys.error(s"no query matches $name"))
      for (i <- 0 until 3) {
        freeAll()
        listener.verbose = i == 2
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[q] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
