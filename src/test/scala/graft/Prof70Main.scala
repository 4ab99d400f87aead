package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the q70 prefix-filter pipeline. */
object Prof70Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, dir, "documents")
    println("  docs=" + docs.count())
    import graft.functions.TextOps
    import org.apache.spark.sql.expressions.Window
    val shingleLen = 3
    val threshold = 0.5

    val docSets = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select($"doc_id",
        explode(array(
          array_distinct(TextOps.shingles($"toks", shingleLen)))).as("set"))
      .select($"doc_id", size($"set").cast("long").as("n"), $"set")
    timed("A: docSets noop")(noop(docSets))
    val dsP = docSets.persist()
    timed("A2: docSets persist+count")(println("  n=" + dsP.count()))
    val sh = dsP.select($"doc_id", $"n", explode($"set").as("sh"))
    timed("B: exploded sh noop")(println("  rows=" + sh.count()))
    val withDf = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"sh")))
    timed("C: withDf (window df) noop")(noop(withDf))
    val ranked = withDf
      .withColumn("pos",
        row_number().over(Window.partitionBy($"doc_id").orderBy($"df", $"sh")))
    timed("D: ranked (2 windows) noop")(noop(ranked))
    val prefix = ranked
      .filter($"pos" <= $"n" - ceil($"n" * threshold - 1e-9) + 1)
      .filter($"df" > 1)
      .select($"doc_id", $"sh", $"n", $"pos")
    timed("E: prefix noop")(println("  rows=" + prefix.count()))
    val prefix2 = ranked
      .filter($"pos" <= $"n" - ceil($"n" * threshold - 1e-9) + 1)
      .filter($"df" > 1)
      .select($"doc_id", $"sh", $"n", $"pos",
        ($"pos" <= $"n" -
          ceil($"n" * (2 * threshold / (1 + threshold)) - 1e-9) + 1).as("idx"))
    val cand = prefix2.groupBy($"sh")
      .agg(collect_list(struct($"doc_id", $"n", $"pos", $"idx")).as("ps"))
      .filter(size($"ps") > 1)
      .select($"ps", posexplode($"ps").as(Seq("i", "x")))
      .select($"x", explode(slice($"ps", $"i" + lit(2), size($"ps"))).as("y"))
      .select(when($"x.doc_id" < $"y.doc_id", struct($"x".as("a"), $"y".as("b")))
        .otherwise(struct($"y".as("a"), $"x".as("b"))).as("p"))
      .filter(when($"p.a.n" < $"p.b.n", $"p.a.idx")
        .when($"p.b.n" < $"p.a.n", $"p.b.idx")
        .otherwise($"p.a.idx" || $"p.b.idx"))
      .filter(greatest($"p.a.n", $"p.b.n") * threshold <=
        least($"p.a.n", $"p.b.n") + 1e-9)
      .filter(lit(1) + least($"p.a.n" - $"p.a.pos", $"p.b.n" - $"p.b.pos") >=
        ($"p.a.n" + $"p.b.n") * (threshold / (1.0 + threshold)) - 1e-9)
      .groupBy($"p.a.doc_id".as("a_id"), $"p.b.doc_id".as("b_id"),
        $"p.a.n".as("na"), $"p.b.n".as("nb"))
      .agg(count(lit(1)).as("hits"))
      .select($"a_id", $"b_id", $"na", $"nb")
    timed("F: cand noop")(println("  cands=" + cand.count()))
    println("  prefix posting-list distribution:")
    prefix2.groupBy($"sh").agg(count(lit(1)).as("m"))
      .select(sum($"m" * ($"m" - 1) / 2).as("expanded"),
        max($"m").as("maxm"), count(lit(1)).as("shingles"))
      .show(false)
    prefix2.groupBy($"sh").agg(count(lit(1)).as("m"))
      .orderBy($"m".desc).limit(10).show(false)
    val candP = cand.persist()
    timed("F2: candP persist+count")(println("  cands=" + candP.count()))
    val verify = broadcast(candP)
      .join(dsP.select($"doc_id".as("a_id"), $"set".as("a_set")), "a_id")
      .join(dsP.select($"doc_id".as("b_id"), $"set".as("b_set")), "b_id")
      .withColumn("inter",
        size(array_intersect($"a_set", $"b_set")).cast("long"))
      .withColumn("jaccard",
        $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
    timed("H: verify attach+intersect")(noop(verify))
    timed("H2: verify again (warm)")(noop(verify))
    candP.unpersist()
    dsP.unpersist()
    spark.sharedState.cacheManager.clearCache()
    // per-job visibility for the integrated call
    val listener = new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime())
        names.put(j.jobId, j.stageInfos.map(s =>
          s.name.takeWhile(_ != '\n').take(60) + ":" + s.numTasks)
          .mkString(" | "))
      }
      val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, 0L)
        println(f"[job] id=${j.jobId} ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          names.getOrDefault(j.jobId, "?"))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val m = si.taskMetrics
        val run = if (m != null) m.executorRunTime else -1L
        val cpu = if (m != null) m.executorCpuTime / 1000000L else -1L
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"runMs=$run cpuMs=$cpu ${si.name.takeWhile(_ != '\n').take(50)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    timed("G: full jaccardPairsPrefix") {
      val r = operators.Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
        shingleLen, threshold)
      noop(r)
      r.unpersist()
    }
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)
    timed("G2: full jaccardPairsPrefix again") {
      val r = operators.Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
        shingleLen, threshold)
      noop(r)
      r.unpersist()
    }
    spark.stop()
  }
}
