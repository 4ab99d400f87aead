package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the fused multi-probe q56 pipeline. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.load(spark, dir, "embeddings")
    import graft.operators.SimilaritySearch
    import graft.functions.CosineSimilarity

    val e = emb.select($"vec_id".as("id"),
        graft.functions.VectorOps.toDoubles($"embedding").as("v"))
      .withColumn("nrm", sqrt(CosineSimilarity.dotFast(spark, $"v", $"v")))
      .persist()
    timed("A: e")(println("  n=" + e.count()))
    val planes0 = (0 until 14).map(t => SimilaritySearch.hyperplanes(4, 64, 42L + t))
    val tableStructs = planes0.zipWithIndex.map { case (ps, t) =>
      struct(lit(t).as("tbl"),
        array(ps.map(p => CosineSimilarity.dotFast(spark, $"v",
          array(p.map(lit(_)): _*))): _*).as("ds"))
    }
    val dotsRel = e.select($"id", explode(array(tableStructs: _*)).as("tb"))
      .select($"id", $"tb.tbl".as("tbl"), $"tb.ds".as("ds")).persist()
    timed("B: dotsRel")(dotsRel.count())
    def bucketFromDots = (0 until 4).map { i =>
      when(col("ds").getItem(i) >= 0, lit(1L << i)).otherwise(lit(0L)) }.reduce(_ + _)
    val bucketed = dotsRel.select($"id", $"tbl", bucketFromDots.as("bucket"))
    val ok = bucketed.groupBy($"tbl", $"bucket").agg(count(lit(1)).as("__c"))
      .filter($"__c" <= 500).select($"tbl", $"bucket")
    val capped = bucketed.join(ok, Seq("tbl", "bucket")).persist()
    timed("B2: capped")(capped.count())
    val absd = (0 until 4).map(i => abs(col("ds").getItem(i)))
    val ranks = absd.indices.map { i =>
      absd.indices.filter(_ != i).map { j =>
        when(absd(j) < absd(i) || (absd(j) === absd(i) && lit(j) < lit(i)), lit(1))
          .otherwise(lit(0)) }.reduce(_ + _) }
    val flipArr = array((0 until 2).map { f =>
      val m = ranks.zipWithIndex.map { case (r, i) =>
        when(r === f, lit(1L << i)).otherwise(lit(0L)) }.reduce(_ + _)
      bucketFromDots.bitwiseXOR(m) }: _*)
    val probes = dotsRel.select($"id", $"tbl",
      explode(concat(array(bucketFromDots), flipArr)).as("bucket"))
    timed("C0: probes only")(probes.write.format("noop").mode("overwrite").save())
    val joined = probes.as("p").join(broadcast(capped.as("c")),
      $"p.tbl" === $"c.tbl" && $"p.bucket" === $"c.bucket" && $"p.id" =!= $"c.id")
    timed("C1: raw bucket join")(joined.select($"p.id").write.format("noop").mode("overwrite").save())
    timed("C1b: raw bucket join again")(joined.select($"p.id").write.format("noop").mode("overwrite").save())
    val withVecs = joined
      .join(broadcast(e.select($"id".as("pid"), $"v".as("p_v"), $"nrm".as("p_n"))), $"p.id" === $"pid")
      .join(broadcast(e.select($"id".as("cid"), $"v".as("c_v"), $"nrm".as("c_n"))), $"c.id" === $"cid")
      .withColumn("cos", CosineSimilarity.dotFast(spark, $"p_v", $"c_v") / ($"p_n" * $"c_n"))
      .filter($"cos" >= 0.45)
    timed("C2: +vectors+dot+filter")(println("  survivors=" +
      withVecs.count()))
    val out = withVecs
      .select(least($"p.id", $"c.id").as("a_id"), greatest($"p.id", $"c.id").as("b_id"), $"cos")
      .groupBy($"a_id", $"b_id").agg(first($"cos").as("c0"))
      .select($"a_id", $"b_id", round($"c0", 4).as("cosine"))
    timed("D: full (agg)")(out.write.format("noop").mode("overwrite").save())
    timed("D2: full again")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
