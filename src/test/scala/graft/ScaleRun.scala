package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence harness (test scope, run by hand):
  *
  *   sbt "Test/runMain graft.ScaleRun [simhash|minhash] [mult]"
  *
  * Builds a `mult`× corpus (default 10×) from sf0.1 documents by unioning
  * id-shifted copies — every doc gains mult−1 identical clones, which is
  * the bucket-stress WORST case for both LSH families (identical docs
  * share every band/chunk bucket) — then times the near-dup pipeline on
  * local[32]. Results are recorded in NOTES.md "Scale evidence".
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("simhash")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text")
    val big = (0 until mult)
      .map(i => docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text"))
      .reduce(_ unionAll _)
      .persist()
    val n = big.count()

    // embedding corpus for the vector cases, cloned the same way (every
    // vector gains mult−1 exact clones: worst-case bucket stress — clones
    // share every table's bucket)
    lazy val bigEmb = {
      val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select($"vec_id", $"embedding")
      (0 until mult)
        .map(i => emb.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
          $"embedding"))
        .reduce(_ unionAll _)
        .persist()
    }

    if (which == "lshpairs") bigEmb.count() // materialize outside the timer

    val t0 = System.nanoTime()
    val pairs = which match {
      case "lshpairs" =>
        // planes scale with log2(n / targetBucketSize): the documented
        // sizing law that keeps per-bucket work bounded as n grows
        val nv = bigEmb.count()
        val planes = math.max(4,
          math.ceil(math.log(nv / 64.0) / math.log(2)).toInt)
        println(s"[scale] lshpairs vectors=$nv numPlanes=$planes")
        operators.SimilaritySearch.lshPairs(bigEmb, "vec_id", "embedding",
          threshold = 0.45, numPlanes = planes, numTables = 8,
          maxBucketSize = 500).count()
      case "minhash" =>
        operators.Dedup.minhashPairs(big, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 500).count()
      case "winnow" =>
        operators.Dedup.winnowFingerprints(big, "doc_id", "text",
          n = 8, w = 8).count()
      case "cc" =>
        // full pipeline: minhash pairs -> duplicate clusters
        val pairs = operators.Dedup.minhashPairs(big, "doc_id", "text",
          threshold = 0.5, maxBucketSize = 500)
        operators.Dedup.connectedComponents(pairs).count()
      case _ =>
        operators.Dedup.simhashPairs(big, "doc_id", "text",
          maxHamming = 3, maxBucketSize = 500).count()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scale] $which ${mult}x docs=$n pairs=$pairs secs=$dt%.1f")
    spark.stop()
  }
}
