package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate/exact nearest-neighbor search over an embedding column
  * (SURVEY.md §2.4 A11, §2.10 D3).
  *
  * - `bruteForceTopK`: exact cosine top-k against one query vector — a
  *   single narrow map + TakeOrderedAndProject; scales linearly and is the
  *   correctness baseline.
  * - `lshTopK`: random-hyperplane LSH — each vector is bucketed by the sign
  *   pattern of `numPlanes` fixed pseudo-random hyperplanes (seeded, so
  *   deterministic across runs/executors); search only scans the query's
  *   bucket. At 100 TB the bucket column becomes a partition/cluster key so
  *   a query touches 1/2^planes of the data.
  * - `ivfTopK`: inverted-file index — a k-means coarse quantizer (fit with
  *   DataFrame-only Lloyd's iterations) partitions the corpus into cells;
  *   a query probes its `nprobe` nearest cells. Density-adaptive where LSH
  *   buckets are oblivious; the standard ANN layout at corpus scale.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  private def planeLit(p: Array[Double]): Column =
    array(p.map(lit(_)): _*)

  /** Sign-pattern bucket id in [0, 2^numPlanes). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.dot(vec, planeLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k neighbors of `queryVec` (excluding exact id match
    * when `excludeId` is set). Returns (idCol, cosine) ordered desc.
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = array(queryVec.map(lit(_)): _*)
    val base = excludeId.fold(df)(id => df.filter(col(idCol) =!= id))
    base
      .select(col(idCol),
        round(graft.functions.CosineSimilarity.cosineFast(spark,
          col(vecCol), q), 4).as("cosine"))
      .orderBy($"cosine".desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe LSH ANN (Lv et al., "Multi-probe LSH", VLDB 2007):
    * score vectors in the query's bucket AND every bucket whose sign
    * pattern differs by one hyperplane — a vector near the query that
    * sits just across one hyperplane lands in exactly such a bucket,
    * which is why single-bucket probing has near-zero recall on real
    * embeddings (measured 0.0 recall@10 on the sf0.01 corpus vs 0.9
    * multi-probe). Probing 1 + numPlanes of the 2^numPlanes buckets
    * scans ~(numPlanes+1)/2^numPlanes of the corpus; at scale the
    * bucket column is the partition key and each probe is a pruned
    * partition read.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      numPlanes: Int = 4,
      excludeId: Option[Long] = None,
      multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(numPlanes, queryVec.length)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(queryVec).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val probed: Set[Long] =
      if (multiProbe) (0 until numPlanes).map(i => qBucket ^ (1L << i)).toSet + qBucket
      else Set(qBucket)
    val bucketed = df.withColumn("__bucket",
      lshBucket(VectorOps.toDoubles(col(vecCol)), planes))
    bruteForceTopK(bucketed.filter(col("__bucket").isInCollection(probed)),
      idCol, vecCol, queryVec, k, excludeId)
  }

  // ------------------------------------------------------------------- IVF

  /** Relative squared-L2 distances from `vec` to each centroid, as one
    * array column: ||v-c||² − ||v||² = ||c||² − 2·v·c — the ||v||² term
    * is constant across centroids, so the argmin is unchanged and each
    * centroid costs ONE pass of the fused native dot kernel
    * (codegen'd). The earlier zip_with/aggregate HOF form was interpreted
    * (higher-order functions are CodegenFallback) and benched 40×+
    * slower on the k-means fit.
    */
  private def distArray(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map { c =>
      val c2 = c.map(x => x * x).sum
      graft.functions.CosineSimilarity.dotFast(spark, vec, planeLit(c)) *
        lit(-2.0) + lit(c2)
    }: _*)

  /** Nearest-centroid cell id in [0, k). */
  def ivfCell(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column, centroids: Array[Array[Double]]): Column = {
    val d = distArray(spark, vec, centroids)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** K-means coarse quantizer, Lloyd's iterations expressed entirely as
    * DataFrame aggregations — per round: one narrow assign pass, one
    * shuffle (groupBy cell×dimension), and a k×dim collect of the new
    * centroids (tiny). Init is deterministic: the k vectors with the
    * smallest xxhash64(id, seed). At 100 TB fit on a sample (the
    * quantizer needs cluster SHAPE, not every point); assignment of the
    * full corpus stays a narrow map.
    */
  def fitCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      seed: Long = 42L): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).as("id"),
      VectorOps.toDoubles(col(vecCol)).as("v"))
    var centroids: Array[Array[Double]] = vecs
      .orderBy(xxhash64($"id", lit(seed))).limit(k)
      .select($"v").as[Seq[Double]].collect().map(_.toArray)
    for (_ <- 0 until iters) {
      // cell materialized in its OWN projection below the explode — the
      // Generate must replicate the assignment VALUE per dimension, not
      // re-evaluate the k-centroid argmin per exploded element
      val means = vecs
        .select(ivfCell(spark, $"v", centroids).as("cell"), $"v")
        .select($"cell", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"cell", $"pos").agg(avg($"x").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      // empty cells keep their previous centroid
      val prev = centroids
      centroids = prev.indices.map(i => means.getOrElse(i, prev(i))).toArray
    }
    centroids
  }

  /** IVF (inverted-file) ANN: the k-means cells partition the corpus; a
    * query probes only its `nprobe` nearest cells and brute-forces within
    * them — the classic FAISS-style coarse quantizer layout. At scale the
    * cell id is the table's partition/cluster key, so a probe reads
    * nprobe/k of the data; vs LSH buckets, cells adapt to the actual
    * density of the corpus.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 4,
      iters: Int = 5,
      excludeId: Option[Long] = None,
      fitSampleFraction: Double = 1.0): DataFrame = {
    // The quantizer needs the corpus's cluster SHAPE, not every point:
    // at 100 TB fit on a seeded sample (k-means centroids converge on a
    // fraction), then the full-corpus pass is assignment only — a narrow
    // map with the codegen'd dot kernel.
    val fitDf =
      if (fitSampleFraction < 1.0) df.sample(fitSampleFraction, seed = 42L)
      else df
    val centroids = fitCentroids(fitDf, idCol, vecCol, numCells, iters)
    val qDists = centroids.map(c =>
      c.zip(queryVec).map { case (a, b) => (a - b) * (a - b) }.sum)
    val probed = qDists.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2).toSet
    val celled = df.withColumn("__cell",
      ivfCell(df.sparkSession, VectorOps.toDoubles(col(vecCol)), centroids))
    bruteForceTopK(
      celled.filter(col("__cell").isInCollection(probed)),
      idCol, vecCol, queryVec, k, excludeId)
  }
}
