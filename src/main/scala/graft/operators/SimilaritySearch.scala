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

  /** LSH-bucketed ANN: score only vectors in the query's bucket. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Double],
      k: Int,
      numPlanes: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val planes = hyperplanes(numPlanes, queryVec.length)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(queryVec).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val bucketed = df.withColumn("__bucket",
      lshBucket(VectorOps.toDoubles(col(vecCol)), planes))
    bruteForceTopK(bucketed.filter(col("__bucket") === qBucket),
      idCol, vecCol, queryVec, k, excludeId)
  }
}
