package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Near-duplicate detection for large text corpora (SURVEY.md §2.10 D1-D2):
  * exact keyed dedup, MinHash+LSH, and SimHash — the standard toolkit of an
  * LLM-training-data pipeline, built entirely from codegen'd built-ins
  * (xxhash64 + higher-order functions), no UDFs.
  *
  * Scale shape: signatures are computed map-side (narrow); the only shuffle
  * is the explode-on-band → self-join on bucket, which is exactly the
  * communication lower bound for LSH banding. Giant buckets (degenerate
  * shingles) are the skew risk at 100 TB — cap them with `maxBucketSize`.
  */
object Dedup {

  /** Exact dedup: deterministic winner (min of `winnerCol`) per key group —
    * the reference's dedup gate (README.md:41) with a defined tie-break,
    * unlike bare dropDuplicates whose survivor is partition-order-dependent.
    */
  def exact(df: DataFrame, keys: Seq[String], winnerCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(winnerCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature of a shingle array: sig[i] = min over shingles of
    * xxhash64(i, shingle). Null when the shingle array is empty.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(shingles, sh => xxhash64(i, sh)))))

  /** LSH banding: (bandIndex, bandHash) rows per document. Documents sharing
    * any band bucket are candidate near-duplicates. numHashes must equal
    * bands * rowsPerBand.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(j, slice(sig, j * rowsPerBand + lit(1), lit(rowsPerBand))))

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    *
    * @param df       input with a unique id column and a text column
    * @param threshold exact shingle-Jaccard cutoff applied to candidates
    * @return (a_id, b_id, jaccard) with a_id < b_id, one row per pair
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val sh = df
      .select(col(idCol).as("id"),
        array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), shingleLen))
          .as("shingles"))
      .filter(size($"shingles") > 0)

    val banded = sh
      .withColumn("sig", minhashSignature($"shingles", numHashes))
      .select($"id", $"shingles",
        posexplode(lshBands($"sig", bands, rowsPerBand)).as(Seq("band", "bucket")))

    val a = banded.select($"id".as("a_id"), $"shingles".as("a_sh"), $"band", $"bucket")
    val b = banded.select($"id".as("b_id"), $"shingles".as("b_sh"),
      $"band".as("band_b"), $"bucket".as("bucket_b"))
    val cand = a.join(b,
        $"band" === $"band_b" && $"bucket" === $"bucket_b" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"a_sh", $"b_sh")
      .dropDuplicates("a_id", "b_id")

    cand
      .withColumn("inter", size(array_intersect($"a_sh", $"b_sh")))
      .withColumn("jaccard",
        $"inter".cast("double") /
          (size($"a_sh") + size($"b_sh") - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
  }

  /** 64-bit SimHash of a token array: bit b is set when the sum over tokens
    * of ±1 (sign of bit b of xxhash64(token)) is positive.
    */
  def simhash(toks: Column): Column = {
    val bitCols = transform(sequence(lit(0), lit(63)), b => {
      val vote = aggregate(toks, lit(0L), (acc, tk) =>
        acc + when(call_function("shiftright", xxhash64(tk), b)
          .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    aggregate(bitCols, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit chunks
    * (pigeonhole: any pair at Hamming distance <= 3 shares a chunk), then
    * verified with an exact `bit_count(xor) <= maxHamming` filter.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size($"toks") > 0)
      .withColumn("sig", simhash($"toks"))
      .select($"id", $"sig",
        posexplode(transform(sequence(lit(0), lit(3)),
          j => call_function("shiftright", $"sig", j * 16)
            .bitwiseAND(lit(0xFFFFL))))
          .as(Seq("chunk", "chunkval")))
    val a = sigs.select($"id".as("a_id"), $"sig".as("a_sig"), $"chunk", $"chunkval")
    val b = sigs.select($"id".as("b_id"), $"sig".as("b_sig"),
      $"chunk".as("chunk_b"), $"chunkval".as("chunkval_b"))
    a.join(b, $"chunk" === $"chunk_b" && $"chunkval" === $"chunkval_b" &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"a_sig".bitwiseXOR($"b_sig")).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter($"hamming" <= maxHamming)
  }
}
