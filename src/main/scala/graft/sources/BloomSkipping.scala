package graft.sources

import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.types._

import TxnLog.Bloom

/** Per-file Bloom filters for log-side file skipping on EQUALITY lookups
  * (Delta-style per-file Bloom indexes; Bloom, CACM 1970). Min/max file
  * stats prune range predicates on clustered columns; they are useless
  * for a needle lookup on a high-cardinality column uncorrelated with
  * the layout (one order id somewhere in a date-partitioned year: every
  * file's id bounds span the value). A per-file Bloom answers "definitely
  * not in this file" for exactly that shape, from the transaction log,
  * with zero data IO.
  *
  * Build is ONE distributed pass over the staged files, pure codegen'd
  * built-ins (the house rule): k seeded xxhash64 values per row →
  * bit positions → 64-bit words → `bit_or` per (file, word). The shuffle
  * is sized by the FILTERS (≤ m/64 words per file), never by the data.
  * The driver assembles dense bitsets and stores them base64 in the
  * commit, so lookups prune from the log alone.
  *
  * Membership probes replicate the hash bit-for-bit via the same Catalyst
  * expression evaluated eagerly on the driver ([[XxHash64]] — the engine's
  * own kernel, so distributed build and driver probe cannot drift).
  */
object BloomSkipping {

  /** Standard sizing: m = -n·ln(p)/ln²2 bits (word-aligned, clamped to
    * [64, maxBits]), k = (m/n)·ln2 hashes (clamped to [1, 16]). When the
    * clamp bites, the realized fpp degrades gracefully — never soundness.
    */
  def params(n: Long, fpp: Double, maxBits: Int): (Int, Int) = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val nn = math.max(1L, n)
    val ln2 = math.log(2)
    val mRaw = math.ceil(-nn * math.log(fpp) / (ln2 * ln2)).toLong
    val m = (math.min(maxBits.toLong, math.max(64L, mRaw) + 63) / 64 * 64).toInt
    val k = math.max(1L, math.round(m.toDouble / nn * ln2)).toInt
    (m, math.min(k, 16))
  }

  /** Build one filter per (file, column) over `rels` (paths relative to
    * `root`). `rowCounts` sizes each file's filter (commit-time counts —
    * already in hand when this runs). Columns absent from the files'
    * schema are skipped. Null values are not inserted (an equality lookup
    * is never null). Returns rel → col → filter.
    */
  def build(
      spark: SparkSession,
      root: String,
      rels: Seq[String],
      cols: Seq[String],
      rowCounts: Map[String, Long],
      fpp: Double,
      maxBits: Int): Map[String, Map[String, Bloom]] = {
    if (rels.isEmpty || cols.isEmpty) return Map.empty
    import spark.implicits._
    val paths = rels.map(r => s"$root/$r")
    val reader = spark.read.option("basePath", root).parquet(paths: _*)
    val present = cols.filter(reader.schema.fieldNames.contains)
    if (present.isEmpty) return Map.empty
    val dtOf = present.map(c =>
      c -> reader.schema(c).dataType).toMap

    // file basenames are UUID-uniqued at publish time (publishStaged), so
    // they key the join back to rels without touching URI-escaping of
    // partition dirs; the require guards addFiles-registered external
    // files, whose names the lakehouse does not control
    val baseOf = rels.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    require(baseOf.size == rels.size, "duplicate file basenames in commit")
    val perFile = rels.map { r =>
      val (m, k) = params(rowCounts.getOrElse(r, 1L), fpp, maxBits)
      (r.substring(r.lastIndexOf('/') + 1), m, k)
    }
    val paramsDf = broadcast(perFile.toDF("base", "m", "k"))

    val withBase = reader
      .withColumn("base",
        element_at(split(input_file_name(), "/"), -1))
      .join(paramsDf, "base")

    present.map { c =>
      // pos_i = pmod(xxhash64(value, i), m), i in [0, k): k seeded hashes
      // from the one xxhash64 kernel; word/bit split keeps the aggregate
      // state at ≤ m/64 longs per file
      val words = withBase
        .filter(col(c).isNotNull)
        .select($"base", $"m", col(c).as("v"),
          explode(sequence(lit(0), $"k" - 1)).as("i"))
        .select($"base",
          pmod(xxhash64($"v", $"i"), $"m").as("pos"))
        .select($"base", ($"pos" / 64).cast("int").as("w"),
          expr("shiftleft(1L, int(pos % 64))").as("bit"))
        .groupBy($"base", $"w").agg(bit_or($"bit").as("bits"))
        .collect()
      val byBase = words.groupBy(_.getString(0))
      val filters = perFile.map { case (base, m, k) =>
        val dense = new Array[Long](m / 64)
        byBase.getOrElse(base, Array.empty).foreach { row =>
          dense(row.getInt(1)) = row.getLong(2)
        }
        val bytes = new Array[Byte](dense.length * 8)
        val bb = java.nio.ByteBuffer.wrap(bytes)
        dense.foreach(bb.putLong)
        baseOf(base) -> Bloom(m, k, dtOf(c).catalogString,
          Base64.getEncoder.encodeToString(bytes))
      }.toMap
      c -> filters
    }.foldLeft(Map.empty[String, Map[String, Bloom]]) { case (acc, (c, byRel)) =>
      byRel.foldLeft(acc) { case (a, (rel, bl)) =>
        a.updated(rel, a.getOrElse(rel, Map.empty).updated(c, bl))
      }
    }
  }

  /** Driver-side membership probe: false ⇒ the file DEFINITELY lacks the
    * value (safe to skip); true ⇒ read it. The value is coerced to the
    * filter's recorded write-time type first — on any mismatch the probe
    * conservatively answers true (see [[TxnLog.Bloom]] `dt`).
    */
  def mightContain(bloom: Bloom, value: Any): Boolean =
    coerce(value, bloom.dt) match {
      case None => true
      case Some(lit) =>
        val bytes = Base64.getDecoder.decode(bloom.bitsB64)
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val dense = Array.fill(bytes.length / 8)(bb.getLong())
        (0 until bloom.k).forall { i =>
          val h = new XxHash64(Seq(lit, Literal(i))).eval(null)
            .asInstanceOf[Long]
          val pos = java.lang.Math.floorMod(h, bloom.m.toLong).toInt
          (dense(pos / 64) & (1L << (pos % 64))) != 0L
        }
    }

  /** Scala value → Catalyst literal of the filter's write-time type.
    * Numeric widenings that preserve the value are applied (an Int probe
    * against a bigint filter hashes as the long it would be stored as);
    * anything lossy or unknown returns None → "might contain".
    */
  private def coerce(value: Any, dt: String): Option[Literal] = {
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    val target = try CatalystSqlParser.parseDataType(dt)
                 catch { case _: Exception => return None }
    val v: Any = (value, target) match {
      case (x: Int, LongType) => x.toLong
      case (x: Short, LongType) => x.toLong
      case (x: Byte, LongType) => x.toLong
      case (x: Short, IntegerType) => x.toInt
      case (x: Byte, IntegerType) => x.toInt
      case (x: Float, DoubleType) => x.toDouble
      case (x, _) => x
    }
    try Some(Literal.create(v, target))
    catch { case _: Exception => None }
  }
}
