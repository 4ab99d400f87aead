package graft

import scala.util.Random

import graft.operators.SimilaritySearch

/** Property evidence for the q56/q57/q64 oracle upgrades: the gate-corpus
  * completeness pin (OperatorsSpec) shows the multi-probe config catches
  * every exact pair ON those corpora; this spec shows it is not a
  * gate-corpus accident. Random ISOTROPIC corpora (the geometric worst
  * case for sign-pattern LSH — no cluster structure to lean on) with
  * pairs PLANTED at controlled cosines bracketing the 0.45 threshold,
  * across seeds: the q56 config (4 planes x 14 tables x 2 flips, capped
  * buckets) must return the exact pair restriction — candidates complete
  * at the threshold itself, verification exact.
  */
class MultiProbeCompletenessSpec extends SparkSpec {

  private val dims = 64

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** v with cos(u, v) == c exactly: c*û + sqrt(1-c²)*ŵ, w ⊥ u. */
  private def plant(u: Array[Double], c: Double, rnd: Random): Array[Double] = {
    val w = Array.fill(dims)(rnd.nextGaussian())
    val un = math.sqrt(u.map(x => x * x).sum)
    val uh = u.map(_ / un)
    val proj = uh.indices.map(i => w(i) * uh(i)).sum
    val orth = Array.tabulate(dims)(i => w(i) - proj * uh(i))
    val on = math.sqrt(orth.map(x => x * x).sum)
    Array.tabulate(dims)(i =>
      c * uh(i) + math.sqrt(1 - c * c) * orth(i) / on)
  }

  test("planted pairs at and above the threshold survive across random corpora") {
    import spark.implicits._
    val bands = Seq(0.46, 0.48, 0.52, 0.56, 0.65, 0.80)
    val perBand = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    (1 to 6).foreach { seed =>
      val rnd = new Random(seed * 1000L + 7)
      val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      (0 until 240).foreach(_ => vecs += Array.fill(dims)(rnd.nextGaussian()))
      bands.foreach { c =>
        (0 until 8).foreach { _ =>
          val u = Array.fill(dims)(rnd.nextGaussian())
          vecs += u
          vecs += plant(u, c, rnd)
        }
      }
      // ground truth by brute force (planting bookkeeping not trusted:
      // plants can incidentally pair with noise or each other)
      val arr = vecs.toArray
      val exact = (for {
        i <- arr.indices; j <- arr.indices if i < j
        if cos(arr(i), arr(j)) >= 0.45
      } yield (i.toLong, j.toLong)).toSet

      val df = arr.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val got = SimilaritySearch.lshPairs(df, "vec_id", "embedding",
          threshold = 0.45, numPlanes = 4, numTables = 14,
          maxBucketSize = 500, probeFlips = 2)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

      val missed = exact.diff(got)
      val extra = got.diff(exact)
      assert(extra.isEmpty, s"seed=$seed false positives: $extra") // verified-exact
      (exact -- Set.empty).foreach { case (i, j) =>
        val c0 = cos(arr(i.toInt), arr(j.toInt))
        val band = if (c0 < 0.5) "[0.45,0.50)" else if (c0 < 0.6) "[0.50,0.60)"
          else "[0.60,1.00]"
        val (m, t) = perBand(band)
        perBand(band) = (m + (if (missed.contains((i, j))) 1L else 0L), t + 1L)
      }
      assert(missed.isEmpty,
        s"seed=$seed missed ${missed.size}/${exact.size}: " +
          missed.take(5).map { case (i, j) =>
            f"($i,$j cos=${cos(arr(i.toInt), arr(j.toInt))}%.3f)" }.mkString(", "))
    }
    info(perBand.toSeq.sortBy(_._1).map { case (b, (m, t)) =>
      s"$b missed $m/$t" }.mkString("; "))
  }

  /** Driver-side independent rebuild of the probe-reachability predicate
    * for the f = planes geometries the adaptive law produces: a pair is
    * REACHABLE when some table's canonical buckets are within Hamming
    * distance `radius` (with f = planes every differing plane is
    * flippable, so closest-plane selection drops out of the predicate).
    * Uses the same float-rounded vectors and per-table `seed + t`
    * hyperplanes as the engine, but no Spark machinery.
    */
  private def reachable(a: Array[Double], b: Array[Double],
      numPlanes: Int, numTables: Int, radius: Int): Boolean = {
    (0 until numTables).exists { t =>
      val planes = SimilaritySearch.hyperplanes(numPlanes, dims, 42L + t)
      def bucket(v: Array[Double]): Long = {
        var m = 0L
        planes.zipWithIndex.foreach { case (p, i) =>
          val d = p.indices.map(j => p(j) * v(j)).sum
          if (d >= 0) m |= 1L << i
        }
        m
      }
      java.lang.Long.bitCount(bucket(a) ^ bucket(b)) <= radius
    }
  }

  /** The resolveRadius law, rebuilt independently: smallest r with
    * (1 - P[Binom(planes, 1-p) <= r])^tables <= 1e-3, capped at 3. */
  private def lawRadius(threshold: Double, planes: Int, tables: Int): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    def miss(r: Int): Double = {
      val cum = (0 to r).map { d =>
        (1 to d).map(i => (planes - i + 1).toDouble / i).product *
          math.pow(p, planes - d) * math.pow(1 - p, d)
      }.sum
      math.pow(1 - math.min(cum, 1.0), tables)
    }
    var r = 1
    while (r < 3 && miss(r) > 1e-3) r += 1
    r
  }

  /** The resolveTables growth arm, rebuilt independently: where the
    * capped radius leaves the per-pair miss above 1e-3, the smallest
    * table count reaching it, capped at 64. */
  private def lawTables(threshold: Double, planes: Int, tables: Int,
      radius: Int): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    val hit = math.min(1.0, (0 to radius).map { d =>
      (1 to d).map(i => (planes - i + 1).toDouble / i).product *
        math.pow(p, planes - d) * math.pow(1 - p, d)
    }.sum)
    if (math.pow(1 - hit, tables) <= 1e-3 || hit <= 0.0) tables
    else math.max(tables,
      math.min(math.ceil(math.log(1e-3) / math.log(1 - hit)).toInt, 64))
  }

  test("adaptive geometries (8/12/16 planes): ball-probe completeness and recall floors") {
    // The r10 envelope gap: candidate completeness was proven only at
    // the 4-plane gate geometry, while the adaptive sizing law gives
    // larger corpora 8+ planes — where single-bit flips can NEVER reach
    // a pair whose buckets differ in >= 2 planes. The radius law
    // (resolveRadius) closes it through 8 planes; where the radius cap
    // binds (12/16 planes at cosine 0.45) the r12 TABLE-GROWTH arm
    // (resolveTables) grows the table count to the 1e-3 bar — closing
    // the 16-plane 0.952 measured floor r11 documented. Two claims per
    // geometry, on random isotropic corpora with pairs planted
    // bracketing the threshold:
    //  1. DETERMINISTIC mechanism completeness: every exact pair within
    //     ball radius of some GROWN table (driver-rebuilt predicate —
    //     pairs reachable only in tables 14..T-1 prove the engine
    //     actually probes the grown set) IS returned, and nothing below
    //     threshold ever is.
    //  2. MEASURED recall >= 0.99 at EVERY geometry (the law's bound is
    //     <= 1e-3 everywhere once growth engages: 8 planes r=2 T=14
    //     bound 4.5e-4; 12 planes r=3 T=17 8.0e-4; 16 planes r=3 T=50
    //     8.8e-4 — r11's ungrown 16-plane floor measured 0.952, so the
    //     0.99 floor also discriminates growth-off regressions).
    import spark.implicits._
    val geoms = Seq((8, 14, 0.99), (12, 14, 0.99), (16, 14, 0.99))
    geoms.foreach { case (numPlanes, numTables, floor) =>
      val radius = lawRadius(0.45, numPlanes, numTables)
      assert(radius == (if (numPlanes == 8) 2 else 3),
        s"law drifted: planes=$numPlanes radius=$radius")
      val grownTables = lawTables(0.45, numPlanes, numTables, radius)
      assert(grownTables == (numPlanes match {
        case 8 => 14; case 12 => 17; case 16 => 50
      }), s"growth law drifted: planes=$numPlanes tables=$grownTables")
      // the ENGINE's resolved geometry must equal the independent
      // rebuild — resolveGeometry is the single source of truth lshPairs
      // runs through, so this pins the whole law stack, not just recall
      val g = SimilaritySearch.resolveGeometry(0L, 0.45, numPlanes,
        numTables, probeFlips = -1)
      assert((g.planes, g.tables, g.radius) ==
        ((numPlanes, grownTables, radius)),
        s"engine geometry drifted from the law rebuild: $g")
      assert(g.missBound <= 1e-3,
        f"grown geometry still over the bar: ${g.missBound}%.3g")
      var hits = 0L
      var truth = 0L
      (1 to 2).foreach { seed =>
        val rnd = new Random(seed * 3100L + numPlanes)
        val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        (0 until 240).foreach(_ => vecs += Array.fill(dims)(rnd.nextGaussian()))
        Seq(0.46, 0.48, 0.52, 0.56, 0.65, 0.80).foreach { c =>
          (0 until 8).foreach { _ =>
            val u = Array.fill(dims)(rnd.nextGaussian())
            vecs += u
            vecs += plant(u, c, rnd)
          }
        }
        // engine sees float32: rebuild ground truth and reachability on
        // the SAME rounded values or near-tie sign bits could differ
        val arr = vecs.map(_.map(x => x.toFloat.toDouble)).toArray
        val exact = (for {
          i <- arr.indices; j <- arr.indices if i < j
          if cos(arr(i), arr(j)) >= 0.45
        } yield (i.toLong, j.toLong)).toSet
        val df = arr.zipWithIndex
          .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
          .toSeq.toDF("vec_id", "embedding")
        val got = SimilaritySearch.lshPairs(df, "vec_id", "embedding",
            threshold = 0.45, numPlanes = numPlanes, numTables = numTables,
            probeFlips = -1) // radius defaults to the law
          .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
        assert(got.subsetOf(exact),
          s"planes=$numPlanes seed=$seed false positives: ${got.diff(exact).take(3)}")
        val mustHave = exact.filter { case (i, j) =>
          reachable(arr(i.toInt), arr(j.toInt), numPlanes, grownTables, radius)
        }
        val lost = mustHave.diff(got)
        assert(lost.isEmpty,
          s"planes=$numPlanes seed=$seed: mechanism lost ${lost.size} " +
            s"reachable pairs, e.g. ${lost.take(3)}")
        hits += got.size
        truth += exact.size
      }
      val recall = hits.toDouble / truth
      info(f"planes=$numPlanes radius=$radius tables=$grownTables " +
        f"recall=$recall%.4f ($hits%d/$truth%d, floor $floor%.2f)")
      assert(recall >= floor,
        f"planes=$numPlanes measured recall $recall%.4f under floor $floor%.2f")
    }
  }

  test("the growth arm is bounded and surfaced: 20 planes at 0.45 caps at 64 tables") {
    // Past the growth ceiling (20+ planes at a loose threshold — the
    // ~134M-vector regime) completeness is out of the LSH path's reach;
    // the engine's contract is a machine-readable residual: missBound is
    // public, and lshPairs logs it. Pin the numbers so the contract
    // can't silently drift: radius caps at 3, tables cap at 64, and the
    // residual bound stays in (1e-3, 0.1) — i.e. a documented ~0.94
    // at-threshold floor rather than either completeness or collapse.
    val radius = lawRadius(0.45, 20, 14)
    assert(radius == 3)
    assert(lawTables(0.45, 20, 14, radius) == 64)
    val residual = SimilaritySearch.missBound(0.45, 20, 64, 3)
    assert(residual > 1e-3 && residual < 0.1,
      f"20-plane residual drifted: $residual%.4g")
    // the engine's own pre-flight reports the same capped geometry and
    // surfaces the residual machine-readably
    val g = SimilaritySearch.resolveGeometry(0L, 0.45, 20, 14,
      probeFlips = -1)
    assert(g.radius == 3 && g.tables == 64 && g.missBound == residual, s"$g")
    // and the threshold-awareness twin: the same geometry at 0.9 needs
    // no growth at all
    assert(lawTables(0.9, 20, 14, lawRadius(0.9, 20, 14)) == 14)
    assert(SimilaritySearch.resolveGeometry(0L, 0.9, 20, 14,
      probeFlips = -1).tables == 14)
  }

  test("the law is threshold-aware: 16 planes at cosine 0.9 is complete at radius 2") {
    // The 16-plane floor above is a LOW-threshold (0.45) artifact —
    // sign-pattern collision p = 1 − θ/π barely clears coin-flip there.
    // At the production near-dup threshold (0.9, p ≈ 0.86) the law
    // resolves radius 2 with a 4e-6 per-pair bound, so completeness
    // extends through the geometry a ~8M-vector corpus would get.
    import spark.implicits._
    val numPlanes = 16
    val radius = lawRadius(0.9, numPlanes, 14)
    assert(radius == 2, s"law drifted at high threshold: $radius")
    var missedTotal = 0
    (1 to 2).foreach { seed =>
      val rnd = new Random(seed * 8800L + 1)
      val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      (0 until 240).foreach(_ => vecs += Array.fill(dims)(rnd.nextGaussian()))
      Seq(0.905, 0.93, 0.96).foreach { c =>
        (0 until 10).foreach { _ =>
          val u = Array.fill(dims)(rnd.nextGaussian())
          vecs += u
          vecs += plant(u, c, rnd)
        }
      }
      val arr = vecs.map(_.map(x => x.toFloat.toDouble)).toArray
      val exact = (for {
        i <- arr.indices; j <- arr.indices if i < j
        if cos(arr(i), arr(j)) >= 0.9
      } yield (i.toLong, j.toLong)).toSet
      val df = arr.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val got = SimilaritySearch.lshPairs(df, "vec_id", "embedding",
          threshold = 0.9, numPlanes = numPlanes, numTables = 14,
          probeFlips = -1)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(exact), s"seed=$seed false positives")
      missedTotal += exact.diff(got).size
      assert(exact.size >= 30, s"seed=$seed: too few true pairs to test")
      assert(exact.diff(got).isEmpty,
        s"seed=$seed missed ${exact.diff(got).size}/${exact.size} at 0.9")
    }
    info(s"16 planes @ 0.9: radius=$radius missed=$missedTotal")
  }

  test("probe kernel: codegen == interpreted eval; ball exact, duplicate-free") {
    // LshProbeBuckets implements the closest-plane selection and the
    // combination odometer TWICE (nullSafeEval + doGenCode); a drift
    // between them would silently skew candidate sets only on whichever
    // path a plan happens to take. Random dots arrays across a
    // (flips, radius) grid: the DataFrame projection (codegen) must be
    // element-for-element the direct expression eval, and both must be
    // EXACTLY the Hamming ball — every ≤radius subset of the flips
    // closest planes once, canonical bucket first, no duplicates.
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new Random(99)
    val dotsRows = (0 until 40).map(_ => Array.fill(12)(rnd.nextGaussian() * 0.3))
    Seq((2, 1), (4, 2), (8, 2), (12, 3), (12, 1)).foreach { case (flips, radius) =>
      val viaCodegen = dotsRows.map(d => Tuple1(d.toSeq)).toDF("ds")
        .select(graft.functions.LshProbe.probeBucketsFast(
          spark, $"ds", flips, radius).as("p"))
        .as[Seq[Long]].collect()
      dotsRows.zip(viaCodegen).foreach { case (ds, cg) =>
        val ev = graft.functions.LshProbeBuckets(
            Literal.create(ds.toSeq, ArrayType(DoubleType)),
            Literal(flips), Literal(radius))
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        assert(ev == cg, s"flips=$flips radius=$radius: eval != codegen")
        val canonical = ds.indices.filter(ds(_) >= 0)
          .foldLeft(0L)((m, i) => m | (1L << i))
        val closest = ds.indices.sortBy(i => (math.abs(ds(i)), i)).take(flips)
        val ball = (0 to radius).flatMap(s =>
          closest.combinations(s).map(_.foldLeft(canonical)(
            (m, i) => m ^ (1L << i)))).toSet
        assert(cg.head == canonical)
        assert(cg.size == graft.functions.LshProbe.probeCount(flips, radius))
        assert(cg.distinct.size == cg.size, "duplicate probe bucket")
        assert(cg.toSet == ball, s"flips=$flips radius=$radius: ball mismatch")
      }
    }
    // probeCount overflow pin (ADVICE r11): summing the full binomial
    // series at flips near 64 with a large explicit radius overflows a
    // Long (C(64,32) alone exceeds 2^63) — a wrapped total could slip
    // under the 4096 kernel cap and size a negative per-row array. The
    // early-exit must leave absurd geometries LOUDLY over the cap.
    Seq((64, 32), (64, 64), (48, 24)).foreach { case (f, r) =>
      val c = graft.functions.LshProbe.probeCount(f, r)
      assert(c > 4096, s"probeCount($f,$r) wrapped under the cap: $c")
    }
    // …while exact small counts are untouched by the early-exit
    assert(graft.functions.LshProbe.probeCount(16, 3) == 697L)
    assert(graft.functions.LshProbe.probeCount(12, 3) == 299L)
  }

  test("index-probe path at the 8-plane geometry: ball reachability and recall") {
    // The standing-index twin of the adaptive-geometry test above:
    // probing is BATCH-SIDE only (the index stores canonical buckets),
    // so reachability is the same Hamming-ball predicate — a cross pair
    // is reachable iff some table's buckets are within the law radius.
    // Deterministic completeness for reachable pairs + a measured
    // cross-recall floor at 8 planes / radius 2.
    import spark.implicits._
    val numPlanes = 8
    val numTables = 14
    val radius = lawRadius(0.45, numPlanes, numTables)
    assert(radius == 2)
    var hits = 0L
    var truth = 0L
    (1 to 2).foreach { seed =>
      val rnd = new Random(seed * 4700L + 3)
      val corpus = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      (0 until 200).foreach(_ => corpus += Array.fill(dims)(rnd.nextGaussian()))
      val batch = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      Seq(0.46, 0.52, 0.65).foreach { c =>
        (0 until 10).foreach { _ =>
          batch += plant(corpus(rnd.nextInt(corpus.size)), c, rnd)
        }
      }
      (0 until 40).foreach(_ => batch += Array.fill(dims)(rnd.nextGaussian()))
      val cArr = corpus.map(_.map(x => x.toFloat.toDouble)).toArray
      val bArr = batch.map(_.map(x => x.toFloat.toDouble)).toArray
      val exactCross = (for {
        b <- bArr.indices; k <- cArr.indices
        if cos(bArr(b), cArr(k)) >= 0.45
      } yield (b.toLong, 1000L + k)).toSet
      val corpusDf = cArr.zipWithIndex
        .map { case (v, k) => (1000L + k, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val batchDf = bArr.zipWithIndex
        .map { case (v, b) => (b.toLong, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val idx = SimilaritySearch.lshIndex(corpusDf, "vec_id", "embedding",
        numPlanes = numPlanes, numTables = numTables)
      try {
        val got = SimilaritySearch.lshPairsAgainstIndex(
            batchDf, idx, "vec_id", "embedding",
            threshold = 0.45, probeFlips = -1) // radius via the law
          .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
        assert(got.subsetOf(exactCross),
          s"seed=$seed false positives: ${got.diff(exactCross).take(3)}")
        val mustHave = exactCross.filter { case (b, k) =>
          reachable(bArr(b.toInt), cArr((k - 1000L).toInt),
            numPlanes, numTables, radius)
        }
        val lost = mustHave.diff(got)
        assert(lost.isEmpty,
          s"seed=$seed: index path lost ${lost.size} reachable pairs")
        hits += got.size
        truth += exactCross.size
      } finally idx.unpersist()
    }
    val recall = hits.toDouble / truth
    info(f"index path planes=$numPlanes radius=$radius recall=$recall%.4f ($hits/$truth)")
    assert(recall >= 0.99, f"cross recall $recall%.4f under floor 0.99")
  }

  test("index-probe path (q64 config): planted cross pairs survive across corpora") {
    // same property for the STANDING-INDEX shape: corpus vectors indexed
    // once, a batch probes with flips — the incremental-dedup machinery
    // behind q64's oracle upgrade. Exact cross restriction required.
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed * 777L + 13)
      val corpus = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      (0 until 200).foreach(_ => corpus += Array.fill(dims)(rnd.nextGaussian()))
      val batch = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      Seq(0.46, 0.52, 0.65).foreach { c =>
        (0 until 8).foreach { _ =>
          val u = corpus(rnd.nextInt(corpus.size)) // pair against the corpus
          batch += plant(u, c, rnd)
        }
      }
      (0 until 40).foreach(_ => batch += Array.fill(dims)(rnd.nextGaussian()))
      val exactCross = (for {
        b <- batch.indices; k <- corpus.indices
        if cos(batch(b), corpus(k)) >= 0.45
      } yield (b.toLong, 1000L + k)).toSet

      val corpusDf = corpus.zipWithIndex
        .map { case (v, k) => (1000L + k, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val batchDf = batch.zipWithIndex
        .map { case (v, b) => (b.toLong, v.map(_.toFloat).toSeq) }
        .toSeq.toDF("vec_id", "embedding")
      val idx = SimilaritySearch.lshIndex(
        corpusDf, "vec_id", "embedding", numTables = 14)
      try {
        val got = SimilaritySearch.lshPairsAgainstIndex(
            batchDf, idx, "vec_id", "embedding",
            threshold = 0.45, probeFlips = 2)
          .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
        assert(got == exactCross,
          s"seed=$seed: missing ${exactCross.diff(got)}, extra ${got.diff(exactCross)}")
      } finally idx.unpersist()
    }
  }
}
