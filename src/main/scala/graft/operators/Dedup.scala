package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Near-duplicate detection for large text corpora (SURVEY.md §2.10 D1-D2):
  * exact keyed dedup, MinHash+LSH (Broder, "On the resemblance and
  * containment of documents", 1997; banding per Leskovec/Rajaraman/Ullman,
  * Mining of Massive Datasets ch.3), and SimHash (Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002) — the
  * standard toolkit of an LLM-training-data pipeline, built entirely from
  * codegen'd built-ins (xxhash64 + higher-order functions), no UDFs.
  *
  * Scale shape: signatures are computed map-side (narrow); the only shuffle
  * is the explode-on-band → self-join on bucket, which is exactly the
  * communication lower bound for LSH banding. Giant buckets (boilerplate
  * documents sharing a band) are the skew risk at 100 TB — bound them with
  * `minhashPairs(maxBucketSize = ...)`.
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
    * Banding defaults (8 bands × 2 rows = 16 hashes): the S-curve puts the
    * candidate threshold at (1/8)^(1/2) ≈ 0.35 with
    * P(candidate | j) = 1−(1−j²)⁸ ≥ 1 − 3·10⁻⁴ for j ≥ 0.8 — real
    * near-dup corpora (and this one: every exact pair measures j ≥ 0.8,
    * mostly ≥ 0.95) live far above the knee, so 16 hashes buy the same
    * recall the previous 64 (16×4) did at a quarter of the signature
    * cost, which benchmarked as the dominant stage.
    *
    * @param df       input with a unique id column and a text column
    * @param threshold exact shingle-Jaccard cutoff applied to candidates
    * @param maxBucketSize drop LSH buckets holding more than this many
    *        docs (0 = unlimited). A degenerate bucket of m docs emits
    *        m²/2 candidate pairs — the skew bomb at corpus scale. Capping
    *        trades recall ONLY on documents that collide with > cap others
    *        (which are overwhelmingly boilerplate/templates in practice).
    * @return (a_id, b_id, jaccard) with a_id < b_id, one row per pair.
    *         With persist = true: EAGERLY materialized and cached under
    *         the [[jaccardPairs]] contract (internal caches released
    *         before returning; the caller owns the result's
    *         `unpersist()`). With persist = false: a lazy plan.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      maxBucketSize: Int = 0,
      persist: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    // With persist = true (default, corpus-scale runs): the expensive
    // narrow relations are cached because each is referenced by several
    // consumers (signature agg, size agg, both verification join sides) —
    // without the cache each reference re-tokenizes the corpus
    // (self-joins do NOT share unmaterialized subplans). At cluster scale
    // this is the persist/checkpoint you would put after the expensive
    // narrow stage; the blocks die with the session (Bench frees them
    // between samples). persist = false is for REPEATED small-input calls
    // (the streaming within-batch pass) where an unreleased cache per
    // call would leak: bounded recompute instead.
    val caches = scala.collection.mutable.Buffer.empty[DataFrame]
    def cached(d: DataFrame): DataFrame =
      if (persist) { val p = d.persist(); caches += p; p } else d

    // Exploded (id, shingle-hash) relation: each shingle STRING is hashed
    // exactly once; the numHashes minhash "permutations" re-hash the
    // fixed-width long (xxhash64(i, h)) inside vectorized min() aggregates.
    // One shuffle on id; everything upstream is narrow and codegen'd.
    val shex = cached(df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"id",
        explode(array_distinct(TextOps.shingles($"toks", shingleLen))).as("sh"))
      .select($"id", xxhash64($"sh").as("h")))

    // per-doc distinct-shingle count rides the signature aggregate (same
    // exchange — no separate size aggregate, no size join-backs later)
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), $"h")).as(s"mh$i")) :+ count(lit(1)).as("n")
    val sigs = shex.groupBy($"id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select($"id", $"n",
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))

    // Bands carry only (id, n, band, bucket) — candidate generation
    // shuffles ints, never shingle sets (which at corpus scale dwarf the
    // ids). Candidates come from ONE groupBy(band, bucket) posting list
    // (the jaccardPairsUncapped shape): the bucket cap and the ≥2 prune
    // are filters on the grouped row (the previous cap aggregate +
    // join-back and the bucket self-join disappear), pairs expand
    // map-side through codegen'd Generates, and the cross-band dedup
    // stays one hash aggregate.
    val banded = sigs.select($"id", $"n",
      posexplode(lshBands($"sig", bands, rowsPerBand)).as(Seq("band", "bucket")))
    val posting = banded.groupBy($"band", $"bucket")
      .agg(collect_list(struct($"id", $"n")).as("ps"))
      .filter(size($"ps") > 1 &&
        (if (maxBucketSize > 0) size($"ps") <= maxBucketSize else lit(true)))
    val cand = posting
      .select($"ps", posexplode($"ps").as(Seq("i", "x")))
      .select($"x", explode(slice($"ps", $"i" + lit(2), size($"ps"))).as("y"))
      .select(when($"x.id" < $"y.id", struct($"x".as("a"), $"y".as("b")))
        .otherwise(struct($"y".as("a"), $"x".as("b"))).as("p"))
      .groupBy($"p.a.id".as("a_id"), $"p.b.id".as("b_id"),
        $"p.a.n".as("na"), $"p.b.n".as("nb"))
      .agg(lit(1))
      .select($"a_id", $"b_id", $"na", $"nb")

    // Exact-Jaccard verification of candidates only: intersection counts
    // come from joining the (small, broadcastable) pair set against the
    // exploded shingle relation — the shingle sets are never materialized
    // as arrays, and set sizes ride the candidate rows. The broadcast is
    // SIZE-GATED ([[gatedPairs]]) on the corpus-scale path; with
    // persist = false the inputs are small by contract (the streaming
    // within-batch pass) and the hint stays forced — a count job plus a
    // cache registration per micro-batch would cost more than it guards.
    releasingOnFailure(caches.toSeq) {
      val candGated = if (persist) gatedPairs(cached(cand)) else broadcast(cand)
      val pairs = candGated
        .join(shex.select($"id".as("a_id"), $"h"), "a_id")
        .join(shex.select($"id".as("b_id"), $"h".as("h_b")), Seq("b_id"))
        .filter($"h" === $"h_b")
        .groupBy($"a_id", $"b_id", $"na", $"nb")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
        .filter($"jaccard" >= threshold)
        .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
      // the gate's measuring job already made the corpus path eager at
      // call time — finish the jaccardPairs contract: materialize the
      // (pair-sized) result, release the internal caches, caller owns the
      // result's unpersist(). The persist = false streaming path stays a
      // lazy plan (nothing was cached, the broadcast hint stays forced).
      if (persist) materializeAndRelease(pairs, caches.toSeq) else pairs
    }
  }

  /** EXACT n-gram-Jaccard near-dup pairs via a shingle inverted index —
    * the oracle-pinnable formulation (no hashing in the result): shuffle
    * on shingle, pairs only within posting lists, so cost is
    * Σ df(s)²/2 over shingles, not |docs|²/2.
    *
    * @param maxPostingList drop shingles whose document frequency exceeds
    *        this from CANDIDATE GENERATION only (0 = off, fully exact).
    *        One boilerplate shingle shared by m docs otherwise emits m²/2
    *        join rows — the same skew bomb the LSH bucket caps defuse.
    *        Verification always recounts intersections over the FULL
    *        shingle relation, so surviving pairs carry the exact jaccard;
    *        the cap can only lose pairs whose EVERY shared shingle is
    *        ultra-common (boilerplate/templates in practice).
    * @return (a_id, b_id, jaccard) with a_id < b_id — EAGERLY materialized
    *         and cached: the exploded shingle relations this plan persists
    *         internally are released before returning (a long-lived
    *         session must not accumulate them call over call), which
    *         requires the result to be computed first. The caller owns
    *         releasing the (pairs-over-threshold-sized) result via
    *         `unpersist()` when done; a dropped cache recomputes from
    *         lineage (correct, just uncached-intermediate slow).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.5,
      maxPostingList: Int = 0): DataFrame = {
    if (maxPostingList <= 0)
      return jaccardPairsUncapped(df, idCol, textCol, shingleLen, threshold)
    val spark = df.sparkSession
    import spark.implicits._
    // tokens materialized in their own projection (see TextOps.shingles
    // PERF note), then persisted: the self-join and the size join both
    // read it
    val sh = df
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"doc_id",
        explode(array_distinct(TextOps.shingles($"toks", shingleLen))).as("sh"))
      .persist()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // Shingles appearing in a single document cannot produce a pair —
    // dropping them first shrinks the quadratic posting-list expansion
    // (provably result-preserving; doc sizes were computed above). The
    // optional df cap bounds the expansion at the price of recall.
    val dfAgg = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
    val hot = (if (maxPostingList > 0) dfAgg.filter($"df" <= maxPostingList)
               else dfAgg).filter($"df" > 1).select($"sh")
    val sh2 = sh.join(hot, "sh").persist()
    var shShared: DataFrame = null
    var plausibleP: DataFrame = null
    // ONE list for both release paths (failure guard + happy-path
    // materializeAndRelease) so a future intermediate can't be added to
    // one and silently stranded on the other
    def allCaches: Seq[DataFrame] =
      Seq(sh, sh2) ++ Option(shShared) ++ Option(plausibleP)
    val candInter = sh2.as("a")
      .join(sh2.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .agg(count(lit(1)).as("inter"))
    // Uncapped, candidate intersections ARE the exact intersections (only
    // df==1 shingles were dropped, and those intersect nothing); capped,
    // recount over the full relation so values stay exact.
    releasingOnFailure(allCaches) {
      val inter =
        if (maxPostingList <= 0) candInter
        else {
          // The recount pass dominates the capped path on boilerplate-
          // heavy corpora (ScaleRun skewbomb): candidate generation is
          // cheap, but recounting every candidate against the full
          // shingle relation pays |candidates| × |doc shingles|. Two
          // result-preserving cuts:
          //
          // 1. UPPER-BOUND PRUNE before the recount. The candidate's
          //    cold-intersection count is exact over df <= cap shingles;
          //    the hot remainder is bounded by min(hotA, hotB), each
          //    doc's count of df > cap shingles. j is monotone in inter,
          //    so imax := coldInter + min(hotA, hotB) bounds the true
          //    jaccard from above — a pair with
          //    imax/(na+nb-imax) < t provably cannot reach the
          //    threshold. On a template corpus this eliminates the
          //    boiler-only candidate mass (their cold overlap is tiny
          //    and min(hot) ~ template size), leaving the recount only
          //    genuinely-plausible pairs.
          // 2. Recount over df > 1 shingles ONLY — a df == 1 shingle
          //    exists in exactly one document, so it can never survive
          //    the (b_id, sh) equi-join (the argument that drops df == 1
          //    from candidate generation). On natural text the majority
          //    of shingles are df == 1.
          val hotCount = sh.join(
              dfAgg.filter($"df" > maxPostingList).select($"sh"), "sh")
            .groupBy($"doc_id").agg(count(lit(1)).as("hc"))
          val plausible = candInter
            .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), "a_id")
            .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), "b_id")
            .join(hotCount.select($"doc_id".as("a_id"), $"hc".as("ha")),
              Seq("a_id"), "left")
            .join(hotCount.select($"doc_id".as("b_id"), $"hc".as("hb")),
              Seq("b_id"), "left")
            .withColumn("imax", $"inter" +
              least(coalesce($"ha", lit(0L)), coalesce($"hb", lit(0L))))
            .filter($"imax".cast("double") /
              ($"na" + $"nb" - $"imax") >= threshold)
            .select($"a_id", $"b_id")
          shShared = sh.join(
            dfAgg.filter($"df" > 1).select($"sh"), "sh").persist()
          plausibleP = plausible.persist()
          gatedPairs(plausibleP)
            .join(shShared.select($"doc_id".as("a_id"), $"sh"), "a_id")
            // equi-join on BOTH (b_id, sh): each surviving row IS one
            // shared shingle — joining on b_id alone would cross a's
            // shingles with b's (|a|·|b| intermediate rows per pair)
            // before filtering
            .join(shShared.select($"doc_id".as("b_id"), $"sh"),
              Seq("b_id", "sh"))
            .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("inter"))
        }
      val pairs = inter
        .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), "a_id")
        .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), "b_id")
        .withColumn("jaccard",
          $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
        .filter($"jaccard" >= threshold)
        .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
      materializeAndRelease(pairs, allCaches)
    }
  }

  /** The UNCAPPED exact path of [[jaccardPairs]] as a posting-list
    * pipeline — same result set and values, two exchanges instead of
    * five-plus (optimization guide §2.4 "remove shuffles outright"):
    *
    *  1. Per-document distinct-shingle count `n` is computed MAP-SIDE
    *     from the shingle array itself (`size(array_distinct(...))`)
    *     and carried through the explode, so the separate
    *     groupBy(doc_id) size aggregate and the two size join-backs of
    *     the join formulation disappear (n is functionally dependent on
    *     the id, so carrying it through the pair aggregate's keys is
    *     free).
    *  2. Candidates come from ONE groupBy(shingle) that collects the
    *     posting list and expands its ordered pairs map-side
    *     ([[postingPairs]]), instead of a self-join that shuffles the
    *     whole exploded relation twice and needs a df>1 pre-filter
    *     relation to prune singleton shingles (here: `size(ps) > 1`
    *     on the grouped row — df==1 shingles die in place).
    *
    * Exactness argument unchanged from the join form: only df>1
    * shingles can be shared, every shared shingle of a pair produces
    * exactly one expanded row, so the pair count IS |A∩B| over distinct
    * shingles, and the denominator uses the full per-doc distinct
    * counts. Measured at sf0.1: 19 jobs → 6, 4.4 s → ~2 s cold.
    *
    * Scale note: a hot shingle's posting list (m docs) lands in ONE
    * aggregation buffer here, where the join form spread its m²/2
    * candidate rows across tasks — the uncapped exact form is O(m²) in
    * EITHER shape and is the oracle pin, not the 100 TB path; dirty
    * corpora use `maxPostingList` (the capped branch keeps the join
    * form, whose recount machinery needs the exploded relations) or
    * [[jaccardPairsPrefix]], which bounds prefix-join fan-out with
    * exactness intact.
    */
  private def jaccardPairsUncapped(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // explode(array(...)) is a GENERATE BARRIER: the distinct-shingle
    // array must become a real (Generate-output) column before size()
    // and explode() read it twice — an intermediate Project would be
    // CollapseProject-merged into the tokens projection, inlining
    // tokens(text) into the shingles lambda and re-tokenizing per
    // element (the TextOps.shingles trap; measured 18× on this base)
    val sh = df
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"doc_id",
        explode(array(
          array_distinct(TextOps.shingles($"toks", shingleLen)))).as("arr"))
      .select($"doc_id", size($"arr").cast("long").as("n"),
        explode($"arr").as("sh"))
    // Pair expansion stays CODEGEN'D: two Generates + a Slice (all
    // whole-stage-codegen expressions), NOT array higher-order functions
    // — flatten(transform(transform(...))) computes the identical pair
    // array but HOFs are CodegenFallback, and the interpreted per-element
    // cost measured 2-3× slower than the whole original join form.
    // Position i pairs with every later element; (i, j>i) hits each
    // unordered pair exactly once, and the projection canonicalizes to
    // a_id < b_id (a doc appears at most once per posting list, so the
    // comparison is strict).
    val pairs = sh.groupBy($"sh")
      .agg(collect_list(struct($"doc_id", $"n")).as("ps"))
      .filter(size($"ps") > 1)
      .select($"ps", posexplode($"ps").as(Seq("i", "x")))
      .select($"x", explode(slice($"ps", $"i" + lit(2), size($"ps"))).as("y"))
      .select(when($"x.doc_id" < $"y.doc_id", struct($"x".as("a"), $"y".as("b")))
        .otherwise(struct($"y".as("a"), $"x".as("b"))).as("p"))
      .groupBy($"p.a.doc_id".as("a_id"), $"p.b.doc_id".as("b_id"),
        $"p.a.n".as("na"), $"p.b.n".as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
    // the jaccardPairs contract: eagerly materialized and cached, caller
    // owns the result's unpersist; no internal caches to release here —
    // nothing upstream is read twice
    materializeAndRelease(pairs, Nil)
  }

  /** Candidate-pair broadcast gate for the exact-verification tails: the
    * pair relation arrives PERSISTED (so its generating join runs once —
    * the measuring count and the verify join share the blocks), is
    * counted, and broadcasts only under [[BroadcastGate]]. Past the gate
    * the hint is dropped and the verify join degrades to the id-keyed
    * shuffle form — slower, but it completes where a forced broadcast
    * build fails (the forced form's measured headroom: 11.1M pairs,
    * 255 s, 8g heap; a past-headroom corpus used to die loudly there).
    * The degrade is safe precisely because these joins are keyed on pair
    * ids on BOTH sides — unlike the vector path's candidate-mass join
    * (SimilaritySearch gate note), nothing un-deduped reaches a sort.
    *
    * Width comes from the SCHEMA, not a hard-coded two-long guess
    * (id columns are arbitrary-typed — string ids are first-class on
    * the blocked paths, and long string ids under a 48 B/row assumption
    * could push an over-gate relation into a forced broadcast): 16 B
    * row header/padding + 8 B per field slot + fixed-type payloads,
    * with variable-length columns contributing their measured byte
    * totals — summed in the SAME job that counts the rows, so the
    * measuring pass (which doubles as the cache materialization the
    * verify join shares) stays a single job. The (bigint, bigint) pair
    * shape resolves to the previous 48 B/row exactly.
    */
  private def gatedPairs(cand: DataFrame): DataFrame =
    BroadcastGate.gated(cand, pairRelationBytes(cand))

  /** The measuring job behind [[gatedPairs]], package-visible so the
    * width arithmetic is spec-pinnable on its own: one aggregate over
    * the (persisted) pair relation returning its estimated broadcast
    * bytes.
    */
  private[graft] def pairRelationBytes(cand: DataFrame): Long = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val fields = cand.schema.fields
    val isVar = fields.map(f =>
      f.dataType == StringType || f.dataType == BinaryType)
    val fixedPerRow = 16L + fields.zip(isVar).map { case (f, v) =>
      8L + (if (v) 0L else f.dataType.defaultSize.toLong)
    }.sum
    val varCols = fields.zip(isVar).collect { case (f, true) => f.name }.toSeq
    val aggs = count(lit(1)) +:
      varCols.map(c => coalesce(sum(octet_length(col(c))), lit(0L)))
    val r = cand.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getLong(0)
    val varBytes = varCols.indices.map(i => r.getLong(i + 1)).sum
    rows * fixedPerRow + varBytes
  }

  /** Eagerly materialize `result` into the cache, then release the plan's
    * internally-persisted intermediates — they have served their (single
    * materializing) job and must not outlive the call in a long-lived
    * session. Lineage is preserved: if the result's blocks are later
    * dropped (external `clearCache`, executor loss) the plan recomputes
    * correctly, paying uncached-intermediate cost. The caller owns the
    * result's release (`unpersist()`), mirroring [[MinhashIndex]]'s
    * caller-owns-release contract.
    */
  private def materializeAndRelease(
      result: DataFrame, intermediates: Seq[DataFrame]): DataFrame = {
    val out = result.persist()
    try out.count()
    catch {
      // a failed materializing job (executor loss, cancellation) means
      // the caller never receives `out` — release its registration too,
      // or every failed attempt strands one cache entry
      case e: Throwable => out.unpersist(blocking = false); throw e
    } finally intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  // release-on-failure for the job-running build regions below — shared
  // with the vector twin's pipelines
  private def releasingOnFailure[T](caches: => Seq[DataFrame])(body: => T): T =
    BroadcastGate.releasingOnFailure(caches)(body)

  /** EXACT n-gram-Jaccard near-dup pairs via PREFIX FILTERING — the
    * All-Pairs / PPJoin candidate-generation scheme (Bayardo et al.,
    * "Scaling up all pairs similarity search", WWW 2007; Xiao et al.,
    * "Efficient similarity joins for near duplicate detection", WWW 2008;
    * the distributed formulation follows Vernica et al., "Efficient
    * parallel set-similarity joins using MapReduce", SIGMOD 2010).
    *
    * Same result set as uncapped [[jaccardPairs]] (provably — no recall
    * knob), but candidate generation joins only each document's PREFIX
    * under a global rarest-first token order instead of its full posting
    * lists. Two documents x, y with J(x,y) ≥ t share ≥ ⌈t·|x|⌉ tokens, so
    * if y misses ALL of x's first |x| − ⌈t·|x|⌉ + 1 tokens it cannot reach
    * the threshold (prefix-filter lemma, Chaudhuri et al. ICDE 2006).
    * Ordering by ascending document frequency puts boilerplate shingles in
    * the suffixes — which are never joined on — so the m²-per-hot-shingle
    * posting-list bomb that [[jaccardPairs]] needs `maxPostingList` for
    * simply cannot arise here, WITHOUT giving up exactness. Candidates
    * also pass the length filter t·max(|x|,|y|) ≤ min(|x|,|y|) before
    * exact verification over the full shingle relation.
    *
    * Scale shape: one shuffle on doc_id for the per-doc prefix window
    * (each window is one document's shingles — bounded by doc length,
    * never skewed), one shuffle on PREFIX shingle for candidates (df-skew
    * structurally damped: a shingle in k prefixes of n docs needs k docs
    * that all rank it in their rarest ~(1−t) fraction), then a
    * candidate-restricted verification that attaches each side's cached
    * distinct-shingle ARRAY and computes |x∩y| map-side via
    * array_intersect — no exploded-relation re-scan, no per-pair count
    * aggregate. Prefix positions are computed per-document, so no global
    * rank structure is ever built or broadcast.
    *
    * When to use which (measured at sf0.1, round 6): on a CLEAN corpus
    * the uncapped [[jaccardPairs]] wins slightly (5.3 s vs 5.9 s here) —
    * its posting-list join computes intersections in the candidate pass,
    * while this form pays df-ranking plus a separate verification tail.
    * On a boilerplate-heavy corpus the ordering inverts hard:
    * [[jaccardPairs]]'s hot posting lists expand quadratically (and its
    * `maxPostingList` escape hatch costs recall), whereas prefixes here
    * exclude hot shingles BY ORDER with exactness intact. Reach for this
    * form exactly when you would otherwise need `maxPostingList`.
    *
    * @return (a_id, b_id, jaccard) with a_id < b_id — EAGERLY
    *         materialized and cached under the [[jaccardPairs]] contract
    *         (internal caches released before returning; the caller owns
    *         the result's `unpersist()`)
    */
  def jaccardPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Per-doc DISTINCT SHINGLE SET — one array row per document,
    // persisted. This is the relation every stage reads: the candidate
    // chain explodes it once, and the verification tail intersects the
    // arrays directly. (The previous form persisted the full exploded
    // (doc, n, sh, df) relation — every shingle string duplicated into
    // its own row with per-row overhead — and re-scanned it twice in
    // verification; the array form stores the same strings once per doc
    // and makes verification a map-side set intersection, §2.3 "shuffle
    // keys and metadata instead of payloads".) explode(array(...)) is
    // the generate barrier that keeps CollapseProject from inlining
    // tokens(text) into the shingles lambda and re-tokenizing per
    // element (the TextOps.shingles trap; measured 18×).
    // the set is stored SORTED: verification counts |x∩y| with a
    // single codegen'd merge pass over the two sorted arrays
    // ([[graft.functions.SortedIntersectCount]]) — `array_intersect`
    // is CodegenFallback and allocates a hash set per call, which
    // measured 4.2 s on this tail at sf0.1 vs sub-second for the merge
    val docSets = df
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"doc_id",
        explode(array(array_sort(
          array_distinct(TextOps.shingles($"toks", shingleLen))))).as("set"))
      .select($"doc_id", size($"set").cast("long").as("n"), $"set")
      .persist()
    // Document frequency as ONE window over the shingle partition
    // (replaces the groupBy(sh) aggregate + join-back pair — two
    // exchanges of the exploded relation — with a single exchange; the
    // window SORT spills gracefully where a posting-list aggregate's
    // buffer would not, and this stage runs BEFORE prefix filtering has
    // damped boilerplate, so spill-safety matters here). Un-persisted:
    // the candidate chain is now its only consumer.
    val withDf = docSets
      .select($"doc_id", $"n", explode($"set").as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"sh")))
    // Global total order: (df asc, shingle asc) — deterministic, shared by
    // every document, rarest first. Positions are assigned WITHIN each
    // document by a window over that order; the prefix-filter lemma needs
    // positions over the document's FULL token set, so df==1 singletons
    // keep their slots here (they shorten the effective prefix — pure
    // win) and are dropped only from the candidate input below (df==1
    // cannot match anything, so dropping them generates no false
    // negatives).
    val ranked = withDf
      .withColumn("pos",
        row_number().over(Window.partitionBy($"doc_id").orderBy($"df", $"sh")))
    // ⌈t·n⌉ via an epsilon-guard: fp noise must never ROUND UP an exact
    // integer t·n (that would shorten the prefix — the unsound direction);
    // overshooting downward only lengthens it (more candidates, still
    // exact).
    // Two prefix lengths per document (Xiao et al. 2008 §3.1): the
    // PROBING prefix n − ⌈t·n⌉ + 1 generates the rows, and the shorter
    // INDEXING prefix n − ⌈2t/(1+t)·n⌉ + 1 marks which of them can
    // represent the document as the SMALLER side of a pair. For a true
    // pair with nx ≤ ny, overlap ≥ ⌈t/(1+t)·(nx+ny)⌉ ≥ ⌈2t/(1+t)·nx⌉,
    // so the FIRST shared token in global order sits within x's
    // indexing prefix (and within y's probing prefix, via
    // overlap ≥ t·ny given the length filter) — a candidate row whose
    // smaller side matched only past its indexing prefix is provably
    // not a pair's first shared token and is pruned below. At t = 0.5
    // the indexing prefix is ~n/3 vs the probing ~n/2.
    val prefix = ranked
      .filter($"pos" <= $"n" - ceil($"n" * threshold - 1e-9) + 1)
      .filter($"df" > 1)
      .select($"doc_id", $"sh", $"n", $"pos",
        ($"pos" <= $"n" -
          ceil($"n" * (2 * threshold / (1 + threshold)) - 1e-9) + 1).as("idx"))
    // Candidate generation from ONE groupBy(prefix shingle) posting list,
    // pairs expanded with codegen'd Generates (the jaccardPairsUncapped
    // shape — the self-join's two exchanges become one). The LENGTH
    // filter (J ≤ min/max ⇒ t·max ≤ min necessary) and the POSITIONAL
    // filter (PPJoin proper, Xiao et al. 2008 §3.2: tokens shared
    // besides this one all rank AFTER it in both docs, so overlap ≤
    // 1 + min(|x|−i, |y|−j), and J ≥ t needs overlap ≥ t/(1+t)·(|x|+|y|))
    // apply per expanded row — the same predicates the join form put in
    // its join condition, on the same values. Exactness is preserved
    // because a true pair's FIRST shared token always passes the
    // positional bound; rows failing it matched only on LATE prefix
    // tokens and are pruned before the pair aggregate.
    val cand = prefix.groupBy($"sh")
      .agg(collect_list(struct($"doc_id", $"n", $"pos", $"idx")).as("ps"))
      .filter(size($"ps") > 1)
      .select($"ps", posexplode($"ps").as(Seq("i", "x")))
      .select($"x", explode(slice($"ps", $"i" + lit(2), size($"ps"))).as("y"))
      .select(when($"x.doc_id" < $"y.doc_id", struct($"x".as("a"), $"y".as("b")))
        .otherwise(struct($"y".as("a"), $"x".as("b"))).as("p"))
      // indexing-prefix filter: the strictly smaller side's token must
      // lie within ITS indexing prefix (on ties either side may play
      // the smaller role, so either flag admits the row)
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
    // Verification: exact |x∩y| as a MAP-SIDE array_intersect over the
    // cached per-doc sets — the candidate relation broadcasts under the
    // [[gatedPairs]] size gate (candidates are the post-filter
    // survivors, bounded by the true pair count × a small factor, not
    // the quadratic candidate space; past the gate the hint drops and
    // both attach joins degrade to id-keyed shuffle joins, which
    // complete where a forced broadcast build would fail). Intersecting
    // the FULL sets is exact: a shingle in both sets has df ≥ 2 by
    // definition, so the df==1 mass the old exploded-relation recount
    // had to filter out contributes nothing here either, and the
    // carried na/nb are the full distinct counts so the denominator is
    // exact. vs the previous tail: two scans of the exploded relation,
    // a (b_id, sh) equi-join, and a per-pair count aggregate (one more
    // exchange) all collapse into two attach joins + one projection.
    // cand persists because the gate's measuring job and the attach
    // join share its blocks.
    val candP = cand.persist()
    releasingOnFailure(Seq(docSets, candP)) {
      val pairs = gatedPairs(candP)
        .join(docSets.select($"doc_id".as("a_id"), $"set".as("a_set")), "a_id")
        .join(docSets.select($"doc_id".as("b_id"), $"set".as("b_set")), "b_id")
        .withColumn("inter", graft.functions.SetOps.sortedIntersectCount(
          spark, $"a_set", $"b_set"))
        .withColumn("jaccard",
          $"inter".cast("double") / ($"na" + $"nb" - $"inter"))
        .filter($"jaccard" >= threshold)
        .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
      materializeAndRelease(pairs, Seq(docSets, candP))
    }
  }

  /** Incremental near-dup detection: EXACT n-gram-Jaccard pairs between a
    * NEW batch and an existing corpus — the production shape of dedup at
    * 100 TB. A daily increment is deduped against the standing corpus in
    * cost proportional to the BATCH's posting lists (the join streams the
    * corpus index past the batch's shingles), never re-self-joining the
    * corpus: [[jaccardPairs]] over corpus∪batch would redo the
    * corpus×corpus quadrant whose pairs are already known from previous
    * increments.
    *
    * The corpus-side exploded (doc, shingle) relation is the incremental
    * INDEX: in production it is a materialized table bucketed by shingle
    * hash ([[graft.sources.Bucketing]]), so the per-increment join is
    * co-located and the index grows by appending the increment's own
    * shingles after it passes. Within-batch duplicates are a separate
    * [[jaccardPairs]] over the (small) batch alone.
    *
    * Jaccard is exact over both documents' FULL distinct-shingle sets.
    * `maxPostingList` caps candidate generation by the COMBINED document
    * frequency (the skew defuse of [[jaccardPairs]]; verification still
    * recounts over full relations, so surviving pairs stay exact).
    *
    * @return (batch_id, corpus_id, jaccard), jaccard >= threshold —
    *         eagerly materialized with intermediates released, same
    *         contract as [[jaccardPairs]] (caller owns the result's
    *         `unpersist`).
    */
  def jaccardPairsAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.5,
      maxPostingList: Int = 0): DataFrame = {
    if (maxPostingList <= 0)
      return jaccardPairsAgainstUncapped(batch, corpus, idCol, textCol,
        shingleLen, threshold)
    val spark = batch.sparkSession
    import spark.implicits._
    def sh(df: DataFrame, idAs: String) = df
      .select(col(idCol).as(idAs), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idAs),
        explode(array_distinct(TextOps.shingles($"toks", shingleLen))).as("sh"))
    // both sides persisted: each feeds candidate generation, its size
    // aggregate, and (capped) the verification recount
    val bSh = sh(batch, "batch_id").persist()
    val cSh = sh(corpus, "corpus_id").persist()
    val bSizes = bSh.groupBy($"batch_id").agg(count(lit(1)).as("nb"))
    val cSizes = cSh.groupBy($"corpus_id").agg(count(lit(1)).as("nc"))
    // candidate pairs: one shared shingle suffices; the df cap bounds the
    // per-shingle expansion (df measured across BOTH sides — a shingle
    // hot in the corpus alone still fans out per batch occurrence).
    // Only the capped branch forces (and therefore persists) df2.
    var df2Persisted = false
    var plausibleP: DataFrame = null
    lazy val df2 = {
      df2Persisted = true
      bSh.select($"sh").union(cSh.select($"sh"))
        .groupBy($"sh").agg(count(lit(1)).as("df")).persist()
    }
    // ONE list for both release paths (failure guard + happy-path
    // materializeAndRelease); guards on df2Persisted so building the
    // list never forces the lazy cache
    def allCaches: Seq[DataFrame] = Seq(bSh, cSh) ++
      (if (df2Persisted) Seq(df2) else Nil) ++ Option(plausibleP)
    val (bCand, cCand) =
      if (maxPostingList > 0) {
        val ok = df2.filter($"df" <= maxPostingList).select($"sh")
        (bSh.join(ok, "sh"), cSh.join(ok, "sh"))
      } else (bSh, cSh)
    val candInter = bCand
      .join(cCand, "sh")
      .groupBy($"batch_id", $"corpus_id")
      .agg(count(lit(1)).as("inter"))
    // capped: recount intersections over the full relations so values
    // stay exact (uncapped, candidate intersections ARE exact — no
    // shingle was dropped), with jaccardPairs' two result-preserving
    // cuts: the upper-bound prune (coldInter + min(hotB, hotC) bounds
    // the true intersection, so below-threshold candidates never enter
    // the recount — kills the boilerplate candidate mass) and the
    // df > 1 recount restriction (a combined-df 1 shingle exists on one
    // side only and cannot intersect).
    releasingOnFailure(allCaches) {
      val inter =
        if (maxPostingList <= 0) candInter
        else {
          val hot = df2.filter($"df" > maxPostingList).select($"sh")
          val bHot = bSh.join(hot, "sh")
            .groupBy($"batch_id").agg(count(lit(1)).as("ha"))
          val cHot = cSh.join(hot, "sh")
            .groupBy($"corpus_id").agg(count(lit(1)).as("hb"))
          val plausible = candInter
            .join(bSizes, "batch_id").join(cSizes, "corpus_id")
            .join(bHot, Seq("batch_id"), "left")
            .join(cHot, Seq("corpus_id"), "left")
            .withColumn("imax", $"inter" +
              least(coalesce($"ha", lit(0L)), coalesce($"hb", lit(0L))))
            .filter($"imax".cast("double") /
              ($"nb" + $"nc" - $"imax") >= threshold)
            .select($"batch_id", $"corpus_id")
          val shared = df2.filter($"df" > 1).select($"sh")
          plausibleP = plausible.persist()
          gatedPairs(plausibleP)
            .join(bSh.join(shared, "sh"), "batch_id")
            .join(cSh.join(shared, "sh"), Seq("corpus_id", "sh"))
            .groupBy($"batch_id", $"corpus_id").agg(count(lit(1)).as("inter"))
        }
      val pairs = inter
        .join(bSizes, "batch_id")
        .join(cSizes, "corpus_id")
        .withColumn("jaccard",
          $"inter".cast("double") / ($"nb" + $"nc" - $"inter"))
        .filter($"jaccard" >= threshold)
        .select($"batch_id", $"corpus_id", round($"jaccard", 4).as("jaccard"))
      materializeAndRelease(pairs, allCaches)
    }
  }

  /** The UNCAPPED exact path of [[jaccardPairsAgainst]] as a posting-list
    * pipeline (the [[jaccardPairsUncapped]] treatment on the incremental
    * shape): per-side distinct-shingle counts are computed MAP-SIDE and
    * carried through the explode (no size aggregates, no size
    * join-backs), and the batch×corpus candidate join becomes ONE
    * groupBy(shingle) that collects the two sides' posting lists and
    * cross-expands them map-side. Shingles present on one side only die
    * in place (`size(bs) > 0 && size(cs) > 0`) — the same pruning the
    * join achieved, without shuffling each side into a separate join
    * exchange. Result set and jaccard values are identical: each shared
    * shingle contributes exactly one expanded (batch, corpus) row, so
    * the pair count is the exact cross-side intersection.
    */
  private def jaccardPairsAgainstUncapped(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    // generate-barrier explode(array(...)) as in [[jaccardPairsUncapped]]
    def sh(df: DataFrame, isBatch: Boolean) = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"id",
        explode(array(
          array_distinct(TextOps.shingles($"toks", shingleLen)))).as("arr"))
      .select(struct($"id", size($"arr").cast("long").as("n")).as("e"),
        explode($"arr").as("sh"))
      .select($"sh", $"e", lit(isBatch).as("isB"))
    val tagged = sh(batch, isBatch = true)
      .unionAll(sh(corpus, isBatch = false))
    // collect_list skips nulls, so each side's list holds only its own
    // (id, n) structs
    // cross expansion through two codegen'd Generates (explode × explode),
    // not HOFs — the jaccardPairsUncapped CodegenFallback lesson
    val crossed = tagged.groupBy($"sh")
      .agg(collect_list(when($"isB", $"e")).as("bs"),
        collect_list(when(!$"isB", $"e")).as("cs"))
      .filter(size($"bs") > 0 && size($"cs") > 0)
      .select($"cs", explode($"bs").as("b"))
      .select($"b", explode($"cs").as("c"))
    val pairs = crossed
      .groupBy($"b.id".as("batch_id"), $"c.id".as("corpus_id"),
        $"b.n".as("nb"), $"c.n".as("nc"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        $"inter".cast("double") / ($"nb" + $"nc" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"batch_id", $"corpus_id", round($"jaccard", 4).as("jaccard"))
    materializeAndRelease(pairs, Nil)
  }

  /** Incremental MinHash-LSH: near-dup pairs between a new batch and the
    * corpus via band buckets — [[jaccardPairsAgainst]]'s scale twin, the
    * q24↔q27 pattern applied to the incremental shape. Candidates arise
    * only where a batch band bucket meets a corpus band bucket (the
    * banded corpus signature table is the persistent index in
    * production; signatures are per-doc, so the increment never changes
    * corpus signatures), then exact-Jaccard verification over the two
    * exploded shingle relations — identical hash family to
    * [[minhashPairs]], so a doc's signature is the same whether computed
    * incrementally or in a full run.
    *
    * @return (batch_id, corpus_id, jaccard), verified >= threshold
    */
  def minhashPairsAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      maxBucketSize: Int = 0): DataFrame =
    // persist = false: this one-shot convenience has no release point for
    // a cached index (the result is lazy); callers probing repeatedly
    // build a [[minhashIndex]] themselves and release it when done
    minhashPairsAgainstIndex(batch,
      minhashIndex(corpus, idCol, textCol, shingleLen, bands, rowsPerBand,
        persist = false),
      idCol, textCol, threshold, maxBucketSize)

  /** The standing MinHash index over a corpus: the persisted exploded
    * shingle-hash relation (exact verification reads it) and the banded
    * signature table (candidate probes read it). Built ONCE and reused
    * across increments — in production both live as tables bucketed by
    * their join keys ((band, bucket) / (corpus_id, h)), and GROW by
    * appending each accepted increment's own rows after it passes, so
    * per-increment cost never includes re-indexing the corpus. Signatures
    * are per-doc, so appending an increment never changes existing rows.
    */
  final case class MinhashIndex private[operators] (
      shingleHashes: DataFrame, // (corpus_id, h)
      bands: DataFrame, // (corpus_id, band, bucket)
      sizes: DataFrame, // (corpus_id, nc) — distinct-shingle count per doc
      bucketCounts: DataFrame, // (band, bucket, population)
      numBands: Int,
      rowsPerBand: Int,
      shingleLen: Int) {
    /** Materialize the persisted relations (e.g. before timing probes). */
    def build(): this.type =
      // self-release on failure: fluent `minhashIndex(...).build()`
      // callers never receive the reference, so nothing else could
      // unpersist it
      BroadcastGate.releasingOnFailure(
        Seq(shingleHashes, bands, sizes, bucketCounts)) {
        shingleHashes.count(); bands.count(); sizes.count()
        bucketCounts.count(); this
      }
    def unpersist(): Unit = {
      shingleHashes.unpersist(blocking = false)
      bands.unpersist(blocking = false)
      sizes.unpersist(blocking = false)
      bucketCounts.unpersist(blocking = false)
    }
    /** Self-heal the caches (the [[SimilaritySearch.IvfPqIndex]]
      * `ensureCached` pattern): a bench teardown or external clearCache
      * that dropped the blocks also dropped the persist REGISTRATIONS,
      * after which every probe recomputes the corpus shingle relation
      * once per consumer — re-mark them so the next action rebuilds the
      * cache instead.
      */
    def ensureCached(): this.type = {
      Seq(shingleHashes, bands, sizes, bucketCounts).foreach { df =>
        if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          df.persist()
      }
      this
    }
  }

  private def shingleHashRelation(
      df: DataFrame, idCol: String, idAs: String, textCol: String,
      shingleLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as(idAs), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idAs),
        explode(array_distinct(TextOps.shingles($"toks", shingleLen))).as("sh"))
      .select(col(idAs), xxhash64($"sh").as("h"))
  }

  private def bandRelation(
      ex: DataFrame, idAs: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val spark = ex.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), $"h")).as(s"mh$i"))
    ex.groupBy(col(idAs)).agg(sigCols.head, sigCols.tail: _*)
      .select(col(idAs),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
      .select(col(idAs),
        posexplode(lshBands($"sig", bands, rowsPerBand)).as(Seq("band", "bucket")))
  }

  /** Build the standing [[MinhashIndex]] for a corpus. With
    * `persist = true` (default) the relations are cached for reuse across
    * probes — the caller owns the release ([[MinhashIndex.unpersist]]).
    * `persist = false` is the ONE-SHOT form: nothing is cached (no
    * release obligation), at the price of the corpus shingle relation
    * being recomputed by each of its consumers inside a single probe
    * plan.
    */
  def minhashIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      persist: Boolean = true): MinhashIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def cached(df: DataFrame): DataFrame = if (persist) df.persist() else df
    val cEx = cached(shingleHashRelation(corpus, idCol, "corpus_id", textCol,
      shingleLen))
    val cBand = cached(bandRelation(cEx, "corpus_id", bands, rowsPerBand))
    val cSizes = cached(cEx.groupBy($"corpus_id").agg(count(lit(1)).as("nc")))
    val cBuckets = cached(cBand.groupBy($"band", $"bucket")
      .agg(count(lit(1)).as("population")))
    MinhashIndex(cEx, cBand, cSizes, cBuckets, bands, rowsPerBand, shingleLen)
  }

  /** Persist a [[MinhashIndex]] as parquet tables — the DURABLE form of
    * the standing index: a daily dedup pipeline builds it once, then each
    * increment probes the loaded index and, once accepted, appends its
    * own rows ([[appendToMinhashIndex]]) — no driver ever re-indexes the
    * corpus. Bucket populations are stored as per-append PARTIAL counts
    * (append-only — an aggregated file could not be appended to); the
    * loader re-aggregates them, a relation of at most one row per
    * (append, band, bucket). At cluster scale the shingle and band
    * tables would be written `bucketBy(corpus_id)` / `(band, bucket)` so
    * probe joins are co-located; plain parquet keeps the sandbox path
    * simple.
    */
  def saveMinhashIndex(index: MinhashIndex, path: String): Unit = {
    index.shingleHashes.write.mode("overwrite")
      .parquet(s"$path/shingles/append=base")
    index.bands.write.mode("overwrite").parquet(s"$path/bands/append=base")
    index.sizes.write.mode("overwrite").parquet(s"$path/sizes/append=base")
    index.bucketCounts
      .select(col("band"), col("bucket"), col("population").as("partial"))
      .write.mode("overwrite").parquet(s"$path/bucket_counts/append=base")
    val meta = s"""{"numBands":${index.numBands},""" +
      s""""rowsPerBand":${index.rowsPerBand},"shingleLen":${index.shingleLen}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "index_meta.json"),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the manifest publishes LAST: a crash anywhere above leaves a
    // manifest-less (hence unloadable) index, never a torn-but-readable one
    DurableIndex.initManifest(path)
  }

  /** Load a durable [[MinhashIndex]] written by [[saveMinhashIndex]] /
    * grown by [[appendToMinhashIndex]]. Relations come back persisted;
    * partial bucket counts are re-aggregated on load.
    *
    * Visibility resolves from the [[DurableIndex]] manifest: only
    * manifest-committed appends are read, so a load concurrent with (or
    * after a crash of) an in-flight append sees the WHOLE prior index
    * and none of the increment — never bands without sizes.
    *
    * `pinId` (from [[DurableIndex.acquirePin]]) resolves visibility from
    * that pin's recorded snapshot instead, and the sweep holds the
    * snapshot's partitions for the pin's lease — take one when the scan
    * may outlive `tombstoneRetentionMs` of concurrent index maintenance.
    * Unpinned, the relations are persisted at load, so the exposure is
    * the first materialization (keep retention above it).
    */
  def loadMinhashIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      excludeAppends: Seq[String] = Nil,
      pinId: Option[String] = None): MinhashIndex = {
    import spark.implicits._
    val (numBands, rowsPerBand, shingleLen) = loadIndexMeta(path)
    // the append=<id> partition column is a durability artifact, not part
    // of the relations — used only to SELECT the manifest-committed
    // appends minus the caller's exclusions (a replaying increment must
    // not see its own prior partial append), then selected away.
    // Selection is partition pruning: unlisted appends' files are never
    // read.
    val vis = pinId
      .map(DurableIndex.pinnedVisible(path, _, excludeAppends))
      .getOrElse(DurableIndex.visible(path, excludeAppends))
    def part(sub: String): DataFrame =
      spark.read.parquet(s"$path/$sub").filter($"append".isin(vis: _*))
    val counts = part("bucket_counts")
      .groupBy($"band", $"bucket").agg(sum($"partial").as("population"))
    MinhashIndex(
      part("shingles").select($"corpus_id", $"h").persist(),
      part("bands").select($"corpus_id", $"band", $"bucket").persist(),
      part("sizes").select($"corpus_id", $"nc").persist(),
      counts.persist(),
      numBands, rowsPerBand, shingleLen)
  }

  /** Append an ACCEPTED increment's rows to a durable index — the write
    * half of the daily loop (probe first, then append what survives).
    * Signatures and buckets are pure per-doc functions of the same hash
    * family, so appending never rewrites existing rows; bucket counts
    * append as partials. Cost: one narrow pass over the batch.
    *
    * `appendId` names the increment's partition (`append=<id>`) and makes
    * the operation IDEMPOTENT: a replayed increment (streaming batch
    * redelivery, retried job) whose prior attempt fully committed is a
    * NO-OP (rewriting intact, manifest-visible partitions would
    * transiently empty them under a concurrent reader); one whose prior
    * attempt crashed overwrites partitions no reader could list.
    *
    * Atomicity: the four tables still WRITE sequentially, but none is
    * reader-visible until [[DurableIndex.commitAppend]] republishes the
    * manifest as the final step — an out-of-band [[loadMinhashIndex]]
    * at ANY instant (including after a crash between table writes) sees
    * either the whole increment or none of it, never bands without
    * sizes.
    */
  def appendToMinhashIndex(
      path: String,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      appendId: String,
      txn: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    requireAppendId(appendId)
    // the (app, seq) high-water catches replays even after the folded-id
    // record was pruned past the retention horizon (DurableIndex.hasTxn)
    if (DurableIndex.isCommitted(path, appendId) ||
        txn.exists { case (a, s) => DurableIndex.hasTxn(path, a, s) }) return
    // pre-flight the manifest invariant BEFORE any table write: appending
    // to a torn or pre-manifest index must fail loudly up front, not
    // fabricate a manifest that hides (then sweeps) legacy partitions
    DurableIndex.requireCommitted(path)
    val (numBands, rowsPerBand, shingleLen) = loadIndexMeta(path)
    val bEx = shingleHashRelation(batch, idCol, "corpus_id", textCol,
      shingleLen).persist()
    val bBand = bandRelation(bEx, "corpus_id", numBands, rowsPerBand).persist()
    // unpersist in finally: the caches are transient write-side state,
    // and a failed write (the appender retries — that is the overwrite
    // partition's whole point) must not strand them
    try {
      bEx.write.mode("overwrite").parquet(s"$path/shingles/append=$appendId")
      DurableIndex.seam("minhash:shingles-written")
      bBand.write.mode("overwrite").parquet(s"$path/bands/append=$appendId")
      DurableIndex.seam("minhash:bands-written")
      bEx.groupBy($"corpus_id").agg(count(lit(1)).as("nc"))
        .write.mode("overwrite").parquet(s"$path/sizes/append=$appendId")
      DurableIndex.seam("minhash:sizes-written")
      bBand.groupBy($"band", $"bucket").agg(count(lit(1)).as("partial"))
        .write.mode("overwrite")
        .parquet(s"$path/bucket_counts/append=$appendId")
    } finally {
      bEx.unpersist(blocking = false)
      bBand.unpersist(blocking = false)
    }
    DurableIndex.commitAppend(path, appendId, txn)
  }

  private[operators] def requireAppendId(appendId: String): Unit =
    require(appendId.nonEmpty && appendId != "base" &&
      appendId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"appendId must be a filesystem-safe token, got '$appendId'")

  private val minhashTables =
    Seq("shingles", "bands", "sizes", "bucket_counts")

  /** Compact a durable minhash index: fold the committed append HISTORY
    * into one fresh `base-<runId>` partition per table, so a perpetual
    * incremental stream keeps O(1) partitions (and manifest entries)
    * instead of one per micro-batch — the lake-compaction discipline
    * applied to the index. Returns the number of appends folded (0 =
    * nothing worth folding).
    *
    * The NEWEST append is deliberately KEPT unfolded: under the
    * streaming contract at most the latest batch can be redelivered
    * after a crash, and its replay must still be able to exclude its own
    * append when probing ([[loadMinhashIndex]]'s excludeAppends) — an
    * exclusion that cannot prune rows already merged into a folded base.
    * Folded ids are recorded in the manifest, so a LATE retry of an
    * older increment no-ops instead of double-appending rows the base
    * already holds.
    *
    * Crash-safe and reader-safe like every other maintenance pass here:
    * folded partitions are invisible until [[DurableIndex.commitFold]]
    * atomically republishes the manifest (a crash leaves orphans no
    * reader lists); superseded partitions stay on disk for
    * `tombstoneRetentionMs` (readers that pinned the pre-fold manifest
    * keep scanning intact files) and are deleted by a LATER compaction's
    * sweep. Single maintenance caller: run from the owning writer,
    * quiescent between appends — commitFold fails loudly if the manifest
    * moved mid-fold.
    */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, tombstoneRetentionMs: Long = 10L * 60L * 1000L): Int = {
    import spark.implicits._
    val appends = DurableIndex.visible(path, Nil)
    DurableIndex.sweepUnreferenced(path, minhashTables, tombstoneRetentionMs)
    // the sweep deletes files with raw IO, which Spark's session-level
    // file-status and cached-plan caches cannot see — drop them, or a
    // later same-session read can plan against a stale listing and hit
    // FAILED_READ on the swept files
    spark.catalog.refreshByPath(path)
    if (appends.size <= 2) return 0 // base (+ newest): nothing to fold
    val kept = Seq(appends.last)
    val toFold = appends.dropRight(1)
    val newId = s"base-${java.util.UUID.randomUUID().toString.take(8)}"
    def part(sub: String): DataFrame =
      spark.read.parquet(s"$path/$sub").filter($"append".isin(toFold: _*))
    part("shingles").select($"corpus_id", $"h")
      .write.mode("overwrite").parquet(s"$path/shingles/append=$newId")
    part("bands").select($"corpus_id", $"band", $"bucket")
      .write.mode("overwrite").parquet(s"$path/bands/append=$newId")
    part("sizes").select($"corpus_id", $"nc")
      .write.mode("overwrite").parquet(s"$path/sizes/append=$newId")
    part("bucket_counts")
      .groupBy($"band", $"bucket").agg(sum($"partial").as("partial"))
      .write.mode("overwrite").parquet(s"$path/bucket_counts/append=$newId")
    DurableIndex.seam("minhash:fold-written")
    DurableIndex.commitFold(path, appends, newId, kept, minhashTables)
    toFold.size
  }

  /** Persist a verified near-dup PAIR SET as a durable parquet table —
    * the cluster pipeline's second piece of standing state (the first is
    * the minhash index). Cold cluster formation over a large corpus is
    * otherwise pairs-rebuild + CC rounds; with the pair table on disk it
    * is read-parquet + CC rounds — probe-shaped, like everything else in
    * the incremental loop. Schema passes through unchanged, so the same
    * table works for (a_id, b_id, jaccard) text pairs and
    * (a_id, b_id, cosine) embedding pairs.
    */
  def savePairs(pairs: DataFrame, path: String): Unit = {
    pairs.write.mode("overwrite").parquet(s"$path/append=base")
    DurableIndex.initManifest(path)
  }

  /** Append an increment's pairs (batch-vs-corpus + within-batch) under
    * an `append=<id>` partition — same manifest-committed idempotent
    * contract as [[appendToMinhashIndex]] (one table here, so the
    * manifest additionally shields readers from a partially
    * job-committed parquet write).
    */
  def appendPairs(path: String, pairs: DataFrame, appendId: String,
      txn: Option[(String, Long)] = None): Unit = {
    requireAppendId(appendId)
    if (DurableIndex.isCommitted(path, appendId) ||
        txn.exists { case (a, s) => DurableIndex.hasTxn(path, a, s) }) return
    // pre-flight BEFORE writing, as in the index appends — but the pair
    // table supports create-by-append (the streaming loop's first batch
    // creates it; there is no savePairs bootstrap step), so a truly
    // empty root initializes an empty manifest instead of failing
    DurableIndex.requireCommittedOrInit(path, Seq(""))
    pairs.write.mode("overwrite").parquet(s"$path/append=$appendId")
    DurableIndex.commitAppend(path, appendId, txn)
  }

  /** Compact the durable pair table — [[compactMinhashIndex]]'s contract
    * (fold history, keep the newest append, manifest-committed,
    * retention-deferred deletion) applied to its single relation.
    */
  def compactPairs(spark: org.apache.spark.sql.SparkSession, path: String,
      tombstoneRetentionMs: Long = 10L * 60L * 1000L): Int = {
    val appends = DurableIndex.visible(path, Nil)
    DurableIndex.sweepUnreferenced(path, Seq(""), tombstoneRetentionMs)
    spark.catalog.refreshByPath(path) // see compactMinhashIndex
    if (appends.size <= 2) return 0
    val kept = Seq(appends.last)
    val toFold = appends.dropRight(1)
    val newId = s"base-${java.util.UUID.randomUUID().toString.take(8)}"
    spark.read.parquet(path)
      .filter(col("append").isin(toFold: _*)).drop("append")
      .write.mode("overwrite").parquet(s"$path/append=$newId")
    DurableIndex.seam("pairs:fold-written")
    DurableIndex.commitFold(path, appends, newId, kept, Seq(""))
    toFold.size
  }

  /** Load the durable pair table: the manifest-committed appends minus
    * `excludeAppends` (replay safety, as in [[loadMinhashIndex]]).
    */
  def loadPairs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      excludeAppends: Seq[String] = Nil,
      pinId: Option[String] = None): DataFrame = {
    val vis = pinId
      .map(DurableIndex.pinnedVisible(path, _, excludeAppends))
      .getOrElse(DurableIndex.visible(path, excludeAppends))
    spark.read.parquet(path)
      .filter(col("append").isin(vis: _*))
      .drop("append")
  }

  private def loadIndexMeta(path: String): (Int, Int, Int) = {
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "index_meta.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    def metaInt(key: String): Int =
      s""""$key":(\\d+)""".r.findFirstMatchIn(meta)
        .getOrElse(sys.error(s"index_meta.json missing $key")).group(1).toInt
    (metaInt("numBands"), metaInt("rowsPerBand"), metaInt("shingleLen"))
  }

  /** Probe a standing [[MinhashIndex]] with a new batch — the steady-state
    * increment cost: shingle + sign + band the BATCH, bucket-join its
    * bands against the index, exact-verify candidates. Nothing here is
    * proportional to corpus size except the (pre-built, co-located-in-
    * production) index joins themselves.
    */
  def minhashPairsAgainstIndex(
      batch: DataFrame,
      index: MinhashIndex,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5,
      maxBucketSize: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    // NOT persisted: referenced twice in one plan (banding,
    // verification), but an increment is small by definition — the
    // bounded recompute beats a cached relation with no release path,
    // which would leak one persisted DataFrame per micro-batch in the
    // streaming caller. The batch's distinct-shingle count `nb` is
    // computed MAP-SIDE (generate-barrier, the jaccardPairsUncapped
    // shape) and carried through banding and candidates — no separate
    // size aggregate, no size join-back.
    val bEx = batch
      .select(col(idCol).as("batch_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select($"batch_id",
        explode(array(
          array_distinct(TextOps.shingles($"toks", index.shingleLen)))).as("arr"))
      .select($"batch_id", size($"arr").cast("long").as("nb"),
        explode($"arr").as("sh"))
      .select($"batch_id", $"nb", xxhash64($"sh").as("h"))
    val numHashes = index.numBands * index.rowsPerBand
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), $"h")).as(s"mh$i"))
    val bBand = bEx.groupBy($"batch_id", $"nb")
      .agg(sigCols.head, sigCols.tail: _*)
      .select($"batch_id", $"nb",
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
      .select($"batch_id", $"nb",
        posexplode(lshBands($"sig", index.numBands, index.rowsPerBand))
          .as(Seq("band", "bucket")))
    val cBand = index.bands
    val cEx = index.shingleHashes
    // cap by CORPUS bucket population — precomputed in the index and
    // applied to the BATCH side: hot buckets are by construction few, so
    // the filter is a broadcast anti join over the (tiny) batch bands
    val bCapped =
      if (maxBucketSize > 0) {
        val hot = index.bucketCounts
          .filter($"population" > maxBucketSize).select($"band", $"bucket")
        bBand.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      } else bBand
    // the BATCH bands broadcast (an increment is small by definition):
    // candidate generation is then a map-side hash probe streaming over
    // the corpus band index — the standing corpus is never shuffled
    val cand = cBand
      .join(broadcast(bCapped), Seq("band", "bucket"))
      .groupBy($"batch_id", $"corpus_id", $"nb").agg(lit(1))
      .select($"batch_id", $"corpus_id", $"nb")
    // verification reads ONLY candidate corpus docs' shingles: the
    // broadcast semi-join restricts the corpus relation before the big
    // (corpus_id, h) equi-join, so a mostly-novel increment never
    // shuffles the standing corpus's shingles (in production, with the
    // index bucketed on corpus_id, this prunes the scan itself)
    val cExCand = cEx.join(broadcast(cand.select($"corpus_id").distinct()),
      "corpus_id")
    // equi-join on BOTH (corpus_id, h): each surviving row IS one shared
    // shingle hash — joining on corpus_id alone would cross the batch
    // doc's shingles with the corpus doc's before filtering.
    // Deliberately NOT [[gatedPairs]]-gated: cand is bounded by the
    // increment (batch × matches), small by this function's contract —
    // a persist+count per micro-batch would cost the streaming caller
    // more than the gate guards, and the failure mode past the contract
    // is the loud broadcast-build error, not a silent spill.
    val inter = broadcast(cand)
      .join(bEx.select($"batch_id", $"h"), "batch_id")
      .join(cExCand, Seq("corpus_id", "h"))
      .groupBy($"batch_id", $"corpus_id", $"nb")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(index.sizes, "corpus_id")
      .withColumn("jaccard",
        $"inter".cast("double") / ($"nb" + $"nc" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"batch_id", $"corpus_id", round($"jaccard", 4).as("jaccard"))
  }

  /** 64-bit SimHash of a token array: bit b is set when the sum over tokens
    * of ±1 (sign of bit b of xxhash64(token)) is positive. Each token is
    * hashed exactly once; the 64 bit-votes then walk the (cheap) long
    * array, not the string array.
    */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, tk => xxhash64(tk))
    val bitCols = transform(sequence(lit(0), lit(63)), b => {
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, b)
          .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    aggregate(bitCols, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash signatures via the scalable explode formulation: one string
    * hash per token occurrence, then bit-sliced vote accumulation per doc
    * (one shuffle on id).
    *
    * Bit-slicing: the 64 per-bit ±1 vote sums reduce to per-bit ONES
    * counts (vote_b = 2·ones_b − n, so vote_b > 0 ⟺ 2·ones_b > n), and
    * the ones counts pack two-per-long into 32-bit lanes — 32 packed
    * long sums + one count instead of 64 conditional sums: a 2× smaller
    * aggregation buffer and branch-free per-row update inside codegen.
    * 32-bit lanes bound a doc at 2^31−1 token occurrences before the
    * high lane could reach the sign bit — unreachable in practice
    * (16-bit lanes would pack tighter but silently overflow a signed
    * long once a lane's count passed 32767).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select($"id", xxhash64($"tok").as("h"))
    // packed_k lane j (32 bits at offset 32j) counts tokens with sig bit
    // 2k+j set; a row contributes 0 or 1<<(32j) per lane
    val packed = (0 until 32).map { k =>
      sum((0 until 2).map { j =>
        shiftright($"h", 2 * k + j).bitwiseAND(lit(1L)) * lit(1L << (32 * j))
      }.reduce(_ + _)).as(s"p$k")
    }
    hashed.groupBy($"id")
      .agg(packed.head, (packed.tail :+ count(lit(1)).as("n")): _*)
      .select($"id",
        (0 until 64).map { b =>
          val ones = shiftright(col(s"p${b / 2}"), 32 * (b % 2))
            .bitwiseAND(lit(0xFFFFFFFFL))
          when(ones * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
        }.reduce((a, x) => a.bitwiseOR(x)).as("sig"))
  }

  /** Connected components over a near-dup pair relation — the cluster
    * step of a dedup pipeline: pairs say "same", components say "this
    * GROUP is one document", and min-id becomes the canonical survivor.
    *
    * Default algorithm: alternating large-star/small-star (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
    * in MapReduce and Beyond", SoCC 2014), which converges in
    * O(log² n) rounds regardless of component DIAMETER — a chain of
    * length d collapses in ~log d alternations where min-label
    * propagation ([[connectedComponentsLabelProp]]) needs d rounds, each
    * a full shuffle over the edge set. Near-dup graphs are usually
    * shallow, but one boilerplate chain is all it takes to stall the
    * propagation form at scale.
    *
    * Hybrid finish: once the (monotonically contracting) edge set fits
    * under `driverFinishEdges`, the remaining rounds collapse into ONE
    * bounded collect + driver union-find — distributed iteration exists
    * to shrink the problem, and paying scheduler/shuffle overhead per
    * round to converge a few-MB edge list is waste at any scale. The
    * default bound (2M edges ≈ 32 MB of longs) matches the repo's
    * documented driver-state budget (PQ codebook sample); pass 0 to
    * force pure distributed iteration (specs pinning round counts do).
    *
    * @param pairs (srcCol, dstCol) undirected edges
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 50,
      driverFinishEdges: Long = 2000000L): DataFrame =
    connectedComponentsStarWithRounds(
      pairs, srcCol, dstCol, maxIter, driverFinishEdges)._1

  /** Large-star/small-star CC with the round count exposed (spec hook:
    * the chain-graph case must converge in ~half the label-prop rounds).
    *
    * State: the CANONICAL edge list (a > b). Each round applies
    * large-star (hang every node's larger neighbors onto its min
    * neighbor) then small-star (hang every node's smaller-or-equal
    * neighbors onto its min neighbor); both preserve connectivity, and
    * the joint fixpoint is a depth-1 forest: every non-root holds
    * exactly the edge (node, componentMin).
    *
    * Per-node mins use groupBy+join (map-side partial aggregation),
    * NOT a window: as rounds progress component roots accumulate huge
    * degree, and a window would sort a root's entire neighborhood in
    * one task — the agg form partial-aggregates the min map-side and
    * leaves the (AQE-handled) join as the only skew point.
    *
    * Convergence: per-round (count, Σ xxhash64(a,b)) checksum equality
    * gates an EXACT set-equality check (`except` both ways) — the exact
    * check runs once at the candidate fixpoint, so rounds stay two
    * aggregates cheap while convergence itself is never probabilistic.
    */
  private[graft] def connectedComponentsStarWithRounds(
      pairs: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 50,
      driverFinishEdges: Long = 2000000L): (DataFrame, Int) =
    ccStarImpl(pairs, srcCol, dstCol, maxIter, driverFinishEdges,
      joinNodes = true)

  /** MAPPING-ONLY star CC: the (id, component) rows for non-root nodes
    * of real (a ≠ b) edges, WITHOUT the join against the full node
    * universe — roots and isolated/self-pair-only nodes are simply
    * absent. For a caller that left-joins the labels and coalesces to
    * the node's own id (the [[SimilaritySearch.semDedup]] shape) the
    * result is identical, and the node-universe relation — one more
    * full evaluation of the pairs plan inside the RESULT plan, the
    * expensive self-join for inline pair builders — never runs.
    */
  private[graft] def connectedComponentsMapping(
      pairs: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 50,
      driverFinishEdges: Long = 2000000L): DataFrame =
    ccStarImpl(pairs, srcCol, dstCol, maxIter, driverFinishEdges,
      joinNodes = false)._1

  private def ccStarImpl(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int,
      driverFinishEdges: Long,
      joinNodes: Boolean): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val raw = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // every node that appears at all (self-pairs included) gets a label
    // (evaluated only on the joinNodes path — Spark plans lazily, so the
    // mapping-only path never runs this extra pass over the pairs plan)
    val nodes = raw.select($"a".as("id")).union(raw.select($"b".as("id")))
      .distinct()
    def finish(mapping: DataFrame): DataFrame =
      if (joinNodes)
        nodes.join(mapping, Seq("id"), "left")
          .select($"id", coalesce($"__c", $"id").as("component"))
      else mapping.select($"id", $"__c".as("component"))
    val canonPlan = raw
      .select(greatest($"a", $"b").as("a"), least($"a", $"b").as("b"))
      .filter($"a" =!= $"b").distinct()

    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select($"a".as("u"), $"b".as("v"))
        .union(e.select($"b".as("u"), $"a".as("v")))
      val mins = bidir.groupBy($"u").agg(min($"v").as("mn"))
      // no distinct here: of each canonical edge's two bidir rows exactly
      // one passes v > u, so the pre-distinct output is ≤ |e| rows — a
      // whole shuffle per round bought only bounded duplicate removal
      // (smallStar's min-agg is duplicate-insensitive and the round
      // output gets the one distinct that set semantics actually need)
      bidir.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("a"), least($"mn", $"u").as("b"))
        .filter($"a" =!= $"b")
    }
    def smallStar(e: DataFrame): DataFrame = {
      // canonical rows already orient u = larger endpoint; both output
      // edges — (neighbor, min) and (u, min) — come from ONE pass over
      // the join via explode (a union of two selects would evaluate the
      // join twice: self-referenced subplans are not shared)
      val mins = e.groupBy($"a".as("u")).agg(min($"b").as("mn"))
      e.join(mins, $"a" === $"u")
        .select(explode(array(
          struct($"b".as("a"), $"mn".as("b")),
          struct($"a", $"mn".as("b")))).as("e"))
        .select($"e.a", $"e.b")
        .filter($"a" =!= $"b").distinct()
    }
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.select(count(lit(1)),
        coalesce(sum(xxhash64($"a", $"b").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    // Driver union-find over a bounded edge list: parent pointers always
    // run larger -> smaller (unions attach the larger root under the
    // smaller), so each tree's root IS the minimum id of its component —
    // identical labeling to the star fixpoint. Integral ids only (every
    // catalog caller uses long ids); other types iterate distributed.
    val idType = canonPlan.schema("a").dataType
    val integralIds = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    def unionFindLabels(edges: Array[(Long, Long)]): DataFrame = {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val mapping = edges.iterator
        .flatMap { case (a, b) => Iterator(a, b) }.toSet.iterator
        .map((id: Long) => (id, find(id))).toSeq
      val slices = math.max(1, mapping.length / 500000)
      spark.createDataset(spark.sparkContext.parallelize(mapping, slices))
        .toDF("id", "__c")
        .select($"id".cast(idType).as("id"), $"__c".cast(idType).as("__c"))
    }
    def driverUnionFind(e: DataFrame): DataFrame =
      unionFindLabels(e.select($"a".cast("long"), $"b".cast("long"))
        .as[(Long, Long)].collect())

    // opt-in per-round profile (System.property graft.cc.profile=1):
    // rounds are the whole cost of cluster queries, so regressions need
    // per-phase visibility without a debugger
    val profile = sys.props.get("graft.cc.profile").contains("1")

    // DIRECT driver finish: when ids are integral, probe the canonical
    // edge list with a BOUNDED collect (limit driverFinishEdges + 1 —
    // driver memory stays capped by construction) BEFORE starting the
    // distributed machinery. Near-dup graphs are pair-sparse, so this is
    // the common case, and it replaces three jobs (localCheckpoint
    // materialization, checksum, then the union-find collect) plus a
    // cached edge RDD with ONE collect job and no cache. Past the cap
    // the collected head is discarded and the star loop runs unchanged.
    // The probe runs against a PERSISTED canonPlan so the over-cap path
    // pays one materialization, not two (ADVICE r17): un-persisted, the
    // limit probe computed — and threw away — the full distinct, then
    // localCheckpoint recomputed it. Under the cap the probe is still a
    // single job; the partial cache is released as soon as the decision
    // is made (and on the over-cap path, after the checkpoint has
    // materialized from it).
    val probed = integralIds && driverFinishEdges > 0 &&
      driverFinishEdges < Int.MaxValue
    val canonP = if (probed) canonPlan.persist() else canonPlan
    if (probed) {
      val head =
        try canonP
          .select($"a".cast("long"), $"b".cast("long")).as[(Long, Long)]
          .limit(driverFinishEdges.toInt + 1).collect()
        catch { case e: Throwable =>
          canonP.unpersist(blocking = false); throw e
        }
      if (head.length <= driverFinishEdges) {
        canonP.unpersist(blocking = false)
        if (profile) System.err.println(
          s"[cc] direct driver-finish edges=${head.length}")
        return (finish(unionFindLabels(head)), 0)
      }
    }

    var canon =
      try canonP.localCheckpoint()
      finally if (probed) canonP.unpersist(blocking = false)
    var prev = checksum(canon)
    var converged = false
    var iter = 0
    var hybridLabels: Option[DataFrame] = None
    while (hybridLabels.isEmpty && !converged && iter < maxIter) {
      if (integralIds && driverFinishEdges > 0 && prev._1 <= driverFinishEdges) {
        val mapping = driverUnionFind(canon)
        freeLocalCheckpoint(canon)
        hybridLabels = Some(finish(mapping))
        if (profile) System.err.println(
          s"[cc] driver-finish at round $iter edges=${prev._1}")
      } else {
      // checkpoint the large-star intermediate: smallStar references it
      // twice (min agg + join) — unmaterialized it would evaluate the
      // whole large-star plan per reference. The round output checkpoints
      // LAZILY: the checksum action materializes it, so a round costs two
      // jobs (ls + checksum), not three. ls blocks are freed only AFTER
      // that materialization — a truncated-lineage checkpoint cannot be
      // recomputed, so unpersisting it while `next` is still un-built
      // would lose the round.
      val t0 = System.nanoTime()
      val ls = largeStar(canon).localCheckpoint()
      val t1 = System.nanoTime()
      val next = smallStar(ls).localCheckpoint(false)
      val sum = checksum(next)
      val t2 = System.nanoTime()
      freeLocalCheckpoint(ls)
      if (sum == prev &&
          next.except(canon).isEmpty && canon.except(next).isEmpty)
        converged = true
      prev = sum
      freeLocalCheckpoint(canon)
      canon = next
      iter += 1
      if (profile) System.err.println(
        f"[cc] round $iter ls=${(t1 - t0) / 1e9}%.3fs ss+sum=${(t2 - t1) / 1e9}%.3fs" +
          f" edges=${sum._1} converged=$converged")
      }
    }
    hybridLabels match {
      case Some(labels) => (labels, iter)
      case None =>
        if (!converged) sys.error(
          s"connectedComponents (star) did not converge in $maxIter rounds")
        // depth-1 forest: non-roots carry (id -> componentMin); roots (and
        // self-pair-only nodes) label themselves
        val mapping = canon.groupBy($"a".as("id")).agg(min($"b").as("__c"))
        (finish(mapping), iter)
    }
  }

  /** Min-label propagation CC — the simple O(diameter)-round variant,
    * kept as the reference implementation ([[connectedComponents]] is
    * spec-asserted equal to it): every node starts labeled with its own
    * id; each round takes the min of its own and its neighbors' labels.
    * Each round is one shuffle (join) + one aggregation, and labels are
    * `localCheckpoint`ed to truncate the exponentially-growing iterative
    * lineage — the standard guard for loop-shaped DataFrame algorithms.
    *
    * @param pairs (srcCol, dstCol) undirected edges
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponentsLabelProp(
      pairs: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 50): DataFrame =
    connectedComponentsLabelPropWithRounds(pairs, srcCol, dstCol, maxIter)._1

  private[graft] def connectedComponentsLabelPropWithRounds(
      pairs: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct().persist()
    var labels = edges.select($"src".as("id")).distinct()
      .select($"id", $"id".as("component")).localCheckpoint()
    // Convergence via the label-sum invariant: min-propagation only ever
    // DECREASES a label, so "some label changed" ⇔ "the sum strictly
    // dropped" — one narrow aggregate over the already-checkpointed
    // frame, replacing the prior per-round join-with-previous (a whole
    // extra shuffle). Decimal sum: immune to long overflow at any
    // (id magnitude × node count).
    // coalesce: sum() over an EMPTY labels frame is null — an empty pair
    // set (no duplicates found) must converge cleanly, not NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.select(coalesce(sum($"component".cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels, $"src" === $"id")
        .select($"dst".as("id"), $"component")
      val next = labels.union(viaNeighbor)
        .groupBy($"id").agg(min($"component").as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      // the previous round's checkpoint has had its last read — release
      // its blocks now, or executor storage grows O(iterations × |nodes|)
      freeLocalCheckpoint(labels)
      labels = next
      iter += 1
    }
    edges.unpersist()
    // a silent non-converged return would report one real component as
    // several clusters — fail loudly instead (diameter > maxIter means
    // the caller's graph is not near-dup-shaped; raise maxIter)
    if (!converged) sys.error(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter)")
    (labels, iter)
  }

  /** Release the cached blocks behind a `localCheckpoint`ed DataFrame.
    * `df.unpersist` only consults the CacheManager, which never saw a
    * checkpoint's RDD — the blocks live on the RDD itself, reachable
    * through the plan's LogicalRDD leaf.
    */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003) as
    * an exploded (id, fp) relation — the distributed form: char-n-gram
    * hashes posexplode to rows, and each full window of `w` consecutive
    * hashes contributes its minimum via a codegen'd running-min window
    * frame. One shuffle (on id) and WindowExec — NOT the array-HOF form
    * (`TextOps.winnowFromHashes`), whose nested lambdas fall out of
    * codegen into interpreted eval and re-hash the document per window
    * (measured minutes-vs-seconds at sf0.1). The HOF twin is kept for
    * column-level/ad-hoc use and spec-asserted equal to this one.
    *
    * Guarantee: any common substring of length >= w + n - 1 between two
    * docs yields a shared fingerprint; density ~2/(w+1) of n-gram count.
    * Docs shorter than a full window keep their global min (one fp).
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      w: Int = 4): DataFrame =
    winnowFingerprintsRaw(df, idCol, textCol, n, w)
      .select(col("id"), col("fp")).distinct()

  /** [[winnowFingerprints]] WITHOUT the trailing per-doc distinct — the
    * (id, fp) relation may repeat a fingerprint a document selected from
    * several windows. [[winnowPairs]] consumes this form and dedups
    * inside its posting-list aggregate (`collect_set`), saving the
    * distinct's whole-relation exchange.
    */
  private def winnowFingerprintsRaw(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(col(idCol).as("id"), TextOps.charNgrams(col(textCol), n).as("g"))
      .select($"id", posexplode(transform($"g", x => xxhash64(x))).as(Seq("pos", "h")))
    val byDoc = Window.partitionBy($"id")
    val winMin = min($"h").over(
      byDoc.orderBy($"pos").rowsBetween(Window.currentRow, w - 1))
    hashed
      .withColumn("cnt", count(lit(1)).over(byDoc))
      .withColumn("fp", winMin)
      // only FULL windows select fingerprints (positions 0..cnt-w); a doc
      // shorter than one window keeps its pos-0 (global) min
      .filter($"pos" <= greatest($"cnt" - w, lit(0)))
      .select($"id", $"fp")
  }

  /** Winnowing near-dup candidate pairs — the [[winnowFingerprints]]
    * posting-list self-join as a reusable operator (q51's pipeline):
    * pairs of docs sharing at least `minShared` fingerprints.
    *
    * Winnow minima are BIASED toward hot values (they are selected for
    * being small), so the posting-list cap matters more here than for
    * raw shingles: a boilerplate fingerprint shared by m docs forms an
    * m²/2 bucket.
    *
    * @param minShared minimum number of shared fingerprints for a pair
    * @param maxDf drop fingerprints whose document frequency exceeds
    *        this from candidate generation (0 = uncapped). df == 1
    *        fingerprints are always dropped (they cannot form a pair —
    *        provably result-preserving); the upper cap trades recall
    *        only on pairs whose EVERY shared fingerprint is ultra-common.
    * @return (a_id, b_id, shared_fps) with a_id < b_id
    */
  def winnowPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      w: Int = 8,
      minShared: Int = 3,
      maxDf: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Posting-list form (the jaccardPairsUncapped shape): ONE
    // groupBy(fp) replaces the previous distinct + df aggregate +
    // df join-back + self-join chain. collect_set dedups a doc's
    // repeated window minima (what the old .distinct() exchange did),
    // its size IS the fingerprint's document frequency (the cap and the
    // df > 1 prune become a filter on the grouped row), and pairs
    // expand map-side through codegen'd Generates. No persists: each
    // relation has exactly one consumer.
    val fp = winnowFingerprintsRaw(df, idCol, textCol, n, w)
    val posting = fp.groupBy($"fp").agg(collect_set($"id").as("ids"))
      .filter(size($"ids") > 1 &&
        (if (maxDf > 0) size($"ids") <= maxDf else lit(true)))
    posting
      .select($"ids", posexplode($"ids").as(Seq("i", "x")))
      .select($"x", explode(slice($"ids", $"i" + lit(2), size($"ids"))).as("y"))
      .select(least($"x", $"y").as("a_id"), greatest($"x", $"y").as("b_id"))
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("shared_fps"))
      .filter($"shared_fps" >= minShared)
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit chunks
    * (pigeonhole: any pair at Hamming distance <= 3 shares a chunk), then
    * verified with an exact `bit_count(xor) <= maxHamming` filter.
    *
    * @param maxBucketSize drop chunk buckets holding more than this many
    *        docs (0 = unlimited) — the same m²/2 skew bomb the minhash
    *        band buckets have: a template repeated m times puts all m in
    *        every chunk bucket, and at corpus scale a common 16-bit chunk
    *        value alone forms a quadratic bucket. Capping trades recall
    *        only on docs colliding with > cap others per chunk.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Posting-list candidates (the jaccardPairsUncapped shape): ONE
    // groupBy(chunk, chunkval) replaces the cap aggregate + join-back
    // and the two-sided chunk self-join; the signature relation now has
    // a single consumer, so its persist is gone too. Sigs ride the
    // posting-list structs, so no join back to the signature relation.
    val chunks = simhashSignatures(df, idCol, textCol)
      .select($"id", $"sig",
        posexplode(transform(sequence(lit(0), lit(3)),
          j => call_function("shiftright", $"sig", j * 16)
            .bitwiseAND(lit(0xFFFFL))))
          .as(Seq("chunk", "chunkval")))
    val posting = chunks.groupBy($"chunk", $"chunkval")
      .agg(collect_list(struct($"id", $"sig")).as("ps"))
      .filter(size($"ps") > 1 &&
        (if (maxBucketSize > 0) size($"ps") <= maxBucketSize else lit(true)))
    // Cross-chunk dedup as one hash aggregate (the minhashPairs pattern):
    // a pair sharing k of the 4 chunks reaches the aggregate k times but
    // is bit-counted ONCE, after dedup — not per duplicate expanded row
    // (min = the one value; a doc's sig is constant).
    posting
      .select($"ps", posexplode($"ps").as(Seq("i", "x")))
      .select($"x", explode(slice($"ps", $"i" + lit(2), size($"ps"))).as("y"))
      .select(when($"x.id" < $"y.id", struct($"x".as("a"), $"y".as("b")))
        .otherwise(struct($"y".as("a"), $"x".as("b"))).as("p"))
      .groupBy($"p.a.id".as("a_id"), $"p.b.id".as("b_id"))
      .agg(min($"p.a.sig").as("a_sig"), min($"p.b.sig").as("b_sig"))
      .select($"a_id", $"b_id",
        bit_count($"a_sig".bitwiseXOR($"b_sig")).as("hamming"))
      .filter($"hamming" <= maxHamming)
  }
}
