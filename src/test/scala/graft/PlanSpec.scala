package graft

/** Physical-plan regression net: the scale-critical plan properties the
  * engine relies on (predicate pushdown, column pruning, broadcast of
  * dims, true top-k) must survive query edits — a silent regression here
  * costs nothing at sf0.01 and everything at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q03: both ts range bounds and the type predicate push to parquet") {
    val p = plan("q03_filter_project")
    // (the PushedFilters line is truncated in toString — the lower bound
    // proves range pushdown; the upper bound shows in the Filter node.
    // `ts` is the raw µs timestamp column since the round-6 testdata
    // regen, so the bounds render as timestamp literals, not epoch-ns.)
    assert(p.contains("EqualTo(event_type,purchase), GreaterThanOrEqual(ts,"), p)
    assert(p.contains("< 2024-01-20 00:00:00"), p)
  }

  test("q01: column pruning reads only the 6 referenced lineitem columns") {
    val p = plan("q01_pricing_summary")
    val read = p.split("\n").find(_.contains("ReadSchema")).get
    assert(read.contains("l_quantity") && read.contains("l_returnflag"), read)
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"), read)
  }

  test("q04: both dimension tables broadcast") {
    val p = plan("q04_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q02/q25: ORDER BY + LIMIT plans as true top-k, not a full sort") {
    assert(plan("q02_vwap_topk").contains("TakeOrderedAndProject"))
    assert(plan("q25_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("q59/q100: the benchmark shingle set broadcasts; the corpus never shuffles on shingle") {
    // decontamination's scale contract (both the 3-gram heuristic and
    // the exact-13-gram standard): benchmark side broadcast, corpus
    // side streamed — a SortMergeJoin here would shuffle the full
    // corpus shingle relation on the shingle key
    for (q <- Seq("q59_decontamination", "q100_exact_decontam")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
    }
  }

  test("dedup pair family: no cartesian or nested-loop join anywhere") {
    // The catalog's most expensive pipelines are all posting-list /
    // prefix self-joins on EQUALITY keys (shingle, fingerprint, band
    // bucket) with inequality residuals — a refactor that demotes one
    // to CartesianProduct or BroadcastNestedLoopJoin costs nothing at
    // sf0.001 and everything at corpus scale, so the absence is pinned
    // here rather than re-audited by hand each round.
    for (q <- Seq("q24_neardup_jaccard", "q46_edit_distance",
        "q51_winnowing", "q54_dedup_clusters", "q70_jaccard_prefix")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q48: orders aggregate to month counts BELOW the spine join") {
    // VERDICT r5 #8: the month-spine left join must consume the ~80-row
    // per-month aggregate, never the raw fact relation keyed by a
    // derived string — at 100 TB that is a broadcastable summary vs the
    // whole fact table through an Exchange. The aggregate-below-join
    // shape shows as a HashAggregate on the join's RIGHT (build) side;
    // the spine side then broadcasts or joins against <= 100 rows.
    val p = plan("q48_recursive_cte")
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.indexOf("HashAggregate", joinIdx)
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"no aggregate below the spine join:\n$p")
    // and no aggregate ABOVE the join keyed by month (the old shape
    // grouped the joined 150k rows post-join)
    assert(!p.substring(0, joinIdx).contains("HashAggregate"),
      s"aggregate still sits above the spine join:\n$p")
  }

  test("q37: per-group top-k inserts a WindowGroupLimit before the shuffle") {
    // Spark 3.5+ pushes rank<=k filters into partial WindowGroupLimit on
    // the map side — the property that makes per-group top-k scale.
    assert(plan("q37_topk_per_group").contains("WindowGroupLimit"))
  }

  test("q60: source-cap sampling gets a map-side WindowGroupLimit") {
    // the property that makes per-source quotas safe under source skew:
    // each task forwards at most K rows per source before the shuffle
    assert(plan("q60_source_cap").contains("WindowGroupLimit"))
  }

  test("index probe: batch bands broadcast; the corpus index never shuffles") {
    // the incremental-dedup scale contract: candidate generation must be
    // a broadcast hash probe of the (tiny) batch bands streaming over the
    // standing corpus band index — a SortMergeJoin there would shuffle
    // the corpus index per increment
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val idx = graft.operators.Dedup.minhashIndex(
      docs.filter(col("doc_id") % 8 =!= 7), "doc_id", "text")
    val probe = graft.operators.Dedup.minhashPairsAgainstIndex(
      docs.filter(col("doc_id") % 8 === 7), idx, "doc_id", "text",
      maxBucketSize = 500)
    val p = probe.queryExecution.executedPlan.toString
    idx.unpersist()
    // candidate generation: the (band, bucket) join against the standing
    // index must be a broadcast probe, never a shuffle of the index
    assert("BroadcastHashJoin \\[band".r.findFirstIn(p).isDefined, p)
    assert("(SortMergeJoin|ShuffledHashJoin) \\[band".r.findFirstIn(p).isEmpty, p)
    // (the exact-verify join MAY sort-merge: it reads only the
    // semi-join-RESTRICTED corpus shingles — candidate docs, output-
    // proportional — so a shuffle there does not scale with the corpus)
  }

  test("q17: as-of join plans as one shuffle + window, no join node") {
    val p = plan("q17_asof_join")
    // union-tagged formulation: no join operator of any kind, and exactly
    // one exchange (the key partition the window sorts within). The old
    // range-join + row_number shape was per-key quadratic and re-shuffled
    // for the window.
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q52: part dimension broadcasts; fact side joins without shuffle") {
    assert(plan("q52_promo_revenue").contains("BroadcastHashJoin"))
  }

  test("q67: one hashpartitioning exchange serves both windows and the aggregate") {
    val p = plan("q67_sessionization")
    // gaps-and-islands scale contract: the lag window, the running-sum
    // window, and the per-session aggregate all group on user_id — a
    // correct plan partitions ONCE (plus the final presentation sort's
    // range exchange); a second hash exchange would re-shuffle the whole
    // event stream between window and aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q68: document-frequency side broadcasts onto the tf relation") {
    val p = plan("q68_tfidf")
    // the idf join must broadcast the vocabulary-sized df aggregate —
    // sort-merging it would shuffle the full (doc,term) relation a
    // second time on the term key
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q72: BM25 broadcasts df/avgdl and plans the top-20 as true top-k") {
    val p = plan("q72_bm25")
    // retrieval scale contract: the vocabulary-sized df side and the
    // 1-row avgdl side broadcast (no corpus re-shuffle on term), and the
    // final top-20 is TakeOrderedAndProject, never a global sort
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q73: the three funnel stages share one user_id exchange, no self-joins") {
    val p = plan("q73_funnel")
    // chained conditional window mins: one hash exchange on user_id
    // serves all three stage columns AND the per-user dedup — the
    // join-per-stage formulation would shuffle events three more times
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("q77: histogram bounds broadcast; both passes stay scan-shaped") {
    val p = plan("q77_histogram")
    // two-pass histogram: the 1-row bounds aggregate must come back as a
    // broadcast (nested-loop over one row), never by shuffling the fact
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q89/q90: one entity-key exchange serves every window term, no joins") {
    // Bollinger's three frame aggregates (n, Σy, Σy²) and EWMA's eight
    // lag terms all partition on user_id — a correct plan shuffles the
    // event stream ONCE; a second hash exchange would mean the window
    // columns were computed in separate passes
    for (q <- Seq("q89_bollinger", "q90_ewma")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("q95-q98: each series query shuffles the event stream exactly once") {
    // the SeriesQueries scale contract: ONE shuffle on the entity key
    // serves every window/aggregate stage — RSI's count+2 sums share a
    // frame; MACD's second (signal) window pass rides the first pass's
    // user_id partitioning; LOCF is one running-state window; TWAP's
    // lead() window and (user, day) aggregate share hashpartitioning.
    // A second hash exchange on any of these means the stream is being
    // re-keyed between stages — the cost that compounds at 100 TB.
    for (q <- Seq("q95_rsi", "q96_macd", "q97_forward_fill", "q98_twap")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("q91: chunking is a pure generator pipeline — zero hash exchanges") {
    // the RAG-chunking scale contract: scan → explode(sequence) → map,
    // chunk rows never shuffle (the only exchange is the presentation
    // sort's range partitioning) — any hashpartitioning here would mean
    // the corpus is being re-keyed just to tile substrings
    val p = plan("q91_chunking")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q92: one bucket exchange serves the packing window AND the pack aggregate") {
    // concat-then-cut packs per md5-nibble stream: the running cumsum
    // window partitions on bucket and the (bucket, pack_id) aggregate's
    // clustering is satisfied by that same hashpartitioning(bucket) —
    // re-shuffling between window and groupBy would double the corpus
    // movement for no redistribution gain
    val p = plan("q92_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("lakehouse query: symbol filter pushes to parquet on clustered files") {
    import java.sql.Timestamp
    val lake = new graft.sources.DataLakehouse(spark, tempDir("planlake"))
    val bar = OhlcvBar("AAPL", Timestamp.valueOf("2024-06-15 10:30:00"),
      150, 155, 149, 153, 1000, AssetClass.Equity)
    lake.ingestBatch(Seq(bar, bar.copy(symbol = "GOOG")))
    val p = lake.query(symbol = Some("AAPL")).df
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(symbol), EqualTo(symbol,AAPL)]"), p)
  }
}
