package graft

/** Every catalog query must execute end-to-end at sf0.001 — a fast
  * regression net over the whole SparkEntry surface (the DuckDB oracle
  * gate checks values; this catches runtime breakage in `sbt test`).
  */
class CatalogSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"catalog query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // full execution; emptiness is query-specific
    }
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("pair-set memo is scoped to one dir: switching dirs releases the persist") {
    // VERDICT r4 #5: a multi-dir catalog sweep must not accumulate every
    // dir's persisted pair sets in executor storage
    import org.apache.spark.storage.StorageLevel
    val a = queries.DedupQueries.neardupPairs(spark, sfDir)
    a.count() // materialize the persist
    assert(a.storageLevel != StorageLevel.NONE)
    val b = queries.DedupQueries.neardupPairs(spark, "/root/testdata/sf0.01")
    assert(a.storageLevel == StorageLevel.NONE) // old dir released
    b.count()
    assert(b.storageLevel != StorageLevel.NONE)
    // touch the original dir again so suites running after this one see
    // a consistent memo state (it simply rebuilds)
    queries.DedupQueries.neardupPairs(spark, sfDir).count()
  }
}
