package graft

import graft.sources.Bucketing

/** Bucketed co-located join spec: the join over two same-bucketed tables
  * must plan with NO shuffle exchange (the whole point of paying the
  * bucket shuffle once at write time).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-to-bucketed equi-join plans without a shuffle exchange") {
    val orders = (0 until 1000).map(i => (i.toLong, s"prio${i % 5}"))
      .toDF("o_key", "prio")
    val items = (0 until 5000).map(i => ((i % 1000).toLong, i * 1.5))
      .toDF("l_key", "price")
    Bucketing.writeBucketed(orders, "b_orders", "o_key", 4)
    Bucketing.writeBucketed(items, "b_items", "l_key", 4)
    // tiny test tables would be broadcast (planner then ignores buckets);
    // force the shuffle-join path the bucketing exists to optimize
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items",
        "o_key", "l_key")
      assert(joined.count() == 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
