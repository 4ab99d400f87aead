package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q01_pricing_summary","q03_filter_project","q04_dim_join","q05_revenue_join","q17_asof_join","q25_cosine_topk","q37_topk_per_group")) {
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Join") || l.contains("Exchange") || l.contains("WholeStageCodegen") ||
        l.contains("TakeOrderedAndProject") || l.contains("Scan ")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
