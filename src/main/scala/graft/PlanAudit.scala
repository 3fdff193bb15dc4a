package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: audit every registered query's physical plan and emit the
  * PLANS.md summary — exchange (shuffle) count, join strategies, and
  * whether scan pushdown is in effect. The "is this the plan you'd want at
  * 100 TB" review, mechanized. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | joins | pushed filters |")
    println("|---|---|---|---|")
    SparkEntry.registry.foreach { q =>
      try {
        val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
        def count(s: String) = s.r.findAllIn(plan).length
        val shuffles = count("Exchange hashpartitioning") + count("Exchange rangepartitioning")
        val joins = Seq(
          "BroadcastHashJoin" -> count("BroadcastHashJoin"),
          "SortMergeJoin" -> count("SortMergeJoin"),
          "BroadcastNestedLoopJoin" -> count("BroadcastNestedLoopJoin"))
          .filter(_._2 > 0).map { case (k, v) => s"${v}x$k" }.mkString(", ")
        val pushed = if ("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined) "yes" else "-"
        println(s"| `${q.name}` | $shuffles | ${if (joins.isEmpty) "-" else joins} | $pushed |")
      } catch {
        case e: Throwable => println(s"| `${q.name}` | plan error: ${e.getMessage.take(40)} | | | |")
      } finally spark.catalog.clearCache() // .cache() registers at plan time
    }
    spark.stop()
  }
}
