package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print one registered query's executed plan plus its textual
  * exchange count (same regex as PlanAudit — cached-subtree repeats count).
  * Usage: runMain graft.ExplainOne <query> [sfDir]. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    println("== exchanges: " + ("Exchange hashpartitioning".r.findAllIn(plan).length + "Exchange rangepartitioning".r.findAllIn(plan).length))
    spark.stop()
  }
}
