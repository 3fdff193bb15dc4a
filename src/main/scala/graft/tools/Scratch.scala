package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch runner: print one registry query's formatted plan at a
  * given SF dir (PlanAudit runs the whole registry; this runs one). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.registry.find(_.name == name).get
    val df = q.run(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows=${df.count()}  sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
