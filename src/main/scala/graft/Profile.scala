package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query N times in a warmed session. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    // config parity with graft.Bench — see TimeQ note (round 12)
    val localDir = new java.io.File("/dev/shm/graft_spark_local")
    localDir.mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir.getPath)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("id % 10 AS k").groupBy("k").count().count()
    // optional 4th arg: run once at this dir first (reproduces graft.Bench's
    // cross-SF JIT warmup, which interacts with per-query caches)
    if (args.length > 3) {
      val c = SparkEntry.queries(name)(spark, args(3)).count()
      println(s"[profile] warm pass at ${args(3)}: $c rows")
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    spark.stop()
  }
}
