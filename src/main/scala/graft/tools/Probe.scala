package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: decomposes one bench repetition of selected registry queries
  * into DataFrame-construction, driver planning (analysis→physical plan),
  * and execution time, to locate the fixed per-query floor the BENCHCMP
  * totals pay 200+ times. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_ONLY=regex sbt "runMain graft.tools.Probe [sfDir]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val localDir = new java.io.File("/dev/shm/graft_spark_local")
    localDir.mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir.getPath)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // measurement parity with Bench (see Bench.scala codegen-cache note)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 10 AS k").groupBy("k").count().count()
    val registry = only match {
      case Some(rx) => graft.SparkEntry.registry.filter(q => rx.findFirstIn(q.name).isDefined)
      case None     => graft.SparkEntry.registry.take(10)
    }
    // warm pass
    registry.foreach { q =>
      try q.run(spark, sfDir).count() catch { case _: Throwable => () }
    }
    registry.foreach { q =>
      var best = (Double.MaxValue, 0.0, 0.0, 0.0)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        val _ = df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        val tot = (t3 - t0) / 1e9
        if (tot < best._1)
          best = (tot, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      println(f"PROBE ${q.name}%-36s total=${best._1}%6.3f construct=${best._2}%6.3f plan=${best._3}%6.3f exec=${best._4}%6.3f")
    }
    spark.stop()
  }
}
