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
      // Round 13: cached-plan partition sizing. Memoized builder frames were
      // cached at 32-64 partitions regardless of size, so every downstream
      // stage scheduled 32-64 near-empty tasks (~3-5ms launch each) and the
      // concurrent broadcast futures multiplied that (the 32-vs-8-core
      // inversion, VERDICT r12 #1). Letting AQE re-optimize cached plans and
      // size coalesced partitions by the ADVISORY BYTE TARGET (not the core
      // count) makes the partition count track the data: tiny dimension
      // builds collapse to 1-2 partitions, 100TB frames still get
      // bytes/64MB at full parallelismFirst semantics. The floor is
      // minPartitionSize=2m (stock parallelismFirst=true, so big shuffles
      // keep bytes/parallelism sizing and heavy builds stay parallel; A/B'd
      // against parallelismFirst=false+64MB advisory and a 4m floor — 2m
      // kept every tiny-frame win while leaving medium shuffles parallel
      // enough, the best full-registry total of the three). Inert at scale:
      // bytes/parallelism >> 2MB on any real input, and a sub-2MB task is
      // launch overhead on any hardware. Compute-dense iterated frames
      // additionally pin their parallelism explicitly in their builders
      // (repartition(P, key)) because a byte-based coalescer cannot see
      // per-row compute density or explode amplification.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "2m")
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
