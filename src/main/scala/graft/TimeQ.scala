package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timing of individual queries (3 runs each) —
  * `runMain graft.TimeQ <query>...`; SF dir via SPARK_GRAFT_SF_DIR. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // full config parity with graft.Bench (tmpfs local dir, uncompressed
    // shuffle, codegen cache) — a dev A/B in this harness must measure the
    // same session the census does (round 12: the missing local.dir made
    // stream queries read 3× their census floor here)
    val localDir = new java.io.File("/dev/shm/graft_spark_local")
    localDir.mkdirs()
    var builder = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
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
    // dev A/B lever: SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder = builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        println(s"$q run$i: ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
