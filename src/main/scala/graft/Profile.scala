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
