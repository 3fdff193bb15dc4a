package graft

import org.apache.spark.sql.SparkSession

/** Dev-only measurement-layer probe (round 12): prints the trajectory of
  * Bench's fixed host-rate control sampled back-to-back within one session,
  * optionally after the same sfDir warm-up Bench performs. Exists to
  * adjudicate why a 2-query sf100 subset session reads control ≈ 0.27s while
  * every sf0.1/sf1/sf10 window reads 0.62-0.88s (same host, same hour):
  * if the first post-warm-up sample is already fast, the warm-up state is the
  * cause; if samples decay from ~0.6 toward ~0.27 over the session, the
  * control is measuring JIT/profile maturity, not host rate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   tools/runjava.sh graft.ControlProbe [nSamples] [skipWarm]
  */
object ControlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = if (args.nonEmpty) args(0).toInt else 20
    val skipWarm = args.length > 1 && args(1) == "skipWarm"
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def controlSec(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 48000000L, 1L, 32)
        .selectExpr("id % 9973 AS k", "id AS v")
        .groupBy("k").count()
        .selectExpr("sum(k * count)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val rt = Runtime.getRuntime
    def heapMb(): Long = rt.totalMemory() / (1024 * 1024)
    println(f"[probe] pre-warm samples (heap=${heapMb()}%d MB):")
    (1 to 3).foreach(i => println(f"[probe]   pre $i%2d ${controlSec()}%.3f"))
    if (!skipWarm) {
      val t0 = System.nanoTime()
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      println(f"[probe] warm-up counts of $sfDir took ${(System.nanoTime()-t0)/1e9}%.1f s (heap=${heapMb()}%d MB)")
    }
    (1 to n).foreach { i =>
      println(f"[probe] post $i%2d ${controlSec()}%.3f heap=${heapMb()}%d MB")
    }
    spark.stop()
  }
}
