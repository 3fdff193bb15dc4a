package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev diagnostic (round 12): run one registry query N times with a
  * SparkListener attached and print, per run, every job's wall time and a
  * stage-level breakdown (task run time, GC time, shuffle fetch wait,
  * result serialization) plus the DRIVER GAPS between jobs — the part of a
  * query's wall clock that no stage accounts for (planning, broadcast
  * builds, checkpoint bookkeeping). Usage:
  *   runMain graft.tools.JobTrace <query> [sfDir] [n]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    // core-count lever for the 32-vs-8 inversion A/Bs (round 13); defaults
    // to the census shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = new java.io.File("/dev/shm/graft_spark_local")
    localDir.mkdirs()
    var b = SparkSession.builder()
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
    // dev A/B lever: SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageAgg(var run: Long = 0, var gc: Long = 0, var fetch: Long = 0,
                        var ser: Long = 0, var tasks: Int = 0, var name: String = "",
                        var maxRun: Long = 0, var inRows: Long = 0, var outRows: Long = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long)] // id -> (t0, t1)
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    val stageOfJob = mutable.LinkedHashMap.empty[Int, Seq[Int]]
    // ADVICE r12: listener callbacks run on the listener-bus thread while
    // main() reads the maps after the drain sleep — one lock covers every
    // mutation and the read-out below. gap_before can still print negative
    // for overlapping jobs (concurrent broadcast futures); that is real
    // overlap, rendered as-is.
    val lock = new Object
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = lock.synchronized {
        jobs(e.jobId) = (e.time, 0L)
        stageOfJob(e.jobId) = e.stageIds
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs.get(e.jobId).foreach(t => jobs(e.jobId) = (t._1, e.time))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = lock.synchronized {
        val a = stages.getOrElseUpdate(e.stageId, StageAgg())
        val m = e.taskMetrics
        if (m != null) {
          a.run += m.executorRunTime; a.gc += m.jvmGCTime
          a.fetch += m.shuffleReadMetrics.fetchWaitTime
          a.ser += m.resultSerializationTime; a.tasks += 1
          a.maxRun = math.max(a.maxRun, m.executorRunTime)
          a.inRows += m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
          a.outRows += m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = lock.synchronized {
        stages.getOrElseUpdate(e.stageInfo.stageId, StageAgg()).name = e.stageInfo.name.take(60)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to n).foreach { i =>
      lock.synchronized { jobs.clear(); stages.clear(); stageOfJob.clear() }
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"%n=== $name run $i: wall=$wall%.3f s rows=$c")
      lock.synchronized {
      var prevEnd = 0L
      jobs.foreach { case (id, (s0, s1)) =>
        val gap = if (prevEnd == 0) 0.0 else (s0 - prevEnd) / 1e3
        prevEnd = s1
        val dur = (s1 - s0) / 1e3
        val sids = stageOfJob.getOrElse(id, Nil)
        println(f"  job $id%3d dur=$dur%7.3f s gap_before=$gap%7.3f s stages=${sids.size}")
        sids.foreach { sid =>
          stages.get(sid).filter(_.tasks > 0).foreach { a =>
            println(f"    stage $sid%3d run=${a.run / 1e3}%8.2f max=${a.maxRun / 1e3}%6.2f gc=${a.gc / 1e3}%5.2f tasks=${a.tasks}%3d inRows=${a.inRows}%9d outRows=${a.outRows}%9d  ${a.name}")
          }
        }
      }
      }
    }
    spark.stop()
  }
}
