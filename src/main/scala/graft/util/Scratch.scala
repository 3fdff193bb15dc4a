package graft.util

import java.io.File

/** Process-scoped scratch directories for queries that round-trip through a
  * filesystem sink (k1/k2/k3). The name embeds the JVM pid, and the sweep
  * only removes entries of the SAME pid — a concurrent harness process
  * (e.g. a Verify run next to a Bench run) can never delete another's
  * not-yet-read outputs. Within one process queries execute sequentially,
  * so sweeping own earlier outputs at next construction is safe. */
object Scratch {

  private val pid = ProcessHandle.current().pid()

  def rm(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete()
    ()
  }

  /** Sweep this process's previous `family` outputs, then return a fresh
    * unique path (not created) under java.io.tmpdir.
    *
    * CONSTRAINT: the sweep deletes the files behind any EARLIER DataFrame
    * of the same family that hasn't been fully consumed yet (DataFrames
    * read their sink lazily). Callers must construct-then-consume one
    * instance of a family at a time — which is how the sequential
    * Verify/Bench/PlanAudit harnesses run — and must not hold a prior
    * unconsumed k1/k2/k3 result across a re-construction of the same
    * query. */
  def fresh(family: String, suffix: String = ""): String = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_${family}_${pid}_"
    val old = tmp.listFiles()
    if (old != null) old.filter(_.getName.startsWith(prefix)).foreach(rm)
    new File(tmp,
      s"$prefix${java.util.UUID.randomUUID().toString.take(8)}$suffix").getAbsolutePath
  }
}
