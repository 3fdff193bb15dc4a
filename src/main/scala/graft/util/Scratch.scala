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
    * unique path (not created) under java.io.tmpdir. */
  def fresh(family: String, suffix: String = ""): String = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_${family}_${pid}_"
    val old = tmp.listFiles()
    if (old != null) old.filter(_.getName.startsWith(prefix)).foreach(rm)
    new File(tmp,
      s"$prefix${java.util.UUID.randomUUID().toString.take(8)}$suffix").getAbsolutePath
  }
}
