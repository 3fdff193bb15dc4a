package graft.core

import org.apache.spark.sql.SparkSession

/** Session-keyed memo with EXPLICIT stopped-session eviction.
  *
  * The previous implementations (Tables.scanCache, queries.FrameMemo) keyed
  * a WeakHashMap by SparkSession and relied on GC to collect stopped
  * sessions — but the cached values are DataFrames, and every Dataset
  * strongly references its SparkSession, so the keys were never weakly
  * reachable and nothing ever evicted (the WeakHashMap javadoc warns about
  * exactly this values-referencing-keys shape). This class replaces that
  * with a plain map plus an eviction sweep on every access: any entry whose
  * `sparkContext.isStopped` is dropped. The map holds a handful of sessions
  * at most, so the sweep is O(live sessions) per call — negligible next to
  * the work the memo saves.
  */
final class SessionMemo[K, V](val sticky: Boolean = false) {
  private val m =
    new java.util.HashMap[SparkSession, scala.collection.concurrent.TrieMap[K, V]]()
  SessionMemo.register(this) // after m init — dropSession touches m

  /** The per-session TrieMap, creating it if absent; evicts stopped sessions. */
  def forSession(s: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    m.synchronized {
      val it = m.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var t = m.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[K, V]
        m.put(s, t)
      }
      t
    }

  /** Drop one session's entries (cold-cache bench mode); returns how many
    * memoized entries were evicted so the cold harness can attribute what
    * each query's rebuild actually paid for. */
  def drop(s: SparkSession): Int = m.synchronized {
    val t = m.remove(s)
    if (t == null) 0 else t.size
  }
}

/** JVM-wide registry of every SessionMemo, so cold-cache bench mode can
  * drop ALL memoized state for a session in one call — FrameMemo'd
  * builder frames, the resolved-scan cache, the PPJoin shingle
  * dictionary, the zonal membership tables. Memos constructed with
  * `sticky = true` (layout-setup side effects: bucketed-table writes,
  * which are disk artifacts like the input parquet, not warm caches) are
  * deliberately exempt. */
object SessionMemo {
  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_, _]]()
  private def register(memo: SessionMemo[_, _]): Unit = { all.add(memo); () }

  /** Drop one session's entries across every non-sticky memo in the JVM.
    * Returns the total entry count evicted (0 = the session had nothing
    * memoized — a cold pass that logs 0 here recomputed nothing). */
  def dropSession(s: SparkSession): Int = {
    var n = 0
    all.forEach(memo => if (!memo.sticky) n += memo.drop(s))
    n
  }
}
