package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped single-instance memo for reused intermediate frames
  * (Zonal's pattern, generalized from the PPJoin docArr memo).
  *
  * Re-invoking a query lambda otherwise re-registers `.cache()` on a
  * plan-identical frame, and CacheManager's plan matching proved
  * unreliable once a second SF's entry existed — holding the one
  * DataFrame instance sidesteps plan lookup entirely, so repeat passes
  * (Bench best-of-3) and multiple references inside one plan share one
  * materialization. Lifetime: [[graft.core.SessionMemo]] evicts stopped
  * sessions on access (a weak key never collected — DataFrames pin their
  * own session); a harness-level clearCache() between queries unpersists
  * the frame without dropping the memo, so the next use re-registers the
  * cache, and cold-bench mode drops the memo itself via [[dropAll]]. */
private[graft] object FrameMemo {
  private val memo = new graft.core.SessionMemo[String, DataFrame]

  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val df = memo.forSession(s).getOrElseUpdate(key, build)
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache()
    df
  }

  private val done = new graft.core.SessionMemo[String, Boolean](sticky = true)

  /** Run a layout-setup side effect (bucketed/partitioned table writes)
    * once per session per key. Bucketing is write-once-query-many by
    * definition — repeat passes measure the query against the standing
    * layout, which is the semantics the operator models. Cold-bench mode
    * deliberately does NOT drop this map: the standing table is a disk
    * artifact like the input parquet, not a warm cache. */
  def once(s: SparkSession, key: String)(effect: => Unit): Unit = {
    done.forSession(s).getOrElseUpdate(key, { effect; true })
    ()
  }

  /** Drop this session's memoized frames (cold-cache bench mode). The
    * frames themselves are unpersisted by the caller's clearCache(). */
  def dropAll(s: SparkSession): Unit = memo.drop(s)
}
