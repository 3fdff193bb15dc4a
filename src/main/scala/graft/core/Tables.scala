package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan helpers for the harness parquet tables (TESTDATA.md).
  *
  * The reference reads CSV/Excel/NetCDF/GeoTIFF with dtype re-assertion
  * (`src/codes/gwr_model.py:29-37`); our canonical at-rest format is parquet
  * with schema-on-write, so scans are pure `spark.read.parquet` and Catalyst
  * pushes filters/pruning into the scan (SURVEY.md §2.1, §4).
  */
object Tables {
  /** Resolved-scan cache. `spark.read.parquet` pays driver-side file
    * listing plus a schema-inference footer read on EVERY call; the harness
    * tables are immutable per sf dir, so each (session, path) needs that
    * work exactly once. A registry query that references lineitem three
    * times — or a 229-query bench that references it hundreds of times —
    * otherwise pays ~50-80ms of repeated metadata work per reference, the
    * single largest slice of the per-query floor. The production analog is
    * a catalog table with a known schema (no inference, cached listing),
    * so the cache is scale-faithful, not a bench trick. DataFrames are
    * immutable plans; sharing the resolved relation is safe.
    *
    * Same lifetime pattern as [[graft.queries.FrameMemo]]: [[SessionMemo]]
    * evicts stopped sessions (test suites cycle them) on access — a weak
    * key could never collect because DataFrames pin their own session. */
  private val scanCache = new SessionMemo[String, DataFrame]

  /** Read one harness table; `dir` is an sf dir like /root/testdata/sf0.01. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    scanCache.forSession(spark).getOrElseUpdate(path, spark.read.parquet(path))
  }

  /** Drop this session's resolved-scan entries (cold-cache bench mode). */
  def dropScanCache(spark: SparkSession): Unit = scanCache.drop(spark)

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  /** The events table's `ts` arrives in whatever physical type the harness
    * generator used: TIMESTAMP(NANOS) (which Spark only reads as long, via
    * `spark.sql.legacy.parquet.nanosAsLong`) or plain timestamp[us] (read as
    * TIMESTAMP_NTZ under `inferTimestampNTZ`). Normalize both to the
    * session-zone TimestampType every downstream query expects; the
    * harness session runs UTC, so the NTZ cast is value-preserving. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
