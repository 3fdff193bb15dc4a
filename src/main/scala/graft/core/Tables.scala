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
  /** Read one harness table; `dir` is an sf dir like /root/testdata/sf0.01. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
