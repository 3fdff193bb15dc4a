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
  /** The events table is written with parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (µs) does not accept directly. We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert losslessly — the
    * data is µs-granular, so `ns div 1000` drops nothing. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
