package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink adapters (SURVEY.md §2.2). The engine's correctness surface is the
  * DataFrames; these adapters carry the reference's sink *contracts* without
  * its transports (GeoServer/SMTP/REST are environment services, K6/K8).
  */
object Sinks {

  /** K1: single-file CSV, the reference's inter-stage handoff format. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K3: the zone-series store — partitioned parquet with dynamic
    * overwrite-by-partition replacing HDF5 resize+append. */
  def writeZoneSeries(df: DataFrame, path: String): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.partitionBy("zone_id").mode("overwrite").parquet(path)
  }

  /** K4/K5: the REST payload rows — `[{extId, mean (null-if-NaN), date}]`
    * (`BiomassAggregate.py:367-395`, `BiomassForecast.py:104-144`). Returns
    * JSON strings ready for any transport; rounding decimals differ between
    * the two endpoints (6 dp trends, 4 dp forecasts). */
  def restPayload(df: DataFrame, meanDecimals: Int): DataFrame =
    df.select(to_json(struct(
      col("extId"),
      when(isnan(col("mean")), lit(null)).otherwise(round(col("mean"), meanDecimals)).as("mean"),
      col("date"))).as("payload"))

  /** K7: the new-file manifest — which date partitions this run created. */
  def manifest(newCells: DataFrame): DataFrame =
    newCells.select(date_format(col("date"), "yyyyMMdd").as("d")).distinct()
      .select(concat(lit("biomass_"), col("d"), lit(".tif")).as("filename"))
      .orderBy("filename")

  /** K8: failure contract — on upstream failure the downstream input is
    * truncated so later stages no-op (`funcs.py:5-18`). Here: write an empty
    * frame with the same schema. */
  def truncateDownstream(df: DataFrame, path: String): Unit =
    df.limit(0).coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
