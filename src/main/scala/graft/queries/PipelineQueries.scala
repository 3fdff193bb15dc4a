package graft.queries

import java.time.LocalDate

import graft.Q
import graft.core.Tables
import graft.pipeline.Forage
import org.apache.spark.sql.functions._

/** The composed 5-stage forage pipeline run end-to-end over harness data
  * (SURVEY.md §3/§7 module 7): three event-derived point-sample sources →
  * 16-day composites + quantized 3-way join (stage 1) → GWR scoring
  * (stage 2) → raster burn (stage 3) → zonal cascade (stage 4). Per-group GP
  * forecasting (stage 5) is exercised by m3/m4; not SQL-expressible →
  * rows-only check.
  */
object PipelineQueries {

  def all: Seq[Q] = Seq(

    Q("forage_pipeline_e2e", Seq("§3", "J1", "A1", "A2", "A3", "A7", "M2", "W8", "J4", "A4", "A5", "A6", "S7", "P13"),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(
            (lit(36.0) + (col("user_id") % 15).cast("double") * 0.1).as("lon"),
            (lit(15.0) - floor(col("user_id") / 15).cast("double") * 0.1).as("lat"),
            to_date(col("ts")).as("d"), col("event_type"), col("value"))
        def src(et: String, scale: Double) =
          e.where(col("event_type") === et)
            .select(col("lon"), col("lat"), col("d"), (col("value") * scale).as("v"))
        val combined = Forage.stage1Combined(
          ndvi = src("view", 0.001), sm = src("click", 0.01), preci = src("purchase", 0.1),
          anchor = LocalDate.parse("2024-01-01"), watermark = LocalDate.parse("2024-01-31"))
        val scored = Forage.stage2Score(s, combined, bandwidth = 0.5)
        val cells = Forage.stage3Rasterize(scored)
        val zones = Seq(
          "Z_WEST" -> "POLYGON((35.95 15.05, 36.75 15.05, 36.75 13.9, 35.95 13.9, 35.95 15.05))",
          "Z_EAST" -> "POLYGON((36.75 15.05, 37.55 15.05, 37.55 13.9, 36.75 13.9, 36.75 15.05))",
          "Z_SLIVER" -> "POLYGON((36.001 14.999, 36.009 14.999, 36.009 14.991, 36.001 14.991, 36.001 14.999))")
        Forage.stage4Zonal(s, cells, zones)
          .orderBy("zone_id", "date")
      },
      None,
      note = "stages 1-4 composed over event-derived sources; GP (stage 5) in m3/m4")
  )
}
