package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-cleaning expressions: sentinel handling, imputation, quantization,
  * string sanitation (SURVEY.md §2.3 P4, P8–P11, P13).
  *
  * The reference's raster reader maps a sentinel set
  * {nodata, −99999, −9999, −8888, −32768} ∪ (x < −1e3) to NaN
  * (`BiomassAggregate.py:140-148`) and decodes `band*scale + offset`
  * (`BiomassAggregate.py:147`); NaN is flushed to 0 before model fits
  * (`gwr_model.py:40`) and persistence (`BiomassAggregate.py:325`).
  */
object CleanOps {

  /** The reference's nodata sentinels (`BiomassAggregate.py:140-146`). */
  val DefaultSentinels: Seq[Double] = Seq(-99999d, -9999d, -8888d, -32768d)

  /** P10: sentinel → NULL. Any member of `sentinels`, or any value below
    * `floor`, becomes NULL (reference also nulls x < −1e3). */
  def sentinelToNull(v: Column,
                     sentinels: Seq[Double] = DefaultSentinels,
                     floor: Double = -1000d): Column =
    when(v.isin(sentinels: _*) || v < lit(floor), lit(null)).otherwise(v)

  /** P9: raster scale/offset decode (`BiomassAggregate.py:147`). */
  def scaleOffset(v: Column, scale: Double, offset: Double): Column =
    v * lit(scale) + lit(offset)

  /** P8: NaN/NULL → 0 impute (`gwr_model.py:40`). Column form so it can be
    * used inside expressions; whole-frame form is `df.na.fill(0)`. */
  def imputeZero(v: Column): Column = coalesce(nanvl(v, lit(0d)), lit(0d))

  /** P11: non-positive values burned to the raster nodata sentinel before
    * write (`rasterize.py:86`). */
  def negativeToSentinel(v: Column, sentinel: Double = -99999d): Column =
    when(v <= 0d, lit(sentinel)).otherwise(v)

  /** P4: join-key quantization — `round(x, 3)` makes float lat/lon usable as
    * equi-join keys (`data_extraction_v2.py:354-355`). This is the key trick
    * that turns the reference's nearest-neighbor lookups into shuffle-able
    * equi-joins (SURVEY.md J2). */
  def quantize(v: Column, scale: Int = 3): Column = round(v, scale)

  /** Snap a coordinate to a regular grid of step `step` anchored at
    * `origin` — generalized quantization for grid-snap joins (J2/J3). */
  def gridSnap(v: Column, origin: Double, step: Double): Column =
    floor((v - lit(origin)) / lit(step)).cast("long")

  /** P13: zone-id sanitation (`BiomassAggregate.py:92`, `BiomassHindcasts.py:54`). */
  def sanitizeId(s: Column): Column =
    regexp_replace(regexp_replace(s, "/", "-"), "\\?", "")

  /** F7: empty-input guard — the reference truncates downstream outputs and
    * exits when an upstream stage produced nothing (`funcs.py:13-18`). */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty

  /** P17: conditional random augmentation (`gwr_model.py:44-59`): when the
    * nonzero share of `valueCol` is below `sharePctThreshold`, add
    * U(lo, hi) to a `frac` sample of the zero rows. The reference is
    * unseeded (non-deterministic); the declared behavior is distribution
    * repair, so we seed it (SURVEY.md §7.5). Two-pass: scalar share
    * aggregate, then a seeded `rand` projection — no shuffle. */
  def augmentZeros(df: DataFrame, valueCol: String, seed: Long,
                   sharePctThreshold: Double = 4.0, frac: Double = 0.1,
                   lo: Double = 0.001, hi: Double = 0.01): DataFrame = {
    val v = col(valueCol)
    val share = df.agg((avg(when(v =!= 0d, 1d).otherwise(0d)) * 100).as("s"))
      .head().getDouble(0)
    if (share >= sharePctThreshold) df
    else df.withColumn(valueCol,
      when(v === 0d && rand(seed) < frac,
           lit(lo) + rand(seed + 1) * (hi - lo)).otherwise(v))
  }
}
