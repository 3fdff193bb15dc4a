package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date expressions for the reference's int-encoded `yyyyMMdd` date type.
  *
  * The reference's canonical date is an int like 20260202, produced at
  * `data_extraction_v2.py:110-116` and re-parsed everywhere
  * (`rasterize.py:49`, `BiomassForecast.py:38-40`). We keep `DateType` as the
  * engine-canonical type and provide lossless conversions (SURVEY.md §1.2,
  * operators P3/P5/P14/P15).
  *
  * All of these are pure built-in column expressions — whole-stage-codegen
  * friendly, no UDFs.
  */
object DateOps {

  /** DateType column -> int yyyyMMdd (P3). */
  def toYyyymmdd(d: Column): Column =
    date_format(d, "yyyyMMdd").cast("long")

  /** int/long/string yyyyMMdd -> DateType (reference `strptime('%Y%m%d')`). */
  def fromYyyymmdd(i: Column): Column =
    to_date(i.cast("string"), "yyyyMMdd")

  /** P5: decompose a date into (year, month, day) int columns
    * (`rasterize.py:49-54`). */
  def decompose(d: Column): (Column, Column, Column) =
    (year(d), month(d), dayofmonth(d))

  /** P14: extract a yyyyMMdd date embedded in a path/filename via regex
    * (`data_extraction_v2.py:403-425`, GeoServer timeregex). */
  def dateFromName(name: Column): Column =
    fromYyyymmdd(regexp_extract(name, "(\\d{8})", 1))

  /** P16: days since the series origin — the GP time feature
    * (`BiomassForecast.py:61`, `BiomassHindcasts.py:57`). */
  def daysSince(d: Column, origin: Column): Column =
    datediff(d, origin)
}
