package graft.sources

import java.time.LocalDate

/** S5: idempotent dated-file ingest — the reference's scheduled download
  * loop (`data_extraction_v2.py:184-217`: `generate_date_strings` +
  * `download_tamsat_data`). Semantics carried over exactly:
  *
  *   - one probe per calendar date in the requested range;
  *   - a file already on disk with size > 0 is skipped (idempotent re-runs);
  *     a zero-byte file is treated as absent and re-fetched;
  *   - HTTP 404 (date not yet published upstream) is tolerated and logged,
  *     the loop continues;
  *   - any other transport error is recorded and the loop continues
  *     (the reference prints the HTTP error and moves on).
  *
  * The transport is injected so the engine is testable with zero egress and
  * the operator stays decoupled from any HTTP client. This is a DRIVER-side
  * operator by design: its cardinality is the calendar range (one row per
  * date), never the data volume — the relational surface is the returned
  * fetch log, which downstream stages semi-join exactly like the K7 new-file
  * manifest (`import_biomass.py:38-42`).
  */
object Fetch {

  /** One fetch-log row. `bytes` is what THIS run wrote (0 for any skip). */
  final case class Entry(date: java.sql.Date, path: String, action: String, bytes: Long)

  val Download   = "download"
  val SkipExists = "skip_exists"
  val Skip404    = "skip_404"
  val Failed     = "failed"

  /** The reference's daily filename pattern (`rfe%Y_%m_%d` + suffix). */
  def pathFor(d: LocalDate): String =
    f"rfe${d.getYear}%04d_${d.getMonthValue}%02d_${d.getDayOfMonth}%02d.nc"

  /** Inclusive daily calendar, `generate_date_strings`'s iteration. */
  def dateRange(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq

  /** Run the fetch loop over `dates`.
    *
    * @param existingSize local-state probe: size of the file at a path, 0 if
    *                     absent (the reference's `exists && getsize > 0`)
    * @param transport    Right(body) on success, Left(httpStatus) on error;
    *                     `B` is the opaque payload type (`Array[Byte]` in a
    *                     real deployment)
    * @param sizeOf       payload size for the log
    * @param save         persist a fetched payload at a path
    */
  def run[B](dates: Seq[LocalDate],
             existingSize: String => Long,
             transport: LocalDate => Either[Int, B],
             sizeOf: B => Long,
             save: (String, B) => Unit): Seq[Entry] =
    dates.map { d =>
      val p = pathFor(d)
      if (existingSize(p) > 0L) Entry(java.sql.Date.valueOf(d), p, SkipExists, 0L)
      else transport(d) match {
        case Right(body) =>
          save(p, body)
          Entry(java.sql.Date.valueOf(d), p, Download, sizeOf(body))
        case Left(404) => Entry(java.sql.Date.valueOf(d), p, Skip404, 0L)
        case Left(_)   => Entry(java.sql.Date.valueOf(d), p, Failed, 0L)
      }
    }
}
