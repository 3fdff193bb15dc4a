package graft.window

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** W1: the reference's 16-day composite calendar with year-boundary reset.
  *
  * Semantics (`data_extraction_v2.py:85-106` `get_composite_periods`):
  * consecutive `[cur, cur+interval-1]` windows; if a window crosses Dec 31 it
  * is truncated to end on Jan 1 of the next year (so the next window starts
  * Jan 2); only windows with `end <= current` are emitted (complete-window
  * filter F6 — this is the pipeline's append/watermark semantics, §2.9).
  *
  * This is NOT `window(col, "16 days")` (fixed epoch origin, no reset), so we
  * materialize the period calendar on the driver (a few dozen rows per year),
  * explode it to one row per day, and broadcast-equi-join it onto the fact
  * table's date column. At any scale the fact side joins by broadcast hash
  * join on `d` with zero shuffle — the calendar stays tiny (365 rows/year)
  * no matter how large the data is.
  */
object Periods {

  final case class Period(start: LocalDate, end: LocalDate)

  /** Direct transcription of the declared calendar semantics. */
  def compositePeriods(start: LocalDate, current: LocalDate, intervalDays: Int = 16): Seq[Period] = {
    val out = ArrayBuffer.empty[Period]
    var cur = start
    var done = false
    while (!done && !cur.isAfter(current)) {
      var end = cur.plusDays(intervalDays - 1L)
      if (end.getYear != cur.getYear) end = LocalDate.of(cur.getYear + 1, 1, 1)
      if (end.isAfter(current)) done = true // incomplete window: stop (F6)
      else {
        out += Period(cur, end)
        cur = end.plusDays(1)
      }
    }
    out.toSeq
  }

  /** Day-level calendar: one row per day covered by a complete period —
    * `(d: Date, p_start: Date, p_end: Date)`. Broadcast this and equi-join
    * on `d`. */
  def dayTable(spark: SparkSession, start: LocalDate, current: LocalDate,
               intervalDays: Int = 16): DataFrame = {
    val rows = for {
      p <- compositePeriods(start, current, intervalDays)
      offset <- 0L to java.time.temporal.ChronoUnit.DAYS.between(p.start, p.end)
    } yield (java.sql.Date.valueOf(p.start.plusDays(offset)),
             java.sql.Date.valueOf(p.start), java.sql.Date.valueOf(p.end))
    import spark.implicits._
    rows.toDF("d", "p_start", "p_end")
  }

  /** Assign each fact row its composite period by equi-joining the broadcast
    * day calendar on date column `dateCol` (must be DateType). Rows outside
    * any complete period are dropped — the reference never emits partial
    * windows (`data_extraction_v2.py:99-101`). */
  def assign(facts: DataFrame, dateCol: String, start: LocalDate, current: LocalDate,
             intervalDays: Int = 16): DataFrame = {
    val cal = dayTable(facts.sparkSession, start, current, intervalDays)
    facts.join(broadcast(cal), facts(dateCol) === cal("d")).drop("d")
  }

  /** A11/§2.9: high-watermark resolution — resume from `max(date)+1 day` on
    * the output table, falling back to `default` when empty
    * (`data_extraction_v2.py:403-435`). */
  def resumeStart(output: DataFrame, dateCol: String, default: LocalDate): LocalDate = {
    val row = output.agg(max(col(dateCol))).head()
    if (row.isNullAt(0)) default
    else row.getDate(0).toLocalDate.plusDays(1)
  }

  /** §2.9 watermark: the last processable instant is `today − latencyDays`
    * (`data_extraction_v2.py:441`, config `data_latency_days`). */
  def latencyWatermark(today: LocalDate, latencyDays: Int): LocalDate =
    today.minusDays(latencyDays.toLong)
}
