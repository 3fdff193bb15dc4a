package graft.oracle

import java.time.LocalDate

/** Shared DuckDB SQL fragments for oracle queries.
  *
  * The oracle must reproduce, in pure ANSI-ish SQL, the same declared
  * semantics our Spark operators implement — notably the reference's 16-day
  * composite calendar with year-boundary reset
  * (`data_extraction_v2.py:85-106`, SURVEY.md W1).
  */
object Sql {

  /** Recursive CTE reproducing `get_composite_periods(anchor, current, k)`:
    * consecutive [cur, cur+k-1] windows, truncated to Jan 1 when crossing a
    * year boundary, only complete windows (end <= current) kept.
    *
    * Emits two CTEs: `periods(p_start, p_end)` and the day-exploded
    * `period_days(d, p_start, p_end)`.
    */
  def periodCtes(anchor: LocalDate, current: LocalDate, intervalDays: Int = 16): String = {
    val a = anchor.toString
    val c = current.toString
    val k = intervalDays - 1
    s"""WITH RECURSIVE periods(p_start, p_end) AS (
       |  SELECT DATE '$a',
       |         CASE WHEN year(DATE '$a' + $k) <> year(DATE '$a')
       |              THEN make_date(year(DATE '$a') + 1, 1, 1)
       |              ELSE DATE '$a' + $k END
       |  UNION ALL
       |  SELECT p_end + 1,
       |         CASE WHEN year(p_end + 1 + $k) <> year(p_end + 1)
       |              THEN make_date(year(p_end + 1) + 1, 1, 1)
       |              ELSE p_end + 1 + $k END
       |  FROM periods WHERE p_end + 1 <= DATE '$c'
       |),
       |period_days AS (
       |  SELECT CAST(unnest(generate_series(p_start, p_end, INTERVAL 1 DAY)) AS DATE) AS d,
       |         p_start, p_end
       |  FROM periods WHERE p_end <= DATE '$c'
       |)""".stripMargin
  }
}
