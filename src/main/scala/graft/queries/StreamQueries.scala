package graft.queries

import graft.Q
import graft.streaming.StreamOps

/** Structured Streaming face of the engine (SURVEY.md §2.9): AvailableNow
  * tumbling-window aggregation with watermark over the events file source.
  * The batch result it drains is SQL-checkable, so it does carry an oracle.
  */
object StreamQueries {

  def all: Seq[Q] = Seq(
    Q("stream_window_agg", Seq("§2.9", "F6", "A1", "W1"),
      (s, dir) => StreamOps.windowedEventAgg(s, dir),
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "Trigger.AvailableNow over file source, 1-day tumbling windows + watermark")
  )
}
