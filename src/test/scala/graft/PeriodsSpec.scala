package graft

import java.time.LocalDate
import graft.window.Periods
import org.scalatest.funsuite.AnyFunSuite

/** W1: composite-period calendar semantics (data_extraction_v2.py:85-106). */
class PeriodsSpec extends AnyFunSuite {

  test("FIXTURES B11: year-boundary truncation to Jan 1, next starts Jan 2") {
    val ps = Periods.compositePeriods(LocalDate.parse("2025-12-19"), LocalDate.parse("2026-02-02"))
    assert(ps.map(p => (p.start.toString, p.end.toString)) == Seq(
      ("2025-12-19", "2026-01-01"),
      ("2026-01-02", "2026-01-17"),
      ("2026-01-18", "2026-02-02")))
  }

  test("plain 16-day windows when no year boundary crossed") {
    val ps = Periods.compositePeriods(LocalDate.parse("2024-03-01"), LocalDate.parse("2024-04-30"))
    assert(ps.head.start == LocalDate.parse("2024-03-01"))
    assert(ps.head.end == LocalDate.parse("2024-03-16"))
    assert(ps(1).start == LocalDate.parse("2024-03-17"))
    // only complete windows: last end <= current
    assert(!ps.last.end.isAfter(LocalDate.parse("2024-04-30")))
  }

  test("property: periods are contiguous, non-overlapping, complete, ≤16 days") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val start = LocalDate.parse("2020-01-01").plusDays(rnd.nextInt(3650).toLong)
      val current = start.plusDays(20L + rnd.nextInt(380))
      val ps = Periods.compositePeriods(start, current)
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b.start == a.end.plusDays(1)) // contiguous
        case _ =>
      }
      ps.foreach { p =>
        val days = java.time.temporal.ChronoUnit.DAYS.between(p.start, p.end) + 1
        assert(days >= 2 && days <= 16)
        assert(!p.end.isAfter(current)) // complete windows only (F6)
        // a window either stays in one year or ends exactly on Jan 1
        assert(p.end.getYear == p.start.getYear ||
               (p.end.getMonthValue == 1 && p.end.getDayOfMonth == 1))
      }
    }
  }

  test("day table covers every period day exactly once") {
    val spark = SparkTestSession.spark
    val dt = Periods.dayTable(spark, LocalDate.parse("2025-12-19"), LocalDate.parse("2026-02-02"))
    assert(dt.count() == dt.select("d").distinct().count())
    assert(dt.count() == (14 + 16 + 16)) // lengths of the three B11 periods
  }
}
