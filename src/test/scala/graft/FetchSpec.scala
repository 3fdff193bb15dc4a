package graft

import java.time.LocalDate

import graft.sources.Fetch
import org.scalatest.funsuite.AnyFunSuite

/** S5: the idempotent download loop's decision tree
  * (data_extraction_v2.py:184-217) — pure driver-side, no Spark session. */
class FetchSpec extends AnyFunSuite {

  private val d1 = LocalDate.of(2024, 1, 1)

  private def runOnce(store: collection.mutable.Map[String, Long],
                      dates: Seq[LocalDate],
                      transport: LocalDate => Either[Int, Long]): Seq[Fetch.Entry] =
    Fetch.run[Long](dates,
      existingSize = p => store.getOrElse(p, 0L),
      transport = transport,
      sizeOf = identity,
      save = (p, b) => store(p) = b)

  test("filename pattern matches the reference's rfe%Y_%m_%d naming") {
    assert(Fetch.pathFor(LocalDate.of(2024, 3, 7)) == "rfe2024_03_07.nc")
  }

  test("dateRange is inclusive on both ends") {
    assert(Fetch.dateRange(d1, d1.plusDays(2)).map(_.getDayOfMonth) == Seq(1, 2, 3))
    assert(Fetch.dateRange(d1, d1) == Seq(d1))
  }

  test("404 is tolerated: logged and the loop continues past it") {
    val store = collection.mutable.Map[String, Long]()
    val log = runOnce(store, Fetch.dateRange(d1, d1.plusDays(2)),
      d => if (d.getDayOfMonth == 2) Left(404) else Right(10L))
    assert(log.map(_.action) == Seq(Fetch.Download, Fetch.Skip404, Fetch.Download))
    assert(store.size == 2) // nothing saved for the 404 date
  }

  test("non-404 errors are recorded as failed and the loop continues") {
    val store = collection.mutable.Map[String, Long]()
    val log = runOnce(store, Fetch.dateRange(d1, d1.plusDays(2)),
      d => if (d.getDayOfMonth == 1) Left(500) else Right(7L))
    assert(log.map(_.action) == Seq(Fetch.Failed, Fetch.Download, Fetch.Download))
    assert(log.map(_.bytes) == Seq(0L, 7L, 7L))
  }

  test("second run is a no-op: everything downloaded once is skip_exists") {
    val store = collection.mutable.Map[String, Long]()
    val dates = Fetch.dateRange(d1, d1.plusDays(4))
    val transport = (d: LocalDate) =>
      if (d.getDayOfMonth == 3) Left(404) else Right(5L): Either[Int, Long]
    val first = runOnce(store, dates, transport)
    assert(first.count(_.action == Fetch.Download) == 4)
    val second = runOnce(store, dates, transport)
    // downloaded files skip; the 404 date is still probed (it may have
    // been published since) — exactly the reference's re-run behavior
    assert(second.map(_.action) ==
      Seq(Fetch.SkipExists, Fetch.SkipExists, Fetch.Skip404, Fetch.SkipExists, Fetch.SkipExists))
  }

  test("a zero-byte file counts as absent and is re-fetched") {
    val store = collection.mutable.Map(Fetch.pathFor(d1) -> 0L)
    val log = runOnce(store, Seq(d1), _ => Right(9L))
    assert(log.head.action == Fetch.Download)
    assert(store(Fetch.pathFor(d1)) == 9L)
  }
}
