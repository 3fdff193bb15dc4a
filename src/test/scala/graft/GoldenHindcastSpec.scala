package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value check for the composed expanding-origin hindcast lag matrix
  * (M4) — the round-9 verdict's item 3: the GP kernel inside it is already
  * GoldenGpSpec-pinned and the run-schedule/scatter SQL half is hash-checked
  * (`m4_lag_assembly`), but the COMPOSITION (`Hindcast.lagMatrix`,
  * `BiomassHindcasts.py:34-95` semantics) was rows-only until now.
  *
  * The expected matrix was computed ONCE by an independent numpy
  * implementation (dense RBF kernel + `np.linalg.solve`, no shared code
  * with `graft.ml.GP`'s hand-rolled Cholesky or `Hindcast`'s scatter loop),
  * over the same committed 8-point 16-day series GoldenGpSpec pins — with
  * one value replaced by NaN so the per-fit NaN drop (hind:58-61, F4) is on
  * the verified path. halfway = 8/2 = 4, so 4 origin runs (hc = 4..7), and
  * prediction k of run r lands at result row r+k, column k (hind:67-69);
  * the output spine runs 16 rows past the observed series (hind:81-95).
  *
  * Generator (for reproducibility):
  * {{{
  * import numpy as np
  * days = np.array([0.,16.,32.,48.,64.,80.,96.,112.])
  * vals = np.array([1200.5,1350.25,np.nan,1421.75,1180.5,990.25,1050.0,1300.75])
  * ls,var,noise = 60.0,0.5,0.01
  * halfway = 4; out = np.full((20,4), np.nan)
  * for r in range(4):
  *     keep = [i for i in range(halfway+r) if not np.isnan(vals[i])]
  *     x, y = days[keep], vals[keep]; mu = y.mean()
  *     K = var*np.exp(-0.5*((x[:,None]-x[None,:])/ls)**2)+noise*np.eye(len(x))
  *     alpha = np.linalg.solve(K, y-mu)
  *     xt = np.concatenate([x, x[-1]+np.array([16.,32.,48.])])
  *     last4 = (var*np.exp(-0.5*((xt[:,None]-x[None,:])/ls)**2) @ alpha + mu)[-4:]
  *     for k in range(4): out[r+k, k] = last4[k]
  * }}}
  *
  * Agreement to 6 decimals pins the whole composition: the expanding-origin
  * bounds, the NaN drop, the takeRight(4) horizon selection, and the
  * row/column scatter — a shifted origin, an off-by-one in the scatter, or
  * an undropped NaN moves these cells by whole units or to other cells.
  */
class GoldenHindcastSpec extends AnyFunSuite {

  private val days = Array(0.0, 16.0, 32.0, 48.0, 64.0, 80.0, 96.0, 112.0)
  private val vals =
    Array(1200.5, 1350.25, Double.NaN, 1421.75, 1180.5, 990.25, 1050.0, 1300.75)

  // numpy-computed non-empty rows: seriesIdx -> (lag0, lag16, lag32, lag48)
  private val golden: Map[Int, Seq[Option[Double]]] = Map(
    4  -> Seq(Some(1427.369581), None, None, None),
    5  -> Seq(Some(1249.449368), Some(1442.884177), None, None),
    6  -> Seq(Some(1023.873462), Some(1125.027119), Some(1433.990886), None),
    7  -> Seq(Some(993.563234), Some(845.079448), Some(1010.245721), Some(1410.394788)),
    8  -> Seq(None, Some(953.819181), Some(720.255666), Some(937.381332)),
    9  -> Seq(None, None, Some(972.940505), Some(674.399947)),
    10 -> Seq(None, None, None, Some(1031.785798)))

  private def close(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (Some(x), Some(y)) => math.abs(x - y) < 5e-7
    case (None, None)       => true
    case _                  => false
  }

  test("Hindcast.lagMatrix matches the independent numpy golden to 6 decimals") {
    val rows = graft.ml.Hindcast.lagMatrix(days, vals)
    // spine: n - halfway + 16 = 20 rows, indexed from halfway = 4 (hind:81-95)
    assert(rows.size === 20)
    assert(rows.head.seriesIdx === 4 && rows.last.seriesIdx === 23)
    rows.foreach { lr =>
      val exp = golden.getOrElse(lr.seriesIdx, Seq(None, None, None, None))
      val got = Seq(lr.lag0, lr.lag16, lr.lag32, lr.lag48)
      got.zip(exp).zipWithIndex.foreach { case ((g, e), k) =>
        assert(close(g, e),
          s"row ${lr.seriesIdx} lag${k * 16}: got $g, golden $e")
      }
    }
  }

  test("m4 query path (flatMapGroups over a tiny zone frame) emits the golden cells") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import java.time.LocalDate
    val d0 = LocalDate.parse("2024-01-01")
    // same per-group wiring as m4_hindcast_lags: (zone, date, value) rows
    val rows = days.indices.map { i =>
      (3L, d0.plusDays(days(i).toLong).toString, vals(i))
    }
    val out = rows.toDF("zone", "d", "biomass").as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (zone: Long, it: Iterator[(Long, String, Double)]) =>
        val rs = it.toArray.sortBy(_._2)
        val first = LocalDate.parse(rs.head._2)
        val ds = rs.map(r =>
          java.time.temporal.ChronoUnit.DAYS.between(first, LocalDate.parse(r._2)).toDouble)
        graft.ml.Hindcast.lagMatrix(ds, rs.map(_._3)).map { lr =>
          (zone, lr.seriesIdx, lr.lag0, lr.lag16, lr.lag32, lr.lag48)
        }
      }
      .collect().sortBy(_._2)
    assert(out.length === 20)
    golden.foreach { case (idx, exp) =>
      val r = out.find(_._2 == idx).get
      val got = Seq(r._3, r._4, r._5, r._6)
      got.zip(exp).foreach { case (g, e) =>
        assert(close(g, e), s"query row $idx: got $got, golden $exp")
      }
    }
  }
}
