package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value check for the GP posterior kernel (M3) — the last
  * "rows-only" kernel, upgraded to value-checked.
  *
  * The expected numbers were computed ONCE by an independent
  * implementation (numpy: dense RBF kernel + `np.linalg.solve`, no shared
  * code with graft.ml.GP's hand-rolled Cholesky), with the reference's
  * fixed hyperparameters (`/root/reference/src/codes/GaussianProcesses.py:14-15`:
  * lengthscale 60, variance 0.5, noise 0.01, mean-centered targets) over a
  * committed 8-point 16-day series — the committed zone-series length in
  * `src/outputs/Databases/woredas.csv`. Horizons +16/+32/+48 are the
  * reference's forecast contract (`GaussianProcesses.py:22-24`).
  *
  * Generator (for reproducibility):
  * {{{
  * import numpy as np
  * days = np.array([0.,16.,32.,48.,64.,80.,96.,112.])
  * y = np.array([1200.5,1350.25,1500.0,1421.75,1180.5,990.25,1050.0,1300.75])
  * ls, var, noise = 60.0, 0.5, 0.01
  * K = var*np.exp(-0.5*((days[:,None]-days[None,:])/ls)**2) + noise*np.eye(8)
  * alpha = np.linalg.solve(K, y - y.mean())
  * xt = np.concatenate([days, days.max()+np.array([16.,32.,48.])])
  * kx = var*np.exp(-0.5*((xt[:,None]-days[None,:])/ls)**2)
  * print((kx @ alpha + y.mean()).round(6))
  * }}}
  *
  * Agreement to 6 decimals pins the whole numeric chain (kernel matrix,
  * SPD solve, mean-centering, horizon extension): a wrong sign, a dropped
  * noise term, or a transposed solve moves these values by whole units.
  */
class GoldenGpSpec extends AnyFunSuite {

  private val days = Array(0.0, 16.0, 32.0, 48.0, 64.0, 80.0, 96.0, 112.0)
  private val y =
    Array(1200.5, 1350.25, 1500.0, 1421.75, 1180.5, 990.25, 1050.0, 1300.75)

  // numpy-computed posterior mean at days ++ (112+16, 112+32, 112+48)
  private val golden = Array(
    1248.182005, 1383.082087, 1412.405089, 1336.317047, 1207.302686,
    1105.437827, 1097.457949, 1203.387536, // in-sample smoothed fit
    1389.529462, 1589.489120, 1738.260518) // +16 / +32 / +48 forecasts

  test("GP.forecast matches the independent numpy golden to 6 decimals") {
    val (xt, preds) = graft.ml.GP.forecast(days, y)
    assert(xt.length === 11 && preds.length === 11)
    assert(xt.takeRight(3).toSeq === Seq(128.0, 144.0, 160.0))
    preds.zip(golden).zipWithIndex.foreach { case ((p, g), i) =>
      assert(math.abs(p - g) < 5e-7,
        s"pred($i) = $p differs from golden $g beyond 6-decimal rounding")
    }
  }

  test("m3 query path (flatMapGroups over a tiny frame) returns the golden horizons") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import java.time.LocalDate
    // same per-group wiring as m3_gp_forecast: sorted (zone, date, value)
    // rows → day offsets from the zone's first date → GP.forecast
    val d0 = LocalDate.parse("2024-01-01")
    val rows = days.indices.map { i =>
      (7L, d0.plusDays(days(i).toLong).toString, y(i))
    }
    val out = rows.toDF("zone", "d", "biomass").as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (zone: Long, it: Iterator[(Long, String, Double)]) =>
        val rs = it.toArray.sortBy(_._2)
        val first = LocalDate.parse(rs.head._2)
        val ds = rs.map(r =>
          java.time.temporal.ChronoUnit.DAYS.between(first, LocalDate.parse(r._2)).toDouble)
        val (xt, preds) = graft.ml.GP.forecast(ds, rs.map(_._3))
        val n = xt.length
        (n - 3 until n).map(i => (zone, xt(i), preds(i)))
      }
      .collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(128.0, 144.0, 160.0))
    out.map(_._3).zip(golden.takeRight(3)).foreach { case (p, g) =>
      assert(math.abs(p - g) < 5e-7, s"horizon pred $p != golden $g")
    }
  }
}
