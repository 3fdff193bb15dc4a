package graft.ml

/** M2: geographically-weighted regression — per-point locally weighted least
  * squares, the declared capability of the reference's mgwr usage
  * (`src/codes/gwr_model.py:68-99`): for every prediction point, calibration
  * rows are weighted by a gaussian kernel over coordinate distance and a
  * small weighted least-squares system (intercept + k features) is solved.
  *
  * Distribution model: the calibration set is small (19k × 4 doubles in the
  * reference — broadcastable), prediction is row-parallel via
  * `mapPartitions` with the calibration broadcast. The per-point system is
  * (k+1)×(k+1) — solved directly with Gaussian elimination, no deps.
  *
  * The reference's adaptive-NN bandwidth search (`Sel_BW`, gwr:88-89) is
  * modeled as a fixed configurable bandwidth (SURVEY.md §7.5 mitigation);
  * `bandwidthByAicGrid` offers a driver-side grid search over candidate
  * bandwidths (M1's golden-section search, simplified to a grid).
  */
object GWR {

  /** One calibration observation: coords, feature vector, target. */
  final case class Obs(px: Double, py: Double, f: Array[Double], y: Double)

  /** Solve A x = b for small dense symmetric A (Gaussian elim, partial pivot). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    var col = 0
    while (col < n) {
      var piv = col
      var i = col + 1
      while (i < n) { if (math.abs(m(i)(col)) > math.abs(m(piv)(col))) piv = i; i += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val d = m(col)(col)
      if (math.abs(d) < 1e-12) m(col)(col) = 1e-12
      i = 0
      while (i < n) {
        if (i != col && m(i)(col) != 0.0) {
          val factor = m(i)(col) / m(col)(col)
          var j = col
          while (j <= n) { m(i)(j) -= factor * m(col)(j); j += 1 }
        }
        i += 1
      }
      col += 1
    }
    Array.tabulate(n)(i => m(i)(n) / m(i)(i))
  }

  /** Weighted least squares at one point: gaussian kernel weights over
    * coordinate distance, design matrix [1, f…]. Returns coefficient vector
    * b (length k+1); prediction = b · [1, f*]. */
  def fitAt(px: Double, py: Double, calib: Array[Obs], bandwidth: Double): Array[Double] = {
    val k = calib(0).f.length + 1
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    val invBw2 = 1.0 / (bandwidth * bandwidth)
    var c = 0
    while (c < calib.length) {
      val o = calib(c)
      val dx = o.px - px
      val dy = o.py - py
      val w = math.exp(-0.5 * (dx * dx + dy * dy) * invBw2)
      if (w > 1e-12) {
        val row = new Array[Double](k)
        row(0) = 1.0
        var j = 1
        while (j < k) { row(j) = o.f(j - 1); j += 1 }
        var i = 0
        while (i < k) {
          val wi = w * row(i)
          var j2 = 0
          while (j2 < k) { xtx(i)(j2) += wi * row(j2); j2 += 1 }
          xty(i) += wi * o.y
          i += 1
        }
      }
      c += 1
    }
    solve(xtx, xty)
  }

  /** Predict the target at (px, py) with features f*. */
  def predictAt(px: Double, py: Double, f: Array[Double],
                calib: Array[Obs], bandwidth: Double): Double = {
    val b = fitAt(px, py, calib, bandwidth)
    var s = b(0)
    var j = 0
    while (j < f.length) { s += b(j + 1) * f(j); j += 1 }
    s
  }

  /** M1 (simplified): pick the bandwidth minimizing leave-one-out weighted
    * residual error over a candidate grid — driver-side, calls fitAt like
    * the reference's Sel_BW search calls GWR repeatedly. */
  def bandwidthByAicGrid(calib: Array[Obs], candidates: Seq[Double]): Double =
    candidates.minBy { bw =>
      var sse = 0.0
      var i = 0
      while (i < calib.length) {
        val o = calib(i)
        val others = calib.patch(i, Nil, 1)
        val pred = predictAt(o.px, o.py, o.f, others, bw)
        val e = pred - o.y
        sse += e * e
        i += 1
      }
      sse
    }

  /** P6: the biomass formula (`gwr_model.py:105`). */
  def biomass(pred: Double): Double = (6480.2 * pred - 958.6) / 1000.0
}
