package graft.ml

/** Closed-form Gaussian-process regression — the declared capability of the
  * reference's `GaussianProcesses.forecast` (`src/codes/GaussianProcesses.py:12-54`):
  * RBF kernel (lengthscale 60, variance 0.5), observation noise 0.01,
  * mean-centered targets, forecast horizons +16/+32/+48 days.
  *
  * The reference runs 10 SVI steps of pyro (stochastic, version-dependent);
  * we implement the exact posterior mean instead — deterministic, seedless,
  * and with n ≤ a few hundred observations per zone the O(n³) Cholesky solve
  * is microseconds. Runs per-group inside `flatMapGroups`, so 151 zones (or
  * 100k zones at scale) parallelize embarrassingly across executors.
  */
object GP {

  final case class Params(lengthscale: Double = 60.0,
                          variance: Double = 0.5,
                          noise: Double = 0.01)

  val Horizons: Array[Double] = Array(16.0, 32.0, 48.0)

  private def rbf(a: Double, b: Double, p: Params): Double = {
    val d = (a - b) / p.lengthscale
    p.variance * math.exp(-0.5 * d * d)
  }

  /** In-place Cholesky factorization of a symmetric positive-definite matrix
    * stored row-major; returns the lower factor L. */
  private def cholesky(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val l = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = 0.0
        var k = 0
        while (k < j) { s += l(i)(k) * l(j)(k); k += 1 }
        if (i == j) l(i)(i) = math.sqrt(a(i)(i) - s)
        else l(i)(j) = (a(i)(j) - s) / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** Solve (L Lᵀ) x = b given the Cholesky factor L. */
  private def cholSolve(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = l.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) { // forward
      var s = b(i); var k = 0
      while (k < i) { s -= l(i)(k) * y(k); k += 1 }
      y(i) = s / l(i)(i); i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) { // backward
      var s = y(i); var k = i + 1
      while (k < n) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i); i -= 1
    }
    x
  }

  /** Exact GP posterior mean at `xTest`, with mean-centering of y
    * (the reference subtracts/adds back np.mean(y), gp:28,52 — A13). */
  def posteriorMean(x: Array[Double], y: Array[Double], xTest: Array[Double],
                    p: Params = Params()): Array[Double] = {
    val n = x.length
    require(n > 0, "empty series")
    val mu = y.sum / n
    val kmat = Array.tabulate(n, n) { (i, j) =>
      rbf(x(i), x(j), p) + (if (i == j) p.noise else 0.0)
    }
    val l = cholesky(kmat)
    val alpha = cholSolve(l, y.map(_ - mu))
    xTest.map { xs =>
      var s = 0.0
      var i = 0
      while (i < n) { s += rbf(xs, x(i), p) * alpha(i); i += 1 }
      s + mu
    }
  }

  /** The reference's forecast contract: predict on X ∪ {max(X)+16,+32,+48}
    * and return (xTest, predictions) (gp:22-24,54). */
  def forecast(days: Array[Double], y: Array[Double],
               p: Params = Params()): (Array[Double], Array[Double]) = {
    val xTest = days ++ Horizons.map(days.max + _)
    (xTest, posteriorMean(days, y, xTest, p))
  }
}
