package graft.ml

/** W3/M4/W2: rolling-origin hindcast with lag-column widening, the declared
  * semantics of `BiomassHindcasts.create_hindcast`
  * (`src/codes/BiomassHindcasts.py:34-95`):
  *
  *  - halfway = n / 2 (integer); origins hc = halfway, halfway+1, …,
  *    min(halfway + 100, n) — at most 100 refits (hind:43-51);
  *  - each refit trains a GP on the prefix [0, hc) (F10) and takes its last
  *    4 predictions: nowcast at the last training day plus +16/+32/+48;
  *  - prediction k (k = 0..3) of origin run r lands at result row r + k,
  *    column k (hind:67-69) — i.e. series row halfway + r + k carries, in
  *    column k, the forecast made k runs earlier;
  *  - result rows run to n − halfway + 16, extending 16 rows past the end of
  *    the observed series (the forecast tail).
  *
  * NaN rows are dropped from the training prefix, like hind:58-61 (F4).
  */
object Hindcast {

  final case class LagRow(seriesIdx: Int, lag0: Option[Double], lag16: Option[Double],
                          lag32: Option[Double], lag48: Option[Double])

  /** @param days  days-since-origin per observation (sorted ascending)
    * @param values observed series (may contain NaN; dropped per-fit)
    * @return lag rows indexed by absolute series position (halfway-based),
    *         including up to 16 positions past the observed series end. */
  def lagMatrix(days: Array[Double], values: Array[Double],
                maxRuns: Int = 100, p: GP.Params = GP.Params()): Seq[LagRow] = {
    val n = values.length
    if (n < 4) return Seq.empty
    val halfway = n / 2
    val nRuns = math.min(maxRuns, n - halfway)
    val nRows = n - halfway + 16
    val out = Array.fill(nRows, 4)(Double.NaN)
    var r = 0
    while (r < nRuns) {
      val hc = halfway + r
      val keep = (0 until hc).filter(i => !values(i).isNaN)
      if (keep.nonEmpty) {
        val (_, preds) = GP.forecast(keep.map(days).toArray, keep.map(values).toArray, p)
        val last4 = preds.takeRight(4)
        var k = 0
        while (k < math.min(4, nRows - r)) {
          out(r + k)(k) = last4(k)
          k += 1
        }
      }
      r += 1
    }
    (0 until nRows).map { r =>
      def opt(k: Int) = if (out(r)(k).isNaN) None else Some(out(r)(k))
      LagRow(halfway + r, opt(0), opt(1), opt(2), opt(3))
    }
  }
}
