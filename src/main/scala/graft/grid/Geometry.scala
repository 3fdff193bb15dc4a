package graft.grid

/** Minimal planar geometry for the zonal membership build: WKT polygon
  * parsing and point-in-polygon (even-odd ray casting). Good enough for the
  * reference's use — 151 lat/lon polygons tested against cell centers
  * (`BiomassAggregate.py:221-233`, `all_touched=False` ≙ center-in-polygon;
  * `all_touched=True` ≙ any corner or center inside / edge crossing,
  * approximated here by testing the 4 cell corners too).
  */
object Geometry {

  final case class Ring(xs: Array[Double], ys: Array[Double])

  /** A ring set with even-odd containment: works uniformly for simple
    * polygons, polygons with holes, and multi-part shapefile polygons
    * without any winding-order analysis. */
  final case class Polygon(rings: Seq[Ring]) {
    def outer: Ring = rings.head

    def contains(x: Double, y: Double): Boolean =
      rings.count(inRing(_, x, y)) % 2 == 1

    def bbox: (Double, Double, Double, Double) =
      (rings.map(_.xs.min).min, rings.map(_.ys.min).min,
       rings.map(_.xs.max).max, rings.map(_.ys.max).max)
  }

  private def inRing(r: Ring, x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    var j = r.xs.length - 1
    while (i < r.xs.length) {
      val (xi, yi) = (r.xs(i), r.ys(i))
      val (xj, yj) = (r.xs(j), r.ys(j))
      if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Shoelace area of the ring set (holes cancel via signed sums when wound
    * opposite the outer ring, as shapefiles do). */
  def area(p: Polygon): Double =
    math.abs(p.rings.map { r =>
      var s = 0.0
      var i = 0
      var j = r.xs.length - 1
      while (i < r.xs.length) {
        s += (r.xs(j) + r.xs(i)) * (r.ys(j) - r.ys(i))
        j = i; i += 1
      }
      s / 2
    }.sum)

  /** Distance from a point to the polygon outline (0 if on it). */
  def distToOutline(p: Polygon, x: Double, y: Double): Double = {
    var best = Double.MaxValue
    p.rings.foreach { r =>
      var i = 0
      var j = r.xs.length - 1
      while (i < r.xs.length) {
        val d = pointSegDist(x, y, r.xs(j), r.ys(j), r.xs(i), r.ys(i))
        if (d < best) best = d
        j = i; i += 1
      }
    }
    best
  }

  private def pointSegDist(px: Double, py: Double,
                           ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0) 0.0
            else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val cx = ax + t * dx
    val cy = ay + t * dy
    math.hypot(px - cx, py - cy)
  }

  /** Does any polygon edge or vertex touch the axis-aligned rectangle?
    * (rasterio `all_touched=True` semantics for outline-crossing cells —
    * interior-containment is tested separately via the center.) */
  def outlineIntersectsRect(p: Polygon, x0: Double, y0: Double,
                            x1: Double, y1: Double): Boolean = {
    def inRect(x: Double, y: Double) = x >= x0 && x <= x1 && y >= y0 && y <= y1
    def segsCross(ax: Double, ay: Double, bx: Double, by: Double,
                  cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
      def orient(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double) =
        math.signum((px - ox) * (qy - oy) - (py - oy) * (qx - ox))
      val o1 = orient(ax, ay, bx, by, cx, cy)
      val o2 = orient(ax, ay, bx, by, dx, dy)
      val o3 = orient(cx, cy, dx, dy, ax, ay)
      val o4 = orient(cx, cy, dx, dy, bx, by)
      (o1 != o2 && o3 != o4) ||
      (o1 == 0 && inSpan(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && inSpan(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && inSpan(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && inSpan(cx, cy, dx, dy, bx, by))
    }
    def inSpan(ax: Double, ay: Double, bx: Double, by: Double, px: Double, py: Double) =
      px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)
    p.rings.exists { r =>
      var i = 0
      var j = r.xs.length - 1
      var hit = false
      while (i < r.xs.length && !hit) {
        val (ax, ay, bx, by) = (r.xs(j), r.ys(j), r.xs(i), r.ys(i))
        hit = inRect(ax, ay) || inRect(bx, by) ||
          segsCross(ax, ay, bx, by, x0, y0, x1, y0) ||
          segsCross(ax, ay, bx, by, x1, y0, x1, y1) ||
          segsCross(ax, ay, bx, by, x1, y1, x0, y1) ||
          segsCross(ax, ay, bx, by, x0, y1, x0, y0)
        j = i; i += 1
      }
      hit
    }
  }

  /** Parse `POLYGON((x y, x y, ...))` (optionally with hole rings). */
  /** Inverse of [[parseWkt]] (full double precision round-trips). */
  def toWkt(p: Polygon): String =
    p.rings.map(r =>
      r.xs.indices.map(i => s"${r.xs(i)} ${r.ys(i)}").mkString("(", ", ", ")"))
      .mkString("POLYGON (", ", ", ")")

  def parseWkt(wkt: String): Polygon = {
    val body = wkt.trim.stripPrefix("POLYGON").trim.stripPrefix("(").stripSuffix(")")
    val rings = body.split("\\)\\s*,\\s*\\(").map { ringStr =>
      val pts = ringStr.replace("(", "").replace(")", "").trim
        .split(",").map(_.trim.split("\\s+").map(_.toDouble))
      Ring(pts.map(_(0)), pts.map(_(1)))
    }
    Polygon(rings.toSeq)
  }
}
