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
  final case class Polygon(outer: Ring, holes: Seq[Ring]) {
    def contains(x: Double, y: Double): Boolean =
      inRing(outer, x, y) && !holes.exists(inRing(_, x, y))

    def bbox: (Double, Double, Double, Double) =
      (outer.xs.min, outer.ys.min, outer.xs.max, outer.ys.max)
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

  /** Parse `POLYGON((x y, x y, ...))` (optionally with hole rings). */
  def parseWkt(wkt: String): Polygon = {
    val body = wkt.trim.stripPrefix("POLYGON").trim.stripPrefix("(").stripSuffix(")")
    val rings = body.split("\\)\\s*,\\s*\\(").map { ringStr =>
      val pts = ringStr.replace("(", "").replace(")", "").trim
        .split(",").map(_.trim.split("\\s+").map(_.toDouble))
      Ring(pts.map(_(0)), pts.map(_(1)))
    }
    Polygon(rings.head, rings.tail.toSeq)
  }
}
