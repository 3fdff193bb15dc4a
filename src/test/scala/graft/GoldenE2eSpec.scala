package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-VALUE checks for the two remaining rows-only registry outputs
  * (round-8 verdict item 4): `forage_pipeline_e2e` and `m2_gwr_score`.
  * Both are deterministic by construction — capped stable-hash calibration
  * sample, sequential per-cell WLS kernel, deterministic burn tie-breaks —
  * so their sf0.001 outputs are committable constants, the GoldenGpSpec
  * treatment. This upgrades the whole declared no-oracle surface from
  * rows/shape-checked to value-checked.
  */
class GoldenE2eSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("forage_pipeline_e2e at sf0.001 reproduces the committed zonal rows exactly") {
    val out = SparkEntry.queries("forage_pipeline_e2e")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("zone_id"), r.getAs[java.sql.Date]("date").toString,
                 r.getAs[Double]("mean_value"), r.getAs[Long]("pixel_count"),
                 r.getAs[Long]("valid_in_clip"), r.getAs[Boolean]("retried_all_touched"),
                 r.getAs[Boolean]("used_fallback"), r.getAs[Boolean]("buffered_tiny")))
      .sortBy(r => (r._1, r._2))
    // Committed from the round-9 run; the zonal mean is a short double sum
    // (7-9 cells), so equality is asserted to 1e-9 — immune to partial-sum
    // merge order, far tighter than any real regression (a missed cell or
    // changed burn value moves these by >=1e-3).
    val golden = Seq(
      ("Z_EAST",   "2024-01-16", 0.6657142857142857, 7L, 8L, false, false, false),
      ("Z_SLIVER", "2024-01-16", 0.65,               1L, 1L, false, false, true),
      ("Z_WEST",   "2024-01-16", 0.6699999999999999, 8L, 9L, false, false, false))
    assert(out.length == golden.length, s"row census changed: ${out.toSeq}")
    out.zip(golden).foreach { case (o, g) =>
      assert(o._1 == g._1 && o._2 == g._2, s"zone/date mismatch: $o vs $g")
      assert(math.abs(o._3 - g._3) < 1e-9, s"mean_value drifted: $o vs $g")
      assert((o._4, o._5, o._6, o._7, o._8) == ((g._4, g._5, g._6, g._7, g._8)),
        s"cascade diagnostics changed: $o vs $g")
    }
  }

  test("m2_gwr_score at sf0.001: deterministic id%30 sample hashes to the committed value") {
    val sample = SparkEntry.queries("m2_gwr_score")(spark, "/root/testdata/sf0.001")
      .where(org.apache.spark.sql.functions.col("id") % 30 === 0)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("pred"), r.getAs[Double]("biom")))
      .sortBy(r => (r._1, r._2)) // id is non-unique by design; pred breaks ties
    assert(sample.length == 164, s"sample census changed: n=${sample.length}")
    // pred is bit-deterministic (per-row column expression over a
    // deterministic broadcast coefficient table), so fixed-format rounding
    // is stable; the md5 pins every sampled (id, pred, biom) triple.
    val canon = sample.map { case (id, p, b) => f"$id:$p%.6f:$b%.2f" }.mkString(";")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "bb6992f8e9b195db2fb2eb0a7ddccf0f",
      s"m2 sample hash changed: $md5 (first=${sample.headOption}, last=${sample.lastOption})")
  }
}
