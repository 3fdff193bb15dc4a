package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the round-9 additions — properties the DuckDB
  * hash-compare can't state directly (the oracle proves equality to one SQL
  * formulation; these prove the SEMANTICS independently of any SQL).
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("gap islands: every streak is >=3 strictly consecutive days and maximal") {
    val rows = SparkEntry.queries("w_gap_islands")(spark, dir)
      .select(col("user_id"), col("start_day"), col("end_day"), col("len_days"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate, r.getLong(3)))
    assert(rows.nonEmpty, "sf0.001 should produce at least one streak")
    // ground truth: the full per-user active-day sets
    val active = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (u, s0, e0, len) =>
      assert(len >= 3, s"short streak leaked: $u $s0..$e0")
      assert(java.time.temporal.ChronoUnit.DAYS.between(s0, e0) == len - 1,
        s"streak not consecutive-length-consistent: $u $s0..$e0 len=$len")
      (0L until len).foreach(i => assert(active(u)(s0.plusDays(i)),
        s"day ${s0.plusDays(i)} inside streak $u $s0..$e0 is not active"))
      // maximality: the days flanking the streak are NOT active
      assert(!active(u)(s0.minusDays(1)), s"streak $u $s0..$e0 extends left")
      assert(!active(u)(e0.plusDays(1)), s"streak $u $s0..$e0 extends right")
    }
  }

  test("skyline: survivors are mutually non-dominated and every loser has a dominator") {
    def dominates(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    val sky = SparkEntry.queries("j_skyline_pareto")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val all = graft.core.Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(min("l_extendedprice").as("p"), countDistinct("l_orderkey").as("q"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(sky.nonEmpty && sky.size < all.size, s"degenerate skyline: ${sky.size}/${all.size}")
    for ((_, a) <- sky; (_, b) <- sky)
      assert(!dominates(a, b), s"skyline member $a dominates member $b")
    for ((k, v) <- all if !sky.contains(k))
      assert(sky.values.exists(s => dominates(s, v)),
        s"non-skyline supplier $k=$v has no dominator in the skyline")
  }

  test("benford: census sums to the filtered row count and flags recompute exactly") {
    val out = SparkEntry.queries("dq_benford_digits")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val nPos = graft.core.Tables.orders(spark, dir)
      .where(col("o_totalprice") >= 0.01).count() // >= one cent: digit 0 can't occur
    // digits of positive cents are 1..9, so the census partitions the rows
    assert(out.map(_._2).sum == nPos, s"census drops rows: ${out.map(_._2).sum} != $nPos")
    assert(out.map(_._1).distinct.length == out.length && out.forall(d => d._1 >= 1 && d._1 <= 9))
    val total = out.map(_._2).sum
    out.foreach { case (d, n, expPm, obsPm, flagged) =>
      assert(obsPm == n * 1000 / total, s"digit $d obs_pm drifted")
      assert(flagged == (math.abs(obsPm - expPm) > 50), s"digit $d flag drifted")
    }
  }
}
