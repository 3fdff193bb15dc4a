package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: incremental aggregate maintenance, compaction
  * planning, key-skew diagnosis. Correctness vs DuckDB is the Verify
  * gate's job; these assert the structural properties each op promises. */
class IvmLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("incremental agg: merge(base, delta) equals from-scratch recompute") {
    val out = SparkEntry.queries("cdc_incremental_agg")(spark, sf).collect()
    val direct = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
              expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sc")))).toMap
    assert(out.length == direct.size)
    out.foreach { r =>
      val (n, sc) = direct(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("sum_cents") == sc)
    }
    // the cutoff actually splits this data: both sides and the merge occur
    val srcs = out.map(_.getAs[String]("src")).toSet
    assert(srcs.contains("merged"), s"no merged users — cutoff outside data? $srcs")
  }

  test("compaction plan: bytes conserved, bins date-contiguous and ordered") {
    val out = SparkEntry.queries("layout_compaction_plan")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(out.map(_.getAs[Long]("total_bytes")).sum == li.count() * 128L)
    val sorted = out.sortBy(_.getAs[Long]("bin"))
    // file-id ranges must stay disjoint and ordered — compacted files keep
    // date locality so partition pruning survives the rewrite
    sorted.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("bin") < hi.getAs[Long]("bin"))
        assert(lo.getAs[Int]("last_file") < hi.getAs[Int]("first_file"),
               s"bins ${lo.getAs[Long]("bin")}/${hi.getAs[Long]("bin")} overlap in dates")
      case _ => ()
    }
    // every bin except the last closed because its running total crossed
    // the 64 KiB boundary: adding the next bin's first file must exceed it
    assert(sorted.init.forall(_.getAs[Long]("fill_ppm") > 500000L),
           "a closed bin is under half-full — assignment arithmetic broken")
  }

  test("key skew: histogram partitions keys and rows exactly") {
    val out = SparkEntry.queries("diag_key_skew")(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(out.map(_.getAs[Long]("n_rows")).sum == orders.count())
    assert(out.map(_.getAs[Long]("n_keys")).sum ==
           orders.select("o_custkey").distinct().count())
    // bucket b holds keys with 2^b <= n < 2^(b+1)
    out.foreach { r =>
      val b = r.getAs[Int]("log2_bucket")
      val mx = r.getAs[Long]("max_per_key")
      assert(mx >= (1L << b) && mx < (1L << (b + 1)),
             s"bucket $b max_per_key $mx out of [2^$b, 2^${b + 1})")
    }
    // ppm shares sum to one million within per-bucket rounding
    val ppm = out.map(_.getAs[Long]("rows_ppm")).sum
    assert(math.abs(ppm - 1000000L) <= out.length,
           s"ppm shares sum to $ppm")
  }

  test("join cardinality: predicted pair total equals the materialized join") {
    val out = SparkEntry.queries("diag_join_cardinality")(spark, sf).collect()
    val e = graft.core.Tables.events(spark, sf)
    val v = e.where(col("event_type") === "view").select(col("user_id"))
    val p = e.where(col("event_type") === "purchase").select(col("user_id"))
    val actual = v.join(p, "user_id").count()
    assert(out.map(_.getAs[Long]("pred_pairs")).sum == actual,
           "count-profile prediction diverged from the real join size")
    out.foreach { r =>
      val b = r.getAs[Int]("log2_bucket")
      val mx = r.getAs[Long]("max_per_key")
      assert(mx >= (1L << b) && mx < (1L << (b + 1)))
    }
  }
}
