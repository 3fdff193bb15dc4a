package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the warehouse/graph/ML-round operators added in
  * round 5: SCD2 interval tiling, PageRank mass bounds, hashing-trick
  * classifier plan equivalence, and k-means refine partition totals. The
  * oracle gate proves value equality with DuckDB; these prove the
  * *semantic* contracts that hold at any SF.
  */
class WarehouseGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("cdc_scd2_intervals: versions tile the timeline, one open version per user") {
    val scd = q("cdc_scd2_intervals").cache()
    try {
      // exactly one open (is_current) version per user
      val open = scd.where(col("is_current") === 1)
        .groupBy("user_id").count().where(col("count") =!= 1)
      assert(open.isEmpty, "users with != 1 open version")
      // each closed version's valid_to equals the next version's valid_from
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("valid_from_us")
      val gaps = scd
        .withColumn("next_from", lead("valid_from_us", 1).over(w))
        .where(col("valid_to_us").isNotNull &&
               col("valid_to_us") =!= col("next_from"))
      assert(gaps.isEmpty, "non-tiling validity intervals")
      // consecutive versions always change the tracked attribute
      val sameAttr = scd
        .withColumn("next_attr", lead("event_type", 1).over(w))
        .where(col("next_attr").isNotNull && col("next_attr") === col("event_type"))
      assert(sameAttr.isEmpty, "adjacent versions with identical attribute (change-compression broken)")
    } finally scd.unpersist()
  }

  test("graph_pagerank: rank bounds and node universe") {
    val pr = q("graph_pagerank").cache()
    try {
      // every node keeps at least the damping base and no node exceeds the
      // total initial mass
      val n = pr.count()
      assert(n > 0)
      val bad = pr.where(col("rank") < 150000L || col("rank") > lit(n) * 1000000L)
      assert(bad.isEmpty, "rank outside [base, total-mass] bounds")
      // node universe = distinct endpoints of the trade edge list
      val l = graft.core.Tables.lineitem(spark, dir)
      val o = graft.core.Tables.orders(spark, dir)
      val ends = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("s"), col("l_suppkey")).as("node"))
        .union(l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("node")))
        .distinct()
      assert(n == ends.count(), "pagerank node set != edge endpoint set")
    } finally pr.unpersist()
  }

  test("text_hashed_classifier: fold score equals explode+sum score") {
    // the zero-shuffle fold must equal the classical explode → per-doc sum
    // plan (same hash weights) — plan-shape optimization, not semantics
    val w = s"(${graft.dedup.Hashing.sparkMd5Mod("term")} % 2001) - 1000"
    val expected = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) >= 1)
      .groupBy("doc_id").agg(sum(expr(w)).as("score2"))
    val diff = q("text_hashed_classifier")
      .join(expected, Seq("doc_id"), "left")
      .where(coalesce(col("score2"), lit(0L)) =!= col("score_milli"))
    assert(diff.isEmpty, "fold score != explode+sum score")
  }

  test("graph_triangles: role counts sum to 3x the triangle count") {
    // every triangle contributes exactly one count to each of its three
    // vertices, so the per-supplier participation total must be divisible
    // by 3 — a closure-correctness canary for the oriented wedge join
    val tri = q("graph_triangles")
    val total = tri.agg(sum("n_triangles")).head.getLong(0)
    assert(total > 0, "no triangles found in the co-supply graph")
    assert(total % 3 == 0, s"role-count total $total not divisible by 3")
  }

  test("w_trend_mann_kendall: |S| bounded by the pair count") {
    val mk = q("w_trend_mann_kendall")
    val bad = mk.where(abs(col("s_stat")) > col("n_periods") * (col("n_periods") - 1) / 2)
    assert(bad.isEmpty, "S outside the n(n-1)/2 bound")
    assert(mk.where(col("n_periods") > 31).isEmpty, "daily series longer than the calendar window")
  }

  test("w_trend_theil_sen: pair counts agree with the MK series lengths") {
    val mk = q("w_trend_mann_kendall").select("user_id", "n_periods")
    val ts = q("w_trend_theil_sen").select("user_id", "n_pairs")
    val bad = mk.join(ts, "user_id")
      .where(col("n_pairs") =!= col("n_periods") * (col("n_periods") - 1) / 2)
    assert(bad.isEmpty, "Theil-Sen pair count != n(n-1)/2 of the MK series")
    assert(ts.count() == mk.count(), "user sets differ between MK and Theil-Sen")
  }

  test("text_bpe_apply: symbol counts sit between word and char counts, merges fire") {
    val bpe = q("text_bpe_apply").cache()
    try {
      // every word is >= 1 symbol, and merging can only shrink the spaced form
      val bad = bpe.where(col("symbols_after") < col("n_words") ||
                          col("symbols_after") > col("chars_total"))
      assert(bad.isEmpty, "symbols_after outside [n_words, chars_total]")
      // the learned merges must actually apply somewhere in the corpus
      val saved = bpe.agg(sum(col("chars_total") - col("symbols_after"))).head.getLong(0)
      assert(saved > 0, "no merge ever fired")
    } finally bpe.unpersist()
  }

  test("sketch_kmv_setops: estimates are sane and track the exact audits") {
    val r = q("sketch_kmv_setops").head
    val jac = r.getAs[Double]("jaccard_est")
    assert(jac >= 0.0 && jac <= 1.0, s"jaccard $jac outside [0,1]")
    assert(r.getAs[Double]("kmv_intersect") <= r.getAs[Double]("kmv_union") + 1e-9,
      "intersection estimate exceeds union estimate")
    // k=64 KMV has ~1/sqrt(k) relative error; 50% is a loose sanity bound
    for ((est, ex) <- Seq("kmv_a" -> "n_exact_a", "kmv_b" -> "n_exact_b",
                          "kmv_union" -> "n_exact_union")) {
      val e = r.getAs[Double](est); val x = r.getAs[Long](ex).toDouble
      assert(x == 0.0 || math.abs(e - x) / x < 0.5, s"$est=$e far from $ex=$x")
    }
  }

  test("j_asof_nearest: never farther than the backward-only match") {
    val near = q("j_asof_nearest")
      .select(col("event_id"), abs(col("delta_us")).as("near_d"))
    val prior = q("j_asof_last_prior")
      .select(col("event_id"), col("ts_us") - col("prior_view_us") as "prior_d")
      .where(col("prior_d").isNotNull)
    val worse = near.join(prior, "event_id").where(col("near_d") > col("prior_d"))
    assert(worse.isEmpty, "nearest match farther than the prior-only match")
  }

  test("w_trend_cusum: change day lies inside the user's observed range") {
    val cp = q("w_trend_cusum")
    val range = graft.core.Tables.events(spark, dir)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
    val bad = cp.join(range, "user_id")
      .where(col("change_day") < col("lo") || col("change_day") > col("hi") ||
             col("cusum_max_abs") < 0 || col("n_days") > 31)
    assert(bad.isEmpty, "change point outside the observed series")
  }

  test("graph_sssp: source at zero, relaxations never beat a direct edge") {
    val d = q("graph_sssp").cache()
    try {
      assert(d.where(col("node") === "s1").head.getAs[Long]("dist") == 0L)
      assert(d.where(col("dist") < 0).isEmpty, "negative distance")
      // a 3-round distance can only improve on the direct edge weight
      val l = graft.core.Tables.lineitem(spark, dir)
      val o = graft.core.Tables.orders(spark, dir)
      val direct = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_suppkey") === 1)
        .groupBy(concat(lit("c"), col("o_custkey")).as("node"))
        .agg(greatest(lit(1L),
               min(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))).cast("long"))
               .as("w"))
      val worse = d.join(direct, "node").where(col("dist") > col("w"))
      assert(worse.isEmpty, "3-round SSSP distance exceeds a direct edge weight")
    } finally d.unpersist()
  }

  test("a_weighted_median: the median is a member value inside the group's range") {
    val m = q("a_weighted_median")
    val ext = graft.core.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"),
           collect_set("l_extendedprice").as("vals"))
    val bad = m.join(ext, "l_returnflag")
      .where(col("weighted_median_price") < col("lo") ||
             col("weighted_median_price") > col("hi") ||
             !array_contains(col("vals"), col("weighted_median_price")))
    assert(bad.isEmpty, "weighted median is not an observed value in range")
  }

  test("ann_kmeans_refine: members partition the base, clusters come from seed labels") {
    val ref = q("ann_kmeans_refine").cache()
    try {
      val base = graft.core.Tables.embeddings(spark, dir)
      val total = ref.agg(sum("n_members")).head.getLong(0)
      assert(total == base.count(), "cluster members do not partition the vectors")
      val labels = base.select(col("label").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      val extra = ref.select("c_label").collect().map(_.getInt(0)).filterNot(labels)
      assert(extra.isEmpty, s"clusters outside the seed label set: ${extra.toSeq}")
    } finally ref.unpersist()
  }
}
