package graft

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join (custom LogicalPlan/Strategy/SparkPlan): known-answer
  * edge cases, strictness, and equivalence with the declarative max-prior
  * spec on real data. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def probe = Seq(
    (1L, 10L, 100L), // after both quotes for key 10
    (2L, 10L, 50L),  // equal to a quote time — strict must NOT match it
    (3L, 20L, 10L),  // before key 20's only quote → null
    (4L, 30L, 99L)   // key with no quotes at all → null
  ).toDF("id", "k", "t")

  private def quotes = Seq(
    (10L, 50L, "a"), (10L, 70L, "b"), (20L, 500L, "c")
  ).toDF("qk", "qt", "tag")

  test("strict as-of takes the latest strictly-prior quote, null when none") {
    val out = AsOfJoinPlan.join(probe, quotes, Seq("k" -> "qk"), "t" -> "qt")
      .select($"id", $"tag").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("b"), 2L -> None, 3L -> None, 4L -> None))
  }

  test("non-strict as-of admits equal times") {
    val out = AsOfJoinPlan.join(probe, quotes, Seq("k" -> "qk"), "t" -> "qt", strict = false)
      .select($"id", $"tag").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("b"), 2L -> Some("a"), 3L -> None, 4L -> None))
  }

  test("cost-based physical selection: broadcast under threshold, merge above") {
    def planOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.executedPlan.toString
    val bcast = AsOfJoinPlan.join(probe, quotes, Seq("k" -> "qk"), "t" -> "qt")
    assert(planOf(bcast).contains("BroadcastAsOfJoin"), planOf(bcast))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merge = AsOfJoinPlan.join(probe, quotes, Seq("k" -> "qk"), "t" -> "qt")
      assert(planOf(merge).contains("AsOfJoin") && !planOf(merge).contains("BroadcastAsOfJoin"),
             planOf(merge))
      // both paths produce the identical result
      val a = bcast.orderBy("id").collect().toSeq
      val b = merge.orderBy("id").collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tolerance bounds the lookback on BOTH physical variants") {
    // id 1 at t=100: latest prior quote is b at t=70 (age 30); tolerance 29
    // rejects it (and the even-older a is not considered — as-of matches the
    // LATEST prior or nothing), tolerance 30 admits it
    def run(tol: Long) =
      AsOfJoinPlan.join(probe, quotes, Seq("k" -> "qk"), "t" -> "qt", tolerance = Some(tol))
        .select($"id", $"tag").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(run(30L) == Map(1L -> Some("b"), 2L -> None, 3L -> None, 4L -> None))
    assert(run(29L) == Map(1L -> None, 2L -> None, 3L -> None, 4L -> None))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force merge variant
      assert(run(30L) == Map(1L -> Some("b"), 2L -> None, 3L -> None, 4L -> None))
      assert(run(29L) == Map(1L -> None, 2L -> None, 3L -> None, 4L -> None))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native as-of equals the declarative max-prior spec on events (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val purchases = e.where(col("event_type") === "purchase").select("event_id", "user_id", "ts_us")
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts_us").as("v_ts_us"))
    val native = AsOfJoinPlan.join(purchases, views, Seq("user_id" -> "v_user_id"), "ts_us" -> "v_ts_us")
      .select(col("event_id"), col("v_ts_us").as("prior_view_us"))
    val spec = purchases.as("p")
      .join(views.as("v"), col("v.v_user_id") === col("p.user_id") && col("v.v_ts_us") < col("p.ts_us"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max(col("v.v_ts_us")).as("prior_view_us"))
    assert(native.count() == purchases.count())
    assert(native.exceptAll(spec).isEmpty && spec.exceptAll(native).isEmpty)
  }
}
