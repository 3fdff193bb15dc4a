package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pattern: bucketed tables co-locate join keys at write time, so the
  * fact⋈fact join plans with zero shuffle Exchanges — the strategy that
  * replaces the reference's in-memory merges at 100 TB (builder prompt:
  * "repartition/bucketing for co-located joins"). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bkt")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("g_orders_bkt")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("g_lineitem_bkt")

      val joined = spark.table("g_lineitem_bkt")
        .join(spark.table("g_orders_bkt"), "o_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val physical = joined.queryExecution.executedPlan.toString
      // the join itself must not reshuffle either side: the only exchange
      // allowed is the one for the final 3-row groupBy
      val joinPart = physical.split("HashAggregate").last // below the aggs
      assert(joinPart.contains("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$physical")
      // and it still computes the right thing
      val direct = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      assert(joined.orderBy("o_orderstatus").collect().toSeq ==
             direct.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bkt")
    }
  }
}
