package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 operators: range-partition balance audit, semantic-cluster
  * dedup, streaming CDC upsert. Correctness vs DuckDB is the Verify gate's
  * job; these assert the structural properties each op promises. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("range balance: 8 non-overlapping buckets cover every row, near-even") {
    val out = SparkEntry.queries("layout_range_balance")(spark, sf).collect()
    assert(out.length == 8, s"expected 8 buckets, got ${out.length}")
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
    // ranges are disjoint and ordered: bucket j ends strictly below j+1
    out.sortBy(_.getAs[Long]("bucket")).sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_key") < hi.getAs[Long]("min_key"),
               s"overlap between buckets ${lo.getAs[Long]("bucket")} and ${hi.getAs[Long]("bucket")}")
      case _ => ()
    }
    // a ~1k-row sample gives boundaries within a small factor of even
    out.foreach { r =>
      val ratio = r.getAs[Double]("balance_ratio")
      assert(ratio > 0.5 && ratio < 1.6, s"bucket ${r.getAs[Long]("bucket")} ratio $ratio")
    }
  }

  test("semantic components: labels are fixpoints and copies share clusters") {
    val labels = SparkEntry.queries("dedup_semantic_components")(spark, sf)
    val byId = labels.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    // min-label: every cluster id is a member's id and ≤ its members
    byId.foreach { case (v, c) => assert(c <= v && byId(c) == c) }
    // keeps = distinct clusters
    val kept = labels.where(col("is_kept")).count()
    assert(kept == byId.values.toSet.size.toLong)
    // identical embeddings always land in the same cluster
    val copies = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy("embedding").agg(collect_list("vec_id").as("ids"))
      .where(size(col("ids")) > 1).collect()
    copies.foreach { r =>
      val ids = r.getAs[Seq[Long]]("ids")
      assert(ids.map(byId).toSet.size == 1, s"copies split: $ids")
    }
    // the threshold graph is non-trivial at this SF: some cluster ≥ 2
    assert(kept < byId.size, "no multi-member cluster formed")
  }

  test("streaming CDC upsert snapshot equals the batch log compaction") {
    val streamed = SparkEntry.queries("stream_cdc_upsert")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    val batch = SparkEntry.queries("cdc_latest_by_key")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch), "stream/batch parity broken")
  }
}
