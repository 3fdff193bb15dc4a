package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes a Z-order clustering key worth sorting by: when
  * rows are laid out in z order and cut into equal-size buckets (files),
  * every bucket's [min,max] box is tight in BOTH dimensions — so min/max
  * file stats prune 2-D predicates. A linear sort is tight in its own
  * dimension and spans the whole domain in the other. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("z-order buckets bound both dims; linear-sort buckets only one") {
    val sf = "/root/testdata/sf0.01"
    val z = SparkEntry.queries("zorder_cluster_key")(spark, sf)
      .agg(avg("span_d1").as("s1"), avg("span_d2").as("s2"))
      .head()
    val (zs1, zs2) = (z.getDouble(0), z.getDouble(1))

    // identical rows/bucket-count, laid out by a linear sort on d1
    val lin = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_partkey") % 1024).as("d1"), (col("l_orderkey") % 1024).as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("d1", "d2")))
      .withColumn("bucket", (col("rn") / 64).cast("int"))
      .groupBy("bucket")
      .agg((max("d1") - min("d1")).as("span_d1"), (max("d2") - min("d2")).as("span_d2"))
      .agg(avg("span_d1"), avg("span_d2"))
      .head()
    val (ls1, ls2) = (lin.getDouble(0), lin.getDouble(1))

    // z order: both average spans are a small fraction of the 1024 domain
    assert(zs1 < 150, s"z span_d1 avg $zs1")
    assert(zs2 < 150, s"z span_d2 avg $zs2")
    // linear order: tight on d1 but the d2 spans blow up toward the domain
    assert(ls1 < zs1, s"linear is tighter on its own sort dim ($ls1)")
    assert(ls2 > 4 * zs2, s"linear d2 span $ls2 should dwarf z's $zs2")
  }
}
