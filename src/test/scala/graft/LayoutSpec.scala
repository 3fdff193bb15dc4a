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

  test("z-sorted parquet skips row groups on a 2-D box predicate; unsorted can't") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    val sf = "/root/testdata/sf0.01"
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_partkey") % 1024).as("d1"), (col("l_orderkey") % 1024).as("d2"))
    val zed = rows.withColumn("z",
      (0 until 10).map { i =>
        (shiftright(col("d1"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(col("d2"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
      }.reduce(_ + _))

    def write(df: org.apache.spark.sql.DataFrame, sortCol: Option[String]): String = {
      val out = java.nio.file.Files.createTempDirectory("graft_zskip").toString
      val sorted = sortCol.fold(df)(c => df.repartition(1).sortWithinPartitions(c))
      sorted.drop("z").write.mode("overwrite")
        .option("maxRecordsPerFile", 2048)
        .option("parquet.block.size", 64 * 1024) // small row groups → many prune units
        .parquet(out)
      out
    }

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .where(col("d1").between(100, 160) && col("d2").between(200, 260))
      df.collect() // executes df's OWN queryExecution (count() would plan a new one)
      def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case s if s.children.isEmpty  => Seq(s)
        case s                        => s.children.flatMap(leaves)
      }
      val scans = leaves(df.queryExecution.executedPlan)
        .filter(_.metrics.contains("numOutputRows"))
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val zPath = write(zed, Some("z"))
    val uPath = write(zed, None)
    try {
      val total = rows.count()
      val zScanned = scanRows(zPath)
      val uScanned = scanRows(uPath)
      // the unsorted layout's row groups all intersect the box → ~full scan;
      // the z-sorted layout prunes most groups on (d1, d2) min/max together
      assert(uScanned > total / 2, s"unsorted scanned $uScanned of $total")
      assert(zScanned < uScanned / 2, s"z-sorted scanned $zScanned vs unsorted $uScanned")
    } finally {
      def rm(f: java.io.File): Unit = {
        val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(zPath)); rm(new java.io.File(uPath))
    }
  }

  test("skipping audit: z-order prunes the second dimension, linear layout cannot") {
    val audit = SparkEntry.queries("layout_skipping_audit")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val lin = audit("linear_d1")
    val zed = audit("zorder")
    // a layout bucketed on d1 alone has full-domain d2 ranges in every
    // bucket: the d2 predicate can never skip a block there
    assert(lin.getAs[Long]("skipped_d2_pred") == 0L, "linear layout skipped on d2")
    assert(zed.getAs[Long]("skipped_d2_pred") > 0L, "z-order did not skip on d2")
    // and on the combined predicate z-order must scan strictly fewer rows
    assert(zed.getAs[Long]("rows_scanned_both") < lin.getAs[Long]("rows_scanned_both"),
      "z-order scanned no fewer rows than the linear layout")
  }
}
