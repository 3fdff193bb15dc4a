package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators: pointer-jump connected components, distributed PCA
  * power iteration, sliding streaming windows. Correctness vs DuckDB is
  * the Verify gate's job; these assert the structural and algebraic
  * properties each op promises. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("pointer-jump components reach exactly the min-label fixpoint") {
    // the accelerated O(log d) algorithm must land on the same partition
    // as the plain O(d) propagation — same labels, same components
    val slow = SparkEntry.queries("dedup_cluster_components")(spark, sf)
      .select(col("doc_id"), col("cluster_id").as("label")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = SparkEntry.queries("dedup_components_pointer_jump")(spark, sf)
      .select(col("doc_id"), col("component")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow, "pointer-jump labels diverge from min-label labels")
  }

  test("pointer-jump component sizes are consistent with the labels") {
    val out = SparkEntry.queries("dedup_components_pointer_jump")(spark, sf).collect()
    val byComp = out.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (c, rows) =>
      assert(rows.forall(_.getAs[Long]("comp_size") == rows.length),
             s"component $c reports size != member count")
      assert(rows.map(_.getAs[Long]("doc_id")).min == c,
             s"component id $c is not its min doc_id")
    }
  }

  test("PCA power iteration: unit vector, dominant direction, map-side partials") {
    val out = SparkEntry.queries("ml_pca_power_iter")(spark, sf).collect()
    assert(out.length == 64)
    val v = out.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("loading"))
    val n2 = v.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-9, s"not unit norm: $n2")
    // Rayleigh quotient must not shrink across one extra exact iteration
    // (power iteration is monotone on the Gram quadratic form)
    import spark.implicits._
    val xs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    def quad(w: Array[Double]): Double =
      xs.map(x => { val d = x.zip(w).map { case (a, b) => a * b }.sum; d * d }).sum
    val v0 = Array.fill(64)(0.125)
    assert(quad(v) >= quad(v0), "3 iterations did not improve on the start vector")
    // the plan aggregates 64 pos groups with map-side partials and carries
    // the iterate as a broadcast, never a shuffle of the data by pos-value
    val p = SparkEntry.queries("ml_pca_power_iter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), "v must broadcast, not cartesian")
  }

  test("sliding windows: each event lands in exactly 3 windows") {
    val out = SparkEntry.queries("stream_sliding_windows")(spark, sf)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    val events = graft.core.Tables.events(spark, sf).count()
    assert(total == 3 * events, s"expected ${3 * events} window memberships, got $total")
  }
}
