package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 optimization invariants: the component-label loops now iterate
  * only over edge endpoints and re-attach isolated docs afterwards, and
  * convergence is counted from an in-checkpoint flag instead of a
  * next⋈labels join. These assert the parts the oracle compare exercises
  * only indirectly: total coverage, the isolated-doc fixpoint, and the
  * min-label invariant.
  */
class Round12OptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("clusterLabels covers every doc exactly once after endpoint-only iteration") {
    val docs = graft.core.Tables.documents(spark, dir).select("doc_id")
    val labels = graft.queries.DedupQueries.clusterLabels(spark, dir)
    assert(labels.count() == docs.count(), "one label row per document")
    assert(labels.select("doc_id").distinct().count() == docs.count(),
      "no duplicate doc_ids from the isolated-doc re-attach union")
  }

  test("clusterLabels: labels are min-ids — never above the doc's own id") {
    val labels = graft.queries.DedupQueries.clusterLabels(spark, dir)
    assert(labels.where(col("label") > col("doc_id")).isEmpty,
      "a min-label fixpoint can only ever lower a label")
    // every label is itself a member of its own cluster (the representative)
    val reps = labels.where(col("doc_id") === col("label"))
      .select(col("label").as("l"))
    assert(labels.join(reps, labels("label") === reps("l"), "left_anti").isEmpty,
      "every cluster label is the id of a doc labeled with itself")
  }

  test("pointer-jump sizes: component sizes sum back to the doc count") {
    val out = SparkEntry.queries("dedup_components_pointer_jump")(spark, dir)
    val n = graft.core.Tables.documents(spark, dir).count()
    assert(out.count() == n)
    val perComp = out.select("component", "comp_size").distinct()
    val total = perComp.agg(sum("comp_size")).collect()(0).getLong(0)
    assert(total == n, "comp_size over distinct components partitions the corpus")
  }
}
