package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime half of the skew story next to the
  * manual salting of `a_salted_two_phase`: a hot key that dwarfs every
  * other partition is split by AQE at execution time, no query rewrite. */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 200k rows with a fat payload; every other key is tiny.
      // The pad is md5-derived — constant padding would compress to nothing
      // in the shuffle and AQE sizes partitions by compressed bytes.
      val fact = spark.range(220000)
        .selectExpr("CASE WHEN id < 200000 THEN 0 ELSE id % 100 END AS k",
                    "repeat(md5(CAST(id AS STRING)), 4) AS pad")
      val dim = spark.range(100).selectExpr("id AS k", "id * 2 AS w")
      // no same-key aggregation downstream: AQE may only split a skewed
      // join partition when nothing later depends on its hash clustering
      // the pad must survive column pruning, or the hot partition shuffles
      // only 8-byte keys and never crosses the skew threshold
      val joined = fact.join(dim, "k")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr("length(pad) + w")))
      // collect() drives THIS Dataset's QueryExecution (head() would plan a
      // separate limit query and leave joined's adaptive plan unexecuted)
      assert(joined.collect().head.getLong(0) > 0)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p                        => p.toString
      }
      assert(finalPlan.contains("skew="), s"expected a skew-handled join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("pagerank-shaped contribution sum survives a hub-heavy graph: partial aggregation bounds the hot key by #map tasks, not degree") {
    // graph_pagerank / graph_sssp aggregate per-destination contributions
    // with groupBy().sum() — the skewed keys are supplier hubs. The scale
    // claim: a hub of ANY in-degree costs the reducer only #mapTasks
    // partial rows, because the map-side partial aggregate collapses each
    // task's messages per key before the exchange. Quantified here on a
    // 90%-one-key fixture by the exchange's own write metrics.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan: read exchange metrics directly
    try {
      val nEdges = 200000L
      val edges = spark.range(nEdges).selectExpr(
        // 180k messages hit the single hub; the rest spread over 1000 keys
        "CASE WHEN id % 10 < 9 THEN 'hub' ELSE concat('n', id % 1000) END AS node",
        "CAST(1000 AS BIGINT) AS contrib")
      val agg = edges.groupBy("node").agg(
        org.apache.spark.sql.functions.sum("contrib").as("in_sum"))
      val rows = agg.collect()
      assert(rows.find(_.getString(0) == "hub").get.getLong(1) == 180000L * 1000L)
      val exec = agg.queryExecution.executedPlan
      // partial + final aggregate pair around the exchange
      assert(exec.collect { case a: BaseAggregateExec => a }.size == 2, exec.toString)
      val shuffled = exec.collect { case s: ShuffleExchangeExec => s }
        .map(_.metrics("shuffleRecordsWritten").value).sum
      val mapTasks = edges.rdd.getNumPartitions
      // every map task emits at most (1000 cold keys + 1 hub) partials
      assert(shuffled <= mapTasks * 1001L,
             s"partial aggregation failed to collapse the hub: $shuffled records shuffled")
      assert(shuffled < nEdges / 20, s"shuffle carried per-message rows: $shuffled")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
