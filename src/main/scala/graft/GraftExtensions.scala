package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for session-wide function registration — the
  * idiomatic packaging for custom Catalyst expressions:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * injects the engine's native expressions into every session (including
  * SQL-only clients), with no per-query `register` calls:
  *
  *  - `forage_period_end(date, anchorDate)` — the 16-day year-reset period
  *    calendar (W1) as O(1) arithmetic (graft.plans.ForagePeriod)
  *  - `vec_dot(arr, arr)` — codegen'd embedding dot product / norm kernel
  *    (graft.plans.VecExprs)
  *  - `payload_phash(binary)` — 48-bit perceptual media fingerprint
  *    (graft.plans.PhashExpr)
  *  - `vec_sqdist_l(arr, arr, off, len)` — exact BIGINT subspace squared
  *    distance, the PQ kernel (graft.plans.VecExprs)
  *
  * The per-query `register(spark)` calls remain for sessions built without
  * the config (the harness path); both routes construct the same
  * expression nodes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("forage_period_end"),
      new ExpressionInfo(classOf[graft.plans.ForagePeriodEnd].getName, "forage_period_end"),
      (exprs: Seq[Expression]) => graft.plans.ForagePeriod.builder(exprs)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.plans.VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => graft.plans.VecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("payload_phash"),
      new ExpressionInfo(classOf[graft.plans.PayloadPhash].getName, "payload_phash"),
      (exprs: Seq[Expression]) => graft.plans.PayloadPhash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist_l"),
      new ExpressionInfo(classOf[graft.plans.VecSqDistL].getName, "vec_sqdist_l"),
      (exprs: Seq[Expression]) => graft.plans.VecExprs.sqDistBuilder(exprs)))
    // native as-of join planning (graft.plans.AsOfJoinPlan.AsOfJoin nodes)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.AsOfJoinStrategy)
    // interval-join bucketing rewrite (fires when
    // spark.graft.rangeJoin.bucketWidth > 0)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
