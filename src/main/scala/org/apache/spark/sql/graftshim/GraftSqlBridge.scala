package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the library needs: constructing a
  * DataFrame from a custom LogicalPlan (`Dataset.ofRows`). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy that access scope —
  * everything else in the engine uses public APIs. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `AbstractDataType`/`TypeCollection` are `private[sql]` in Spark 4, so
    * the input-type spec for vec_dot is built here: each argument accepts
    * array<double>/array<float> AS-IS (no per-row cast in the pair kernels)
    * and anything else numeric is implicitly cast to the FIRST member —
    * array<double>, never lossy array<float>. */
  def vecDotInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = {
    import org.apache.spark.sql.types._
    val arg = TypeCollection(ArrayType(DoubleType), ArrayType(FloatType))
    Seq(arg, arg)
  }

  /** Input spec for vec_sqdist_l: two bigint arrays (scaled-integer
    * embedding components); integer arrays implicitly widen to long. */
  def longArrayInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = {
    import org.apache.spark.sql.types._
    Seq(ArrayType(LongType), ArrayType(LongType))
  }

  /** Wrap a custom Catalyst Expression as a user-facing Column
    * (`ExpressionUtils.column` is `private[sql]` in Spark 4). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
