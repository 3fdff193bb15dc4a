package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over embedding columns (the "custom Expression over
  * composing built-ins" rung of the builder prompt's preference order).
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` evaluates
  * through Catalyst's higher-order-function machinery: a materialized
  * product array plus per-element lambda dispatch, per PAIR in an ANN/dedup
  * join. `vec_dot(a, b)` is one virtual call into a tight JIT-friendly loop
  * — same left-to-right double accumulation, so results are bit-identical
  * to the fold (and to DuckDB's `list_sum(list_transform(...))` oracles);
  * only the constant factor changes (~10× on the pair kernels).
  *
  * Norms are `vec_dot(v, v)` — the same `acc + x·x` fold.
  */
object VecExprs {

  /** Left-fold dot in doubles; null when any touched element is null
    * (mirrors the zip_with/aggregate null semantics on well-formed input).
    * Static → callable from generated code. */
  def dotOrNull(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Left-fold Σ(a[i]−b[i])² over [off, off+len) in exact 64-bit integer
    * arithmetic — the PQ subspace distance. Null on short arrays or null
    * elements (mirrors the zip_with/aggregate fold it replaces). Static →
    * callable from generated code. */
  def sqDistLOrNull(a: ArrayData, b: ArrayData, off: Int, len: Int): java.lang.Long = {
    if (off < 0 || len < 0) return null // out-of-domain window, never OOB reads
    val end = off + len
    if (a.numElements() < end || b.numElements() < end) return null
    var acc = 0L
    var i = off
    while (i < end) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Shared `vec_sqdist_l` builder (used by both the temp-function
    * registration below and `GraftExtensions`' injectFunction): validates
    * arity and that off/len fold to non-null integral literals — a
    * foldable-but-null (`CAST(NULL AS INT)`) or non-numeric ('3') argument
    * is an argument error, not an NPE/ClassCastException. */
  def sqDistBuilder(exprs: Seq[Expression]): VecSqDistL = {
    require(exprs.length == 4,
      s"vec_sqdist_l(arr, arr, off, len) takes 4 arguments, got ${exprs.length}")
    def intArg(e: Expression, name: String): Int = {
      require(e.foldable, s"vec_sqdist_l: $name must be an integer literal")
      e.eval() match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"vec_sqdist_l: $name must fold to a non-null integer, got " +
            (if (other == null) "NULL" else s"$other: ${e.dataType.simpleString}"))
      }
    }
    VecSqDistL(exprs.head, exprs(1), intArg(exprs(2), "off"), intArg(exprs(3), "len"))
  }

  /** SQL registration: `vec_dot(arrCol, arrCol)` over float/double arrays,
    * `vec_sqdist_l(arrCol, arrCol, off, len)` over bigint arrays (off/len
    * foldable int literals — the PQ subspace window). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist_l", sqDistBuilder, "scala_udf")
  }
}

/** array<float|double> × array<float|double> → double.
  *
  * Float and double arrays are accepted AS-IS (no per-row cast in the pair
  * kernels); anything else numeric — notably literal `array(0.123, ...)`,
  * whose plain decimal literals make it `array<decimal>` unless one element
  * happens to print in E-notation — is implicitly cast to `array<double>`
  * at analysis time, so resolution never depends on literal formatting or
  * session state (round-1 DATATYPE_MISMATCH on ann_lsh_hyperplane). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // result type inferred: AbstractDataType is private[sql] in Spark 4, so
  // the spec is built behind the graftshim bridge (see vecDotInputTypes)
  override def inputTypes =
    org.apache.spark.sql.graftshim.GraftSqlBridge.vecDotInputTypes

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dotOrNull(a.asInstanceOf[ArrayData], isFloat(left),
                       b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val tmp = ctx.freshName("graftVecDot")
      s"""
         |java.lang.Double $tmp = graft.plans.VecExprs.dotOrNull(
         |  $c1, ${isFloat(left)}, $c2, ${isFloat(right)});
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** array<bigint> × array<bigint> → bigint: exact Σ(a[i]−b[i])² over the
  * [off, off+len) subspace window. Replaces the
  * `aggregate(zip_with(slice(a,..), slice(b,..), ...))` fold in the PQ
  * kernels — per-pair that fold pays two array slices, a materialized
  * product array, and 2·len lambda dispatches; this is one virtual call
  * into a JIT-friendly loop with identical integer semantics. */
case class VecSqDistL(left: Expression, right: Expression, off: Int, len: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes =
    org.apache.spark.sql.graftshim.GraftSqlBridge.longArrayInputTypes

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.sqDistLOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], off, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val tmp = ctx.freshName("graftVecSqDistL")
      s"""
         |java.lang.Long $tmp = graft.plans.VecExprs.sqDistLOrNull($c1, $c2, $off, $len);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecSqDistL =
    copy(left = newLeft, right = newRight)
}
