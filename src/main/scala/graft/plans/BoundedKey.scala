package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A deliberately NON-FOLDABLE constant 0 — the partition key for
  * [[graft.core.Shape.boundedWindow]].
  *
  * A bare `lit(0)` partition key does not survive optimization: Spark 4's
  * `EliminateWindowPartitions` rule strips foldable partition expressions,
  * restoring the empty partition spec and with it WindowExec's "No
  * Partition Defined … serious performance degradation" warning — which is
  * noise for a window over a dimension-bounded relation (the caller
  * documents the bound). This leaf is deterministic and evaluates to the
  * same 0 for every row (so the exchange routes all rows to one partition,
  * exactly like the unpartitioned window it replaces), but reports
  * `foldable = false` so the optimizer leaves the partition spec alone.
  * Codegen is a literal 0 — zero per-row cost inside whole-stage codegen.
  */
case class BoundedKey() extends LeafExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"", isNull = FalseLiteral,
            value = JavaCode.literal("0", IntegerType))
  override def prettyName: String = "bounded_key"
}
