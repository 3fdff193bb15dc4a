package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.col

/** Plan-shape helpers. */
object Shape {

  /** A global-ordering window over a relation whose cardinality is
    * BOUNDED BY A DIMENSION (calendar months, event types, vocabularies,
    * post-limit samples — never by data volume; each call site documents
    * its bound). Semantically identical to the bare `Window.orderBy`:
    * every row lands in one partition either way. Partitioning by a
    * constant declares that single partition INTENTIONAL, so WindowExec
    * does not print its "No Partition Defined … serious performance
    * degradation" warning for a frame that is provably a few hundred rows
    * at any SF. The key is [[graft.plans.BoundedKey]] — a non-foldable
    * constant, because a plain `lit(0)` is stripped back to the empty
    * (warning) spec by `EliminateWindowPartitions`. Volume-bound rankings
    * must keep a real partition key. */
  def boundedWindow(orderCols: Column*): WindowSpec =
    Window.partitionBy(
      org.apache.spark.sql.graftshim.GraftSqlBridge.columnOf(graft.plans.BoundedKey())
    ).orderBy(orderCols: _*)

  def boundedWindow(col0: String, rest: String*): WindowSpec =
    boundedWindow((col0 +: rest).map(col): _*)

  /** Global sort for a frame whose cardinality is BOUNDED BY A DIMENSION
    * (calendar months, event types, zone ids — never by data volume):
    * `coalesce(1).sortWithinPartitions` instead of `orderBy`.
    *
    * `orderBy` plans a rangepartitioning exchange — for a tiny finalizer
    * that is a whole extra shuffle stage (sampling pass + shuffle + sort)
    * after the aggregation exchange, and at any SF it moves a few hundred
    * rows. Collapsing to one partition first makes the local sort global
    * with ONE exchange total (the aggregation's), one fewer scheduled
    * stage. coalesce(1) is only sane when the row count is bounded by the
    * dimension — callers assert that by choosing this helper; volume-bound
    * results must keep orderBy's parallel range sort. */
  def boundedSort(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  def boundedSort(df: DataFrame, col0: String, rest: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions(col0, rest: _*)
}
