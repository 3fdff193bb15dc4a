package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Plan-shape helpers. */
object Shape {

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
