package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed `Aggregator` —
  * the "novel sketch" rung of the custom-operator ladder, in its mergeable
  * form: the state is the k smallest DISTINCT hash values seen; merging two
  * sketches is a sorted-merge + truncate, so partial aggregation (map-side
  * combine) and any merge tree give the same state.
  *
  * With hashes uniform on [0, P), the estimator is exact below k and
  * `(k−1)·P / h_k` at capacity (h_k = k-th smallest hash). Inputs are
  * md5-derived (graft.dedup.Hashing), so the sketch is DETERMINISTIC:
  * the DuckDB oracle recomputes the identical k-min set and estimate —
  * a property approx_count_distinct's HLL++ cannot offer across engines.
  */
class KmvSketch(k: Int, hashSpace: Double)
    extends Aggregator[Long, Seq[Long], Double] {

  override def zero: Seq[Long] = Vector.empty

  /** Insert keeping the buffer sorted, distinct, and capped at k. */
  override def reduce(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.contains(h)) b
    else if (b.size < k) (b :+ h).sorted
    else if (h < b.last) ((b :+ h).sorted).take(k)
    else b
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Double =
    if (b.size < k) b.size.toDouble
    else (k - 1).toDouble * hashSpace / b.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
