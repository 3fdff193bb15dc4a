package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed `Aggregator` — the scale-correct
  * form of the `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
  * idiom. The window form SORTS every group's full history inside one
  * shuffle; this aggregator's state never exceeds k rows, so the map-side
  * combine reduces each partition to ≤ k rows per group BEFORE the
  * exchange and the shuffle carries O(groups × k), not O(rows). At 100 TB
  * that's the difference between a bounded merge and a spilling sort.
  *
  * Ordering is (value DESC, id ASC) — id is a unique tiebreak, so the
  * result is total-order deterministic and any merge tree (partial
  * aggregation, AQE coalescing) yields the same state.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // "better" ranks first. java.lang.Double.compare is a TOTAL order (NaN
  // sorts greatest, matching SQL's ORDER BY v DESC NaN placement) — a
  // partial-order `>` would make NaN tie with everything and the kept set
  // depend on arrival/merge order, breaking the invariance guarantee.
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (b.size < k) (b :+ x).sortWith(lt)
    else if (lt(x, b.last)) ((b :+ x).sortWith(lt)).take(k)
    else b

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(b, x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
