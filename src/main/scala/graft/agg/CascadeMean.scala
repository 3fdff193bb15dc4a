package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10: the zonal fallback cascade as a reusable typed `Aggregator`
  * (SURVEY.md A4/A5 "custom Aggregator[IN, BUF, OUT] if we want it as a
  * single agg function"). Input is (value, strictFlag); output is the
  * cascade mean — strict mean when any strict members exist, else the
  * all-touched mean, else NaN.
  *
  * Exactness: values are 2-decimal, accumulated as integer cents so the
  * merge order (partition-parallel) cannot perturb the sum; the final
  * division is a single deterministic double op — this is what lets the
  * result hash-match a DuckDB decimal-sum oracle bit-for-bit.
  */
object CascadeMean extends Aggregator[(Double, Boolean), CascadeBuf, Double] {

  override def zero: CascadeBuf = CascadeBuf(0L, 0L, 0L, 0L)

  override def reduce(b: CascadeBuf, in: (Double, Boolean)): CascadeBuf = {
    val cents = math.round(in._1 * 100)
    b.nAll += 1
    b.centsAll += cents
    if (in._2) { b.nStrict += 1; b.centsStrict += cents }
    b
  }

  override def merge(a: CascadeBuf, b: CascadeBuf): CascadeBuf =
    CascadeBuf(a.nStrict + b.nStrict, a.centsStrict + b.centsStrict,
               a.nAll + b.nAll, a.centsAll + b.centsAll)

  override def finish(b: CascadeBuf): Double =
    if (b.nStrict > 0) (b.centsStrict / 100.0) / b.nStrict
    else if (b.nAll > 0) (b.centsAll / 100.0) / b.nAll
    else Double.NaN

  override def bufferEncoder: Encoder[CascadeBuf] = Encoders.product[CascadeBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

final case class CascadeBuf(var nStrict: Long, var centsStrict: Long,
                            var nAll: Long, var centsAll: Long)
