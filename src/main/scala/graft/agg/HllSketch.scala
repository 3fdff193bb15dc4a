package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog-shaped register sketch as a typed `Aggregator` — the
  * fixed-size companion to [[KmvSketch]]: state is 64 one-byte registers
  * regardless of cardinality, merging is elementwise max, so partial
  * aggregation and any merge tree give the same registers. This is the
  * sketch shape that distinct-counts a 100 TB corpus in one pass with
  * O(executors × 64) merge traffic.
  *
  * Determinism contract (what makes it oracle-checkable across engines,
  * unlike approx_count_distinct's HLL++): input is the raw 48-bit
  * md5-derived hash (graft.dedup.Hashing.sparkMd5Raw); bucket = low 6 bits;
  * rank ρ = 43 − bitlen(remaining 42 bits) (ρ = 43 when they are zero).
  * The raw estimate is α₆₄·64² / Σⱼ 2^−M[j] with 2^−M computed as
  * 1/(1<<M) — an EXACT power of two, and a sum of ≤64 such terms spans
  * < 52 bits of significand, so the sum is exact in ANY accumulation
  * order: DuckDB's unordered group sum reproduces it bit-for-bit. The
  * standard small-range correction applies below 2.5·m: linear counting
  * m·ln(m/V) over V zero registers — V has only 64 possible values, and
  * JVM Math.log and DuckDB ln were verified bit-identical on all of them,
  * so the correction is also engine-exact.
  */
class HllSketch extends Aggregator[Long, Seq[Int], Double] {

  private val M = 64 // registers (6 bucket bits)
  private val Alpha = 0.709 // standard α for m = 64

  override def zero: Seq[Int] = Vector.fill(M)(0)

  override def reduce(b: Seq[Int], x: Long): Seq[Int] = {
    val bucket = (x % M).toInt
    val rest = x / M // top 42 of the 48 hash bits
    val rho = 43 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) // 43 when rest = 0
    if (rho > b(bucket)) b.updated(bucket, rho) else b
  }

  override def merge(a: Seq[Int], b: Seq[Int]): Seq[Int] =
    Vector.tabulate(M)(j => math.max(a(j), b(j)))

  override def finish(b: Seq[Int]): Double = {
    var s = 0.0
    var j = 0
    while (j < M) { s += 1.0 / (1L << b(j)); j += 1 }
    val raw = Alpha * (M.toDouble * M.toDouble) / s
    val v = b.count(_ == 0)
    if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v) else raw
  }

  override def bufferEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HllSketch {
  /** The ρ computation as portable SQL over a 48-bit `rest = x // 64`
    * column — 42 integer-threshold CASE arms, identical text for Spark and
    * DuckDB, matching [[HllSketch.reduce]] exactly. */
  def rhoSql(rest: String): String = {
    val arms = (41 to 0 by -1).map { j =>
      s"WHEN $rest >= ${1L << j} THEN ${42 - j}"
    }
    s"CASE ${arms.mkString(" ")} ELSE 43 END"
  }
}
