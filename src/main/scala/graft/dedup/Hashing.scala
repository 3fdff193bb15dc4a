package graft.dedup

/** Portable deterministic hashing shared by the Spark implementations and
  * the generated DuckDB oracle SQL.
  *
  * Both engines compute md5 identically; we take the first 12 hex chars as a
  * 48-bit integer (`conv(…,16,10)` in Spark, nibble arithmetic in DuckDB)
  * and run universal-hash permutations h_j(x) = (a_j·(x mod P) + b_j) mod P
  * over it. Everything is exact 64-bit integer arithmetic — bit-identical
  * across engines, unlike engine-native hash() functions.
  */
object Hashing {

  val P: Long = 1000000007L
  val HexChars = 12

  /** Deterministic permutation coefficients from a fixed LCG seed. */
  def coefficients(n: Int, seed: Long = 0x5DEECE66DL): Seq[(Long, Long)] = {
    var state = seed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs(state % (P - 1)) + 1 // in [1, P-1]
    }
    Seq.fill(n)((next(), next()))
  }

  /** Spark SQL expression: md5 of `e`, first 12 hex chars, as a raw 48-bit
    * BIGINT (no modulus — uniform bits for bucket/rank sketches). */
  def sparkMd5Raw(e: String): String =
    s"CAST(conv(substring(md5($e), 1, $HexChars), 16, 10) AS BIGINT)"

  /** Spark SQL expression: md5 of `e`, first 12 hex chars, as BIGINT mod P. */
  def sparkMd5Mod(e: String): String = s"${sparkMd5Raw(e)} % $P"

  /** DuckDB expression computing the same raw 48-bit value via nibble
    * arithmetic (DuckDB has no base-16 conv). */
  def duckMd5Raw(e: String): String = {
    val terms = (1 to HexChars).map { i =>
      val mult = math.pow(16, HexChars - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * $mult"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** DuckDB expression computing the same value as [[sparkMd5Mod]]. */
  def duckMd5Mod(e: String): String = s"${duckMd5Raw(e)} % ${P}"

  /** Permutation expression (same string for both engines given an integer
    * subexpression `x` already reduced mod P). */
  def permute(x: String, a: Long, b: Long): String = s"(($a * $x) + $b) % $P"
}
