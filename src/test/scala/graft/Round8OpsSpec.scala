package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-8 guards. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** `ml_pca_power_iter`'s cross-engine bit-exactness argument quantizes
    * u·x to 10¹² fixed-point before the cross-row DECIMAL(38,0) sum; that
    * is only order-free-exact while the embeddings stay ≈unit-norm (then
    * |u·x| ≤ ~1 and both engines compute the identical double before the
    * floor). TESTDATA.md's generator L2-normalizes in float32, so the max
    * norm is 1 ± a few float32 ulps. If a future testdata regeneration
    * ships unnormalized embeddings, fail HERE with a message, not in the
    * oracle gate as an opaque hash mismatch. */
  test("pca quantization precondition: embeddings are unit-norm (±1e-5)") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val maxNorm = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(expr(
          "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (a, b) -> a + b)) AS n"))
        .agg(max("n")).head().getDouble(0)
      assert(math.abs(maxNorm - 1.0) < 1e-5,
        s"$sf embeddings max L2 norm $maxNorm is not ≈1: ml_pca_power_iter's " +
          "fixed-point quantization precondition no longer holds — revisit " +
          "the DECIMAL(38,0) scale before trusting its oracle hash")
    }
  }
}
