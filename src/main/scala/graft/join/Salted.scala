package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot grouping keys (builder prompt: "skewed keys →
  * salting or AQE skew-join"). The reference never needs this (its keys are
  * uniform grid points), but at 100 TB a handful of hot keys (one language,
  * one event type, one zone) would pin single reducers.
  *
  * Two-phase salted aggregation: append a deterministic salt derived from a
  * high-cardinality column, partially aggregate on (key, salt) — spreading
  * each hot key over `salts` reducers — then re-aggregate on the key. For
  * algebraic aggregates (sum/count/min/max) the result is identical to the
  * direct group-by, which is exactly what the DuckDB oracle checks.
  */
object Salted {

  /** Deterministic salt in [0, salts) from `entropy` (not rand() — keeps
    * results reproducible and the oracle exact). */
  def saltFrom(entropy: Column, salts: Int): Column =
    pmod(hash(entropy), lit(salts))

  /** Two-phase sum/count over a potentially skewed key. */
  def saltedSumCount(df: DataFrame, key: String, valueExpr: Column,
                     entropy: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", saltFrom(entropy, salts))
      .withColumn("_v", valueExpr)
      .groupBy(col(key), col("_salt"))
      .agg(sum(col("_v")).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("total"), sum(col("_pn")).as("n"))

  /** Salted equi-join for a skewed FACT key against a dim too big to
    * broadcast: the fact side salts deterministically, the dim side is
    * replicated once per salt, and the join key becomes (key, salt) — each
    * hot key's rows spread over `salts` reducers instead of pinning one.
    * Row-identical to the plain join (every fact row still meets its dim
    * row, under exactly one salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 entropy: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltFrom(entropy, salts))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedFact.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
