package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared banded-Hamming near-dup join, used by `dedup_simhash` (24-bit
  * signatures, 4×6-bit bands) and `mm_phash_dedup` (48-bit, 4×12): explode
  * each signature into equal bit-bands, self-join on band equality — the
  * equi-join that bounds the pair space — then verify the exact Hamming
  * distance on candidates only. Pigeonhole-complete: `maxHamming` bit flips
  * cannot touch all `bands` bands when maxHamming < bands, so every true
  * near-dup pair collides in at least one band.
  */
object Banding {

  /** @param df     (id, signature) frame; signature is a non-negative BIGINT
    *               of `bits` significant bits
    * @return (a_id, b_id, sig_a, sig_b, hamming) for pairs with
    *         hamming ≤ maxHamming, a_id < b_id
    */
  def bandedHammingJoin(df: DataFrame, idCol: String, sigCol: String,
                        bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(bits % bands == 0, s"$bits bits must split into $bands equal bands")
    require(maxHamming < bands, "pigeonhole completeness needs maxHamming < bands")
    val w = bits / bands
    def bandVal(sig: String, b: Int) = s"(shiftright($sig, ${b * w}) % ${1L << w})"
    val banded = df.select(col(idCol), col(sigCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
               expr(s"shiftright($sigCol, ${b * w}) % ${1L << w}").as("band_val"))
      }: _*)).as("band"))
      .select(col(idCol), col(sigCol), col("band.band_idx"), col("band.band_val"))
    // first-match-band dedup instead of a distinct(): a pair colliding in
    // several bands is kept only where band_idx is its LOWEST matching
    // band (all lower bands must differ). The predicate is a map-side
    // filter on the join output, so the multi-band duplicates never reach
    // an exchange — on a near-dup-dense corpus the distinct() it replaces
    // was the most expensive shuffle in the plan.
    val firstMatch = (0 until bands).map { b =>
      val lowerDiffer = (0 until b).map(i =>
        s"${bandVal("sig_a", i)} != ${bandVal("sig_b", i)}")
      s"WHEN band_idx = $b THEN ${if (lowerDiffer.isEmpty) "true" else lowerDiffer.mkString(" AND ")}"
    }.mkString("CASE ", " ", " END")
    banded.as("a")
      .join(banded.as("b"),
            col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
              col(s"a.$sigCol").as("sig_a"), col(s"b.$sigCol").as("sig_b"),
              col("a.band_idx").as("band_idx"))
      .where(expr(firstMatch))
      .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS INTEGER)"))
      .where(col("hamming") <= maxHamming)
      .drop("band_idx")
  }
}
