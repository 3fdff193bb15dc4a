package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import graft.window.Periods
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties (SURVEY §5): the period-window operator's closed
  * form vs the transcription calendar, the quantized-join cell contract,
  * and the KMV sketch's merge-order invariance. These run as their own sbt
  * test framework (100 generated cases each by default). */
object PropertiesCheck extends Properties("graft") {

  // ---- W1: closed-form period end ≡ the calendar transcription, any date --

  private val genAnchor: Gen[LocalDate] =
    Gen.choose(0, 3650).map(LocalDate.parse("2018-01-01").plusDays(_))
  private val genOffset: Gen[Int] = Gen.choose(0, 2000)

  property("forage_period_end closed form equals the composite calendar") =
    forAll(genAnchor, genOffset) { (anchor, off) =>
      val d = anchor.plusDays(off.toLong)
      // calendar far enough out that d's period is complete
      val ps = Periods.compositePeriods(anchor, d.plusDays(40))
      val expected = ps.find(p => !p.start.isAfter(d) && !p.end.isBefore(d)).get.end
      val got = graft.plans.ForagePeriod.periodEndDaysOrMin(
        d.toEpochDay.toInt, anchor.toEpochDay.toInt)
      Prop(got == expected.toEpochDay.toInt) :| s"d=$d anchor=$anchor exp=$expected"
    }

  property("dates before the anchor have no period") =
    forAll(genAnchor, Gen.choose(1, 1000)) { (anchor, back) =>
      graft.plans.ForagePeriod.periodEndDaysOrMin(
        (anchor.toEpochDay - back).toInt, anchor.toEpochDay.toInt) == Int.MinValue
    }

  property("period calendar is contiguous and complete-window only") =
    forAll(genAnchor, Gen.choose(20, 400)) { (anchor, span) =>
      val current = anchor.plusDays(span.toLong)
      val ps = Periods.compositePeriods(anchor, current)
      val contiguous = ps.zip(ps.drop(1)).forall { case (a, b) => b.start == a.end.plusDays(1) }
      val complete = ps.forall(p => !p.end.isAfter(current))
      val bounded = ps.forall(p => ChronoUnit.DAYS.between(p.start, p.end) < 16)
      Prop(contiguous && complete && bounded)
    }

  // ---- J2/P4: quantized-join cell contract ------------------------------

  private def cell(v: Double, origin: Double, step: Double): Long =
    math.floor((v - origin) / step).toLong // the gridSnap expression's math

  property("same grid cell implies distance < step; >= step implies different cell") =
    forAll(Gen.choose(-1e6, 1e6), Gen.choose(-1e6, 1e6), Gen.choose(0.001, 1000.0)) {
      (a, b, step) =>
        val (ca, cb) = (cell(a, 0.0, step), cell(b, 0.0, step))
        val sameImpliesClose = ca != cb || math.abs(a - b) < step
        val farImpliesDiff = math.abs(a - b) < step || ca != cb
        Prop(sameImpliesClose && farImpliesDiff)
    }

  // ---- §2.10: KMV sketch is merge-order invariant -----------------------

  private val kmv = new graft.agg.KmvSketch(16, graft.dedup.Hashing.P.toDouble)

  property("KMV sketch: any partitioning and merge order gives the same estimate") =
    forAll(Gen.listOf(Gen.choose(1L, graft.dedup.Hashing.P - 1)),
           Gen.choose(1, 8), Gen.long) { (hashes, nParts, seed) =>
      val sequential = hashes.foldLeft(kmv.zero)(kmv.reduce)
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(hashes)
      val parts = (0 until nParts).map(i => shuffled.zipWithIndex.collect {
        case (h, j) if j % nParts == i => h
      })
      val partials = parts.map(_.foldLeft(kmv.zero)(kmv.reduce))
      val merged = rnd.shuffle(partials).foldLeft(kmv.zero)(kmv.merge)
      Prop(kmv.finish(merged) == kmv.finish(sequential)) :|
        s"n=${hashes.size} parts=$nParts"
    }

  // ---- Banding: pigeonhole completeness of the banded-Hamming join -------

  /** Signatures within maxHamming=bands-1 bit flips MUST collide in at
    * least one band — the property that makes the banded equi-join a
    * complete (no-false-negative) candidate generator. Mirrors the band
    * extraction in graft.dedup.Banding (width w, value = (sig >> b·w) mod
    * 2^w) for the two deployed configs: 24-bit/4 bands and 48-bit/4 bands. */
  private def bandsOf(sig: Long, bits: Int, bands: Int): Seq[Long] = {
    val w = bits / bands
    (0 until bands).map(b => (sig >> (b * w)) % (1L << w))
  }

  property("banded-Hamming: any pair within maxHamming shares a band") =
    forAll(Gen.choose(0L, (1L << 48) - 1), Gen.listOfN(3, Gen.choose(0, 47)),
           Gen.oneOf((24, 4), (48, 4))) { case (sig0, flips, (bits, bands)) =>
      val sig = sig0 % (1L << bits)
      val flipped = flips.filter(_ < bits).distinct
        .foldLeft(sig)((s, j) => s ^ (1L << j)) // hamming = |distinct flips| <= 3
      val shared = bandsOf(sig, bits, bands).zip(bandsOf(flipped, bits, bands))
        .exists { case (a, b) => a == b }
      Prop(shared) :| s"sig=$sig flipped=$flipped bits=$bits"
    }

  // ---- Z-order clustering key (zorder_cluster_key's interleave model) ----

  private def zEncode(a: Long, b: Long): Long =
    (0 until 10).map(i => ((((a >> i) & 1) << (2 * i)) |
                           (((b >> i) & 1) << (2 * i + 1)))).sum

  property("z-order interleave is a bijection on 10-bit pairs") =
    forAll(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)) { (a, b) =>
      val z = zEncode(a, b)
      val da = (0 until 10).map(i => ((z >> (2 * i)) & 1) << i).sum
      val db = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
      Prop(da == a && db == b && z >= 0 && z < (1L << 20)) :| s"a=$a b=$b z=$z"
    }

  property("same 1024-code z bucket implies both dims within a 32-wide tile") =
    forAll(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L),
           Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)) { (a1, b1, a2, b2) =>
      val sameBucket = (zEncode(a1, b1) >> 10) == (zEncode(a2, b2) >> 10)
      // bucket = 10 high bits = the 5 high bits of each dim → a 32×32 tile
      !sameBucket || (math.abs(a1 - a2) < 32 && math.abs(b1 - b2) < 32)
    }
}
