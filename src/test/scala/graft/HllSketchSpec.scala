package graft

import graft.agg.HllSketch
import org.scalatest.funsuite.AnyFunSuite

/** The HLL register sketch's defining properties: fixed-size state whose
  * merge is elementwise max (so any partitioning/merge order is exact), a
  * ρ computation that matches the generated SQL CASE arms, and an estimate
  * within the expected error band for m = 64 registers. */
class HllSketchSpec extends AnyFunSuite {

  private def hashes(n: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(math.abs(rnd.nextLong()) % (1L << 48)) // 48-bit like md5Raw
  }

  test("merge-order invariance: sequential fold == arbitrary partition merges") {
    val agg = new HllSketch
    val hs = hashes(2000, 11L)
    val sequential = hs.foldLeft(agg.zero)(agg.reduce)
    val partitioned = hs.grouped(59).toSeq
      .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce))
      .reverse
      .foldLeft(agg.zero)(agg.merge)
    assert(sequential == partitioned)
    assert(agg.finish(sequential) == agg.finish(partitioned))
  }

  test("rho in reduce matches the SQL CASE arms at the bit boundaries") {
    // Scala-side reference of the generated CASE: 43 - bitlen(rest).
    def rhoRef(rest: Long): Int =
      if (rest == 0) 43 else 43 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    val agg = new HllSketch
    // exercise exact powers of two and their neighbours across the 42 bits
    val rests = (0 to 41).flatMap(j => Seq((1L << j) - 1, 1L << j, (1L << j) + 1))
      .filter(r => r >= 0 && r < (1L << 42))
    rests.foreach { rest =>
      val x = rest * 64 + 5 // bucket 5
      val b = agg.reduce(agg.zero, x)
      assert(b(5) == rhoRef(rest), s"rest=$rest")
    }
  }

  test("estimate within the m=64 error band; duplicates don't move registers") {
    val agg = new HllSketch
    val many = hashes(5000, 3L)
    val st = many.foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(st)
    val exact = many.distinct.size.toDouble
    assert(math.abs(est - exact) / exact < 0.5) // 1.04/sqrt(64) ~ 13% stderr; wide guard
    // feeding the same values again is a no-op on the registers
    val st2 = many.foldLeft(st)(agg.reduce)
    assert(st2 == st)
  }
}
