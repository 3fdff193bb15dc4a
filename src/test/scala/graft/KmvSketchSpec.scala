package graft

import graft.agg.KmvSketch
import org.scalatest.funsuite.AnyFunSuite

/** The KMV sketch's defining property: any partitioning/merge order of the
  * input gives the identical state, so distributed partial aggregation is
  * exact-deterministic. */
class KmvSketchSpec extends AnyFunSuite {

  private val P = 1000000007.0
  private def hashes(n: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(math.abs(rnd.nextLong()) % 1000000007L)
  }

  test("merge-order invariance: sequential fold == arbitrary partition merges") {
    val agg = new KmvSketch(16, P)
    val hs = hashes(500, 7L)
    val sequential = hs.foldLeft(agg.zero)(agg.reduce)
    val partitioned = hs.grouped(37).toSeq
      .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce))
      .reverse // merge in a different order than the data arrived
      .foldLeft(agg.zero)(agg.merge)
    assert(sequential == partitioned)
    assert(agg.finish(sequential) == agg.finish(partitioned))
  }

  test("exact below capacity, stable estimate at capacity") {
    val agg = new KmvSketch(64, P)
    val few = hashes(20, 1L).distinct
    assert(agg.finish(few.foldLeft(agg.zero)(agg.reduce)) == few.size.toDouble)
    val many = hashes(5000, 2L)
    val est = agg.finish(many.foldLeft(agg.zero)(agg.reduce))
    val exact = many.distinct.size.toDouble
    assert(math.abs(est - exact) / exact < 0.35) // k=64 → ~12% stderr; wide guard
  }
}
