package graft

import graft.agg.TopKAgg
import org.scalatest.funsuite.AnyFunSuite

/** The property that lets TopKAgg replace a window sort: any insertion
  * order and any merge tree produce the same top-k state. */
class TopKAggSpec extends AnyFunSuite {

  test("top-k state is invariant to insertion order and merge shape") {
    val agg = new TopKAgg(5)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(40).toDouble, rnd.nextLong().abs))
    val expect = rows.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(5)

    // sequential fold, shuffled fold, and a 7-way partitioned merge tree
    val seqState = rows.foldLeft(agg.zero)(agg.reduce)
    val shufState = rnd.shuffle(rows).foldLeft(agg.zero)(agg.reduce)
    val parts = rows.grouped(72).map(_.foldLeft(agg.zero)(agg.reduce))
    val mergedState = parts.foldLeft(agg.zero)(agg.merge)

    assert(agg.finish(seqState) == expect)
    assert(agg.finish(shufState) == expect)
    assert(agg.finish(mergedState) == expect)
  }

  test("duplicate scores tie-break on id; fewer than k rows pass through") {
    val agg = new TopKAgg(3)
    val rows = Seq((1.0, 9L), (1.0, 2L), (1.0, 5L), (1.0, 7L))
    assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)) ==
           Seq((1.0, 2L), (1.0, 5L), (1.0, 7L)))
    val two = Seq((3.0, 1L), (2.0, 2L))
    assert(agg.finish(two.foldLeft(agg.zero)(agg.reduce)) == two)
  }
}
