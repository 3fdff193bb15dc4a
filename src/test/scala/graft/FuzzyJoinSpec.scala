package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the j_fuzzy_prefix_join blocking scheme: positional
  * 8-char chunks over a 32-char key, Levenshtein-verified at ≤ 3.
  * The blocking claim (query Scaladoc) is pigeonhole losslessness for
  * substitution-only edits — asserted here against brute force. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Int)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // reuse the real registry implementation against the scratch table dir
    SparkEntry.queries("j_fuzzy_prefix_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
  }

  test("substitution-only edits within the threshold are always found (pigeonhole)") {
    val base = "abcdefghijklmnopqrstuvwxyz012345" // 32 chars
    def sub(s: String, at: Seq[Int]): String =
      at.foldLeft(s)((acc, i) => acc.updated(i, if (acc(i) == 'Z') 'Y' else 'Z'))
    // 3 substitutions spread across 3 different chunks: one chunk intact
    val docs = Seq(1L -> base, 2L -> sub(base, Seq(0, 9, 17)),
                   // 4 substitutions, one per chunk: blocking MAY miss; dist 4 > 3 anyway
                   3L -> sub(base, Seq(1, 10, 18, 26)))
    val out = run(docs)
    assert(out.contains((1L, 2L, 3)), out.toString)     // found, exact distance
    assert(!out.exists(p => p._1 == 1L && p._2 == 3L))  // beyond threshold: excluded
  }

  test("identical prefixes pair at distance 0; disjoint prefixes produce no candidates") {
    val a = "the quick brown fox jumps over!!" // 32 chars
    val out = run(Seq(10L -> (a + " tail one"), 11L -> (a + " other tail"),
                      12L -> "completely different prefix here"))
    assert(out == Seq((10L, 11L, 0)), out.toString)
  }
}
