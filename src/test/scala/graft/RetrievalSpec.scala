package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval operators: BM25 lexical top-k and reciprocal-rank-fusion
  * hybrid. Correctness vs DuckDB is the Verify gate's job; these assert
  * the ranking contracts the ops promise (score recomputation from raw
  * tokens, rank-permutation structure, fusion arithmetic). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("bm25: ranks contiguous, scores descending, score recomputes from raw tokens") {
    val out = SparkEntry.queries("text_bm25_topk")(spark, sf).collect()
    val queries = Map(1 -> Seq("spark", "join"), 2 -> Seq("hash", "table", "scan"),
                      3 -> Seq("window", "agg"), 4 -> Seq("vector", "stream", "merge"))
    assert(out.map(_.getAs[Int]("query_id")).toSet == queries.keySet)
    val byQ = out.groupBy(_.getAs[Int]("query_id"))
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
             s"q$qid ranks not contiguous")
      // descending scores; equal scores must be in doc_id order
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
          assert(sa > sb || (sa == sb &&
                 a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")),
                 s"q$qid rank order violated at ${b.getAs[Int]("rank")}")
        case _ => ()
      }
    }
    // exact recomputation of every returned score from the raw corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[collection.Seq[String]]("toks").toSeq).toMap
    val nDocs = docs.size
    val avgdl = docs.values.map(_.length.toLong).sum.toDouble / nDocs
    val allTerms = queries.values.flatten.toSeq.distinct
    val dfMap = allTerms.map(t => t -> docs.values.count(_.contains(t))).toMap
    def bm25(term: String, doc: Seq[String]): Double = {
      val tf = doc.count(_ == term).toDouble
      if (tf == 0) 0.0
      else ((nDocs.toDouble - dfMap(term).toDouble + 0.5) / (dfMap(term).toDouble + 0.5)) *
           ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (doc.length.toDouble / avgdl))))
    }
    out.foreach { r =>
      val terms = queries(r.getAs[Int]("query_id"))
      val doc = docs(r.getAs[Long]("doc_id"))
      val expect = terms.map(bm25(_, doc)).sum // fixed order = query order, like the op
      assert(r.getAs[Double]("score") == expect,
             s"q${r.getAs[Int]("query_id")} doc ${r.getAs[Long]("doc_id")}: " +
             s"${r.getAs[Double]("score")} != $expect")
      assert(terms.exists(doc.contains), "returned doc matches no query term")
    }
  }

  test("rrf: fusion arithmetic exact, dense ranks form a permutation per query") {
    val out = SparkEntry.queries("ann_rrf_hybrid")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("qid")).toSet == Set(0L, 1L, 2L, 3L))
    out.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      // rrf recomputes exactly from the two ranks
      sorted.foreach { r =>
        val expect = 1.0 / (60.0 + r.getAs[Int]("r_dense").toDouble) +
                     1.0 / (60.0 + r.getAs[Int]("r_lex").toDouble)
        assert(r.getAs[Double]("rrf") == expect, s"q$qid fusion drift")
      }
      // fused order follows rrf desc with bid tiebreak
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
          assert(ra > rb || (ra == rb && a.getAs[Long]("bid") < b.getAs[Long]("bid")))
        case _ => ()
      }
      // ranks within a query never repeat and stay in the candidate range
      val n = spark.read.parquet(s"$sf/embeddings.parquet").count() - 1 // minus the query itself
      Seq("r_dense", "r_lex").foreach { c =>
        val rs = rows.map(_.getAs[Int](c))
        assert(rs.distinct.length == rs.length, s"q$qid $c repeats")
        assert(rs.forall(r => r >= 1 && r <= n), s"q$qid $c out of range")
      }
      // the fused winner beats every candidate, including whoever is
      // dense-rank-1 — so its rrf can never drop below that candidate's
      // guaranteed floor of 1/(60+1)
      assert(sorted.head.getAs[Double]("rrf") >= 1.0 / 61.0)
    }
  }
}
