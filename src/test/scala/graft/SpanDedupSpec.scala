package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level dedup spans and bigram-LM fluency (sf0.001 tables).
  *
  * The span check is semantic, not structural: every reported span is
  * re-sliced out of BOTH documents' token arrays and the two slices must be
  * literally identical — the operator's whole claim. Maximality is checked
  * at the left edge (extending one token left must break the match or fall
  * off a document edge).
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("every duplicated span re-slices to identical token runs in both docs") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val out = q("dedup_substring_spans")
      .join(docs.select(col("doc_id").as("a_id"), col("t").as("ta")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("t").as("tb")), "b_id")
      .withColumn("sa", expr("slice(ta, a_start, span_tokens)"))
      .withColumn("sb", expr("slice(tb, b_start, span_tokens)"))
      .cache()
    assert(out.count() > 0)
    assert(out.where(col("sa") =!= col("sb")).isEmpty)
    assert(out.where(col("span_tokens") < 12).isEmpty)
    // left-maximality: the tokens just before the span differ, unless the
    // span starts at a document edge
    val extendable = out
      .where(col("a_start") > 1 && col("b_start") > 1)
      .where(expr("ta[a_start - 2] = tb[b_start - 2]"))
    assert(extendable.isEmpty)
    // spans stay inside their documents
    assert(out.where(expr("a_start + span_tokens - 1 > size(ta)")).isEmpty)
    assert(out.where(expr("b_start + span_tokens - 1 > size(tb)")).isEmpty)
  }

  test("doc stats: interval union covers every spanned doc, never exceeds the doc") {
    val spans = q("dedup_substring_spans").cache()
    val stats = q("dedup_substring_doc_stats").cache()
    val spannedDocs = spans.select(col("a_id").as("doc_id"))
      .union(spans.select(col("b_id").as("doc_id"))).distinct()
    // exactly the docs touched by some span are reported
    assert(stats.select("doc_id").except(spannedDocs).isEmpty)
    assert(spannedDocs.except(stats.select("doc_id")).isEmpty)
    // merged regions can never exceed the document, and a doc's duplicated
    // mass is at least its longest single span
    assert(stats.where(col("dup_tokens") > col("n_tokens")).isEmpty)
    assert(stats.where(col("dup_frac") < 0 || col("dup_frac") > 1).isEmpty)
    val longest = spans.select(col("a_id").as("doc_id"), col("span_tokens"))
      .union(spans.select(col("b_id").as("doc_id"), col("span_tokens")))
      .groupBy("doc_id").agg(max("span_tokens").as("mx"))
    assert(stats.join(longest, "doc_id").where(col("dup_tokens") < col("mx")).isEmpty)
  }

  test("bigram fluency: bigram count identity, ppm bounds, novel bigrams are hapax") {
    val out = q("text_bigram_fluency").cache()
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("want"))
    // every >=2-token doc appears with exactly (n_tokens - 1) bigrams
    val joined = out.join(docs, "doc_id")
    assert(joined.count() == docs.where(col("want") >= 1).count())
    assert(joined.where(col("n_bigrams") =!= col("want")).isEmpty)
    // conditional probability in ppm can never exceed 1.0 = 1e6 per bigram
    assert(out.where(col("sum_cond_ppm") > col("n_bigrams") * 1000000L).isEmpty)
    assert(out.where(col("novel_frac") < 0 || col("novel_frac") > 1).isEmpty)
    // an exact-duplicate doc shares all its bigrams with its twin:
    // novel_frac must be 0 for every doc whose text occurs >= 2 times
    val twins = graft.core.Tables.documents(spark, dir)
      .groupBy("text").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"))
    assert(out.join(twins, "doc_id").where(col("novel_frac") =!= 0.0).isEmpty)
  }
}
