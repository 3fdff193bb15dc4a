package graft

import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators: domain capping, boilerplate detection,
  * contamination screening, token-budget packing (sf0.001 tables). */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    CorpusQueries.all.find(_.name == name).get.run(spark, dir)

  test("domain cap keeps at most K docs per source, ranked by length") {
    val out = q("corpus_domain_cap").cache()
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 15))
    // rank 1 of each source is that source's longest doc (doc_id tiebreak)
    val docs = graft.core.Tables.documents(spark, dir)
    val top = docs.groupBy("source")
      .agg(max(struct(col("n_chars"), -col("doc_id"))).as("m"))
      .select(col("source"), (-col("m.col2")).as("doc_id"))
    val rk1 = out.where(col("rk") === 1).select("source", "doc_id")
    assert(rk1.except(top).isEmpty && top.except(rk1).isEmpty)
  }

  test("boilerplate ratio is in (0,1] and bounded by the shingle count") {
    val out = q("corpus_boilerplate_ngrams").collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val (nBp, nSh, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      nBp >= 1 && nBp <= nSh && math.abs(ratio - nBp.toDouble / nSh) < 1e-15
    })
  }

  test("contamination never flags the benchmark docs themselves") {
    val out = q("corpus_contamination").collect()
    assert(out.forall(r => r.getLong(0) % 97 != 0))
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2)))
  }

  test("split leakage audit covers exactly the val slice; exact leaks match an independent count") {
    val out = q("split_leakage_audit").cache()
    val hash = graft.dedup.Hashing.sparkMd5Mod("CAST(doc_id AS STRING)")
    val docs = graft.core.Tables.documents(spark, dir)
      .withColumn("split", when(expr(s"$hash % 10") < 9, lit("train")).otherwise(lit("val")))
    val valDocs = docs.where(col("split") === "val")
    assert(out.count() == valDocs.count())
    // independent exact-leak count: val text equality against the train side
    val want = valDocs.as("v")
      .join(docs.where(col("split") === "train").as("t"), col("v.text") === col("t.text"), "left")
      .groupBy(col("v.doc_id").as("doc_id"))
      .agg(sum(when(col("t.doc_id").isNotNull, 1L).otherwise(0L)).as("want"))
    assert(out.join(want, "doc_id").where(col("n_exact") =!= col("want")).isEmpty)
    assert(out.where((col("n_exact") + col("n_near") > 0) =!= col("contaminated")).isEmpty)
  }

  test("keep-best picks a max-quality member of each multi-doc duplicate cluster") {
    val out = q("corpus_dedup_keep_best").cache()
    val clusters = graft.queries.DedupQueries.clusterLabels(spark, dir)
    val sw = graft.text.TextOps.LangStopwords.toMap.apply("en")
    val scored = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.text.TextOps.qualityScore(col("text"), sw).as("q"))
      .join(clusters, "doc_id")
    // exactly the multi-member clusters are reported
    val multi = clusters.groupBy("label").count().where(col("count") >= 2)
    assert(out.count() == multi.count())
    // keep_id belongs to its cluster and carries that cluster's max quality
    val chk = out.join(scored.select(col("doc_id").as("keep_id"),
                                     col("label").as("cluster_id"), col("q")),
                       Seq("cluster_id", "keep_id"))
    assert(chk.count() == out.count())
    val maxQ = scored.groupBy(col("label").as("cluster_id")).agg(max("q").as("mq"))
    assert(out.join(maxQ, "cluster_id").where(col("keep_quality") =!= col("mq")).isEmpty)
  }

  test("cluster-safe split has structurally zero cross-split leakage") {
    val split = q("split_cluster_safe").cache()
    // every cluster lands in exactly one split
    assert(split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).where(col("n") > 1).isEmpty)
    // re-run the leakage audit's own leak definitions across train/val:
    // exact text twins and near-dup (3-gram Jaccard >= 0.5) pairs
    val docs = graft.core.Tables.documents(spark, dir).join(split, "doc_id")
    val train = docs.where(col("split") === "train")
    val valD = docs.where(col("split") === "val")
    assert(valD.count() > 0 && train.count() > 0) // the split actually splits
    val exactLeaks = valD.as("v")
      .join(train.as("t"), col("v.text") === col("t.text"))
    assert(exactLeaks.isEmpty)
    val sh = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), split_part_shingles)
      .select(col("doc_id"), explode(col("shs")).as("shingle")).distinct()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val nearLeaks = sh.join(valD.select("doc_id"), "doc_id")
      .select(col("doc_id").as("v_id"), col("shingle"))
      .join(sh.join(train.select("doc_id"), "doc_id")
              .select(col("doc_id").as("t_id"), col("shingle")), "shingle")
      .groupBy("v_id", "t_id").agg(count(lit(1)).as("shared"))
      .join(cnt.select(col("doc_id").as("v_id"), col("n_sh").as("nv")), "v_id")
      .join(cnt.select(col("doc_id").as("t_id"), col("n_sh").as("nt")), "t_id")
      .where(col("shared").cast("double") / (col("nv") + col("nt") - col("shared")) >= 0.5)
    assert(nearLeaks.isEmpty)
  }
  private def split_part_shingles =
    expr("transform(sequence(1, greatest(size(split(text, ' '))-2, 0)), " +
         "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))").as("shs")

  test("curation e2e packs exactly the gated cluster winners") {
    val out = q("corpus_curation_e2e").cache()
    // independent keep-count: best quality per cluster must clear the gate
    val sw = graft.text.TextOps.LangStopwords.toMap.apply("en")
    val labels = graft.queries.DedupQueries.clusterLabels(spark, dir)
    val scored = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("tok"),
              graft.text.TextOps.qualityScore(col("text"), sw).as("q"))
      .join(labels, "doc_id")
    val winners = scored.groupBy("label")
      .agg(max(struct(col("q"), -col("doc_id"))).as("m"))
      .where(col("m.q") >= 0.25)
    val packedDocs = out.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(packedDocs == winners.count())
    // token conservation: shard totals sum to the kept docs' tokens
    val kept = winners.select((-col("m.col2")).as("doc_id"))
      .join(scored.select("doc_id", "tok"), "doc_id")
    val keptTok = kept.agg(sum("tok")).collect()(0).getLong(0)
    assert(out.agg(sum("shard_tokens")).collect()(0).getLong(0) == keptTok)
  }

  test("pack shards: every doc assigned, lanes partition by id, cum is a running sum") {
    val out = q("corpus_pack_shards").cache()
    val docs = graft.core.Tables.documents(spark, dir)
    assert(out.count() == docs.count())
    assert(out.where(col("worker") =!= col("doc_id") % 8).isEmpty)
    // within a (worker, shard) the tokens before a doc stay under budget:
    // shard_id changes exactly when the lane's running sum crosses 4000
    assert(out.where(expr("shard_id != worker * 1000 + (cum - tok) div 4000")).isEmpty)
    // running sum is consistent: per worker, cum - tok of the next doc
    // equals cum of the previous doc
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("worker").orderBy("doc_id")
    val bad = out.withColumn("prev_cum", lag("cum", 1, 0).over(w))
      .where(col("cum") - col("tok") =!= col("prev_cum"))
    assert(bad.isEmpty)
  }
}
