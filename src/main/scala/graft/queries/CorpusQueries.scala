package graft.queries

import graft.Q
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the rest of the LLM-training-data pipeline
  * family beyond dedup/ANN: per-domain capping, corpus-level boilerplate
  * n-gram detection, benchmark-contamination screening, and token-budget
  * shard packing. Each is an equi-join/group-by/window shape that survives
  * a 100-TB corpus, and each carries an exact DuckDB oracle.
  *
  * These generalize the reference's own idioms: the manifest semi-join
  * (`import_biomass.py:38-42`) becomes the contamination screen, the
  * quantized grouping (`data_extraction_v2.py:354-355`) becomes the
  * hash-bucketed packer.
  */
object CorpusQueries {

  /** Distinct word-3-gram shingles per doc: (doc_id, shingle). Same codec
    * as DedupQueries so oracle text handling is shared. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"),
              explode(expr("transform(sequence(1, size(t)-2), i -> concat_ws(' ', slice(t, i, 3)))")).as("shingle"))
      .distinct()

  private val duckShingles: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks))""".stripMargin

  /** DuckDB twin of TextOps.qualityScore over `text` (en stopwords). */
  private val duckQuality: String =
    """greatest(0.0, least(1.0,
      |    0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |    + 0.5 * (CAST(len(list_filter(string_split(text, ' '),
      |          w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
      |             / len(string_split(text, ' '))) * 5
      |    - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |      / length(text)))""".stripMargin

  private val DomainCap = 15 // max docs kept per source/domain
  private val BpDf = 5 // a shingle in ≥ this many docs is boilerplate
  private val PackWorkers = 8 // parallel packer lanes (cluster: executor count)
  private val PackBudget = 4000L // token budget per shard

  def all: Seq[Q] = Seq(

    // Per-domain capping: web corpora are dominated by a few huge domains;
    // capping docs-per-domain is a standard pretraining diversity control.
    // Deterministic rank: longest docs first, doc_id tiebreak. One window
    // shuffle keyed by domain; the cap bounds every group's output, and
    // rank-k-per-key needs no global sort. A pathologically hot domain is
    // the classic AQE-skew / salted two-phase case (a_salted_two_phase
    // demonstrates the mitigation shape).
    Q("corpus_domain_cap", Seq("corpus", "F9", "W4"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, dir)
          .select("doc_id", "source", "n_chars")
          .withColumn("rk", row_number().over(w).cast("long"))
          .where(col("rk") <= DomainCap)
          .select("doc_id", "source", "rk")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, source, rk FROM (
              |  SELECT doc_id, source,
              |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
              |  FROM documents)
              |WHERE rk <= $DomainCap ORDER BY doc_id""".stripMargin),
      note = s"keep top-$DomainCap docs per source by length; rank-per-key window"),

    // Corpus-level boilerplate: n-grams recurring across ≥ BpDf distinct
    // docs (headers, footers, license blurbs) get flagged; each doc is
    // annotated with its boilerplate density. The boilerplate list is tiny
    // relative to the corpus (bounded by truly-repeated n-grams), so it
    // broadcasts; the corpus-side join is map-side, and the per-doc
    // aggregate combines partially. At 100 TB the list can be replaced by a
    // bloom filter without changing the plan shape.
    Q("corpus_boilerplate_ngrams", Seq("corpus", "A12", "F4"),
      (s, dir) => {
        val sh = shingles(s, dir).cache()
        val bp = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") >= BpDf).select("shingle").withColumn("is_bp", lit(1L))
        // one per-doc aggregation computes both the total and the flagged
        // count (left join against the broadcast list, then a single
        // combiner-friendly groupBy) — no second shuffle + re-join
        sh.join(broadcast(bp), Seq("shingle"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("is_bp"), lit(0L))).as("n_bp"),
               count(lit(1)).as("n_sh"))
          .where(col("n_bp") >= 1)
          .withColumn("bp_ratio", col("n_bp").cast("double") / col("n_sh"))
          .select("doc_id", "n_bp", "n_sh", "bp_ratio")
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckShingles,
              |bp AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= $BpDf),
              |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
              |SELECT s.doc_id, count(*) AS n_bp, any_value(c.n_sh) AS n_sh,
              |  CAST(count(*) AS DOUBLE) / any_value(c.n_sh) AS bp_ratio
              |FROM sh s JOIN bp USING (shingle) JOIN cnt c ON c.doc_id = s.doc_id
              |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin),
      note = s"shingles recurring in >= $BpDf docs = boilerplate; per-doc density"),

    // Benchmark-contamination screen: docs sharing n-grams with a held-out
    // eval set (here: doc_id ≡ 0 mod 97) are flagged with their hit count
    // and overlap ratio. The eval side is small by construction → broadcast;
    // the corpus side never shuffles except the per-doc combine. This is the
    // manifest semi-join (J6) generalized from filenames to content.
    Q("corpus_contamination", Seq("corpus", "J6", "A12"),
      (s, dir) => {
        val sh = shingles(s, dir).cache()
        val bench = sh.where(col("doc_id") % 97 === 0)
          .select("shingle").distinct().withColumn("is_hit", lit(1L))
        sh.where(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), Seq("shingle"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("is_hit"), lit(0L))).as("n_hits"),
               count(lit(1)).as("n_sh"))
          .where(col("n_hits") >= 1)
          .withColumn("overlap_ratio", col("n_hits").cast("double") / col("n_sh"))
          .select("doc_id", "n_hits", "n_sh", "overlap_ratio")
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckShingles,
              |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
              |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
              |SELECT s.doc_id, count(*) AS n_hits, any_value(c.n_sh) AS n_sh,
              |  CAST(count(*) AS DOUBLE) / any_value(c.n_sh) AS overlap_ratio
              |FROM sh s JOIN bench USING (shingle) JOIN cnt c ON c.doc_id = s.doc_id
              |WHERE s.doc_id % 97 <> 0
              |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin),
      note = "n-gram overlap vs held-out eval docs; broadcast eval side"),

    // Token-budget shard packing: assign docs to fixed-budget training
    // shards. A single global greedy pack is inherently sequential — the
    // distributed form lanes docs by hash (doc_id % W), packs each lane
    // independently with a running-sum window, and namespaces shard ids per
    // lane. W lanes = W-way parallelism with zero coordination; each lane's
    // windows are ordered by the unique doc_id so the output is total-order
    // deterministic.
    Q("corpus_pack_shards", Seq("corpus", "W9", "P16"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("worker").orderBy("doc_id")
        Tables.documents(s, dir)
          .select(col("doc_id"),
                  size(split(col("text"), " ")).cast("long").as("tok"))
          .withColumn("worker", col("doc_id") % PackWorkers)
          .withColumn("cum", sum("tok").over(w))
          .withColumn("shard_id",
            col("worker") * 1000 + expr(s"(cum - tok) div $PackBudget"))
          .select("doc_id", "worker", "tok", "cum", "shard_id")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, worker, tok, cum,
              |  worker * 1000 + (cum - tok) // $PackBudget AS shard_id
              |FROM (
              |  SELECT doc_id, doc_id % $PackWorkers AS worker,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
              |    CAST(sum(len(string_split(text, ' ')))
              |      OVER (PARTITION BY doc_id % $PackWorkers ORDER BY doc_id) AS BIGINT) AS cum
              |  FROM documents)
              |ORDER BY doc_id""".stripMargin),
      note = s"hash-laned greedy packing, $PackBudget tokens/shard, $PackWorkers lanes"),

    // Fixed-window chunking with overlap — the standard pretraining step
    // that turns variable-length documents into model-context-sized pieces
    // (window 160 chars, stride 120 → 40-char overlap keeps boundary
    // context in two chunks). Pure map-side sequence+explode: no shuffle at
    // all until the presentation sort, so at 100 TB it pipelines inside the
    // scan stage and parallelism is input-split-bound. A chunk starts at
    // every stride boundary < len, so the tail chunk may be short but is
    // never empty; the 48-bit md5 chunk hash is the downstream dedup key
    // (chunk-level exact dedup = groupBy(chunk_hash)).
    Q("corpus_chunk_windows", Seq("corpus", "W9", "P13", "sampling"),
      (s, dir) =>
        Tables.documents(s, dir)
          // empty docs chunk to nothing on both engines (Spark's
          // sequence(0, -1) would otherwise emit a DESCENDING [0, -1]
          // while DuckDB's generate_series(0, -1) is empty)
          .where(length(col("text")) > 0)
          .select(col("doc_id"), col("text"),
                  explode(expr("sequence(0, CAST(floor((length(text) - 1) / 120) AS INT))"))
                    .as("chunk_id"))
          .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
                  expr("substring(text, chunk_id * 120 + 1, 160)").as("chunk"))
          .select(col("doc_id"), col("chunk_id"),
                  length(col("chunk")).as("chunk_len"),
                  expr(graft.dedup.Hashing.sparkMd5Mod("chunk")).as("chunk_hash"))
          .orderBy("doc_id", "chunk_id"),
      Some(s"""SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
              |  CAST(length(chunk) AS INTEGER) AS chunk_len,
              |  ${graft.dedup.Hashing.duckMd5Mod("chunk")} AS chunk_hash
              |FROM (
              |  SELECT doc_id, chunk_id,
              |    substr(text, CAST(chunk_id * 120 + 1 AS INTEGER), 160) AS chunk
              |  FROM (
              |    SELECT doc_id, text,
              |      unnest(generate_series(0, (length(text) - 1) // 120)) AS chunk_id
              |    FROM documents WHERE length(text) > 0) t) u
              |ORDER BY doc_id, chunk_id""".stripMargin),
      note = "window 160 / stride 120 char chunking; map-side explode, no pre-sort shuffle"),

    // Temperature-balanced source mixing — the corpus-rebalancing step of
    // large-scale pretraining (sample domain s with probability ∝ n_s^α,
    // α=0.5 here): big domains are down-sampled toward √n so small domains
    // aren't drowned. The harness corpus has uniform sources, so the skew
    // is constructed deterministically first (domain d_k = ⌊√doc_id⌋ has
    // ~2k+1 docs — linearly growing sizes). Keep rule: md5(text) mod 2²⁴ <
    // ⌊√(n_max/n_s)·2²⁴⌋ — IEEE division/sqrt/floor are correctly rounded
    // in both engines, so the kept set is bit-reproducible. Plan: domain
    // counts are a combiner groupBy; the rate table broadcasts; the keep
    // filter is map-side — one fact-table pass, as it must be at 100 TB.
    Q("corpus_temperature_mix", Seq("corpus", "sampling", "A9", "skew"),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("domain", expr("CAST(floor(sqrt(doc_id)) AS INT)"))
        // n_max via an unbounded window over the ~√N-row count table (one
        // plan branch) rather than crossJoin(agg(max)) — the latter plans a
        // second scan + aggregation subtree and a nested-loop broadcast,
        // three extra jobs before the rate table can even build.
        // boundedWindow: it runs over the per-domain count table
        // (#domains rows), never the fact table
        val rates = docs.groupBy("domain").agg(count(lit(1)).as("n_docs"))
          .withColumn("n_max", max("n_docs").over(
            graft.core.Shape.boundedWindow("domain")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                           org.apache.spark.sql.expressions.Window.unboundedFollowing)))
          .withColumn("q", least(lit(1.0),
            sqrt(col("n_max").cast("double") / col("n_docs").cast("double"))))
        docs.join(broadcast(rates), "domain")
          .withColumn("kept",
            (expr(graft.dedup.Hashing.sparkMd5Raw("text")) % 16777216L <
             expr("CAST(floor(q * 16777216.0) AS BIGINT)")).cast("long"))
          .groupBy("domain")
          .agg(max("n_docs").as("n_docs"), sum("kept").as("n_kept"),
               round(max("q"), 6).as("keep_rate"))
          .orderBy("domain")
      },
      Some {
        val x = graft.dedup.Hashing.duckMd5Raw("text")
        s"""WITH d AS (SELECT CAST(floor(sqrt(doc_id)) AS INTEGER) AS domain, text
           |           FROM documents),
           |c AS (SELECT domain, count(*) AS n_docs FROM d GROUP BY 1),
           |r AS (SELECT domain, n_docs,
           |        least(1.0, sqrt(CAST((SELECT max(n_docs) FROM c) AS DOUBLE)
           |                        / CAST(n_docs AS DOUBLE))) AS q
           |      FROM c)
           |SELECT d.domain, max(r.n_docs) AS n_docs,
           |  CAST(sum(CASE WHEN ($x) % 16777216 < CAST(floor(q * 16777216.0) AS BIGINT)
           |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  round(max(q), 6) AS keep_rate
           |FROM d JOIN r USING (domain)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      },
      note = "α=0.5 temperature rebalance over constructed domain skew; broadcast rates, one fact pass"),

    // Train/validation split decontamination audit — after a hash split,
    // how much of the val slice leaks from train? Every serious eval
    // pipeline runs this before trusting held-out numbers. The split is a
    // seedless md5 rule (reproducible on any engine/rerun); leakage is
    // graded two ways per val doc: exact text twins in train, and near-dup
    // train neighbors (3-gram Jaccard ≥ 0.5). Scale shape: the expensive
    // shingle join is VAL-sided — ~10% of the corpus probes the train side
    // on the shingle key, so cost is bounded by the small split (and the
    // same df≥2-style argument as the dedup family bounds fan-out); both
    // legs are plain equi-join/group-by.
    Q("split_leakage_audit", Seq("corpus", "dedup", "J1", "A9", "sampling"),
      (s, dir) => {
        val hash = graft.dedup.Hashing.sparkMd5Mod("CAST(doc_id AS STRING)")
        val docs = Tables.documents(s, dir)
          .withColumn("split", when(expr(s"$hash % 10") < 9, lit("train")).otherwise(lit("val")))
        val train = docs.where(col("split") === "train")
        val valDocs = docs.where(col("split") === "val")
        val exactLeaks = valDocs.as("v")
          .join(train.as("t"), col("v.text") === col("t.text"))
          .groupBy(col("v.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_exact"))
        val sh = shingles(s, dir)
        val vSh = sh.join(valDocs.select("doc_id"), "doc_id")
        val tSh = sh.join(train.select("doc_id"), "doc_id")
        val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val nearLeaks = vSh.select(col("doc_id").as("v_id"), col("shingle"))
          .join(tSh.select(col("doc_id").as("t_id"), col("shingle")), "shingle")
          .groupBy("v_id", "t_id").agg(count(lit(1)).as("shared"))
          .join(cnt.select(col("doc_id").as("v_id"), col("n_sh").as("nv")), "v_id")
          .join(cnt.select(col("doc_id").as("t_id"), col("n_sh").as("nt")), "t_id")
          .where(col("shared").cast("double") / (col("nv") + col("nt") - col("shared")) >= 0.5)
          .groupBy(col("v_id").as("doc_id"))
          .agg(count(lit(1)).as("n_near"))
        valDocs.select("doc_id")
          .join(exactLeaks, Seq("doc_id"), "left")
          .join(nearLeaks, Seq("doc_id"), "left")
          .select(col("doc_id"),
                  coalesce(col("n_exact"), lit(0L)).as("n_exact"),
                  coalesce(col("n_near"), lit(0L)).as("n_near"),
                  (coalesce(col("n_exact"), lit(0L)) + coalesce(col("n_near"), lit(0L)) > 0)
                    .as("contaminated"))
          .orderBy("doc_id")
      },
      Some {
        val hash = graft.dedup.Hashing.duckMd5Mod("CAST(doc_id AS VARCHAR)")
        s"""WITH $duckShingles,
           |sp AS (SELECT doc_id, text,
           |         CASE WHEN ($hash) % 10 < 9 THEN 'train' ELSE 'val' END AS split
           |       FROM documents),
           |ex AS (SELECT v.doc_id, count(*) AS n_exact
           |       FROM sp v JOIN sp t ON v.text = t.text
           |       WHERE v.split = 'val' AND t.split = 'train' GROUP BY 1),
           |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
           |nr AS (SELECT p.v_id AS doc_id, count(*) AS n_near FROM (
           |         SELECT a.doc_id AS v_id, b.doc_id AS t_id, count(*) AS shared
           |         FROM sh a JOIN sp sa ON a.doc_id = sa.doc_id AND sa.split = 'val'
           |         JOIN sh b ON a.shingle = b.shingle
           |         JOIN sp sb ON b.doc_id = sb.doc_id AND sb.split = 'train'
           |         GROUP BY 1, 2) p
           |       JOIN cnt cv ON p.v_id = cv.doc_id
           |       JOIN cnt ct ON p.t_id = ct.doc_id
           |       WHERE CAST(p.shared AS DOUBLE) / (cv.n_sh + ct.n_sh - p.shared) >= 0.5
           |       GROUP BY 1)
           |SELECT s.doc_id, coalesce(ex.n_exact, 0) AS n_exact,
           |  coalesce(nr.n_near, 0) AS n_near,
           |  coalesce(ex.n_exact, 0) + coalesce(nr.n_near, 0) > 0 AS contaminated
           |FROM sp s LEFT JOIN ex ON s.doc_id = ex.doc_id
           |LEFT JOIN nr ON s.doc_id = nr.doc_id
           |WHERE s.split = 'val' ORDER BY s.doc_id""".stripMargin
      },
      note = "hash split + exact/near-dup cross-split contamination per val doc; val-sided join cost"),

    // Duplicate-cluster canonical selection — the last human-visible step
    // of a dedup pipeline: within each duplicate cluster (exact ∪ Jaccard
    // near-dup components, same fixpoint as dedup_cluster_components) keep
    // the BEST document by quality score, not merely the lowest id. Emits
    // the keep-rule audit table for multi-doc clusters: canonical doc,
    // cluster size, whether quality actually changed the min-id choice.
    // Plan: cluster labels are the O(diameter) propagation (shared helper);
    // the argmax is one window over cluster_id — clusters are tiny by
    // construction, so no skew; everything else is map-side scoring.
    Q("corpus_dedup_keep_best", Seq("corpus", "dedup", "W4", "A9"),
      (s, dir) => {
        val sw = graft.text.TextOps.LangStopwords.toMap.apply("en")
        val labels = DedupQueries.clusterLabels(s, dir)
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"),
                  graft.text.TextOps.qualityScore(col("text"), sw).as("quality"))
          .join(labels, "doc_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy(col("quality").desc, col("doc_id"))
        scored
          .withColumn("rk", row_number().over(w))
          .groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"),
               max(when(col("rk") === 1, col("doc_id"))).as("keep_id"),
               max(when(col("rk") === 1, col("quality"))).as("keep_quality"))
          .where(col("n_members") >= 2)
          .withColumn("quality_overrode_minid", col("keep_id") =!= col("cluster_id"))
          .orderBy("cluster_id")
      },
      Some {
        s"""WITH RECURSIVE ${DedupQueries.duckClusterLabels},
           |scored AS (SELECT d.doc_id, l.label, $duckQuality AS quality
           |           FROM documents d JOIN labels l ON d.doc_id = l.doc_id),
           |ranked AS (SELECT *, row_number() OVER (
           |             PARTITION BY label ORDER BY quality DESC, doc_id) AS rk
           |           FROM scored)
           |SELECT label AS cluster_id, count(*) AS n_members,
           |  max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
           |  max(CASE WHEN rk = 1 THEN quality END) AS keep_quality,
           |  max(CASE WHEN rk = 1 THEN doc_id END) <> label AS quality_overrode_minid
           |FROM ranked GROUP BY label HAVING count(*) >= 2
           |ORDER BY cluster_id""".stripMargin
      },
      note = "keep-best-quality canonical per duplicate cluster; shared min-label fixpoint + one tiny window"),

    // The whole curation flow as ONE plan — what a user of this library
    // actually ships as their pretraining-data job, and the corpus twin of
    // forage_pipeline_e2e: duplicate clusters (exact ∪ near-dup fixpoint) →
    // keep the best-quality doc per cluster → quality gate (score ≥ 0.25)
    // → greedy token-budget shard packing of the survivors → per-shard
    // manifest. Every stage is a stage already proven green standalone;
    // the composition check is that they agree end-to-end through one
    // optimizer pass. Scale: the only corpus-sized shuffles are the
    // cluster fixpoint (bounded rounds) and the pack lanes' per-lane
    // window; scoring and gating are map-side.
    Q("corpus_curation_e2e", Seq("corpus", "dedup", "W4", "W9", "F9"),
      (s, dir) => {
        val QMin = 0.25
        val sw = graft.text.TextOps.LangStopwords.toMap.apply("en")
        val labels = DedupQueries.clusterLabels(s, dir)
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"),
                  size(split(col("text"), " ")).cast("long").as("tok"),
                  graft.text.TextOps.qualityScore(col("text"), sw).as("quality"))
          .join(labels, "doc_id")
        val W = org.apache.spark.sql.expressions.Window
        val wK = W.partitionBy("label").orderBy(col("quality").desc, col("doc_id"))
        val keep = scored
          .withColumn("rk", row_number().over(wK))
          .where(col("rk") === 1 && col("quality") >= QMin)
        val wP = W.partitionBy("worker").orderBy("doc_id")
        keep
          .withColumn("worker", col("doc_id") % PackWorkers)
          .withColumn("cum", sum("tok").over(wP))
          .withColumn("shard_id",
            col("worker") * 1000 + expr(s"(cum - tok) div $PackBudget"))
          .groupBy("worker", "shard_id")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("shard_tokens"),
               min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("worker", "shard_id")
      },
      Some(s"""WITH RECURSIVE ${DedupQueries.duckClusterLabels},
              |scored AS (SELECT d.doc_id,
              |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok,
              |    l.label, $duckQuality AS quality
              |  FROM documents d JOIN labels l ON d.doc_id = l.doc_id),
              |keep AS (SELECT doc_id, tok FROM (
              |    SELECT *, row_number() OVER (
              |        PARTITION BY label ORDER BY quality DESC, doc_id) AS rk
              |    FROM scored) t
              |  WHERE rk = 1 AND quality >= 0.25),
              |packed AS (SELECT doc_id, tok, doc_id % $PackWorkers AS worker,
              |    CAST(sum(tok) OVER (
              |        PARTITION BY doc_id % $PackWorkers ORDER BY doc_id) AS BIGINT) AS cum
              |  FROM keep)
              |SELECT worker, worker * 1000 + (cum - tok) // $PackBudget AS shard_id,
              |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS shard_tokens,
              |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
              |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "full curation pipeline in one plan: cluster -> keep-best -> quality gate (>=0.25) -> shard packing"),

    // Cluster-aware splitting — the REMEDY for what split_leakage_audit
    // measures: hashing the CLUSTER id (not the doc id) into train/val/test
    // makes it structurally impossible for an exact or near-dup pair to
    // cross a split boundary, because every edge that the leakage audit
    // counts (same text, or Jaccard ≥ 0.5) is by construction intra-cluster.
    // CorpusSpec closes the loop: re-running the audit's leak logic on this
    // assignment finds zero cross-split pairs. Plan: the fixpoint labels +
    // one map-side hash — the split adds nothing to the cluster cost.
    Q("split_cluster_safe", Seq("corpus", "dedup", "sampling", "P13"),
      (s, dir) => {
        val hash = graft.dedup.Hashing.sparkMd5Mod("CAST(label AS STRING)")
        DedupQueries.clusterLabels(s, dir)
          .withColumn("bucket", expr(s"$hash % 10"))
          .select(col("doc_id"), col("label").as("cluster_id"),
                  when(col("bucket") < 8, lit("train"))
                    .when(col("bucket") === 8, lit("val"))
                    .otherwise(lit("test")).as("split"))
          .orderBy("doc_id")
      },
      Some {
        val hash = graft.dedup.Hashing.duckMd5Mod("CAST(label AS VARCHAR)")
        s"""WITH RECURSIVE ${DedupQueries.duckClusterLabels}
           |SELECT doc_id, label AS cluster_id,
           |  CASE WHEN ($hash) % 10 < 8 THEN 'train'
           |       WHEN ($hash) % 10 = 8 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM labels ORDER BY doc_id""".stripMargin
      },
      note = "train/val/test by CLUSTER hash: dup edges are intra-cluster, so cross-split leakage is structurally zero"),

    // Systematic PPS (probability-proportional-to-size) sampling: walk the
    // corpus in doc_id order, drop a marker every `step` tokens, keep every
    // document a marker lands in — P(keep) ∝ token count, zero randomness,
    // integer-exact, and a doc longer than `step` is kept with certainty
    // (n_hits counts its markers, the PPS weight for downstream
    // reweighting). The inclusion rule needs each doc's GLOBAL token prefix
    // sum, which naively is one ORDER BY cum-sum — a single-task window at
    // any scale. This runs it as the classic two-level distributed scan:
    // per-chunk local cumsum (window partitioned by doc_id div 64 — chunk
    // count GROWS with the data), chunk totals rolled into chunk offsets
    // (one tiny window over #chunks rows — a 64× reduced problem; at
    // extreme scale the same trick recurses), offsets joined back and added
    // map-side. corpus_pack_shards' hash lanes dodge global order; this is
    // the op you need when the order itself is the semantics.
    Q("sample_pps_systematic", Seq("sampling", "W3", "W9", "A13", "corpus"),
      (s, dir) => {
        val step = 997L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("chunk").orderBy("doc_id")
        val wOff = org.apache.spark.sql.expressions.Window
          .orderBy("chunk") // #chunks rows only: the reduced second level
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
                  size(split(col("text"), " ")).cast("long").as("tok"))
          .withColumn("chunk", expr("doc_id div 64"))
        val local = toks.withColumn("lcum", sum("tok").over(w))
        val offsets = toks.groupBy("chunk").agg(sum("tok").as("ctot"))
          .withColumn("off", coalesce(sum("ctot").over(wOff) - col("ctot"), lit(0L)))
          .select("chunk", "off")
        local.join(offsets, "chunk") // AQE broadcasts the chunk-count side
          .withColumn("cum", col("off") + col("lcum"))
          .withColumn("n_hits", expr(s"cum div $step - (cum - tok) div $step"))
          .where(col("n_hits") > 0)
          .select("doc_id", "tok", "cum", "n_hits")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
             |c AS (SELECT doc_id, tok,
             |    CAST(sum(tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM t)
             |SELECT doc_id, tok, cum, cum // 997 - (cum - tok) // 997 AS n_hits
             |FROM c WHERE cum // 997 - (cum - tok) // 997 > 0
             |ORDER BY doc_id""".stripMargin),
      note = "weighted sampling without randomness: token-stride markers over a two-level distributed prefix sum (no single-task global window)"),

    // N-gram novelty scoring — the incremental-crawl curation signal: how
    // much of a document's content is FIRST SEEN in that document (vs
    // already contributed by any earlier doc)? Boilerplate-heavy or
    // template pages score near 0, genuinely new text near 1; pipelines
    // cut or downweight the low tail before training. Attribution is by
    // doc_id order (min doc_id per shingle = its first occurrence), so the
    // score is deterministic and engine-exact. Plan: gram table → min-per-
    // gram rollup (map-side partials absorb hot boilerplate grams) → one
    // gram-keyed join back → per-doc count rollup. Every stage is keyed by
    // gram or doc — no pair join, no window, no global order; the hot-gram
    // skew lands in an AGGREGATION (partial-combine safe), never a join
    // fanout, because the rollup reduces each gram to one row before the
    // join.
    Q("corpus_ngram_novelty", Seq("corpus", "dedup", "A1", "A12", "J1"),
      (s, dir) => {
        val sh = shingles(s, dir)
        val first = sh.groupBy("shingle").agg(min("doc_id").as("fdoc"))
        sh.join(first, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
               sum(when(col("fdoc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
          .select("doc_id", "n_grams", "n_novel", "novelty")
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckShingles,
              |f AS (SELECT shingle, min(doc_id) AS fdoc FROM sh GROUP BY 1)
              |SELECT sh.doc_id, count(*) AS n_grams,
              |  CAST(sum(CASE WHEN f.fdoc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              |  CAST(sum(CASE WHEN f.fdoc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
              |    / count(*) AS novelty
              |FROM sh JOIN f USING (shingle)
              |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin),
      note = "first-occurrence novelty per doc: min-doc-per-gram rollup + one gram-keyed join; boilerplate skew absorbed by map-side partials, no pair join"),

    // Deterministic epoch shuffle — reproducible training-data ordering:
    // every epoch re-permutes the corpus by md5(epoch:doc_id) so any worker
    // can recompute any epoch's order from scratch (resume, audit, exact
    // replay), with no RNG state to persist. Position assignment is a
    // GLOBAL rank over the hash order — the op where the order itself is
    // the semantics — done as the two-level scan, like
    // sample_pps_systematic: the first two hex chars of the hash are the
    // bucket (256 fixed buckets whose LEXICOGRAPHIC order equals the hash
    // order's prefix, so bucket-major + in-bucket rank IS the global
    // rank), in-bucket ranks come from bucket-partitioned windows (corpus-
    // scaled parallelism), and bucket offsets from one tiny window over
    // ≤256×epochs rows. No single-task global sort at any scale; shard
    // boundaries then fall out of integer division on the position.
    Q("corpus_epoch_shuffle", Seq("corpus", "sampling", "W3", "P17", "§2.10"),
      (s, dir) => {
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch", "bucket").orderBy("h", "doc_id")
        val wOff = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch").orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val ranked = Tables.documents(s, dir)
          .select(col("doc_id"), explode(expr("array(0, 1)")).as("epoch"))
          .withColumn("h", md5(concat_ws(":", col("epoch"), col("doc_id"))))
          .withColumn("bucket", substring(col("h"), 1, 2))
          .withColumn("rn", row_number().over(wB))
        val offsets = ranked.groupBy("epoch", "bucket")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum("cnt").over(wOff), lit(0L)))
          .select("epoch", "bucket", "off")
        ranked.join(offsets, Seq("epoch", "bucket"))
          .withColumn("pos", col("off") + col("rn"))
          .withColumn("shard_id", expr("(pos - 1) div 64"))
          .select("epoch", "doc_id", "pos", "shard_id")
          .orderBy("epoch", "pos")
      },
      Some("""WITH r AS (
             |  SELECT epoch, doc_id, md5(epoch || ':' || doc_id) AS h
             |  FROM documents, (SELECT unnest([0, 1]) AS epoch)),
             |b AS (SELECT epoch, doc_id, h, substr(h, 1, 2) AS bucket,
             |        row_number() OVER (PARTITION BY epoch, substr(h, 1, 2)
             |                           ORDER BY h, doc_id) AS rn
             |      FROM r),
             |o AS (SELECT epoch, bucket,
             |        CAST(coalesce(sum(cnt) OVER (PARTITION BY epoch ORDER BY bucket
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
             |      FROM (SELECT epoch, bucket, count(*) AS cnt FROM b GROUP BY 1, 2) c)
             |SELECT b.epoch, b.doc_id, o.off + b.rn AS pos, (o.off + b.rn - 1) // 64 AS shard_id
             |FROM b JOIN o ON b.epoch = o.epoch AND b.bucket = o.bucket
             |ORDER BY b.epoch, pos""".stripMargin),
      note = "reproducible per-epoch permutation by md5(epoch:doc_id); hex-prefix buckets make bucket-major + in-bucket rank the exact global rank — two-level, no single-task sort"),

    // Contamination REMOVAL — the verb after corpus_contamination's detect:
    // every token covered by any 3-gram the doc shares with the held-out
    // eval set is cut, and the cleaned text re-assembled in token order.
    // Span semantics: a bench gram starting at position i condemns
    // positions i..i+2; overlapping grams merge naturally through the
    // DISTINCT covered-position set (no interval algebra needed at the
    // token granularity). Plan: positional grams (map-side) → broadcast
    // bench-gram semi-join → covered positions (explode 3, distinct) →
    // anti-join tokens → per-doc ordered re-concat via array_sort of
    // (pos, tok) structs (deterministic, no collect_list order reliance).
    // Everything is keyed by doc or gram; the bench side is small by
    // construction (broadcast), so the corpus never pair-joins.
    Q("corpus_decontaminate", Seq("corpus", "dedup", "J6", "F7", "A12"),
      (s, dir) => {
        // cached: base feeds the gram explode (twice, via disjoint bench/
        // corpus filters) and the token explode — one scan+split instead
        // of four (same rationale as text_corpus_fluency's toks)
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .cache()
        val grams = base.where(size(col("t")) >= 3)
          .select(col("doc_id"), explode(
            expr("transform(sequence(1, size(t)-2), i -> struct(i AS start, concat_ws(' ', slice(t, i, 3)) AS gram))")).as("g"))
          .select(col("doc_id"), col("g.start"), col("g.gram"))
        val bench = grams.where(col("doc_id") % 97 === 0)
          .select("gram").distinct()
        val covered = grams.where(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), "gram")
          .select(col("doc_id"), explode(expr("sequence(start, start + 2)")).as("pos"))
          .distinct()
        val toks = base.where(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), posexplode(col("t")).as(Seq("pos0", "tok")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
          .cache() // feeds both the kept anti-join and the n_tok rollup
        val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
               expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok))").as("clean_text"))
        toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"),
                  (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
                  coalesce(col("clean_text"), lit("")).as("clean_text"))
          .where(col("n_removed") >= 1)
          .orderBy("doc_id")
      },
      Some("""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT doc_id, i AS start, array_to_string(t[i:i+2], ' ') AS gram
             |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
             |            FROM base WHERE len(t) >= 3)),
             |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
             |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(start, start + 2)) AS pos
             |        FROM g SEMI JOIN bench USING (gram) WHERE doc_id % 97 <> 0),
             |toks AS (SELECT doc_id, i AS pos, t[i] AS tok
             |         FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
             |               FROM base WHERE doc_id % 97 <> 0)),
             |kept AS (SELECT doc_id, count(*) AS n_kept,
             |           string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |         FROM toks ANTI JOIN cov USING (doc_id, pos) GROUP BY 1),
             |tot AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1)
             |SELECT t.doc_id, t.n_tok,
             |  t.n_tok - coalesce(k.n_kept, 0) AS n_removed,
             |  coalesce(k.clean_text, '') AS clean_text
             |FROM tot t LEFT JOIN kept k USING (doc_id)
             |WHERE t.n_tok - coalesce(k.n_kept, 0) >= 1
             |ORDER BY t.doc_id""".stripMargin),
      note = "span removal after the contamination screen: broadcast bench grams, DISTINCT covered positions merge overlaps, anti-join + ordered re-concat rebuilds clean text"),

    // Priority sampling (Duffield–Lund–Thorup, JACM 2007): weighted
    // without-replacement sampling whose k-sample supports UNBIASED
    // subset-sum estimates — the principled way to downsample a weighted
    // corpus (weight = doc length here) while keeping any subgroup's total
    // estimable from the sample alone. Each doc draws priority w/u with u
    // uniform in (0,1]; the k highest priorities are kept; every kept
    // doc's estimator is max(w, τ) with τ the (k+1)-th priority.
    // Randomness is the seedless 48-bit md5(doc_id) (u = (h+1)/2^48), so
    // the sample is bit-reproducible on any engine and any rerun; the
    // priority uses ONLY IEEE division — correctly rounded in every
    // conforming engine — never log/pow, whose libm rounding differs
    // across platforms and would break hash-exact cross-engine parity.
    // Plan: the top-(k+1) selection is TakeOrderedAndProject — per-
    // partition heap top-k + driver merge of (k+1)×#partitions candidate
    // rows, no global sort and no shuffle of the corpus — THE selection
    // shape at 100 TB. The rank/τ windows after it run on k+1 = 129 rows
    // by construction (the post-limit set), not on the data.
    Q("sample_weighted_priority", Seq("sampling", "corpus", "A13", "W4", "F9", "§2.10"),
      (s, dir) => {
        val k = 128
        import org.apache.spark.sql.expressions.Window
        // boundedWindow: both run on the post-limit k+1 = 129-row set
        val wOrd = graft.core.Shape.boundedWindow(col("pri").desc, col("doc_id"))
        val wAll = graft.core.Shape.boundedWindow(col("pri").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars").cast("long").as("w"))
          .withColumn("h", expr(graft.dedup.Hashing.sparkMd5Raw("CAST(doc_id AS STRING)")))
          .withColumn("pri", col("w").cast("double") / (col("h") + lit(1L)).cast("double"))
          .orderBy(col("pri").desc, col("doc_id")).limit(k + 1)
          .withColumn("rk", row_number().over(wOrd))
          .withColumn("tau",
            when(count(lit(1)).over(wAll) === k + 1, min(col("pri")).over(wAll))
              .otherwise(lit(0.0)))
          .where(col("rk") <= k)
          .select(col("doc_id"), col("w"), col("pri"),
                  greatest(col("w").cast("double"), col("tau")).as("w_est"))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
              |    CAST(n_chars AS DOUBLE)
              |      / CAST(${graft.dedup.Hashing.duckMd5Raw("CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE) AS pri
              |  FROM documents),
              |t AS (SELECT doc_id, w, pri,
              |    row_number() OVER (ORDER BY pri DESC, doc_id) AS rk FROM p),
              |tau AS (SELECT coalesce(max(pri), 0.0) AS tau FROM t WHERE rk = 129)
              |SELECT doc_id, w, pri, greatest(CAST(w AS DOUBLE), tau.tau) AS w_est
              |FROM t, tau WHERE rk <= 128 ORDER BY doc_id""".stripMargin),
      note = "Duffield–Lund–Thorup priority sample (k=128, weight = n_chars, u from seedless md5): TakeOrderedAndProject top-(k+1), rank/τ windows on the 129-row survivor set only; division-only priorities keep cross-engine bit parity"),

    // Neyman-allocation stratified sampling — the eval-set construction
    // rule from survey statistics: a fixed label budget k is split across
    // strata ∝ N_h·S_h (size × within-stratum std dev of doc length), so
    // variable strata get proportionally more of the budget and the
    // stratified mean's variance is minimized (Neyman 1934). Numerics are
    // engineered for cross-engine bit parity AND order-freedom at any
    // parallelism: the variance comes from exact BIGINT (n·Σx² − (Σx)²)
    // with ONE double division, and the weights are 10-bit fixed-point
    // quantized (wq = ⌊n·s·1024⌋) so every downstream step — total,
    // integer-division base quota, largest-remainder top-up — is pure
    // integer arithmetic: no float accumulation whose summation ORDER
    // could differ between a 1000-partition shuffle and a single-node
    // scan. Plan: one combiner groupBy over the corpus (exact integer
    // partials), ~#strata-row windows for the allocation, then a
    // broadcast join + per-stratum hash-rank window (stratum-parallel)
    // picks the docs — one fact pass plus one rank pass at any scale.
    Q("sample_neyman_alloc", Seq("sampling", "corpus", "A1", "A13", "W9", "F9"),
      (s, dir) => {
        val k = 100
        import org.apache.spark.sql.expressions.Window
        // boundedWindow: it runs over the per-stratum allocation table
        // (#strata rows), not the docs
        val wFull = graft.core.Shape.boundedWindow("source")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val alloc = docs.groupBy("source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sm"),
               sum(col("n_chars") * col("n_chars")).as("sq"))
          .withColumn("sh", sqrt(when(col("n") > 1,
            (col("n") * col("sq") - col("sm") * col("sm")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double")).otherwise(lit(0.0))))
          .withColumn("wq", floor(col("n").cast("double") * col("sh") * lit(1024.0)).cast("long"))
          .withColumn("wtot", sum("wq").over(wFull))
          .withColumn("base", expr(s"($k * wq) DIV wtot"))
          .withColumn("rem", expr(s"($k * wq) % wtot"))
          .withColumn("spent", sum("base").over(wFull))
          .withColumn("rrk", row_number().over(
            graft.core.Shape.boundedWindow(col("rem").desc, col("source"))))
          .withColumn("alloc",
            col("base") + when(col("rrk") <= lit(k) - col("spent"), 1L).otherwise(0L))
          .select("source", "n", "sh", "alloc")
        val ranked = docs
          .withColumn("hr", expr(graft.dedup.Hashing.sparkMd5Raw("CAST(doc_id AS STRING)")))
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(col("hr"), col("doc_id"))))
        ranked.join(broadcast(alloc), "source")
          .where(col("rk") <= col("alloc"))
          .select(col("source"), col("n").as("n_docs"), col("sh").as("s_chars"),
                  col("alloc"), col("doc_id"), col("rk"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH st AS (SELECT source, count(*) AS n, sum(n_chars) AS sm,
              |    sum(n_chars * n_chars) AS sq FROM documents GROUP BY 1),
              |w AS (SELECT source, n,
              |    sqrt(CASE WHEN n > 1 THEN CAST(n * sq - sm * sm AS DOUBLE)
              |      / CAST(n * (n - 1) AS DOUBLE) ELSE 0.0 END) AS sh FROM st),
              |q AS (SELECT source, n, sh,
              |    CAST(floor(CAST(n AS DOUBLE) * sh * 1024.0) AS BIGINT) AS wq FROM w),
              |a AS (SELECT source, n, sh, wq,
              |    CAST((100 * wq) // CAST(sum(wq) OVER () AS BIGINT) AS BIGINT) AS base,
              |    CAST((100 * wq) % CAST(sum(wq) OVER () AS BIGINT) AS BIGINT) AS rem FROM q),
              |b AS (SELECT source, n, sh, base, rem,
              |    CAST(sum(base) OVER () AS BIGINT) AS spent,
              |    row_number() OVER (ORDER BY rem DESC, source) AS rrk FROM a),
              |al AS (SELECT source, n, sh,
              |    base + CASE WHEN rrk <= 100 - spent THEN 1 ELSE 0 END AS alloc FROM b),
              |sel AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
              |    ORDER BY ${graft.dedup.Hashing.duckMd5Raw("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
              |  FROM documents)
              |SELECT s.source, a.n AS n_docs, a.sh AS s_chars, a.alloc, s.doc_id, s.rk
              |FROM sel s JOIN al a USING (source) WHERE s.rk <= a.alloc
              |ORDER BY source, rk""".stripMargin),
      note = "Neyman budget split (k=100, ∝ N_h·S_h) + largest-remainder rounding in pure fixed-point integer arithmetic (order-free at any parallelism); selection = per-stratum seedless-hash rank, one combiner pass + one window pass"),

    // T5-style span corruption — the training-EXAMPLE construction step of
    // a denoising-LM pipeline (Raffel et al. 2020): ~15% of each doc's
    // tokens are masked in length-3 spans, the input keeps one sentinel
    // token per span, and the target lists each sentinel followed by the
    // tokens it hid. Span placement is the seedless rule start =
    // md5(doc_id:bucket) % 18 + 1 inside fixed 20-token buckets (3/20 =
    // the 15% rate), so example construction is bit-reproducible on any
    // engine/worker with NO coordination — the property that lets 1000
    // executors regenerate the same epoch independently. Plan: positional
    // explode (map-side), mask decision as a pure per-row expression (no
    // join — the rule is a function of (doc_id, pos)), then doc-keyed
    // aggs re-assemble input and target in token order via array_sort
    // (no collect_list order reliance); spans roll up bucket-major
    // through a (doc, bucket) pre-agg so the target's span order is
    // positional. Everything is keyed by doc — one explode, three
    // combiner aggs, zero joins wider than doc granularity.
    Q("corpus_span_corruption", Seq("corpus", "P17", "P13", "A12", "§2.10"),
      (s, dir) => {
        val h = graft.dedup.Hashing.sparkMd5Raw(
          "concat(CAST(doc_id AS STRING), ':', CAST(bucket AS STRING))")
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
          .withColumn("bucket", expr("(pos - 1) div 20"))
          .withColumn("start", expr(s"$h % 18 + 1"))
          .withColumn("off", expr("(pos - 1) % 20 + 1"))
          .withColumn("masked",
            col("off") >= col("start") && col("off") <= col("start") + 2)
          .withColumn("sentinel", concat(lit("<extra_id_"), col("bucket"), lit(">")))
        val inp = toks
          .withColumn("otok", when(!col("masked"), col("tok"))
            .when(col("off") === col("start"), col("sentinel")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
               sum(col("masked").cast("long")).as("n_masked"),
               expr("concat_ws(' ', transform(array_sort(collect_list(CASE WHEN otok IS NOT NULL THEN struct(pos, otok) END)), x -> x.otok))").as("input_text"))
        val spans = toks.where(col("masked"))
          .groupBy("doc_id", "bucket")
          .agg(first("sentinel").as("sentinel"),
               expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok))").as("span_toks"))
          .select(col("doc_id"), col("bucket"),
                  concat(col("sentinel"), lit(" "), col("span_toks")).as("span_txt"))
        val target = spans.groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
               expr("concat_ws(' ', transform(array_sort(collect_list(struct(bucket, span_txt))), x -> x.span_txt))").as("target_text"))
        inp.join(target, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"), col("n_masked"),
                  coalesce(col("n_spans"), lit(0L)).as("n_spans"),
                  col("input_text"),
                  coalesce(col("target_text"), lit("")).as("target_text"))
          .orderBy("doc_id")
      },
      Some {
        val dh = graft.dedup.Hashing.duckMd5Raw(
          "CAST(doc_id AS VARCHAR) || ':' || CAST(bucket AS VARCHAR)")
        s"""WITH toks AS (SELECT doc_id, i AS pos, t[i] AS tok,
           |    (i - 1) // 20 AS bucket, (i - 1) % 20 + 1 AS off
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t,
           |          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
           |        FROM documents)),
           |m AS (SELECT doc_id, pos, tok, bucket, off,
           |    ($dh) % 18 + 1 AS start,
           |    '<extra_id_' || bucket || '>' AS sentinel FROM toks),
           |mk AS (SELECT *, off >= start AND off <= start + 2 AS masked FROM m),
           |inp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           |    CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           |    string_agg(CASE WHEN NOT masked THEN tok
           |                    WHEN off = start THEN sentinel END, ' ' ORDER BY pos) AS input_text
           |  FROM mk GROUP BY 1),
           |sp AS (SELECT doc_id, bucket,
           |    any_value(sentinel) || ' ' || string_agg(tok, ' ' ORDER BY pos) AS span_txt
           |  FROM mk WHERE masked GROUP BY 1, 2),
           |tg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |    string_agg(span_txt, ' ' ORDER BY bucket) AS target_text
           |  FROM sp GROUP BY 1)
           |SELECT i.doc_id, i.n_tok, i.n_masked,
           |  coalesce(t.n_spans, 0) AS n_spans, i.input_text,
           |  coalesce(t.target_text, '') AS target_text
           |FROM inp i LEFT JOIN tg t USING (doc_id) ORDER BY i.doc_id""".stripMargin
      },
      note = "T5 span corruption (15%, length-3 spans in 20-token buckets, seedless md5 placement): coordination-free reproducible example construction; one explode + doc-keyed combiner aggs, zero data-wide joins"),

    // Fill-in-the-middle transformation (Bavarian et al. 2022) — the
    // infilling-objective analog of span corruption used for code models:
    // each document is cut into (prefix, middle, suffix) and re-emitted
    // in PSM order `<PRE> prefix <SUF> suffix <MID> middle`, so the model
    // learns to generate the middle conditioned on both sides. Both cut
    // parameters are seedless md5 draws keyed by doc_id (middle length
    // 1..len/3, start uniform over valid positions), giving the same
    // coordination-free bit-reproducibility contract as
    // corpus_span_corruption — any executor can regenerate any example.
    //
    // Scale: a pure per-row map (two hash draws + three substrings), no
    // shuffle at all before the presentation sort; pipelines entirely
    // inside whole-stage codegen.
    Q("corpus_fim_split", Seq("corpus", "P17", "P13", "§2.10"),
      (s, dir) => {
        val h1 = graft.dedup.Hashing.sparkMd5Raw("concat('fim1:', CAST(doc_id AS STRING))")
        val h2 = graft.dedup.Hashing.sparkMd5Raw("concat('fim2:', CAST(doc_id AS STRING))")
        Tables.documents(s, dir)
          .where(length(col("text")) >= 30)
          .withColumn("len", length(col("text")).cast("long"))
          .withColumn("mid_len", expr(s"1L + ($h2) % (len div 3)"))
          .withColumn("mid_start", expr(s"1L + ($h1) % (len - mid_len + 1)"))
          .select(col("doc_id"), col("mid_start"), col("mid_len"),
                  (col("mid_start") - 1).as("n_pre"),
                  (col("len") - col("mid_start") - col("mid_len") + 1).as("n_suf"),
                  expr("""concat('<PRE>', substring(text, 1, CAST(mid_start AS INT) - 1),
                         |'<SUF>', substring(text, CAST(mid_start + mid_len AS INT)),
                         |'<MID>', substring(text, CAST(mid_start AS INT), CAST(mid_len AS INT)))"""
                    .stripMargin).as("fim_text"))
          .orderBy("doc_id")
      },
      Some {
        val h1 = graft.dedup.Hashing.duckMd5Raw("'fim1:' || CAST(doc_id AS VARCHAR)")
        val h2 = graft.dedup.Hashing.duckMd5Raw("'fim2:' || CAST(doc_id AS VARCHAR)")
        s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
           |  FROM documents WHERE length(text) >= 30),
           |c AS (SELECT doc_id, text, len,
           |    1 + ($h2) % (len // 3) AS mid_len FROM d),
           |p AS (SELECT doc_id, text, len, mid_len,
           |    1 + ($h1) % (len - mid_len + 1) AS mid_start FROM c)
           |SELECT doc_id, CAST(mid_start AS BIGINT) AS mid_start,
           |  CAST(mid_len AS BIGINT) AS mid_len,
           |  CAST(mid_start - 1 AS BIGINT) AS n_pre,
           |  CAST(len - mid_start - mid_len + 1 AS BIGINT) AS n_suf,
           |  '<PRE>' || substr(text, 1, CAST(mid_start AS INT) - 1) ||
           |  '<SUF>' || substr(text, CAST(mid_start + mid_len AS INT)) ||
           |  '<MID>' || substr(text, CAST(mid_start AS INT), CAST(mid_len AS INT)) AS fim_text
           |FROM p ORDER BY doc_id""".stripMargin
      },
      note = "FIM (PSM order) example construction with seedless md5 cut draws: per-row map only, zero shuffles, reproducible on any executor — the code-model infilling counterpart of span corruption"),

    // PREFERENCE-PAIR construction (the DPO/RLHF reward-data shape): within
    // each (lang, source) stratum, pair the i-th best document with the
    // i-th worst by a deterministic integer score — here token count, the
    // pluggable stand-in for any reward signal — and emit
    // (chosen, rejected, margin) rows. Both ranks come from ONE window
    // pass over the same (lang, source) shuffle (two row_numbers share the
    // partitioning), and pairing is an equi-join on (stratum, rank) of two
    // <=2-rows-per-stratum slices — never a within-group cross join, so a
    // stratum with a million documents still contributes exactly 2 pairs
    // and the join input is 2×#strata rows. Degenerate pairs (score ties,
    // or best meeting worst in the middle of a tiny group) are dropped by
    // the strict chosen > rejected guard. All-integer scores and margins
    // hash bit-identically across engines.
    Q("pref_pair_build", Seq("W4", "W9", "A1", "F4", "J1"),
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
                  size(split(col("text"), " ")).cast("long").as("tok"))
        val wBest = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source").orderBy(col("tok").desc, col("doc_id"))
        val wWorst = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source").orderBy(col("tok").asc, col("doc_id"))
        val ranked = d
          .withColumn("rb", row_number().over(wBest))
          .withColumn("rw", row_number().over(wWorst))
          .cache() // both pair sides slice this one windowed frame
        val ch = ranked.where(col("rb") <= 2)
          .select(col("lang"), col("source"), col("rb").cast("int").as("pair_rank"),
                  col("doc_id").as("chosen_id"), col("tok").as("chosen_tok"))
        val rj = ranked.where(col("rw") <= 2)
          .select(col("lang"), col("source"), col("rw").cast("int").as("pair_rank"),
                  col("doc_id").as("rejected_id"), col("tok").as("rejected_tok"))
        ch.join(rj, Seq("lang", "source", "pair_rank"))
          .where(col("chosen_tok") > col("rejected_tok"))
          .withColumn("margin", col("chosen_tok") - col("rejected_tok"))
          .select("lang", "source", "pair_rank", "chosen_id", "rejected_id",
                  "chosen_tok", "rejected_tok", "margin")
          .orderBy("lang", "source", "pair_rank")
      },
      Some("""WITH d AS (SELECT doc_id, lang, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
             |r AS (SELECT doc_id, lang, source, tok,
             |    row_number() OVER (PARTITION BY lang, source ORDER BY tok DESC, doc_id) AS rb,
             |    row_number() OVER (PARTITION BY lang, source ORDER BY tok ASC, doc_id) AS rw
             |  FROM d)
             |SELECT c.lang, c.source, CAST(c.rb AS INTEGER) AS pair_rank,
             |  c.doc_id AS chosen_id, j.doc_id AS rejected_id,
             |  c.tok AS chosen_tok, j.tok AS rejected_tok,
             |  c.tok - j.tok AS margin
             |FROM r c JOIN r j ON c.lang = j.lang AND c.source = j.source AND c.rb = j.rw
             |WHERE c.rb <= 2 AND j.rw <= 2 AND c.tok > j.tok
             |ORDER BY c.lang, c.source, pair_rank""".stripMargin),
      note = "DPO-style preference pairs: best-vs-worst per (lang, source) stratum via two row_numbers on one shared shuffle + a (stratum, rank) equi-join of bounded slices; strict margin guard drops ties — integer-exact"),

    // Temporal train/test split with an EMBARGO gap — the third split
    // discipline next to hash-stratified (`split_cluster_safe`) and
    // expanding-origin (`w9_expanding_prefix`): for forecasting-style
    // training data, rows inside [cutoff, cutoff+embargo) are DROPPED so
    // no test label sits within one autocorrelation horizon of any train
    // feature (the finance/ERM "purged split"). Emits the per-split
    // census PLUS the audit that makes the guarantee machine-checked: the
    // minimum per-user (first test ts − last train ts) gap, which is
    // ≥ embargo BY CONSTRUCTION — shipped as a column so a wrong cutoff
    // constant or timezone drift fails the hash, not a code review. Two
    // pruned 2-column scans feed two map-side aggregations (3-row split
    // census + per-user extrema whose global min is a 1-row broadcast);
    // nothing here grows faster than |users|.
    Q("split_temporal_embargo", Seq("corpus", "F6", "A1", "A11", "P18"),
      (s, dir) => {
        val cutUs  = lit(java.time.Instant.parse("2024-01-20T00:00:00Z").toEpochMilli * 1000L)
        val testUs = lit(java.time.Instant.parse("2024-01-23T00:00:00Z").toEpochMilli * 1000L)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("split",
            when(col("ts_us") < cutUs, "train")
              .when(col("ts_us") < testUs, "embargo")
              .otherwise("test"))
        val census = ev.groupBy("split")
          .agg(count(lit(1)).as("n_events"),
               countDistinct(col("user_id")).as("n_users"),
               min("ts_us").as("min_us"), max("ts_us").as("max_us"))
        val gap = ev.where(col("split") =!= "embargo")
          .groupBy("user_id")
          .agg(max(when(col("split") === "train", col("ts_us"))).as("last_train"),
               min(when(col("split") === "test", col("ts_us"))).as("first_test"))
          .where(col("last_train").isNotNull && col("first_test").isNotNull)
          .agg(min(col("first_test") - col("last_train")).as("min_gap_us"))
        census.crossJoin(broadcast(gap))
          .select(col("split"), col("n_events"), col("n_users"),
                  col("min_us"), col("max_us"), col("min_gap_us"),
                  (col("min_gap_us") >= testUs - cutUs).as("embargo_ok"))
          .transform(graft.core.Shape.boundedSort(_, "split"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us,
             |    CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
             |         WHEN ts < TIMESTAMP '2024-01-23 00:00:00' THEN 'embargo'
             |         ELSE 'test' END AS split
             |  FROM events),
             |census AS (SELECT split, count(*) AS n_events,
             |    count(DISTINCT user_id) AS n_users,
             |    min(ts_us) AS min_us, max(ts_us) AS max_us
             |  FROM ev GROUP BY 1),
             |g AS (SELECT min(first_test - last_train) AS min_gap_us FROM (
             |  SELECT user_id,
             |    max(CASE WHEN split = 'train' THEN ts_us END) AS last_train,
             |    min(CASE WHEN split = 'test' THEN ts_us END) AS first_test
             |  FROM ev WHERE split <> 'embargo' GROUP BY 1)
             |  WHERE last_train IS NOT NULL AND first_test IS NOT NULL)
             |SELECT split, n_events, n_users, min_us, max_us, g.min_gap_us,
             |  g.min_gap_us >= 259200000000 AS embargo_ok
             |FROM census CROSS JOIN g ORDER BY split""".stripMargin),
      note = "purged temporal split: train / dropped-embargo / test census plus the machine-checked per-user min horizon gap (≥3 days by construction) riding a 1-row broadcast — a wrong cutoff fails the hash, not a review")
  )
}
