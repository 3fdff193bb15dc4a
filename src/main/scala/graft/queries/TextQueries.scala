package graft.queries

import graft.Q
import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table: token counting,
  * quality scoring, language ID, fingerprinting. Ratios are built from
  * integer counts with a single double division, so Spark and DuckDB agree
  * bit-for-bit.
  */
object TextQueries {

  private def hitsSql(sw: Seq[String]): String = {
    val inList = sw.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($inList)))"
  }

  def all: Seq[Q] = Seq(

    Q("text_token_stats", Seq("P12", "A12"),
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
                  TextOps.tokenCount(col("text")).as("n_tokens"),
                  TextOps.wordPieceCount(col("text")).as("n_pieces"),
                  length(col("text")).as("n_chars_actual"),
                  TextOps.meanTokenLen(col("text")).as("mean_tok_len"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_pieces,
             |  CAST(length(text) AS INTEGER) AS n_chars_actual,
             |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS mean_tok_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_quality_score", Seq("P8", "A9"),
      (s, dir) => {
        val sw = TextOps.LangStopwords.toMap.apply("en")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
                  TextOps.stopwordHits(col("text"), sw).as("stop_hits"),
                  TextOps.qualityScore(col("text"), sw).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang,
              |  CAST(${hitsSql(Seq("the", "a", "of", "and", "is"))} AS INTEGER) AS stop_hits,
              |  greatest(0.0, least(1.0,
              |    0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
              |    + 0.5 * (CAST(${hitsSql(Seq("the", "a", "of", "and", "is"))} AS DOUBLE)
              |             / len(string_split(text, ' '))) * 5
              |    - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
              |  )) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_lang_id", Seq("P13"),
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
                  TextOps.langId(col("text")).as("pred_lang"))
          .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred_lang"),
      Some {
        val hits = TextOps.LangStopwords.map { case (l, sw) => l -> hitsSql(sw) }
        val gmax = hits.map(_._2).mkString("greatest(", ", ", ")")
        val cases = hits.map { case (l, h) =>
          s"WHEN $h > 0 AND $h = $gmax THEN '$l'"
        }.mkString("\n    ")
        s"""WITH p AS (SELECT lang,
           |  CASE
           |    $cases
           |    ELSE 'und' END AS pred_lang
           |  FROM documents)
           |SELECT lang, pred_lang, count(*) AS n FROM p
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    Q("text_fingerprint", Seq("P13", "A10"),
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .groupBy("fp")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("fp"),
      Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Corpus curation: deterministic stratified downsampling — cap each
    // length stratum at 20 docs, chosen by md5-hash rank (a seedless,
    // reproducible "uniform" sample; the md5 order IS the randomness, so
    // reruns and engines agree exactly). At 100 TB this is the standard
    // per-group reservoir: one window per stratum, no global shuffle.
    Q("sample_stratified_hash", Seq("sampling", "W4", "P13", "W9"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("h", "doc_id")
        Tables.documents(s, dir)
          .select(col("doc_id"),
                  expr("CAST(floor(n_chars / 100.0) AS INT)").as("bucket"),
                  col("n_chars"))
          .withColumn("h", expr(graft.dedup.Hashing.sparkMd5Mod("CAST(doc_id AS STRING)")))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 20)
          .select("bucket", "rk", "doc_id", "n_chars")
          .orderBy("bucket", "rk")
      },
      Some(s"""WITH h AS (
              |  SELECT doc_id, CAST(floor(n_chars / 100.0) AS INTEGER) AS bucket, n_chars,
              |    ${graft.dedup.Hashing.duckMd5Mod("CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents)
              |SELECT bucket, CAST(rk AS INTEGER) AS rk, doc_id, n_chars FROM (
              |  SELECT bucket, doc_id, n_chars,
              |    row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
              |  FROM h) t
              |WHERE rk <= 20 ORDER BY bucket, rk""".stripMargin),
      note = "hash-ranked per-stratum cap: seedless reproducible sampling"),

    // Data mixing — the step after scoring in a pretraining pipeline:
    // quality tiers get different sampling rates (keep all high-quality,
    // half of mid, a fifth of low). Tiers are fixed score thresholds (pure
    // map-side, no global ntile sort), the keep decision is md5-hash rank
    // (seedless, engine-exact, rerun-stable) — so the mixture is a single
    // scan + filter at any corpus size.
    Q("corpus_quality_mix", Seq("corpus", "sampling", "A9", "P13"),
      (s, dir) => {
        val sw = TextOps.LangStopwords.toMap.apply("en")
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.qualityScore(col("text"), sw).as("q"))
          .withColumn("tier",
            when(col("q") >= 0.55, "high").when(col("q") >= 0.35, "mid").otherwise("low"))
          .withColumn("rate",
            when(col("tier") === "high", 100).when(col("tier") === "mid", 50).otherwise(20))
          .withColumn("h",
            expr(graft.dedup.Hashing.sparkMd5Mod("CAST(doc_id AS STRING)")) % 100)
          .where(col("h") < col("rate"))
          .select(col("doc_id"), col("tier"), round(col("q"), 6).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id,
              |    greatest(0.0, least(1.0,
              |      0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
              |      + 0.5 * (CAST(${hitsSql(Seq("the", "a", "of", "and", "is"))} AS DOUBLE)
              |               / len(string_split(text, ' '))) * 5
              |      - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
              |    )) AS q,
              |    ${graft.dedup.Hashing.duckMd5Mod("CAST(doc_id AS VARCHAR)")} % 100 AS h
              |  FROM documents),
              |tiered AS (SELECT doc_id, q,
              |    CASE WHEN q >= 0.55 THEN 'high' WHEN q >= 0.35 THEN 'mid' ELSE 'low' END AS tier,
              |    CASE WHEN q >= 0.55 THEN 100 WHEN q >= 0.35 THEN 50 ELSE 20 END AS rate,
              |    h
              |  FROM scored)
              |SELECT doc_id, tier, round(q, 6) AS quality
              |FROM tiered WHERE h < rate ORDER BY doc_id""".stripMargin),
      note = "tiered mixture sampling: 100%/50%/20% by quality, md5-hash keep rule"),

    // Intra-document repetition (the Gopher repetition filters): fraction of
    // word-2-grams that are repeats and the mass of the single most frequent
    // 2-gram. Pure per-doc counting — explode + two integer aggregations,
    // ratios are single double divisions of integer counts, so both engines
    // agree bit-for-bit. Map-side at any corpus size: state per doc is
    // bounded by document length, the shuffle key is doc_id.
    Q("text_repetition_ratio", Seq("text", "A12", "A9", "P12"),
      (s, dir) => {
        val grams = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .where(size(col("t")) >= 2)
          .select(col("doc_id"),
                  explode(expr("transform(sequence(1, size(t)-1), i -> concat_ws(' ', slice(t, i, 2)))")).as("g"))
        grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n2"), count(lit(1)).as("d2"), max("c").as("maxc"))
          .select(col("doc_id"), col("n2"), col("d2"),
                  ((col("n2") - col("d2")).cast("double") / col("n2")).as("dup_frac"),
                  (col("maxc").cast("double") / col("n2")).as("top_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
             |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
             |            FROM toks WHERE len(t) >= 2)),
             |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, count(*) AS d2,
             |  CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_frac,
             |  CAST(max(c) AS DOUBLE) / sum(c) AS top_frac
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      note = "Gopher-style repetition signals: dup 2-gram fraction + top-2-gram mass"),

    // Per-doc top-k salient terms by df-normalized term frequency — the
    // TF-IDF shape with a RATIONAL weight (tf/df) instead of tf·ln(N/df):
    // ln() differs in the last ulp across libms and tf/df induces the same
    // per-doc ranking for fixed tf (monotone in df), so the oracle matches
    // bit-for-bit. Plan: explode → (doc,term) counts → term df → join +
    // window top-3. The df table is vocabulary-sized (broadcastable far
    // beyond any natural-language vocab); the window partitions by doc.
    Q("tfidf_top_terms", Seq("text", "W4", "A12", "J1"),
      (s, dir) => {
        // cached: tf feeds both the df rollup and the probe side of the
        // join — without the cache the scan+explode+aggregate subtree is
        // evaluated twice (same rationale as text_corpus_fluency's toks)
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .cache()
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
        tf.join(df, "term")
          .withColumn("score", col("tf").cast("double") / col("df"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("int").as("rk"),
                  col("term"), col("tf"), col("df"), col("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tf AS (SELECT doc_id, term, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
             |  GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    CAST(tf.tf AS DOUBLE) / df.df AS score
             |  FROM tf JOIN df USING (term))
             |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df, score FROM (
             |  SELECT doc_id, term, tf, df, score,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
             |  FROM scored) t
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),
      note = "salient-term extraction, rational tf/df weight (ln-free => engine-exact ranking)"),

    // Corpus-frequency fluency scoring — the unigram-LM quality filter
    // shape (a CCNet/KenLM-style screen without the log-space model): a
    // doc's score is the mean corpus frequency of its token occurrences,
    // plus its hapax share (tokens occurring once in the whole corpus —
    // the OCR-garbage/gibberish signal). Integer sums with single double
    // divisions: engine-exact. Plan: the corpus tf table is vocabulary-
    // sized (broadcastable at any corpus size — natural-language vocab
    // grows sublinearly), the per-doc aggregate combines map-side.
    Q("text_corpus_fluency", Seq("text", "A12", "J1", "corpus"),
      (s, dir) => {
        // cached: tf is broadcast, and ReuseExchange cannot match through a
        // BroadcastExchange wrapper — without the cache the probe side would
        // re-scan and re-explode documents independently
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .cache()
        val tf = toks.groupBy("term").agg(count(lit(1)).as("ctf"))
        toks.join(broadcast(tf), "term")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
               sum("ctf").as("sum_ctf"),
               sum(when(col("ctf") === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("doc_id"), col("n_toks"),
                  (col("sum_ctf").cast("double") / col("n_toks")).as("mean_ctf"),
                  (col("n_hapax").cast("double") / col("n_toks")).as("hapax_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT term, count(*) AS ctf FROM toks GROUP BY 1)
             |SELECT doc_id, count(*) AS n_toks,
             |  CAST(sum(ctf) AS DOUBLE) / count(*) AS mean_ctf,
             |  CAST(sum(CASE WHEN ctf = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hapax_frac
             |FROM toks JOIN tf USING (term)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      note = "unigram-LM-shaped quality screen: mean corpus tf + hapax share, ln-free"),

    // PII detection + redaction — every production training-data pipeline
    // scrubs emails/phones/IPs before anything else sees the text. The
    // harness corpus is synthetic word-soup with no PII, so the query first
    // injects deterministic doc_id-derived PII (same expression on both
    // engines), then runs the real operator: per-class regexp counts and a
    // chained regexp_replace redaction, verified via the 48-bit hash of the
    // scrubbed text. The patterns stay in the portable RE2 ∩ java.util.regex
    // subset (char classes, bounded repeats, escaped dots — no lookaround),
    // so both engines match identically. Entirely map-side: at 100 TB this
    // pipelines inside the scan with zero shuffles before the output sort.
    Q("text_pii_scrub", Seq("text", "P13", "P15", "A12"),
      (s, dir) => {
        // Patterns stay on the DataFrame API (no expr()) so Spark SQL's
        // backslash-escaping string literals never touch the `\.` escapes —
        // the same Scala string reaches java.util.regex that the oracle's
        // standard-SQL literal hands RE2.
        val email = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
        val phone = "[0-9]{3}-[0-9]{4}"
        val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+ "
        val id = col("doc_id").cast("string")
        val pii = concat(
          col("text"), lit(" contact user"), id, lit("@example.com"),
          when(col("doc_id") % 3 === 0,
               concat(lit(" cc backup."), id, lit("@mail.example.org"))).otherwise(lit("")),
          lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          when(col("doc_id") % 5 === 0, lit(" or 555-0000")).otherwise(lit("")),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 end"))
        Tables.documents(s, dir)
          .select(col("doc_id"), pii.as("pii"))
          .select(col("doc_id"),
                  regexp_count(col("pii"), lit(email)).cast("int").as("n_email"),
                  regexp_count(col("pii"), lit(phone)).cast("int").as("n_phone"),
                  regexp_count(col("pii"), lit(ip)).cast("int").as("n_ip"),
                  regexp_replace(regexp_replace(regexp_replace(col("pii"),
                    email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP> ").as("scrub"))
          .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
                  expr(graft.dedup.Hashing.sparkMd5Mod("scrub")).as("scrub_hash"))
          .orderBy("doc_id")
      },
      Some {
        val email = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
        val phone = "[0-9]{3}-[0-9]{4}"
        val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+ "
        val injected =
          "concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com', " +
          "CASE WHEN doc_id % 3 = 0 THEN concat(' cc backup.', CAST(doc_id AS VARCHAR), '@mail.example.org') ELSE '' END, " +
          "' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
          "CASE WHEN doc_id % 5 = 0 THEN ' or 555-0000' ELSE '' END, " +
          "' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7 end')"
        val scrubbed =
          s"regexp_replace(regexp_replace(regexp_replace(pii, '$email', '<EMAIL>', 'g'), " +
          s"'$phone', '<PHONE>', 'g'), '$ip', '<IP> ', 'g')"
        s"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(pii, '$email')) AS INTEGER) AS n_email,
           |  CAST(len(regexp_extract_all(pii, '$phone')) AS INTEGER) AS n_phone,
           |  CAST(len(regexp_extract_all(pii, '$ip')) AS INTEGER) AS n_ip,
           |  ${graft.dedup.Hashing.duckMd5Mod(scrubbed)} AS scrub_hash
           |FROM (SELECT doc_id, $injected AS pii FROM documents) t
           |ORDER BY doc_id""".stripMargin
      },
      note = "regex PII counts + chained redaction over injected doc_id-derived PII; map-side only"),

    // BPE merge-pair statistics — the inner loop of tokenizer training:
    // count adjacent symbol pairs across the corpus and surface the top
    // merge candidates. Computed the way BPE trainers actually scale:
    // compress the corpus to its DICTIONARY first (distinct word × count —
    // one shuffle whose combiner collapses each partition's repeats), then
    // explode the pair positions of each distinct word only once and weight
    // by the word count. Pair work is O(|vocab| × word_len), not
    // O(corpus tokens) — at 100 TB the vocab table is orders of magnitude
    // smaller than the token stream. Integer counts end to end.
    Q("text_bpe_pair_stats", Seq("text", "A12", "W4", "P13"),
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) >= 2)
          .groupBy("word").agg(count(lit(1)).as("wcnt"))
        val pairs = words
          .select(col("word"), col("wcnt"),
                  explode(expr("transform(sequence(1, CAST(length(word) - 1 AS INT)), " +
                               "i -> substring(word, i, 2))")).as("pair"))
          .groupBy("pair")
          .agg(sum("wcnt").as("total"), countDistinct("word").as("n_words"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("total").desc, col("pair"))
        pairs.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 20)
          .select(col("rank").cast("int").as("rank"), col("pair"),
                  col("total"), col("n_words"))
          .orderBy("rank")
      },
      Some("""WITH w AS (
             |  SELECT word, count(*) AS wcnt FROM (
             |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |  WHERE length(word) >= 2 GROUP BY 1),
             |p AS (SELECT word, wcnt,
             |        unnest(generate_series(1, length(word) - 1)) AS i
             |      FROM w),
             |a AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
             |        CAST(sum(wcnt) AS BIGINT) AS total,
             |        count(DISTINCT word) AS n_words
             |      FROM p GROUP BY 1)
             |SELECT CAST(row_number() OVER (ORDER BY total DESC, pair) AS INTEGER) AS rank,
             |  pair, total, n_words
             |FROM a ORDER BY total DESC, pair LIMIT 20""".stripMargin),
      note = "BPE pair counting over the compressed dictionary: O(vocab), not O(tokens)"),

    // Vocabulary coverage curve — the tokenizer-sizing question ("how much
    // of the token stream do the top-k types cover?") answered exactly:
    // rank the term dictionary by frequency and accumulate mass at
    // k ∈ {10, 100, 1000}. Integer token counts with one final division,
    // so the curve is engine-exact. Same dictionary-compression shape as
    // the BPE pair counter: the ranked vocab is tiny next to the stream.
    Q("text_vocab_coverage", Seq("text", "A9", "A12", "W4"),
      (s, dir) => {
        import s.implicits._
        val W = org.apache.spark.sql.expressions.Window
        val ranked = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("term"))
          .where(length(col("term")) >= 1)
          .groupBy("term").agg(count(lit(1)).as("tf"))
          .withColumn("rank", row_number().over(W.orderBy(col("tf").desc, col("term"))))
        Seq(10, 100, 1000).toDF("k")
          .crossJoin(ranked)
          .groupBy("k")
          .agg(sum(when(col("rank") <= col("k"), col("tf")).otherwise(0L)).as("covered_tokens"),
               sum("tf").as("total_tokens"),
               sum(when(col("rank") <= col("k"), 1L).otherwise(0L)).as("n_terms"))
          .withColumn("coverage",
            col("covered_tokens").cast("double") / col("total_tokens"))
          .orderBy("k")
      },
      Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT term, count(*) AS tf FROM t WHERE length(term) >= 1 GROUP BY 1),
             |r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rank FROM tf),
             |qs AS (SELECT CAST(unnest([10, 100, 1000]) AS INTEGER) AS k)
             |SELECT k,
             |  CAST(sum(CASE WHEN rank <= k THEN tf ELSE 0 END) AS BIGINT) AS covered_tokens,
             |  CAST(sum(tf) AS BIGINT) AS total_tokens,
             |  CAST(sum(CASE WHEN rank <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
             |  CAST(CAST(sum(CASE WHEN rank <= k THEN tf ELSE 0 END) AS BIGINT) AS DOUBLE)
             |    / CAST(sum(tf) AS BIGINT) AS coverage
             |FROM qs, r GROUP BY k ORDER BY k""".stripMargin),
      note = "top-k vocabulary mass curve over the ranked dictionary; integer-exact"),

    // Bigram-LM fluency — the word-ORDER complement of the unigram screen
    // above (text_corpus_fluency scores token rarity; this scores whether
    // adjacent pairs are corpus-plausible, the KenLM-filter shape one order
    // up). Each bigram occurrence gets its MLE conditional probability
    // P(w2|w1) = c(w1,w2)/c(w1·) as an INTEGER parts-per-million via
    // fixed-point floor division — both engines floor positive integers
    // identically, so the score is bit-exact with no float-sum ordering
    // hazard. novel_frac (corpus-unique bigrams) is the gibberish signal.
    // Plan: the bigram dictionary is vocabulary²-bounded but in practice
    // observed-bigram-sized (broadcast; shuffle join past that — shape
    // unchanged); the per-doc aggregate combines map-side.
    Q("text_bigram_fluency", Seq("text", "A12", "J1", "corpus"),
      (s, dir) => {
        val bg = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .where(size(col("t")) >= 2)
          .select(col("doc_id"),
                  explode(expr("transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1"), col("b.w2"))
          .cache() // counted then probed; broadcast wrappers defeat ReuseExchange
        val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
        bg.join(broadcast(c2), Seq("w1", "w2"))
          .join(broadcast(c1), Seq("w1"))
          .withColumn("ppm", expr("(c2 * 1000000) div c1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
               sum("ppm").as("sum_cond_ppm"),
               sum(when(col("c2") === 1, 1L).otherwise(0L)).as("n_novel"))
          .select(col("doc_id"), col("n_bigrams"), col("sum_cond_ppm"),
                  (col("sum_cond_ppm").cast("double") / col("n_bigrams")).as("mean_cond_ppm"),
                  (col("n_novel").cast("double") / col("n_bigrams")).as("novel_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
             |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks)),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum((c2.c2 * 1000000) // c1.c1) AS BIGINT) AS sum_cond_ppm,
             |  CAST(CAST(sum((c2.c2 * 1000000) // c1.c1) AS BIGINT) AS DOUBLE)
             |    / count(*) AS mean_cond_ppm,
             |  CAST(sum(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS novel_frac
             |FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      note = "bigram conditional-probability fluency in fixed-point ppm; integer floor-div => engine-exact"),

    // Hashing-trick linear classifier inference — the 100-TB model-serving
    // shape: NO vocabulary build, no dictionary join, no shuffle at all. The
    // feature weight of a term is derived directly from its md5 (signed
    // milli-units in [-1000, 1000]), so scoring is a single fold over the
    // token array inside one codegen'd projection; a real trained model
    // would broadcast its weight table or hash weights the same way
    // (Weinberger et al., "Feature Hashing for Large Scale Multitask
    // Learning"). Only the presentation sort exchanges data.
    Q("text_hashed_classifier", Seq("text", "P13", "A12", "§2.10"),
      (s, dir) => {
        val wTerm = s"(${graft.dedup.Hashing.sparkMd5Mod("t")} % 2001) - 1000"
        Tables.documents(s, dir)
          .select(col("doc_id"),
                  expr(s"""aggregate(split(text, ' '), CAST(0 AS BIGINT),
                          |  (acc, t) -> acc + (CASE WHEN length(t) >= 1
                          |                     THEN $wTerm ELSE 0 END))""".stripMargin)
                    .as("score_milli"))
          .withColumn("label", (col("score_milli") >= 0L).cast("int"))
          .orderBy("doc_id")
      },
      Some {
        val wTerm = s"(${graft.dedup.Hashing.duckMd5Mod("t")} % 2001) - 1000"
        s"""SELECT doc_id,
           |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
           |    t -> (CASE WHEN length(t) >= 1 THEN $wTerm ELSE 0 END))), 0)
           |    AS BIGINT) AS score_milli,
           |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
           |    t -> (CASE WHEN length(t) >= 1 THEN $wTerm ELSE 0 END))), 0) >= 0
           |    AS INTEGER) AS label
           |FROM documents ORDER BY doc_id""".stripMargin
      },
      note = "hashing-trick linear inference: zero dictionary, zero shuffle — one codegen'd fold per doc"),

    // BPE APPLY — the other half of the tokenizer (text_bpe_pair_stats
    // learns the merge table; this applies it). The top-4 learned merges
    // are applied rank-by-rank to every vocabulary word's char-spaced
    // form, then docs join the merged dictionary — so the string rewriting
    // is O(vocab) however long the token stream is, and the doc pass is a
    // broadcast join + one sum. Merge application is a single left-to-right
    // replace() pass per merge in BOTH engines; spaces are doubled before
    // each pass so adjacent matches never share a boundary space (the
    // classic SQL word-boundary trick), making the rewrite engine-exact.
    // Merges are data-dependent: Spark pivots the ranked pairs into one
    // broadcast row; the oracle inlines them as scalar subqueries.
    Q("text_bpe_apply", Seq("text", "A12", "J1", "P13", "W4"),
      (s, dir) => {
        def app(sc: String, m: String): String =
          s"replace(replace(replace($sc, ' ', '  '), " +
          s"' ' || substr($m, 1, 1) || '  ' || substr($m, 2, 1) || ' ', " +
          s"' ' || $m || ' '), '  ', ' ')"
        val spaced0 = "' ' || concat_ws(' ', transform(sequence(1, CAST(length(word) AS INT)), " +
          "i -> substring(word, i, 1))) || ' '"
        val dictAll = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) >= 1)
          .groupBy("word").agg(count(lit(1)).as("wcnt"))
        val ranked = dictAll.where(length(col("word")) >= 2)
          .select(col("word"), col("wcnt"),
                  explode(expr("transform(sequence(1, CAST(length(word) - 1 AS INT)), " +
                               "i -> substring(word, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("wcnt").as("total"))
          .withColumn("rk", row_number().over( // bounded: bigram vocabulary
            graft.core.Shape.boundedWindow(col("total").desc, col("pair"))))
          .where(col("rk") <= 4)
        val merges = ranked.groupBy().pivot("rk", Seq(1, 2, 3, 4)).agg(first("pair"))
          .select(col("1").as("m1"), col("2").as("m2"), col("3").as("m3"), col("4").as("m4"))
        val sFinal = app(app(app(app(spaced0, "m1"), "m2"), "m3"), "m4")
        val dict = dictAll.crossJoin(broadcast(merges))
          .select(col("word"), expr(sFinal).as("sf"))
          .select(col("word"),
                  expr("length(word)").as("n_chars"),
                  expr("length(sf) - length(replace(sf, ' ', '')) - 1").as("n_sym"))
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) >= 1)
          .join(broadcast(dict), "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
               sum("n_chars").as("chars_total"),
               sum("n_sym").as("symbols_after"))
          .withColumn("compression",
                      col("symbols_after").cast("double") / col("chars_total"))
          .orderBy("doc_id")
      },
      Some {
        def app(sc: String, m: String): String =
          s"replace(replace(replace($sc, ' ', '  '), " +
          s"' ' || substr($m, 1, 1) || '  ' || substr($m, 2, 1) || ' ', " +
          s"' ' || $m || ' '), '  ', ' ')"
        val spaced0 = "' ' || array_to_string(list_transform(generate_series(1, length(word)), " +
          "i -> substr(word, CAST(i AS INTEGER), 1)), ' ') || ' '"
        def mk(k: Int) = s"(SELECT pair FROM ranked WHERE rk = $k)"
        val sFinal = app(app(app(app(spaced0, mk(1)), mk(2)), mk(3)), mk(4))
        s"""WITH dict_all AS (
           |  SELECT word, count(*) AS wcnt FROM (
           |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
           |  WHERE length(word) >= 1 GROUP BY 1),
           |pairs AS (
           |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
           |    CAST(sum(wcnt) AS BIGINT) AS total
           |  FROM (SELECT word, wcnt, unnest(generate_series(1, length(word) - 1)) AS i
           |        FROM dict_all WHERE length(word) >= 2) p
           |  GROUP BY 1),
           |ranked AS (
           |  SELECT pair, row_number() OVER (ORDER BY total DESC, pair) AS rk
           |  FROM pairs QUALIFY rk <= 4),
           |dict AS (
           |  SELECT word, length(word) AS n_chars,
           |    length(sf) - length(replace(sf, ' ', '')) - 1 AS n_sym
           |  FROM (SELECT word, $sFinal AS sf FROM dict_all) t),
           |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
           |SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
           |  CAST(sum(n_sym) AS BIGINT) AS symbols_after,
           |  CAST(CAST(sum(n_sym) AS BIGINT) AS DOUBLE)
           |    / CAST(sum(n_chars) AS BIGINT) AS compression
           |FROM toks JOIN dict USING (word)
           |WHERE length(word) >= 1
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      note = "learned-merge application over the dictionary (O(vocab) rewriting), broadcast join to the stream; double-space boundary trick keeps replace() engine-exact"),

    // BM25 top-k retrieval — the lexical ranking half of every corpus
    // search / contamination-check / hard-negative-mining pipeline. Four
    // fixed term queries are scored against the whole corpus with the
    // Okapi saturation form (k1=1.2, b=0.75). Engine-exactness: the
    // textbook idf's ln() differs in the last ulp across libms (same issue
    // as tfidf_top_terms), so the idf factor is the RATIONAL Robertson
    // core (N - df + 0.5)/(df + 0.5) — strictly monotone in the textbook
    // idf, identical ranking, and composed purely of IEEE +,*,/ that both
    // engines round identically. Per-query scores are summed in FIXED
    // textual order over pivoted per-term columns (a float sum over a
    // groupBy would be partition-order-dependent). Scale shape: tf/df
    // stats are shuffle aggregations with map-side partials; query-term
    // filtering happens BEFORE the tf shuffle so only rows for the ~10
    // query terms move; the pivot is one more keyed aggregation and top-k
    // is a per-query window over score-filtered docs — no pair joins, no
    // global sort.
    Q("text_bm25_topk", Seq("text", "similarity", "A1", "W4", "F4"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val queries = Seq( // query_id -> terms (fixed order = summation order)
          1 -> Seq("spark", "join"),
          2 -> Seq("hash", "table", "scan"),
          3 -> Seq("window", "agg"),
          4 -> Seq("vector", "stream", "merge"))
        val qterms = queries.flatMap(_._2).distinct
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val glob = dl.agg(count(lit(1)).as("n_docs"),
                          (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
        val tf = toks.where(col("term").isin(qterms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val sc = tf.join(dl, "doc_id").join(broadcast(df), "term")
          .crossJoin(broadcast(glob))
          .withColumn("sc", expr(bm25Sc))
        val pivot = sc.groupBy("doc_id")
          .agg(max(when(col("term") === qterms.head, col("sc"))).as(s"s_${qterms.head}"),
               qterms.tail.map(t => max(when(col("term") === t, col("sc"))).as(s"s_$t")): _*)
        // all four query scores in ONE pass over the pivot (a per-query
        // union would re-evaluate the whole stats chain per branch):
        // explode a literal array of (query_id, fixed-order sum) structs
        val qStructs = queries.map { case (qid, terms) =>
          struct(lit(qid).as("query_id"),
                 expr(terms.map(t => s"coalesce(s_$t, 0.0)").mkString(" + ")).as("score"))
        }
        val perQuery = pivot
          .select(col("doc_id"), explode(array(qStructs: _*)).as("q"))
          .select(col("q.query_id").as("query_id"), col("doc_id"), col("q.score").as("score"))
          .where(col("score") > 0)
        val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
        perQuery.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 10)
          .select(col("query_id"), col("rank").cast("int").as("rank"),
                  col("doc_id"), col("score"))
          .orderBy("query_id", "rank")
      },
      Some {
        val queries = Seq(1 -> Seq("spark", "join"), 2 -> Seq("hash", "table", "scan"),
                          3 -> Seq("window", "agg"), 4 -> Seq("vector", "stream", "merge"))
        val qterms = queries.flatMap(_._2).distinct
        val inList = qterms.map(t => s"'$t'").mkString(", ")
        val pivCols = qterms.map(t => s"max(CASE WHEN term = '$t' THEN sc END) AS s_$t").mkString(",\n  ")
        val qRows = queries.map { case (qid, terms) =>
          val sum = terms.map(t => s"coalesce(s_$t, 0.0)").mkString(" + ")
          s"SELECT $qid AS query_id, doc_id, $sum AS score FROM piv"
        }.mkString("\nUNION ALL\n")
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
           |gstat AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           |       WHERE term IN ($inList) GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |sc AS (SELECT tf.doc_id, tf.term, $bm25Sc AS sc
           |       FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN gstat),
           |piv AS (SELECT doc_id,
           |  $pivCols
           |  FROM sc GROUP BY doc_id),
           |q AS ($qRows)
           |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score FROM (
           |  SELECT query_id, doc_id, score,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
           |  FROM q WHERE score > 0) t
           |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      },
      note = "Okapi BM25 top-10 for 4 fixed term queries; rational Robertson idf keeps it libm-free and engine-exact; term filter before the tf shuffle, fixed-order pivot sum"),

    // Character-bigram Simpson index (collision probability Σp² — the
    // Rényi-2 analogue of the compression-ratio quality filter):
    // CHARACTER-level repetition, which catches space-free and
    // tokenizer-invisible degeneracy ("aaaa…", keyboard mashing, base64
    // blobs) that the word-level `text_repetition_ratio` signals miss —
    // near-uniform bigrams (low Σp²) flag machine noise, a heavy bigram
    // head flags loops. Shannon/Rényi entropies need log(), whose last
    // ulp differs across libms, so the shipped statistic is the exact
    // rational core: Σ n_i² and N as BIGINTs plus the single IEEE
    // division Σn²/N² (bit-identical across engines). The statistic is a
    // function of ONE document, so it is computed per ROW with zero
    // shuffle: sort the bigram array (any total order — only adjacency of
    // equal values matters) and fold run-lengths with `aggregate`,
    // accumulating Σrun² and the distinct count in one pass bounded by
    // document length. The first formulation here exploded to a
    // (doc, bigram) census — at sf1 that shuffled ~125M rows for 15.9s;
    // this plan's only exchange is the output-order finalizer (sf1 ~1s).
    // The oracle keeps the census formulation: the engines must agree
    // across two genuinely different plans.
    Q("text_char_simpson", Seq("text", "P13", "A12", "A9"),
      (s, dir) => {
        Tables.documents(s, dir)
          .where(length(col("text")) >= 2)
          .select(col("doc_id"),
                  expr("array_sort(transform(sequence(1, length(text)-1), i -> substring(text, i, 2)))").as("gs"))
          .select(col("doc_id"),
                  size(col("gs")).cast("long").as("n_bigrams"),
                  expr("""aggregate(gs,
                            struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS d, 0L AS ss),
                            (a, x) -> IF(a.prev IS NULL OR x != a.prev,
                                         struct(x AS prev, 1L AS run, a.d + 1L AS d,
                                                a.ss + a.run * a.run AS ss),
                                         struct(x AS prev, a.run + 1L AS run, a.d AS d, a.ss AS ss)),
                            a -> struct(a.d AS d, a.ss + a.run * a.run AS ss))""").as("f"))
          .select(col("doc_id"), col("n_bigrams"),
                  col("f.d").as("d_bigrams"), col("f.ss").as("sum_sq"),
                  (col("f.ss").cast("double") /
                    (col("n_bigrams").cast("double") * col("n_bigrams"))).as("simpson"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, substring(text, i, 2) AS g
             |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 1)) AS i
             |        FROM documents WHERE length(text) >= 2)),
             |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             |  count(*) AS d_bigrams, CAST(sum(c * c) AS BIGINT) AS sum_sq,
             |  CAST(sum(c * c) AS DOUBLE) /
             |    (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS BIGINT)) AS simpson
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      note = "char-bigram collision probability (Rényi-2 core): exact BIGINT Σn²/N with one final IEEE division — no log(), no libm divergence; per-ROW sorted-array run-length fold, ZERO row-volume shuffle (the census formulation it replaced shuffled ~125M (doc,gram) rows at sf1 — the oracle still computes that census, so the hash check spans two different plans)"),

    // Vocabulary-growth (Heaps' law) curve — the corpus diagnostic that
    // says whether more data still buys new types: cumulative distinct
    // vocabulary vs cumulative token volume at 10 checkpoints along the
    // corpus. Checkpoints are doc_id KEY-RANGE deciles against a 1-row
    // max-key broadcast (the declared contract — exact deciles on the
    // contiguous base ids, deterministic on any ids), because a rank-based
    // decile would globally sort the doc census. "Cumulative distinct" is
    // NEVER computed as per-checkpoint count(distinct) over growing
    // prefixes (k rescans of the token stream, quadratic at 100 TB): each
    // type's FIRST doc bucket is a map-side min over the token explode,
    // the per-bucket new-type census shuffles only the vocabulary, and the
    // running sums are a window over the 10-row tail. Token volume rides
    // the same explode pre-aggregated per doc. All-integer output.
    Q("text_vocab_growth", Seq("text", "A10", "A12", "W9", "F10"),
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val maxd = Tables.documents(s, dir)
          .agg((max("doc_id") + 1).as("n_keys"))
        val newTypes = toks.groupBy("tok").agg(min("doc_id").as("first_doc"))
          .crossJoin(broadcast(maxd))
          .groupBy(expr("first_doc * 10 div n_keys").as("bucket"))
          .agg(count(lit(1)).as("new_types"))
        val volume = Tables.documents(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
          .crossJoin(broadcast(maxd))
          .groupBy(expr("doc_id * 10 div n_keys").as("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        val w = graft.core.Shape.boundedWindow("bucket")
          .rowsBetween(Long.MinValue, 0)
        volume.join(newTypes, Seq("bucket"), "left")
          .na.fill(0L, Seq("new_types"))
          .select(col("bucket"), col("n_docs"), col("n_tokens"), col("new_types"),
                  sum("n_tokens").over(w).as("cum_tokens"),
                  sum("new_types").over(w).as("cum_types"))
          .transform(graft.core.Shape.boundedSort(_, "bucket"))
      },
      Some("""WITH m AS (SELECT max(doc_id) + 1 AS n_keys FROM documents),
             |f AS (SELECT tok, min(doc_id) AS first_doc FROM (
             |        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents) GROUP BY 1),
             |nt AS (SELECT first_doc * 10 // m.n_keys AS bucket,
             |         count(*) AS new_types FROM f CROSS JOIN m GROUP BY 1),
             |v AS (SELECT doc_id * 10 // m.n_keys AS bucket, count(*) AS n_docs,
             |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             |      FROM documents CROSS JOIN m GROUP BY 1)
             |SELECT v.bucket, v.n_docs, v.n_tokens,
             |  coalesce(nt.new_types, 0) AS new_types,
             |  CAST(sum(v.n_tokens) OVER (ORDER BY v.bucket) AS BIGINT) AS cum_tokens,
             |  CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY v.bucket) AS BIGINT) AS cum_types
             |FROM v LEFT JOIN nt USING (bucket) ORDER BY v.bucket""".stripMargin),
      note = "Heaps-law vocabulary growth at key-range decile checkpoints: first-occurrence bucket per type (map-side min over one token explode, vocab-sized shuffle — never k prefix rescans), doc-side token volume on the same decile key, running sums over the 10-row tail")
  )

  /** Okapi BM25 per-(doc, term) score with the rational Robertson idf —
    * identical textual form on both engines so every IEEE +,*,/ rounds the
    * same way. Columns: tf, df, dl BIGINT; n_docs BIGINT; avgdl DOUBLE. */
  private val bm25Sc: String =
    "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * " +
    "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))"
}
