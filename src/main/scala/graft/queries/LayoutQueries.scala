package graft.queries

import graft.Q
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: clustering keys for multi-dimensional file
  * skipping.
  *
  * At 100 TB the dominant cost of any selective query is how many files its
  * predicates can SKIP, not how fast it scans the rest. `partitionBy` prunes
  * one dimension (the reference's per-date raster directory is exactly that,
  * `rasterize.py:63` filename dates); parquet min/max row-group stats prune
  * a second only if the write order makes per-file ranges tight. A Z-order
  * (Morton) clustering key interleaves the bits of two quantized dimensions
  * so that sorting by the single key keeps EVERY file's [min,max] box tight
  * in BOTH — `WHERE part BETWEEN .. AND supp BETWEEN ..` then skips all but
  * O(√files). The operator emits the key plus per-bucket min/max spans —
  * the very statistics a file-skipping scan consults — and LayoutSpec
  * asserts the tightness property against a linear sort of the same rows.
  */
object LayoutQueries {

  private val Bits = 10 // 2 × 10-bit dims → 20-bit z codes
  private val BucketShift = 10 // 1024 codes per bucket = one 32×32 tile

  /** Bit interleave Σ_i ((a_i)«2i | (b_i)«(2i+1)) as plain integer
    * arithmetic — shift/mask/multiply-by-power-of-two, expressed per engine
    * but computing the identical BIGINT. */
  private def zSpark(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"(shiftright(CAST($a AS BIGINT), $i) & 1) * ${1L << (2 * i)}L" +
        s" + (shiftright(CAST($b AS BIGINT), $i) & 1) * ${1L << (2 * i + 1)}L"
    }.mkString(" + ")

  private def zDuck(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"((CAST($a AS BIGINT) >> $i) & 1) * ${1L << (2 * i)}" +
        s" + ((CAST($b AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  def all: Seq[Q] = Seq(

    // Z-order clustering key over (part, order) + the per-bucket min/max
    // spans a file-skipping reader would consult. One shuffle (the stats
    // groupBy); the key itself is pure map-side codegen arithmetic. At
    // scale: sort-by-z before write, one bucket ≈ one file/row-group, and
    // both d1 and d2 predicates prune on the stored min/max.
    Q("zorder_cluster_key", Seq("P4", "F5", "A4", "skew", "§2.10"),
      (s, dir) => {
        val d1 = "l_partkey % 1024"
        val d2 = "l_orderkey % 1024"
        Tables.lineitem(s, dir)
          .select(expr(d1).as("d1"), expr(d2).as("d2"))
          .withColumn("z", expr(zSpark("d1", "d2")))
          .withColumn("zbucket", expr(s"CAST(shiftright(z, $BucketShift) AS INT)"))
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n"),
               min("d1").as("min_d1"), max("d1").as("max_d1"),
               min("d2").as("min_d2"), max("d2").as("max_d2"))
          .withColumn("span_d1", col("max_d1") - col("min_d1"))
          .withColumn("span_d2", col("max_d2") - col("min_d2"))
          .orderBy("zbucket")
      },
      Some(s"""SELECT zbucket, count(*) AS n,
              |  min(d1) AS min_d1, max(d1) AS max_d1,
              |  min(d2) AS min_d2, max(d2) AS max_d2,
              |  max(d1) - min(d1) AS span_d1,
              |  max(d2) - min(d2) AS span_d2
              |FROM (
              |  SELECT d1, d2,
              |    CAST((${zDuck("d1", "d2")}) >> $BucketShift AS INTEGER) AS zbucket
              |  FROM (SELECT l_partkey % 1024 AS d1, l_orderkey % 1024 AS d2
              |        FROM lineitem) t) u
              |GROUP BY zbucket ORDER BY zbucket""".stripMargin),
      note = "Morton-interleave clustering key + per-bucket min/max skip stats; map-side codegen arithmetic"),

    // The payoff audit for the clustering key: simulate a file-skipping
    // scan over TWO physical layouts of the same rows — value-range
    // bucketing on d1 alone (what a naive sort-by-one-column write gives
    // you) vs the Morton buckets — and count, per canned predicate, how
    // many "files" the stored min/max boxes let the reader skip and how
    // many rows survive to be scanned. The single-dimension layout prunes
    // only its own dimension (d2 min/max spans the full domain in every
    // bucket); the Z-order layout prunes BOTH. This is the zone-map
    // arithmetic every lakehouse scan planner runs — all integer,
    // engine-exact.
    Q("layout_skipping_audit", Seq("F5", "F2", "A4", "P4", "§2.10"),
      (s, dir) => {
        val rows = Tables.lineitem(s, dir)
          .select(expr("l_partkey % 1024").as("d1"), expr("l_orderkey % 1024").as("d2"))
        val zstat = rows
          .withColumn("z", expr(zSpark("d1", "d2")))
          .withColumn("bucket", expr(s"CAST(shiftright(z, $BucketShift) AS INT)"))
          .withColumn("layout", lit("zorder"))
        val lstat = rows
          .withColumn("bucket", expr("CAST(d1 div 8 AS INT)"))
          .withColumn("layout", lit("linear_d1"))
        zstat.select("layout", "bucket", "d1", "d2")
          .union(lstat.select("layout", "bucket", "d1", "d2"))
          .groupBy("layout", "bucket")
          .agg(count(lit(1)).as("n"),
               min("d1").as("lo1"), max("d1").as("hi1"),
               min("d2").as("lo2"), max("d2").as("hi2"))
          .withColumn("skip1", (col("hi1") < 100 || col("lo1") > 131).cast("long"))
          .withColumn("skip2", (col("hi2") < 200 || col("lo2") > 231).cast("long"))
          .withColumn("skip3", (col("skip1") === 1 || col("skip2") === 1).cast("long"))
          .groupBy("layout")
          .agg(count(lit(1)).as("n_blocks"),
               sum("skip1").as("skipped_d1_pred"),
               sum("skip2").as("skipped_d2_pred"),
               sum("skip3").as("skipped_both_pred"),
               sum(when(col("skip1") === 0, col("n")).otherwise(0L)).as("rows_scanned_d1"),
               sum(when(col("skip2") === 0, col("n")).otherwise(0L)).as("rows_scanned_d2"),
               sum(when(col("skip3") === 0, col("n")).otherwise(0L)).as("rows_scanned_both"))
          .orderBy("layout")
      },
      Some(s"""WITH rows_ AS (SELECT l_partkey % 1024 AS d1, l_orderkey % 1024 AS d2 FROM lineitem),
              |tagged AS (
              |  SELECT 'zorder' AS layout,
              |    CAST((${zDuck("d1", "d2")}) >> $BucketShift AS INTEGER) AS bucket, d1, d2
              |  FROM rows_
              |  UNION ALL
              |  SELECT 'linear_d1' AS layout, CAST(d1 // 8 AS INTEGER) AS bucket, d1, d2
              |  FROM rows_),
              |stats AS (
              |  SELECT layout, bucket, count(*) AS n,
              |    min(d1) AS lo1, max(d1) AS hi1, min(d2) AS lo2, max(d2) AS hi2
              |  FROM tagged GROUP BY 1, 2),
              |flags AS (
              |  SELECT layout, n,
              |    CAST(hi1 < 100 OR lo1 > 131 AS BIGINT) AS skip1,
              |    CAST(hi2 < 200 OR lo2 > 231 AS BIGINT) AS skip2,
              |    CAST((hi1 < 100 OR lo1 > 131) OR (hi2 < 200 OR lo2 > 231) AS BIGINT) AS skip3
              |  FROM stats)
              |SELECT layout, count(*) AS n_blocks,
              |  CAST(sum(skip1) AS BIGINT) AS skipped_d1_pred,
              |  CAST(sum(skip2) AS BIGINT) AS skipped_d2_pred,
              |  CAST(sum(skip3) AS BIGINT) AS skipped_both_pred,
              |  CAST(sum(CASE WHEN skip1 = 0 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned_d1,
              |  CAST(sum(CASE WHEN skip2 = 0 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned_d2,
              |  CAST(sum(CASE WHEN skip3 = 0 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned_both
              |FROM flags GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "zone-map skip audit: Z-order layout prunes both dims, single-dim layout only its own; integer-exact scan accounting"),

    // Bucketed co-located join — the 100 TB strategy for a big×big join
    // that recurs on the same key: pre-hash BOTH tables into the same
    // bucket layout on the join key at write time, so every later join on
    // that key reads already-co-located buckets and plans a SortMergeJoin
    // with NO shuffle exchange on either side (PlanRegressionSpec asserts
    // zero exchanges under the join). repartition(nb, key) before the
    // bucketed write aligns write tasks to buckets (same murmur3 hash both
    // places → exactly one file per bucket) and sortBy pre-sorts each file.
    // The merge hint pins the demonstration to SMJ even where a toy SF
    // would broadcast. The oracle sees only the data contract: bucketing
    // changes physical layout, never results.
    Q("j_bucketed_colocated", Seq("J1", "K3", "F1", "§2.10"),
      (s, dir) => {
        val nb = 8
        val orders = Tables.orders(s, dir).where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"))
        val lines = Tables.lineitem(s, dir).where(col("l_orderkey") % 7 === 0)
          .select(col("l_orderkey"), col("l_quantity"))
        // Layout setup runs ONCE per session (FrameMemo.once): bucketing is
        // write-once-query-many by definition — repeat passes measure the
        // zero-exchange join against the standing layout, not the rewrite.
        FrameMemo.once(s, s"$dir#bkt_tables") {
          orders.repartition(nb, col("o_orderkey"))
            .write.mode("overwrite").format("parquet")
            .bucketBy(nb, "o_orderkey").sortBy("o_orderkey")
            .option("path", graft.util.Scratch.fresh("bktord"))
            .saveAsTable("bkt_orders")
          lines.repartition(nb, col("l_orderkey"))
            .write.mode("overwrite").format("parquet")
            .bucketBy(nb, "l_orderkey").sortBy("l_orderkey")
            .option("path", graft.util.Scratch.fresh("bktli"))
            .saveAsTable("bkt_lineitem")
        }
        val o = s.table("bkt_orders")
        val l = s.table("bkt_lineitem")
        o.hint("merge")
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_lines"),
               expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("qty"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_lines,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey % 7 = 0
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin),
      note = "bucketed-by-key co-located SortMergeJoin: zero exchange on either join side; one file per bucket, pre-sorted"),

    // Range-partition balance audit — the write-layout twin of what
    // `repartitionByRange` does internally: pick B-1 split points from a
    // bounded deterministic sample, assign every row its range bucket with
    // pure broadcast arithmetic, and report how even the buckets came out
    // (balance_ratio = bucket share × B; 1.0 = perfectly even). At 100 TB
    // this is the op you run BEFORE a globally-sorted write: boundaries
    // from a ~1k-row sample, assignment map-side, the only shuffle is the
    // per-bucket stats rollup. The sample is hash-thinned with a modulus
    // derived from the row count (targeting ~1k rows at ANY scale — the
    // same bounded-collect discipline as the GWR calibration cap), so the
    // single-task sample sort never grows with the data. Seedless md5
    // thinning keeps both engines on identical rows.
    Q("layout_range_balance", Seq("F5", "A4", "sampling", "skew", "P4"),
      (s, dir) => {
        val B = 8
        val k = Tables.orders(s, dir)
          .select(col("o_orderkey").as("id"),
                  expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("key"))
        val tot = k.agg(count(lit(1)).as("n"))
        val samp = k
          .withColumn("h", expr(graft.dedup.Hashing.sparkMd5Mod("CAST(id AS STRING)")))
          .crossJoin(broadcast(tot))
          .where(expr("h % GREATEST(1, CAST(ceil(n / 1000.0) AS BIGINT)) = 0"))
          .select("key", "id")
        val m = samp.agg(count(lit(1)).as("m"))
        val ranked = samp // bounded (~1k rows): the one single-task sort, by design
          .withColumn("rn", row_number().over(
            graft.core.Shape.boundedWindow("key", "id")))
        val bounds = s.range(1, B).select(col("id").as("j"))
          .crossJoin(broadcast(m))
          .withColumn("pos", expr(s"CAST(ceil(j * m / $B.0) AS BIGINT)"))
          .join(ranked, col("rn") === col("pos"))
          .select(col("j"), col("key").as("bound"))
        // bucket assignment is a MAP-SIDE array probe: the B−1 split points
        // collapse to one broadcast array row and bucket = #bounds ≤ key is
        // a codegen'd size(filter(...)) — no ×B row expansion and no
        // (id, key) re-aggregation shuffle between the fact scan and the
        // per-bucket stats
        val boundsArr = bounds.groupBy().agg(collect_list(col("bound")).as("bs"))
        val assigned = k
          .crossJoin(broadcast(boundsArr))
          .select(col("id"), col("key"),
                  expr("CAST(size(filter(bs, b -> b <= key)) AS BIGINT)").as("bucket"))
        assigned.groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
               min("key").as("min_key"), max("key").as("max_key"))
          .crossJoin(broadcast(tot))
          .withColumn("balance_ratio",
                      round(col("n_rows").cast("double") * B / col("n"), 6))
          .select("bucket", "n_rows", "min_key", "max_key", "balance_ratio")
          .orderBy("bucket")
      },
      Some(s"""WITH k AS (SELECT o_orderkey AS id,
              |    CAST(round(o_totalprice * 100) AS BIGINT) AS key FROM orders),
              |tot AS (SELECT count(*) AS n FROM k),
              |samp AS (SELECT key, id FROM k, tot
              |  WHERE (${graft.dedup.Hashing.duckMd5Mod("CAST(id AS VARCHAR)")})
              |        % GREATEST(1, CAST(ceil(n / 1000.0) AS BIGINT)) = 0),
              |m AS (SELECT count(*) AS m FROM samp),
              |r AS (SELECT key, row_number() OVER (ORDER BY key, id) AS rn FROM samp),
              |b AS (SELECT j, r.key AS bound
              |  FROM generate_series(1, 7) g(j) CROSS JOIN m
              |  JOIN r ON r.rn = CAST(ceil(j * m / 8.0) AS BIGINT)),
              |a AS (SELECT k.id, k.key, count(b.j) AS bucket
              |  FROM k LEFT JOIN b ON b.bound <= k.key GROUP BY 1, 2)
              |SELECT bucket, count(*) AS n_rows,
              |  min(key) AS min_key, max(key) AS max_key,
              |  round(CAST(count(*) AS DOUBLE) * 8 / n, 6) AS balance_ratio
              |FROM a, tot GROUP BY bucket, n ORDER BY bucket""".stripMargin),
      note = "repartitionByRange boundary audit: ~1k-row bounded sample -> B-1 split points, map-side bucket assignment, one stats shuffle; balance_ratio grades the layout"),

    // Small-file compaction planning — the metadata operator every 100 TB
    // table needs on a schedule: streaming/daily writers leave thousands of
    // under-sized files, and scan cost is dominated by file COUNT once
    // files drop below a row-group. The plan packs date-ordered files into
    // target-sized bins with a running-total assignment (bin = floor of the
    // bytes that precede the file / target), so every bin except possibly
    // the last is >= target once it closes and date locality survives
    // compaction (bins stay contiguous date ranges — partition pruning
    // still works afterwards). "Files" here are the per-shipdate row
    // groups of lineitem with a deterministic bytes model. The prefix sum
    // is two-phase like w_moving_median's stitch: within-month window +
    // month-offset broadcast — no global single-task ordering even with
    // millions of files; the oracle runs one global cumsum over the same
    // metadata.
    Q("layout_compaction_plan", Seq("K3", "A1", "W3", "F5", "§2.10"),
      (s, dir) => {
        val target = 65536L
        val files = Tables.lineitem(s, dir)
          .groupBy(expr("CAST(date_format(l_shipdate, 'yyyyMMdd') AS INT)").as("file_id"))
          .agg((count(lit(1)) * 128L).as("bytes"))
        val wIn = Window.partitionBy("month").orderBy("file_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inMonth = files.withColumn("month", expr("file_id DIV 100"))
          .withColumn("cum_in", sum("bytes").over(wIn))
        val wOff = graft.core.Shape.boundedWindow("month") // #months rows
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = inMonth.groupBy("month").agg(sum("bytes").as("mb"))
          .withColumn("off", coalesce(sum("mb").over(wOff), lit(0L))) // #months rows
          .select("month", "off")
        inMonth.join(broadcast(offsets), Seq("month"))
          .withColumn("bin", expr(s"(off + cum_in - bytes) DIV $target"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_files"), sum("bytes").as("total_bytes"),
               min("file_id").as("first_file"), max("file_id").as("last_file"))
          .withColumn("fill_ppm",
            expr(s"CAST(round(CAST(total_bytes * 1000000 AS DOUBLE) / $target) AS BIGINT)"))
          .orderBy("bin")
      },
      Some("""WITH f AS (
             |  SELECT CAST(strftime(l_shipdate, '%Y%m%d') AS INTEGER) AS file_id,
             |    count(*) * 128 AS bytes
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT file_id, bytes,
             |    CAST(sum(bytes) OVER (ORDER BY file_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes AS BIGINT) AS cum_before
             |  FROM f)
             |SELECT cum_before // 65536 AS bin, count(*) AS n_files,
             |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
             |  min(file_id) AS first_file, max(file_id) AS last_file,
             |  CAST(round(CAST(sum(bytes) * 1000000 AS DOUBLE) / 65536) AS BIGINT) AS fill_ppm
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "compaction bin-packing over file metadata: two-phase prefix sum (month-local window + broadcast month offsets), date-contiguous bins keep pruning alive"),

    // Join-key skew diagnosis — the audit run BEFORE choosing a join
    // strategy at scale: per-key row counts, then a log2-magnitude
    // histogram of those counts (how many keys carry 2^b..2^{b+1}-1 rows,
    // and what share of ALL rows they hold). A heavy top bucket says
    // "salt or skew-hint this key"; a flat histogram says plain hash
    // shuffle is fine. Pure two-level groupBy — per-key counts combine
    // map-side, the histogram is #keys rows — with NO global sort or
    // ntile, so the diagnosis itself scales to billions of keys (a Lorenz
    // curve would need the global rank this query deliberately avoids).
    // The bucket is an integer CASE ladder, identical in both engines —
    // no floating log2 whose boundary could round differently.
    Q("diag_key_skew", Seq("skew", "A1", "A12", "F5", "§2.10"),
      (s, dir) => {
        val perKey = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
        val tot = perKey.agg(sum("n").as("tot"))
        perKey.withColumn("log2_bucket", expr(log2Ladder("n")))
          .groupBy("log2_bucket")
          .agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"),
               max("n").as("max_per_key"))
          .crossJoin(broadcast(tot))
          .withColumn("rows_ppm",
            expr("CAST(round(CAST(n_rows * 1000000 AS DOUBLE) / tot) AS BIGINT)"))
          .drop("tot")
          .orderBy("log2_bucket")
      },
      Some(s"""WITH k AS (SELECT o_custkey AS key, count(*) AS n FROM orders GROUP BY 1),
              |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM k)
              |SELECT ${log2Ladder("n")} AS log2_bucket, count(*) AS n_keys,
              |  CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_per_key,
              |  CAST(round(CAST(CAST(sum(n) AS BIGINT) * 1000000 AS DOUBLE) / tot) AS BIGINT) AS rows_ppm
              |FROM k, t GROUP BY 1, tot ORDER BY 1""".stripMargin),
      note = "pre-join skew audit: log2 histogram of per-key counts, no global sort; the decision input for salting vs plain shuffle"),

    // Join-cardinality prediction WITHOUT running the join: |A ⋈ B| on key
    // k is exactly Σ_k a_k·b_k, computable from the two per-key count
    // profiles — two map-side-combined groupBys plus a key-join of COUNT
    // frames (#keys rows), versus materializing the join itself (here,
    // view×purchase pairs per user — the blowup behind the interval-join
    // state bound). The histogram buckets keys by log2 of their pair
    // contribution, so the answer is not just "how many rows will this
    // join emit" but "which keys produce them" — the input for deciding
    // broadcast vs shuffle vs salt BEFORE paying for the join. Predicted
    // total == actual join size is asserted in IvmLayoutSpec.
    Q("diag_join_cardinality", Seq("skew", "J1", "A1", "A12", "§2.10"),
      (s, dir) => {
        val e = Tables.events(s, dir)
        def side(et: String, n: String) =
          e.where(col("event_type") === et)
            .groupBy("user_id").agg(count(lit(1)).as(n))
        side("view", "a").join(side("purchase", "b"), Seq("user_id"))
          .withColumn("pairs", col("a") * col("b"))
          .withColumn("log2_bucket", expr(log2Ladder("pairs")))
          .groupBy("log2_bucket")
          .agg(count(lit(1)).as("n_keys"),
               sum("pairs").as("pred_pairs"),
               max("pairs").as("max_per_key"))
          .orderBy("log2_bucket")
      },
      Some(s"""WITH a AS (SELECT user_id, count(*) AS a FROM events
              |           WHERE event_type = 'view' GROUP BY 1),
              |b AS (SELECT user_id, count(*) AS b FROM events
              |      WHERE event_type = 'purchase' GROUP BY 1),
              |p AS (SELECT user_id, a * b AS pairs FROM a JOIN b USING (user_id))
              |SELECT ${log2Ladder("pairs")} AS log2_bucket, count(*) AS n_keys,
              |  CAST(sum(pairs) AS BIGINT) AS pred_pairs,
              |  CAST(max(pairs) AS BIGINT) AS max_per_key
              |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "exact join-size prediction from count profiles (sum of a_k*b_k), never materializing the join; log2 buckets expose which keys drive the output"),

    // Schema-evolution scan: a 100 TB lake is written over years — old
    // files lack columns newer files carry. The engine must read BOTH
    // generations in one scan, null-filling the missing columns, without
    // rewriting history. Two generations of the documents table are
    // written under one root (gen=1: 3 columns; gen=2: adds lang +
    // n_bytes_est), then a single mergeSchema read aggregates across them.
    // The oracle recomputes the same facts from the unsplit source table.
    //
    // Scale: schema merge is a footer-only planning step (per-file, no
    // data movement); the scan itself stays columnar with null backfill.
    Q("layout_schema_evolution", Seq("S6", "P12", "P15", "A10"),
      (s, dir) => {
        val out = graft.util.Scratch.fresh("schevo")
        val docs = Tables.documents(s, dir)
        docs.where(col("doc_id") % 2 === 0)
          .select("doc_id", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$out/gen=1")
        docs.where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source"), col("n_chars"), col("lang"),
                  (col("n_chars") * 2).as("n_bytes_est"))
          .write.mode("overwrite").parquet(s"$out/gen=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               count(col("lang")).as("n_with_lang"),
               sum("n_chars").as("sum_chars"),
               sum(coalesce(col("n_bytes_est"), lit(0L))).as("sum_bytes_est"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_with_lang,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars * 2 ELSE 0 END) AS BIGINT)
             |    AS sum_bytes_est
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "mergeSchema scan over two written generations (columns added over time): null backfill for old files, one columnar read; merge cost is footer-only"),

    // Declarative data-quality constraint suite over the lake (the
    // Deequ/dbt-test shape): completeness (NOT NULL), domain membership,
    // range bounds, primary-key uniqueness, cross-table referential
    // integrity, and a derived-column consistency rule — each emitted as
    // one (check_name, tbl, violations, total, ok) row.
    //
    // Scale design: every same-table rule is ONE conditional counter
    // inside a single scan+agg of that table (sum(CASE WHEN violated)),
    // so adding rules never adds passes — 4 fact-table scans total, each
    // map-side-combined. Uniqueness rides the same agg as an exact
    // count(DISTINCT key) (one extra expand). FK rules are fused per
    // child table BY JOIN SHAPE: all broadcast-able (dim-parent) legs
    // share one map-side child pass + single agg; shuffle-worthy parents
    // keep their own single-FK-column leg so no exchange ever widens
    // (see the in-query comment for the measured A/B). The long
    // (one-row-per-rule) shape comes from stack() over the single
    // aggregated row: plan-free reshaping.
    // Ingest-volume anomaly detection by ROBUST z-score — the data-quality
    // monitor every scheduled pipeline runs on its own row counts: a
    // median/MAD screen (|x − med| > 3.5·1.4826·MAD, Iglewicz–Hoaglin)
    // instead of mean/stddev, because volume anomalies are exactly the
    // points that wreck the mean. Everything stays in exact integers —
    // daily counts, the lower medians, the deviation median, and the flag
    // itself (|x − med|·10⁴ > 51891·MAD, the constant pre-multiplied) —
    // so both engines agree bit-for-bit with no float in sight. Scale:
    // one (type, day) count shuffle; the median/MAD machinery runs as
    // in-row HOFs over each type's collected day series (bounded by the
    // calendar, never by rows), then a broadcast joins the per-type
    // thresholds back to the daily summary.
    Q("dq_volume_anomaly", Seq("A1", "A13", "F4", "W1", "corpus"),
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val stats = daily.groupBy("event_type")
          .agg(sort_array(collect_list(col("n"))).as("ns"))
          .withColumn("med", expr("ns[(size(ns) + 1) div 2 - 1]"))
          .withColumn("mad", expr(
            "array_sort(transform(ns, x -> abs(x - med)))[(size(ns) + 1) div 2 - 1]"))
          .select("event_type", "med", "mad")
        daily.join(broadcast(stats), "event_type")
          .select(col("event_type"), col("d"), col("n"), col("med"), col("mad"),
                  (abs(col("n") - col("med")) * 10000L > lit(51891L) * col("mad"))
                    .as("is_anomaly"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
             |               FROM events GROUP BY 1, 2),
             |arr AS (SELECT event_type, list(n ORDER BY n) AS ns
             |        FROM daily GROUP BY 1),
             |m AS (SELECT event_type, ns, ns[(len(ns) + 1) // 2] AS med FROM arr),
             |st AS (SELECT event_type, med,
             |         list_sort(list_transform(ns, x -> abs(x - med)))
             |           [(len(ns) + 1) // 2] AS mad
             |       FROM m)
             |SELECT d.event_type, d.d, d.n, st.med, st.mad,
             |  abs(d.n - st.med) * 10000 > 51891 * st.mad AS is_anomaly
             |FROM daily d JOIN st USING (event_type)
             |ORDER BY d.event_type, d.d""".stripMargin),
      note = "median/MAD robust volume monitor, all-integer flag arithmetic (3.5 * 1.4826 pre-scaled to 51891/10000); per-type medians as in-row HOFs over calendar-bounded series"),

    Q("dq_constraint_audit", Seq("A1", "A10", "A12", "J6", "F4", "P15"),
      (s, dir) => {
        def viol(cond: org.apache.spark.sql.Column) =
          sum(when(cond, 1L).otherwise(0L))
        val li = Tables.lineitem(s, dir)
        // NOTE deliberately no lineitem uniqueness rule: the lake's
        // lineitem carries no unique key by design (an order can repeat a
        // line number) — a DQ suite encodes the ACTUAL contract, and a
        // "pk" rule that is red on healthy data trains people to ignore
        // red. Uniqueness is audited where it IS the contract (orders).
        val liAgg = li.agg(
          count(lit(1)).as("total"),
          viol(col("l_shipdate").isNull ||
               col("l_shipdate") < to_timestamp(lit("1990-01-01")) ||
               col("l_shipdate") >= to_timestamp(lit("2030-01-01"))).as("v_ship"),
          viol(col("l_quantity").isNull || col("l_quantity") <= 0 ||
               col("l_quantity") > 50).as("v_qty"),
          viol(col("l_discount") < 0 || col("l_discount") > 1).as("v_disc"),
          viol(!col("l_returnflag").isin("A", "N", "R")).as("v_flag"))
        val liRules = liAgg.selectExpr(
          """stack(4,
            |  'lineitem_ship_bounds', v_ship,
            |  'lineitem_qty_range', v_qty,
            |  'lineitem_disc_range', v_disc,
            |  'lineitem_flag_domain', v_flag) AS (check_name, violations)"""
            .stripMargin,
          "'lineitem' AS tbl", "total")
        val o = Tables.orders(s, dir)
        val oAgg = o.agg(
          count(lit(1)).as("total"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
          viol(!col("o_orderstatus").isin("F", "O", "P")).as("v_status"),
          viol(col("o_totalprice").isNull || col("o_totalprice") <= 0).as("v_price"))
        val oRules = oAgg.selectExpr(
          """stack(3,
            |  'orders_pk_unique', v_pk,
            |  'orders_status_domain', v_status,
            |  'orders_price_positive', v_price) AS (check_name, violations)"""
            .stripMargin,
          "'orders' AS tbl", "total")
        val e = Tables.events(s, dir)
        val eAgg = e.agg(
          count(lit(1)).as("total"),
          viol(col("value").isNull).as("v_null"),
          viol(!col("event_type").isin(
            "click", "error", "purchase", "signup", "view")).as("v_type"),
          viol(col("ts") < to_timestamp(lit("2020-01-01")) ||
               col("ts") >= to_timestamp(lit("2030-01-01"))).as("v_ts"))
        val eRules = eAgg.selectExpr(
          """stack(3,
            |  'events_value_nonnull', v_null,
            |  'events_type_domain', v_type,
            |  'events_ts_bounds', v_ts) AS (check_name, violations)"""
            .stripMargin,
          "'events' AS tbl", "total")
        val d = Tables.documents(s, dir)
        val dAgg = d.agg(
          count(lit(1)).as("total"),
          viol(col("text").isNull).as("v_null"),
          viol(length(col("text")) =!= col("n_chars")).as("v_len"))
        val dRules = dAgg.selectExpr(
          """stack(2,
            |  'documents_text_nonnull', v_null,
            |  'documents_len_consistent', v_len) AS (check_name, violations)"""
            .stripMargin,
          "'documents' AS tbl", "total")
        // FK rules, fused per child table BY JOIN SHAPE (round 9): all of
        // a child's BROADCAST-able FK legs (dim parents) ride one
        // map-side pass — chained broadcast left joins on a projection of
        // just the FK columns, then one agg counts every leg's
        // parent-misses plus the shared child total, stack()ed long like
        // the same-table rules. The one shuffle-worthy parent (orders)
        // keeps its own single-column leg: folding it into the fused pass
        // was measured SLOWER at sf1 (the sort-merge exchange then
        // carries every FK column instead of one), while the dim fusion
        // cuts child scans without widening any shuffle. Net: 4 FK rules
        // = 2 child passes (one shuffle-free), down from 4 scan+join+aggs.
        def hitSet(parent: org.apache.spark.sql.DataFrame, pk: String, hit: String) =
          parent.select(col(pk)).distinct().withColumn(hit, lit(1))
        val liDimFk = li.select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(hitSet(Tables.part(s, dir), "p_partkey", "hit_p")),
                col("l_partkey") === col("p_partkey"), "left")
          .join(broadcast(hitSet(Tables.supplier(s, dir), "s_suppkey", "hit_s")),
                col("l_suppkey") === col("s_suppkey"), "left")
          .agg(count(lit(1)).as("total"),
               viol(col("hit_p").isNull).as("v_fk_p"),
               viol(col("hit_s").isNull).as("v_fk_s"))
          .selectExpr(
            """stack(2,
              |  'fk_lineitem_part', v_fk_p,
              |  'fk_lineitem_supplier', v_fk_s) AS (check_name, violations)"""
              .stripMargin,
            "'lineitem' AS tbl", "total")
        val liOrdFk = li.select(col("l_orderkey"))
          .join(hitSet(o, "o_orderkey", "hit_o"),
                col("l_orderkey") === col("o_orderkey"), "left")
          .agg(count(lit(1)).as("total"), viol(col("hit_o").isNull).as("violations"))
          .select(lit("fk_lineitem_orders").as("check_name"), col("violations"),
                  lit("lineitem").as("tbl"), col("total"))
        val oFk = o.select(col("o_custkey"))
          .join(broadcast(hitSet(Tables.customer(s, dir), "c_custkey", "hit_c")),
                col("o_custkey") === col("c_custkey"), "left")
          .agg(count(lit(1)).as("total"), viol(col("hit_c").isNull).as("violations"))
          .select(lit("fk_orders_customer").as("check_name"), col("violations"),
                  lit("orders").as("tbl"), col("total"))
        (Seq(liRules, oRules, eRules, dRules, liDimFk, liOrdFk, oFk))
          .reduce(_ unionByName _)
          .select(col("check_name"), col("tbl"),
                  col("violations").cast("long").as("violations"),
                  col("total").cast("long").as("total"),
                  when(col("violations") === 0, 1L).otherwise(0L).as("ok"))
          .orderBy("check_name")
      },
      Some("""WITH li AS (
             |  SELECT count(*) AS total,
             |    sum(CASE WHEN l_shipdate IS NULL
             |             OR l_shipdate < TIMESTAMP '1990-01-01'
             |             OR l_shipdate >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS v_ship,
             |    sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
             |             OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty,
             |    sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS v_disc,
             |    sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_flag
             |  FROM lineitem),
             |o AS (
             |  SELECT count(*) AS total,
             |    count(*) - count(DISTINCT o_orderkey) AS v_pk,
             |    sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS v_status,
             |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price
             |  FROM orders),
             |e AS (
             |  SELECT count(*) AS total,
             |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS v_null,
             |    sum(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view')
             |             THEN 1 ELSE 0 END) AS v_type,
             |    sum(CASE WHEN ts < TIMESTAMP '2020-01-01'
             |             OR ts >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS v_ts
             |  FROM events),
             |d AS (
             |  SELECT count(*) AS total,
             |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS v_null,
             |    sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS v_len
             |  FROM documents),
             |rules AS (
             |  SELECT 'lineitem_ship_bounds' AS check_name, 'lineitem' AS tbl, v_ship AS violations, total FROM li
             |  UNION ALL SELECT 'lineitem_qty_range', 'lineitem', v_qty, total FROM li
             |  UNION ALL SELECT 'lineitem_disc_range', 'lineitem', v_disc, total FROM li
             |  UNION ALL SELECT 'lineitem_flag_domain', 'lineitem', v_flag, total FROM li
             |  UNION ALL SELECT 'orders_pk_unique', 'orders', v_pk, total FROM o
             |  UNION ALL SELECT 'orders_status_domain', 'orders', v_status, total FROM o
             |  UNION ALL SELECT 'orders_price_positive', 'orders', v_price, total FROM o
             |  UNION ALL SELECT 'events_value_nonnull', 'events', v_null, total FROM e
             |  UNION ALL SELECT 'events_type_domain', 'events', v_type, total FROM e
             |  UNION ALL SELECT 'events_ts_bounds', 'events', v_ts, total FROM e
             |  UNION ALL SELECT 'documents_text_nonnull', 'documents', v_null, total FROM d
             |  UNION ALL SELECT 'documents_len_consistent', 'documents', v_len, total FROM d
             |  UNION ALL
             |  SELECT 'fk_lineitem_orders', 'lineitem',
             |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), count(*)
             |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
             |    ON l_orderkey = o_orderkey
             |  UNION ALL
             |  SELECT 'fk_lineitem_part', 'lineitem',
             |    sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END), count(*)
             |  FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             |    ON l_partkey = p_partkey
             |  UNION ALL
             |  SELECT 'fk_lineitem_supplier', 'lineitem',
             |    sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END), count(*)
             |  FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
             |    ON l_suppkey = s_suppkey
             |  UNION ALL
             |  SELECT 'fk_orders_customer', 'orders',
             |    sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END), count(*)
             |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
             |    ON o_custkey = c_custkey)
             |SELECT check_name, tbl, CAST(violations AS BIGINT) AS violations,
             |  CAST(total AS BIGINT) AS total,
             |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
             |FROM rules ORDER BY check_name""".stripMargin),
      note = "declarative DQ suite (Deequ/dbt-test shape): all same-table rules fused into one scan+agg per table, FK rules one join each counting misses and totals in the same pass"),

    // Benford first-digit audit: the fraud / synthetic-data screen — the
    // leading-digit distribution of order totals vs Benford's law. The
    // digit comes from exact integer cents (CAST(price*100 AS BIGINT):
    // one identical IEEE multiply and truncation in both engines) via
    // integer→string, never via log10 — float log at power-of-ten
    // boundaries is exactly where engines can disagree by an ulp. The
    // expected shares are pre-computed permille constants
    // round(log10(1+1/d)·1000) shipped as a broadcast 9-row literal;
    // observed permille is one BIGINT integer division against a 1-row
    // broadcast total; the deviation flag (|obs − exp| > 50‰) is integer
    // compares only. Plan: one scan+agg to the 9-row digit census, then
    // broadcast-only joins — nothing after the census scales with rows.
    Q("dq_benford_digits", Seq("A1", "A9", "P15", "F4"),
      (s, dir) => {
        // >= 0.01, not > 0: a total below one cent would truncate to cents 0,
        // leading digit 0, and silently fall out of the 1-9 expected join —
        // breaking the "census partitions the filtered rows" invariant
        // Round9OpsSpec asserts. Latent for TPC-H totals, guarded anyway.
        val digits = Tables.orders(s, dir)
          .where(col("o_totalprice") >= 0.01)
          .select(expr(
            "CAST(substring(CAST(CAST(o_totalprice * 100 AS BIGINT) AS STRING), 1, 1) AS INT)")
            .as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val total = digits.agg(sum("n").as("total"))
        val expected = s.createDataFrame(Seq(
          (1, 301L), (2, 176L), (3, 125L), (4, 97L), (5, 79L),
          (6, 67L), (7, 58L), (8, 51L), (9, 46L))).toDF("digit", "exp_pm")
        digits.join(broadcast(expected), Seq("digit"))
          .crossJoin(broadcast(total))
          .withColumn("obs_pm", expr("n * 1000 div total"))
          .select(col("digit"), col("n"), col("exp_pm"), col("obs_pm"),
                  (abs(col("obs_pm") - col("exp_pm")) > 50).as("flagged"))
          .transform(graft.core.Shape.boundedSort(_, "digit")) // ≤9 digits
      },
      Some("""WITH d AS (
             |  SELECT CAST(substr(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR),
             |                     1, 1) AS INT) AS digit
             |  FROM orders WHERE o_totalprice >= 0.01),
             |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
             |e(digit, exp_pm) AS (VALUES
             |  (1, CAST(301 AS BIGINT)), (2, 176), (3, 125), (4, 97),
             |  (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
             |SELECT c.digit, c.n, e.exp_pm, c.n * 1000 // t.total AS obs_pm,
             |  abs(c.n * 1000 // t.total - e.exp_pm) > 50 AS flagged
             |FROM c JOIN e USING (digit) CROSS JOIN t
             |ORDER BY c.digit""".stripMargin),
      note = "Benford leading-digit screen: digit from exact integer cents (never float log10), permille constants broadcast, one scan+agg then broadcast-only — integer arithmetic end to end"),

    // Schema-wide completeness/cardinality profile — the "table profiler"
    // every ingest pipeline runs before training on a new drop: per column,
    // row count, null count, exact distinct count, completeness permille.
    // Profiled over a DERIVED frame (customer ⟵ per-customer rollup of
    // FINISHED orders, left join) so the null source is REAL — customers
    // with no 'F'-status order get null rollup columns at every SF in this
    // harness generator (the all-custkeys-ordered generator leaves no
    // orderless customers, so the unfiltered join would profile a dead
    // null path) — and the operator demonstrably composes over joins.
    // The three exact distinct counts plan as ONE scan via Expand (each
    // input row fans to one replica per distinct column, null-padded;
    // partial aggregation collapses replicas map-side), so the profile
    // costs one shuffle of the distinct-key census regardless of how many
    // columns are profiled — the 100-TB alternative of one count(distinct)
    // job per column rescans the table k times. The unpivot to
    // column-per-row is a 1-row stack, the finalizer sort is bounded by
    // the column count.
    Q("dq_completeness_matrix", Seq("A10", "A12", "J1", "W7", "dq"),
      (s, dir) => {
        val rollup = Tables.orders(s, dir)
          .where(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("c_custkey"))
          .agg(count(lit(1)).as("n_orders"), max("o_orderdate").as("last_date"))
        val frame = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
          .join(rollup, Seq("c_custkey"), "left")
        val cols = Seq("c_mktsegment", "n_orders", "last_date")
        val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
          count(when(col(c).isNull, 1)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c")))
        frame.agg(aggs.head, aggs.tail: _*)
          .selectExpr(s"stack(${cols.size}, " + cols.map(c =>
            s"'$c', n_rows, nn_$c, nd_$c").mkString(", ") +
            ") AS (column_name, n_rows, n_nulls, n_distinct)")
          .selectExpr("column_name", "n_rows", "n_nulls", "n_distinct",
                      "(n_rows - n_nulls) * 1000 div n_rows AS completeness_pm")
          .transform(graft.core.Shape.boundedSort(_, "column_name"))
      },
      Some("""WITH frame AS (
             |  SELECT c.c_custkey, c.c_mktsegment, o.n_orders, o.last_date
             |  FROM customer c LEFT JOIN (
             |    SELECT o_custkey AS c_custkey, count(*) AS n_orders,
             |           max(o_orderdate) AS last_date
             |    FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) o USING (c_custkey)),
             |s AS (SELECT count(*) AS n_rows,
             |    count(*) FILTER (c_mktsegment IS NULL) AS nn_seg,
             |    count(DISTINCT c_mktsegment) AS nd_seg,
             |    count(*) FILTER (n_orders IS NULL) AS nn_ord,
             |    count(DISTINCT n_orders) AS nd_ord,
             |    count(*) FILTER (last_date IS NULL) AS nn_dt,
             |    count(DISTINCT last_date) AS nd_dt
             |  FROM frame)
             |SELECT * FROM (
             |  SELECT 'c_mktsegment' AS column_name, n_rows, nn_seg AS n_nulls,
             |    nd_seg AS n_distinct, (n_rows - nn_seg) * 1000 // n_rows AS completeness_pm
             |  FROM s
             |  UNION ALL
             |  SELECT 'n_orders', n_rows, nn_ord, nd_ord,
             |    (n_rows - nn_ord) * 1000 // n_rows FROM s
             |  UNION ALL
             |  SELECT 'last_date', n_rows, nn_dt, nd_dt,
             |    (n_rows - nn_dt) * 1000 // n_rows FROM s)
             |ORDER BY column_name""".stripMargin),
      note = "one-scan multi-column profiler: Expand-planned exact distincts + null censuses over a real left-join null source, unpivoted to a column-per-row audit; completeness in integer permille")
  )

  /** floor(log2(n)) for n >= 1 as a descending integer CASE ladder —
    * engine-identical, no float boundary risk. */
  private def log2Ladder(c: String): String =
    (40 to 1 by -1).map { b =>
      s"WHEN $c >= ${1L << b} THEN $b"
    }.mkString("CASE ", " ", " ELSE 0 END")
}
