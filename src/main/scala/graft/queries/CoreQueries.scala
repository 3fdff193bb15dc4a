package graft.queries

import graft.Q
import graft.core.{CleanOps, DateOps, Tables}
import org.apache.spark.sql.functions._

/** Scalar projections, filters and cleaning operators (SURVEY.md §2.3/§2.4):
  * half-open time-range filter (F1), projection/rename (P12), casts (P15),
  * bitmask predicate (P2), date decompose (P5), yyyyMMdd codec (P3),
  * sentinel→NULL + impute (P8/P10), JSON attribute extraction, grid-snap
  * quantization (P4).
  *
  * Money columns are cast to DECIMAL(18,2) before summing: decimal arithmetic
  * is associativity-independent, so Spark's partition-parallel aggregation
  * and DuckDB's sequential one produce bit-identical results (doubles would
  * drift in the last ulp and break the driver's hash compare). Final output
  * columns are then cast DECIMAL→DOUBLE on BOTH sides: the two engines format
  * trailing-zero decimals differently ("587.3" vs "587.30"), while identical
  * doubles always serialize identically; decimal→double is the same
  * correctly-rounded conversion in both engines.
  */
object CoreQueries {

  private val dec = "DECIMAL(18,2)"

  def all: Seq[Q] = Seq(

    Q("p12_project_filter", Seq("F1", "F3", "P12", "P15", "S2"),
      (s, dir) =>
        Tables.lineitem(s, dir)
          // F1: half-open [start, end) range, like ee.Filter.date
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                 col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_d"),
            col("l_quantity").as("qty"),
            // exact scale-4 decimal product internally (downcasts round
            // HALF_UP in Spark but truncate in DuckDB), emitted as DOUBLE
            expr(s"CAST(CAST(CAST(l_extendedprice AS $dec) * (1 - CAST(l_discount AS $dec)) AS DECIMAL(18,4)) AS DOUBLE)").as("net_price"),
            col("l_returnflag").as("rf"))
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
          // order by every output column so the ordering is total
          .orderBy("l_orderkey", "l_linenumber", "ship_d", "qty", "net_price", "rf"),
      Some(s"""SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_d,
              |  l_quantity AS qty,
              |  CAST(CAST(CAST(l_extendedprice AS $dec) * (1 - CAST(l_discount AS $dec)) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
              |  l_returnflag AS rf
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
              |ORDER BY l_orderkey, l_linenumber, ship_d, qty, net_price, rf""".stripMargin)),

    Q("p2_bitmask_filter", Seq("P2"),
      (s, dir) =>
        // The VIIRS cloud-mask predicate shape (`data_extraction_v2.py:143-158`):
        // keep rows where (qf & 3) >= 2 and ((qf >> 2) & 3) <= 1.
        Tables.events(s, dir)
          .where((col("event_id").bitwiseAND(3) >= 2) &&
                 (shiftright(col("event_id"), 2).bitwiseAND(3) <= 1))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_uid"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_uid
             |FROM events
             |WHERE (event_id & 3) >= 2 AND ((event_id >> 2) & 3) <= 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("p5_date_decompose", Seq("P5", "P15"),
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val (y, m, _) = DateOps.decompose(col("o_orderdate"))
        o.groupBy(y.as("y"), m.as("m"))
          .agg(count(lit(1)).as("n"),
               expr(s"CAST(sum(CAST(o_totalprice AS $dec)) AS DOUBLE)").as("sum_price"))
          .transform(graft.core.Shape.boundedSort(_, "y", "m")) // year x month: dimension-bounded
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
              |  count(*) AS n, CAST(sum(CAST(o_totalprice AS $dec)) AS DOUBLE) AS sum_price
              |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("p3_yyyymmdd_roundtrip", Seq("P3", "P15", "P18"),
      (s, dir) =>
        // The reference's int-encoded yyyyMMdd date codec, round-tripped.
        Tables.events(s, dir)
          .select(DateOps.toYyyymmdd(col("ts")).as("ymd"), col("value"))
          .withColumn("d", DateOps.fromYyyymmdd(col("ymd")))
          .groupBy("ymd", "d")
          .agg(count(lit(1)).as("n"),
               expr(s"CAST(sum(CAST(value AS $dec)) AS DOUBLE)").as("sum_value"))
          .transform(graft.core.Shape.boundedSort(_, "ymd")), // calendar days: dimension-bounded
      Some(s"""SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS ymd, CAST(ts AS DATE) AS d,
              |  count(*) AS n, CAST(sum(CAST(value AS $dec)) AS DOUBLE) AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    Q("p10_sentinel_impute", Seq("P8", "P10", "A3"),
      (s, dir) => {
        // Sentinel→NULL (value < 1.0 plays the nodata role), then the
        // xarray-skipna contract: an all-null group sums to 0, not NULL.
        val v = CleanOps.sentinelToNull(col("value"), Seq(-99999d), floor = 1.0)
        Tables.events(s, dir)
          .select(col("event_type"), v.as("v"))
          .groupBy("event_type")
          .agg(sum(when(col("v").isNull, 1).otherwise(0)).as("n_masked"),
               expr(s"CAST(coalesce(sum(CAST(v AS $dec)), 0) AS DOUBLE)").as("sum_valid"))
          .transform(graft.core.Shape.boundedSort(_, "event_type")) // 4 types: dimension-bounded
      },
      Some(s"""SELECT event_type,
              |  CAST(sum(CASE WHEN value < 1.0 OR value = -99999 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
              |  CAST(coalesce(sum(CASE WHEN value < 1.0 OR value = -99999 THEN NULL
              |                         ELSE CAST(value AS $dec) END), 0) AS DOUBLE) AS sum_valid
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("p13_json_extract", Seq("S3", "P13", "P15"),
      (s, dir) =>
        // Semi-structured attribute extraction (the reference's JSON config /
        // GeoJSON reads, `data_extraction_v2.py:27-75`) as a column op.
        Tables.events(s, dir)
          .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy((col("k") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("bucket"),
      Some("""SELECT CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) % 10 AS bucket,
             |  count(*) AS n,
             |  min(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS min_k,
             |  max(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS max_k
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("p1_normalized_difference", Seq("P1"),
      (s, dir) =>
        // The NDVI shape (M7−M5)/(M7+M5) (`data_extraction_v2.py:138-140`)
        // over two event-derived "bands" per (user, day).
        Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(expr(s"CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS $dec) END) AS DOUBLE)").as("nir"),
               expr(s"CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS $dec) END) AS DOUBLE)").as("red"))
          .where(col("nir").isNotNull && col("red").isNotNull)
          .select(col("user_id"), col("d"),
                  ((col("nir") - col("red")) / (col("nir") + col("red"))).as("ndvi"))
          .orderBy("user_id", "d"),
      Some(s"""SELECT user_id, d, (nir - red) / (nir + red) AS ndvi FROM (
              |  SELECT user_id, CAST(ts AS DATE) AS d,
              |    CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS $dec) END) AS DOUBLE) AS nir,
              |    CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS $dec) END) AS DOUBLE) AS red
              |  FROM events GROUP BY 1, 2) t
              |WHERE nir IS NOT NULL AND red IS NOT NULL
              |ORDER BY user_id, d""".stripMargin)),

    Q("p14_filename_dates", Seq("P14", "A10", "A11"),
      (s, dir) =>
        // Date-from-filename regex scan (`data_extraction_v2.py:403-425`,
        // GeoServer timeregex): synthesize mosaic filenames from order
        // dates, parse them back, resolve the watermark max.
        Tables.orders(s, dir)
          .select(to_date(col("o_orderdate")).as("d0"))
          .distinct()
          .select(concat(lit("biomass_"), date_format(col("d0"), "yyyyMMdd"), lit(".tif")).as("fname"))
          .select(col("fname"), graft.core.DateOps.dateFromName(col("fname")).as("d"))
          .agg(count(lit(1)).as("n_files"), max(col("d")).as("max_d"),
               date_add(max(col("d")), 1).as("resume_start")),
      Some("""WITH f AS (SELECT 'biomass_' || strftime(d0, '%Y%m%d') || '.tif' AS fname
             |           FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d0 FROM orders))
             |SELECT count(*) AS n_files,
             |  max(CAST(strptime(regexp_extract(fname, '(\d{8})', 1), '%Y%m%d') AS DATE)) AS max_d,
             |  max(CAST(strptime(regexp_extract(fname, '(\d{8})', 1), '%Y%m%d') AS DATE)) + 1 AS resume_start
             |FROM f""".stripMargin)),

    Q("f2_bbox_time_slice", Seq("F2", "F8", "S6"),
      (s, dir) =>
        // Spatial-bounds predicate (AOI bbox, `data_extraction_v2.py:121`)
        // + inclusive time slice (xarray `.sel(slice)`, F8) — both pushed
        // into the scan by Catalyst.
        Tables.events(s, dir)
          .select((lit(36.0) + (col("user_id") % 15).cast("double") * 0.1).as("lon"),
                  (lit(15.0) - floor(col("user_id") / 15).cast("double") * 0.1).as("lat"),
                  to_date(col("ts")).as("d"), col("value"))
          .where(col("lon") >= 36.2 && col("lon") <= 36.8 &&
                 col("lat") >= 14.3 && col("lat") <= 15.0 &&
                 col("d").between(lit("2024-01-05"), lit("2024-01-20")))
          .groupBy("d")
          .agg(count(lit(1)).as("n"), expr(s"CAST(sum(CAST(value AS $dec)) AS DOUBLE)").as("sum_value"))
          .orderBy("d"),
      Some(s"""SELECT CAST(ts AS DATE) AS d, count(*) AS n,
              |  CAST(sum(CAST(value AS $dec)) AS DOUBLE) AS sum_value
              |FROM (SELECT ts, value,
              |        36.0 + CAST(user_id % 15 AS DOUBLE) * 0.1 AS lon,
              |        15.0 - CAST(user_id // 15 AS DOUBLE) * 0.1 AS lat
              |      FROM events) t
              |WHERE lon >= 36.2 AND lon <= 36.8 AND lat >= 14.3 AND lat <= 15.0
              |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("p4_gridsnap_join", Seq("P4", "J2"),
      (s, dir) => {
        // Join-key quantization: snapping both sides to a regular grid turns
        // a nearest-neighbor lookup into a plain shuffled equi-join — the
        // reference's own trick (`round(·,3)`, data_extraction_v2.py:354).
        val c = Tables.customer(s, dir)
          .select(CleanOps.gridSnap(col("c_acctbal"), 0d, 100d).as("cell"), col("c_custkey"))
        val sup = Tables.supplier(s, dir)
          .select(CleanOps.gridSnap(col("s_acctbal"), 0d, 100d).as("cell"), col("s_suppkey"))
        c.join(sup, "cell")
          .groupBy("cell")
          .agg(count(lit(1)).as("n_pairs"),
               countDistinct("c_custkey").as("n_cust"),
               countDistinct("s_suppkey").as("n_supp"))
          .orderBy("cell")
      },
      Some("""SELECT CAST(floor(c_acctbal / 100) AS BIGINT) AS cell, count(*) AS n_pairs,
             |  count(DISTINCT c_custkey) AS n_cust, count(DISTINCT s_suppkey) AS n_supp
             |FROM customer JOIN supplier
             |  ON CAST(floor(c_acctbal / 100) AS BIGINT) = CAST(floor(s_acctbal / 100) AS BIGINT)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P17 conditional augmentation (`gwr_model.py:44-59`): when a group's
    // nonzero share falls below a threshold, add small uniform noise to 10%
    // of its zero rows — distribution repair before the GWR fit. The
    // reference is UNSEEDED (np.random.choice); our declared behavior makes
    // both choices deterministic: the 10% pick is an md5-hash rule and the
    // U(0.001, 0.01) draw is derived from the same hash — rerun-stable,
    // engine-exact, and therefore oracle-checkable (first hash-checked P17
    // carrier; OpsSpec covers the seeded CleanOps variant). The trigger
    // compares integer counts (nz·20 < n·9 ⇔ share < 45%) so no float
    // boundary can disagree. Plan: tiny per-group share table broadcasts
    // back onto the fact scan — zero fact shuffles before the sort.
    Q("p17_conditional_augment", Seq("P17", "A9", "sampling"),
      (s, dir) => {
        // h is projected ONCE (mirroring the oracle's `e` CTE) — inlining
        // the md5 expression into both the filter and the projection would
        // compute it twice per row on the fact scan
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
                  expr("CASE WHEN value < 40 THEN CAST(0 AS DOUBLE) ELSE value - 40 END").as("preci"),
                  expr(graft.dedup.Hashing.sparkMd5Mod("CAST(event_id AS STRING)")).as("h"))
        val share = e.groupBy("event_type")
          .agg(sum(when(col("preci") =!= 0d, 1L).otherwise(0L)).as("nz"),
               count(lit(1)).as("n"))
        e.join(broadcast(share), "event_type")
          .where(col("nz") * 20 < col("n") * 9 && col("preci") === 0d &&
                 col("h") % 10 === 0)
          .select(col("event_id"), col("event_type"),
                  expr("preci + CAST(0.001 AS DOUBLE) + (h % 9000 + 1) * CAST(0.000001 AS DOUBLE)")
                    .as("preci_after"))
          .orderBy("event_id")
      },
      Some {
        val h = graft.dedup.Hashing.duckMd5Mod("CAST(event_id AS VARCHAR)")
        s"""WITH e AS (SELECT event_id, event_type,
           |    CASE WHEN value < 40 THEN CAST(0 AS DOUBLE) ELSE value - 40 END AS preci,
           |    $h AS h
           |  FROM events),
           |s AS (SELECT event_type,
           |    sum(CASE WHEN preci <> 0 THEN 1 ELSE 0 END) AS nz, count(*) AS n
           |  FROM e GROUP BY 1)
           |SELECT e.event_id, e.event_type,
           |  e.preci + CAST(0.001 AS DOUBLE) + (e.h % 9000 + 1) * CAST(0.000001 AS DOUBLE) AS preci_after
           |FROM e JOIN s USING (event_type)
           |WHERE s.nz * 20 < s.n * 9 AND e.preci = 0 AND e.h % 10 = 0
           |ORDER BY event_id""".stripMargin
      },
      note = "P17 made deterministic: md5-hash pick + hash-derived U(0.001,0.01); integer-count trigger"),

    // P16 days-since-origin (`BiomassHindcasts.py:57` `(date − first).days`):
    // the GP time feature, as a per-key window min + datediff. Integer day
    // arithmetic — engine-exact. The m3/m4 forecasts consume the same
    // feature inside their typed pipelines; this is its hash-checked carrier.
    Q("p16_days_since_origin", Seq("P16", "A11", "W2"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), to_date(col("ts")).as("d"))
          .withColumn("origin", min("d").over(w))
          .select(col("event_id"), col("user_id"),
                  datediff(col("d"), col("origin")).as("days_since_origin"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(datediff('day', min(CAST(ts AS DATE)) OVER (PARTITION BY user_id),
             |                 CAST(ts AS DATE)) AS INTEGER) AS days_since_origin
             |FROM events ORDER BY event_id""".stripMargin),
      note = "GP time feature (P16): per-key origin via window min, integer datediff"),

    // K1 CSV sink, driver-verified: write a projection through the CSV sink
    // (header, explicit column order) and read it back with an explicit
    // schema — the reference's every inter-stage hop is exactly this
    // write/reread contract (`gwr_model.py:29-37` re-asserting dtypes on
    // `outputs/combined.csv`). Doubles round-trip because Spark writes the
    // shortest representation that parses back to the same IEEE value; the
    // oracle never sees the files, so a lossy sink (or a schema drift on
    // re-read) fails the hash. Distributed shape: the write is one task per
    // partition straight from the scan; no shuffle until the output sort.
    Q("k1_csv_roundtrip", Seq("K1", "S2", "P15", "F1"),
      (s, dir) => {
        val out = graft.util.Scratch.fresh("k1")
        val sub = Tables.lineitem(s, dir)
          .where(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("l_quantity").cast("double").as("qty"),
                  col("l_extendedprice").cast("double").as("price"),
                  col("l_returnflag").as("rf"))
        sub.write.mode("overwrite").option("header", "true").csv(out)
        val schema = "l_orderkey BIGINT, l_linenumber BIGINT, qty DOUBLE, price DOUBLE, rf STRING"
        val back = s.read.schema(schema).option("header", "true").csv(out)
          .orderBy("l_orderkey", "l_linenumber", "qty", "price", "rf")
        back
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(l_quantity AS DOUBLE) AS qty,
             |  CAST(l_extendedprice AS DOUBLE) AS price,
             |  l_returnflag AS rf
             |FROM lineitem WHERE l_orderkey % 97 = 0
             |ORDER BY l_orderkey, l_linenumber, qty, price, rf""".stripMargin),
      note = "write-through-CSV-sink round trip vs the source-of-truth oracle; lossy sink = hash fail"),

    // K3 partitioned-parquet sink, driver-verified: write date-partitioned
    // parquet (the engine's canonical at-rest layout — the reference's
    // per-date raster directory, SURVEY §1.1) and read it back through a
    // date filter that must prune to directories. The oracle aggregates the
    // source directly, so partition-value encoding drift (date→path→date),
    // a lossy sink, or pruning that drops a live partition all fail the
    // hash. PlanRegressionSpec separately asserts the filter lands in
    // PartitionFilters, not post-scan.
    Q("k3_partitioned_roundtrip", Seq("K3", "F5", "S6", "P18"),
      (s, dir) => {
        val out = graft.util.Scratch.fresh("k3")
        Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("event_type"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
          // co-locate each date before the partitioned write: one file per
          // date directory instead of one per (task × date) — the layout a
          // pruned reader wants, and a fraction of the commit overhead
          .repartition(col("d"))
          .write.mode("overwrite").partitionBy("d").parquet(out)
        s.read.parquet(out)
          .where(col("d") >= lit("2024-01-03") && col("d") < lit("2024-01-06"))
          .groupBy("d", "event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .orderBy("d", "event_type")
      },
      Some("""SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n,
             |  CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events
             |WHERE CAST(ts AS DATE) >= DATE '2024-01-03' AND CAST(ts AS DATE) < DATE '2024-01-06'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "date-partitioned sink + pruned re-read vs source-of-truth oracle"),

    // NDJSON (JSON-lines) round trip over the DOCUMENTS table — the corpus
    // interchange format every large-scale text pipeline ingests and emits
    // (one JSON object per line, newline-delimited, splittable). The text
    // column carries arbitrary corpus strings, so this is specifically a
    // test of the sink's escaping (quotes, backslashes, control chars,
    // non-ASCII) and of the reader's decode: any character the sink writes
    // non-reversibly fails the hash against the oracle, which reads the
    // source table and never sees the files. Explicit read schema, like
    // every inter-stage hop here: JSON carries no types, so re-read without
    // one would silently widen/narrow. Distributed shape: write is one task
    // per partition, read is a splittable line scan — no shuffle until the
    // output sort.
    Q("k_jsonl_roundtrip", Seq("K1", "S3", "P13", "P15"),
      (s, dir) => {
        val out = graft.util.Scratch.fresh("kjsonl")
        Tables.documents(s, dir)
          .where(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
          .write.mode("overwrite").json(out)
        s.read.schema("doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT")
          .json(out)
          .select(col("doc_id"), length(col("text")).as("len_back"),
                  col("lang"), col("n_chars"),
                  substring(col("text"), 1, 12).as("head12"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, length(text) AS len_back, lang, n_chars,
             |  substring(text, 1, 12) AS head12
             |FROM documents WHERE doc_id % 7 = 0
             |ORDER BY doc_id""".stripMargin),
      note = "NDJSON corpus round trip: sink escaping + schema-pinned re-read vs source-of-truth oracle"),

    // ORC round trip — the second columnar at-rest format (native Spark
    // source, same DataSource V1/V2 machinery as parquet: predicate
    // pushdown, column pruning, vectorized read). The re-read applies a
    // filter that must reach the ORC reader as a pushed predicate and a
    // two-column projection that must prune the schema — the format
    // interoperability contract a mixed-lake deployment (parquet + ORC
    // tables side by side) depends on. Decimals go through the sink at
    // exact scale; the oracle reads the parquet source, so any type
    // mangling in the ORC writer/reader path fails the hash.
    Q("k_orc_roundtrip", Seq("K1", "S6", "F1", "P15"),
      (s, dir) => {
        val out = graft.util.Scratch.fresh("korc")
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
                  expr(s"CAST(o_totalprice AS $dec)").as("total"),
                  to_date(col("o_orderdate")).as("d"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .where(col("d") >= lit("1995-01-01") && col("d") < lit("1996-01-01"))
          .groupBy("d")
          .agg(count(lit(1)).as("n"),
               expr(s"CAST(CAST(sum(total) AS $dec) AS DOUBLE)").as("sum_total"))
          .orderBy("d")
      },
      Some(s"""SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n,
              |  CAST(CAST(sum(CAST(o_totalprice AS $dec)) AS $dec) AS DOUBLE) AS sum_total
              |FROM orders
              |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
              |  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "ORC sink + pushed-filter pruned re-read vs parquet source-of-truth oracle"),

    // S5 idempotent dated-URL ingest (data_extraction_v2.py:184-217),
    // exercised end-to-end against a deterministic fake transport and
    // in-memory file state so the whole skip/404/failure decision tree is
    // oracle-checked. Model: the remote catalog publishes one daily file
    // per date that has ≥1 purchase event, sized as that day's purchase
    // count; the local disk already holds (non-empty) files for
    // day-of-month % 3 == 0; the server 500s on day-of-month == 13; the
    // calendar runs 5 days past the last event (the reference's
    // "yesterday's file isn't up yet" 404 path). Everything is driver-side
    // calendar-sized by construction — the collect is one (date, n) pair
    // per day in the range, bounded at any SF.
    Q("s5_fetch_log", Seq("S5", "S10", "K7"),
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir).select(to_date(col("ts")).as("d"), col("event_type"))
        val catalog = ev.where(col("event_type") === "purchase")
          .groupBy("d").agg(count(lit(1)).as("n"))
          .as[(java.sql.Date, Long)].collect()
          .map { case (d, n) => d.toLocalDate -> n }.toMap
        val (lo, hi) = {
          val r = ev.agg(min("d"), max("d")).as[(java.sql.Date, java.sql.Date)].head()
          (r._1.toLocalDate, r._2.toLocalDate.plusDays(5))
        }
        val dates = graft.sources.Fetch.dateRange(lo, hi)
        val store = scala.collection.mutable.Map[String, Long]() ++
          dates.filter(_.getDayOfMonth % 3 == 0)
            .map(d => graft.sources.Fetch.pathFor(d) -> 1L)
        val log = graft.sources.Fetch.run[Long](
          dates,
          existingSize = p => store.getOrElse(p, 0L),
          transport = d =>
            if (d.getDayOfMonth == 13) Left(500)
            else catalog.get(d).toRight(404),
          sizeOf = identity,
          save = (p, b) => store(p) = b)
        s.createDataFrame(log).select("date", "path", "action", "bytes").orderBy("date")
      },
      Some("""WITH ed AS (SELECT CAST(ts AS DATE) AS d, event_type FROM events),
             |cat AS (SELECT d, count(*) AS n FROM ed WHERE event_type = 'purchase' GROUP BY 1),
             |span AS (SELECT min(d) AS lo, max(d) + INTERVAL 5 DAY AS hi FROM ed),
             |cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM span)
             |SELECT cal.d AS date,
             |  'rfe' || strftime(cal.d, '%Y_%m_%d') || '.nc' AS path,
             |  CASE WHEN day(cal.d) % 3 = 0 THEN 'skip_exists'
             |       WHEN day(cal.d) = 13 THEN 'failed'
             |       WHEN cat.n IS NULL THEN 'skip_404'
             |       ELSE 'download' END AS action,
             |  CAST(CASE WHEN day(cal.d) % 3 = 0 OR day(cal.d) = 13 OR cat.n IS NULL
             |            THEN 0 ELSE cat.n END AS BIGINT) AS bytes
             |FROM cal LEFT JOIN cat ON cal.d = cat.d
             |ORDER BY date""".stripMargin),
      note = "S5 download loop vs fake transport: skip-if-exists / 404-tolerance / record-and-continue, oracle-checked"),

    // K2 GeoTIFF sink, driver-verified: burn one day's events to a 30×40
    // grid, encode it with our single-strip float32 TIFF writer, decode
    // with our reader (the one golden-tested against the reference's
    // committed rasters), and aggregate the decoded cells. The oracle
    // aggregates the source directly — any byte-level defect in either
    // codec shifts the sums and fails the hash. Cell values are integer
    // cents < 2²⁴, so the float32 band is lossless. The dense collect is
    // the sanctioned driver-side sink boundary (one 260×300-scale raster
    // per date, SURVEY §1.1), exactly the reference's per-date write.
    Q("k2_geotiff_roundtrip", Seq("K2", "S8", "W8", "P11"),
      (s, dir) => {
        import s.implicits._
        val (w, h) = (40, 30)
        val cells = Tables.events(s, dir)
          .where(to_date(col("ts")) === lit("2024-01-05"))
          .select(expr("user_id % 30").as("r"), expr("(user_id div 30) % 40").as("c"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"),
                  col("event_id"))
          .groupBy("r", "c").agg(expr("min_by(cents, event_id)").as("v"))
        val nodata = -99999f
        val arr = Array.fill(w * h)(nodata)
        cells.collect().foreach { row =>
          arr(row.getLong(0).toInt * w + row.getLong(1).toInt) = row.getLong(2).toFloat
        }
        val path = graft.util.Scratch.fresh("k2", ".tif")
        graft.sources.GeoTiff.write(path, w, h, arr, Some(-99999d))
        val rast = graft.sources.GeoTiff.read(path)
        val nd = rast.nodata.map(_.toFloat).getOrElse(Float.NaN)
        val back = for {
          r <- 0 until rast.height
          c <- 0 until rast.width
          v = rast.value(r, c) if v != nd
        } yield (r.toLong, c.toLong, v.toLong)
        back.toDF("r", "c", "v")
          .groupBy("r")
          .agg(count(lit(1)).as("n_cells"), sum("v").as("sum_v"))
          .orderBy("r")
      },
      Some("""WITH g AS (
             |  SELECT user_id % 30 AS r, (user_id // 30) % 40 AS c,
             |    min_by(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT), event_id) AS v
             |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
             |  GROUP BY 1, 2)
             |SELECT r, count(*) AS n_cells, CAST(sum(v) AS BIGINT) AS sum_v
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "burn -> own TIFF encoder -> own decoder -> agg vs source oracle; codec defects fail the hash"),

    // S4 NetCDF scan, driver-verified the same way as k2: burn one day's
    // events to a 30×40 grid, encode it as a classic NetCDF-3 file with our
    // writer (TAMSAT shape: rfe(time,lat,lon) float + coordinate vars +
    // CF _FillValue), then read it back through the DISTRIBUTED scan path —
    // Spark's binaryFile source with the per-file decode running in the
    // task — and aggregate the decoded cells. The oracle aggregates the
    // source directly, so any header-layout, record-interleave, or CF-decode
    // defect in either codec shifts the sums and fails the hash. Values are
    // integer cents < 2²⁴ (float32-lossless); the dense collect is the same
    // sanctioned per-date raster boundary as k2.
    Q("s4_netcdf_roundtrip", Seq("S4", "W8", "P11", "P8"),
      (s, dir) => {
        val (w, h) = (40, 30)
        val cells = Tables.events(s, dir)
          .where(to_date(col("ts")) === lit("2024-01-07"))
          .select(expr("user_id % 30").as("r"), expr("(user_id div 30) % 40").as("c"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"),
                  col("event_id"))
          .groupBy("r", "c").agg(expr("min_by(cents, event_id)").as("v"))
        val fill = -99999.0
        val arr = Array.fill(h * w)(fill)
        cells.collect().foreach { row =>
          arr(row.getLong(0).toInt * w + row.getLong(1).toInt) = row.getLong(2).toDouble
        }
        val outDir = graft.util.Scratch.fresh("s4")
        new java.io.File(outDir).mkdirs()
        import graft.sources.NetCdf
        NetCdf.write(s"$outDir/rfe2024_01_07.nc",
          dims = Seq("time" -> -1, "lat" -> h, "lon" -> w),
          vars = Seq(
            NetCdf.VarSpec("time", Seq("time"), 6,
              Seq("units" -> Left("days since 2024-01-07")), Array(0.0)),
            NetCdf.VarSpec("lat", Seq("lat"), 6, Nil, Array.tabulate(h)(_.toDouble)),
            NetCdf.VarSpec("lon", Seq("lon"), 6, Nil, Array.tabulate(w)(_.toDouble)),
            NetCdf.VarSpec("rfe", Seq("time", "lat", "lon"), 5,
              Seq("_FillValue" -> Right(Array(fill))), arr)))
        NetCdf.scanCells(s, s"$outDir/rfe2024_01_07.nc")
          .where(col("value").isNotNull)
          .select(col("date"), col("lat").cast("long").as("r"), col("value").cast("long").as("v"))
          .groupBy("date", "r")
          .agg(count(lit(1)).as("n_cells"), sum("v").as("sum_v"))
          .orderBy("r")
      },
      Some("""WITH g AS (
             |  SELECT user_id % 30 AS r, (user_id // 30) % 40 AS c,
             |    min_by(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT), event_id) AS v
             |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-07'
             |  GROUP BY 1, 2)
             |SELECT DATE '2024-01-07' AS date, r, count(*) AS n_cells, CAST(sum(v) AS BIGINT) AS sum_v
             |FROM g GROUP BY 2 ORDER BY 2""".stripMargin),
      note = "burn -> own NetCDF-3 encoder -> distributed binaryFile decode -> agg vs source oracle"),

    // S9: the reference's per-zone HDF5 databases (`BiomassAggregate.py:
    // 348-357`: one rank-2 float64 [Date, Biomass] dataset per zone,
    // chunked + LZF, Column_Names attribute) encoded with our own writer,
    // decoded through the distributed binaryFile scan, and aggregated
    // against the source-of-truth oracle. Biomass travels as integer cents
    // in float64 so the round trip is exact; ord_ck is order-sensitive
    // (row_number × date) so a row-order defect in the codec fails the
    // hash even when sums collide. The driver-side build is bounded: one
    // month × 5 zones of PRE-AGGREGATED series rows, the same shape the
    // reference collects before its own h5py write.
    Q("s9_hdf5_roundtrip", Seq("S9", "K3", "A1", "W2"),
      (s, dir) => {
        val zs = Tables.events(s, dir)
          .where(to_date(col("ts")).between("2024-01-01", "2024-01-31"))
          .select(concat(lit("zone_"), expr("CAST(user_id % 5 AS STRING)")).as("zone"),
                  datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("d"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
          .groupBy("zone", "d").agg(sum("cents").as("v"))
        val byZone = zs.collect().groupBy(_.getString(0))
        val specs = byZone.toSeq.sortBy(_._1).map { case (zone, rows) =>
          val sorted = rows.sortBy(_.getInt(1))
          val data = sorted.flatMap(r =>
            Seq(r.getInt(1).toDouble, r.getLong(2).toDouble)).toArray
          graft.sources.Hdf5.DatasetSpec(zone, Seq(sorted.length.toLong, 2L), data,
            Map("Column_Names" -> Seq("Date", "Biomass")), chunkRows = 16)
        }
        val outDir = graft.util.Scratch.fresh("s9")
        new java.io.File(outDir).mkdirs()
        graft.sources.Hdf5.write(s"$outDir/zones.h5", specs)
        graft.sources.Hdf5.scanZoneSeries(s, s"$outDir/zones.h5")
          .select(col("zone"), (col("idx") + 1).cast("long").as("rn"),
                  col("date_num").cast("long").as("d"), col("value").cast("long").as("v"))
          .groupBy("zone")
          .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"),
               sum(expr("rn * d")).as("ord_ck"))
          .orderBy("zone")
      },
      Some("""WITH z AS (
             |  SELECT 'zone_' || CAST(user_id % 5 AS VARCHAR) AS zone,
             |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
             |  FROM events
             |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'),
             |s AS (SELECT zone, d, CAST(sum(cents) AS BIGINT) AS v FROM z GROUP BY 1, 2),
             |r AS (SELECT zone, d, v,
             |        row_number() OVER (PARTITION BY zone ORDER BY d) AS rn FROM s)
             |SELECT zone, count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sum_v,
             |  CAST(sum(rn * d) AS BIGINT) AS ord_ck
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "zone series -> own HDF5 encoder (chunked+LZF) -> distributed decode -> agg vs source oracle"),

    // K9: progress checkpoints — which processing units get a marker file
    // is a deterministic query over the unit list (`BiomassAggregate.py:
    // 161-164`: every 20th date drops "<date> is done.npy"); the bounded
    // file write + resume-skip + end-of-run reset live in
    // graft.pipeline.Progress (ProgressSpec).
    Q("k9_progress_markers", Seq("K9", "A10", "W2"),
      (s, dir) => graft.pipeline.Progress.markers(
          Tables.events(s, dir).select(to_date(col("ts")).as("d")), "d", 20)
        .select(col("seq").cast("long").as("seq"), col("unit"), col("marker"))
        .orderBy("seq"),
      Some("""WITH u AS (
             |  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS unit FROM events),
             |r AS (SELECT unit, row_number() OVER (ORDER BY unit) AS seq FROM u)
             |SELECT CAST(seq AS BIGINT) AS seq, unit, unit || ' is done' AS marker
             |FROM r WHERE seq % 20 = 0 ORDER BY seq""".stripMargin),
      note = "every-20th-date checkpoint markers; file write + resume + reset in ProgressSpec")
  )
}
