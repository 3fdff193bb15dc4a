package graft.queries

import graft.Q
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / reshape operators (SURVEY.md §2.7): lag widening (W2), last-k
  * slice (W4), union-all concat (W5), long→wide pivot (W6), wide→long melt
  * (W7), and the expanding (rolling-origin) frame (F10/W3's SQL face).
  */
object WindowQueries {

  private val dec = "DECIMAL(18,2)"
  private val etypes = Seq("click", "error", "purchase", "signup", "view")

  /** Chunk span for the two-phase smoothers: one calendar day of epoch
    * micros. Chunk count grows with the time range (not the data volume),
    * so the boundary-stitch summary stays tiny at any SF while rows per
    * (type, day) chunk stay executor-sized. */
  private val dayUs = 86400L * 1000000L

  /** Last n elements of arr, tolerating |arr| < n (Spark's slice with a
    * negative start returns an empty array when the offset underruns the
    * array, so the short case must be guarded, unlike DuckDB's clamp). */
  private def lastN(arr: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    when(size(arr) <= n, arr).otherwise(slice(arr, -n, n))

  def all: Seq[Q] = Seq(

    // W2: lag-column widening — each row carries the values observed 1 and 2
    // observations earlier in its series (BiomassHindcasts.py:67-69 shape).
    Q("w2_lag_widen", Seq("W2"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
                  lag("value", 1).over(w).as("lag1"),
                  lag("value", 2).over(w).as("lag2"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS lag1,
             |  lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS lag2
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // W4: last-k slice per group (BiomassForecast.py:78-84 keeps last 4).
    Q("w4_last_k", Seq("W4", "F9"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 4)
          .select(col("user_id"), col("rn"), col("event_id"), col("value"))
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, rn, event_id, value FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
             |  FROM events) t
             |WHERE rn <= 4 ORDER BY user_id, rn""".stripMargin)),

    // W5: union-all accumulation (pd.concat / xr.concat shape).
    Q("w5_union_concat", Seq("W5"),
      (s, dir) => {
        val e = Tables.events(s, dir)
        val a = e.where(col("event_type") === "click")
          .select(col("user_id"), col("value"), lit("clicks").as("src"))
        val b = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("value"), lit("purchases").as("src"))
        a.unionByName(b)
          .groupBy("src", "user_id")
          .agg(count(lit(1)).as("n"), expr(s"CAST(sum(CAST(value AS $dec)) AS DOUBLE)").as("total"))
          .orderBy("src", "user_id")
      },
      Some(s"""WITH u AS (
              |  SELECT user_id, value, 'clicks' AS src FROM events WHERE event_type = 'click'
              |  UNION ALL
              |  SELECT user_id, value, 'purchases' AS src FROM events WHERE event_type = 'purchase')
              |SELECT src, user_id, count(*) AS n, CAST(sum(CAST(value AS $dec)) AS DOUBLE) AS total
              |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // W6: long→wide pivot (the zone×date cube build, BiomassAggregate.py:277).
    Q("w6_pivot_wide", Seq("W6"),
      (s, dir) => {
        val pivoted = Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", etypes)
          .agg(expr(s"sum(CAST(value AS $dec))"))
        pivoted.select(col("user_id") +: etypes.map(t => col(t).cast(dec).cast("double").as(t)): _*)
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id,
              |${etypes.map(t => s"  CAST(CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS $dec) END) AS $dec) AS DOUBLE) AS $t").mkString(",\n")}
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // W7: wide→long melt (cube → flat CSV, BiomassAggregate.py:328-338).
    Q("w7_melt_long", Seq("W7", "W6"),
      (s, dir) => {
        val pivoted = Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", etypes)
          .agg(expr(s"CAST(sum(CAST(value AS $dec)) AS $dec)"))
        val stackArgs = etypes.map(t => s"'$t', $t").mkString(", ")
        pivoted
          .select(col("user_id"),
                  expr(s"stack(${etypes.size}, $stackArgs) AS (etype, total)"))
          .withColumn("total", col("total").cast("double"))
          .orderBy("user_id", "etype")
      },
      Some(s"""WITH p AS (SELECT user_id, event_type AS etype,
              |    CAST(sum(CAST(value AS $dec)) AS $dec) AS total
              |  FROM events GROUP BY 1, 2),
              |  grid AS (SELECT user_id, etype
              |    FROM (SELECT DISTINCT user_id FROM events),
              |         (SELECT unnest(['click','error','purchase','signup','view']) AS etype))
              |SELECT grid.user_id, grid.etype, CAST(p.total AS DOUBLE) AS total
              |FROM grid LEFT JOIN p USING (user_id, etype)
              |ORDER BY grid.user_id, grid.etype""".stripMargin)),

    // F10/W3 (SQL face): expanding frame — running sum over a growing prefix,
    // the rolling-origin hindcast's window shape.
    Q("w9_expanding_prefix", Seq("F10", "W3", "W9"),
      (s, dir) => {
        // l_quantity joins the ordering: (shipdate, orderkey, linenumber) has
        // genuine ties in the synthetic data; with quantity included, any
        // remaining ties are value-identical so rn/run_qty are unaffected
        val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val w = Window.partitionBy("l_suppkey").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wr = Window.partitionBy("l_suppkey").orderBy(order: _*)
        Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                  row_number().over(wr).as("rn"),
                  sum("l_quantity").over(w).as("run_qty"))
          .orderBy("l_suppkey", "rn")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  row_number() OVER w AS rn,
             |  sum(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
             |FROM lineitem
             |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
             |ORDER BY l_suppkey, rn""".stripMargin)),

    // RANGE frame (vs the rows-frames above): trailing 3-day window keyed
    // by event TIME, not row position — rows with equal timestamps share a
    // frame, and gaps in time shrink it. The frame bound is value-based
    // (epoch µs), which is what Spark's range frames require; counts stay
    // integer-exact across engines.
    Q("w_range_trailing", Seq("W2", "W3", "F8", "§2.10"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-3L * 86400L * 1000000L, 0L)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("n_3d", count(lit(1)).over(w))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS n_3d
             |FROM events ORDER BY event_id""".stripMargin),
      note = "value-based RANGE frame (time interval), not a rows frame"),

    // Trailing-window EXACT moving median — the robust analog of a moving
    // average, by the same rank-not-interpolation contract as
    // a_exact_quantiles. Two-phase plan: a window PARTITION BY event_type
    // alone would funnel every row of a type through ONE task's sort (a
    // handful of types — the low-cardinality-partition scale killer), so
    // instead each series is chunked by calendar day and the heavy trailing
    // window runs inside the high-cardinality (event_type, chunk)
    // partition. Chunk boundaries are stitched through a per-chunk summary
    // (one row per type×day) that carries each chunk's last 6 observations
    // forward in chunk order; a row's out-of-chunk predecessors are always
    // inside that carried tail, so boundary rows (rn ≤ 6) recover their
    // exact global frame from carry ++ in-chunk prefix. The only
    // event_type-partitioned window left runs over the summary (#days
    // rows), not the data. Verified hash-identical to the oracle's single
    // global window.
    Q("w_moving_median", Seq("W2", "W3", "A13", "F8", "§2.10"),
      (s, dir) => {
        val wc = Window.partitionBy("event_type", "chunk")
          .orderBy("ts_us", "event_id")
        // NULL values: Spark's collect_list drops them, DuckDB's list()
        // keeps them — exclude explicitly on BOTH sides so the pair stays
        // equivalent if the testdata ever grows NULLs.
        val base = Tables.events(s, dir)
          .where(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"),
                  col("value").cast("double").as("v"))
          .withColumn("chunk", expr(s"ts_us DIV $dayUs"))
        val rows = base
          .withColumn("rn", row_number().over(wc))
          .withColumn("vs", collect_list(col("v")).over(wc.rowsBetween(-6, 0)))
        val wS = Window.partitionBy("event_type").orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = base.groupBy("event_type", "chunk")
          .agg(lastN(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("v")))), 6).as("tail6"))
          .withColumn("prior", lastN(flatten(collect_list(col("tail6")).over(wS)), 6))
          .select(col("event_type"), col("chunk"),
                  transform(col("prior"), x => x.getField("v")).as("carry_vs"))
        rows.join(broadcast(carry), Seq("event_type", "chunk"))
          .withColumn("full",
            when(col("rn") <= 6, lastN(concat(col("carry_vs"), col("vs")), 7))
              .otherwise(col("vs")))
          .select(col("event_id"), col("event_type"), col("ts_us"),
                  expr("element_at(sort_array(full), CAST((size(full) + 1) DIV 2 AS INT))").as("med7"))
          .orderBy("event_id")
      },
      Some("""WITH t AS (
             |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
             |    list_sort(list(CAST(value AS DOUBLE)) OVER (
             |      PARTITION BY event_type ORDER BY epoch_us(ts), event_id
             |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vs
             |  FROM events WHERE value IS NOT NULL)
             |SELECT event_id, event_type, ts_us,
             |  vs[CAST((len(vs) + 1) // 2 AS INTEGER)] AS med7
             |FROM t ORDER BY event_id""".stripMargin),
      note = "trailing-7 exact moving median: two-phase (day-chunked window + carried-tail stitch), no low-cardinality data window"),

    // ROLLUP lattice: per-(type, day) totals plus per-type and grand
    // totals in ONE pass — Spark expands the grouping sets before the
    // aggregation, so partial aggregation still happens map-side; the
    // grouping-id disambiguates null-as-total from null-in-data.
    Q("a_rollup_totals", Seq("A1", "A12", "W6", "§2.10"),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("d"),
                  col("value").cast("decimal(18,2)").as("v"))
          .rollup("event_type", "d")
          .agg(count(lit(1)).as("n"),
               expr("CAST(sum(v) AS DOUBLE)").as("total"),
               grouping_id().as("gid"))
          .orderBy(col("gid"), col("event_type"), col("d")),
      Some("""SELECT event_type, d, count(*) AS n,
             |  CAST(sum(v) AS DOUBLE) AS total,
             |  CAST(grouping(event_type) * 2 + grouping(d) AS BIGINT) AS gid
             |FROM (SELECT event_type, CAST(ts AS DATE) AS d,
             |        CAST(value AS DECIMAL(18,2)) AS v FROM events) t
             |GROUP BY ROLLUP (event_type, d)
             |ORDER BY gid, event_type, d""".stripMargin),
      note = "ROLLUP grouping sets with grouping_id disambiguation"),

    // Set operations beyond W5's UNION: day-over-day audience INTERSECT
    // (retained users) and EXCEPT (churned users) — both plan as hash
    // aggregates over the union, one shuffle each, no pair join.
    Q("set_retention_intersect", Seq("W5", "A10", "F1"),
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
        val d1 = e.where(col("d") === "2024-01-01").select("user_id").distinct()
        val d2 = e.where(col("d") === "2024-01-02").select("user_id").distinct()
        d1.intersect(d2).withColumn("status", lit("retained"))
          .union(d1.except(d2).withColumn("status", lit("churned")))
          .orderBy("status", "user_id")
      },
      Some("""WITH d1 AS (SELECT DISTINCT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01'),
             |d2 AS (SELECT DISTINCT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-02'),
             |r AS (SELECT user_id, 'retained' AS status FROM (SELECT * FROM d1 INTERSECT SELECT * FROM d2)
             |      UNION ALL
             |      SELECT user_id, 'churned' AS status FROM (SELECT * FROM d1 EXCEPT SELECT * FROM d2))
             |SELECT user_id, status FROM r ORDER BY status, user_id""".stripMargin),
      note = "INTERSECT/EXCEPT set ops (retained vs churned audiences)"),

    // Time-weighted average — the billing/sensor semantics a plain avg gets
    // wrong: each observation holds until the next one, so it weighs by its
    // interval. lead() pairs each event with its successor (event_id
    // tiebreak makes duplicate timestamps deterministic); the weighted sum
    // folds as integer cents × integer microseconds (max ~5e15 per term —
    // no overflow, no float-order drift), with ONE double division at the
    // end. The last observation per user has no successor and is excluded
    // (declared half-open semantics). One window sort + one groupBy, both
    // keyed by user: the 100 TB shape.
    Q("w_time_weighted_avg", Seq("W2", "A13", "F9", "session"),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
                  expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
          .withColumn("next_us", lead("ts_us", 1).over(w))
          .where(col("next_us").isNotNull)
          .groupBy("user_id")
          .agg(sum(expr("cents * (next_us - ts_us)")).as("wsum"),
               sum(expr("next_us - ts_us")).as("wtot"),
               count(lit(1)).as("n_intervals"))
          .select(col("user_id"), col("n_intervals"),
                  expr("CAST(wsum AS DOUBLE) / (100.0 * CAST(wtot AS DOUBLE))").as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
             |  FROM events)
             |SELECT user_id, count(*) AS n_intervals,
             |  CAST(sum(cents * (next_us - ts_us)) AS DOUBLE)
             |    / (100.0 * CAST(sum(next_us - ts_us) AS DOUBLE)) AS twa
             |FROM e WHERE next_us IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      note = "interval-weighted mean: integer cents x microseconds fold, one final division"),

    // Trailing exponential smoothing (EMA) — the online filter every
    // monitoring/forecasting stack runs over its series (the reference's
    // stage-5 forecasts consume exactly such per-zone series). The α=1/2
    // kernel is truncated at 10 taps and computed as Σ 2^(9-k)·cents_{t-k}
    // — the dyadic weights make the numerator an exact BIGINT at every
    // parallelism, normalized once by (2¹⁰−1)·100. Same two-phase shape as
    // w_moving_median: the trailing-10 frame is collected inside the
    // high-cardinality (event_type, day-chunk) window, and boundary rows
    // (rn ≤ 9) splice in the previous chunks' carried tail-9; a row emits
    // iff its stitched frame holds the full 10 taps — exactly the oracle's
    // global rn ≥ 10. The fold weighs newest-first (2⁹ … 2⁰), all integer.
    Q("w_ema_trailing", Seq("W2", "W3", "A13", "session"),
      (s, dir) => {
        val wc = Window.partitionBy("event_type", "chunk")
          .orderBy("ts_us", "event_id")
        val base = Tables.events(s, dir)
          .where(col("value").isNotNull)
          .select(col("event_type"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
          .withColumn("chunk", expr(s"ts_us DIV $dayUs"))
        val rows = base
          .withColumn("rn", row_number().over(wc))
          .withColumn("cs", collect_list(col("cents")).over(wc.rowsBetween(-9, 0)))
        val wS = Window.partitionBy("event_type").orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = base.groupBy("event_type", "chunk")
          .agg(lastN(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("cents")))), 9).as("tail9"))
          .withColumn("prior", lastN(flatten(collect_list(col("tail9")).over(wS)), 9))
          .select(col("event_type"), col("chunk"),
                  transform(col("prior"), x => x.getField("cents")).as("carry_cents"))
        rows.join(broadcast(carry), Seq("event_type", "chunk"))
          .withColumn("full",
            when(col("rn") <= 9, lastN(concat(col("carry_cents"), col("cs")), 10))
              .otherwise(col("cs")))
          .where(size(col("full")) === 10)
          .select(col("event_type"), col("ts_us"), col("event_id"),
                  (expr("aggregate(reverse(full), 0L, (acc, x) -> acc * 2 + x)")
                     .cast("double") / 102300.0).as("ema"))
          .orderBy("event_type", "ts_us", "event_id")
      },
      Some {
        val taps = (0 until 10).map { k =>
          s"lag(cents, $k) OVER w * ${1L << (9 - k)}"
        }.mkString(" + ")
        s"""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
           |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
           |  FROM events WHERE value IS NOT NULL),
           |l AS (SELECT event_type, ts_us, event_id,
           |    $taps AS num,
           |    row_number() OVER w AS rn
           |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id))
           |SELECT event_type, ts_us, event_id,
           |  CAST(num AS DOUBLE) / 102300.0 AS ema
           |FROM l WHERE rn >= 10 ORDER BY 1, 2, 3""".stripMargin
      },
      note = "10-tap dyadic EMA: two-phase day-chunked frame + carried-tail stitch, exact integer numerator"),

    // Bounded top-k per group (graft.agg.TopKAgg, typed Aggregator) — W4's
    // scale form. The row_number() window the oracle uses sorts every
    // group's FULL history inside the shuffle; the aggregator holds ≤ k
    // rows of state, so the map-side combine sends O(groups × k) rows into
    // the exchange however large the input. Same deterministic
    // (value DESC, event_id ASC) order, bit-identical result.
    Q("w_topk_bounded", Seq("W4", "F9", "A11", "§2.10"),
      (s, dir) => {
        val topk = udaf(new graft.agg.TopKAgg(3),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
        Tables.events(s, dir)
          .select(col("event_type"), col("value").cast("double").as("v"), col("event_id"))
          .groupBy("event_type")
          .agg(topk(col("v"), col("event_id")).as("top"))
          .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
                  col("t._1").as("v"), col("t._2").as("event_id"))
          .orderBy("event_type", "rank")
      },
      Some("""SELECT event_type, CAST(rank AS INTEGER) AS rank, v, event_id FROM (
             |  SELECT event_type, CAST(value AS DOUBLE) AS v, event_id,
             |    row_number() OVER (PARTITION BY event_type
             |                       ORDER BY CAST(value AS DOUBLE) DESC, event_id) AS rank
             |  FROM events) t
             |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin),
      note = "typed bounded top-k Aggregator: O(groups x k) shuffle vs the window's full sort"),

    // Mann-Kendall trend test per user over DAILY activity totals — the
    // standard nonparametric trend statistic of the environmental-
    // monitoring literature the reference lives in (its GWR/GP stages feed
    // exactly this kind of "is forage trending down" question). S =
    // Σ_{i<j} sign(x_j − x_i) over the monthly series; sums are integer
    // cents and signs are CASE arithmetic, so S is engine-exact. The i<j
    // pair join is per-key quadratic in the SERIES LENGTH — bounded by the
    // calendar window (≤ tens of days) however many rows the fact table
    // has, which is what makes the self-join admissible at 100 TB: cost is
    // O(users × days²), data-volume-independent after the first rollup.
    Q("w_trend_mann_kendall", Seq("W1", "A1", "A9", "J2", "F8"),
      (s, dir) => {
        val m = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("ym"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        // The i<j pair space is generated INSIDE one codegen'd projection
        // over each user's collected series (sorted by day, so i<j ⇔
        // earlier<later) instead of a self-join + re-aggregation: one
        // user_id shuffle total, and the per-row work stays the same
        // calendar-bounded O(days²). Users with a single period have no
        // pairs and are dropped, matching the oracle's inner join.
        m.groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("ym"), col("cents")))).as("ser"))
          .where(size(col("ser")) >= 2)
          .select(col("user_id"),
                  size(col("ser")).cast("bigint").as("n_periods"),
                  expr("""aggregate(flatten(transform(sequence(0, size(ser) - 2), i ->
                         |  transform(sequence(i + 1, size(ser) - 1), j ->
                         |    CASE WHEN ser[j].cents > ser[i].cents THEN 1L
                         |         WHEN ser[j].cents < ser[i].cents THEN -1L
                         |         ELSE 0L END))), 0L, (a, x) -> a + x)""".stripMargin)
                    .as("s_stat"))
          .select(col("user_id"), col("n_periods"), col("s_stat"),
                  when(col("s_stat") > 0, "up").when(col("s_stat") < 0, "down")
                    .otherwise("flat").as("trend"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (
             |  SELECT user_id, CAST(ts AS DATE) AS ym,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.user_id,
             |        CASE WHEN b.cents > a.cents THEN 1
             |             WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
             |      FROM m a JOIN m b ON a.user_id = b.user_id AND a.ym < b.ym),
             |s AS (SELECT user_id, CAST(sum(sg) AS BIGINT) AS s_stat
             |      FROM p GROUP BY 1),
             |n AS (SELECT user_id, count(*) AS n_periods FROM m GROUP BY 1)
             |SELECT user_id, n_periods, s_stat,
             |  CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
             |       ELSE 'flat' END AS trend
             |FROM s JOIN n USING (user_id) ORDER BY user_id""".stripMargin),
      note = "Mann-Kendall S per user on daily integer-cent totals: calendar-bounded pair join, engine-exact signs"),

    // Theil–Sen slope — Mann-Kendall's companion robust trend ESTIMATOR:
    // the median of all pairwise slopes (x_j − x_i)/(t_j − t_i) over the
    // same daily series. Slopes are fixed-point integers (cents·10⁶ per
    // day) with the offset-before-floor-division trick so Spark `div` and
    // DuckDB `//` agree on negative differences; the median is the value
    // at rank ⌈n/2⌉ of the per-user slope ordering (lower median), which
    // is tie-independent and therefore engine-exact. Same calendar-bounded
    // O(users × days²) pair join as the MK test.
    Q("w_trend_theil_sen", Seq("W1", "A9", "A13", "J2", "F8"),
      (s, dir) => {
        val K = 1000000000000L // offset: |dc|·10⁶ < K, keeps the dividend positive
        val m = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        // Same one-shuffle shape as the MK rewrite above: every pairwise
        // slope is computed inside a single codegen'd projection over the
        // user's sorted series, the lower median is a rank pick into the
        // sorted slope array (tie-independent, engine-exact), and the
        // self-join + two windows disappear. Per-row cost stays the same
        // calendar-bounded O(days²).
        m.groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("d"), col("cents")))).as("ser"))
          .where(size(col("ser")) >= 2)
          .withColumn("slopes", expr(
            s"""array_sort(flatten(transform(sequence(0, size(ser) - 2), i ->
               |  transform(sequence(i + 1, size(ser) - 1), j ->
               |    ((ser[j].cents - ser[i].cents) * 1000000
               |       + $K * datediff(ser[j].d, ser[i].d))
               |      div datediff(ser[j].d, ser[i].d) - $K))))""".stripMargin))
          .select(col("user_id"),
                  size(col("slopes")).cast("bigint").as("n_pairs"),
                  expr("slopes[(size(slopes) + 1) div 2 - 1]").as("theil_sen_ppm"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.user_id,
             |        ((b.cents - a.cents) * 1000000
             |          + 1000000000000 * date_diff('day', a.d, b.d))
             |          // date_diff('day', a.d, b.d) - 1000000000000 AS slope_ppm
             |      FROM m a JOIN m b ON a.user_id = b.user_id AND a.d < b.d),
             |r AS (SELECT user_id, slope_ppm,
             |        row_number() OVER (PARTITION BY user_id ORDER BY slope_ppm) AS rn,
             |        count(*) OVER (PARTITION BY user_id) AS n_pairs
             |      FROM p)
             |SELECT user_id, n_pairs, slope_ppm AS theil_sen_ppm
             |FROM r WHERE rn = (n_pairs + 1) // 2 ORDER BY user_id""".stripMargin),
      note = "Theil-Sen median pairwise slope in fixed-point ppm: lower-median rank pick, engine-exact"),

    // CUSUM change-point detection — the third leg of the trend family
    // (MK answers "is there a trend", Theil–Sen "how steep", this "WHERE
    // does the level shift"). Deviations are kept in the n·x − S scaled-
    // integer form (multiply by the series length instead of dividing by
    // it), so cumulative sums, the max |CUSUM| and its argmax day are all
    // exact 64-bit integers — no mean, no floats, bit-identical engines.
    // One exchange on user_id; every window rides the same sort.
    Q("w_trend_cusum", Seq("W3", "W9", "A9", "A13", "F8"),
      (s, dir) => {
        val m = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        val wc = Window.partitionBy("user_id")
        val wo = Window.partitionBy("user_id").orderBy("d")
        val wp = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val t = m
          .withColumn("n", count(lit(1)).over(wc))
          .withColumn("tot", sum("cents").over(wc))
          .withColumn("i", row_number().over(wo))
          .withColumn("pref", sum("cents").over(wp))
          .withColumn("ab", abs(col("n") * col("pref") - col("i") * col("tot")))
        t.withColumn("rk", row_number().over(
            Window.partitionBy("user_id").orderBy(col("ab").desc, col("d"))))
          .where(col("rk") === 1)
          .select(col("user_id"), col("n").as("n_days"),
                  col("ab").as("cusum_max_abs"), col("d").as("change_day"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT user_id, d,
             |    count(*) OVER (PARTITION BY user_id) AS n,
             |    CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS tot,
             |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS i,
             |    CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY d
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pref
             |  FROM m),
             |a AS (SELECT user_id, d, n,
             |    CAST(abs(n * pref - i * tot) AS BIGINT) AS ab
             |  FROM t)
             |SELECT user_id, n AS n_days, ab AS cusum_max_abs, d AS change_day
             |FROM (SELECT user_id, d, n, ab,
             |        row_number() OVER (PARTITION BY user_id ORDER BY ab DESC, d) AS rk
             |      FROM a) z
             |WHERE rk = 1 ORDER BY user_id""".stripMargin),
      note = "CUSUM change point in n·x−S scaled integers: exact max-deviation day, one exchange, shared sort"),

    // Decile profile: ntile(10) + cume_dist over a TOTAL order (price with
    // unique-key tie-break), rolled up to one row per (flag, decile) —
    // the distribution-profiling shape behind price bands, quality tiers
    // and training-mix curves. Determinism under duplicates: rows that tie
    // on every ordering column are interchangeable, so whichever engine
    // puts which copy at a bucket boundary, the per-bucket count/sum/max
    // are identical; cume_dist is peers-inclusive (same value for all
    // copies) and its double is one exact-int division. One sort exchange
    // per flag partition, aggregate piggybacks on the same sort order.
    Q("w_ntile_deciles", Seq("W4", "W9", "A9", "A13"),
      (s, dir) => {
        // Decile PROFILE, not per-row ranks: the output is 3 rf × 10
        // deciles, so no row ever needs an individually materialized rank
        // except where a decile cut lands INSIDE a $100 price band. Phase
        // 1 is one map-side-combining shuffle of (rf, band) summaries
        // (count + exact decimal sum) — the only row-volume work in the
        // plan is partial-aggregable. Prefix offsets over that bounded
        // summary decide each band's first/last decile in closed form
        // (order key (price, okey, lineno) is unique, so cd = rn/n and
        // ntile is a pure function of (rn, n)); bands wholly inside one
        // decile contribute their summary AS the decile piece. Only the
        // ≤ (#rf × 9 cuts) boundary bands re-read their rows for an
        // in-band row_number — a bounded slice, broadcast-semi-joined.
        // vs the r8 two-phase rank shape (band row_number over EVERY
        // row): measured A/B in PLANS.md r12; hash-identical to the
        // oracle's single global window either way.
        import org.apache.spark.sql.expressions.Window
        val base = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("rf"), col("l_extendedprice"),
                  col("l_orderkey"), col("l_linenumber"))
          .withColumn("band", expr("CAST(l_extendedprice * 100 AS BIGINT) div 10000"))
        val counts = base.groupBy("rf", "band")
          .agg(count(lit(1)).as("bn"),
               expr(s"sum(CAST(l_extendedprice AS $dec))").as("bsum"))
        // unpartitioned-per-rf windows are bounded by construction: they
        // run over the per-band summary, never the fact table
        val wPre = Window.partitionBy("rf").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1)
        def dcOf(rn: String) = // ntile(10) in closed form over a unique order
          s"""CAST(CASE WHEN $rn <= (ntot % 10) * (ntot div 10 + 1)
             |       THEN ($rn - 1) div (ntot div 10 + 1) + 1
             |       ELSE ntot % 10 + ($rn - (ntot % 10) * (ntot div 10 + 1) - 1) div (ntot div 10) + 1
             |     END AS INT)""".stripMargin
        // the offsets summary feeds BOTH union branches below — memoize the
        // bounded frame (#rf × #bands rows) so the fact table is scanned
        // twice (counts + boundary rows), not three times (offs rebuilt
        // per branch); FrameMemo is the established shared-builder pattern
        // and the cold bench drops it like every other memo
        val offs = FrameMemo(s, s"$dir#ntile_band_offs") {
          counts
            .withColumn("off", coalesce(sum("bn").over(wPre), lit(0L)))
            .withColumn("ntot", sum("bn").over(Window.partitionBy("rf")))
            .withColumn("dc_first", expr(dcOf("off + 1")))
            .withColumn("dc_last", expr(dcOf("off + bn")))
        }
        // whole bands: every row shares one decile — the band summary IS
        // the decile piece (its max rank is off + bn)
        val whole = offs.where(col("dc_first") === col("dc_last"))
          .select(col("rf"), col("dc_first").as("dc"), col("bn").as("cnt"),
                  col("bsum").as("psum"), (col("off") + col("bn")).as("rn_max"),
                  col("ntot"))
        // boundary bands: a cut lands inside — only these rows rank
        val bKeys = offs.where(col("dc_first") =!= col("dc_last"))
          .select("rf", "band", "off", "ntot")
        val wIn = Window.partitionBy("rf", "band")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val splitPieces = base.join(broadcast(bKeys), Seq("rf", "band"))
          .withColumn("rn", col("off") + row_number().over(wIn))
          .select(col("rf"), expr(dcOf("rn")).as("dc"), lit(1L).as("cnt"),
                  // match whole's summed-decimal type so the union is exact
                  expr(s"CAST(CAST(l_extendedprice AS $dec) AS DECIMAL(28,2))").as("psum"),
                  col("rn").as("rn_max"), col("ntot"))
        whole.unionByName(splitPieces)
          .groupBy("rf", "dc")
          .agg(sum("cnt").as("n"),
               expr("CAST(sum(psum) AS DOUBLE)").as("sum_price"),
               (max("rn_max").cast("double") / max("ntot")).as("cd_hi"))
          .transform(graft.core.Shape.boundedSort(_, "rf", "dc")) // 3 flags x 10 deciles
      },
      Some(s"""WITH w AS (
              |  SELECT l_returnflag AS rf, l_extendedprice,
              |    ntile(10) OVER (PARTITION BY l_returnflag
              |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS dc,
              |    cume_dist() OVER (PARTITION BY l_returnflag
              |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cd
              |  FROM lineitem)
              |SELECT rf, dc, count(*) AS n,
              |  CAST(sum(CAST(l_extendedprice AS $dec)) AS DOUBLE) AS sum_price,
              |  max(cd) AS cd_hi
              |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "decile profile over a total order: ntile + peers-inclusive cume_dist, duplicate-safe by construction"),

    // Calendar densification + forward fill — the gap-fill ETL the
    // reference pipeline needs when a zone skips a dekad (its rasters are
    // dense in time; the event log is not): build the full user×day grid
    // from the log's OWN date span, left-join the daily sums, and carry
    // the last observation forward. Shapes that matter at scale: the
    // 1-row min/max span broadcasts into a sequence() explode (no
    // driver round-trip), the grid×daily join is keyed (user, day), and
    // the fill is one ignore-nulls window per user — so the whole
    // densification is 2 broadcast joins + 1 keyed join + 1 exchange.
    // Values are exact integer cents; leading days before a user's first
    // event stay NULL (is_filled marks carried rows).
    Q("w_calendar_ffill", Seq("W1", "W2", "P10", "F6", "J2"),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .where(col("user_id") % 10 === 0)
          .select(col("user_id"), to_date(col("ts")).as("d"),
                  expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val daily = e.groupBy("user_id", "d").agg(sum("cents").as("cents"))
        val span = e.agg(min("d").as("d0"), max("d").as("d1"))
        val days = span.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
        val grid = e.select("user_id").distinct().crossJoin(broadcast(days))
        val W = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("d")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(daily, Seq("user_id", "d"), "left")
          .withColumn("cents_filled", last("cents", ignoreNulls = true).over(W))
          .select(col("user_id"), col("d"), col("cents_filled"),
                  col("cents").isNull.cast("int").as("is_filled"))
          .orderBy("user_id", "d")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE user_id % 10 = 0),
             |daily AS (SELECT user_id, d, CAST(sum(cents) AS BIGINT) AS cents
             |  FROM e GROUP BY 1, 2),
             |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
             |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
             |  FROM span),
             |grid AS (SELECT u.user_id, days.d
             |  FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN days)
             |SELECT g.user_id, g.d,
             |  last_value(daily.cents IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled,
             |  CAST(daily.cents IS NULL AS INTEGER) AS is_filled
             |FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
             |ORDER BY g.user_id, g.d""".stripMargin),
      note = "grid densification + last-observation-carried-forward: span broadcast, keyed join, one fill exchange per user"),

    // Sliding-window distinct count — the aggregation windows CANNOT
    // decompose (distinct isn't sum-able across overlapping frames), so
    // the exact path fans each (day, user) pair out to the ≤7 window ends
    // it serves (bounded ×7 blowup, NOT a self-join) and de-dups per end.
    // The same query carries the scale answer: a KMV estimate read off the
    // k-th smallest portable md5 hash of each window's user set — at
    // 100 TB you keep per-day k-min sketches (mergeable, O(k) each; the
    // KmvSketch Aggregator / stream_kmv_distinct are that path) and slide
    // by merging 7 sketches, never re-touching raw pairs. Estimate and
    // relative error are single-division doubles over exact integers, so
    // both engines agree bitwise; windows with < k users report NULL.
    Q("w_sliding_distinct", Seq("W3", "A12", "W1", "sampling"),
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val x = graft.dedup.Hashing.sparkMd5Raw("CAST(user_id AS STRING)")
        val du = Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val span = du.agg(max("d").as("dmax"))
        val tu = du
          .select(explode(expr("sequence(0, 6)")).as("off"), col("d"), col("user_id"))
          .select(expr("date_add(d, off)").as("t"), col("user_id")).distinct()
        val ex = tu.groupBy("t").agg(count(lit(1)).as("n_exact"))
        val km = tu.withColumn("h", expr(x))
          .withColumn("rk", row_number().over(W.partitionBy("t").orderBy("h", "user_id")))
          .where(col("rk") === 24)
          .select(col("t"), expr("CAST(23.0 * 281474976710656 AS DOUBLE) / h").as("kmv_est"))
        ex.join(km, Seq("t"), "left").crossJoin(broadcast(span))
          .where(col("t") <= col("dmax"))
          .select(col("t"), col("n_exact"), col("kmv_est"),
                  ((col("kmv_est") - col("n_exact")) / col("n_exact")).as("rel_err"))
          .orderBy("t")
      },
      Some {
        val x = graft.dedup.Hashing.duckMd5Raw("CAST(user_id AS VARCHAR)")
        s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
           |sp AS (SELECT max(d) AS dmax FROM du),
           |tu AS (SELECT DISTINCT d + off AS t, user_id
           |       FROM du CROSS JOIN (SELECT CAST(unnest(range(7)) AS INTEGER) AS off)),
           |ex AS (SELECT t, count(*) AS n_exact FROM tu GROUP BY 1),
           |r AS (SELECT t, $x AS h, user_id FROM tu),
           |rk AS (SELECT t, h,
           |         row_number() OVER (PARTITION BY t ORDER BY h, user_id) AS rk
           |       FROM r),
           |km AS (SELECT t, CAST(23.0 * 281474976710656 AS DOUBLE) / h AS kmv_est FROM rk WHERE rk = 24)
           |SELECT ex.t, ex.n_exact, km.kmv_est,
           |  (km.kmv_est - ex.n_exact) / CAST(ex.n_exact AS DOUBLE) AS rel_err
           |FROM ex LEFT JOIN km USING (t) CROSS JOIN sp
           |WHERE ex.t <= sp.dmax ORDER BY ex.t""".stripMargin
      },
      note = "sliding distinct: bounded ×7 fan-out exact path + k-min-values estimate in one query; per-day mergeable sketches are the 100-TB slide"),

    // Linear interpolation at unobserved timestamps — the gap-fill the
    // reference's imputation (P8, `imp` NDVI series) approximates with
    // nearest/forward fills, done properly: a 'click' inherits the value
    // linearly interpolated between its user's surrounding 'view'
    // observations. One sort per user — both neighbor (ts, value) pairs
    // come from ignore-nulls frames over the SAME interleaved window, the
    // nearest-either-direction as-of pattern (j_asof_nearest) extended to
    // carry the neighbor's value for the lerp. Edges (no prior or no next
    // observation) are excluded rather than extrapolated. The lerp is one
    // double multiply-divide-add written identically in both engines;
    // cents and microseconds stay integer until that final expression.
    Q("w_linear_interpolate", Seq("P8", "W2", "F6", "session", "§2.10"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val prior = w.rowsBetween(Window.unboundedPreceding, -1)
        val next = w.rowsBetween(1, Window.unboundedFollowing)
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
          .withColumn("obs_ts", when(col("event_type") === "view", col("ts_us")))
          .withColumn("obs_c", when(col("event_type") === "view", col("cents")))
        e.withColumn("tp", last("obs_ts", ignoreNulls = true).over(prior))
          .withColumn("cp", last("obs_c", ignoreNulls = true).over(prior))
          .withColumn("tn", first("obs_ts", ignoreNulls = true).over(next))
          .withColumn("cn", first("obs_c", ignoreNulls = true).over(next))
          .where(col("event_type") === "click" &&
                 col("tp").isNotNull && col("tn").isNotNull)
          .select(col("event_id"), col("user_id"), col("ts_us"),
                  expr("""CAST(cp AS DOUBLE) + CAST(cn - cp AS DOUBLE)
                         | * (CAST(ts_us - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE))"""
                    .stripMargin.replace("\n", "")).as("interp_cents"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
             |  FROM events),
             |m AS (SELECT event_id, user_id, event_type, ts_us,
             |    last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
             |      OVER w_prior AS tp,
             |    last_value(CASE WHEN event_type = 'view' THEN cents END IGNORE NULLS)
             |      OVER w_prior AS cp,
             |    first_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
             |      OVER w_next AS tn,
             |    first_value(CASE WHEN event_type = 'view' THEN cents END IGNORE NULLS)
             |      OVER w_next AS cn
             |  FROM e
             |  WINDOW w_prior AS (PARTITION BY user_id ORDER BY ts_us, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |         w_next AS (PARTITION BY user_id ORDER BY ts_us, event_id
             |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
             |SELECT event_id, user_id, ts_us,
             |  CAST(cp AS DOUBLE) + CAST(cn - cp AS DOUBLE)
             |    * (CAST(ts_us - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE)) AS interp_cents
             |FROM m
             |WHERE event_type = 'click' AND tp IS NOT NULL AND tn IS NOT NULL
             |ORDER BY event_id""".stripMargin),
      note = "gap-fill by linear interpolation between surrounding observations: one interleaved sort per key, ignore-nulls frames both directions, integer until the single lerp expression"),

    // Classical additive seasonal decomposition (value = trend + seasonal +
    // remainder) over the per-type daily series — the forecasting pre-step
    // for exactly the kind of seasonal signal the reference models (NDVI
    // 16-day cycles, hind:41-79's per-zone series). Trend is a centered
    // 7-day moving average; the seasonal index is the weekday mean of the
    // detrended residual; remainder is what the GP/GWR stage would model.
    //
    // Float determinism: the daily total is an exact DECIMAL sum (order-
    // free); trend = exact decimal frame sum / count (ONE double division);
    // the weekday mean folds residuals in d-order via
    // aggregate(array_sort(collect_list(...))) so partial-agg order can't
    // perturb the double sum — DuckDB's list(resid ORDER BY d) + list_sum
    // is the same left fold (the dot-product queries' proven pattern).
    //
    // Scale: the heavy shuffle keys on (event_type, day) — high-card; the
    // windows run over the AGGREGATED series (#types × #days rows), and the
    // seasonal join broadcasts #types × 7 rows.
    Q("w_seasonal_decompose", Seq("W2", "A1", "A13", "F8", "P5"),
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))").as("tot"))
        val wTrend = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
        val t = daily
          .withColumn("trend",
            sum("tot").over(wTrend).cast("double") / count(lit(1)).over(wTrend))
          .withColumn("daily", col("tot").cast("double"))
          .withColumn("resid", col("daily") - col("trend"))
          .withColumn("dow", expr("weekday(d)"))
        val seas = t.groupBy("event_type", "dow")
          .agg(expr("""aggregate(array_sort(collect_list(struct(d, resid))),
                      |  CAST(0.0 AS DOUBLE), (a, x) -> a + x.resid)""".stripMargin).as("rs"),
               count(lit(1)).as("n"))
          .withColumn("seasonal", col("rs") / col("n"))
          .select("event_type", "dow", "seasonal")
        t.join(broadcast(seas), Seq("event_type", "dow"))
          .select(col("event_type"), col("d"), col("daily"), col("trend"),
                  col("seasonal"), (col("resid") - col("seasonal")).as("remainder"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS tot
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, d, CAST(tot AS DOUBLE) AS daily,
             |    CAST(sum(tot) OVER w AS DOUBLE) / count(*) OVER w AS trend,
             |    isodow(d) - 1 AS dow
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |r AS (SELECT *, daily - trend AS resid FROM t),
             |sx AS (
             |  SELECT event_type, dow,
             |    list_sum(list(resid ORDER BY d)) / count(*) AS seasonal
             |  FROM r GROUP BY 1, 2)
             |SELECT r.event_type, r.d, r.daily, r.trend, sx.seasonal,
             |  r.resid - sx.seasonal AS remainder
             |FROM r JOIN sx ON r.event_type = sx.event_type AND r.dow = sx.dow
             |ORDER BY r.event_type, r.d""".stripMargin),
      note = "additive trend/seasonal/remainder decomposition: decimal-exact daily sums, centered MA trend, d-ordered residual fold for the weekday index; windows over the aggregated series only"),

    // Rolling Pearson correlation between each event type's daily volume
    // and the GLOBAL daily volume — the market-beta / co-movement shape
    // ("does this source's traffic track the corpus?"). Exactness across
    // engines comes from running the five inner moments (Σx, Σy, Σxy,
    // Σx², Σy²) as BIGINT window sums over fixed-point whole-unit series:
    // cents are summed exactly per day, floor-divided by 100 so the
    // squared terms stay far under 2^63 (budget: day-units ≈ 1.6e6 at
    // sf1 → n·Σx² ≈ 1.3e14; ~1000× headroom), and only the FINAL
    // r = (nΣxy−ΣxΣy)/(√(nΣx²−Σx²)·√(nΣy²−Σy²)) touches doubles — one
    // cast, two sqrts, one multiply, one divide, written identically on
    // both engines (IEEE-deterministic ops only; see the float-parity
    // rules the registry's other double outputs follow).
    //
    // Scale: the raw scan collapses to (#days × #types) rows in one
    // map-side-combined aggregation before ANY window runs; the trailing
    // ROWS 6 PRECEDING window and the day-total join both operate on the
    // aggregated series only — the same summary-window pattern as
    // w_seasonal_decompose, never a low-cardinality window over raw rows.
    Q("w_rolling_corr", Seq("W3", "A1", "A13", "F8", "§2.10"),
      (s, dir) => {
        val W = org.apache.spark.sql.expressions.Window
        val c = Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("day"),
                  expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val xt = c.groupBy("event_type", "day")
          .agg(expr("sum(c) div 100").as("x"))
        val yt = c.groupBy("day").agg(expr("sum(c) div 100").as("y"))
        val w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
        xt.join(yt, "day")
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum("x").over(w))
          .withColumn("sy", sum("y").over(w))
          .withColumn("sxy", sum(expr("x * y")).over(w))
          .withColumn("sxx", sum(expr("x * x")).over(w))
          .withColumn("syy", sum(expr("y * y")).over(w))
          .select(col("event_type"), col("day"), col("n"),
                  expr("""CAST(n * sxy - sx * sy AS DOUBLE) /
                         |nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                         |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0D)"""
                    .stripMargin).as("corr7"))
          .orderBy("event_type", "day")
      },
      Some("""WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |xt AS (SELECT event_type, day,
             |    CAST(sum(c) AS BIGINT) // 100 AS x FROM c GROUP BY 1, 2),
             |yt AS (SELECT day, CAST(sum(c) AS BIGINT) // 100 AS y
             |  FROM c GROUP BY 1),
             |j AS (SELECT event_type, xt.day, x, y
             |  FROM xt JOIN yt ON xt.day = yt.day),
             |wnd AS (SELECT event_type, day,
             |    count(*) OVER w AS n,
             |    CAST(sum(x) OVER w AS BIGINT) AS sx,
             |    CAST(sum(y) OVER w AS BIGINT) AS sy,
             |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
             |  FROM j
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT event_type, day, n,
             |  CAST(n * sxy - sx * sy AS DOUBLE) /
             |    nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |           sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0) AS corr7
             |FROM wnd ORDER BY event_type, day""".stripMargin),
      note = "trailing 7-day rolling Pearson r of per-type vs global daily volume: exact BIGINT moments over fixed-point units, doubles only in the final one-shot formula; windows over the aggregated series only"),

    // Gaps-and-islands: per-user CONSECUTIVE-DAY activity streaks — the
    // classic retention/engagement reshape and the run-length primitive
    // behind "active N days in a row" features. The island key is
    // d − dense_rank(d): constant inside a maximal consecutive-day run and
    // strictly shifted across any gap. dense_rank (not row_number over a
    // pre-distinct) lets the window run on the RAW event rows — duplicate
    // events on a day share a rank so the difference stays constant — which
    // saves the dedup's own (user_id, d) exchange; the island aggregate
    // then counts DISTINCT days for the streak length. All date/integer
    // arithmetic, bit-exact by construction. Scale: the one data-sized
    // stage is the per-user window (high-cardinality partition key), and
    // the (user_id, isl) aggregate reuses that clustering (user_id ⊆ the
    // group key satisfies the agg's distribution ⇒ no second exchange).
    Q("w_gap_islands", Seq("W1", "W2", "F6", "A10", "session"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("d")
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .withColumn("isl", date_sub(col("d"), dense_rank().over(w)))
          .groupBy("user_id", "isl")
          .agg(min("d").as("start_day"), max("d").as("end_day"),
               countDistinct("d").as("len_days"))
          .where(col("len_days") >= 3)
          .select("user_id", "start_day", "end_day", "len_days")
          .orderBy("user_id", "start_day")
      },
      Some("""WITH r AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d,
             |    dense_rank() OVER (PARTITION BY user_id
             |                       ORDER BY CAST(ts AS DATE)) AS rk
             |  FROM events),
             |g AS (SELECT user_id, d, d - CAST(rk AS INT) AS isl FROM r)
             |SELECT user_id, min(d) AS start_day, max(d) AS end_day,
             |  count(DISTINCT d) AS len_days
             |FROM g GROUP BY user_id, isl
             |HAVING count(DISTINCT d) >= 3
             |ORDER BY user_id, start_day""".stripMargin),
      note = "gaps-and-islands consecutive-day streaks via d − dense_rank(d) on raw rows (no pre-distinct shuffle); island agg reuses the user clustering; dates/integers only")
  )
}
