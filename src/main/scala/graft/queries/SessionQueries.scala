package graft.queries

import graft.Q
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream temporal operators beyond the reference's own surface:
  * gap-based sessionization, as-of ("most recent prior") join, and the
  * zonal cascade as a custom typed Aggregator. All timestamps compare as
  * epoch microseconds (`unix_micros` ≙ DuckDB `epoch_us`) so ns-vs-µs
  * physical types can't skew anything.
  */
object SessionQueries {

  private val GapUs = 30L * 60 * 1000000 // 30-minute session gap

  def all: Seq[Q] = Seq(

    // Gap-based sessionization: a new session starts after a >30min silence;
    // running sum of session-start markers numbers the sessions.
    Q("w_sessionize", Seq("W1", "W2", "F6", "session"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
          .withColumn("is_new", when(col("gap").isNull || col("gap") > GapUs, 1).otherwise(0))
          .withColumn("sess_id", sum("is_new").over(run))
          .groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
               min("ts_us").as("start_us"),
               max("ts_us").as("end_us"),
               (max("ts_us") - min("ts_us")).as("duration_us"))
          .orderBy("user_id", "sess_id")
      },
      Some(s"""WITH g AS (
              |  SELECT user_id, epoch_us(ts) AS ts_us,
              |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
              |  FROM events),
              |m AS (SELECT user_id, ts_us,
              |    CAST(sum(CASE WHEN gap IS NULL OR gap > $GapUs THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY user_id ORDER BY ts_us
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
              |  FROM g)
              |SELECT user_id, sess_id, count(*) AS n_events,
              |  min(ts_us) AS start_us, max(ts_us) AS end_us,
              |  max(ts_us) - min(ts_us) AS duration_us
              |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // As-of join (the one join family Spark lacks natively): each purchase
    // is matched with the user's most recent PRIOR view — composed from an
    // ignore-nulls last_value over a preceding-rows frame, no custom
    // operator needed (preference order (a) of the builder contract).
    Q("j_asof_last_prior", Seq("asof", "J2", "W2"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"))
          .withColumn("prior_view_us",
            last(when(col("event_type") === "view", col("ts_us")), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("prior_view_us"),
                  (col("ts_us") - col("prior_view_us")).as("view_to_buy_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts_us, prior_view_us,
             |  ts_us - prior_view_us AS view_to_buy_us
             |FROM (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_us
             |  FROM events) t
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // The same as-of semantics as a NATIVE operator (preference order (c)):
    // custom LogicalPlan + SparkStrategy + merge-join SparkPlan
    // (graft.plans.AsOfJoinPlan). Two separate relations this time —
    // purchases probe the views table — the shape where the composed
    // window form would have to union both relations first. The physical
    // plan is shuffle-by-key + per-side (key,time) sort + one forward-only
    // merge pass; the oracle is the declarative spec (max prior per pair).
    Q("j_asof_native", Seq("asof", "J2", "§2.10"),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
                  unix_micros(col("ts")).as("ts_us"), col("event_type"))
        val purchases = e.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us")
        val views = e.where(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts_us").as("v_ts_us"))
        graft.plans.AsOfJoinPlan.join(
            purchases, views,
            keys = Seq("user_id" -> "v_user_id"), times = "ts_us" -> "v_ts_us")
          .select(col("event_id"), col("user_id"), col("ts_us"),
                  col("v_ts_us").as("prior_view_us"),
                  (col("ts_us") - col("v_ts_us")).as("view_to_buy_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
             |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT user_id AS v_user_id, ts_us AS v_ts_us FROM e WHERE event_type = 'view')
             |SELECT p.event_id, p.user_id, p.ts_us,
             |  max(v.v_ts_us) AS prior_view_us,
             |  p.ts_us - max(v.v_ts_us) AS view_to_buy_us
             |FROM p LEFT JOIN v ON v.v_user_id = p.user_id AND v.v_ts_us < p.ts_us
             |GROUP BY 1, 2, 3
             |ORDER BY event_id""".stripMargin),
      note = "native as-of: custom LogicalPlan/Strategy/SparkPlan merge join"),

    // As-of with TOLERANCE (pandas merge_asof(tolerance=...)): the prior
    // view must be at most 1 hour old or the purchase stays unmatched —
    // stale quotes become nulls instead of matching from arbitrarily far
    // back. Same native operator, bounded lookback.
    Q("j_asof_tolerance", Seq("asof", "J2", "F8", "§2.10"),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
                  unix_micros(col("ts")).as("ts_us"), col("event_type"))
        val purchases = e.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us")
        val views = e.where(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts_us").as("v_ts_us"))
        graft.plans.AsOfJoinPlan.join(
            purchases, views,
            keys = Seq("user_id" -> "v_user_id"), times = "ts_us" -> "v_ts_us",
            tolerance = Some(3600000000L)) // 1 hour in µs
          .select(col("event_id"), col("user_id"), col("ts_us"),
                  col("v_ts_us").as("prior_view_us"),
                  (col("ts_us") - col("v_ts_us")).as("view_to_buy_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
             |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT user_id AS v_user_id, ts_us AS v_ts_us FROM e WHERE event_type = 'view'),
             |m AS (SELECT p.event_id, p.user_id, p.ts_us, max(v.v_ts_us) AS prior_view_us
             |      FROM p LEFT JOIN v ON v.v_user_id = p.user_id AND v.v_ts_us < p.ts_us
             |      GROUP BY 1, 2, 3)
             |SELECT event_id, user_id, ts_us,
             |  CASE WHEN ts_us - prior_view_us <= 3600000000 THEN prior_view_us END AS prior_view_us,
             |  CASE WHEN ts_us - prior_view_us <= 3600000000 THEN ts_us - prior_view_us END AS view_to_buy_us
             |FROM m ORDER BY event_id""".stripMargin),
      note = "as-of with 1-hour tolerance: bounded lookback, stale quotes null out"),

    // CDC / log-compaction: per (user_id, event_type) keep only the LATEST
    // record — SCD-type-1 compaction, the shape every ingest pipeline runs
    // over change streams. One groupBy with max(struct(ts, event_id, ...))
    // — a single shuffle whose map-side combiner reduces each partition to
    // one row per key BEFORE the exchange, vs the window-sort form that
    // shuffles every version. struct ordering compares ts_us then event_id
    // (unique), so ties are deterministic and `value` never drives the
    // comparison. At 100 TB: shuffle volume = live keys, not history size.
    Q("cdc_latest_by_key", Seq("A11", "W4", "F9", "cdc"),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
          .groupBy("user_id", "event_type")
          .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("m"),
               count(lit(1)).as("n_versions"))
          .select(col("user_id"), col("event_type"),
                  col("m.ts_us").as("ts_us"), col("m.event_id").as("event_id"),
                  col("m.value").as("value"), col("n_versions"))
          .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, ts_us, event_id, value, n_versions FROM (
             |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
             |    count(*) OVER (PARTITION BY user_id, event_type) AS n_versions,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |                       ORDER BY ts DESC, event_id DESC) AS rk
             |  FROM events) t
             |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin),
      note = "log-compaction via max(struct): combiner-friendly single shuffle, no window sort"),

    // Ordered funnel (view → click → purchase): the product-analytics
    // sequence query. Stage k's entry time is the user's earliest stage-k
    // event AFTER their stage-(k−1) entry — three layered conditional
    // window minima over ONE user-partitioned shuffle (no joins, no
    // per-stage aggregation rounds). Epoch-µs integers end to end.
    Q("w_funnel_stages", Seq("session", "W2", "A11", "F1"),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("t1", min(when(col("event_type") === "view", col("ts_us"))).over(w))
          .withColumn("t2", min(when(col("event_type") === "click" &&
                                     col("ts_us") > col("t1"), col("ts_us"))).over(w))
          .withColumn("t3", min(when(col("event_type") === "purchase" &&
                                     col("ts_us") > col("t2"), col("ts_us"))).over(w))
          .where(col("t1").isNotNull)
          .select(col("user_id"), col("t1"), col("t2"), col("t3"),
                  (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
                          + when(col("t3").isNotNull, 1).otherwise(0)).as("reached_stage"))
          .distinct()
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
             |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
             |       FROM e GROUP BY 1),
             |s2 AS (SELECT e.user_id,
             |         min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END) AS t2
             |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
             |s3 AS (SELECT e.user_id,
             |         min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END) AS t3
             |       FROM e JOIN s2 USING (user_id) GROUP BY 1)
             |SELECT s1.user_id, t1, t2, t3,
             |  1 + CAST(t2 IS NOT NULL AS INTEGER) + CAST(t3 IS NOT NULL AS INTEGER) AS reached_stage
             |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
             |WHERE t1 IS NOT NULL ORDER BY user_id""".stripMargin),
      note = "3-stage ordered funnel: layered conditional window minima, one shuffle"),

    // Weekly cohort retention — the activation/retention matrix: users
    // cohort by the Monday week of their FIRST event; each active week
    // increments (cohort, offset). Distinct (user, offset) before the
    // count so a user's many events in a week count once. The per-user
    // origin is a window min (no join); integer week offsets.
    Q("w_cohort_retention", Seq("session", "A10", "A12", "W5"),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .withColumn("first_d", min("d").over(w))
          .select(col("user_id"),
                  to_date(date_trunc("week", col("first_d"))).as("cohort_week"),
                  expr("CAST(datediff(d, to_date(date_trunc('week', first_d))) div 7 AS INT)").as("week_offset"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH f AS (SELECT user_id, CAST(ts AS DATE) AS d,
             |    min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_d
             |  FROM events),
             |m AS (SELECT DISTINCT user_id,
             |    date_trunc('week', first_d) AS cohort_week,
             |    CAST(datediff('day', date_trunc('week', first_d), d) // 7 AS INTEGER) AS week_offset
             |  FROM f)
             |SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
             |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "weekly cohort x offset retention counts; window-min origin, no self-join"),

    // Corpus term statistics: top-20 terms by frequency with doc frequency.
    Q("text_term_freq", Seq("A12", "A10", "W4"),
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("df"))
          .orderBy(col("n").desc, col("tok"))
          .limit(20),
      Some("""SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS df
             |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
             |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // §2.10: the zonal cascade as a single custom typed Aggregator
    // (graft.agg.CascadeMean) — integer-cents buffer, so the partition
    // merge order can't perturb the mean; oracle = the same cascade in SQL.
    Q("j4_zonal_cascade_agg", Seq("§2.10", "J4", "A4", "A5"),
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
          .select((col("user_id") % 25).cast("int").as("zone_key"),
                  to_date(col("ts")).cast("string").as("d"),
                  col("value"), (col("value") >= 50).as("strict"))
          .as[(Int, String, Double, Boolean)]
        e.groupByKey(r => (r._1, r._2))
          .mapValues(r => (r._3, r._4))
          .agg(graft.agg.CascadeMean.toColumn.name("mean_value"))
          .map { case ((zone, d), m) => (zone, d, m) }
          .toDF("zone_key", "d", "mean_value")
          .select(col("zone_key"), col("d").cast("date").as("d"), col("mean_value"))
          .orderBy("zone_key", "d")
      },
      Some("""SELECT CAST(user_id % 25 AS INTEGER) AS zone_key, CAST(ts AS DATE) AS d,
             |  coalesce(
             |    CAST(sum(CASE WHEN value >= 50 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
             |      / nullif(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END), 0),
             |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS mean_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Snapshot diff — the other half of the CDC story next to
    // cdc_latest_by_key (log → state): given two table SNAPSHOTS, classify
    // every key as added/deleted/updated/unchanged and account the value
    // drift. One full-outer sort-merge join on the key — at 100 TB both
    // snapshots are bucketed on the key and the join runs co-located with
    // zero re-shuffle; the classification and the cents-scaled drift sum
    // are map-side. Snapshots are carved deterministically from orders
    // (v1 misses keys ≡0 mod 10 = inserts; v2 drops ≡0 mod 13 = deletes;
    // ≡0 mod 7 bumps the price = updates), so the oracle reproduces the
    // exact same diff.
    Q("cdc_snapshot_diff", Seq("cdc", "J1", "F1", "A12"),
      (s, dir) => {
        val v1 = Tables.orders(s, dir).where(col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p1"))
        val v2 = Tables.orders(s, dir).where(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("k"),
                  when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1)
                    .otherwise(col("o_totalprice")).as("p2"))
        v1.join(v2, Seq("k"), "full_outer")
          .withColumn("change_type",
            when(col("p1").isNull, "added")
              .when(col("p2").isNull, "deleted")
              .when(col("p1") =!= col("p2"), "updated")
              .otherwise("unchanged"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n"),
               sum(when(col("p1").isNotNull && col("p2").isNotNull,
                   expr("CAST(round((p2 - p1) * 100) AS BIGINT)")).otherwise(0L))
                 .as("delta_cents"))
          .orderBy("change_type")
      },
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS p1
             |            FROM orders WHERE o_orderkey % 10 <> 0),
             |v2 AS (SELECT o_orderkey AS k,
             |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
             |              ELSE o_totalprice END AS p2
             |       FROM orders WHERE o_orderkey % 13 <> 0),
             |d AS (SELECT coalesce(v1.k, v2.k) AS k, p1, p2,
             |        CASE WHEN p1 IS NULL THEN 'added'
             |             WHEN p2 IS NULL THEN 'deleted'
             |             WHEN p1 <> p2 THEN 'updated'
             |             ELSE 'unchanged' END AS change_type
             |      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
             |SELECT change_type, count(*) AS n,
             |  CAST(sum(CASE WHEN p1 IS NOT NULL AND p2 IS NOT NULL
             |                THEN CAST(round((p2 - p1) * 100) AS BIGINT)
             |                ELSE 0 END) AS BIGINT) AS delta_cents
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "full-outer snapshot diff with drift accounting; bucketed co-located join at scale"),

    // SCD Type-2 dimension build from the event log: per user, compress the
    // tracked attribute (event_type) into change rows, then close each
    // version with the next change's timestamp. One hash exchange on
    // user_id; the change filter preserves the sort, so the second window
    // (lead) rides the same exchange+sort — the whole dimension build is a
    // single shuffle however large the log grows. valid_to is NULL on the
    // open (current) version, warehouse-style.
    Q("cdc_scd2_intervals", Seq("cdc", "W2", "F6", "A11"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to_us", lead("ts_us", 1).over(w))
          .select(col("user_id"), col("event_type"),
                  col("ts_us").as("valid_from_us"), col("valid_to_us"),
                  col("valid_to_us").isNull.cast("int").as("is_current"))
          .orderBy("user_id", "valid_from_us")
      },
      Some("""WITH c AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_type,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM events),
             |k AS (SELECT user_id, ts_us, event_type FROM c
             |      WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type, ts_us AS valid_from_us,
             |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us,
             |  CAST(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
             |       AS INTEGER) AS is_current
             |FROM k ORDER BY user_id, valid_from_us""".stripMargin),
      note = "SCD2 dimension from the event log: change-compression + interval close, one shuffle, both windows share the exchange+sort"),

    // Nearest-in-time as-of (either direction): each purchase matches its
    // temporally closest view, before OR after, ties to the earlier one.
    // Composed from the interleaved-stream trick: one sort per user of the
    // merged view+purchase stream, a backward ignore-nulls last_value and a
    // forward ignore-nulls first_value, then a CASE pick — no join at all,
    // ONE exchange+sort for both directions. (The backward-only variants
    // are j_asof_last_prior / the native plan; this is the "nearest quote"
    // semantics time-series stores ship as asof NEAREST.) The (user_id, ts)
    // uniqueness canary in OpsSpec guarantees the interleave order is total.
    Q("j_asof_nearest", Seq("asof", "J2", "W2", "F8"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
        val e = Tables.events(s, dir)
          .where(col("event_type").isin("purchase", "view"))
          .select(col("event_id"), col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"),
                  when(col("event_type") === "view", unix_micros(col("ts"))).as("vts"))
        e.withColumn("prior_us", last("vts", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("next_us", first("vts", ignoreNulls = true)
            .over(w.rowsBetween(1, Window.unboundedFollowing)))
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"),
                  when(col("next_us").isNull ||
                       (col("prior_us").isNotNull &&
                        col("ts_us") - col("prior_us") <= col("next_us") - col("ts_us")),
                       col("prior_us")).otherwise(col("next_us")).as("nearest_view_us"))
          .withColumn("delta_us", col("nearest_view_us") - col("ts_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             |    CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS vts
             |  FROM events WHERE event_type IN ('purchase', 'view')),
             |m AS (SELECT event_id, user_id, event_type, ts_us,
             |    last_value(vts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_us,
             |    first_value(vts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_us
             |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
             |  FROM e)
             |SELECT event_id, user_id, ts_us,
             |  CASE WHEN next_us IS NULL OR (prior_us IS NOT NULL
             |            AND ts_us - prior_us <= next_us - ts_us)
             |       THEN prior_us ELSE next_us END AS nearest_view_us,
             |  CASE WHEN next_us IS NULL OR (prior_us IS NOT NULL
             |            AND ts_us - prior_us <= next_us - ts_us)
             |       THEN prior_us ELSE next_us END - ts_us AS delta_us
             |FROM m WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin),
      note = "nearest-either-direction as-of from one interleaved sort: backward + forward ignore-nulls windows, zero joins"),

    // Incremental view maintenance — the mechanism that makes a 100 TB
    // rolling aggregate affordable: the standing per-user stats snapshot is
    // NOT recomputed when a day of new events lands; the delta batch is
    // aggregated alone (cost ∝ delta, map-side partials) and merged into
    // the snapshot through one key-partitioned full-outer join of two
    // already-aggregated frames. count/sum are the mergeable-state partials
    // (the same property the sketch Aggregators rely on); integer cents
    // keep the merge bit-deterministic. The oracle recomputes the whole
    // aggregate from scratch — hash-equality IS the proof that
    // merge(agg(base), agg(delta)) == agg(base ∪ delta).
    Q("cdc_incremental_agg", Seq("cdc", "A1", "A12", "W5", "§2.9"),
      (s, dir) => {
        val cut = "2024-01-22"
        val e = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"))
        def aggSide(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        val base = aggSide(e.where(col("d") < lit(cut)))
          .select(col("user_id"), col("n").as("n_b"), col("sc").as("sc_b"))
        val delta = aggSide(e.where(col("d") >= lit(cut)))
          .select(col("user_id"), col("n").as("n_d"), col("sc").as("sc_d"))
        base.join(delta, Seq("user_id"), "full_outer")
          .select(col("user_id"),
                  (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_events"),
                  (coalesce(col("sc_b"), lit(0L)) + coalesce(col("sc_d"), lit(0L))).as("sum_cents"),
                  when(col("n_b").isNull, "delta_only")
                    .when(col("n_d").isNull, "base_only")
                    .otherwise("merged").as("src"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  CASE WHEN min(CAST(ts AS DATE)) >= DATE '2024-01-22' THEN 'delta_only'
             |       WHEN max(CAST(ts AS DATE)) < DATE '2024-01-22' THEN 'base_only'
             |       ELSE 'merged' END AS src
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "incremental aggregate maintenance: merge(agg(base), agg(delta)) hash-equals the oracle's from-scratch recompute; delta-proportional cost at scale"),

    // First-order Markov transition matrix over per-user event sequences —
    // the "what happens next" analytics primitive (next-action prediction,
    // journey analysis, bot detection). One user-partitioned window pass
    // orders each user's history ONCE (ties broken by event_id so both
    // engines see the same successor), lead(1) pairs each event with its
    // successor, and the (evt → next) census aggregates map-side. The
    // per-source row probability (permille, integer division — engine-
    // exact) is a window over the |event_types|² transition MATRIX, a
    // dimension-bounded frame, so everything after the census is O(types²)
    // no matter the row count; the finalizer sort rides the same bound.
    Q("mine_markov_transitions", Seq("session", "W2", "A1", "A13"),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type").as("evt"),
                  unix_micros(col("ts")).as("ts_us"))
          .withColumn("next_evt", lead("evt", 1).over(w))
          .where(col("next_evt").isNotNull)
          .groupBy("evt", "next_evt").agg(count(lit(1)).as("n"))
          .withColumn("p_pm", expr("n * 1000 div sum(n) OVER (PARTITION BY evt)"))
          .select("evt", "next_evt", "n", "p_pm")
          .transform(graft.core.Shape.boundedSort(_, "evt", "next_evt"))
      },
      Some("""WITH t AS (
             |  SELECT event_type AS evt,
             |    lead(event_type) OVER (PARTITION BY user_id
             |                           ORDER BY epoch_us(ts), event_id) AS next_evt
             |  FROM events),
             |c AS (SELECT evt, next_evt, count(*) AS n
             |      FROM t WHERE next_evt IS NOT NULL GROUP BY 1, 2)
             |SELECT evt, next_evt, n,
             |  n * 1000 // CAST(sum(n) OVER (PARTITION BY evt) AS BIGINT) AS p_pm
             |FROM c ORDER BY evt, next_evt""".stripMargin),
      note = "per-user lead(1) over one (ts,event_id)-ordered window pass, map-side census, permille rows over the bounded types² matrix — integer division, engine-exact"),

    // Length-2 sequential-pattern mining ("a happens before b", not
    // necessarily adjacent) — the PrefixSpan/SPAM first level, and the
    // third member of the mining trio: assoc pairs are UNORDERED
    // co-occurrence, markov transitions are ADJACENT-only order; this is
    // non-adjacent order. Per-user sequences collapse to each type's FIRST
    // occurrence (the standard sequence-mining containment semantics: a
    // user supports a→b iff some a precedes some b, ⟺ first(a) < some b
    // ⟺ first(a) < last(b); first-vs-first is the stricter "journey
    // starts with" variant both engines compute identically). The
    // first-occurrence census is |users|·|types| rows — the (user,evt)
    // min() aggregates map-side, the per-user re-key shuffles only the
    // census, and pair generation is a map-side explode of a
    // |types|-bounded list, O(types²) per user, never O(events²). Strict
    // `<` drops simultaneous first-occurrences — deterministic in both
    // engines without inventing a tie order. Support floor 5 users; the
    // user-count scalar rides a 1-row broadcast.
    Q("mine_seq_pairs", Seq("session", "A1", "A10", "F5"),
      (s, dir) => {
        val first = Tables.events(s, dir)
          .select(col("user_id"), col("event_type").as("evt"),
                  unix_micros(col("ts")).as("ts_us"))
          .groupBy("user_id", "evt").agg(min("ts_us").as("first_us"))
        val perUser = first.groupBy("user_id")
          .agg(collect_list(struct(col("evt"), col("first_us"))).as("fs"))
        val nTotal = perUser.agg(count(lit(1)).as("n_total"))
        perUser
          .select(explode(col("fs")).as("a"), col("fs"))
          .select(col("a"), explode(col("fs")).as("b"))
          .where(col("a.first_us") < col("b.first_us"))
          .groupBy(col("a.evt").as("a"), col("b.evt").as("b"))
          .agg(count(lit(1)).as("n_users"))
          .where(col("n_users") >= 5)
          .crossJoin(broadcast(nTotal))
          .select(col("a"), col("b"), col("n_users"),
                  expr("n_users * 1000 div n_total").as("support_pm"))
          .transform(graft.core.Shape.boundedSort(_, "a", "b"))
      },
      Some("""WITH f AS (SELECT user_id, event_type AS evt, min(epoch_us(ts)) AS first_us
             |           FROM events GROUP BY 1, 2),
             |p AS (SELECT a.evt AS a, b.evt AS b, count(*) AS n_users
             |      FROM f a JOIN f b
             |        ON a.user_id = b.user_id AND a.first_us < b.first_us
             |      GROUP BY 1, 2 HAVING count(*) >= 5),
             |t AS (SELECT count(DISTINCT user_id) AS n_total FROM events)
             |SELECT a, b, n_users, n_users * 1000 // t.n_total AS support_pm
             |FROM p CROSS JOIN t ORDER BY a, b""".stripMargin),
      note = "length-2 sequence mining over first-occurrence censuses: map-side (user,evt) min, one census re-key, types²-bounded map-side pair explode (no event-level self-join — the oracle formulates exactly that), permille support vs a 1-row user-count broadcast"),

    // OHLC bar resampling — the time-series downsample every metrics/market
    // pipeline runs: per (event_type, hour) the FIRST and LAST value plus
    // min/max/volume. High/low/volume/count are plain partial-aggregable
    // functions; open/close are ordered aggregates (min_by/max_by ≙ DuckDB
    // arg_min/arg_max), which keeps the whole bar ONE map-side-combining
    // groupBy — never a row_number window, whose per-(type,hour) sort would
    // shuffle and sort every event row at 100 TB. Neither engine's arg_min
    // takes a composite ordering key, and simultaneous timestamps are
    // GUARANTEED on the replicating scale-up (copies keep ts verbatim), so
    // the bar's event order is pinned as a zero-padded (ts_us, event_id)
    // string — fixed-width decimal, so lexicographic = numeric and both
    // engines pick the same event deterministically. CONTRACT: both key
    // parts must be non-negative (a '-' sign breaks the lexicographic =
    // numeric equivalence); Round11OpsSpec pins this against the fixture.
    // Values in exact cents.
    Q("w_ohlc_bars", Seq("session", "A1", "A12", "P3", "W1"),
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_type"),
                  expr("unix_micros(ts) div 3600000000").as("hour_id"),
                  expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("cents"),
                  expr("concat(lpad(CAST(unix_micros(ts) AS STRING), 19, '0'), '|', " +
                       "lpad(CAST(event_id AS STRING), 19, '0'))").as("ord"))
          .groupBy("event_type", "hour_id")
          .agg(expr("min_by(cents, ord)").as("open_c"),
               max("cents").as("high_c"),
               min("cents").as("low_c"),
               expr("max_by(cents, ord)").as("close_c"),
               count(lit(1)).as("n_events"),
               sum("cents").as("volume_c"))
          .transform(graft.core.Shape.boundedSort(_, "event_type", "hour_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
             |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
             |    lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0') || '|' ||
             |      lpad(CAST(event_id AS VARCHAR), 19, '0') AS ord
             |  FROM events)
             |SELECT event_type, hour_id, arg_min(cents, ord) AS open_c,
             |  max(cents) AS high_c, min(cents) AS low_c,
             |  arg_max(cents, ord) AS close_c, count(*) AS n_events,
             |  CAST(sum(cents) AS BIGINT) AS volume_c
             |FROM e GROUP BY 1, 2 ORDER BY event_type, hour_id""".stripMargin),
      note = "OHLC hourly bars in one map-side-combining groupBy: ordered open/close via min_by/max_by on a zero-padded (ts,event_id) key (deterministic under the scale-up's duplicated timestamps, no per-bar sort window), exact-cents high/low/volume")
  )
}
