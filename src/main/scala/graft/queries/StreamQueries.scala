package graft.queries

import graft.Q
import graft.streaming.StreamOps

/** Structured Streaming face of the engine (SURVEY.md §2.9): AvailableNow
  * tumbling-window aggregation with watermark over the events file source.
  * The batch result it drains is SQL-checkable, so it does carry an oracle.
  */
object StreamQueries {

  def all: Seq[Q] = Seq(
    Q("stream_window_agg", Seq("§2.9", "F6", "A1", "W1"),
      (s, dir) => StreamOps.windowedEventAgg(s, dir),
      Some("""SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "Trigger.AvailableNow over file source, 1-day tumbling windows + watermark"),

    Q("stream_sliding_windows", Seq("§2.9", "F6", "W1", "W2"),
      (s, dir) => StreamOps.slidingWindowAgg(s, dir),
      // each event belongs to the 3 one-day-stepped windows covering it
      Some("""SELECT CAST(date_trunc('day', ts) - k * INTERVAL 1 DAY AS DATE) AS w_start,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events, (SELECT unnest([0, 1, 2]) AS k)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "3-day windows sliding by 1 day: 3x overlapping state entries per key, complete mode; oracle replays the 3-window assignment batch-side"),

    Q("stream_append_complete_windows", Seq("§2.9", "F6", "W1"),
      (s, dir) => StreamOps.appendCompleteWindows(s, dir),
      // only windows whose end the watermark (max ts − 1 day) has passed
      Some("""WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events)
             |SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT wm FROM m)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "append mode + watermark withholds incomplete trailing windows (F6)"),

    Q("stream_forage_periods", Seq("§2.9", "W1", "F6", "§2.10"),
      (s, dir) => StreamOps.foragePeriodStream(s, dir),
      // the same calendar + completeness rule, arithmetically: periods from
      // 2024-01-01 are [01-01..01-16], [01-17..02-01]; watermark = max event
      // date − 1 day, so only fully-elapsed periods survive
      Some("""WITH e AS (SELECT CAST(ts AS DATE) AS d, event_type, value FROM events),
             |p AS (SELECT CASE WHEN d <= DATE '2024-01-16' THEN DATE '2024-01-16'
             |                  ELSE DATE '2024-02-01' END AS p_end,
             |             event_type, value, d
             |      FROM e),
             |wm AS (SELECT max(CAST(ts AS DATE)) - 1 AS w FROM events)
             |SELECT p_end, event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM p WHERE p_end <= (SELECT w FROM wm)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      note = "custom forage_period_end Expression inside a streaming aggregation"),

    Q("stream_kmv_distinct", Seq("§2.9", "A12", "§2.10", "sampling"),
      (s, dir) => StreamOps.windowedKmvDistinct(s, dir),
      Some {
        val h = graft.dedup.Hashing.duckMd5Mod("CAST(user_id AS VARCHAR)")
        val P = graft.dedup.Hashing.P
        s"""WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
           |e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events
           |      WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT wm FROM m)),
           |n AS (SELECT d, count(*) AS n_events FROM e GROUP BY 1),
           |hx AS (SELECT DISTINCT d, $h AS h FROM e),
           |r AS (SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rk,
           |        count(*) OVER (PARTITION BY d) AS dd FROM hx),
           |est AS (SELECT d,
           |    CASE WHEN max(dd) < 64 THEN CAST(max(dd) AS DOUBLE)
           |         ELSE 63.0 * $P.0 / CAST(max(CASE WHEN rk = 64 THEN h END) AS DOUBLE)
           |    END AS e
           |  FROM r GROUP BY 1)
           |SELECT n.d, n.n_events, round(est.e, 6) AS kmv_users
           |FROM n JOIN est USING (d) ORDER BY d""".stripMargin
      },
      note = "mergeable KMV sketch inside a streaming window agg (bounded state where countDistinct is unsupported); deterministic, oracle-checked"),

    Q("stream_static_enrich", Seq("§2.9", "J1", "A1", "cdc"),
      (s, dir) => StreamOps.streamStaticEnrich(s, dir),
      Some("""WITH nc AS MATERIALIZED (SELECT count(*) AS n_cust FROM customer)
             |SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events e CROSS JOIN nc
             |JOIN customer c ON c.c_custkey = e.user_id % n_cust + 1
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "stream-static broadcast enrichment join: stateless, dim re-broadcast per batch"),

    Q("stream_stream_interval_join", Seq("§2.9", "J2", "F1", "F8"),
      (s, dir) => StreamOps.streamStreamIntervalJoin(s, dir),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
             |p AS (SELECT event_id AS p_id, user_id, t_us AS p_us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT event_id AS v_id, user_id AS v_user, t_us AS v_us FROM e WHERE event_type = 'view')
             |SELECT p_id, v_id, user_id, p_us, v_us
             |FROM p JOIN v ON user_id = v_user AND v_us >= p_us - 3600000000 AND v_us < p_us
             |ORDER BY p_id, v_id""".stripMargin),
      note = "two watermarked streams, interval condition bounds join state"),

    // LEFT OUTER flavor: the null-extended row for a view-less purchase is
    // emitted by state EVICTION — only once the global watermark (min over
    // both inputs of max event time − 1 day) proves no matching view can
    // still arrive. The oracle replays that rule in batch: a purchase
    // appears if it matched (n_views > 0) or its timestamp has fallen
    // behind the final watermark; trailing-day unmatched purchases are
    // withheld, the streaming analog of the complete-window rule.
    Q("stream_interval_left_outer", Seq("§2.9", "J2", "F7", "F8"),
      (s, dir) => StreamOps.streamStreamLeftOuterJoin(s, dir),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
             |p AS (SELECT event_id AS p_id, user_id, t_us AS p_us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT event_id AS v_id, user_id AS v_user, t_us AS v_us FROM e WHERE event_type = 'view'),
             |wm AS (SELECT least((SELECT max(p_us) FROM p), (SELECT max(v_us) FROM v))
             |         - 86400000000 AS w),
             |m AS (SELECT p_id, p.user_id, p_us, count(v_id) AS n_views
             |      FROM p LEFT JOIN v
             |        ON p.user_id = v_user AND v_us >= p_us - 3600000000 AND v_us < p_us
             |      GROUP BY 1, 2, 3)
             |SELECT p_id, user_id, p_us, n_views FROM m, wm
             |WHERE n_views > 0 OR p_us < w
             |ORDER BY p_id""".stripMargin),
      note = "stream-stream LEFT OUTER interval join: watermark eviction emits the null rows"),

    // FULL OUTER completes the streaming join-mode matrix. The two sides
    // evict on different horizons — a purchase is final when the watermark
    // passes p_t (its match window points backward), a view only when it
    // passes v_t + 1h (a later purchase could still claim it) — and the
    // oracle replays both horizons against the final watermark.
    Q("stream_interval_full_outer", Seq("§2.9", "J2", "F7", "F8"),
      (s, dir) => StreamOps.streamStreamFullOuterJoin(s, dir),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
             |p AS (SELECT event_id AS p_id, user_id, t_us AS p_us FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT event_id AS v_id, user_id AS v_user, t_us AS v_us FROM e WHERE event_type = 'view'),
             |wm AS (SELECT least((SELECT max(p_us) FROM p), (SELECT max(v_us) FROM v))
             |         - 86400000000 AS w),
             |mp AS (SELECT p_id, p_us, count(v_id) AS n_matches
             |       FROM p LEFT JOIN v
             |         ON p.user_id = v_user AND v_us >= p_us - 3600000000 AND v_us < p_us
             |       GROUP BY 1, 2),
             |mv AS (SELECT v_id, v_us, count(p_id) AS n_matches
             |       FROM v LEFT JOIN p
             |         ON p.user_id = v_user AND v_us >= p_us - 3600000000 AND v_us < p_us
             |       GROUP BY 1, 2)
             |SELECT side, event_id, t_us, n_matches FROM (
             |  SELECT 'p' AS side, p_id AS event_id, p_us AS t_us, n_matches
             |  FROM mp, wm WHERE n_matches > 0 OR p_us < w
             |  UNION ALL
             |  SELECT 'v' AS side, v_id AS event_id, v_us AS t_us, n_matches
             |  FROM mv, wm WHERE n_matches > 0 OR v_us + 3600000000 < w)
             |ORDER BY side, event_id""".stripMargin),
      note = "stream-stream FULL OUTER interval join: asymmetric eviction horizons per side"),

    Q("stream_dedup_fingerprint", Seq("§2.9", "dedup", "A10"),
      (s, dir) => StreamOps.streamingDedup(s, dir),
      Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |  min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      note = "streaming ingest dedup: fingerprint-keyed min/count state, AvailableNow drain"),

    Q("stream_dedup_within_watermark", Seq("§2.9", "dedup", "A10", "F6"),
      (s, dir) => StreamOps.streamingDedupWithinWatermark(s, dir),
      // single-batch drain ⇒ no state expires mid-run ⇒ equals batch DISTINCT
      Some("""SELECT d, count(*) AS n_keys FROM (
             |  SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS d FROM events)
             |GROUP BY d ORDER BY d""".stripMargin),
      note = "dropDuplicatesWithinWatermark: state TTL'd by the event-time watermark — O(horizon) state, not O(all-time keys); re-admission after expiry pinned in DedupStreamSpec"),

    Q("stream_session_window", Seq("§2.9", "session", "F6", "W1"),
      (s, dir) => StreamOps.sessionWindowAgg(s, dir),
      // batch equivalent: gap sessionization (new session at gap >= 30min —
      // session windows are half-open [ts, ts+gap)), session end = last
      // event + gap, emitted only when the watermark (max ts − 1 day)
      // has passed the end
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
             |  FROM events),
             |m AS (SELECT user_id, ts_us,
             |    CAST(sum(CASE WHEN gap IS NULL OR gap >= 1800000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts_us
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM g),
             |s AS (SELECT user_id, sess_id, min(ts_us) AS start_us,
             |        max(ts_us) + 1800000000 AS end_us, count(*) AS n_events
             |      FROM m GROUP BY 1, 2),
             |wm AS (SELECT max(epoch_us(ts)) - 86400000000 AS w FROM events)
             |SELECT user_id, start_us, end_us, n_events
             |FROM s WHERE end_us <= (SELECT w FROM wm)
             |ORDER BY user_id, start_us""".stripMargin),
      note = "native session_window + watermark: sessions emitted on close (append mode)"),

    Q("stream_stateful_watermark", Seq("§2.9", "A11", "W3"),
      (s, dir) => StreamOps.statefulUserWatermark(s, dir),
      Some("""SELECT user_id, count(*) AS n_events,
             |  min(CAST(ts AS DATE)) AS first_d, max(CAST(ts AS DATE)) AS last_d
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      note = "flatMapGroupsWithState custom per-key state, AvailableNow drain"),

    Q("stream_tws_user_stats", Seq("§2.9", "§2.10", "A12", "cdc"),
      (s, dir) => StreamOps.transformWithStateUserStats(s, dir),
      Some("""SELECT user_id, count(*) AS n_events,
             |  count(DISTINCT event_type) AS n_types,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      note = "transformWithState (Spark 4 API): named ValueState+MapState on RocksDB store"),

    Q("stream_cdc_upsert", Seq("§2.9", "cdc", "A11", "F9"),
      (s, dir) => StreamOps.streamingCdcUpsert(s, dir),
      Some("""SELECT user_id, event_type, ts_us, event_id, value, n_versions FROM (
             |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
             |    count(*) OVER (PARTITION BY user_id, event_type) AS n_versions,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |                       ORDER BY ts DESC, event_id DESC) AS rk
             |  FROM events) t
             |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin),
      note = "streaming log-compaction upsert: keyed max-by-version state, snapshot equals batch cdc_latest_by_key"),

    // Output produced by EVENT-TIME TIMERS, not by arriving rows: the one
    // transformWithState capability the rest of the family leaves
    // unexercised. A user's session row is emitted only when the watermark
    // passes last-event + 30 min — users active inside the trailing
    // watermark day stay open and are withheld (F6 for keyed state). The
    // oracle replays the timer rule in batch arithmetic: Spark tracks the
    // watermark in MILLISECONDS (floor of the max event time), so the
    // cutoff is floor(max_us/1000) − 1 day, and a timer fires when its
    // expiry ms is AT OR below it — the comparison is inclusive (<=),
    // measured by TimerStreamSpec's expiry-==-watermark probe (round-9
    // boundary pin; the oracle originally assumed strict <).
    Q("stream_tws_session_timers", Seq("§2.9", "§2.10", "session", "F6", "A11"),
      (s, dir) => StreamOps.sessionTimerClose(s, dir),
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |            max(epoch_us(ts)) AS last_us
             |          FROM events GROUP BY 1),
             |wm AS (SELECT max(epoch_us(ts)) // 1000 - 86400000 AS w FROM events)
             |SELECT user_id, n_events, last_us, last_us // 1000 + 1800000 AS fired_ms
             |FROM u, wm WHERE last_us // 1000 + 1800000 <= w
             |ORDER BY user_id""".stripMargin),
      note = "transformWithState EVENT-TIME TIMERS on RocksDB state: per-user session close emitted by timer expiry (registerTimer/deleteTimer/handleExpiredTimer), not by row arrival; drain keeps the no-data batch because the watermark advance IS the output trigger"),

    Q("stream_minhash_lsh_ingest", Seq("§2.9", "dedup", "J2", "§2.10"),
      (s, dir) => StreamOps.streamingMinhashLshIngest(s, dir),
      Some(DedupQueries.duckMinhashLshSql),
      note = "streaming near-dup dedup at ingest: map-side minhash signatures, keyed band-bucket state emits collisions on arrival; shares the batch LSH oracle (stream/batch parity)")
  )
}
