package graft.queries

/** Batch-equivalents of the engine's streaming operators (SURVEY §2.3
  * Q70–Q73). The engine runs these shapes as Structured Streaming
  * (`graft.streaming`); t2 verifies the batch semantics — tumbling/sliding
  * windows via Spark's `window()` expression (the exact operator streaming
  * uses), session windows as gaps-and-islands shared SQL.
  */
object StreamingBatch {

  private val E =
    """WITH e AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
      |user_id, event_type, value, props FROM events)""".stripMargin

  val all: Seq[QDef] = Seq(

    // Tumbling 1h window — engine uses the streaming-compatible window()
    // expression; oracle expresses the same bucketing as date_trunc.
    QDef.sql(
      "q70_tumbling_window",
      """SELECT unix_micros(window.start) AS ws, event_type, count(*) AS cnt,
        |       CAST(CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_v
        |FROM events GROUP BY window(ts, '1 hour'), event_type""".stripMargin,
      s"""$E
         |SELECT epoch_us(date_trunc('hour', ts)) AS ws, event_type, count(*) AS cnt,
         |       CAST(CAST(SUM(CAST(coalesce(value, 0) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS STRING) AS sum_v
         |FROM e GROUP BY 1, 2""".stripMargin),

    // Sliding 1h window, 30min hop: each event falls in exactly two windows.
    QDef.sql(
      "q71_sliding_window",
      """SELECT unix_micros(window.start) AS ws, count(*) AS cnt
        |FROM events GROUP BY window(ts, '1 hour', '30 minutes')""".stripMargin,
      s"""$E,
         |e2 AS (SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS w0 FROM e),
         |x AS (SELECT w0 AS ws FROM e2 UNION ALL SELECT w0 - 1800000000 FROM e2)
         |SELECT ws, count(*) AS cnt FROM x GROUP BY ws""".stripMargin),

    // Session windows (30-min gap) as gaps-and-islands — identical SQL text
    // modulo the epoch function; streaming twin is session_window().
    QDef.sql(
      "q72_session_window",
      """WITH e2 AS (SELECT user_id, event_id, unix_micros(ts) AS tus FROM events),
        |g AS (SELECT user_id, event_id, tus,
        |             CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |                    OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM e2),
        |s AS (SELECT user_id, tus,
        |             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |      FROM g)
        |SELECT user_id, sid, count(*) AS n_events,
        |       min(tus) AS start_us, max(tus) AS end_us
        |FROM s GROUP BY user_id, sid""".stripMargin,
      s"""$E,
         |e2 AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM e),
         |g AS (SELECT user_id, event_id, tus,
         |             CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
         |                    OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
         |                  THEN 1 ELSE 0 END AS brk
         |      FROM e2),
         |s AS (SELECT user_id, tus,
         |             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |      FROM g)
         |SELECT user_id, sid, count(*) AS n_events,
         |       min(tus) AS start_us, max(tus) AS end_us
         |FROM s GROUP BY user_id, sid""".stripMargin),

    // Exact dedup after synthetic duplication (streaming twin:
    // dropDuplicates("event_id") with watermark state).
    QDef.shared(
      "q73_dedup_exact",
      """SELECT count(*) AS total, count(DISTINCT event_id) AS uniq
        |FROM (SELECT event_id FROM events UNION ALL SELECT event_id FROM events) t""".stripMargin),

    // Funnel analysis: strictly-ordered step progression per user (first
    // view, first click AFTER that view, first purchase AFTER that click)
    // — the event-analytics staple. Each step is a grouped min over a
    // time-bounded join against the previous step; counts per step are the
    // funnel. No windows over all events per user — each stage shuffles by
    // user_id once.
    QDef.sql(
      "q74_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS step_view,
        |       (SELECT count(*) FROM c) AS step_click,
        |       (SELECT count(*) FROM p) AS step_purchase""".stripMargin,
      s"""$E,
         |v AS (SELECT user_id, min(ts) AS v_ts FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.ts) AS c_ts
         |      FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
         |      WHERE e.event_type = 'click' GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.ts) AS p_ts
         |      FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
         |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         |SELECT (SELECT count(*) FROM v) AS step_view,
         |       (SELECT count(*) FROM c) AS step_click,
         |       (SELECT count(*) FROM p) AS step_purchase""".stripMargin),

    // Weekly retention cohorts: per user the first-active week is the
    // cohort; report distinct active users per (cohort, week offset) — the
    // engagement matrix every product-analytics pipeline computes. Integer
    // epoch-week arithmetic on both engines.
    QDef.sql(
      "q74b_retention",
      """WITH w AS (SELECT user_id, unix_micros(ts) DIV 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id)
        |SELECT c.cohort, w.wk - c.cohort AS week_offset,
        |       CAST(count(DISTINCT w.user_id) AS BIGINT) AS active_users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY c.cohort, w.wk - c.cohort""".stripMargin,
      s"""$E,
         |w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM e),
         |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id)
         |SELECT c.cohort, w.wk - c.cohort AS week_offset,
         |       CAST(count(DISTINCT w.user_id) AS BIGINT) AS active_users
         |FROM w JOIN c ON w.user_id = c.user_id
         |GROUP BY c.cohort, w.wk - c.cohort""".stripMargin),

    // Event-type transition matrix (the Markov-chain view of user paths):
    // consecutive event pairs per user via lag over (ts, event_id), counted
    // per (prev, next). One per-user window partitioned by user_id — the
    // partition key carries the shuffle; no global window anywhere.
    QDef.sql(
      "q74c_transitions",
      """WITH t AS (SELECT user_id, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS prev_type
        |           FROM events)
        |SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,
      s"""$E,
         |t AS (SELECT user_id, event_type,
         |             lag(event_type) OVER (PARTITION BY user_id
         |               ORDER BY ts, event_id) AS prev_type
         |      FROM e)
         |SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS cnt
         |FROM t WHERE prev_type IS NOT NULL
         |GROUP BY prev_type, event_type""".stripMargin),

    // User-journey path mining (q74c's higher-order sibling): top-10
    // 3-step event-type paths across all users. Per-user ordered sequences
    // via sort_array(collect_list(struct(ts, event_id, type))) — state is
    // bounded by per-user event counts (at 100 TB a heavy-user cap or a
    // session_window pre-split bounds the group before collection); path
    // extraction is the windowless array-slice shingle.
    QDef.sql(
      "q74d_top_paths",
      """WITH u AS (SELECT user_id,
        |             transform(sort_array(collect_list(struct(ts, event_id, event_type))),
        |                       e -> e.event_type) AS types
        |           FROM events GROUP BY user_id),
        |p AS (SELECT explode(transform(sequence(1, size(types) - 2),
        |               i -> concat_ws('>', slice(types, i, 3)))) AS path
        |      FROM u WHERE size(types) >= 3)
        |SELECT path, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY path ORDER BY cnt DESC, path LIMIT 10""".stripMargin,
      s"""$E,
         |u AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
         |      FROM e GROUP BY user_id),
         |ix AS (SELECT types, unnest(range(1, len(types) - 1)) AS i
         |       FROM u WHERE len(types) >= 3),
         |p AS (SELECT array_to_string(list_slice(types, i, i + 2), '>') AS path FROM ix)
         |SELECT path, CAST(count(*) AS BIGINT) AS cnt
         |FROM p GROUP BY path ORDER BY cnt DESC, path LIMIT 10""".stripMargin),

    // Funnel time-to-convert: for users whose first purchase follows their
    // first view, the view→purchase latency distribution in exact epoch
    // micros — count, min, DISCRETE lower median (the (n+1) DIV 2-th
    // smallest — rank-based, engine-replayable, no interpolation; equal
    // values make the within-value tie order moot, so the oracle's
    // rank selection and the engine's cumulative-weight selection agree)
    // and max. Engine-side the median comes off Ranking.weightedQuantiles
    // (distributed prefix sum — no global window on the user-sized frame).
    QDef.df(
      "q74e_time_to_convert",
      s"""$E,
         |v AS (SELECT user_id, min(epoch_us(ts)) AS v_us FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
         |      FROM e JOIN v ON e.user_id = v.user_id
         |                    AND epoch_us(e.ts) > v.v_us
         |      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
         |d AS (SELECT p.user_id, p.p_us - v.v_us AS delta_us
         |      FROM p JOIN v ON p.user_id = v.user_id),
         |r AS (SELECT delta_us,
         |             row_number() OVER (ORDER BY delta_us, user_id) AS rn,
         |             count(*) OVER () AS ct
         |      FROM d)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_converted,
         |       (SELECT CAST(min(delta_us) AS BIGINT) FROM d) AS min_us,
         |       (SELECT CAST(delta_us AS BIGINT) FROM r
         |        WHERE rn = (ct + 1) // 2) AS med_us,
         |       (SELECT CAST(max(delta_us) AS BIGINT) FROM d) AS max_us""".stripMargin) {
      (s, _) =>
        import org.apache.spark.sql.functions._
        val ev = s.table("events").select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("v_us"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(v, Seq("user_id")).filter(col("us") > col("v_us"))
          .groupBy("user_id")
          .agg(min(col("us")).as("p_us"), min(col("v_us")).as("v_us"))
        val d = p.select((col("p_us") - col("v_us")).as("delta_us"))
        val med = graft.engine.Ranking.weightedQuantiles(
          d, col("delta_us"), lit(1L), Seq(500))
        d.agg(count(lit(1)).cast("bigint").as("n_converted"),
            min(col("delta_us")).cast("bigint").as("min_us"),
            max(col("delta_us")).cast("bigint").as("max_us"))
          .crossJoin(broadcast(med.select(col("p500").cast("bigint").as("med_us"))))
          .select(col("n_converted"), col("min_us"), col("med_us"), col("max_us"))
    }
  )
}
