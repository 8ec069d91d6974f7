package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, Det}

/** Batch-equivalent forms of the streaming surface (SURVEY.md §2.9 /
  * §2.11 "Streaming" row). The same transforms run as true
  * `readStream` queries in `StreamingPipelineSpec`; here they execute
  * in batch mode over `events` so the DuckDB oracle can hash-match
  * them (wall-clock-free, deterministic).
  *
  * `window()` / `session_window()` are the exact operators a streaming
  * query would use — batch execution exercises identical Catalyst
  * plans minus the watermark-driven state eviction.
  */
object StreamEquivQueries {
  private type Q = (SparkSession, String) => DataFrame
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- tumbling event-time window ----
    "q36_tumbling_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),
    // ---- sliding event-time window (1h window, 30m slide) ----
    "q37_sliding_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("window_start"), col("n"), col("n_users"))
        .orderBy(col("window_start"))
    }),
    // ---- session window (10-minute gap) ----
    "q38_session_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),
    // ---- CDC apply: latest state by key (the upsert-materialize op) ----
    "q39_latest_by_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), dround(col("value"), 6).as("last_value"))
        .orderBy(col("user_id"))
    }),
    // ---- latency percentiles (§2.4 A7: p50/p95/p99, exact) ----
    "q56_percentiles" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          dround(expr("percentile(value, 0.5)"), 6).as("p50"),
          dround(expr("percentile(value, 0.95)"), 6).as("p95"),
          dround(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    // ---- as-of join: each click matched to the user's latest prior
    //      (or simultaneous) view — the point-in-time join Spark has no
    //      native operator for. Composed as union-tag + running
    //      last(ignoreNulls): ONE shuffle on the key, rows stream
    //      through a single window pass — the formulation that survives
    //      100 TB, vs. the naive l.ts >= r.ts range join whose pair
    //      space explodes per key. At equal ts the view sorts first
    //      (side 0 < side 1), giving ASOF's inclusive bound. ----
    "q75_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
          lit(null).cast("long").as("r_event_id"),
          lit(null).cast("timestamp").as("r_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("long").as("event_id"),
          col("event_id").as("r_event_id"), col("ts").as("r_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("r_event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(views)
        .withColumn("view_id", last(col("r_event_id"), ignoreNulls = true).over(w))
        .withColumn("view_ts", last(col("r_ts"), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("view_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }),
    // ---- sequential conversion funnel: users advancing through
    //      signup → view → click → purchase in strict event-time order
    //      (each stage's event must be AFTER the user's previous-stage
    //      entry). Four user-keyed aggregations, each joining the
    //      shrinking survivor set on the same key — co-partitioned
    //      hash joins, no per-pair time join. ----
    "q76_funnel" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      def next(prev: DataFrame, prevTs: String, typ: String, out: String): DataFrame =
        ev.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs))
          .groupBy(col("user_id")).agg(min(col("ts")).as(out))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = next(s1, "t1", "view", "t2")
      val s3 = next(s2, "t2", "click", "t3")
      val s4 = next(s3, "t3", "purchase", "t4")
      Seq(("1_signup", s1), ("2_view", s2), ("3_click", s3), ("4_purchase", s4))
        .map { case (name, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
        }
        .reduce(_.unionByName(_))
        .orderBy(col("stage"))
    }),
    // ---- streaming dedup (dropDuplicates semantics, first-by-time) ----
    "q40_dedup_first" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))
    })
  )

  private val S = dsumSql
  private val R = droundSql

  val oracle: Map[String, String] = Map(
    "q36_tumbling_window" -> s"""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        count(*) AS n, ${S("value", 4)} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type""",
    // sliding window = each event lands in exactly two 30-min-aligned
    // 1-hour windows: bucket(30m, ts) and bucket(30m, ts) - 30m
    "q37_sliding_window" -> """
      SELECT window_start, count(*) AS n, count(DISTINCT user_id) AS n_users
      FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, user_id FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', user_id FROM events)
      GROUP BY 1
      ORDER BY window_start""",
    // session window: gaps-and-islands; new session when gap >= 10 min
    "q38_session_window" -> s"""
      SELECT user_id, min(ts) AS session_start,
        count(*) AS n_events, ${S("value", 4)} AS session_value
      FROM (
        SELECT user_id, ts, value,
          sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      >= INTERVAL '10 minutes'
                 THEN 1 ELSE 0 END AS new_sess
          FROM events))
      GROUP BY user_id, sess_id
      ORDER BY user_id, session_start""",
    "q39_latest_by_key" -> s"""
      SELECT user_id, last_event_id, last_type, last_value FROM (
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
          ${R("value", 6)} AS last_value,
          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id""",
    "q56_percentiles" -> s"""
      SELECT event_type,
        ${R("quantile_cont(value, 0.5)", 6)} AS p50,
        ${R("quantile_cont(value, 0.95)", 6)} AS p95,
        ${R("quantile_cont(value, 0.99)", 6)} AS p99,
        count(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    // DuckDB's native ASOF JOIN is the oracle for the composed
    // union-tag formulation (inclusive bound l.ts >= r.ts)
    "q75_asof_join" -> """
      SELECT l.event_id, l.user_id, r.event_id AS view_id,
        epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'click') l
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id""",
    "q76_funnel" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id),
      s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id)
      SELECT stage, n_users FROM (
        SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT '2_view', count(*) FROM s2
        UNION ALL SELECT '3_click', count(*) FROM s3
        UNION ALL SELECT '4_purchase', count(*) FROM s4)
      ORDER BY stage""",
    "q40_dedup_first" -> """
      SELECT user_id, event_type, first_event_id FROM (
        SELECT user_id, event_type, event_id AS first_event_id,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type"""
  )
}
