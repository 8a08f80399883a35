package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.{Joins, Sessionize}
import graft.sources.Tables

/** Event-stream capabilities over the `events` table: JSON extraction
  * (SURVEY §2.9 C9 — the reference's `json.loads` of page-data,
  * lianjia.py:54,114,174), event-time windows, sessionization, and the
  * as-of join (§2.4). All batch-mode; the windowing constructs
  * (`window`, `session_window`) are the same ones Structured Streaming
  * uses, so these queries are streaming-ready by construction.
  */
object EventQueries {

  /** JSON prop extraction + aggregation. `get_json_object` ↔ DuckDB
    * `json_extract_string`. */
  val q18JsonProps = Q(
    "q18_json_props",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Tumbling event-time windows (batch mode). `window(ts, '1 hour')`
    * aligns to the epoch, so its start equals `date_trunc('hour', ts)`. */
  val q19HourlyAgg = Q(
    "q19_hourly_agg",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM events
      |WHERE event_type IN ('purchase', 'error')
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Sliding windows: 2-hour window sliding by 1 hour — each event lands
    * in exactly 2 windows. Oracle reproduces via explicit double-count. */
  val q20SlidingAgg = Q(
    "q20_sliding_agg",
    """SELECT w_start, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
      |FROM (
      |  SELECT ts, value, date_trunc('hour', ts) AS w_start FROM events
      |  UNION ALL
      |  SELECT ts, value, date_trunc('hour', ts) - INTERVAL 1 HOUR AS w_start FROM events) t
      |WHERE w_start >= TIMESTAMP '2024-01-01 00:00:00'
      |GROUP BY w_start
      |ORDER BY w_start""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(window(col("ts"), "2 hours", "1 hour").as("w"), col("value"))
      .select(col("w.start").as("w_start"), col("value"))
      .filter(col("w_start") >= lit("2024-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("w_start"))
  }

  /** Sessionization with a 30-minute gap: sessions per user.
    * Spark side uses the built-in `session_window`; the oracle rebuilds
    * sessions with lag + cumulative sum. Split rule is strictly
    * gap > 30 min: session_window merges an event landing exactly at
    * prev+gap (verified in SessionizeSpec). */
  val q21Sessions = Q(
    "q21_sessions",
    """WITH gaps AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM gaps GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Sessionize.sessionWindows(Tables.events(spark, dir),
        col("user_id"), col("ts"), "30 minutes")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** As-of join (SURVEY §2.4): each purchase gets the value of the same
    * user's latest strictly-prior view event. Oracle uses DuckDB's native
    * ASOF JOIN; the Spark plan is Joins.asOf's single-shuffle union+window. */
  val q22AsofViewPurchase = Q(
    "q22_asof_view_purchase",
    """SELECT p.event_id, p.user_id, round(p.value, 2) AS purchase_value,
      |  round(v.value, 2) AS prior_view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND v.ts < p.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
    val views = events.filter(col("event_type") === "view").select("user_id", "ts", "value")
    Joins.asOf(purchases, views, key = "user_id", ts = "ts", payload = Seq("value"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("purchase_value"),
        round(col("asof_value"), 2).as("prior_view_value"))
      .orderBy(col("event_id"))
  }

  /** Map-typed column surface: props parsed into MAP<STRING,BIGINT>,
    * read with element_at / map_keys (q18 reads the same JSON with
    * string-path extraction — this is the typed-map path). */
  val q50MapFuncs = Q(
    "q50_map_funcs",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |  CAST(max(len(json_keys(props))) AS INT) AS max_keys
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.{MapType, StringType, LongType}
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("m"), "k")), 4).as("avg_k"),
        max(size(map_keys(col("m")))).cast("int").as("max_keys"))
      .orderBy(col("event_type"))
  }

  /** Batch interval join (time-window theta join): views within the 30
    * minutes before each purchase, same user. Distinct from q15 (value
    * bands) and q22 (as-of nearest-prior): this is the bounded-window
    * COUNT shape. The equi-key (user_id) carries the shuffle; the time
    * bounds are post-join filters — at scale the join stays a plain
    * sort-merge on user, never a cross product. Batch twin of
    * StreamOps.intervalJoin. */
  val q52IntervalJoin = Q(
    "q52_interval_join",
    """SELECT p.event_id, CAST(count(v.event_id) AS BIGINT) AS n_prior_views
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      |  AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts < p.ts
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val p = events.filter(col("event_type") === "purchase").alias("p")
    val v = events.filter(col("event_type") === "view").alias("v")
    p.join(v,
        col("p.user_id") === col("v.user_id") &&
          col("v.ts") >= col("p.ts") - expr("INTERVAL 30 MINUTES") &&
          col("v.ts") < col("p.ts"),
        "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(count(col("v.event_id")).as("n_prior_views"))
      .orderBy(col("event_id"))
  }

  /** Funnel analysis: users progressing view → click → purchase, by
    * first-occurrence ordering. One conditional-min aggregation per
    * stage — a single shuffle on user_id, no joins, no window — the
    * shape that holds at any event volume. NULL stage times drop out of
    * the < comparisons identically in both engines. */
  val q62Funnel = Q(
    "q62_funnel",
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS n_view,
      |  CAST(count(CASE WHEN t_view < t_click THEN 1 END) AS BIGINT) AS n_view_click,
      |  CAST(count(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END)
      |    AS BIGINT) AS n_full_funnel
      |FROM f""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(when(col("t_view").isNotNull, 1)).as("n_view"),
        count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
        count(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1))
          .as("n_full_funnel"))
  }

  /** Cohort retention: users grouped by first-active week, activity
    * counted per week offset. The cohort label is a window min over
    * user — ONE shuffle (by user) instead of the aggregate-then-join
    * shape's two. Week truncation is Monday-start in both engines. */
  val q63Retention = Q(
    "q63_retention",
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
      |lab AS (SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS cw FROM act)
      |SELECT cw AS cohort_week, CAST((w - cw) / 7 AS INT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM lab
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val act = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    act
      .withColumn("cw", min(col("w")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("w"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Forward as-of: the next view AFTER each purchase (post-purchase
    * re-engagement) — q22's mirror, same one-shuffle union+window plan
    * via Joins.asOfNext, vs DuckDB ASOF with the reversed inequality. */
  val q65AsofNextView = Q(
    "q65_asof_next_view",
    """SELECT p.event_id, p.user_id,
      |  round(v.value, 2) AS next_view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND v.ts > p.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
    val views = events.filter(col("event_type") === "view").select("user_id", "ts", "value")
    Joins.asOfNext(purchases, views, key = "user_id", ts = "ts", payload = Seq("value"))
      .select(col("event_id"), col("user_id"),
        round(col("asofnext_value"), 2).as("next_view_value"))
      .orderBy(col("event_id"))
  }

  /** Gap-filled hourly series: the dense (hour × event_type) grid with
    * zero-filled counts — the resample step every time-series consumer
    * needs before charting/joining. The hour spine derives from a 1-row
    * min/max aggregate (bounded → safe to hint-broadcast); the grid is
    * spine × distinct-types, then a left join fills observed counts.
    * At 100 TB the spine is still only span-hours rows — the only
    * full-scan work is the same grouped count q19 does. */
  val q71GapfillHourly = Q(
    "q71_gapfill_hourly",
    """WITH bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      |  FROM events),
      |hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM events),
      |counts AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT t.event_type AS event_type, h.hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |FROM types t CROSS JOIN hours h
      |LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type
      |ORDER BY t.event_type, h.hour""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val spine = ev
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    types.crossJoin(broadcast(spine))
      .join(counts.withColumnRenamed("hour", "c_hour")
          .withColumnRenamed("event_type", "c_type"),
        col("hour") === col("c_hour") && col("event_type") === col("c_type"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Event-transition matrix: for each user's time-ordered stream,
    * count (event → next event) pairs — the path-analysis primitive
    * behind sankey/markov views. One shuffle on user_id; the lead()
    * window sorts within partitions only. */
  val q72Transitions = Q(
    "q72_transitions",
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |FROM seq
      |WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Volume-anomaly detection: z-score every (event_type, hour) count
    * against that type's own hourly mean/stddev, surface the 3 most
    * anomalous hours per type. Two window-free aggregations plus one
    * type-keyed window — the classic monitoring query, exact on both
    * engines (sample stddev, deterministic tiebreak on the hour). */
  val q86VolumeAnomalies = Q(
    "q86_volume_anomalies",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
      |  FROM hourly GROUP BY event_type),
      |z AS (
      |  SELECT h.event_type, h.h, h.n,
      |    (h.n - s.mu) / s.sigma AS zs
      |  FROM hourly h JOIN stats s ON h.event_type = s.event_type),
      |ranked AS (
      |  SELECT event_type, h, n, zs,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(zs) DESC, h) AS rk
      |  FROM z)
      |SELECT event_type, CAST(rk AS INT) AS rk, h AS hour_start,
      |  CAST(n AS BIGINT) AS n, round(zs, 4) + 0.0 AS z
      |FROM ranked WHERE rk <= 3
      |ORDER BY event_type, rk""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(avg(col("n")).as("mu"), stddev_samp(col("n")).as("sigma"))
    val w = Window.partitionBy(col("event_type")).orderBy(abs(col("zs")).desc, col("h"))
    hourly.join(stats, "event_type")
      .withColumn("zs", (col("n") - col("mu")) / col("sigma"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("h").as("hour_start"),
        col("n"), Q.noNegZero(round(col("zs"), 4)).as("z"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** SCD2 (slowly-changing-dimension type 2) history build — the
    * warehouse temporal pattern: collapse each user's event-type stream
    * into validity intervals [valid_from, valid_to) with an is_current
    * flag on the open one. Gaps-and-islands WITHOUT the groupBy: a run
    * is identified by its first row (lag change test), valid_to is the
    * NEXT run's start (lead) — so both window passes ride ONE user_id
    * exchange and ONE (ts, event_id) sort; a groupBy(user, run) would
    * add a second exchange on the wider key. Deterministic under ts
    * ties via the event_id tiebreak. */
  val q87Scd2Intervals = Q(
    "q87_scd2_intervals",
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from, event_id
      |  FROM o WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id, state, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id
      |      ORDER BY valid_from, event_id) AS valid_to
      |  FROM s)
      |SELECT user_id, state, valid_from, valid_to,
      |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      |FROM iv ORDER BY user_id, valid_from""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(byUser).as("valid_to"))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Top clickstream paths — full-path analytics over gap sessions
    * (q72's transition matrix is the 2-gram marginal of this): each
    * session's ordered event-type sequence becomes one path string, then
    * paths are counted corpus-wide. The ORDERED aggregation is the
    * interesting surface: Spark has no `string_agg(... ORDER BY)`, so
    * determinism comes from sorting `struct(ts, event_id, type)` — a
    * struct array sorts lexicographically by field position, making the
    * tiebreak explicit — INSIDE the collected array, not from collect
    * order (collect_list is partition-order-dependent). One user_id
    * exchange covers sessionization and path assembly. */
  val q89TopPaths = Q(
    "q89_top_paths",
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g),
      |p AS (
      |  SELECT user_id, sid,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM s GROUP BY user_id, sid)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin) { (spark, dir) =>
    val tagged = Sessionize.tagSessions(Tables.events(spark, dir),
      key = "user_id", ts = "ts", tiebreak = "event_id", gapSeconds = 1800)
    tagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** Time-interval RANGE window frame: per event, the count and value
    * mass of the SAME TYPE within the trailing hour — the "how hot is
    * this key right now" rolling feature. The frame is value-based
    * (RANGE over epoch seconds), not row-based: ties and gaps are
    * handled by time, not row position — the one window-frame kind the
    * suite didn't yet pin. One shuffle by event_type; both engines
    * order by the same integer seconds so frames are identical. */
  val q99RollingHour = Q(
    "q99_rolling_hour",
    """SELECT event_id, event_type,
      |  CAST(count(*) OVER w AS BIGINT) AS n_hour,
      |  round(sum(value) OVER w, 2) AS mass_hour
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tsec"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_timestamp(col("ts")).as("tsec"))
      .select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("n_hour"),
        round(sum(col("value")).over(w), 2).as("mass_hour"))
      .orderBy(col("event_id"))
  }

  /** HLL sketch ROLLUP (DataSketches via Spark's hll_* functions): one
    * pass builds per-(type, day) distinct-user sketches; coarser grains
    * (weeks here; months, totals) come from hll_union_agg over the
    * SKETCHES — no second scan of the raw events, the warehouse pattern
    * that makes distinct-count dashboards affordable at 100 TB (exact
    * distinct can't pre-aggregate: distincts don't add). Rows-only:
    * DataSketches register layouts have no DuckDB twin; the estimate's
    * accuracy and the union≡direct identity are spec-tested
    * (HllRollupSpec). */
  val q105HllRollup = Q.noOracle("q105_hll_rollup") { (spark, dir) =>
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    daily
      .groupBy(col("event_type"), date_trunc("week", col("day")).as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_users"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Robust outlier detection via MAD (median absolute deviation): the
    * 3σ z-score screen (q86's shape) is itself corrupted by the
    * outliers it hunts; median/MAD are 50%-breakdown robust. Two exact
    * grouped percentile aggregates (Spark's percentile is a parallel
    * partial+final agg, no global sort) with the per-type medians
    * joined back — the group table is type-cardinality-sized, so AQE
    * broadcasts it unhinted. Interpolated medians are (a+b)/2 of the
    * same two doubles in both engines → exact parity (the q14
    * precedent). */
  val q106MadOutliers = Q(
    "q106_mad_outliers",
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type),
      |mad AS (
      |  SELECT e.event_type, any_value(m.med) AS med,
      |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN med m ON e.event_type = m.event_type
      |  GROUP BY e.event_type)
      |SELECT e.event_type, round(any_value(m.med), 4) AS med,
      |  round(any_value(m.mad), 4) AS mad,
      |  CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN mad m ON e.event_type = m.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = ev.join(med, "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    ev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("value") - col("med")) > lit(3 * 1.4826) * col("mad"), 1)
          .otherwise(0)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Exponential time-decay features (half-life weighting): per user,
    * the recency-weighted value mass sum(v·exp(−age/86400 s)) against
    * the corpus max timestamp — the standard "how active lately"
    * feature that a plain windowed count misstates. One 1-row max-ts
    * aggregate broadcast back, then a single grouped agg; exp products
    * are summed in double and rounded to 4 dp on both sides. */
  val q107DecayedActivity = Q(
    "q107_decayed_activity",
    """WITH mx AS (SELECT max(ts) AS tmax FROM events)
      |SELECT user_id,
      |  round(sum(value * exp(-(epoch(tmax) - epoch(ts)) / 86400.0)), 4) AS decayed_mass,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM events CROSS JOIN mx
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val mx = ev.agg(max(col("ts")).as("tmax"))
    ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      // cast("double") keeps the fractional seconds — unix_timestamp
      // floors where DuckDB's epoch() doesn't (the q99 lesson, but here
      // the seconds feed exp(), so truncating would change the VALUE)
      .agg(round(sum(col("value") *
          exp(-(col("tmax").cast("double") - col("ts").cast("double")) / 86400.0)), 4)
          .as("decayed_mass"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** SCD2 point-in-time lookup: each purchase joined to the dimension
    * version EFFECTIVE at its timestamp. The oracle states it as the
    * natural interval-membership join (valid_from ≤ ts < valid_to); the
    * engine implements it as an INCLUSIVE as-of join against the
    * version-start table — the same one-shuffle union+window plan as
    * q22, where the interval formulation is a range join that explodes
    * at scale. Run-start intervals partition each user's timeline, so
    * the two formulations are provably the same lookup. */
  val q109Scd2Lookup = Q(
    "q109_scd2_lookup",
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE event_type <> 'purchase'),
      |s AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from, event_id
      |  FROM o WHERE prev IS NULL OR prev <> event_type),
      |iv AS (
      |  SELECT user_id, state, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id
      |      ORDER BY valid_from, event_id) AS valid_to
      |  FROM s),
      |f AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT coalesce(d.state, '(none)') AS state,
      |  CAST(count(*) AS BIGINT) AS n_purchases
      |FROM f LEFT JOIN iv d ON f.user_id = d.user_id AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |GROUP BY 1
      |ORDER BY state""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dims = ev.filter(col("event_type") =!= "purchase")
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"), col("ts"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    Joins.asOf(facts, dims, "user_id", "ts", Seq("state"), inclusive = true)
      .groupBy(coalesce(col("asof_state"), lit("(none)")).as("state"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("state"))
  }

  /** Behavioral-sequence export for sequence-model training: sessionize
    * (q21's exact 30-minute gap rule via Sessionize.tagSessions), emit
    * each session as one training row — ordered event-type sequence
    * truncated to the model context (L=8), plus the full length for
    * curriculum/packing decisions downstream.
    *
    * Scale shape: ONE user-keyed exchange feeds both windows (same
    * partitioning) and the session groupBy; the sequence is assembled
    * in-row from ≤L collected structs (the `when(rn<=L)` collect bounds
    * per-group state regardless of session length — a billion-event
    * session still carries only 8 elements into the aggregate).
    */
  val q123SessionSequences: Q = {
    val L = 8
    Q("q123_session_sequences",
      s"""WITH lagged AS (
         |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |tagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
         |             THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
         |  FROM lagged),
         |rn AS (
         |  SELECT *, row_number()
         |    OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
         |  FROM tagged)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  min(ts) AS session_start,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(least(count(*), $L) AS BIGINT) AS seq_len,
         |  string_agg(CASE WHEN rn <= $L THEN event_type END, ' ' ORDER BY ts, event_id) AS seq
         |FROM rn GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
      val tagged = Sessionize.tagSessions(Tables.events(spark, dir),
        "user_id", "ts", "event_id", 1800L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("session_id")).orderBy(col("ts"), col("event_id"))
      tagged
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"),
          // collect_list drops the when()'s nulls, so only the first L
          // structs survive; array_sort orders by rn; the 8-element
          // transform is interpreted but trivially small per row
          concat_ws(" ", transform(
            array_sort(collect_list(
              when(col("rn") <= L, struct(col("rn"), col("event_type"))))),
            s => s.getField("event_type"))).as("seq"))
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("session_start"), col("n_events"),
          least(col("n_events"), lit(L.toLong)).as("seq_len"), col("seq"))
        .orderBy(col("user_id"), col("session_id"))
    }
  }

  /** Grouped Welch t-test — the experimentation staple (compare metric
    * means between two cohorts) done scale-first: the cohort split is
    * the portable md5 hash of user_id (deterministic on any engine /
    * partitioning — rand() is neither), and the test statistic is
    * derived in closed form from mergeable INTEGER sufficient
    * statistics (n, Σv, Σv² per cohort, value in cents), so the whole
    * query is ONE partial-aggregated hash shuffle to ~|event_type|
    * rows. Same exactness contract as q145: every sufficient statistic
    * is an order-independent BIGINT; means/variances/t only exist in
    * the final identical double expression (rounded 4dp) — a float
    * stddev aggregate would hash-flake on summation order. Unbiased
    * per-cohort variance: s²/n = (nΣv² − (Σv)²) / (n²(n−1)). */
  val q147AbWelch = Q(
    "q147_ab_welch",
    """WITH e AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS v,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events),
      |s AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(sum(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS sb,
      |    CAST(sum(CASE WHEN v = 0 THEN c * c ELSE 0 END) AS BIGINT) AS qa,
      |    CAST(sum(CASE WHEN v = 1 THEN c * c ELSE 0 END) AS BIGINT) AS qb
      |  FROM e GROUP BY event_type)
      |SELECT event_type, na, nb,
      |  round(CAST(sa AS DOUBLE) / na, 4) AS mean_a_cents,
      |  round(CAST(sb AS DOUBLE) / nb, 4) AS mean_b_cents,
      |  round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
      |    / sqrt((CAST(na AS DOUBLE) * qa - CAST(sa AS DOUBLE) * sa)
      |        / (CAST(na AS DOUBLE) * na * (na - 1))
      |      + (CAST(nb AS DOUBLE) * qb - CAST(sb AS DOUBLE) * sb)
      |        / (CAST(nb AS DOUBLE) * nb * (nb - 1))), 4) + 0.0 AS t_stat
      |FROM s ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val e = Tables.events(spark, dir).select(col("event_type"),
      (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 2).as("v"),
      round(col("value") * 100).cast("long").as("c"))
    def side(v: Int, e2: Column) = sum(when(col("v") === v, e2).otherwise(lit(0L)))
    val s = e.groupBy(col("event_type")).agg(
      side(0, lit(1L)).as("na"), side(1, lit(1L)).as("nb"),
      side(0, col("c")).as("sa"), side(1, col("c")).as("sb"),
      side(0, col("c") * col("c")).as("qa"), side(1, col("c") * col("c")).as("qb"))
    def meanD(sc: String, nc: String) = col(sc).cast("double") / col(nc)
    def varOverN(nc: String, sc: String, qc: String) =
      (col(nc).cast("double") * col(qc) - col(sc).cast("double") * col(sc)) /
        (col(nc).cast("double") * col(nc) * (col(nc) - 1))
    s.select(col("event_type"), col("na"), col("nb"),
        round(meanD("sa", "na"), 4).as("mean_a_cents"),
        round(meanD("sb", "nb"), 4).as("mean_b_cents"),
        Q.noNegZero(round((meanD("sa", "na") - meanD("sb", "nb")) /
          sqrt(varOverN("na", "sa", "qa") + varOverN("nb", "sb", "qb")), 4)).as("t_stat"))
      .orderBy(col("event_type"))
  }

  /** Poisson-bootstrap confidence interval for the per-type mean value
    * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    * Streams" — the one-pass bootstrap used at scale because true
    * resampling would rescan the data B times): replica b gives each
    * row weight w ~ Poisson(1), approximated by the inverse-CDF on the
    * PORTABLE md5 uniform of (event_id # b), truncated at 5 (covers
    * 99.94% of the mass; both dialects inline the same thresholds, so
    * the weight of every (row, replica) is identical). Per (type,
    * replica): weighted mean from exact BIGINT sums; the CI is the
    * 2nd-smallest / 2nd-largest of the B=32 replica means — an ORDER
    * STATISTIC, picked by rank, so no float summation across replicas
    * ever happens. Scale: one scan emits 32 weighted rows per event
    * (narrow explode), state is |types|×32 sufficient-stat pairs. */
  val q154BootstrapCi: Q = {
    val B = 32
    // Poisson(1) CDF at k = 0..4 — identical literals in both dialects
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    val duckWeight = {
      val cases = cdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"CASE $cases ELSE 5 END"
    }
    Q("q154_bootstrap_ci",
      s"""WITH e AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
         |    b,
         |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#'
         |       || CAST(b AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
         |      / 1152921504606846976.0 AS u
         |  FROM events, unnest(range(0, $B)) AS r(b)),
         |w AS (SELECT event_type, b, c, $duckWeight AS w FROM e),
         |rep AS (
         |  SELECT event_type, b,
         |    CAST(sum(w * c) AS BIGINT) AS swc, CAST(sum(w) AS BIGINT) AS sw
         |  FROM w GROUP BY 1, 2),
         |means AS (
         |  SELECT event_type, b, swc / CAST(sw AS DOUBLE) AS mb,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY swc / CAST(sw AS DOUBLE), b) AS rk
         |  FROM rep),
         |pt AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
         |  FROM events GROUP BY event_type)
         |SELECT p.event_type, p.n,
         |  round(p.sc / CAST(p.n AS DOUBLE), 4) AS mean_cents,
         |  round(min(CASE WHEN m.rk = 2 THEN m.mb END), 4) AS ci_lo,
         |  round(min(CASE WHEN m.rk = ${B - 1} THEN m.mb END), 4) AS ci_hi
         |FROM pt p JOIN means m ON p.event_type = m.event_type
         |GROUP BY p.event_type, p.n, p.sc
         |ORDER BY p.event_type""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val u = conv(substring(md5(concat(col("event_id").cast("string"),
        lit("#"), col("b").cast("string"))), 1, 15), 16, 10)
        .cast("double") / lit(1152921504606846976.0)
      val weight = cdf.zipWithIndex.foldRight(lit(5): org.apache.spark.sql.Column) {
        case ((c, k), rest) => when(col("u") < c, lit(k)).otherwise(rest)
      }
      val ev = Tables.events(spark, dir)
      val rep = ev
        .select(col("event_type"), round(col("value") * 100).cast("long").as("c"),
          explode(sequence(lit(0L), lit((B - 1).toLong))).as("b"), col("event_id"))
        .withColumn("u", u)
        .withColumn("w", weight.cast("long"))
        .groupBy(col("event_type"), col("b"))
        .agg(sum(col("w") * col("c")).as("swc"), sum(col("w")).as("sw"))
      val means = rep
        .select(col("event_type"), col("b"), (col("swc") / col("sw").cast("double")).as("mb"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(col("mb"), col("b"))))
      val pt = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sc"))
      pt.join(means, "event_type")
        .groupBy(col("event_type"), col("n"), col("sc"))
        .agg(round(min(when(col("rk") === 2, col("mb"))), 4).as("ci_lo"),
          round(min(when(col("rk") === B - 1, col("mb"))), 4).as("ci_hi"))
        .select(col("event_type"), col("n"),
          round(col("sc") / col("n").cast("double"), 4).as("mean_cents"),
          col("ci_lo"), col("ci_hi"))
        .orderBy(col("event_type"))
    }
  }

  /** Time-weighted average — the temporal-aggregation companion to
    * q87's SCD2 build: each event's value holds as a step function
    * until the user's next event, and the average weights each value by
    * how LONG it held, not how often it was sampled (the correct
    * statistic for irregularly-sampled gauges: sensor readings, prices,
    * queue depths). Implementation is one lead() per user (the q87
    * exchange) then a partial-agg shuffle of INTEGER products:
    * durations as BIGINT milliseconds (µs diff, integer DIV 1000) ×
    * values as BIGINT cents, so Σ(cents·ms) and Σms are exact
    * order-independent integer sums at every scale — bounded by
    * max_cents · corpus_span · |users| ≈ 2e16 at sf0.1, far under
    * 2^63 — and the one float is the identical final division. */
  val q163TimeWeightedAvg = Q(
    "q163_time_weighted_avg",
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      |  FROM events),
      |iv AS (
      |  SELECT event_type, cents,
      |    (epoch_us(next_ts) - epoch_us(ts)) // 1000 AS dur_ms
      |  FROM o WHERE next_ts IS NOT NULL)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dur_ms) AS BIGINT) AS total_ms,
      |  round(CAST(sum(cents * dur_ms) AS DOUBLE) / sum(dur_ms) / 100, 4)
      |    AS tw_avg_value
      |FROM iv GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .filter(col("next_ts").isNotNull)
      .withColumn("dur_ms",
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_ms")).as("total_ms"),
        round((sum(col("cents") * col("dur_ms")).cast("double") /
          sum(col("dur_ms"))) / 100, 4).as("tw_avg_value"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier survival curve for time-to-conversion — the
    * censoring-aware "how long until a user's first high-value purchase"
    * estimator (Kaplan & Meier 1958) that q63's fixed-window cohort view
    * can't express: a user who never converts inside the observation
    * window is CENSORED at their last event, and the product-limit
    * estimator keeps them in the risk set without ever counting a death
    * — dropping them (or calling them converted-at-horizon) biases the
    * curve, which is the whole reason KM exists. Death = first purchase
    * with value ≥ 200; clock starts at the user's first event. Scale
    * shape: the only fact-scale work is two per-user min/max aggregates
    * over the same shuffle key; everything after lives at
    * distinct-day grain, which the CALENDAR bounds (a few thousand rows
    * at any corpus size), so the two global windows (reverse-cumulative
    * risk set, cumulative log-survival) are over a bounded relation.
    * Float discipline: risk/death counts are exact BIGINTs; each factor
    * ln(1−dᵢ/nᵢ) is quantized to a 1e-9 grid before the BIGINT
    * cumulative sum, and a dᵢ=nᵢ terminal death pins qf at −100·1e9 so
    * survival underflows to exactly 0 in both engines instead of ln(0)
    * diverging. */
  val q188KaplanMeier = Q(
    "q188_kaplan_meier",
    """WITH u AS (
      |  SELECT user_id, min(epoch_us(ts)) AS fu, max(epoch_us(ts)) AS lu
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT user_id, min(epoch_us(ts)) AS pu
      |  FROM events WHERE event_type = 'purchase' AND value >= 200
      |  GROUP BY 1),
      |lt AS (
      |  SELECT CAST(floor((coalesce(pu, lu) - fu) / 86400000000.0) AS BIGINT) AS t,
      |    CASE WHEN pu IS NOT NULL THEN 1 ELSE 0 END AS converted
      |  FROM u LEFT JOIN p USING (user_id)),
      |g AS (
      |  SELECT t, CAST(sum(converted) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
      |  FROM lt GROUP BY 1),
      |r AS (
      |  SELECT t, d,
      |    CAST(sum(c) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM g),
      |f AS (
      |  SELECT t, d, n_risk,
      |    CASE WHEN d < n_risk THEN
      |      CAST(round(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |        * 1e9) AS BIGINT)
      |    ELSE CAST(-100000000000 AS BIGINT) END AS qf
      |  FROM r WHERE d > 0),
      |s AS (
      |  SELECT t, d, n_risk, CAST(sum(qf) OVER (ORDER BY t) AS BIGINT) AS qs
      |  FROM f)
      |SELECT t AS t_days, n_risk, d AS d_events,
      |  round(exp(qs / 1e9), 6) AS survival
      |FROM s ORDER BY t_days""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val u = ev.groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("fu"), max(expr("unix_micros(ts)")).as("lu"))
    val p = ev.filter(col("event_type") === "purchase" && col("value") >= 200)
      .groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("pu"))
    val lt = u.join(p, Seq("user_id"), "left")
      .select(floor((coalesce(col("pu"), col("lu")) - col("fu")) / lit(86400000000.0))
          .cast("long").as("t"),
        when(col("pu").isNotNull, 1L).otherwise(0L).as("converted"))
    val g = lt.groupBy(col("t"))
      .agg(sum(col("converted")).as("d"), count(lit(1)).as("c"))
    val byT = Window.orderBy(col("t"))
    val r = g.select(col("t"), col("d"),
      sum(col("c")).over(byT.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .as("n_risk"))
    val f = r.filter(col("d") > 0)
      .select(col("t"), col("d"), col("n_risk"),
        when(col("d") < col("n_risk"),
          round(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double")) * 1e9).cast("long"))
          .otherwise(-100000000000L).as("qf"))
    f.select(col("t").as("t_days"), col("n_risk"), col("d").as("d_events"),
        round(exp(sum(col("qf")).over(byT) / 1e9), 6).as("survival"))
      .orderBy(col("t_days"))
  }

  /** Time-WINDOWED conversion funnel — q62 counts ordered step
    * completion ever; real funnel analytics bounds each step by a
    * conversion window (the ClickHouse `windowFunnel` semantic): the
    * first click within 24 h of the user's FIRST view, then the first
    * purchase within 72 h of that click. Reported per view-date cohort
    * with exact-count conversion rates.
    *
    * Shape: three CHAINED window aggregates over ONE user partition —
    * each step's timestamp is a conditional min that references the
    * previous step's column, so the whole funnel costs a single
    * exchange (the q63 lesson: a window min over user is one shuffle
    * where aggregate-then-join is two; PlanSpec pins the single
    * hashpartitioning(user_id) exchange). At 100 TB this is the only
    * funnel shape that survives: per-user state never leaves its
    * partition, and the cohort rollup is date-grain.
    *
    * Exactness: timestamps compare at exact micros in both engines;
    * interval arithmetic is `+ INTERVAL 24/72 HOURS` on both sides;
    * counts are BIGINT; rates are single final divisions of exact
    * counts. */
  val q222WindowedFunnel = Q(
    "q222_windowed_funnel",
    """WITH f AS (
      |  SELECT user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_v
      |  FROM events),
      |c AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_v
      |                     AND ts <= t_v + INTERVAL 24 HOURS THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_c
      |  FROM f),
      |p AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_c
      |                     AND ts <= t_c + INTERVAL 72 HOURS THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_p
      |  FROM c),
      |u AS (
      |  SELECT DISTINCT user_id, CAST(t_v AS DATE) AS cohort, t_c, t_p
      |  FROM p WHERE t_v IS NOT NULL)
      |SELECT cohort, CAST(count(*) AS BIGINT) AS n_view,
      |  CAST(count(t_c) AS BIGINT) AS n_click_24h,
      |  CAST(count(t_p) AS BIGINT) AS n_purchase_72h,
      |  round(CAST(count(t_c) AS DOUBLE) / count(*), 6) AS view_to_click,
      |  round(CAST(count(t_p) AS DOUBLE) / count(*), 6) AS view_to_purchase
      |FROM u
      |GROUP BY cohort
      |ORDER BY cohort""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    val p = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t_v",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t_c",
        min(when(col("event_type") === "click" && col("ts") > col("t_v")
          && col("ts") <= col("t_v") + expr("INTERVAL 24 HOURS"), col("ts")))
          .over(byUser))
      .withColumn("t_p",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_c")
          && col("ts") <= col("t_c") + expr("INTERVAL 72 HOURS"), col("ts")))
          .over(byUser))
    p.filter(col("t_v").isNotNull)
      .select(col("user_id"), col("t_v").cast("date").as("cohort"),
        col("t_c"), col("t_p")).distinct()
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_view"),
        count(col("t_c")).as("n_click_24h"),
        count(col("t_p")).as("n_purchase_72h"),
        round(count(col("t_c")).cast("double") / count(lit(1)), 6)
          .as("view_to_click"),
        round(count(col("t_p")).cast("double") / count(lit(1)), 6)
          .as("view_to_purchase"))
      .orderBy(col("cohort"))
  }

  /** Markov next-event prediction eval — the sequence-predictability
    * diagnostic over the event stream (completes the q72 transition
    * family the way q212/q213 complete retrieval: the MODEL the
    * transition counts imply, graded on held-out data). A first-order
    * Markov predictor is fit on the even-event_id half of the
    * consecutive-pair stream (argmax next-type per prev-type,
    * deterministic count-DESC/type-ASC tie rule) and scored top-1 on
    * the odd half, per prior event type. Low accuracy on a type whose
    * transitions LOOK concentrated in q72's counts = heterogeneity the
    * aggregate hides; the number also baselines any sequence model
    * trained on this stream (beat the Markov floor or don't ship).
    *
    * Scale: ONE user-keyed window (the q72 exchange), a transition
    * aggregate at |types|² grain, and a test join against the
    * |types|-row predictor (AQE broadcasts it unhinted). Exactness:
    * BIGINT counts, one final division; the even/odd split keys on
    * event_id so both engines split identically. */
  val q231MarkovEval = Q(
    "q231_markov_eval",
    """WITH seq AS (
      |  SELECT event_type AS prev, event_id,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS nxt
      |  FROM events),
      |pr AS (SELECT prev, nxt, event_id FROM seq WHERE nxt IS NOT NULL),
      |tr AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
      |       FROM pr WHERE event_id % 2 = 0 GROUP BY 1, 2),
      |pd AS (
      |  SELECT prev, nxt AS predicted FROM (
      |    SELECT prev, nxt, row_number() OVER (PARTITION BY prev
      |      ORDER BY c DESC, nxt) AS rn
      |    FROM tr) t WHERE rn = 1),
      |te AS (SELECT prev, nxt FROM pr WHERE event_id % 2 = 1)
      |SELECT te.prev AS prev_type, pd.predicted AS predicted_next,
      |  CAST(count(*) AS BIGINT) AS n_test,
      |  CAST(sum(CASE WHEN te.nxt = pd.predicted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  round(CAST(sum(CASE WHEN te.nxt = pd.predicted THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS accuracy
      |FROM te LEFT JOIN pd ON pd.prev = te.prev
      |GROUP BY 1, 2
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val seq = Tables.events(spark, dir)
      .select(col("event_type").as("prev"), col("event_id"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
          .as("nxt"))
      .filter(col("nxt").isNotNull)
    val tr = seq.filter(col("event_id") % 2 === 0)
      .groupBy(col("prev"), col("nxt")).agg(count(lit(1)).as("c"))
    val pd = tr
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("prev")).orderBy(col("c").desc, col("nxt"))))
      .filter(col("rn") === 1)
      .select(col("prev"), col("nxt").as("predicted"))
    // LEFT join: a prior type whose pairs all landed in the test half
    // has no predictor — it must surface as a zero-accuracy row, not
    // silently vanish from the report (r13 review)
    seq.filter(col("event_id") % 2 === 1)
      .join(pd, Seq("prev"), "left")
      .groupBy(col("prev").as("prev_type"), col("predicted").as("predicted_next"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nxt") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(when(col("nxt") === col("predicted"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("accuracy"))
      .orderBy(col("prev_type"))
  }

  val all: Seq[Q] = Seq(q18JsonProps, q19HourlyAgg, q20SlidingAgg, q21Sessions,
    q22AsofViewPurchase, q50MapFuncs, q52IntervalJoin, q62Funnel, q63Retention,
    q65AsofNextView, q71GapfillHourly, q72Transitions, q86VolumeAnomalies,
    q87Scd2Intervals, q89TopPaths, q99RollingHour, q105HllRollup,
    q106MadOutliers, q107DecayedActivity, q109Scd2Lookup, q123SessionSequences,
    q147AbWelch, q154BootstrapCi, q163TimeWeightedAvg, q188KaplanMeier,
    q222WindowedFunnel,
    q231MarkovEval)
}
