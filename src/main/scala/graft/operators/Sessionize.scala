package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact.{sqlSum, xsum}

/** Event sessionization and time-window aggregation — the batch forms of the
  * streaming pillar (the Structured Streaming variants run the same logic
  * via `readStream`, see graft.streaming and StreamingSpec).
  *
  * Sessionize: gap-based sessions per user via lag + running conditional sum
  * — two window functions over one hash-partition by user, then one
  * aggregation. Time math is integer epoch-micros (`unix_micros` ↔
  * `epoch_us`) so engines agree exactly.
  *
  * Scale: partition key is user_id (naturally high-cardinality); windows and
  * the final groupBy share the same partitioning so Catalyst plans a single
  * shuffle.
  */
object Sessionize {

  val GapMicros: Long = 30L * 60 * 1000000 // 30 min session gap

  def sessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) -
      lag(unix_micros(col("ts")), 1).over(byUser)
    val isNew = when(gap.isNull || gap > GapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"),
        xsum(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  def sqlSessions: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
       |    epoch_us(CAST(ts AS TIMESTAMP))
       |      - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
       |), s AS (
       |  SELECT *, SUM(CASE WHEN gap IS NULL OR gap > $GapMicros
       |                     THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM g
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |  COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  ${sqlSum("value")} AS total_value
       |FROM s GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  /** Built-in session-window operator — gap-merge sessions through
    * `session_window` instead of the lag/cumsum formulation. The built-in
    * form is the one that transfers directly to Structured Streaming
    * state.
    *
    * BOUNDARY CAVEAT vs [[sessions]]: `session_window` is end-EXCLUSIVE —
    * two events exactly `GapMicros` apart start a NEW session here
    * (oracle: `gap >= GapMicros`), while [[sessions]] keeps them together
    * (`gap > GapMicros`). Each operator has its own oracle encoding its
    * own rule; swapping one for the other shifts counts at the exact
    * boundary.
    */
  def sessionsBuiltin(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"),
        xsum(col("value")).as("total_value"))
      .select(col("user_id"), col("n_events"), col("session_start"),
        col("session_end"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  def sqlSessionsBuiltin: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
       |    epoch_us(CAST(ts AS TIMESTAMP))
       |      - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
       |), s AS (
       |  SELECT *, SUM(CASE WHEN gap IS NULL OR gap >= $GapMicros
       |                     THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM g
       |)
       |SELECT user_id, COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  ${sqlSum("value")} AS total_value
       |FROM s GROUP BY user_id, session_seq
       |ORDER BY user_id, session_start""".stripMargin

  /** Tumbling-window aggregation — identical logic feeds the streaming
    * variant (`groupBy(window(ts, …))` under a watermark).
    */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        xsum(col("value")).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("w.end").cast("timestamp_ntz").as("window_end"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  def sqlTumbling: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       |  date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
       |  event_type, COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2, 3
       |ORDER BY window_start, event_type""".stripMargin

  /** Burst windows: tumbling hourly counts per event type, flagged where
    * the window carries more than [[BurstFactor]]× the type's mean
    * windows-with-events rate. The comparison is the cross-multiplied
    * integer form `n_events · n_windows > factor · n_total` — no division
    * ever happens, so the result hashes exactly against the oracle. This
    * is the ops-dashboard "traffic spike" primitive; the exact-integer
    * form is also what a streaming alert would evaluate per window.
    *
    * Scale shape: one hash exchange onto (window, type) with map-side
    * partial counts; the per-type stats frame is |types| rows (broadcast
    * join back); output is only the bursting windows.
    */
  val BurstFactor = 2L

  def bursts(events: DataFrame): DataFrame = {
    // two consumers (per-type stats and the flag join) — pin the
    // |windows × types|-bounded count frame so the corpus aggregates once
    val wc = graft.operators.Iterate.pin(events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events")))
    val stats = wc.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("n_events")).cast("long").as("n_total"))
    wc.join(stats, Seq("event_type"))
      .filter(col("n_events") * col("n_windows")
        > lit(BurstFactor) * col("n_total"))
      .select(col("event_type"), col("window_start"), col("n_events"),
        col("n_windows"), col("n_total"))
      .orderBy(col("event_type"), col("window_start"))
  }

  def sqlBursts: String =
    s"""WITH wc AS (
       |  SELECT event_type,
       |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       |    CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1, 2
       |), st AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_windows,
       |    CAST(SUM(n_events) AS BIGINT) AS n_total
       |  FROM wc GROUP BY event_type
       |)
       |SELECT wc.event_type, wc.window_start, wc.n_events,
       |  st.n_windows, st.n_total
       |FROM wc JOIN st ON wc.event_type = st.event_type
       |WHERE wc.n_events * st.n_windows > $BurstFactor * st.n_total
       |ORDER BY wc.event_type, wc.window_start""".stripMargin

  /** Weekly seasonality heatmap: event count and exact-decimal value sum
    * per (day-of-week, hour-of-day) cell — the 7×24 profile capacity
    * planning and anomaly baselines read. One hash exchange onto ≤168
    * groups with map-side partial aggregation; output is calendar-
    * bounded, independent of corpus size. Spark's `dayofweek` is
    * 1=Sunday; DuckDB's is 0=Sunday — the mirror adds 1.
    */
  def dowProfile(events: DataFrame): DataFrame =
    events
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"), xsum(col("value")).as("total_value"))
      .orderBy(col("dow"), col("hod"))

  def sqlDowProfile: String =
    s"""SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
       |  hour(CAST(ts AS TIMESTAMP)) AS hod,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS total_value
       |FROM events GROUP BY 1, 2
       |ORDER BY dow, hod""".stripMargin

  // ------------------------------------------------------------- debounce
  /** Telemetry debounce: within each (user, type) stream keep only the
    * FIRST event of every burst, where a new burst starts when the gap
    * from the PREVIOUS event exceeds `gapMicros`. First-of-burst is
    * exactly the new-burst flag itself, so the whole operator is one lag
    * window + a filter — ONE exchange, one in-partition sort, no rank
    * stage. (The alternative "gap from last KEPT event" rate-limit
    * semantics needs running state — that is the streaming
    * `flatMapGroupsWithState` territory, not a window.)
    */
  def debounce(events: DataFrame, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
      .orderBy(col("event_id"))
  }
}
