package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog-shaped operators over an append-only event stream
  * (`event_id, ts, user_id, event_type, value` — the `events` fixture
  * schema): SCD2 interval assembly, point-in-time reconstruction, and
  * last-touch attribution.
  *
  * These are the interval-table complement of the flagship active-flag
  * merge ([[ScdMerge]], reference SQL/etl_world_banks.sql:20-122): the
  * reference keeps only current-vs-history flags; a warehouse that needs
  * "state as of" queries materializes (valid_from, valid_to] versions
  * instead. All three operators are single-exchange shapes — one keyed
  * window or one keyed argmax — so the 100 TB changelog shuffles exactly
  * once on its key and nothing joins, backscans, or re-sorts.
  */
object Changelog {

  /** Changelog → SCD2 interval table: one version row per change, closed
    * by the NEXT change's timestamp (NULL valid_to = open/current row).
    * ONE user-keyed lead window; ties broken by event_id so duplicate
    * timestamps produce a deterministic (possibly zero-length) interval
    * chain.
    *
    * Wall-clock (`timestamp_ntz`) end-to-end: the cast happens BEFORE the
    * window, so rows are ordered by exactly the values the interval table
    * stores, and [[mergeIntervals]] can feed stored `valid_from` values
    * straight back in with no ntz→ltz→ntz round trip (which would move
    * instants in the DST fall-back overlap hour of a non-UTC session
    * timezone, breaking the merge invariant). An already-ntz `ts` input
    * passes through the cast unchanged.
    */
  def intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("event_id"), col("value"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("event_id"), col("value"),
        col("valid_to").isNull.as("is_current"))
  }

  /** SCD Type 3 from the changelog (Kimball's limited-history variant:
    * the dimension keeps the CURRENT and the PREVIOUS value as columns,
    * not as version rows — the shape reports want when "what changed
    * last" matters but full history doesn't). One user-keyed rank window
    * picks the two newest versions; one conditional aggregate pivots
    * them into (current_*, prev_*) with an n_versions audit. Keys with a
    * single version get NULL prev columns, the Type-3 contract.
    *
    * Scale shape: the changelog shuffles exactly once on its key (the
    * window), and the pivot aggregate reuses that partitioning — no
    * second exchange, no self-join of history against itself.
    */
  def type3(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("event_id"), col("value"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        max(when(col("rk") === 1, col("value"))).as("current_value"),
        max(when(col("rk") === 1, col("ts"))).as("current_ts"),
        max(when(col("rk") === 2, col("value"))).as("prev_value"),
        max(when(col("rk") === 2, col("ts"))).as("prev_ts"))
      .orderBy(col("user_id"))
  }

  val sqlType3: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |), r AS (
      |  SELECT user_id, ts, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM e
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_versions,
      |  MAX(CASE WHEN rk = 1 THEN value END) AS current_value,
      |  MAX(CASE WHEN rk = 1 THEN ts END) AS current_ts,
      |  MAX(CASE WHEN rk = 2 THEN value END) AS prev_value,
      |  MAX(CASE WHEN rk = 2 THEN ts END) AS prev_ts
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Point-in-time state: per key, the last change with ts ≤ cutoff. A
    * thin per-key argmax over a (ts, event_id, …) struct — NOT
    * intervals-then-filter: the argmax partial-aggregates map-side, so
    * only |keys| thin structs reach the exchange (see the cross-check
    * property in Round4ExtSpec — both formulations agree row for row).
    * `n_versions` audits how many versions the cutoff superseded.
    */
  def asOf(events: DataFrame, cutoff: Column): DataFrame =
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("ts") <= cutoff)
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"),
        col("last.ts").cast("timestamp_ntz").as("as_of_ts"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"),
        col("last.value").as("value"),
        col("n_versions"))

  /** SCD2 history garbage collection (the temporal-table VACUUM): drop
    * every version row fully superseded BEFORE `horizon`. The kept set —
    * `valid_to IS NULL OR valid_to > horizon` — is exactly the minimal
    * subset that preserves every as-of query at `t ≥ horizon`: a version
    * covering instant t satisfies `valid_from ≤ t < valid_to`, which for
    * t ≥ horizon forces `valid_to > horizon` (or open). That invariant is
    * property-tested (asOf via intervals, before vs after GC, at and
    * beyond the horizon). One map-side filter over the interval table —
    * at 100 TB this is the retention job that keeps the history table
    * from growing without bound, and with `valid_to`-range file
    * statistics it prunes to the tail files.
    */
  def gcIntervals(intervals: DataFrame, horizon: Column): DataFrame =
    intervals.filter(col("valid_to").isNull || col("valid_to") > horizon)

  /** Snapshot diff: what changed per key between two as-of cutoffs
    * (t1 ≤ t2) — the audit query behind "what changed this week". ONE
    * scan, ONE exchange: both snapshots come out of the same aggregation
    * as conditional thin argmaxes (`max(when(ts ≤ t1, struct))` beside
    * the unconditional max over ts ≤ t2), never two asOf passes joined —
    * at 100 TB the event scan is the cost and it is paid once, with the
    * ts ≤ t2 bound pushed to the scan. Keys first seen inside (t1, t2]
    * classify as `added`; a key whose latest change moved is `changed`
    * (identity = event_id, not a double compare); unchanged keys are
    * filtered out. `new_versions` counts the changes the window applied.
    */
  def snapshotDiff(events: DataFrame, t1: Column, t2: Column): DataFrame = {
    val s = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("ts") <= t2)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("ts") <= t1,
          struct(col("ts"), col("event_id"), col("value")))).as("o"),
        count(when(col("ts") <= t1, lit(1))).as("nv_old"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("n"),
        count(lit(1)).as("nv_new"))
    s.withColumn("change_type",
        when(col("o").isNull, "added")
          .when(col("o.event_id") === col("n.event_id"), "unchanged")
          .otherwise("changed"))
      .filter(col("change_type") =!= "unchanged")
      .select(col("user_id"), col("change_type"),
        col("o.event_id").as("event_id_old"),
        col("n.event_id").as("event_id_new"),
        col("o.value").as("value_old"),
        col("n.value").as("value_new"),
        (col("nv_new") - col("nv_old")).as("new_versions"))
      .orderBy(col("user_id"))
  }

  /** Incremental interval maintenance: fold a new batch of changes into an
    * existing interval table WITHOUT recomputing untouched keys. Keys
    * absent from the batch pass through verbatim (one anti join — no
    * window, no sort); touched keys rebuild from their own interval rows
    * (each row IS one original change: `valid_from` = its ts) unioned with
    * the batch. At 100 TB with a daily batch touching a small key
    * fraction, the lead window runs over |touched| rows only — the
    * recompute cost tracks the batch, not the table. Invariant
    * (property-tested): mergeIntervals(intervals(A), B) ==
    * intervals(A ∪ B) row for row.
    */
  def mergeIntervals(state: DataFrame, batch: DataFrame): DataFrame = {
    val changes = batch
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("event_id"), col("value"))
    val keys = changes.select(col("user_id")).distinct()
    val untouched = state.join(keys, Seq("user_id"), "left_anti")
    // stored valid_from IS the change's wall-clock ts — reused as-is
    // (timestamp_ntz end-to-end; no session-timezone round trip)
    val affected = state.join(keys, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_id"), col("value"))
    untouched.unionByName(intervals(affected.unionByName(changes)))
  }

  /** Linear multi-touch attribution: every non-`convType` event inside the
    * window [conv.ts − windowUs, conv.ts) splits one unit of credit
    * equally with the conversion's other touches; the report aggregates
    * credit per touch type. Built by COMPOSITION: the touch↔conversion
    * pairing is [[RangeJoin.pointInRange]] (bucket-explode equi join —
    * never a nested-loop BETWEEN join), the per-conversion touch count is
    * one conversion-keyed window on the already-joined frame, and the
    * 1/n credit sum goes through the exact-decimal detour
    * ([[graft.functions.Exact.xsum]]) so the double total is
    * order-independent. Replication factor stays ≤ 2: `bucketUs` should
    * equal `windowUs` (each conversion's window spans at most 2 buckets).
    */
  def multiTouch(events: DataFrame, convType: String, windowUs: Long,
      bucketUs: Long): DataFrame = {
    val e = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val conv = e.filter(col("event_type") === convType).select(
      col("event_id").as("conv_id"), col("user_id"),
      col("ts").as("conv_ts"),
      timestamp_micros(unix_micros(col("ts")) - lit(windowUs)).as("w_start"))
    val touches = e.filter(col("event_type") =!= convType).select(
      col("event_id").as("touch_id"), col("user_id"),
      col("event_type").as("touch_type"), col("ts"))
    val byConv = Window.partitionBy(col("conv_id"))
    RangeJoin.pointInRange(touches, conv, Seq("user_id"),
        "ts", "w_start", "conv_ts", bucketUs)
      .filter(col("ts") < col("conv_ts")) // exclusive at the conversion
      .withColumn("n_touches", count(lit(1)).over(byConv))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_assists"),
        graft.functions.Exact.xsum(
          lit(1.0) / col("n_touches").cast("double"), 6).as("credit"))
  }

  /** Last-touch attribution: each `convType` event credited to the user's
    * most recent PRIOR non-`convType` event, attributed only when the
    * touch falls within `windowUs` microseconds. The ignore-nulls `last`
    * over the unbounded-preceding row frame is a running O(1)-state scan
    * per partition — never a per-row backward search — and conversions
    * filter AFTER the window so every event still feeds the running state.
    */
  def lastTouch(events: DataFrame, convType: String, windowUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("touch",
        last(when(col("event_type") =!= convType,
            struct(col("ts"), col("event_id"), col("event_type"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(col("touch.ts")))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("purchase_ts"),
        col("touch.event_id").as("touch_id"),
        col("touch.event_type").as("touch_type"),
        col("touch.ts").cast("timestamp_ntz").as("touch_ts"),
        col("gap_us"),
        (col("gap_us").isNotNull && col("gap_us") <= windowUs)
          .as("attributed"))
  }
}
