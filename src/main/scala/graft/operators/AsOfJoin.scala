package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** As-of (point-in-time) join: each left row picks the latest right row with
  * `rightTime <= leftTime` on the same key — the canonical
  * enrich-events-with-most-recent-state operator.
  *
  * Spark has no ASOF join; the preference-order answer here is (a) compose
  * built-ins: tag both sides, union, and take a running `last(..,
  * ignoreNulls)` over one window per key ordered by time. This costs ONE
  * hash shuffle of |L|+|R| rows — it never materializes the |L|×|R_key|
  * range-join blowup a naive `t_r <= t_l` join condition produces, and it
  * scales exactly like any keyed window at 100 TB.
  *
  * The matched right row rides the window as ONE struct, so the picked
  * (matched_time, valueCols) tuple is always an ACTUAL right row — a NULL
  * inside a genuine right row's value column stays NULL in the output.
  * (Per-column `last(v, ignoreNulls)` would skip the real NULL and pull
  * that column from an OLDER row, emitting a value combination that exists
  * nowhere on the right.)
  *
  * Tie semantics: a right row at the same instant as a left row IS visible
  * (inclusive, right-sorts-first). Determinism: when the right side has
  * several rows at the same (key, time), the window order breaks the tie on
  * the whole match struct (ascending), so the picked row is always the one
  * with the greatest value tuple — stable across retries and engines, never
  * partition-order-dependent. (DuckDB's ASOF leaves this undefined;
  * pre-aggregating the right side to unique (key, time) remains the
  * recommended contract, and is what the oracle queries do. valueCols must
  * be orderable types for the tiebreak — true of every column kind an
  * as-of enrichment carries.)
  *
  * Left rows with a NULL time never match (both directions — without the
  * explicit guard the descending forward order would sort them last and
  * hand them a frame spanning every right row). Right rows with a NULL
  * time are dropped before the union for the mirror reason.
  */
object AsOfJoin {

  /** Tagged union all three variants window over: left rows carry their
    * payload and a NULL match struct, right rows carry
    * struct(__rt, valueCols) as `__m`. Right rows with a NULL time are
    * pre-dropped — they can never legitimately match, but their __m
    * struct is NON-null (a struct of NULL fields), so left unfiltered
    * they would sort NULLS-FIRST into every frame and surface as phantom
    * matches with matched_time = NULL.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val mType = StructType(
      StructField("__rt", TimestampType) +:
        valueCols.map(v => StructField(v, right.schema(v).dataType)))
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side"),
        lit(null).cast(mType).as("__m")) ++
        leftPayload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"), lit(0).as("__side"),
        struct(col(rightTime).cast("timestamp").as("__rt") +:
          valueCols.map(col): _*).as("__m")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .filter(col("__t").isNotNull)
    l.unionByName(r)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    // __side orders right before left at equal __t (inclusive visibility);
    // __m as the final sort key is the deterministic tiebreak among right
    // rows sharing (key, time) — left rows all carry NULL __m and tie.
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
      // the NULL-left-time guard: no otherwise() → NULL → filtered below
      .withColumn("__matched", when(col("__t").isNotNull,
        last(col("__m"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1 && col("__matched").isNotNull)
      .withColumn("matched_time", col("__matched")("__rt"))
      .withColumns(valueCols.map(v => v -> col("__matched")(v)).toMap)
      .drop("__t", "__side", "__m", "__matched")
  }

  /** @param valueCols right-side columns carried to the matched left row
    * @return left rows that have a match, plus `matched_time` and valueCols
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, valueCols,
      forward = false)

  /** Bounded backward as-of — pandas `merge_asof(tolerance=...)`
    * semantics: the most-recent state match only counts if it is no older
    * than `toleranceMicros`; staler matches drop (inner semantics, like
    * every variant here). "Enrich with current state, but never with
    * state so stale it is wrong" — the production guard for slowly-
    * updating dimensions. Same single-shuffle union-window plan as
    * [[asOf]] plus one integer epoch-micros post-filter (exact in both
    * engines).
    */
  def asOfTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      toleranceMicros: Long): DataFrame =
    asOf(left, right, keys, leftTime, rightTime, valueCols)
      .filter(unix_micros(col(leftTime).cast("timestamp")) -
        unix_micros(col("matched_time")) <= toleranceMicros)

  /** Forward as-of: each left row picks the EARLIEST right row with
    * `rightTime >= leftTime` — "next state change after this event". Same
    * single-shuffle union-window plan as [[asOf]] with the time order
    * reversed; a right row at the same instant is visible (inclusive), so
    * at equal times the right row still sorts before the left row.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, valueCols,
      forward = true)

  /** Nearest as-of: each left row picks whichever right row is closest in
    * time in EITHER direction; an exact tie in distance goes to the
    * backward match (the state that already existed — the conservative
    * enrichment choice). Left rows with no right row on their key drop
    * (inner semantics, as both directional variants).
    *
    * ONE union + ONE keyed sort + TWO frames over the same window spec —
    * the running backward `last` and the running forward `first` share a
    * single hash exchange (the q13-sessionize discipline), so nearest
    * costs the same shuffle as one directional pass, never two. The
    * distance compare runs on epoch microseconds (integer — exact in both
    * engines). A right row at the same instant is captured by the
    * backward frame at distance 0, which the tie rule prefers, so the
    * forward frame's equal-time exclusion (right sorts before left in
    * ascending order) can never change the answer.
    *
    * Same-instant duplicates on the right: both candidate picks are
    * deterministic (never partition-order-dependent), but the shared
    * ascending sort makes them ASYMMETRIC — the backward candidate is the
    * greatest (time, value) tuple at its instant (`last` ascending), the
    * forward candidate the least (`first` ascending). Pre-aggregate the
    * right side to unique (keys, rightTime) — the contract the
    * directional variants already recommend — and the asymmetry is moot;
    * the property suite pins both behaviors.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__m").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The forward pick is expressed as a PRECEDING frame over the REVERSED
    // sort, not `first(...).over(currentRow → unboundedFollowing)`: Spark's
    // UnboundedFollowingWindowFunctionFrame re-scans current→end for every
    // row — O(rows²) per key partition (measured 27 s vs 0.5 s for the
    // directional as-ofs at sf0.1). The reversed-preceding form is the
    // identical sequence scanned from the other end (equal-time rows:
    // side desc keeps right rows OUT of the forward frame, exactly like
    // the asc form's currentRow start; __m desc picks the same minimal
    // tiebreak row), costs one extra in-partition sort, and shares the
    // ONE hash exchange.
    val ordRev = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc, col("__m").desc)
    val wf = ordRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val db = unix_micros(col("__t")) - unix_micros(col("__b")("__rt"))
    val df = unix_micros(col("__f")("__rt")) - unix_micros(col("__t"))
    taggedUnion(left, right, keys, leftTime, rightTime, valueCols)
      .withColumn("__b", when(col("__t").isNotNull,
        last(col("__m"), ignoreNulls = true).over(wb)))
      .withColumn("__f", when(col("__t").isNotNull,
        last(col("__m"), ignoreNulls = true).over(wf)))
      .filter(col("__side") === 1 &&
        (col("__b").isNotNull || col("__f").isNotNull))
      .withColumn("__matched",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(df < db, col("__f"))
          .otherwise(col("__b")))
      .withColumn("matched_time", col("__matched")("__rt"))
      .withColumn("matched_dir",
        when(col("__matched")("__rt") <= col("__t"), lit("backward"))
          .otherwise(lit("forward")))
      .withColumns(valueCols.map(v => v -> col("__matched")(v)).toMap)
      .drop("__t", "__side", "__m", "__b", "__f", "__matched")
  }
}
