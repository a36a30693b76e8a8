package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Tie semantics: a right row at the same instant as a left row IS visible
  * (inclusive, right-sorts-first). Determinism: when the right side has
  * several rows at the same (key, time), the window order breaks the tie on
  * the value columns themselves (ascending), so the picked row is always
  * the one with the greatest value tuple — stable across retries and
  * engines, never partition-order-dependent. (DuckDB's ASOF leaves this
  * undefined; pre-aggregating the right side to unique (key, time) remains
  * the recommended contract, and is what the oracle queries do. valueCols
  * must be orderable types for the tiebreak — true of every column kind an
  * as-of enrichment carries.)
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried to the matched left row
    * @return left rows that have a match, plus `matched_time` and valueCols
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side"),
        lit(null).cast("timestamp").as("__rt")) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)) ++
        leftPayload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"), lit(0).as("__side"),
        col(rightTime).cast("timestamp").as("__rt")) ++
        valueCols.map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // valueCols as final sort keys: deterministic pick among right rows
    // sharing (key, time) — left rows sort after right at equal __t via
    // __side and contribute only ignored NULLs, so the extra keys are
    // inert for them (see object scaladoc).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").asc +:
        valueCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("matched_time", last(col("__rt"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(v =>
        v -> last(col(v), ignoreNulls = true).over(w)).toMap)
      .filter(col("__side") === 1 && col("matched_time").isNotNull)
      .drop("__t", "__side", "__rt")
  }

  /** Forward as-of: each left row picks the EARLIEST right row with
    * `rightTime >= leftTime` — "next state change after this event". Same
    * single-shuffle union-window plan as [[asOf]] with the time order
    * reversed; a right row at the same instant is visible (inclusive), so
    * at equal times the right row still sorts before the left row.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side"),
        lit(null).cast("timestamp").as("__rt")) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)) ++
        leftPayload.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("__t"), lit(0).as("__side"),
        col(rightTime).cast("timestamp").as("__rt")) ++
        valueCols.map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // same deterministic tiebreak as asOf: equal-(key, time) right rows
    // order by value columns, so last() always lands on the greatest tuple
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc +: col("__side").asc +:
        valueCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("matched_time", last(col("__rt"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(v =>
        v -> last(col(v), ignoreNulls = true).over(w)).toMap)
      .filter(col("__side") === 1 && col("matched_time").isNotNull)
      .drop("__t", "__side", "__rt")
  }
}
