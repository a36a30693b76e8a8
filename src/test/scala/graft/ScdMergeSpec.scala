package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ScdMerge

/** SCD decision-table suite (SURVEY.md §2.5, FIXTURES.md A3): every branch of
  * the reference's `insert_or_update_world_bank_data` (SQL:20-122) plus the
  * deactivation shields (SQL:126-140) and the idempotence golden pattern
  * (first run = all inserts, re-run = all no-ops — notebook cell-5 output).
  */
class ScdMergeSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = ScdMerge.Config(keys = Seq("bank_name"), valueCol = "cap")
  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val clockTs = lit("2026-02-02 00:00:00").cast("timestamp")
  private val clockDate = lit("2026-02-02").cast("date")

  // target: bank_name, cap, batch_id, active, updated_at
  private def target: DataFrame = Seq(
    ("SameBank",   200.0, "b0", true,  Some(t0)),
    ("ChangedBank", 300.0, "b0", true,  Some(t0)),
    ("SleepyBank", 400.0, "b0", false, Some(t0)),
    ("GhostBank",  500.0, "b0", false, Some(t0)),
    ("GoneBank",   600.0, "b0", true,  Some(t0)),
    ("TodayBank",  700.0, "b0", true,
      Some(Timestamp.valueOf("2026-02-02 00:00:00"))),
    ("FreshBank",  800.0, "b0", true,  None),
  ).toDF("bank_name", "cap", "batch_id", "active", "updated_at")

  private def incoming: DataFrame = Seq(
    ("NewBank",    100.0),
    ("SameBank",   200.0),
    ("ChangedBank", 310.0),
    ("SleepyBank", 400.0),
    ("GhostBank",  510.0),
  ).toDF("bank_name", "cap").withColumn("batch_id", lit("b1"))

  private def run(): Map[String, Seq[(Double, String, Boolean)]] =
    ScdMerge.merge(incoming, target, cfg, clockTs, clockDate, lit("b1"))
      .collect()
      .map(r => (r.getAs[String]("bank_name"),
        (r.getAs[Double]("cap"), r.getAs[String]("change_type"),
          r.getAs[Boolean]("active"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._2)).toMap

  test("all five merge branches classify per the decision table") {
    val out = run()
    assert(out("NewBank") == Seq((100.0, "insert", true)))
    assert(out("SameBank") == Seq((200.0, "no_change", true)))
    assert(out("ChangedBank") == Seq((310.0, "update", true)))
    assert(out("SleepyBank") == Seq((400.0, "reactivate", true)))
    // version: new active row + superseded row kept inactive (SQL:72-91)
    assert(out("GhostBank") ==
      Seq((510.0, "version", true), (500.0, "version_history", false)))
  }

  test("deactivation hits stale rows, shields same-day and NULL updated_at") {
    val out = run()
    assert(out("GoneBank") == Seq((600.0, "deactivate", false)))
    // same-day shield: updated_at == CURRENT_DATE is NOT < CURRENT_DATE
    assert(out("TodayBank") == Seq((700.0, "carry", true)))
    // NULL shield: updated_at IS NOT NULL required (SQL:134)
    assert(out("FreshBank") == Seq((800.0, "carry", true)))
  }

  test("updated_at quirks: NULL on insert/version, stamped on update") {
    val rows = ScdMerge.merge(incoming, target, cfg, clockTs, clockDate,
      lit("b1")).collect()
      .map(r => r.getAs[String]("bank_name") -> (
        Option(r.getAs[Timestamp]("updated_at")),
        r.getAs[String]("change_type"))).toMap
    assert(rows("NewBank")._1.isEmpty)                    // SQL:109 quirk
    assert(rows("ChangedBank")._1.contains(
      Timestamp.valueOf("2026-02-02 00:00:00")))
    val ghost = ScdMerge.merge(incoming, target, cfg, clockTs, clockDate,
      lit("b1")).filter(col("change_type") === "version").collect()
    assert(ghost.head.getAs[Timestamp]("updated_at") == null) // SQL:88 quirk
  }

  test("counters match the reference's log_counts semantics") {
    val merged = ScdMerge.merge(incoming, target, cfg, clockTs, clockDate,
      lit("b1"))
    val c = ScdMerge.counters(merged, lit("b1"), "world_bank_data")
      .collect().head
    assert(c.getAs[Long]("no_update_count") == 1)
    assert(c.getAs[Long]("update_count") == 1)
    assert(c.getAs[Long]("new_inserts_count") == 1)
    assert(c.getAs[Long]("reactivate_count") == 1)
    assert(c.getAs[Long]("version_count") == 1)
    assert(c.getAs[Long]("deactivate_count") == 1)
  }

  test("first-run/rerun golden pattern: N inserts then N no-ops") {
    val empty = target.limit(0)
    val first = ScdMerge.merge(incoming, empty, cfg, clockTs, clockDate,
      lit("b1"))
    assert(first.filter(col("change_type") === "insert").count() == 5)
    // feed the merged state back as the target with the same batch
    val rerun = ScdMerge.merge(
      incoming,
      first.drop("change_type"),
      cfg, clockTs, clockDate, lit("b1"))
    assert(rerun.filter(col("change_type") === "no_change").count() == 5)
    assert(rerun.filter(
      col("change_type").isin("insert", "update", "deactivate")).count() == 0)
  }

  test("duplicate incoming keys deduplicate deterministically (max value)") {
    val dup = incoming.unionByName(
      Seq(("NewBank", 90.0)).toDF("bank_name", "cap")
        .withColumn("batch_id", lit("b1")))
    val out = ScdMerge.merge(dup, target, cfg, clockTs, clockDate, lit("b1"))
      .filter(col("bank_name") === "NewBank").collect()
    assert(out.length == 1 && out.head.getAs[Double]("cap") == 100.0)
  }

  test("NULL value comparison routes to the changed branch (plpgsql 3VL)") {
    // plpgsql `IF value = incoming` with NULL is not-true → ELSIF update
    // branch (SQL:42-56); the when-chain must do the same
    val tgt = Seq(("NullBank", Option.empty[Double], "b0", true, Some(t0)),
      ("ValBank", Some(100.0), "b0", true, Some(t0)))
      .toDF("bank_name", "cap", "batch_id", "active", "updated_at")
    val inc = Seq(("NullBank", Some(50.0)), ("ValBank", Option.empty[Double]))
      .toDF("bank_name", "cap").withColumn("batch_id", lit("b1"))
    val out = ScdMerge.merge(inc, tgt, cfg, clockTs, clockDate, lit("b1"))
      .collect().map(r => r.getAs[String]("bank_name") ->
        r.getAs[String]("change_type")).toMap
    assert(out == Map("NullBank" -> "update", "ValBank" -> "update"))
  }

  test("empty incoming: actives deactivate when stale, shields hold") {
    val inc = incoming.limit(0)
    val out = ScdMerge.merge(inc, target, cfg, clockTs, clockDate, lit("b1"))
      .collect().map(r => r.getAs[String]("bank_name") ->
        r.getAs[String]("change_type")).toMap
    // all active+stale rows deactivate; inactive ones carry; shields hold
    assert(out("SameBank") == "deactivate")
    assert(out("GoneBank") == "deactivate")
    assert(out("SleepyBank") == "carry")   // inactive — never deactivated
    assert(out("TodayBank") == "carry")    // same-day shield
    assert(out("FreshBank") == "carry")    // NULL updated_at shield
  }

  test("same-batch target rows never deactivate (batch_id shield, SQL:132)") {
    // a stale active row already stamped with the CURRENT batch id must not
    // be deactivated even when absent from the incoming frame
    val tgt = Seq(("ReRunBank", 100.0, "b1", true, Some(t0)))
      .toDF("bank_name", "cap", "batch_id", "active", "updated_at")
    val inc = incoming.filter(col("bank_name") === "nope")
    val out = ScdMerge.merge(inc, tgt, cfg, clockTs, clockDate, lit("b1"))
      .collect().head
    assert(out.getAs[String]("change_type") == "carry")
    assert(out.getAs[Boolean]("active"))
  }

  test("Type-1 variant has no active/updated_at and never deactivates") {
    val t1cfg = cfg.copy(scd2 = false)
    val tgt = Seq(("A", 1.0, "b0"), ("B", 2.0, "b0"), ("C", 3.0, "b0"))
      .toDF("bank_name", "cap", "batch_id")
    val inc = Seq(("B", 2.0), ("C", 9.0), ("D", 4.0))
      .toDF("bank_name", "cap").withColumn("batch_id", lit("b1"))
    val out = ScdMerge.merge(inc, tgt, t1cfg, clockTs, clockDate, lit("b1"))
    assert(!out.columns.contains("active"))
    val m = out.collect().map(r =>
      r.getAs[String]("bank_name") -> r.getAs[String]("change_type")).toMap
    assert(m == Map("A" -> "carry", "B" -> "no_change", "C" -> "update",
      "D" -> "insert"))
  }
}
