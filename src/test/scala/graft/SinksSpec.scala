package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.operators.ScdMerge

/** Executes the real executor-side JDBC upsert path against embedded Derby
  * (already on Spark's classpath — no new dependency): the batched
  * update-then-insert dialect must reproduce exactly the state the
  * oracle-checked ScdMerge Type-1 merge computes, and re-running the same
  * upsert must be a no-op. This is the reference's actual K1/K2 sink
  * semantics (`SQL:188-248`) driven end-to-end through a real database.
  */
class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("jdbcUpsert reproduces ScdMerge Type-1 state through embedded Derby") {
    // keep derby.log out of the repo working tree
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_upsert;create=true"
    val conn = DriverManager.getConnection(url)
    // quoted lower-case identifiers — the quoting path is part of the test
    try conn.createStatement().execute(
      """CREATE TABLE "rates" ("k" VARCHAR(32) NOT NULL PRIMARY KEY,
        |  "v" DOUBLE, "batch_id" VARCHAR(32))""".stripMargin)
    finally conn.close()
    val props = new Properties()
    val dialect = Sinks.UpdateThenInsert()

    def tableRows(): Seq[(String, Double, String)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          """SELECT "k", "v", "batch_id" FROM "rates" ORDER BY "k"""")
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double, String)]
        while (rs.next())
          buf += ((rs.getString(1), rs.getDouble(2), rs.getString(3)))
        buf.toSeq
      } finally c.close()
    }

    // initial load: all keys absent → pure insert branch
    val target = Seq(("a", 1.0, "b0"), ("b", 2.0, "b0"))
      .toDF("k", "v", "batch_id")
    Sinks.jdbcUpsert(target, url, "rates", Seq("k"), props,
      batchSize = 1, dialect = dialect) // batchSize=1 exercises mid-stream flushes
    assert(tableRows() == Seq(("a", 1.0, "b0"), ("b", 2.0, "b0")))

    // Type-1 merge of a new batch (update b, insert c, carry a), pushed
    // through the JDBC path — table state must equal the merged frame
    val cfg = ScdMerge.Config(keys = Seq("k"), valueCol = "v", scd2 = false)
    val batch = Seq(("b", 5.0), ("c", 3.0)).toDF("k", "v")
      .withColumn("batch_id", lit("b1"))
    val merged = ScdMerge.merge(batch, target, cfg,
      lit("2026-02-02 00:00:00").cast("timestamp"),
      lit("2026-02-02").cast("date"), lit("b1"))
      .drop(ScdMerge.ChangeCol)
    val expected = merged.orderBy("k").collect().map(r =>
      (r.getAs[String]("k"), r.getAs[Double]("v"),
        r.getAs[String]("batch_id"))).toSeq
    Sinks.jdbcUpsert(merged, url, "rates", Seq("k"), props, dialect = dialect)
    assert(tableRows() == expected)
    assert(expected.map(t => (t._1, t._2)) ==
      Seq(("a", 1.0), ("b", 5.0), ("c", 3.0)))

    // idempotence: replaying the same merged frame changes nothing
    Sinks.jdbcUpsert(merged, url, "rates", Seq("k"), props, dialect = dialect)
    assert(tableRows() == expected)
  }

  test("jdbcUpsert binds NULL values with their JDBC type (Derby 22005)") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graft_upsert_null;create=true"
    val conn = DriverManager.getConnection(url)
    // NULLable value + timestamp — SCD output carries NULL updated_at on
    // every insert/version row, so the sink must bind typed nulls
    try conn.createStatement().execute(
      """CREATE TABLE "state" ("k" VARCHAR(32) NOT NULL PRIMARY KEY,
        |  "v" DOUBLE, "updated_at" TIMESTAMP)""".stripMargin)
    finally conn.close()
    val df = Seq(("a", Some(1.0)), ("b", None))
      .toDF("k", "v")
      .withColumn("updated_at", lit(null).cast("timestamp"))
    Sinks.jdbcUpsert(df, url, "state", Seq("k"), new Properties(),
      dialect = Sinks.UpdateThenInsert())
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        """SELECT "k", "v", "updated_at" FROM "state" ORDER BY "k"""")
      rs.next()
      assert(rs.getString(1) == "a" && rs.getDouble(2) == 1.0)
      rs.next()
      assert(rs.getString(1) == "b")
      rs.getDouble(2); assert(rs.wasNull())
      assert(rs.getTimestamp(3) == null)
    } finally c.close()
  }

  test("Postgres dialect emits the ON CONFLICT grammar with full-row binds") {
    // The text itself is EXECUTED for real (DuckDB speaks the same
    // clause) by tools/check_pg.py over the graft.PgDialect dump,
    // idempotent-replay included; this pins the generated grammar and
    // bind order so a refactor can't silently change what that gate runs.
    val Seq((sql, bind)) = Sinks.upsertStatements(
      Seq("key1", "key2", "value", "batch_id"), Seq("key1", "key2"),
      "rates", Sinks.PostgresOnConflict)
    assert(sql.contains("""INSERT INTO "rates" ("key1", "key2", "value", "batch_id")"""), sql)
    assert(sql.contains("""ON CONFLICT ("key1", "key2")"""), sql)
    assert(sql.contains(
      """DO UPDATE SET "value" = EXCLUDED."value", "batch_id" = EXCLUDED."batch_id""""), sql)
    assert(bind == Seq("key1", "key2", "value", "batch_id"))
    // key-only frame degrades to DO NOTHING (no non-key columns to set)
    val Seq((keyOnly, _)) = Sinks.upsertStatements(
      Seq("k"), Seq("k"), "t", Sinks.PostgresOnConflict)
    assert(keyOnly.contains("DO NOTHING"), keyOnly)
  }
}
