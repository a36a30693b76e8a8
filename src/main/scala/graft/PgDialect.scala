package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the artifacts for executing the PostgreSQL upsert grammar for real.
  *
  * The reference's actual sink is PostgreSQL (`SQL:188-248` — the rates
  * Type-1 upsert). `Sinks.jdbcUpsert` round-trips through embedded Derby in
  * `SinksSpec`, but Derby parses the [[Sinks.UpdateThenInsert]] dialect,
  * never the `INSERT … ON CONFLICT DO UPDATE` text a Postgres deployment
  * would run. DuckDB (the oracle engine already in the toolchain) speaks
  * `ON CONFLICT`, so this main dumps:
  *
  *   - `seed/`  — the pre-merge target state (b0): stale values for update
  *                keys, rows absent for insert keys → the replay exercises
  *                both the DO UPDATE and the plain-insert arm;
  *   - `rows/`  — the merged Type-1 state (q8_upsert_type1 minus the
  *                change_type telemetry column), i.e. what jdbcUpsert
  *                would write, in deterministic key order;
  *   - `statement.sql` + `meta.json` — the EXACT Postgres-dialect
  *                statement text `Sinks.upsertStatements` generates, and
  *                its bind column order + key columns.
  *
  * `tools/check_pg.py` then creates the keyed table in DuckDB, seeds it,
  * executes the statement text per row, and asserts the final table equals
  * `rows/` — twice, so idempotent replay is part of the contract.
  *
  * Usage: runMain graft.PgDialect <sfDir> <outDir>
  */
object PgDialect {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stateCols = Seq("key1", "key2", "value", "batch_id")
    val keyCols = Seq("key1", "key2")

    // the same construction as q8_upsert_type1's target frame (b0 state)
    val c = Tables.customer(spark, sfDir)
    val m = col("c_custkey") % 4
    val seed = c.filter(m <= 2).select(
      col("c_custkey").as("key1"), col("c_mktsegment").as("key2"),
      col("c_acctbal").as("value"), lit("b0").as("batch_id"))

    // the merged Type-1 state jdbcUpsert would ship (telemetry dropped)
    val rows = SparkEntry.queries("q8_upsert_type1")(spark, sfDir)
      .select(stateCols.map(col): _*)

    seed.coalesce(1).write.mode("overwrite").parquet(s"$outDir/seed")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$outDir/rows")

    val Seq((sql, bindOrder)) = Sinks.upsertStatements(
      stateCols, keyCols, "rates", Sinks.PostgresOnConflict)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "statement.sql"),
      sql.getBytes("UTF-8"))
    val meta =
      s"""{"table": "rates",
         | "bind_order": [${bindOrder.map("\"" + _ + "\"").mkString(", ")}],
         | "key_cols": [${keyCols.map("\"" + _ + "\"").mkString(", ")}]}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "meta.json"), meta.getBytes("UTF-8"))
    spark.stop()
  }
}
