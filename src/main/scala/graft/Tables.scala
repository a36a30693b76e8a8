package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the shared fixture tables (repo TESTDATA.md).
  *
  * Plain `spark.read.parquet` keeps the scan declarative so Catalyst applies
  * column pruning and predicate pushdown (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At the 100 TB
  * design point the same call reads a partitioned directory tree; nothing
  * here assumes single-file layout.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    * rejects. Read nanos as long (legacy flag) and truncate to micros with
    * exact integer division (`div`, not `/` — a double round-trip of an
    * epoch-nanos value loses precision). Oracles must mirror with
    * `CAST(ts AS TIMESTAMP)` when they output the raw timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
