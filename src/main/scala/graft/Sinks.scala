package graft

import org.apache.spark.sql.DataFrame

/** Sink surface (SURVEY §2.2): the reference's five durable tables become
  * parquet writes. Batch-partitioned layout gives lineage pruning (O2) and
  * makes "reset" (K5) a partition overwrite rather than TRUNCATE.
  *
  * At 100 TB: `partitionBy(batch_id)` bounds each write to the new batch;
  * dynamic partition overwrite replaces only re-run batches; the append-only
  * log sink (K4) never rewrites history.
  */
object Sinks {

  /** K1/K2 replacement: overwrite the durable state snapshot. */
  def writeState(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** O2: batch-partitioned state — dynamic overwrite touches only the
    * partitions present in `df`.
    */
  def writeBatchPartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)

  /** K4: append-only process log. */
  def appendLog(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
