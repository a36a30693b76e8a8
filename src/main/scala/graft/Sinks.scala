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

  /** K1/K2 against a real PostgreSQL target: the reference's row-at-a-time
    * `CALL insert_or_update_…` loop (ipynb:224-235, one network round trip
    * per row) becomes ONE merged frame (ScdMerge) written back with batched
    * `INSERT … ON CONFLICT DO UPDATE` statements, `batchSize` rows per
    * round trip, one connection per partition. SERIAL identity columns are
    * simply omitted from the column list — the database assigns them
    * (SURVEY §1.2).
    *
    * Executor-side JDBC (`foreachPartition`) rather than `df.write.jdbc`
    * because plain mode("append") cannot express upsert; the statement is
    * built once per partition and reused. Zero-egress harness has no
    * database, so this surface is exercised by the merged-frame parquet
    * twins above and left deliberately dependency-free (java.sql only).
    */
  def jdbcUpsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], props: java.util.Properties,
      batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    val sql = s"""INSERT INTO $table (${cols.mkString(", ")})
                 |VALUES (${cols.map(_ => "?").mkString(", ")})
                 |ON CONFLICT (${keyCols.mkString(", ")})
                 |DO UPDATE SET $updates""".stripMargin
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch()
          n += 1
          if (n % batchSize == 0) st.executeBatch()
        }
        st.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }
}
