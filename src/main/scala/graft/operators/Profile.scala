package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before and
  * after every transformation stage: per-column null count, distinct
  * count, and min/max (stringified so heterogeneous column types share one
  * output schema, the standard profile-report shape).
  *
  * One pass per column over the same scan; each is a partial+final hash
  * aggregate, so profiling N columns of a 100 TB table is N parallel
  * single-shuffle aggregations over one shared scan (Spark reuses the scan
  * via exchange reuse when the plans are identical). `countDistinct` is
  * exact here — swap in [[Sketch.kmvDistinct]] or HLL when the profile only
  * needs estimates.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(when(col(c).isNull, 1)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }.reduce(_.unionByName(_)).orderBy(col("col_name"))

  def sqlProfile(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
}
