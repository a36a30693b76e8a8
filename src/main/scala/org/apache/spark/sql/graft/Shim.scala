package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: wrapping a custom
  * [[LogicalPlan]] node back into a public `DataFrame`
  * (`Dataset.ofRows` — the same entry point Spark's own `sql()`/`table()`
  * use). Everything else in graft sticks to the public API; this shim
  * exists solely so [[graft.plans.AsOfJoinPhys]] can hand its logical
  * node to the analyzer/planner pipeline, the standard technique for
  * third-party plan extensions.
  */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
