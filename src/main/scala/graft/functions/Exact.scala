package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-decimal aggregation helpers for cross-engine determinism.
  *
  * Double addition is not associative, and Spark's partial/final hash
  * aggregation sums partitions in a nondeterministic order — so a raw
  * `sum(double)` can differ from a single-threaded oracle in the last few
  * ulps. Casting every addend to a fixed-scale decimal first makes the sum
  * exact (order-independent); the final cast back to double is then a single
  * deterministic rounding, bit-identical across Spark and any ANSI engine.
  *
  * Per-row arithmetic (`x * (1 - d)`) stays in IEEE-754 double: it is
  * deterministic per row in every engine; only the *aggregation* needs the
  * decimal detour. This also keeps the per-row expressions inside
  * whole-stage codegen.
  */
object Exact {
  val Dec: DecimalType = DecimalType(28, 12)

  /** Order-independent exact sum of a double expression, returned as double.
    *
    * The result is first rescaled to `scale` decimals: engines convert
    * DECIMAL→DOUBLE differently (DuckDB: int128→double, then ÷10^scale — two
    * roundings; Spark BigDecimal: one correct rounding). If the rescaled
    * integer representation fits in 2^53 both paths are exact-then-single-
    * rounding and bit-identical. Pick `scale` so |sum|·10^scale < 9·10^15:
    * money-like sums → 2, small ratios/quantities → 6.
    */
  def xsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(Dec)).cast(DecimalType(38, scale)).cast("double")

  /** Deterministic average: exact rescaled sum / count, divided in double.
    * count(c), not count(*): xsum skips NULLs, so the divisor must too or
    * a nullable column gets a silently deflated mean (AVG semantics).
    */
  def xavg(c: Column, scale: Int = 6): Column =
    xsum(c, scale) / count(c)

  /** DuckDB-SQL mirror of [[xsum]] for oracle queries. DuckDB's
    * decimal→decimal downscale cast truncates; `ROUND(decimal, n)` rounds
    * half-away-from-zero, which matches Spark's HALF_UP rescale.
    */
  def sqlSum(e: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST(($e) AS DECIMAL(28,12))), $scale) AS DOUBLE)"

  /** DuckDB-SQL mirror of [[xavg]] (COUNT(expr) skips NULLs, like xavg). */
  def sqlAvg(e: String, scale: Int = 6): String =
    s"(${sqlSum(e, scale)} / COUNT($e))"
}
