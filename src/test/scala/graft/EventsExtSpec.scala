package graft

import org.apache.spark.sql.Row

/** Semantic + plan checks for the round-6 session-4 events additions:
  * OLS trend, Gini concentration, survival curve, changepoint scan.
  * The cross-engine value gate is the DuckDB oracle; these tests pin the
  * statistical invariants and the scale-critical plan shapes.
  */
class EventsExtSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)
  private def planTree(q: String): String =
    run(q).queryExecution.executedPlan.toString

  // ------------------------------------------------------ events_trend_ols
  test("trend_ols: R² is a valid coefficient of determination") {
    val Row(n: Long, slope: Double, intercept: Double, r2: Double) =
      run("events_trend_ols").head()
    assert(n > 0)
    assert(!slope.isNaN && !intercept.isNaN)
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
  }

  test("trend_ols: single scan of events, no cartesian") {
    val p = planTree("events_trend_ols")
    assert(!p.contains("CartesianProduct"), p)
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "daily series read events more than once:\n" + p)
  }

  // ----------------------------------------------------------- events_gini
  test("gini: matches the direct sorted-rank formula on the fixture") {
    val Row(n: Long, total: Double, gini: Double) = run("events_gini").head()
    // independent O(n log n) recompute from the same exact per-user totals
    import graft.functions.Exact
    import org.apache.spark.sql.functions._
    val tv = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(Exact.xsum(col("value")).as("tv"))
      .select("tv").collect().map(_.getDouble(0)).sorted
    val nn = tv.length.toLong
    val srx = tv.zipWithIndex.map { case (x, i) => x * (i + 1L) }.sum
    val expected = 2.0 * srx / (nn * tv.sum) - (nn + 1.0) / nn
    assert(n == nn)
    assert(math.abs(gini - expected) < 1e-9, s"$gini vs $expected")
    assert(gini > 0.0 && gini < 1.0, s"gini=$gini")
    assert(total > 0.0)
  }

  test("gini: rank offsets never sort the user frame globally") {
    val p = planTree("events_gini")
    // the only unpartitioned window runs over the |buckets| frame; the
    // per-value window is PARTITIONED by bucket — so no plan node sorts
    // the full user frame in one partition: the single-partition sort
    // feeding the bucket-offset window must come after the bucket
    // aggregation, and the value-level window keeps its partition keys
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // bucket offsets ride back as a broadcast, never a shuffle join
    assert(p.contains("BroadcastHashJoin"),
      "bucket-offset join not broadcast:\n" + p)
  }

  // ------------------------------------------------------- events_survival
  test("survival: share is monotone nonincreasing from 1.0 at day 0") {
    val rows = run("events_survival").collect()
    assert(rows.length == 15)
    val shares = rows.map(_.getDouble(2))
    assert(shares.head == 1.0, s"day-0 share ${shares.head}")
    shares.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"survival increased: $a -> $b")
    }
  }

  test("survival: horizon expansion is a broadcast, counts collapse " +
    "map-side") {
    val p = planTree("events_survival")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "horizon dim not broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // ---------------------------------------------------- events_changepoint
  test("changepoint: top-k scores are positive, ranked, in range") {
    val rows = run("events_changepoint").collect()
    assert(rows.length == 3)
    val scores = rows.map(_.getDouble(2))
    scores.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"scores not ranked: $a -> $b")
    }
    assert(scores.forall(v => v >= 0.0 && !v.isNaN && !v.isInfinite))
    rows.foreach { r =>
      val k = r.getLong(1)
      assert(k >= 1, s"split index $k out of range")
    }
  }

  test("changepoint: global ranking collapses to TakeOrderedAndProject") {
    val p = planTree("events_changepoint")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k lost the heap-merge form:\n" + p)
  }
}
