package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RangeJoinRule optimizer rewrite: a session built with
  * GraftExtensions turns a naive BETWEEN join (BroadcastNestedLoopJoin)
  * into the bucketized equi join, with identical results; keyed interval
  * joins are left alone.
  */
class RangeJoinRuleSpec extends AnyFunSuite {

  private lazy val ext: SparkSession = {
    // getOrCreate returns any active session, which would skip the
    // extensions — force a fresh session (same SparkContext is fine)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def fixture = {
    import ext.implicits._
    val points = Seq(
      (1L, ts(1, 5)), (2L, ts(2, 10)), (3L, ts(5, 0)), (4L, ts(9, 23)))
      .toDF("pid", "p_ts")
    val ranges = Seq(
      (10L, ts(1, 0), ts(2, 12)),   // covers points 1, 2
      (20L, ts(2, 10), ts(3, 0)),   // covers point 2 (boundary inclusive)
      (30L, ts(6, 0), ts(8, 0)))    // covers nothing
      .toDF("rid", "r_start", "r_end")
    (points, ranges)
  }

  test("naive BETWEEN join is rewritten to a bucketized equi join, same result") {
    val (points, ranges) = fixture
    val joined = points.join(ranges,
      col("p_ts") >= col("r_start") && col("p_ts") <= col("r_end"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "rule did not fire:\n" + plan)
    assert(plan.contains("Generate"), "no interval explode:\n" + plan)
    val got = joined.select(col("pid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("mirrored orientation (ranges JOIN points) rewrites too") {
    val (points, ranges) = fixture
    val joined = ranges.join(points,
      col("p_ts") >= col("r_start") && col("p_ts") <= col("r_end"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "rule did not fire on the mirrored orientation:\n" + plan)
    assert(plan.contains("Generate"), "no interval explode:\n" + plan)
    val got = joined.select(col("pid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("equi-keyed interval join is left untouched") {
    val (points, ranges) = fixture
    val joined = points.withColumn("k", col("pid") % 2)
      .join(ranges.withColumn("k", col("rid") % 2), Seq("k"))
      .filter(col("p_ts") >= col("r_start") && col("p_ts") <= col("r_end"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "rule fired on a keyed join:\n" + plan)
    assert(joined.count() >= 0) // executes cleanly
  }

  test("interval-OVERLAP join is rewritten, pairs exactly once, same set") {
    import ext.implicits._
    val lhs = Seq(
      (1L, ts(1, 0), ts(3, 0)),     // overlaps 10 and 20
      (2L, ts(4, 0), ts(4, 12)),    // overlaps 20 (boundary) and 30
      (3L, ts(20, 0), ts(21, 0)))   // overlaps nothing
      .toDF("lid", "l_start", "l_end")
    val rhs = Seq(
      (10L, ts(2, 12), ts(2, 18)),
      (20L, ts(2, 20), ts(4, 0)),
      (30L, ts(4, 6), ts(9, 0)))    // wide: spans multiple day buckets
      .toDF("rid", "r_start", "r_end")
    val joined = lhs.join(rhs,
      col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "overlap rule did not fire:\n" + plan)
    assert("Generate".r.findAllIn(plan).size >= 2,
      "both sides must explode to bucket spans:\n" + plan)
    val got = joined.select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length,
      "canonical-bucket filter must keep each pair exactly once")
    assert(got.toSet == Set((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L)))
  }

  test("bucket width is configurable and boundary-inclusive across buckets") {
    ext.conf.set(graft.plans.RangeJoinRule.BucketConf, (3600L * 1000000L).toString)
    try {
      val (points, ranges) = fixture
      val joined = points.join(ranges,
        col("p_ts") >= col("r_start") && col("p_ts") <= col("r_end"))
        .select(col("pid"), col("rid"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L)))
    } finally ext.conf.unset(graft.plans.RangeJoinRule.BucketConf)
  }
}
