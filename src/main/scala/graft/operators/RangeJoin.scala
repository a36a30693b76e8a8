package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — an operator Spark has no native physical
  * strategy for: a naive `l.ts BETWEEN r.start AND r.end` join plans as
  * BroadcastNestedLoopJoin (all-pairs per key), which is quadratic and
  * undistributable at scale.
  *
  * Bucketized formulation (the standard interval-join decomposition, as in
  * Flink's interval join and Spark range-join hints in closed-source forks):
  * quantize time into fixed-width buckets; each interval is exploded to the
  * buckets it overlaps, each point maps to exactly one bucket; the join
  * becomes a plain EQUI join on (keys…, bucket) — hash-partitioned, AQE- and
  * codegen-friendly — with the exact `BETWEEN` as a post-join refinement
  * filter.
  *
  * Scale properties: shuffle key is (key, bucket) so co-occurring intervals
  * distribute; interval replication factor = ceil(width/bucket)+1, so pick
  * `bucketMicros` near the median interval width (cost = replication ×
  * bucket collision rate). Long outlier intervals should be capped or
  * handled by a coarser second pass — replication is linear in their width.
  */
object RangeJoin {

  /** Equi-keys + point-in-[start,end] join (inclusive both ends, matching
    * ANSI BETWEEN). All of `pointCol`, `startCol`, `endCol` are timestamps;
    * quantization is exact integer epoch-micros arithmetic.
    */
  def pointInRange(points: DataFrame, ranges: DataFrame, keys: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    val pb = points.withColumn("__bucket",
      expr(s"unix_micros($pointCol) div $bucketMicros"))
    // _outer: a [start,end] range always spans ≥1 bucket, so the inferred
    // size>0 filter of a plain explode only re-evaluates the sequence()
    // below the Generate; a NULL bucket (null bounds) can't survive the
    // inner equi-join either way.
    val rb = ranges.withColumn("__bucket",
      explode_outer(sequence(
        expr(s"unix_micros($startCol) div $bucketMicros"),
        expr(s"unix_micros($endCol) div $bucketMicros"))))
    pb.join(rb, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (both sides are intervals — the Flink
    * interval-join / Postgres `&&` shape): equi keys + closed-interval
    * overlap `lStart ≤ rEnd AND rStart ≤ lEnd`. Both sides explode to the
    * buckets they span; the equi join on (keys…, bucket) finds every
    * overlapping pair in at least one shared bucket, and the
    * CANONICAL-BUCKET filter — keep the match only in the bucket of
    * `greatest(lStart, rStart)`, the overlap's start — makes each pair
    * survive EXACTLY once with no `distinct()` pass (floor is monotone, so
    * max of the floors IS the floor of the max, and the overlap start
    * always lies in the shared bucket range).
    *
    * Scale: replication = ceil(width/bucket)+1 per side; shuffle key is
    * (keys…, bucket) so long timelines distribute; no post-join dedup
    * exchange exists to become the bottleneck.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMicros: Long): DataFrame = {
    val lb = left.withColumn("__bucket",
      explode_outer(sequence(
        expr(s"unix_micros($lStart) div $bucketMicros"),
        expr(s"unix_micros($lEnd) div $bucketMicros"))))
    val rb = right.withColumn("__bucket",
      explode_outer(sequence(
        expr(s"unix_micros($rStart) div $bucketMicros"),
        expr(s"unix_micros($rEnd) div $bucketMicros"))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        greatest(expr(s"unix_micros($lStart) div $bucketMicros"),
          expr(s"unix_micros($rStart) div $bucketMicros")))
      .drop("__bucket")
  }
}
