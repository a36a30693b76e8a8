package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.Streams

/** Streaming twins vs batch truth: the tumbling window aggregation must
  * match the batch operator on the same data; stateful sessionization must
  * close sessions across micro-batch boundaries.
  */
class StreamingSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts match batch tumbling on same data") {
    val streamed = Streams.runToMemory(
      Streams.tumblingCounts(Streams.eventsStream(spark, dir)),
      "tumbling_out", OutputMode.Complete())
      .select("window_start", "event_type", "n_events")
    val batch = Sessionize.tumbling(Tables.events(spark, dir))
      .select("window_start", "event_type", "n_events")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join matches the batch join on same data") {
    val streamed = Streams.runToMemory(
      Streams.viewClickJoin(Streams.eventsStream(spark, dir)),
      "vc_join_out", OutputMode.Append())
    val batch = Streams.viewClickJoin(Tables.events(spark, dir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup within watermark drops replayed event_ids") {
    // built-in streaming dedup: state holds one entry per key only until
    // the watermark passes — bounded state, the at-least-once-source answer
    val events = Streams.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val out = Streams.runToMemory(events, "dedup_out", OutputMode.Append())
    val batchDistinct = Tables.events(spark, dir).select("event_id").distinct()
    assert(out.count() == batchDistinct.count())
  }

  test("stream-static broadcast enrichment matches the batch join") {
    // the streaming form of q3's dimension enrichment: static dim is
    // broadcast once, each micro-batch map-side joins — no stream state
    val dim = Tables.nation(spark, dir)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("n_key", col("user_id") % 25)
      .join(broadcast(dim), col("n_key") === col("n_nationkey"))
      .select(col("event_id"), col("n_name"))
    val streamed = Streams.runToMemory(
      shape(Streams.eventsStream(spark, dir)), "ss_enrich_out",
      OutputMode.Append())
    val batch = shape(Tables.events(spark, dir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("incremental KMV estimate converges to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // inputs are pre-hashed (the map-side contract); kmvHashJvm must equal
    // the kmvHash expression for the batch comparison below to hold
    val batch1 = (1L to 60L).map(v => Streams.KmvIn("a", Streams.kmvHashJvm(v))) ++
      (1L to 6L).map(v => Streams.KmvIn("b", Streams.kmvHashJvm(v)))
    val batch2 = (30L to 100L).map(v => Streams.KmvIn("a", Streams.kmvHashJvm(v))) ++
      (5L to 10L).map(v => Streams.KmvIn("b", Streams.kmvHashJvm(v)))
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.KmvIn]
    val q = Streams.kmvStream(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("kmv_out").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // final estimate per group = the row with the max update counter
    val streamed = spark.table("kmv_out").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        g -> rs.maxBy(_.getAs[Long]("updates")).getAs[Double]("estimate")
      }
    // batch sketch over the RAW values — the streamed path hashed them
    // map-side with the identical hash, so the estimates must agree
    val raw = (1L to 60L).map(("a", _)) ++ (1L to 6L).map(("b", _)) ++
      (30L to 100L).map(("a", _)) ++ (5L to 10L).map(("b", _))
    val expected = graft.operators.Sketch.kmvDistinct(
      raw.toDF("grp", "value"), "grp", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed == expected)
  }

  test("stateful sessionization closes sessions on gap and keeps state") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000)
    // user 7: two events 10 min apart (one session), then a 2h gap
    val evs = Seq(
      Streams.Ev(1, ts(0), 7, 1.0),
      Streams.Ev(2, ts(10), 7, 2.0),
      Streams.Ev(3, ts(130), 7, 4.0),
      Streams.Ev(4, ts(5), 9, 8.0))
    implicit val sqlCtx = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    mem.addData(evs)
    val q = Streams.sessionizeStream(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("sess_out").as[Streams.SessionOut].collect()
    // only user 7's first session closed (2h gap); open sessions stay in state
    assert(closed.toSeq == Seq(
      Streams.SessionOut(7, 1, 2, ts(0), ts(10), 3.0)))
  }

  test("batch sessionize agrees with itself on fixture (structure)") {
    val s = Sessionize.sessions(Tables.events(spark, dir))
    val total = s.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, dir).count())
  }

  test("streaming session_window state merges across batch boundaries") {
    // the oracle query's own machinery: event-parity micro-batches force
    // nearly every session to be assembled from BOTH batches, so equality
    // with the one-shot batch answer proves the state store MERGED
    // partial sessions (not merely appended them)
    val streamed = graft.streaming.StreamOracles.sessionState(spark, dir)
    val batch = Sessionize.sessionsBuiltin(Tables.events(spark, dir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
