package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming run-mode: watermarked window aggregation, stateful
  * sessionization, stream-stream interval join, incremental near-dup
  * admission, incremental KMV distinct estimation, and the `foreachBatch`
  * SCD load — the streaming twins of the batch operators
  * ([[graft.operators.Sessionize]], [[graft.operators.Dedup]],
  * [[graft.operators.Sketch]], [[graft.operators.ScdMerge]]).
  *
  * Design for scale: state is keyed (hash-partitioned by the streaming
  * aggregation itself) and BOUNDED — watermarks bound window/join state,
  * the dedup state is one band row per admitted doc, the KMV state is k
  * longs per group. Batch and streaming paths share transform logic so
  * correctness is established once by the batch oracle and the streaming
  * tests prove the plumbing (schema, watermark, state transitions,
  * batch-boundary continuity, streaming-equals-batch).
  */
object Streams {

  /** Explicit source schema — a streaming source cannot infer. `ts`'s
    * physical type follows the fixture (see [[graft.Tables.events]]):
    * TIMESTAMP(NANOS) parquet arrives as long via the legacy flag and is
    * floor-truncated to micros; TIMESTAMP(MICROS)/NTZ parquet is cast to
    * TIMESTAMP under the UTC session.
    */
  def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
  val EventsSchema: StructType = eventsSchema(LongType)

  /** @param dir the fixture directory (a FileStreamSource path must be a
    *             directory; the glob narrows it to the events table)
    *
    * The `ts` physical type is sniffed from the batch footer ONCE (streaming
    * sources cannot infer), then every micro-batch reads with the matching
    * declared schema — the streaming twin of [[graft.Tables.events]]'s
    * adaptation.
    *
    * SIDE EFFECT: sets `spark.sql.legacy.parquet.nanosAsLong` for the
    * session (the flag must hold for every micro-batch read, so it cannot
    * be scoped to this call) — the same session-wide choice
    * [[graft.Tables.events]] makes for the batch path. Any OTHER
    * TIMESTAMP(NANOS) parquet read in the session will also see longs.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = graft.Tables(spark, dir, "events").schema("ts").dataType
    val raw = spark.readStream.schema(eventsSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts",
        // floor division, exactly like Tables.events
        expr("timestamp_micros((ts - ((ts % 1000 + 1000) % 1000)) div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window aggregation — streaming twin of
    * Sessionize.tumbling.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  // ------------------------------------------------ stateful sessionization
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      value: Double)
  final case class SessionState(sessionSeq: Long, lastTsUs: Long,
      n: Long, startUs: Long, total: Double)
  final case class SessionOut(user_id: Long, session_seq: Long,
      n_events: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, total_value: Double)

  val GapMicros: Long = graft.operators.Sessionize.GapMicros

  /** Gap-based session assembly with explicit keyed state: closed sessions
    * are emitted; the open session rides in `GroupState` across
    * micro-batches (the continuity batch mode cannot provide).
    */
  def sessionFunc(userId: Long, rows: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
    def toTs(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(u / 1000)
      t.setNanos((u % 1000000).toInt * 1000)
      t
    }
    val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
    var cur = state.getOption
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = us(e.ts)
      cur match {
        case Some(s) if t - s.lastTsUs <= GapMicros =>
          // max/min, never plain assignment: batches are sorted internally
          // but a LATER micro-batch can deliver an event older than the
          // carried state — rewinding lastTsUs would make the next event
          // see a phantom gap and falsely split the session
          cur = Some(s.copy(lastTsUs = math.max(s.lastTsUs, t),
            startUs = math.min(s.startUs, t),
            n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          out += SessionOut(userId, s.sessionSeq, s.n, toTs(s.startUs),
            toTs(s.lastTsUs), s.total)
          cur = Some(SessionState(s.sessionSeq + 1, t, 1, t, e.value))
        case None =>
          cur = Some(SessionState(1, t, 1, t, e.value))
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  def sessionizeStream(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionFunc)
  }

  // ----------------------------------------------- streaming as-of enrich
  final case class AsOfEv(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  /** The carried right side: the max-(ts, id) "view" seen so far per key. */
  final case class AsOfState(viewTsUs: Long, viewId: Long, viewValue: Double)
  final case class AsOfOut(user_id: Long, purchase_id: Long,
      purchase_ts: java.sql.Timestamp, view_id: Option[Long],
      view_ts: Option[java.sql.Timestamp], view_value: Option[Double])

  /** Per-key streaming AS-OF enrichment: each "purchase" is stamped with
    * the same user's LATEST PRECEDING "view" — the classic as-of join
    * (quote-at-trade) run as keyed state instead of a buffered two-sided
    * join. The right side needs no buffer at all: as-of(backward) only
    * ever reads the most recent version, so the whole right-side history
    * collapses to ONE (ts, id, value) triple per key — the reason this
    * shape scales where an interval join's state would hold an hour of
    * both sides.
    *
    * "Preceding" is the TOTAL order (ts, event_id) — unique ids break ts
    * ties exactly like the batch oracle's lexicographic predicate, so the
    * semantics are deterministic even on tie timestamps. Within a batch the
    * group sorts by that key; across batches the state-replace guard is
    * max-keyed (a later batch may replay an OLDER view without rewinding
    * the carried version — the [[sessionFunc]] discipline). Purchases,
    * unlike views, must arrive in as-of order across batches: the oracle
    * contract requires time-split micro-batches (the [[StreamOracles]]
    * split), since a purchase delivered before its preceding view would be
    * stamped with an earlier version — exactly what a production as-of
    * stream would emit, and why trading systems sequence their feeds.
    */
  def asOfFunc(userId: Long, rows: Iterator[AsOfEv],
      state: GroupState[AsOfState]): Iterator[AsOfOut] = {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
    def toTs(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(u / 1000)
      t.setNanos((u % 1000000).toInt * 1000)
      t
    }
    val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
    var st = state.getOption
    val out = Seq.newBuilder[AsOfOut]
    sorted.foreach { e =>
      e.event_type match {
        case "view" =>
          val t = us(e.ts)
          if (st.forall(s =>
              t > s.viewTsUs || (t == s.viewTsUs && e.event_id > s.viewId)))
            st = Some(AsOfState(t, e.event_id, e.value))
        case "purchase" =>
          out += AsOfOut(userId, e.event_id, e.ts, st.map(_.viewId),
            st.map(s => toTs(s.viewTsUs)), st.map(_.viewValue))
        case _ => ()
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  def asOfStream(events: Dataset[AsOfEv]): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(asOfFunc)
  }

  /** Drive a streaming DataFrame to completion against a memory sink and
    * return the collected table (local test harness path).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }

  /** Stream-stream interval join: every "view" pairs with the same user's
    * "click" events landing within the following 30 minutes. Both sides are
    * watermarked so the join state is BOUNDED: a buffered view can be
    * dropped once the click-side watermark passes view_ts + 30 min, and
    * vice versa — without the time bound the state would grow forever.
    * State is hash-partitioned by user_id like every other keyed op here.
    */
  def viewClickJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Incremental near-dup dedup: admit only micro-batch documents that
    * share no MinHash/LSH band with the already-admitted corpus (or with an
    * earlier doc of the same batch); admitted docs' bands append to the
    * durable state. The state is exactly [[graft.operators.Dedup.minhashBands]]
    * — `(doc_id, band_idx, band_key)` — so corpus membership checks are one
    * hash-partitioned semi-join per batch regardless of corpus size.
    *
    * @return (admitted docs, their bands to append to state)
    */
  def dedupBatch(newDocs: DataFrame, stateBands: DataFrame)
      : (DataFrame, DataFrame) = {
    // pin the batch's band frame: BOTH returned frames derive from it and
    // a caller consuming them with separate actions (write admitted docs,
    // write state bands — the foreachBatch shape) would otherwise run the
    // whole signature subtree once per action
    val newBands = graft.operators.Iterate.pin(
      graft.operators.Dedup.minhashBands(newDocs))
    val dupOfState = newBands
      .join(stateBands, Seq("band_idx", "band_key"), "left_semi")
      .select(col("doc_id")).distinct()
    // within-batch collisions from the SAME band frame — calling
    // minhashPairs(newDocs) here would recompute the whole signature
    // pipeline a second time per micro-batch and drag in its global
    // orderBy; the victim set is every doc colliding with a lower-id doc
    // (doc_b of each a<b pair), exactly what the shared expansion emits
    val dupWithinBatch = graft.operators.Dedup.bandCollisionPairs(newBands)
      .select(col("doc_b").as("doc_id")).distinct()
    // NOT pinned: everything below the pinned band frame is two small
    // joins over k-bounded band rows — an eager pin here cost a
    // scheduler round-trip per micro-batch, more than the recompute it
    // saved when a caller consumes both returned frames
    val victims = dupOfState.unionByName(dupWithinBatch).distinct()
    val admitted = newDocs.join(victims, Seq("doc_id"), "left_anti")
    val admittedBands = newBands.join(victims, Seq("doc_id"), "left_anti")
    (admitted, admittedBands)
  }

  /** Incremental train/eval decontamination: screen a micro-batch of
    * TRAINING docs against a STATIC eval-side LSH index (the durable
    * band + shingle-set tables a deployment builds ONCE from its eval
    * suites), verify the band-colliding candidates with exact Jaccard,
    * and emit the verified hits — the streaming admission-check form of
    * [[graft.operators.Dedup.minhashDecon]]. Candidate generation is
    * the band join (never all-pairs); the exact verify touches ONLY
    * colliding (train, eval) pairs; each train doc's verdict depends on
    * nothing but its own text and the static index, so the hit stream
    * is order- and batching-independent.
    *
    * @param evalBands static (doc_id, band_idx, band_key) eval index
    * @param evalSets  static (doc_id, sh) sorted shingle sets
    * @return verified hits (train_id, eval_id, jac) for this batch
    */
  def deconBatch(newDocs: DataFrame, evalBands: DataFrame,
      evalSets: DataFrame): DataFrame =
    deconBatchFrom(newDocs, graft.operators.Iterate.pin(
      graft.operators.Dedup.minhashBands(newDocs)), evalBands, evalSets)

  /** [[deconBatch]] with the batch's band frame supplied by the caller —
    * the composition point for funnels that ALREADY computed the batch's
    * bands for dedup admission ([[graft.streaming.StreamOracles.corpusState]]):
    * bands are a per-doc deterministic map of the text, so the admitted
    * docs' band rows ARE `minhashBands(admitted)` and re-running the
    * signature chain (words → md5 token hashes → shingles → 8 minhash
    * components) a second time per micro-batch buys nothing. The exact
    * verify's shingle sets are additionally built only for docs that
    * band-collide with the eval index (a semi-join on the candidate ids
    * — an inner join on train_id follows, so the restriction is
    * result-identical and the O(|batch| · tokens) set construction
    * shrinks to the collision set).
    */
  def deconBatchFrom(newDocs: DataFrame, newBands: DataFrame,
      evalBands: DataFrame, evalSets: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(newDocs.sparkSession)
    val cands = newBands
      .join(evalBands.select(col("doc_id").as("eval_id"), col("band_idx"),
        col("band_key")), Seq("band_idx", "band_key"))
      .select(col("doc_id").as("train_id"), col("eval_id"))
      .distinct()
    val trainSets = graft.operators.Dedup.shingleSets(
      newDocs.join(cands.select(col("train_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi"))
    cands
      .join(trainSets.select(col("doc_id").as("train_id"),
        col("sh").as("sh_t")), Seq("train_id"))
      .join(evalSets.select(col("doc_id").as("eval_id"),
        col("sh").as("sh_e")), Seq("eval_id"))
      .select(col("train_id"), col("eval_id"),
        graft.functions.VectorExprs
          .intersectCountSorted(col("sh_t"), col("sh_e")).as("i"),
        size(col("sh_t")).cast("long").as("nt"),
        size(col("sh_e")).cast("long").as("ne"))
      .filter(col("i") > 0)
      .select(col("train_id"), col("eval_id"),
        (col("i").cast("double") /
          (col("nt") + col("ne") - col("i")).cast("double")).as("jac"))
  }

  // ---------------------------------------------- incremental KMV sketch
  /** `h` is the PRE-HASHED value: [[kmvHash]] as a codegen'd map-side
    * expression (or [[kmvHashJvm]] for object inputs). Hashing upstream of
    * `groupByKey` is the scale shape — the group count may be tiny (3
    * returnflags), and hashing inside the state function would serialize
    * the whole stream's md5 work onto |groups| state tasks.
    */
  final case class KmvIn(grp: String, h: Long)
  final case class KmvState(hashes: Seq[Long], updates: Long)
  final case class KmvEstimate(grp: String, updates: Long, estimate: Double)

  /** The KMV hash as a map-side Column: [[graft.operators.Sketch]]'s
    * md5-derived `tokenHash` over the value's string form — identical to
    * the batch sketch's hash, so the streamed estimate is comparable.
    */
  def kmvHash(value: Column): Column =
    graft.operators.TextOps.tokenHash(value.cast("string"))

  /** JVM twin of [[kmvHash]] for constructing typed inputs (tests, object
    * streams): first 4 md5 bytes big-endian — the same [0, 2^32) value the
    * expression computes.
    */
  def kmvHashJvm(value: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.toString.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Incremental distinct-count estimation per group: keyed state holds the
    * k minimum distinct hashes ([[graft.operators.Sketch]]'s KMV, same
    * md5-derived hash) plus a monotone update counter, updated as
    * micro-batches arrive; each batch emits the group's refreshed estimate
    * tagged with the counter, so "the FINAL estimate" is selectable from an
    * append-mode sink (max updates per group — [[StreamOracles.kmvState]]
    * hash-checks it against the batch oracle). State is k longs + one long
    * per group FOREVER — the streaming answer to "distinct users per event
    * type so far" without unbounded dropDuplicates state. The per-batch
    * merge is a bounded k-set walk (O(n log k)), never a sort of the
    * batch's raw values.
    */
  def kmvFunc(grp: String, rows: Iterator[KmvIn],
      state: GroupState[KmvState]): Iterator[KmvEstimate] = {
    import graft.operators.Sketch.{HashSpace, K}
    val prev = state.getOption.getOrElse(KmvState(Seq.empty, 0L))
    val set = scala.collection.mutable.TreeSet.from(prev.hashes)
    rows.foreach { r =>
      if (set.size < K) set += r.h
      else if (r.h < set.last) { set += r.h; if (set.size > K) set -= set.last }
    }
    val merged = set.toSeq
    val updates = prev.updates + 1
    state.update(KmvState(merged, updates))
    val est =
      if (merged.size < K) merged.size.toDouble
      else BigDecimal((K - 1) / ((merged.last + 1).toDouble / HashSpace))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // = round(x, 4)
    Iterator(KmvEstimate(grp, updates, est))
  }

  /** Map-side combine for the KMV stream: each input partition keeps only
    * its k smallest distinct hashes per group, so the stateful stage's
    * shuffle moves ≤ partitions·groups·k rows per micro-batch instead of
    * the raw stream — the k-heap-per-partition shape the batch sketch's
    * scaladoc describes, done here because `groupByKey(_.grp)` funnels
    * everything onto |groups| state tasks (3 returnflags) otherwise.
    * Stateless, so it composes legally ahead of flatMapGroupsWithState.
    */
  private def kmvPartial(in: Dataset[KmvIn]): Dataset[KmvIn] = {
    import in.sparkSession.implicits._
    import graft.operators.Sketch.K
    in.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.TreeSet[Long]]
      it.foreach { r =>
        val s = m.getOrElseUpdate(r.grp,
          scala.collection.mutable.TreeSet.empty[Long])
        if (s.size < K) s += r.h
        else if (r.h < s.last) { s += r.h; if (s.size > K) s -= s.last }
      }
      m.iterator.flatMap { case (g, s) => s.iterator.map(KmvIn(g, _)) }
    }
  }

  def kmvStream(in: Dataset[KmvIn]): Dataset[KmvEstimate] = {
    import in.sparkSession.implicits._
    kmvPartial(in).groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(kmvFunc)
  }

  /** Streaming SCD load (SURVEY §7.6): each micro-batch of incoming rows is
    * merged into the durable target with the SAME set-based
    * [[graft.operators.ScdMerge]] the batch pipeline uses, via
    * `foreachBatch` + `Trigger.AvailableNow`. The batch id is the
    * micro-batch id — the reference's per-run uuid maps onto it.
    *
    * `mergeAndSwap` owns the read-merge-write cycle of the durable state
    * (at scale: an atomic table-format swap; here: versioned parquet dirs).
    */
  def scdLoadStream(incoming: DataFrame, cfg: graft.operators.ScdMerge.Config,
      clockTs: org.apache.spark.sql.Column,
      clockDate: org.apache.spark.sql.Column,
      mergeAndSwap: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeAndSwap(batch, id)
      }
}
