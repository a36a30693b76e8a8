package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The full custom-operator tier — (c) in the preference order: a
  * [[BinaryNode]] logical plan, a [[SparkStrategy]], and a
  * [[BinaryExecNode]] physical operator, injectable via
  * `SparkSessionExtensions` ([[graft.GraftExtensions]]) or
  * `spark.experimental.extraStrategies` ([[AsOfJoinPhys.register]]).
  *
  * Semantics: BACKWARD inclusive as-of join, identical to the composed
  * [[graft.operators.AsOfJoin.asOf]] (each left row picks the latest
  * right row with `rightTime <= leftTime` on its key; ties among right
  * rows at one (key, time) resolve to the greatest value tuple; NULL
  * times never match; inner by default — unmatched left rows drop, or
  * are kept with NULL matched columns under `outer = true`, DuckDB's
  * ASOF LEFT JOIN semantics). The two
  * formulations are property-tested equal and share the same DuckDB
  * `ASOF JOIN` oracle.
  *
  * Why a physical operator when the composition already costs one
  * shuffle: the union form pads every row to the UNIONED schema — left
  * rows carry a NULL match struct, right rows carry |left| NULL payload
  * columns — so the single exchange moves |L|+|R| rows of width
  * |L-cols|+|R-cols|, and the window buffers running state per frame.
  * The merge operator exchanges each side at its OWN width and streams
  * both sorted iterators with O(1) state per key (one buffered right
  * row), no window machinery. Same exchange COUNT, strictly less
  * exchanged volume and no per-frame state — at 100 TB the win is the
  * padded-width delta, typically ~2× on wide enrichments.
  *
  * Plan integration: `requiredChildDistribution` asks for the same
  * ClusteredDistribution pair as a shuffled join, so EnsureRequirements
  * co-partitions the children (and AQE's ValidateRequirements guards any
  * replan); `requiredChildOrdering` asks each side sorted by
  * (keys, time[, value tiebreak]), so the sorts land BELOW the exchange
  * boundary exactly as in sort-merge join.
  */
object AsOfJoinPhys {

  /** Resolved logical node. Attribute params (not names) so column
    * pruning sees real references and never prunes the key/time/value
    * columns out of the children; `matchedAttrs` are pre-built with
    * stable exprIds (computing output inside the node would mint fresh
    * ids on every transform copy and break downstream resolution).
    */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute,
      valueAttrs: Seq[Attribute], matchedAttrs: Seq[Attribute],
      tolerance: Option[Long] = None, forward: Boolean = false,
      nearest: Boolean = false, outer: Boolean = false)
    extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ matchedAttrs
    // matchedAttrs ride in `expressions` (constructor params), so without
    // this they count as REFERENCES and CheckAnalysis flags them missing
    // from the children — they are produced here, like Generate's output
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttrs)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: AsOfJoinNode =>
        AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
          n.valueAttrs, n.matchedAttrs, n.tolerance, n.forward, n.nearest,
          n.outer, planLater(n.left), planLater(n.right)) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute,
      valueAttrs: Seq[Attribute], matchedAttrs: Seq[Attribute],
      tolerance: Option[Long], forward: Boolean, nearest: Boolean,
      outer: Boolean,
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ matchedAttrs
    // same missing-input story as the logical node: matchedAttrs sit in
    // `expressions`, so they must be declared produced, not referenced
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttrs)
    override def outputPartitioning: Partitioning = left.outputPartitioning

    // at cluster scale the Spark UI is otherwise blind inside the merge:
    // numMatched/numUnmatched split the left side by match outcome
    // (inner drops unmatched; outer emits them null-padded), so a skewed
    // or empty match rate is visible per-stage without a debug run
    override lazy val metrics: Map[String,
        org.apache.spark.sql.execution.metric.SQLMetric] = Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"),
      "numUnmatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of unmatched left rows"))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) ::
        ClusteredDistribution(rightKeys) :: Nil

    /** Each side sorted by (keys, time); the right side additionally by
      * the value tuple. BACKWARD keeps values ascending — the buffered
      * "latest" row (the LAST qualifying row in sort order) is then the
      * greatest value tuple among same-(key, time) rows, the composed
      * operator's documented tiebreak. FORWARD flips the value sort to
      * DESCENDING so the FIRST row of the earliest qualifying time run
      * is that same greatest-value winner — the merge then matches on
      * the head without consuming the run (later left rows may still
      * need it).
      */
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)) ++
        valueAttrs.map(SortOrder(_,
          if (forward) org.apache.spark.sql.catalyst.expressions.Descending
          else Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

    protected override def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeys = leftKeys
      val rKeys = rightKeys
      val lTime = leftTime
      val rTime = rightTime
      val values = valueAttrs
      // unlimited tolerance = MaxValue: one uniform bound check per match,
      // no per-row Option branching
      val tolV = tolerance.getOrElse(Long.MaxValue)
      val mOut = longMetric("numOutputRows")
      val mMatch = longMetric("numMatched")
      val mUnmatch = longMetric("numUnmatched")
      left.execute().zipPartitions(right.execute()) { (li, ri) =>
        @inline def emitMatched(r: InternalRow): InternalRow = {
          mMatch.add(1); r
        }
        @inline def emitUnmatched(r: InternalRow): InternalRow = {
          mUnmatch.add(1); r
        }
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val keyOrd =
          RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
        // widen to Expression: bindReference casts its result back to the
        // argument's static type, and a bound Attribute is a BoundReference
        val lTs = BindReferences.bindReference(
          lTime: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
        val rTs = BindReferences.bindReference(
          rTime: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
        val resultProj =
          UnsafeProjection.create(lOut ++ (rTime +: values), lOut ++ rOut)
        val joined = new JoinedRow
        val rBuf = ri.buffered
        // LEFT-outer emission: left row + NULL literals for the matched
        // columns. NOT a null-filled right row through resultProj:
        // BindReferences takes nullability from the CHILD's attribute, so
        // a statically non-nullable right column (e.g. a source int)
        // would skip the null check and read 0 instead of NULL — caught
        // by AsOfProperties' outer property.
        val nullProj = UnsafeProjection.create(
          lOut.map(a =>
            a: org.apache.spark.sql.catalyst.expressions.Expression) ++
            (rTime +: values).map(a =>
              org.apache.spark.sql.catalyst.expressions.Literal
                .create(null, a.dataType)),
          lOut)

        if (forward) new Iterator[InternalRow] {
          // FORWARD merge: no buffered state at all — rows strictly
          // before the current left time are unusable for every later
          // left row too (left is time-sorted), so they are discarded,
          // and the qualifying run's head (value-DESC sort puts the
          // tiebreak winner first) is matched WITHOUT consuming it
          private var nextRow: InternalRow = _

          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && li.hasNext) {
              val l = li.next()
              val ltsAny = lTs.eval(l)
              if (ltsAny != null) {
                val lts = ltsAny.asInstanceOf[Long]
                val lk = lKeyProj(l)
                var done = false
                var rt = 0L
                var keyMatch = false
                while (!done && rBuf.hasNext) {
                  val rk = rKeyProj(rBuf.head)
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) rBuf.next()
                  else if (c > 0) { done = true; keyMatch = false }
                  else {
                    val rtAny = rTs.eval(rBuf.head)
                    if (rtAny == null) rBuf.next() // NULL right time
                    else if (rtAny.asInstanceOf[Long] < lts) rBuf.next()
                    else {
                      done = true; keyMatch = true
                      rt = rtAny.asInstanceOf[Long]
                    }
                  }
                }
                if (keyMatch && rt - lts <= tolV) {
                  nextRow = emitMatched(resultProj(joined(l, rBuf.head)))
                } else if (outer) {
                  nextRow = emitUnmatched(nullProj(l))
                }
              } else if (outer) { // NULL left time: unmatched, kept
                nextRow = emitUnmatched(nullProj(l))
              }
            }
          }

          override def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          override def next(): InternalRow = {
            if (nextRow == null) advance()
            val r = nextRow
            nextRow = null
            mOut.add(1)
            r
          }
        } else if (nearest) new Iterator[InternalRow] {
          // NEAREST merge: the backward route's O(1) buffered state gives
          // the latest rt ≤ lt candidate; the forward candidate is simply
          // the right head the advance loop stopped on (first rt > lt on
          // the key) — matched without consuming it, exactly like the
          // forward route. Equal-time rows are consumed into the backward
          // state at distance 0, and the distance tie prefers backward —
          // the composed asOfNearest's contract.
          private var cur: InternalRow = _
          private var curKey: InternalRow = _
          private var curRt: Long = _
          private var nextRow: InternalRow = _

          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && li.hasNext) {
              val l = li.next()
              val ltsAny = lTs.eval(l)
              if (ltsAny != null) {
                val lts = ltsAny.asInstanceOf[Long]
                val lk = lKeyProj(l)
                var done = false
                var fwdOk = false
                var fwdRt = 0L
                while (!done && rBuf.hasNext) {
                  val rk = rKeyProj(rBuf.head)
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) { rBuf.next(); cur = null; curKey = null }
                  else if (c > 0) done = true
                  else {
                    val rtAny = rTs.eval(rBuf.head)
                    if (rtAny == null) rBuf.next() // NULL right time: skip
                    else if (rtAny.asInstanceOf[Long] <= lts) {
                      cur = rBuf.next().copy()
                      curKey = rk.copy()
                      curRt = rtAny.asInstanceOf[Long]
                    } else {
                      done = true; fwdOk = true
                      fwdRt = rtAny.asInstanceOf[Long]
                    }
                  }
                }
                val bwdOk = cur != null && curKey != null &&
                  keyOrd.compare(curKey, lk) == 0
                if (bwdOk && (!fwdOk || lts - curRt <= fwdRt - lts)) {
                  nextRow = emitMatched(resultProj(joined(l, cur)))
                } else if (fwdOk) {
                  nextRow = emitMatched(resultProj(joined(l, rBuf.head)))
                } else if (outer) {
                  nextRow = emitUnmatched(nullProj(l))
                }
              } else if (outer) { // NULL left time: unmatched, kept
                nextRow = emitUnmatched(nullProj(l))
              }
            }
          }

          override def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          override def next(): InternalRow = {
            if (nextRow == null) advance()
            val r = nextRow
            nextRow = null
            mOut.add(1)
            r
          }
        } else new Iterator[InternalRow] {
          // the O(1) merge state: latest qualifying right row (copied —
          // the child iterator reuses its UnsafeRow) and its key/time
          private var cur: InternalRow = _
          private var curKey: InternalRow = _
          private var curRt: Long = _
          private var nextRow: InternalRow = _

          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && li.hasNext) {
              val l = li.next()
              val ltsAny = lTs.eval(l)
              if (ltsAny != null) { // NULL left time never matches
                val lts = ltsAny.asInstanceOf[Long]
                val lk = lKeyProj(l)
                var done = false
                while (!done && rBuf.hasNext) {
                  val rk = rKeyProj(rBuf.head)
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) { rBuf.next(); cur = null; curKey = null }
                  else if (c > 0) done = true
                  else {
                    val rtAny = rTs.eval(rBuf.head)
                    if (rtAny == null) rBuf.next() // NULL right time: skip
                    else if (rtAny.asInstanceOf[Long] <= lts) {
                      cur = rBuf.next().copy()
                      curKey = rk.copy()
                      curRt = rtAny.asInstanceOf[Long]
                    } else done = true
                  }
                }
                // the tolerance contract matches the composed
                // asOfTolerance form: the LATEST qualifying row either
                // satisfies the bound or the left row goes unmatched —
                // no fallback to an earlier in-bound row
                if (cur != null && curKey != null &&
                    keyOrd.compare(curKey, lk) == 0 &&
                    lts - curRt <= tolV) {
                  nextRow = emitMatched(resultProj(joined(l, cur)))
                } else if (outer) {
                  nextRow = emitUnmatched(nullProj(l))
                }
              } else if (outer) { // NULL left time: unmatched, kept
                nextRow = emitUnmatched(nullProj(l))
              }
            }
          }

          override def hasNext: Boolean = {
            if (nextRow == null) advance()
            nextRow != null
          }
          override def next(): InternalRow = {
            if (nextRow == null) advance()
            val r = nextRow
            nextRow = null
            mOut.add(1)
            r
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotently add the strategy to the session's experimental
    * strategies (the runtime twin of the `SparkSessionExtensions`
    * injection in [[graft.GraftExtensions]]). The check-and-append is
    * synchronized on the experimental holder: extraStrategies is plain
    * shared session state, and an unsynchronized read-modify-write from
    * concurrent callers could drop a concurrently-registered strategy.
    */
  def register(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraStrategies
      if (!cur.exists(_ eq AsOfJoinStrategy))
        spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }

  /** Public API: backward inclusive as-of join through the physical
    * operator. Same contract as [[graft.operators.AsOfJoin.asOf]]:
    * returns matched left rows + `matched_time` + `valueCols`; with
    * `toleranceMicros` set, same contract as
    * [[graft.operators.AsOfJoin.asOfTolerance]] — the latest qualifying
    * right row must ALSO satisfy `leftTime − rightTime ≤ tolerance`
    * (inclusive) or the left row goes unmatched; there is no fallback
    * to an earlier in-bound row. The merge applies the bound as one
    * long comparison on the already-buffered state — zero extra state,
    * zero extra passes. With `forward = true`, the direction flips to
    * [[graft.operators.AsOfJoin.asOfForward]]'s contract (earliest
    * `rightTime >= leftTime`; tolerance bounds `rightTime − leftTime`)
    * and the merge carries NO buffered row at all. With `nearest = true`,
    * the contract is [[graft.operators.AsOfJoin.asOfNearest]]'s: closest
    * right row in EITHER direction, distance ties to the backward match;
    * the merge reuses the backward route's buffered state and reads the
    * forward candidate off the right head it stopped on — still O(1)
    * state, one pass, no tolerance or forward combination. Time
    * columns must be timestamp-typed (cast upstream, exactly like the
    * composed form does internally), and each key pair must share one
    * data type — the merge compares keys with the natural UnsafeRow
    * ordering, which has no implicit-cast layer, so mixed-width keys
    * (INT vs BIGINT) would compare different physical layouts; this is
    * rejected here as an analysis-time error instead (cast upstream).
    *
    * NULL keys: key comparison uses [[RowOrdering]]'s natural ordering,
    * under which NULL equals NULL — a NULL-keyed left row DOES match a
    * NULL-keyed right row. This deliberately mirrors the composed
    * union+window form (window PARTITION BY also groups NULLs together)
    * and diverges from SQL equi-join equality, which would drop
    * NULL-keyed rows; pinned by `AsOfProperties`' NULL-key case. Filter
    * NULL keys upstream for SQL join semantics.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false,
      nearest: Boolean = false,
      outer: Boolean = false): DataFrame = {
    require(!(nearest && (forward || toleranceMicros.isDefined)),
      "nearest is its own direction: combine with neither forward nor " +
        "tolerance (the composed asOfNearest defines no bounded variant)")
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    require(Seq(TimestampType, TimestampNTZType).contains(lt.dataType) &&
      rt.dataType == lt.dataType,
      s"as-of time columns must share a timestamp type, " +
        s"got ${lt.dataType} vs ${rt.dataType}")
    val lk = keys.map(attr(lPlan, _))
    val rk = keys.map(attr(rPlan, _))
    require(lk.map(_.dataType) == rk.map(_.dataType),
      s"as-of key columns must share data types, got " +
        s"${lk.map(_.dataType)} vs ${rk.map(_.dataType)}")
    val values = valueCols.map(attr(rPlan, _))
    val matched =
      AttributeReference("matched_time", lt.dataType)() +:
        values.map(v => AttributeReference(v.name, v.dataType)())
    org.apache.spark.sql.graft.Shim.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, values, matched,
        toleranceMicros, forward, nearest, outer))
  }
}
