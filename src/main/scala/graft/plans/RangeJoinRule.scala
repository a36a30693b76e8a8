package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite naive point-in-interval joins into the
  * bucketized equi-join form of [[graft.operators.RangeJoin]].
  *
  * A join whose ONLY cross-side condition is a time-range sandwich
  *
  * {{{ points JOIN ranges ON p.ts >= r.start AND p.ts <= r.end }}}
  *
  * has no equi key, so Spark plans BroadcastNestedLoopJoin — every point
  * against every range, O(|P|·|R|), undistributable. This rule quantizes
  * time into `spark.graft.rangeJoin.bucketMicros`-wide buckets (default
  * 1 day), explodes each interval to the buckets it overlaps, stamps each
  * point with its bucket, and joins on bucket equality with the original
  * range predicates kept as exact refinement — the same decomposition the
  * explicit operator offers, applied transparently to any matching query
  * (SQL or DataFrame) in a session built with [[graft.GraftExtensions]].
  *
  * Scope guards:
  *  - inner joins only, both sides batch (a streaming interval join must
  *    keep its raw range condition — that is what bounds watermark state);
  *  - fires only when NO cross-side equi conjunct exists: with an equi key
  *    Spark already hash-partitions and the range is a cheap post-filter,
  *    so rewriting there would only add explode fan-out (the keyed case
  *    stays with the explicit operator, where bucket width is a per-call
  *    decision);
  *  - the rewritten join gains a bucket equi conjunct, so the rule is
  *    idempotent under the optimizer's fixed-point batch.
  *
  * Interval replication is ceil(width/bucket)+1 rows — size the bucket conf
  * near the median interval width; pathological wide intervals replicate
  * linearly and deserve a coarser bucket or the explicit operator.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val BucketConf = "spark.graft.rangeJoin.bucketMicros"
  val DefaultBucketMicros: Long = 86400L * 1000000L // 1 day

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !left.isStreaming && !right.isStreaming =>
      val conjs = splitConj(cond)
      def fromLeft(e: Expression): Boolean =
        e.references.nonEmpty && e.references.subsetOf(left.outputSet)
      def fromRight(e: Expression): Boolean =
        e.references.nonEmpty && e.references.subsetOf(right.outputSet)
      val hasEqui = conjs.exists {
        case EqualTo(a, b) =>
          (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
        case _ => false
      }
      // normalize bounds to (point, start, end); BOTH orientations — the
      // point relation may be either join child ("points JOIN ranges" or
      // "ranges JOIN points"), and the un-rewritten mirror would silently
      // stay a BroadcastNestedLoopJoin
      def findSandwich(pFrom: Expression => Boolean,
          bFrom: Expression => Boolean): Option[(Expression, Expression, Expression)] = {
        val lowers = conjs.collect { // point >= start
          case GreaterThanOrEqual(a, b) if pFrom(a) && bFrom(b) => (a, b)
          case LessThanOrEqual(a, b) if bFrom(a) && pFrom(b)    => (b, a)
        }
        val uppers = conjs.collect { // point <= end
          case LessThanOrEqual(a, b) if pFrom(a) && bFrom(b)    => (a, b)
          case GreaterThanOrEqual(a, b) if bFrom(a) && pFrom(b) => (b, a)
        }
        (for {
          (p1, s) <- lowers
          (p2, e) <- uppers
          if p1.semanticEquals(p2) && p1.dataType == TimestampType &&
            s.dataType == TimestampType && e.dataType == TimestampType
        } yield (p1, s, e)).headOption
      }
      val sandwichL = findSandwich(fromLeft, fromRight)
      val sandwichR =
        if (sandwichL.isDefined) None else findSandwich(fromRight, fromLeft)

      // interval-OVERLAP shape: ls <= re AND rs <= le with a full interval
      // on EACH side (the sandwich is its degenerate ls==le case and is
      // preferred when present — it skips one explode). Same rewrite as
      // [[graft.operators.RangeJoin.intervalOverlap]]: explode both sides
      // to their bucket spans, join on bucket equality, and keep each pair
      // only in the bucket of greatest(ls, rs) — the overlap's start — so
      // no post-join dedup is ever needed.
      def findOverlap(): Option[(Expression, Expression, Expression, Expression)] = {
        val lUppers = conjs.collect { // ls <= re
          case LessThanOrEqual(a, b) if fromLeft(a) && fromRight(b)    => (a, b)
          case GreaterThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => (b, a)
        }
        val rUppers = conjs.collect { // rs <= le
          case LessThanOrEqual(a, b) if fromRight(a) && fromLeft(b)    => (a, b)
          case GreaterThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => (b, a)
        }
        (for {
          (ls, re) <- lUppers
          (rs, le) <- rUppers
          if Seq(ls, le, rs, re).forall(_.dataType == TimestampType)
        } yield (ls, le, rs, re)).headOption
      }

      def rewrite(p: Expression, s: Expression, e: Expression,
          pointsLeft: Boolean): LogicalPlan = {
        val bucket = conf.getConfString(BucketConf,
          DefaultBucketMicros.toString).toLong
        def toBucket(x: Expression): Expression =
          IntegralDivide(UnixMicros(x), Literal(bucket))
        val pb = Alias(toBucket(p), "__graft_pb")()
        val rb = AttributeReference("__graft_rb", LongType,
          nullable = false)()
        val pointSide = if (pointsLeft) left else right
        val rangeSide = if (pointsLeft) right else left
        val newPoints = Project(pointSide.output :+ pb, pointSide)
        // Sequence is TimeZoneAwareExpression: the analyzer's
        // ResolveTimeZone already ran, so stamp the session zone here or
        // the expression stays unresolved (plan-validation failure)
        val gen = Generate(
          Explode(Sequence(toBucket(s), toBucket(e), None,
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(rb), child = rangeSide)
        val newCond = (conjs :+ EqualTo(pb.toAttribute, rb)).reduce(And)
        val rewritten =
          if (pointsLeft) Join(newPoints, gen, Inner, Some(newCond), hint)
          else Join(gen, newPoints, Inner, Some(newCond), hint)
        Project(j.output, rewritten)
      }

      def rewriteOverlap(ls: Expression, le: Expression,
          rs: Expression, re: Expression): LogicalPlan = {
        val bucket = conf.getConfString(BucketConf,
          DefaultBucketMicros.toString).toLong
        def toBucket(x: Expression): Expression =
          IntegralDivide(UnixMicros(x), Literal(bucket))
        val lb = AttributeReference("__graft_lb", LongType,
          nullable = false)()
        val rb = AttributeReference("__graft_rb", LongType,
          nullable = false)()
        def gen(out: AttributeReference, s: Expression, e: Expression,
            child: LogicalPlan) = Generate(
          Explode(Sequence(toBucket(s), toBucket(e), None,
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(out), child = child)
        val canonical =
          EqualTo(lb, Greatest(Seq(toBucket(ls), toBucket(rs))))
        val newCond =
          (conjs ++ Seq(EqualTo(lb, rb), canonical)).reduce(And)
        Project(j.output,
          Join(gen(lb, ls, le, left), gen(rb, rs, re, right), Inner,
            Some(newCond), hint))
      }

      (sandwichL, sandwichR) match {
        case (Some((p, s, e)), _) if !hasEqui => rewrite(p, s, e, pointsLeft = true)
        case (None, Some((p, s, e))) if !hasEqui => rewrite(p, s, e, pointsLeft = false)
        case _ if !hasEqui =>
          findOverlap() match {
            case Some((ls, le, rs, re)) => rewriteOverlap(ls, le, rs, re)
            case None                   => j
          }
        case _ => j
      }
  }
}
