package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** Property-based as-of join checks: the windowed single-shuffle
  * formulation must agree row-for-row with a brute-force reference
  * (per left row: filter eligible right rows, pick per the documented
  * tiebreak) over random inputs that include NULL times on both sides,
  * duplicate timestamps, duplicate whole rows, and keys present on only
  * one side — exactly the edge classes where windowed rewrites break.
  */
class AsOfProperties extends SparkSuite {
  import spark.implicits._

  // tuples, not nested case classes — Spark cannot encode an inner class
  private type L = (String, Option[Int], Int) // (k, lt, pay)
  private type R = (String, Option[Int], Int) // (k, rt, v)

  private val keys = Gen.oneOf("a", "b", "c")
  private val times = Gen.option(Gen.chooseNum(0, 12))
  private val lGen = Gen.listOfN(10, Gen.zip(keys, times, Gen.chooseNum(0, 99)))
  private val rGen = Gen.listOfN(10, Gen.zip(keys, times, Gen.chooseNum(0, 9)))

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  /** (k, lt, pay, matched_rt, v) per matched left ROW (duplicates kept). */
  private def brute(ls: List[L], rs: List[R], forward: Boolean) =
    ls.flatMap { case (lk, lt, pay) =>
      lt.flatMap { t =>
        val cands = rs.filter { case (rk, rt, _) => rk == lk &&
          rt.exists(x => if (forward) x >= t else x <= t) }
        if (cands.isEmpty) None
        else {
          // contract: nearest time wins; among equal times, the greatest
          // (time, value) tuple — the deterministic struct tiebreak
          val rts = cands.map(_._2.get)
          val nearest = if (forward) rts.min else rts.max
          val best = cands.filter(_._2.get == nearest).maxBy(_._3)
          Some((lk, t, pay, best._2.get, best._3))
        }
      }
    }.sorted

  private def run(ls: List[L], rs: List[R], forward: Boolean) = {
    val ldf = ls.toDF("k", "lt_s", "pay")
      .withColumn("lt", col("lt_s").cast("timestamp"))
    val rdf = rs.toDF("k", "rt_s", "v")
      .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
    val out = if (forward)
      AsOfJoin.asOfForward(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"))
    else AsOfJoin.asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"))
    out.select(col("k"), col("lt_s"), col("pay"),
        (col("matched_time").cast("long")).cast("int").as("mt"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .toList.sorted
  }

  test("property: backward as-of equals the brute-force reference") {
    for (seed <- 1L to 12L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      assert(run(ls, rs, forward = false) == brute(ls, rs, forward = false),
        s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: forward as-of equals the brute-force reference") {
    for (seed <- 21L to 32L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      assert(run(ls, rs, forward = true) == brute(ls, rs, forward = true),
        s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: physical as-of operator equals the brute-force reference") {
    // same reference as the composed backward form — the custom
    // merge-join exec (plans.AsOfJoinPhys) must be indistinguishable,
    // including NULL times, duplicate rows, ties at one (key, time),
    // and one-sided keys, across real 4-partition shuffles
    for (seed <- 81L to 92L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val out = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"))
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(out == brute(ls, rs, forward = false),
        s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: physical as-of TOLERANCE equals the bounded brute force") {
    // contract (mirrors AsOfJoin.asOfTolerance): the LATEST qualifying
    // row either satisfies the bound or the left row goes unmatched —
    // never a fallback to an older in-bound row
    val tolSec = 3
    def bruteTol(ls: List[L], rs: List[R]) =
      brute(ls, rs, forward = false)
        .filter { case (_, t, _, mrt, _) => t - mrt <= tolSec }
    for (seed <- 141L to 152L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val out = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"),
          toleranceMicros = Some(tolSec * 1000000L))
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(out == bruteTol(ls, rs), s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: physical FORWARD as-of equals the brute-force reference") {
    for (seed <- 161L to 172L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val out = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"), forward = true)
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(out == brute(ls, rs, forward = true),
        s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: physical as-of with COMPOSITE keys co-partitions correctly") {
    // two-column join keys exercise the ClusteredDistribution pair across
    // both children (EnsureRequirements must co-partition on BOTH
    // columns) and the multi-column key ordering inside the merge
    for (seed <- 101L to 108L) {
      val ls = sample(lGen, seed)
      val rs = sample(rGen, seed + 100)
      // split the string key into two columns (k, parity of payload)
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("k2", col("pay") % 2)
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("k2", col("v") % 2)
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val out = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k", "k2"), "lt", "rt", Seq("v"))
        .select(col("k"), col("k2"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getInt(5)))
        .toList.sorted
      // brute reference over the composite key
      val want = ls.flatMap { case (lk, lt, pay) =>
        lt.flatMap { t =>
          val cands = rs.filter { case (rk, rt, v) =>
            rk == lk && v % 2 == pay % 2 && rt.exists(_ <= t) }
          if (cands.isEmpty) None
          else {
            val nearest = cands.map(_._2.get).max
            val best = cands.filter(_._2.get == nearest).maxBy(_._3)
            Some((lk, pay % 2, t, pay, best._2.get, best._3))
          }
        }
      }.sorted
      assert(out == want, s"seed=$seed")
    }
  }

  test("property: NULL keys match NULL keys in BOTH as-of forms (pinned contract)") {
    // documented divergence from SQL equi-join semantics: the composed
    // form's window PARTITION BY groups NULLs, and the physical merge's
    // natural RowOrdering treats NULL == NULL — so a NULL-keyed left row
    // matches the NULL-keyed right history. Pin that contract and that
    // both formulations agree on it, against a brute reference where
    // Option-key None == None.
    val nullableKeys: Gen[Option[String]] =
      Gen.frequency(2 -> Gen.some(Gen.oneOf("a", "b")), 1 -> Gen.const(None))
    val lg = Gen.listOfN(10, Gen.zip(nullableKeys, times, Gen.chooseNum(0, 99)))
    val rg = Gen.listOfN(10, Gen.zip(nullableKeys, times, Gen.chooseNum(0, 9)))
    for (seed <- 131L to 138L) {
      val ls = sample(lg, seed)
      val rs = sample(rg, seed + 100)
      val want = ls.flatMap { case (lk, lt, pay) =>
        lt.flatMap { t =>
          val cands = rs.filter { case (rk, rt, _) =>
            rk == lk && rt.exists(_ <= t) }
          if (cands.isEmpty) None
          else {
            val nearest = cands.map(_._2.get).max
            val best = cands.filter(_._2.get == nearest).maxBy(_._3)
            Some((lk, t, pay, best._2.get, best._3))
          }
        }
      }.sorted
      val ldf = ls.map { case (k, t, p) => (k.orNull, t, p) }
        .toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.map { case (k, t, v) => (k.orNull, t, v) }
        .toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getInt(4)))
        .toList.sorted
      val composed = shape(AsOfJoin.asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v")))
      val physical = shape(graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v")))
      assert(composed == want, s"composed seed=$seed left=$ls right=$rs")
      assert(physical == want, s"physical seed=$seed left=$ls right=$rs")
    }
  }

  test("physical as-of rejects mixed-width key types at analysis time") {
    // the merge's natural UnsafeRow ordering has no implicit-cast layer;
    // an INT-vs-BIGINT key pair must be an error, not silent garbage
    val ldf = List((1, Some(1), 7)).toDF("k", "lt_s", "pay")
      .withColumn("lt", col("lt_s").cast("timestamp"))
    val rdf = List((1L, Some(1), 3)).toDF("k", "rt_s", "v")
      .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPhys.asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("key columns must share data types"))
  }

  /** Nearest reference: per the documented contract — backward candidate
    * is the greatest (time, value) tuple at its instant, forward the
    * least; closer side wins, distance ties go backward.
    */
  private def bruteNearest(ls: List[L], rs: List[R]) =
    ls.flatMap { case (lk, lt, pay) =>
      lt.flatMap { t =>
        val back = rs.filter(r => r._1 == lk && r._2.exists(_ <= t))
        val fwd = rs.filter(r => r._1 == lk && r._2.exists(_ >= t))
        val bc = back.map(_._2.get).maxOption.map(bt =>
          (bt, back.filter(_._2.get == bt).map(_._3).max))
        val fc = fwd.map(_._2.get).minOption.map(ft =>
          (ft, fwd.filter(_._2.get == ft).map(_._3).min))
        ((bc, fc) match {
          case (Some(b), None) => Some(b)
          case (None, Some(f)) => Some(f)
          case (Some(b), Some(f)) =>
            Some(if ((f._1 - t) < (t - b._1)) f else b)
          case _ => None
        }).map { case (mt, v) => (lk, t, pay, mt, v) }
      }
    }.sorted

  test("property: nearest as-of equals the brute-force reference") {
    for (seed <- 61L to 72L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val got = AsOfJoin.asOfNearest(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"))
        .select(col("k"), col("lt_s"), col("pay"),
          (col("matched_time").cast("long")).cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(got == bruteNearest(ls, rs), s"seed=$seed left=$ls right=$rs")
    }
  }

  test("property: physical NEAREST as-of equals the brute-force reference") {
    // same reference as the composed asOfNearest — the merge's one-pass
    // both-direction pick (buffered backward state + unconsumed right
    // head as the forward candidate) must agree on NULL times, distance
    // ties (→ backward), duplicate instants, and one-sided keys
    for (seed <- 181L to 192L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val got = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"), nearest = true)
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(got == bruteNearest(ls, rs), s"seed=$seed left=$ls right=$rs")
    }
  }

  test("physical as-of rejects nearest combined with forward or tolerance") {
    val ldf = List((1, Some(1), 7)).toDF("k", "lt_s", "pay")
      .withColumn("lt", col("lt_s").cast("timestamp"))
    val rdf = List((1, Some(1), 3)).toDF("k", "rt_s", "v")
      .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
    intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPhys.asOf(ldf, rdf, Seq("k"), "lt", "rt",
        Seq("v"), nearest = true, forward = true)
    }
    intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPhys.asOf(ldf, rdf, Seq("k"), "lt", "rt",
        Seq("v"), nearest = true, toleranceMicros = Some(1L))
    }
  }

  test("property: tolerance as-of = backward reference filtered by distance") {
    val TolSec = 4
    for (seed <- 81L to 92L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val expect = brute(ls, rs, forward = false)
        .filter { case (_, t, _, mt, _) => t - mt <= TolSec }
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val got = AsOfJoin.asOfTolerance(ldf, rdf, Seq("k"), "lt", "rt",
          Seq("v"), TolSec * 1000000L)
        .select(col("k"), col("lt_s"), col("pay"),
          (col("matched_time").cast("long")).cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))
        .toList.sorted
      assert(got == expect, s"seed=$seed left=$ls right=$rs")
    }
  }

  // ------------------------------------------------- range join property
  // Same treatment for the bucket-explode range join: the rewrite must
  // emit exactly the naive filter-join's rows, including ranges that span
  // many buckets, zero-length ranges, inverted (empty) ranges, and
  // duplicate points — for every bucket width relative to range lengths.
  private val pGen = Gen.listOfN(12,
    Gen.zip(keys, Gen.chooseNum(0, 120), Gen.chooseNum(0, 99)))
  private val rangeGen = Gen.listOfN(8,
    Gen.zip(keys, Gen.chooseNum(0, 120), Gen.chooseNum(-10, 60)))

  test("property: bucketed range join equals the naive filter join") {
    for (seed <- 41L to 50L; bucketSec <- Seq(1L, 7L, 1000L)) {
      val ps = sample(pGen, seed)
      val rgs = sample(rangeGen, seed + 100)
        .map { case (k, s, len) => (k, s, s + len) } // len<0 ⇒ empty range
      val pdf = ps.toDF("k", "p_s", "pay")
        .withColumn("p", col("p_s").cast("timestamp"))
      val rdf = rgs.toDF("k", "s_s", "e_s")
        .withColumn("s", col("s_s").cast("timestamp"))
        .withColumn("e", col("e_s").cast("timestamp"))
      val got = graft.operators.RangeJoin.pointInRange(
        pdf, rdf, Seq("k"), "p", "s", "e", bucketSec * 1000000L)
        .select(col("k"), col("p_s"), col("pay"), col("s_s"), col("e_s"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getInt(4))).toList.sorted
      val want = (for {
        (pk, pt, pay) <- ps
        (rk, s, e) <- rgs
        if pk == rk && pt >= s && pt <= e
      } yield (pk, pt, pay, s, e)).sorted
      assert(got == want, s"seed=$seed bucket=${bucketSec}s")
    }
  }

  test("property: physical OUTER as-of keeps every left row exactly once") {
    // totality over random frames including NULL left times (kept with
    // NULL matched columns), duplicate left rows (each emits its own
    // output row), and one-sided keys
    def bruteOuter(ls: List[L], rs: List[R]) =
      ls.map { case (lk, lt, pay) =>
        val m = lt.flatMap { t =>
          val cands = rs.filter { case (rk, rt, _) =>
            rk == lk && rt.exists(_ <= t) }
          if (cands.isEmpty) None
          else {
            val nearest = cands.map(_._2.get).max
            val best = cands.filter(_._2.get == nearest).maxBy(_._3)
            Some((best._2.get, best._3))
          }
        }
        (lk, lt, pay, m.map(_._1), m.map(_._2))
      }.sorted
    for (seed <- 341L to 352L) {
      val (ls, rs) = (sample(lGen, seed), sample(rGen, seed + 100))
      val ldf = ls.toDF("k", "lt_s", "pay")
        .withColumn("lt", col("lt_s").cast("timestamp"))
      val rdf = rs.toDF("k", "rt_s", "v")
        .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
      val out = graft.plans.AsOfJoinPhys
        .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"), outer = true)
        .select(col("k"), col("lt_s"), col("pay"),
          col("matched_time").cast("long").cast("int").as("mt"), col("v"))
        .collect()
        .map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)),
          r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4))))
        .toList.sorted
      assert(out == bruteOuter(ls, rs), s"seed=$seed left=$ls right=$rs")
    }
  }

  test("physical as-of exposes SQLMetrics: matched/unmatched split the left") {
    val (ls, rs) = (sample(lGen, 777L), sample(rGen, 778L))
    val ldf = ls.toDF("k", "lt_s", "pay")
      .withColumn("lt", col("lt_s").cast("timestamp"))
    val rdf = rs.toDF("k", "rt_s", "v")
      .withColumn("rt", col("rt_s").cast("timestamp")).drop("rt_s")
    val out = graft.plans.AsOfJoinPhys
      .asOf(ldf, rdf, Seq("k"), "lt", "rt", Seq("v"), outer = true)
    val rows = out.collect()
    // AQE wraps the physical plan; the final plan is on the adaptive
    // root, and QueryStageExec nodes hide their inner plan from
    // `children` — descend through both explicitly
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinPhys.AsOfJoinExec] = p match {
      case e: graft.plans.AsOfJoinPhys.AsOfJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(s.plan)
      case other => other.children.iterator.map(find)
        .collectFirst { case Some(e) => e }
    }
    val exec = find(out.queryExecution.executedPlan)
      .getOrElse(fail("AsOfJoinExec not in executed plan:\n" +
        out.queryExecution.executedPlan))
    val m = exec.metrics
    assert(Set("numOutputRows", "numMatched", "numUnmatched")
      .subsetOf(m.keySet))
    // outer: every left row is emitted exactly once
    assert(rows.length == ls.length)
    assert(m("numOutputRows").value == rows.length)
    val matched = brute(ls, rs, forward = false).size
    assert(m("numMatched").value == matched)
    assert(m("numUnmatched").value == rows.length - matched)
  }
}
