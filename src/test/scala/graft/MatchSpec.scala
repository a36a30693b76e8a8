package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.StringSim
import graft.operators.Match

/** The Jaro-Winkler expression's contract is DuckDB's
  * `jaro_winkler_similarity` (the oracle): classic Jaro over bytes, the
  * 0.7 boost threshold, prefix cap 4, weight 0.1, and 0.0 for ANY empty
  * side (DuckDB diverges from the classic both-empty = 1.0 here). Pinned
  * three ways: exact-double values captured from DuckDB 1.0.0, agreement
  * with an independently-written reference implementation on random
  * strings (transcription-bug detector), and the operator-level laws of
  * the match family.
  */
class MatchSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------ reference implementation
  // Deliberately different style from StringSim.score (collections, not
  // while loops) so a shared transcription bug can't hide.
  private def refJw(s1: String, s2: String): Double = {
    val p = s1.getBytes("UTF-8"); val t = s2.getBytes("UTF-8")
    if (p.isEmpty || t.isEmpty) return 0.0
    val window = math.max(math.max(p.length, t.length) / 2 - 1, 0)
    val used = Array.fill(t.length)(false)
    val matchedIdx = p.indices.flatMap { i =>
      val hit = (math.max(0, i - window) to
        math.min(t.length - 1, i + window))
        .find(j => !used(j) && t(j) == p(i))
      hit.foreach(used(_) = true)
      hit.map(j => (i, j))
    }
    val m = matchedIdx.length
    if (m == 0) return 0.0
    val s1Seq = matchedIdx.map(x => p(x._1))
    val s2Seq = matchedIdx.map(_._2).sorted.map(t(_))
    val trans = s1Seq.zip(s2Seq).count { case (a, b) => a != b } / 2
    var sim = 0.0
    sim += m.toDouble / p.length
    sim += m.toDouble / t.length
    sim += (m - trans).toDouble / m
    sim /= 3.0
    if (sim > 0.7) {
      val prefix = p.zip(t).take(4).takeWhile { case (a, b) => a == b }.length
      sim += prefix.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }

  test("score matches DuckDB 1.0.0 exact doubles on the pinned set") {
    val pins = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcxxxxx", "abdyyyyy", 0.5), // jaro 0.5 ≤ 0.7 → no Winkler boost
      ("aaaaaa", "aaaaaabbbbbb", 0.9), // prefix capped at 4
      ("small ring", "small gizmo", 0.8804545454545455),
      ("red widget", "red bolt", 0.8250000000000001),
      ("", "", 0.0), // DuckDB's divergence from the classic 1.0
      ("", "a", 0.0),
      ("a", "a", 1.0),
      ("ab", "ba", 0.0), // window 0: transposed pair never matches
      ("abcd", "acbd", 0.9249999999999999))
    pins.foreach { case (a, b, want) =>
      val got = StringSim.score(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw('$a','$b') = $got, want $want")
    }
  }

  test("score agrees with the independent reference on random strings") {
    val alpha = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString))
    val g = Gen.listOfN(4000, Gen.zip(alpha, alpha))
    val cases = g(Gen.Parameters.default, Seed(7L)).getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (a, b) =>
      val got = StringSim.score(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val want = refJw(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw('$a','$b') = $got, ref $want")
      assert(got >= 0.0 && got <= 1.0)
    }
  }

  test("expression is null-safe and symmetric through SQL") {
    StringSim.register(spark)
    val d = Seq(("ab", "abc"), (null, "x"), ("x", null), ("same", "same"))
      .toDF("a", "b")
      .select(expr("graft_jaro_winkler(a, b)").as("ab"),
        expr("graft_jaro_winkler(b, a)").as("ba"))
      .collect()
    assert(d(0).getDouble(0) == d(0).getDouble(1)) // symmetric
    assert(d(1).isNullAt(0) && d(2).isNullAt(0))   // null in → null out
    assert(d(3).getDouble(0) == 1.0)
  }

  // ------------------------------------------------------- operator laws
  private val dir = "/root/testdata/sf0.001"
  private def part = Tables.part(spark, dir)

  test("jwPairs: canonical orientation, threshold, block-local") {
    val rows = Match.jwPairs(part).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, jw) = (r.getString(0), r.getString(1), r.getDouble(2))
      assert(a < b)
      assert(jw >= Match.JwThreshold && jw <= 1.0)
      assert(a.split(" ").last == b.split(" ").last) // same block
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length)
  }

  test("bestMatch: one row per name, score is the block maximum") {
    val best = Match.bestMatch(part).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDouble(2)))).toMap
    val names = part.select(col("p_name")).distinct()
      .as[String].collect()
    val byBlock = names.groupBy(_.split(" ").last)
    assert(best.keySet == names.toSet.filter(n =>
      byBlock(n.split(" ").last).length > 1))
    best.foreach { case (name, (cand, score)) =>
      val block = byBlock(name.split(" ").last).filter(_ != name)
      val exact = block.map(c => refJw(name, c)).max
      assert(score == exact, s"$name best $cand $score, brute max $exact")
    }
  }

  test("blockingAudit prices exactly the realized unordered pair count") {
    val audit = Match.blockingAudit(part).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val names = part.select(col("p_name")).distinct().as[String].collect()
    val realized = names.groupBy(_.split(" ").last)
      .map { case (blk, ns) => blk -> (ns.length.toLong * (ns.length - 1) / 2) }
    assert(audit == realized)
  }
}
