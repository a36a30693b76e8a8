package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.ScdMerge

/** Property-based SCD merge invariants (SURVEY §5: idempotence and key
  * conservation over ScalaCheck-generated random batches, fixed seeds for
  * reproducibility).
  */
class MergeProperties extends SparkSuite {
  import spark.implicits._

  private val cfg = ScdMerge.Config(keys = Seq("k"), valueCol = "v",
    scd2 = false)
  private val clockTs = lit("2026-02-02 00:00:00").cast("timestamp")
  private val clockDate = lit("2026-02-02").cast("date")

  private val rowsGen: Gen[List[(String, Double)]] = Gen.listOfN(12,
    Gen.zip(Gen.oneOf("a", "b", "c", "d", "e", "f"),
      Gen.chooseNum(1, 50).map(_.toDouble)))

  private def sample(seed: Long): List[(String, Double)] =
    rowsGen(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("property: re-merging the merged state is a fixed point (no-ops only)") {
    for (seed <- 1L to 10L) {
      val rows = sample(seed)
      val inc = rows.toDF("k", "v").withColumn("batch_id", lit("b1"))
      val state1 = ScdMerge.merge(inc, inc.limit(0), cfg, clockTs, clockDate,
        lit("b1")).drop(ScdMerge.ChangeCol)
      val state2 = ScdMerge.merge(inc, state1, cfg, clockTs, clockDate,
        lit("b1"))
      val tags = state2.select(ScdMerge.ChangeCol).distinct()
        .as[String].collect().toSet
      assert(tags == Set("no_change"), s"seed=$seed tags=$tags")
      assert(state2.count() == rows.map(_._1).distinct.size, s"seed=$seed")
    }
  }

  test("property: every incoming and target key lands in state exactly once") {
    for (seed <- 11L to 20L) {
      val rows = sample(seed)
      val inc = rows.toDF("k", "v").withColumn("batch_id", lit("b1"))
      val target = Seq(("a", 999.0, "b0"), ("z", 1.0, "b0"))
        .toDF("k", "v", "batch_id")
      val out = ScdMerge.merge(inc, target, cfg, clockTs, clockDate,
        lit("b1"))
      val expectKeys = (rows.map(_._1) ++ Seq("a", "z")).distinct.size
      assert(out.count() == expectKeys, s"seed=$seed")
      assert(out.select("k").distinct().count() == expectKeys, s"seed=$seed")
    }
  }
}
