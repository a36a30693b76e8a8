package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB design point.
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no code.
  * Salting is for the case AQE can't fix: a shuffle HASH key where one value
  * dominates (e.g. a null-ish default key, a celebrity user_id). The big side
  * gets a random-free deterministic salt derived from OTHER columns; the
  * small side is exploded `saltBuckets`× so every salted key still matches.
  *
  * Deterministic salt (hash of a secondary column, not `rand()`) keeps runs
  * reproducible and re-executable — a task retry must land rows in the same
  * bucket or the join under-produces.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `saltBuckets` sub-keys derived from `saltSource` (a column whose values
    * spread the hot key's rows, e.g. the fact table's line number).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    // small side is replicated saltBuckets× — join types that preserve
    // UNMATCHED small rows (right/full) would emit each of them
    // saltBuckets times; big-side-preserving types are safe. The set
    // holds the underscore-squashed forms of every Spark alias,
    // including the bare "semi"/"anti" spellings.
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched " +
        s"small-side rows $saltBuckets times (the small side is exploded " +
        "per salt bucket); use an inner/left-preserving join type")
    val salted = big.withColumn("__salt",
      pmod(hash(saltSource), lit(saltBuckets)))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
