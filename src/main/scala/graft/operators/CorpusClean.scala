package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps.{predictedLang, qualityScore, sqlWords, words}

/** The composed training-corpus cleaning pipeline — the end-to-end shape a
  * 100 TB pretraining-data job runs, built entirely from this engine's
  * operators:
  *
  *   1. per-doc metrics (language ID + quality score) — map-side, scan speed
  *   2. quality gate — filter, pushed as far down as the metrics allow
  *   3. exact dedup — keep min doc_id per content hash (48-byte shuffle key)
  *   4. near-dup removal — MinHash/LSH candidate pairs; the higher doc_id of
  *      each pair is dropped (deterministic victim policy)
  *
  * Stages 1-2 are one narrow pass; 3 is one hash aggregation; 4 reuses
  * [[Dedup.minhashPairs]] (signatures computed once, band-bucket expand).
  * Nothing in the plan is quadratic in corpus size.
  */
object CorpusClean {

  val QualityThreshold = 0.1

  def clean(docs: DataFrame): DataFrame = {
    val metrics = docs
      .select(col("doc_id"), col("lang"), col("text"), words(col("text")).as("w"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("w")).as("n_tokens"),
        qualityScore(col("w")).as("quality_score"),
        predictedLang(col("w")).as("predicted_lang"))
    val kept = metrics.filter(col("quality_score") >= QualityThreshold)
    val exactKeep = kept
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    val survivors = kept
      .join(exactKeep, col("doc_id") === col("keep_id"), "left_semi")
    // near-dup pairs over the SURVIVORS, per the documented stage order —
    // pairing the raw corpus would let a quality-REJECTED doc victimize
    // its kept near-duplicate (both copies of the content vanish), and
    // wastes signatures on docs already filtered out
    val nearDupVictims = Dedup
      .minhashPairs(survivors.select(col("doc_id"), col("text")))
      .select(col("doc_b").as("victim")).distinct()
    survivors
      .join(nearDupVictims, col("doc_id") === col("victim"), "left_anti")
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        col("n_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** The WITH-body through the `kept`/`survivors`/`victims` CTEs — shared
    * by [[sqlClean]] and [[sqlFunnel]] so the stage report can never
    * disagree with the pipeline it describes.
    */
  def sqlCleanCtes: String = {
    val w = sqlWords("text")
    val set = TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
    val langScores = TextOps.LangProfiles.map { case (lang, markers) =>
      val ms = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(w, x -> x IN ($ms))) AS s_$lang"
    }.mkString(",\n    ")
    val mx = s"greatest(${TextOps.LangProfiles.map("s_" + _._1).mkString(", ")})"
    val langCase = TextOps.LangProfiles.map { case (lang, _) =>
      s"WHEN s_$lang = mx AND mx > 0 THEN '$lang'"
    }.mkString(" ")
    s"""base AS (
       |  SELECT doc_id, lang, text, $w AS w FROM documents
       |), m0 AS (
       |  SELECT doc_id, lang, text, len(w) AS n_tokens,
       |    CAST(len(w) AS DOUBLE) AS nwords,
       |    CAST(len(list_filter(w, x -> x IN ($set))) AS DOUBLE) AS nstop,
       |    CAST(len(list_distinct(w)) AS DOUBLE) AS ndistinct,
       |    $langScores
       |  FROM base
       |), m1 AS (
       |  SELECT *, $mx AS mx,
       |    (nwords / (nwords + 100.0)) * (ndistinct / nwords)
       |      * (1.0 - nstop / nwords) AS quality_score
       |  FROM m0
       |), kept AS (
       |  SELECT doc_id, lang, text, n_tokens, quality_score,
       |    CASE $langCase ELSE 'und' END AS predicted_lang
       |  FROM m1 WHERE quality_score >= $QualityThreshold
       |), exact_keep AS (
       |  SELECT MIN(doc_id) AS keep_id FROM kept GROUP BY md5(text)
       |), survivors AS (
       |  SELECT * FROM kept
       |  WHERE doc_id IN (SELECT keep_id FROM exact_keep)
       |), victims AS (
       |  SELECT DISTINCT doc_b AS victim FROM (
       |    ${Dedup.sqlMinhashPairs("survivors").linesIterator.mkString("\n    ")}
       |  )
       |)""".stripMargin
  }

  def sqlClean: String =
    s"""WITH $sqlCleanCtes
       |SELECT doc_id, lang, predicted_lang, n_tokens, quality_score
       |FROM survivors
       |WHERE doc_id NOT IN (SELECT victim FROM victims)
       |ORDER BY doc_id""".stripMargin

  /** Stage-attrition funnel of the cleaning pipeline: documents counted
    * at each gate (raw → quality pass → exact-dup survivor → near-dup
    * survivor) — the "where did my corpus go" report every cleaning run
    * publishes. Shares [[clean]]'s frames; `Iterate.pin` on the shared
    * prefixes keeps the four counts from re-running the chain per stage.
    */
  def funnel(docs: DataFrame): DataFrame = {
    val metrics = Iterate.pin(docs
      .select(col("doc_id"), col("text"), words(col("text")).as("w"))
      .select(col("doc_id"), col("text"),
        qualityScore(col("w")).as("quality_score")))
    val kept = Iterate.pin(metrics
      .filter(col("quality_score") >= QualityThreshold))
    val exactKeep = kept
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    val survivors = Iterate.pin(
      kept.join(exactKeep, col("doc_id") === col("keep_id"), "left_semi"))
    val victims = Dedup
      .minhashPairs(survivors.select(col("doc_id"), col("text")))
      .select(col("doc_b").as("victim")).distinct()
    val cleaned = survivors
      .join(victims, col("doc_id") === col("victim"), "left_anti")
    Seq("1_raw" -> docs, "2_quality" -> kept, "3_exact_dedup" -> survivors,
      "4_near_dedup" -> cleaned)
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(stage).as("stage"), col("n_docs"))
      }
      .reduce(_.unionByName(_))
      .orderBy(col("stage"))
  }

  def sqlFunnel: String =
    s"""WITH $sqlCleanCtes
       |SELECT stage, n_docs FROM (
       |  SELECT '1_raw' AS stage,
       |    CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
       |  UNION ALL
       |  SELECT '2_quality', CAST((SELECT COUNT(*) FROM kept) AS BIGINT)
       |  UNION ALL
       |  SELECT '3_exact_dedup',
       |    CAST((SELECT COUNT(*) FROM survivors) AS BIGINT)
       |  UNION ALL
       |  SELECT '4_near_dedup',
       |    CAST((SELECT COUNT(*) FROM survivors
       |          WHERE doc_id NOT IN (SELECT victim FROM victims))
       |      AS BIGINT)
       |) ORDER BY stage""".stripMargin
}
