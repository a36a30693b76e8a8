package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity matching / record linkage over the part-name vocabulary — the
  * blocking → pairwise-score → best-match pipeline of Fellegi-Sunter-style
  * record linkage (Fellegi & Sunter 1969; Winkler 1990 for the string
  * comparator), the standard pre-join step when two feeds name the same
  * real-world entities with spelling drift.
  *
  * Scale shape (the decisions that survive 100 TB):
  *  - Scoring runs on the DISTINCT-name frame, never on the row stream: the
  *    name vocabulary is bounded by the entity universe (here 64 names for
  *    20 k part rows; at 100 TB still ≪ corpus), so the quadratic stage is
  *    paid once per vocabulary, and row-level consumers rejoin by name.
  *  - Blocking bounds the candidate set: pairs form only INSIDE a block
  *    (the name's last token — the noun), one hash-partitioned equi join on
  *    the block key, never an all-pairs cross product. A pathological block
  *    would use the same lazy-[[graft.functions.PairExpand]] cap as the
  *    dedup tier; these blocks are ≤ |adjectives| names.
  *  - The scorer is the codegen'd [[graft.functions.JaroWinkler]]
  *    expression — the pair loop stays inside WholeStageCodegen.
  *  - Best-match is row_number()-pruned (WindowGroupLimit pushes the top-1
  *    into the sort), keyed by the left name — no global sort.
  */
object Match {

  /** Pairs at or above this Jaro-Winkler score are match candidates (the
    * conventional "possible match" review threshold).
    */
  val JwThreshold = 0.75

  /** Distinct part names with their blocking key (last token = the noun;
    * the fixture names are "adjective noun").
    */
  private def names(part: DataFrame): DataFrame =
    part.filter(col("p_name").isNotNull)
      .select(col("p_name").as("name")).distinct()
      .withColumn("block", split(col("name"), " ").getItem(1))

  /** Blocked candidate pairs scored by Jaro-Winkler, thresholded at
    * [[JwThreshold]]. Canonical orientation (name_a < name_b) emits each
    * unordered pair exactly once with no distinct pass.
    */
  def jwPairs(part: DataFrame): DataFrame = {
    graft.functions.StringSim.register(part.sparkSession)
    val t = names(part)
    t.select(col("name").as("name_a"), col("block"))
      .join(t.select(col("name").as("name_b"), col("block")), Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", expr("graft_jaro_winkler(name_a, name_b)"))
      .filter(col("jw") >= JwThreshold)
      .select(col("name_a"), col("name_b"), col("jw"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Best match per name: the highest-scoring OTHER name in its block
    * (ties broken by candidate name, so the double ordering is total).
    * No threshold — this is the reviewer's "closest candidate" view.
    */
  def bestMatch(part: DataFrame): DataFrame = {
    graft.functions.StringSim.register(part.sparkSession)
    val t = names(part)
    val w = Window.partitionBy(col("name"))
      .orderBy(col("jw").desc, col("cand"))
    t.select(col("name"), col("block"))
      .join(t.select(col("name").as("cand"), col("block")), Seq("block"))
      .filter(col("name") =!= col("cand"))
      .withColumn("jw", expr("graft_jaro_winkler(name, cand)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("name"), col("cand").as("best_match"), col("jw").as("score"))
      .orderBy(col("name"))
  }

  /** Blocking audit — the cost the blocking key buys: per-block name count
    * and the exact candidate-pair bill n·(n−1)/2 (the
    * [[Dedup.bandProfile]] discipline: price the expansion before anyone
    * pays it).
    */
  def blockingAudit(part: DataFrame): DataFrame =
    names(part)
      .groupBy(col("block")).agg(count(lit(1)).as("n_names"))
      .withColumn("n_pairs",
        expr("n_names * (n_names - 1) div 2"))
      .orderBy(col("block"))

  /** Entity-resolution clusters: connected components over the accepted
    * match pairs ([[jwPairs]] at the review threshold) — the step that
    * turns pairwise verdicts into entity groups (transitivity: if A≈B
    * and B≈C, one entity), each reported with its canonical
    * representative (min name) and size. Completes the linkage
    * pipeline: blocking → scoring → best-match → CLUSTERS.
    *
    * Scale shape: names get dense integer ids via a rank over the
    * DISTINCT-name frame (vocabulary-bounded — never a corpus window),
    * then the SAME pointer-jumping [[Dedup.connectedComponents]] the
    * dedup tier runs; representative/size is one |clustered names|
    * aggregate. Names absent from every pair are singletons and —
    * matching the components contract — do not appear.
    */
  def matchClusters(part: DataFrame): DataFrame = {
    val ids = names(part)
      .withColumn("id", row_number().over(
        Window.orderBy(col("name"))).cast("long"))
    val p = jwPairs(part)
      .join(ids.select(col("name").as("name_a"), col("id").as("doc_a")),
        Seq("name_a"))
      .join(ids.select(col("name").as("name_b"), col("id").as("doc_b")),
        Seq("name_b"))
      .select(col("doc_a"), col("doc_b"))
    val comp = Dedup.connectedComponents(p)
    val m = comp.join(ids.select(col("id").as("doc_id"), col("name")),
      Seq("doc_id"))
    val rep = m.groupBy(col("component"))
      .agg(min(col("name")).as("cluster_rep"),
        count(lit(1)).as("cluster_size"))
    m.join(rep, Seq("component"))
      .select(col("name"), col("cluster_rep"), col("cluster_size"))
      .orderBy(col("name"))
  }

  // ------------------------------------------------------------ oracle SQL

  def sqlJwPairs: String =
    s"""WITH n AS (
       |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
       |), t AS (
       |  SELECT name, split_part(name, ' ', 2) AS block FROM n
       |)
       |SELECT a.name AS name_a, b.name AS name_b,
       |  jaro_winkler_similarity(a.name, b.name) AS jw
       |FROM t a JOIN t b ON a.block = b.block AND a.name < b.name
       |WHERE jaro_winkler_similarity(a.name, b.name) >= $JwThreshold
       |ORDER BY name_a, name_b""".stripMargin

  def sqlBestMatch: String =
    """WITH n AS (
      |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
      |), t AS (
      |  SELECT name, split_part(name, ' ', 2) AS block FROM n
      |), scored AS (
      |  SELECT a.name, b.name AS cand,
      |    jaro_winkler_similarity(a.name, b.name) AS jw,
      |    ROW_NUMBER() OVER (PARTITION BY a.name
      |      ORDER BY jaro_winkler_similarity(a.name, b.name) DESC, b.name)
      |      AS rn
      |  FROM t a JOIN t b ON a.block = b.block AND a.name <> b.name
      |)
      |SELECT name, cand AS best_match, jw AS score
      |FROM scored WHERE rn = 1 ORDER BY name""".stripMargin

  def sqlMatchClusters: String =
    s"""WITH RECURSIVE n AS (
       |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
       |), t AS (
       |  SELECT name, split_part(name, ' ', 2) AS block FROM n
       |), ids AS (
       |  SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) AS BIGINT)
       |    AS id
       |  FROM n
       |), pairs0 AS (
       |  SELECT a.name AS name_a, b.name AS name_b
       |  FROM t a JOIN t b ON a.block = b.block AND a.name < b.name
       |  WHERE jaro_winkler_similarity(a.name, b.name) >= $JwThreshold
       |), pairs AS (
       |  SELECT ia.id AS doc_a, ib.id AS doc_b
       |  FROM pairs0
       |  JOIN ids ia ON pairs0.name_a = ia.name
       |  JOIN ids ib ON pairs0.name_b = ib.name
       |),
       |${Dedup.sqlComponentsCtes},
       |m AS (
       |  SELECT c.component, i.name FROM comp c JOIN ids i ON c.doc_id = i.id
       |), rep AS (
       |  SELECT component, MIN(name) AS cluster_rep,
       |    CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM m GROUP BY component
       |)
       |SELECT m.name, rep.cluster_rep, rep.cluster_size
       |FROM m JOIN rep USING (component)
       |ORDER BY m.name""".stripMargin

  def sqlBlockingAudit: String =
    """WITH n AS (
      |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
      |), t AS (
      |  SELECT name, split_part(name, ' ', 2) AS block FROM n
      |)
      |SELECT block, CAST(COUNT(*) AS BIGINT) AS n_names,
      |  CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_pairs
      |FROM t GROUP BY block ORDER BY block""".stripMargin
}
