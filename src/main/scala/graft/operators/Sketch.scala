package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps.{sqlTokenHash, tokenHash}

/** Distinct-count sketching that is exactly reproducible across engines.
  *
  * `approx_count_distinct` (HLL++) has no cross-engine oracle — its estimate
  * depends on Spark's private hash and register layout. The KMV (k-minimum
  * values) estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002; Beyer et al., SIGMOD 2007 for the unbiased
  * form) is different: given a SHARED hash function, the k smallest distinct
  * hash values — and therefore the estimate — are fully deterministic, so a
  * DuckDB oracle hash-matches bit for bit. We use the same md5-derived
  * 32-bit hash as the text operators.
  *
  * Estimator: with h_(k) the k-th smallest distinct hash mapped into (0,1],
  * estimate = (k-1) / h_(k)  (the unbiased KMV estimator).
  *
  * Scale shape: ONE aggregation through the [[graft.functions.KmvSketch]]
  * `TypedImperativeAggregate` — per-partition buffers hold at most k longs
  * regardless of input size, dedup happens inside the buffer, and the
  * exchange moves one ≤ k·8-byte sketch per partition per group. No
  * distinct shuffle, no rank window: the raw stream is hashed map-side and
  * never moves. Merge (min-k of the set union) is associative and
  * commutative, so the kept hashes are EXACTLY the k smallest distinct
  * values — bit-identical to the relational sorted-distinct-limit-k form
  * the DuckDB oracle runs.
  */
object Sketch {

  val K = 64
  val HashSpace = 4294967296.0 // 2^32: tokenHash range is [0, 2^32)

  /** Per-group KMV distinct estimate of `valueCol`, alongside the exact
    * count for error inspection.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.functions.VectorExprs.register(df.sparkSession)
    df
      // NULL values hash to NULL and are skipped by the aggregate (COUNT
      // DISTINCT semantics); a group whose every value is NULL yields an
      // empty sketch and is dropped — matching the oracle, whose
      // WHERE-IS-NOT-NULL base never produces that group at all
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorExprs.kmvMinHashes(
        tokenHash(col(valueCol).cast("string")), K).as("hs"))
      .filter(size(col("hs")) > 0)
      // fewer than K distinct values → sketch is exact (its size); the
      // array is sorted ascending, so the k-th smallest is the LAST slot
      .select(col(groupCol),
        when(size(col("hs")) < K, size(col("hs")).cast("double"))
          .otherwise(round(
            lit(K - 1) / ((element_at(col("hs"), -1) + lit(1L)).cast("double")
              / lit(HashSpace)),
            4))
          .as("kmv_estimate"))
      .orderBy(col(groupCol))
  }

  def sqlKmvDistinct(table: String, groupCol: String, valueCol: String): String =
    s"""WITH hashes AS (
       |  SELECT $groupCol, ${sqlTokenHash(s"CAST($valueCol AS VARCHAR)")} AS h
       |  FROM (SELECT DISTINCT $groupCol, $valueCol FROM $table
       |        WHERE $valueCol IS NOT NULL)
       |), ranked AS (
       |  SELECT $groupCol, h,
       |    ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY h) AS rk
       |  FROM hashes
       |), kept AS (
       |  SELECT $groupCol, COUNT(*) AS n_kept, MAX(h) AS hk
       |  FROM ranked WHERE rk <= $K GROUP BY $groupCol
       |)
       |SELECT $groupCol,
       |  CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
       |       ELSE ROUND(($K - 1) / (CAST(hk + 1 AS DOUBLE) / $HashSpace), 4)
       |  END AS kmv_estimate
       |FROM kept
       |ORDER BY $groupCol""".stripMargin

  // ------------------------------------------- KMV join-size estimation
  /** Join-cardinality estimation from KMV sketches (Beyer et al., "On
    * synopses for distinct-value estimation under multiset operations",
    * SIGMOD 2007): the k smallest key hashes of each join side are a
    * uniform sample of the DISTINCT-key space, so the union sketch (k
    * smallest of the merged sets) estimates |A∪B|, the fraction of union
    * survivors present in BOTH sketches estimates the Jaccard, and their
    * product estimates the distinct-key overlap |A∩B| — the number a
    * planner wants before committing to a join strategy at 100 TB.
    * Exact counts ride along as the audit columns (the [[countMin]]
    * pattern); production reads the sketch side alone.
    *
    * Scale shape: per side, ONE [[graft.functions.KmvSketch]] aggregation
    * over the map-side-hashed keys (k-bounded partial buffers — no
    * distinct shuffle, no sort, only one ≤ k·8-byte sketch per partition
    * moves), exploded back to a ≤ k-row hash frame; everything after is
    * ≤ k-row frames cross-joined into one output row. The two sides never
    * join each other except through their sketches (the exact audit join
    * is the oracle's job, dropped in production).
    */
  def kmvJoinEstimate(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    graft.functions.VectorExprs.register(a.sparkSession)
    def sketch(df: DataFrame, key: String) = df
      .agg(graft.functions.VectorExprs.kmvMinHashes(
        tokenHash(col(key).cast("string")), K).as("hs"))
      .select(explode(col("hs")).as("h"))
    def est(k: Column, hk: Column) =
      when(k < K, k.cast("double")).otherwise(
        lit(K - 1) / ((hk + lit(1L)).cast("double") / lit(HashSpace)))
    val sa = sketch(a, aKey).transform(Iterate.pin) // 3 consumers: stats, union, common
    val sb = sketch(b, bKey).transform(Iterate.pin)
    val su = sa.union(sb).distinct().orderBy(col("h")).limit(K)
      .transform(Iterate.pin)
    val aStats = sa.agg(count(lit(1)).as("ka"), max(col("h")).as("hka"))
    val bStats = sb.agg(count(lit(1)).as("kb"), max(col("h")).as("hkb"))
    val uStats = su.agg(count(lit(1)).as("ku"), max(col("h")).as("hku"))
    val common = su.join(sa, "h").join(sb, "h").agg(count(lit(1)).as("c"))
    val aExact = a.filter(col(aKey).isNotNull).select(col(aKey)).distinct()
      .agg(count(lit(1)).as("a_exact"))
    val bExact = b.filter(col(bKey).isNotNull).select(col(bKey)).distinct()
      .agg(count(lit(1)).as("b_exact"))
    val iExact = a.select(col(aKey).as("k")).distinct()
      .join(b.select(col(bKey).as("k")).distinct(), "k")
      .agg(count(lit(1)).as("intersect_exact"))
    aStats.crossJoin(bStats).crossJoin(uStats).crossJoin(common)
      .crossJoin(aExact).crossJoin(bExact).crossJoin(iExact)
      .select(
        est(col("ka"), col("hka")).as("a_distinct_est"),
        est(col("kb"), col("hkb")).as("b_distinct_est"),
        est(col("ku"), col("hku")).as("union_est"),
        (col("c").cast("double") / col("ku").cast("double"))
          .as("jaccard_est"),
        ((col("c").cast("double") / col("ku").cast("double")) *
          est(col("ku"), col("hku"))).as("intersect_est"),
        col("a_exact"), col("b_exact"), col("intersect_exact"))
  }

  def sqlKmvJoinEstimate(aTable: String, aKey: String,
      bTable: String, bKey: String): String = {
    def sketchCte(name: String, table: String, key: String) =
      s"""$name AS (
         |  SELECT ${sqlTokenHash(s"CAST($key AS VARCHAR)")} AS h
         |  FROM (SELECT DISTINCT $key FROM $table WHERE $key IS NOT NULL)
         |  ORDER BY h LIMIT $K
         |)""".stripMargin
    def est(k: String, hk: String) =
      s"""CASE WHEN $k < $K THEN CAST($k AS DOUBLE)
         |       ELSE ($K - 1) / (CAST($hk + 1 AS DOUBLE) / $HashSpace)
         |  END""".stripMargin
    s"""WITH ${sketchCte("sa", aTable, aKey)},
       |${sketchCte("sb", bTable, bKey)},
       |su AS (
       |  SELECT h FROM (SELECT DISTINCT h FROM (
       |    SELECT h FROM sa UNION ALL SELECT h FROM sb
       |  )) ORDER BY h LIMIT $K
       |), astats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS ka, MAX(h) AS hka FROM sa
       |), bstats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS kb, MAX(h) AS hkb FROM sb
       |), ustats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS hku FROM su
       |), common AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS c
       |  FROM su JOIN sa USING (h) JOIN sb USING (h)
       |), aexact AS (
       |  SELECT CAST(COUNT(DISTINCT $aKey) AS BIGINT) AS a_exact
       |  FROM $aTable WHERE $aKey IS NOT NULL
       |), bexact AS (
       |  SELECT CAST(COUNT(DISTINCT $bKey) AS BIGINT) AS b_exact
       |  FROM $bTable WHERE $bKey IS NOT NULL
       |), iexact AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS intersect_exact FROM
       |    (SELECT DISTINCT $aKey AS k FROM $aTable) x
       |    JOIN (SELECT DISTINCT $bKey AS k FROM $bTable) y USING (k)
       |)
       |SELECT ${est("ka", "hka")} AS a_distinct_est,
       |  ${est("kb", "hkb")} AS b_distinct_est,
       |  ${est("ku", "hku")} AS union_est,
       |  CAST(c AS DOUBLE) / CAST(ku AS DOUBLE) AS jaccard_est,
       |  (CAST(c AS DOUBLE) / CAST(ku AS DOUBLE)) * ${est("ku", "hku")}
       |    AS intersect_est,
       |  a_exact, b_exact, intersect_exact
       |FROM astats, bstats, ustats, common, aexact, bexact, iexact""".stripMargin
  }

  // ----------------------------------------------------- Count-Min sketch
  /** Count-Min frequency sketch (Cormode & Muthukrishnan, "An improved data
    * stream summary: the count-min sketch and its applications", J.
    * Algorithms 2005) in its relational form, plus a per-key audit of the
    * one-sided error: depth × width counter matrix where
    * cell(j, b) = COUNT of rows whose j-th hash lands in bucket b; the
    * frequency estimate for a key is min_j cell(j, hash_j(key)) ≥ true
    * count, with overestimate bounded by collisions in its best row.
    *
    * Like [[kmvDistinct]], the hash family is md5-derived with an explicit
    * row-index salt, so a DuckDB oracle reproduces every cell and every
    * estimate bit for bit — `approx_count_distinct`-style engine-private
    * sketches have no such oracle.
    *
    * Scale shape: the sketch build is a [[CmsDepth]]×-fanout explode
    * followed by ONE hash aggregation onto [[CmsDepth]]·[[CmsWidth]] cells
    * — partial aggregation collapses each map task to ≤ 1024 rows before
    * the exchange, so the shuffle is O(partitions), not O(rows); this is
    * precisely why CMS works as a streaming/distributed summary. The
    * estimate probe broadcasts the tiny cell table. The exact side (one
    * groupBy on the key) exists to AUDIT the estimate in the oracle gate —
    * production consumers read the sketch alone.
    */
  val CmsDepth = 4
  val CmsWidth = 256L

  def cmsHash(j: Int, v: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long") % CmsWidth
  def sqlCmsHash(j: Int, v: String): String =
    s"CAST(('0x' || substr(md5('$j:' || CAST($v AS VARCHAR)), 1, 8)) AS BIGINT) % $CmsWidth"

  private def cmsProbes(key: Column): Column =
    explode(array((0 until CmsDepth).map(j =>
      struct(lit(j).as("row_j"), cmsHash(j, key).as("bucket"))): _*))

  /** The sketch proper: the depth×width cell table. Works unchanged over
    * a STREAMING DataFrame (explode + groupBy-count is an incrementally
    * maintainable aggregation — see `stream_cms_state`), which is the
    * whole point of CMS as a distributed/streaming summary.
    */
  def cells(df: DataFrame, keyCol: String): DataFrame = df
    .select(cmsProbes(col(keyCol)).as("rb"))
    .groupBy(col("rb.row_j").as("row_j"), col("rb.bucket").as("bucket"))
    .agg(count(lit(1)).as("cnt"))

  def countMin(df: DataFrame, keyCol: String): DataFrame = {
    val sketch = cells(df, keyCol)
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("exact_cnt"))
      .select(col(keyCol), col("exact_cnt"), cmsProbes(col(keyCol)).as("rb"))
      .select(col(keyCol), col("exact_cnt"),
        col("rb.row_j").as("row_j"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_j", "bucket"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col(keyCol), col("exact_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_cnt")).as("overestimate"))
      .orderBy(col(keyCol))
  }

  /** The cell-table SQL shared by the batch oracle and the streaming
    * final-state oracle. */
  def sqlCells(table: String, keyCol: String): String = {
    val sketchRows = (0 until CmsDepth).map(j =>
      s"SELECT $j AS row_j, ${sqlCmsHash(j, keyCol)} AS bucket FROM $table")
      .mkString("\n  UNION ALL\n  ")
    s"""SELECT row_j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |  $sketchRows
       |  ) GROUP BY row_j, bucket""".stripMargin
  }

  def sqlCountMin(table: String, keyCol: String): String = {
    val probeRows = (0 until CmsDepth).map(j =>
      s"SELECT $keyCol, exact_cnt, $j AS row_j, ${sqlCmsHash(j, keyCol)} AS bucket FROM exact")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH cells AS (
       |  ${sqlCells(table, keyCol).linesIterator.mkString("\n  ")}
       |), exact AS (
       |  SELECT $keyCol, CAST(COUNT(*) AS BIGINT) AS exact_cnt
       |  FROM $table GROUP BY $keyCol
       |), probes AS (
       |  $probeRows
       |)
       |SELECT $keyCol, exact_cnt, cms_estimate,
       |  cms_estimate - exact_cnt AS overestimate
       |FROM (
       |  SELECT p.$keyCol, p.exact_cnt, MIN(c.cnt) AS cms_estimate
       |  FROM probes p JOIN cells c
       |    ON p.row_j = c.row_j AND p.bucket = c.bucket
       |  GROUP BY p.$keyCol, p.exact_cnt
       |) ORDER BY $keyCol""".stripMargin
  }

  // ------------------------------------------------------- AMS F2 sketch
  /** Second-moment (F2) tug-of-war sketch (Alon, Matias & Szegedy, "The
    * space complexity of approximating the frequency moments", STOC 1996
    * §2.2): [[AmsCounters]] signed counters c_j = Σ_rows sign_j(key),
    * each an unbiased estimator via X_j = c_j²; the estimate is the
    * median of [[AmsGroups]] group means (median-of-means, the paper's
    * variance-reduction layer). F2 = Σ_v f_v² IS the self-join size of
    * the table on the key — the number a join planner wants before
    * deciding whether a key is skew-salted, measured here against the
    * exact audit.
    *
    * The sign family is md5-derived (parity of a salted 32-bit hash), so
    * a DuckDB oracle reproduces every counter bit for bit — the same
    * cross-engine-determinism contract as [[cmsHash]]/[[kmvDistinct]].
    *
    * Scale shape: the sketch side is ONE aggregate with 16 sum columns —
    * partial aggregation collapses every map task to a single 16-long
    * row before a single-row exchange; the raw stream never shuffles.
    * That is the whole AMS point: O(1) state, stream- and
    * partition-mergeable. The exact side (one groupBy on the key) exists
    * to AUDIT the estimate; a production planner reads the sketch alone.
    * Determinism: counters and c_j² are exact BIGINTs (|c_j| ≤ n_rows,
    * so c² fits to ~3·10⁹ rows; past that the audit detours through
    * DECIMAL while the sketch itself is unaffected); the group means,
    * the median of four (= (Σ − max − min)/2), and the relative error
    * are a fixed handful of IEEE double ops, identical in both engines.
    */
  val AmsCounters = 16
  val AmsGroups = 4

  private def amsSign(j: Int, v: Column): Column =
    lit(1L) - lit(2L) *
      (conv(substring(md5(concat(lit(s"f$j:"), v.cast("string"))), 1, 8),
        16, 10).cast("long") % 2L)
  private def sqlAmsSign(j: Int, v: String): String =
    s"1 - 2 * (CAST(('0x' || substr(md5('f$j:' || CAST($v AS VARCHAR)), " +
      s"1, 8)) AS BIGINT) % 2)"

  def amsF2(df: DataFrame, keyCol: String): DataFrame = {
    val rows = df.filter(col(keyCol).isNotNull)
    val perGroup = AmsCounters / AmsGroups
    val ctr = rows.agg(count(lit(1)).as("n_rows"),
      (0 until AmsCounters).map(j =>
        sum(amsSign(j, col(keyCol))).as(s"s$j")): _*)
    val means = ctr.select(col("n_rows") +:
      (0 until AmsGroups).map { g =>
        (g * perGroup until (g + 1) * perGroup)
          .map(j => col(s"s$j") * col(s"s$j"))
          .reduce(_ + _).cast("double")./(lit(perGroup.toDouble))
          .as(s"m$g")
      }: _*)
    val ms = (0 until AmsGroups).map(g => col(s"m$g"))
    val est = means.select(col("n_rows"),
      ((ms.reduce(_ + _) - greatest(ms: _*) - least(ms: _*)) / lit(2.0))
        .as("ams_estimate"))
    val exact = rows.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n") * col("n")).as("exact_f2"))
    est.crossJoin(broadcast(exact))
      .select(col("n_rows"), col("n_keys"), col("exact_f2"),
        col("ams_estimate"),
        ((col("ams_estimate") - col("exact_f2").cast("double")) /
          col("exact_f2").cast("double")).as("rel_error"))
  }

  def sqlAmsF2(table: String, keyCol: String): String = {
    val perGroup = AmsCounters / AmsGroups
    val sums = (0 until AmsCounters).map(j =>
      s"CAST(SUM(${sqlAmsSign(j, keyCol)}) AS BIGINT) AS s$j")
      .mkString(",\n    ")
    val meansCols = (0 until AmsGroups).map { g =>
      val terms = (g * perGroup until (g + 1) * perGroup)
        .map(j => s"s$j * s$j").mkString(" + ")
      s"CAST($terms AS DOUBLE) / $perGroup AS m$g"
    }.mkString(",\n    ")
    val ms = (0 until AmsGroups).map(g => s"m$g")
    s"""WITH c AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    $sums
       |  FROM $table WHERE $keyCol IS NOT NULL
       |), x AS (
       |  SELECT n_rows,
       |    $meansCols
       |  FROM c
       |), est AS (
       |  SELECT n_rows,
       |    (${ms.mkString(" + ")}
       |      - greatest(${ms.mkString(", ")})
       |      - least(${ms.mkString(", ")})) / 2 AS ams_estimate
       |  FROM x
       |), e AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |    CAST(SUM(n * n) AS BIGINT) AS exact_f2
       |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM $table
       |        WHERE $keyCol IS NOT NULL GROUP BY $keyCol)
       |)
       |SELECT n_rows, n_keys, exact_f2, ams_estimate,
       |  (ams_estimate - CAST(exact_f2 AS DOUBLE))
       |    / CAST(exact_f2 AS DOUBLE) AS rel_error
       |FROM est, e""".stripMargin
  }
}
