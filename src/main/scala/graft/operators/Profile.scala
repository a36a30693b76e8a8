package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before and
  * after every transformation stage: per-column null count, distinct
  * count, and min/max (stringified so heterogeneous column types share one
  * output schema, the standard profile-report shape).
  *
  * ONE aggregation pass for all columns: every metric is a column of a
  * single global `agg`, then the 1-row wide result explodes into
  * per-column report rows — the 100 TB table is scanned once, not once
  * per profiled column. (Multiple `countDistinct`s plan via Expand — an
  * N-way row multiplication before the aggregate — which is still one
  * scan and the standard Spark multi-distinct shape.) `countDistinct` is
  * exact here — swap in [[Sketch.kmvDistinct]] or HLL when the profile
  * only needs estimates.
  */
object Profile {

  /** Top-k per column for [[topValues]]. */
  val TopValK = 5

  /** Most-frequent-values panel over the categorical order/lineitem
    * columns — the "top values" card every data profiler shows, with
    * each value's share of its column. One union of thin per-column
    * hash aggregates (map-side partial; the value domains are tiny),
    * per-column totals ride the same aggregate output, and the per-
    * column top-k is a keyed rank window (WindowGroupLimit-pruned).
    * Counts exact BIGINT; share is one IEEE division.
    */
  def topValues(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counted(df: DataFrame, colName: String): DataFrame =
      df.groupBy(col(colName).as("value"))
        .agg(count(lit(1)).as("n"))
        .select(lit(colName).as("column_name"), col("value"), col("n"))
    val all = counted(lineitem, "l_returnflag")
      .unionByName(counted(lineitem, "l_linestatus"))
      .unionByName(counted(orders, "o_orderstatus"))
      .unionByName(counted(orders, "o_orderpriority"))
    val w = Window.partitionBy(col("column_name"))
      .orderBy(col("n").desc, col("value"))
    val totals = all.groupBy(col("column_name").as("cn"))
      .agg(sum(col("n")).cast("long").as("total"))
    all.join(broadcast(totals), col("column_name") === col("cn"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopValK)
      .select(col("column_name"), col("rk").cast("long").as("rk"),
        col("value"), col("n"),
        (col("n").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy(col("column_name"), col("rk"))
  }

  def sqlTopValues: String =
    s"""WITH counts AS (
       |  SELECT 'l_returnflag' AS column_name, l_returnflag AS value,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM lineitem GROUP BY 2
       |  UNION ALL
       |  SELECT 'l_linestatus', l_linestatus, CAST(COUNT(*) AS BIGINT)
       |  FROM lineitem GROUP BY 2
       |  UNION ALL
       |  SELECT 'o_orderstatus', o_orderstatus, CAST(COUNT(*) AS BIGINT)
       |  FROM orders GROUP BY 2
       |  UNION ALL
       |  SELECT 'o_orderpriority', o_orderpriority,
       |    CAST(COUNT(*) AS BIGINT)
       |  FROM orders GROUP BY 2
       |), totals AS (
       |  SELECT column_name AS cn, CAST(SUM(n) AS BIGINT) AS total
       |  FROM counts GROUP BY column_name
       |), ranked AS (
       |  SELECT column_name, value, n, total,
       |    ROW_NUMBER() OVER (PARTITION BY column_name
       |      ORDER BY n DESC, value) AS rk
       |  FROM counts JOIN totals ON column_name = cn
       |)
       |SELECT column_name, CAST(rk AS BIGINT) AS rk, value, n,
       |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
       |FROM ranked WHERE rk <= $TopValK
       |ORDER BY column_name, rk""".stripMargin

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_value"),
          col(s"${c}__max").as("max_value"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  def sqlProfile(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"

  // ------------------------------------------------- equi-width histogram
  /** Equi-width histogram of a numeric column — the distribution half of a
    * profile report (min/max/nulls above tell you the range; this tells
    * you the shape, which drives partition sizing, skew detection, and
    * quantile sanity checks).
    *
    * Two scans total, both full-parallel: one tiny (min, max) aggregate
    * whose 1-row result BROADCASTS back (never a scalar collect, never a
    * single-partition window), then one map-side bucket assignment + hash
    * aggregate. Bucket arithmetic is the identical IEEE expression tree on
    * both engines — width computed once, floor of one division — and
    * `floor` is CAST to BIGINT explicitly (Spark floor(double) is already
    * BIGINT; DuckDB's stays DOUBLE).
    */
  val HistBuckets = 20

  def histogram(df: DataFrame, valueCol: String): DataFrame = {
    val stats = df.agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    // NULLs are excluded, not binned: least(NULL, k) is k in BOTH engines,
    // so without the filter every NULL lands silently in the top bucket.
    // Null accounting belongs to profile()'s n_nulls, not the histogram.
    df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .crossJoin(broadcast(stats))
      .withColumn("w", (col("mx") - col("mn")) / HistBuckets)
      // constant column ⇒ width 0 ⇒ 0/0 = NaN: everything lands in bucket 0
      .withColumn("bucket",
        when(col("w") === 0, lit(0L)).otherwise(
          least(floor((col("v") - col("mn")) / col("w")),
            lit(HistBuckets - 1L))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_items"),
        (first(col("mn")) + col("bucket") * first(col("w"))).as("bucket_lo"))
      .select(col("bucket"), col("bucket_lo"), col("n_items"))
      .orderBy(col("bucket"))
  }

  // ------------------------------------------------- join-key skew report
  /** Join/shuffle-key skew report — the DETECT side of the skew story
    * ([[Skew.saltedJoin]] is the fix): the top-k hottest keys with their
    * row share and cumulative share. `share` near 1/partitions for the top
    * key means a balanced shuffle; a top key carrying several partitions'
    * worth of rows is the salting/AQE-skew-join trigger.
    *
    * Scale shape: ONE hash aggregate over the table (count per key), then
    * ranking over the |keys|-sized count frame — the global window obeys
    * the "key-sized frames only" discipline, and WindowGroupLimit prunes
    * it per partition before the final ranking. Shares are single
    * divisions of exact BIGINTs (cumulative sum is integer before the one
    * division), so both engines emit identical doubles. NULL keys are
    * excluded (their ordering position differs between engines; count
    * them in [[profile]]'s n_nulls instead).
    */
  val SkewTopK = 10

  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    val byCnt = Window.orderBy(col("n_rows").desc, col("key_value"))
    val cum = Window.orderBy(col("rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("rk", row_number().over(byCnt))
      .filter(col("rk") <= SkewTopK)
      .crossJoin(broadcast(total))
      .withColumn("cum_rows", sum(col("n_rows")).over(cum))
      .select(col("rk"), col("key_value"), col("n_rows"),
        (col("n_rows").cast("double") / col("total").cast("double"))
          .as("share"),
        (col("cum_rows").cast("double") / col("total").cast("double"))
          .as("cum_share"))
      .orderBy(col("rk"))
  }

  def sqlKeySkew(table: String, keyCol: String): String =
    s"""WITH kc AS (
       |  SELECT CAST($keyCol AS VARCHAR) AS key_value,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1
       |), t AS (
       |  SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM kc
       |), r AS (
       |  SELECT key_value, n_rows,
       |    ROW_NUMBER() OVER (ORDER BY n_rows DESC, key_value) AS rk
       |  FROM kc
       |)
       |SELECT rk, key_value, n_rows,
       |  CAST(n_rows AS DOUBLE) / total AS share,
       |  CAST(SUM(n_rows) OVER (ORDER BY rk
       |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total AS cum_share
       |FROM r, t WHERE rk <= $SkewTopK
       |ORDER BY rk""".stripMargin

  def sqlHistogram(table: String, valueCol: String): String =
    s"""WITH stats AS (
       |  SELECT MIN($valueCol) AS mn, MAX($valueCol) AS mx FROM $table
       |), b AS (
       |  SELECT CASE WHEN (mx - mn) / $HistBuckets = 0 THEN 0
       |    ELSE least(CAST(floor((CAST($valueCol AS DOUBLE) - mn)
       |      / ((mx - mn) / $HistBuckets)) AS BIGINT),
       |      ${HistBuckets - 1}) END AS bucket,
       |    mn, (mx - mn) / $HistBuckets AS w
       |  FROM $table, stats
       |  WHERE $valueCol IS NOT NULL
       |)
       |SELECT bucket, mn + bucket * w AS bucket_lo,
       |  CAST(COUNT(*) AS BIGINT) AS n_items
       |FROM b GROUP BY bucket, mn, w
       |ORDER BY bucket""".stripMargin

  // ----------------------------------------------- expectation checks
  /** Declarative data-quality expectations (the Great-Expectations /
    * dbt-test staple): a named suite of constraints validated in as few
    * passes as the constraint classes allow, reported as one
    * (check, n_violations, n_rows, pass) frame a pipeline gates on.
    *
    * Three constraint classes, three plan shapes:
    *  - row-local predicates (range, domain, not-null) — ALL of them in
    *    ONE conditional-sum aggregate over a single scan, map-side
    *    partial; adding a check adds a column, never a pass;
    *  - uniqueness — one groupBy on the key with a surplus sum (each
    *    duplicate group contributes size−1 violations);
    *  - referential integrity — one anti join against the (broadcastable)
    *    parent keys.
    * NULL semantics: a NULL never satisfies a violation predicate
    * (three-valued logic → ELSE 0), so nullability is its own explicit
    * check rather than silently polluting range checks.
    */
  def expectations(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val rowChecks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "quantity_in_1_50" -> !col("l_quantity").between(1.0, 50.0),
      "discount_in_0_to_01" -> !col("l_discount").between(0.0, 0.1),
      "price_positive" -> (col("l_extendedprice") <= 0.0),
      "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
      "shipdate_not_null" -> col("l_shipdate").isNull)
    // pin the 1-row summary: three consumers (the per-check explode and
    // both crossJoined n_rows columns) would otherwise each re-run the
    // full-table scan behind it
    val scan = Iterate.pin(lineitem.agg(
      count(lit(1)).as("n_rows"),
      rowChecks.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(name)
      }: _*))
    val nRows = broadcast(scan.select(col("n_rows")))
    val perRowCheck = scan.select(col("n_rows"), explode(array(
      rowChecks.map { case (name, _) =>
        struct(lit(name).as("check"), col(name).as("n_violations"))
      }: _*)).as("c"))
      .select(col("c.check").as("check"),
        col("c.n_violations").as("n_violations"), col("n_rows"))
    val unique = lineitem
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(when(col("cnt") > 1, col("cnt") - 1L)), lit(0L))
        .as("n_violations"))
      .select(lit("orderkey_linenumber_unique").as("check"),
        col("n_violations"))
      .crossJoin(nRows)
    val referential = lineitem
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orderkey_in_orders").as("check"), col("n_violations"))
      .crossJoin(nRows)
    perRowCheck.unionByName(unique).unionByName(referential)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check"))
  }

  def sqlExpectations: String =
    s"""WITH n AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem
       |), rowchecks AS (
       |  SELECT 'quantity_in_1_50' AS check, CAST(SUM(CASE WHEN
       |      NOT (l_quantity BETWEEN 1.0 AND 50.0) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_violations FROM lineitem
       |  UNION ALL
       |  SELECT 'discount_in_0_to_01', CAST(SUM(CASE WHEN
       |      NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM lineitem
       |  UNION ALL
       |  SELECT 'price_positive', CAST(SUM(CASE WHEN
       |      l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM lineitem
       |  UNION ALL
       |  SELECT 'returnflag_domain', CAST(SUM(CASE WHEN
       |      NOT (l_returnflag IN ('A', 'N', 'R')) THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM lineitem
       |  UNION ALL
       |  SELECT 'shipdate_not_null', CAST(SUM(CASE WHEN
       |      l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
       |  UNION ALL
       |  SELECT 'orderkey_linenumber_unique',
       |    CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt - 1 END), 0)
       |      AS BIGINT)
       |  FROM (SELECT COUNT(*) AS cnt FROM lineitem
       |        GROUP BY l_orderkey, l_linenumber)
       |  UNION ALL
       |  SELECT 'orderkey_in_orders', CAST(COUNT(*) AS BIGINT)
       |  FROM lineitem WHERE NOT EXISTS
       |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
       |)
       |SELECT "check", n_violations, n_rows, n_violations = 0 AS pass
       |FROM rowchecks, n
       |ORDER BY "check" """.stripMargin

  // --------------------------------------------- functional dependencies
  /** Approximate functional-dependency audit (the g₃-style key-violation
    * measure of Kivinen & Mannila, "Approximate inference of functional
    * dependencies from relations", TCS 1995): for each candidate X → Y,
    * count the X-groups whose Y is not constant. strength = 1 −
    * violating/keys, so a true dependency (a key, a denormalized
    * attribute) scores exactly 1.0 and the report ranks how far each
    * candidate is from holding — the schema-inference signal a
    * lake-ingestion pipeline reads before trusting a join key or
    * choosing a clustering column.
    *
    * Scale shape: each candidate is ONE hash aggregation onto its
    * determinant (count-distinct of the dependent riding in the same
    * exchange) followed by a single-row reduce; candidates are
    * independent and union into a |candidates|-row report. Strength is
    * one IEEE division of two exact BIGINTs — no float hazard.
    */
  def fdAudit(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame): DataFrame = {
    def audit(df: DataFrame, name: String, keys: Seq[String],
        dep: String): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(countDistinct(col(dep)).as("ndep"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("ndep") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
          (lit(1.0) - col("n_violating").cast("double") /
            col("n_keys").cast("double")).as("strength"))
    audit(orders, "o_orderkey->o_custkey", Seq("o_orderkey"), "o_custkey")
      .unionByName(audit(orders, "o_custkey->o_orderstatus",
        Seq("o_custkey"), "o_orderstatus"))
      .unionByName(audit(lineitem, "l_orderkey,l_linenumber->l_partkey",
        Seq("l_orderkey", "l_linenumber"), "l_partkey"))
      .unionByName(audit(lineitem, "l_orderkey->l_suppkey",
        Seq("l_orderkey"), "l_suppkey"))
      .unionByName(audit(lineitem, "l_partkey->l_suppkey",
        Seq("l_partkey"), "l_suppkey"))
      .unionByName(audit(customer, "c_custkey->c_nationkey",
        Seq("c_custkey"), "c_nationkey"))
      .orderBy(col("fd"))
  }

  def sqlFdAudit: String = {
    def one(table: String, name: String, keys: String, dep: String) =
      s"""SELECT '$name' AS fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_violating
         |  FROM (SELECT COUNT(DISTINCT $dep) AS ndep FROM $table
         |        GROUP BY $keys)""".stripMargin
    s"""SELECT fd, n_keys, n_violating,
       |  1.0 - CAST(n_violating AS DOUBLE) / CAST(n_keys AS DOUBLE)
       |    AS strength
       |FROM (
       |  ${one("orders", "o_orderkey->o_custkey", "o_orderkey",
              "o_custkey")}
       |  UNION ALL
       |  ${one("orders", "o_custkey->o_orderstatus", "o_custkey",
              "o_orderstatus")}
       |  UNION ALL
       |  ${one("lineitem", "l_orderkey,l_linenumber->l_partkey",
              "l_orderkey, l_linenumber", "l_partkey")}
       |  UNION ALL
       |  ${one("lineitem", "l_orderkey->l_suppkey", "l_orderkey",
              "l_suppkey")}
       |  UNION ALL
       |  ${one("lineitem", "l_partkey->l_suppkey", "l_partkey",
              "l_suppkey")}
       |  UNION ALL
       |  ${one("customer", "c_custkey->c_nationkey", "c_custkey",
              "c_nationkey")}
       |)
       |ORDER BY fd""".stripMargin
  }

  // ------------------------------------------------- correlation matrix
  /** Pairwise Pearson correlation of the numeric fact columns — the
    * correlated-column report a profiler emits before choosing
    * compression encodings, sort keys, or which columns a synthetic-data
    * or imputation model must treat jointly.
    *
    * Scale + precision shape: Pearson r is invariant under positive
    * affine scaling, so the variables are scored as EXACT integers
    * (quantity as-is, the 2-dp money/rate columns in cents — the
    * `round(x·100)` is of a value within 1 ulp of an integer, so both
    * engines land on the same cent) and every moment but one is a plain
    * BIGINT sum — measured ~10× cheaper per aggregate than the
    * wide-decimal detour this query first shipped with (4.7 s → ~0.5 s
    * at sf0.1; a distinct DECIMAL(28,12) aggregation costs ~0.3 s per
    * 600 k rows, and this query needs 14 distinct moments). Σprice²
    * alone exceeds int64 (~6·10¹⁹ at sf0.1) and rides DECIMAL(38,0) —
    * DuckDB's SUM(BIGINT) is naturally HUGEINT. ONE scan computes all
    * 15 moments; the 6 report rows explode from the 1-row result; each
    * r is a fixed IEEE expression over moments cast long→double
    * (identical rounding both engines). Bounds: the quantity×price
    * moment reaches int64 around 10¹¹ rows — past that it (and the
    * plain sums) take the same DECIMAL(38,0) detour as Σprice², one
    * line each, plan unchanged.
    */
  val CorrCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def corrPairs: Seq[(Int, Int)] =
    for {
      i <- CorrCols.indices
      j <- (i + 1) until CorrCols.size
    } yield (i, j)

  def corrMatrix(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val scaled = lineitem.select(
      round(col("l_quantity")).cast("long").as("x0"),
      round(col("l_extendedprice") * 100).cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"),
      round(col("l_tax") * 100).cast("long").as("x3"))
    def sq(i: Int): org.apache.spark.sql.Column = {
      val p = col(s"x$i") * col(s"x$i")
      // Σ(price_cents²) ~ 6·10¹⁹ at sf0.1: the one moment past int64
      if (i == 1) sum(p.cast(DecimalType(38, 0))).cast("double")
      else sum(p).cast("double")
    }
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n") +:
        (CorrCols.indices.map(i =>
          sum(col(s"x$i")).cast("double").as(s"s_$i")) ++
          CorrCols.indices.map(i => sq(i).as(s"ss_$i")) ++
          corrPairs.map { case (i, j) =>
            sum(col(s"x$i") * col(s"x$j")).cast("double").as(s"p_${i}_$j")
          })
    // ONE consumer of the 1-row moment frame: the six report rows are an
    // explode of a literal-keyed struct array, so the scan runs exactly
    // once with no pin and no union fan
    val m = scaled.agg(aggs.head, aggs.tail: _*)
    val dn = col("n").cast("double")
    val rows = corrPairs.map { case (i, j) =>
      struct(lit(CorrCols(i)).as("col_a"), lit(CorrCols(j)).as("col_b"),
        col("n").as("n"),
        ((dn * col(s"p_${i}_$j") - col(s"s_$i") * col(s"s_$j")) /
          sqrt((dn * col(s"ss_$i") - col(s"s_$i") * col(s"s_$i")) *
            (dn * col(s"ss_$j") - col(s"s_$j") * col(s"s_$j"))))
          .as("pearson_r"))
    }
    m.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a").as("col_a"), col("r.col_b").as("col_b"),
        col("r.n").as("n"), col("r.pearson_r").as("pearson_r"))
      .orderBy(col("col_a"), col("col_b"))
  }

  def sqlCorrMatrix: String = {
    val moments =
      (CorrCols.indices.map(i => s"CAST(SUM(x$i) AS DOUBLE) AS s_$i") ++
        CorrCols.indices.map(i =>
          s"CAST(SUM(x$i * x$i) AS DOUBLE) AS ss_$i") ++
        corrPairs.map { case (i, j) =>
          s"CAST(SUM(x$i * x$j) AS DOUBLE) AS p_${i}_$j"
        }).mkString(",\n    ")
    val rows = corrPairs.map { case (i, j) =>
      s"""SELECT '${CorrCols(i)}' AS col_a, '${CorrCols(j)}' AS col_b, n,
         |    (CAST(n AS DOUBLE) * p_${i}_$j - s_$i * s_$j)
         |      / sqrt((CAST(n AS DOUBLE) * ss_$i - s_$i * s_$i)
         |             * (CAST(n AS DOUBLE) * ss_$j - s_$j * s_$j))
         |      AS pearson_r
         |  FROM m""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sc AS (
       |  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x0,
       |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x1,
       |    CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
       |    CAST(ROUND(l_tax * 100) AS BIGINT) AS x3
       |  FROM lineitem
       |), m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    $moments
       |  FROM sc
       |)
       |$rows
       |ORDER BY col_a, col_b""".stripMargin
  }

  // ------------------------------------------------------ value histogram
  /** Fixed-width value histogram over a fact column — the profiling
    * readout behind partition-sizing and predicate-selectivity decisions.
    * Width is a FIXED integer constant, not (max−min)/k: data-independent
    * bucket edges make the histogram mergeable across days/shards (two
    * runs' buckets align) and keep the bucket id an exact integer floor
    * division — no double boundary whose rounding could split a hash
    * across engines. Shape: ONE map-side bucket assignment + ONE hash
    * aggregation; min/max per bucket are exact double comparisons, the
    * sum goes through the exact-decimal detour.
    */
  val HistWidth = 5000L

  def histogram(lineitem: DataFrame): DataFrame = {
    import graft.functions.Exact
    lineitem.filter(col("l_extendedprice").isNotNull)
      .select(expr(s"cast(floor(l_extendedprice) as bigint) div $HistWidth")
        .as("bucket"), col("l_extendedprice").as("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_val"),
        max(col("v")).as("max_val"), Exact.xsum(col("v"), 2).as("sum_val"))
      .withColumn("lo", col("bucket") * HistWidth)
      .select(col("bucket"), col("lo"), col("n_rows"), col("min_val"),
        col("max_val"), col("sum_val"))
      .orderBy(col("bucket"))
  }

  def sqlHistogram: String = {
    import graft.functions.Exact
    s"""SELECT CAST(floor(l_extendedprice) AS BIGINT) // $HistWidth
       |    AS bucket,
       |  (CAST(floor(l_extendedprice) AS BIGINT) // $HistWidth)
       |    * $HistWidth AS lo,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(l_extendedprice) AS min_val,
       |  MAX(l_extendedprice) AS max_val,
       |  ${Exact.sqlSum("l_extendedprice", 2)} AS sum_val
       |FROM lineitem WHERE l_extendedprice IS NOT NULL
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin
  }

  // ------------------------------------------------ mutual information
  /** Pointwise and total mutual information between two categorical
    * columns (lang × source on documents) — the dependence audit that
    * catches a skewed corpus mix before training (a language confined to
    * one source means source-dedup silently deletes that language).
    * Complements `profile_corr_matrix` (linear, numeric) and
    * `events_cramer` (χ²-normalized) with the information-theoretic
    * readout: pmi per cell plus each cell's contribution p(x,y)·pmi to
    * total MI.
    *
    * Cross-engine determinism: pmi = ln((n/n_lang)·(tot/n_src)) — the ln
    * argument is a product of two double-cast ratios, each factor cast
    * BEFORE the divide so the BIGINT products n·tot / n_lang·n_src are
    * never formed (they would wrap Int64 once per-cell counts pass ~3e9 —
    * silent in Spark, an error in DuckDB); both engines evaluate the
    * identical cast-divide-multiply sequence, bit-identical
    * cross-engine. The ln ITSELF is not: this query found the suite's
    * first real Java `Math.log` vs DuckDB `std::log` last-ulp split
    * (argument 1.2435…, off by one ulp at sf0.001), so both outputs are
    * rounded to 9 decimals — the entropy family's xsum(…,12) forgiveness,
    * applied at emit time since nothing here aggregates.
    *
    * Scale shape: one map-side hash agg to cells (|langs|·|sources| rows),
    * two window margins over that tiny frame, broadcast total. At 100 TB
    * the only corpus-wide work is the first count shuffle on the
    * composite key.
    */
  def mutualInfo(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("n_lang", sum(col("n")).over(
        Window.partitionBy(col("lang"))))
      .withColumn("n_src", sum(col("n")).over(
        Window.partitionBy(col("source"))))
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy()))
      .select(col("lang"), col("source"), col("n"), col("n_lang"),
        col("n_src"),
        round(log((col("n").cast("double") / col("n_lang").cast("double")) *
          (col("tot").cast("double") / col("n_src").cast("double"))), 9)
          .as("pmi"),
        round((col("n").cast("double") / col("tot").cast("double")) *
          log((col("n").cast("double") / col("n_lang").cast("double")) *
            (col("tot").cast("double") / col("n_src").cast("double"))), 9)
          .as("mi_term"))
      .orderBy(col("lang"), col("source"))
  }

  def sqlMutualInfo: String =
    s"""WITH cells AS (
       |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM documents GROUP BY lang, source
       |), m AS (
       |  SELECT lang, source, n,
       |    CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
       |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS n_src,
       |    CAST(SUM(n) OVER () AS BIGINT) AS tot
       |  FROM cells
       |)
       |SELECT lang, source, n, n_lang, n_src,
       |  ROUND(ln((CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE))
       |    * (CAST(tot AS DOUBLE) / CAST(n_src AS DOUBLE))),
       |    9) AS pmi,
       |  ROUND((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
       |    * ln((CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE))
       |      * (CAST(tot AS DOUBLE) / CAST(n_src AS DOUBLE))),
       |    9) AS mi_term
       |FROM m ORDER BY lang, source""".stripMargin
}
