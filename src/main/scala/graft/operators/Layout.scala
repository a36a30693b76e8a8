package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the 100 TB lake: multi-dimensional clustering
  * via Z-order (Morton) keys, so scans filtered on EITHER dimension prune
  * most files. The reference stores its tables as unindexed heaps
  * (`SQL/etl_world_banks.sql:4-7` — SERIAL PK only, every probe a
  * sequential scan); at lake scale the engine's substitute for indexes is
  * file-level min/max pruning, and pruning quality is decided by the
  * physical sort order this operator produces.
  *
  * Z-ordering (Morton 1966; the interleaved-bit space-filling curve used
  * by analytic stores for multi-dimensional clustering): quantize each
  * dimension ORDER-PRESERVINGLY to [[BitsPerDim]] bits, then interleave
  * the bits so ranges of the combined key are small rectangles in (x, y)
  * space. Sorting by ONE dimension gives perfect min/max bounds on that
  * dimension and useless bounds on the other; sorting by the Z-key gives
  * tight bounds on BOTH. Quantization must be monotone (linear min/max
  * scaling, NOT `mod`) — a mod-reduction clusters by low bits and the
  * per-file min/max footer bounds on the original values stay as wide as
  * the whole domain, which defeats pruning.
  *
  * Scale shape: dimension min/max is one tiny all-to-one aggregate
  * (broadcast back); quantization + interleave are then pure map-side
  * integer expressions (codegen'd, no shuffle of the fact table). File
  * assignment here uses FIXED equal-width Z-ranges (`zkey div width`),
  * also map-side. A production writer swaps in
  * `repartitionByRange($"zkey")` + per-partition files — same key, one
  * range shuffle, balanced file sizes; the fixed-width form keeps the
  * oracle deterministic and shuffle-free. The output is the layout AUDIT:
  * per-file row counts and min/max bounds per dimension — exactly the
  * footer statistics a scan planner prunes on.
  */
object Layout {

  /** Bits per dimension after quantization. 16 bits ↔ 65536 cells per dim;
    * `(x - min) * 2^BitsPerDim` must stay under 2^63, so dimension SPANS up
    * to ~2^46 are safe — wider domains pre-scale (`x div 2^k`) first.
    */
  val BitsPerDim = 16
  val NFiles = 16

  /** Morton interleave of two already-quantized BitsPerDim-bit keys: bit j
    * of x lands at position 2j, bit j of y at 2j+1. Pure shifts/masks/adds
    * — identical on any engine, all inside whole-stage codegen.
    */
  def zkey(x: Column, y: Column): Column =
    (0 until BitsPerDim).map { j =>
      (shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)

  def sqlZkey(x: String, y: String): String =
    (0 until BitsPerDim).map { j =>
      s"(($x // ${1L << j}) % 2) * ${1L << (2 * j)}" +
        s" + (($y // ${1L << j}) % 2) * ${1L << (2 * j + 1)}"
    }.mkString("(", ")\n  + (", ")")

  /** Layout audit over lineitem clustered on (l_partkey, l_suppkey): assign
    * each row to a fixed Z-range file, then report per-file bounds. Tight
    * per-file (min,max) rectangles on BOTH dimensions = the clustering
    * works; a scan with `l_partkey = k` or `l_suppkey = s` prunes by the
    * same footer stats.
    */
  def zorderAudit(lineitem: DataFrame): DataFrame = {
    val width = (1L << (2 * BitsPerDim)) / NFiles
    val bounds = lineitem.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    lineitem
      .select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(bounds))
      .withColumn("qx", expr(
        s"((l_partkey - pmin) * ${1L << BitsPerDim}) div (pmax - pmin + 1)"))
      .withColumn("qy", expr(
        s"((l_suppkey - smin) * ${1L << BitsPerDim}) div (smax - smin + 1)"))
      .withColumn("zkey", zkey(col("qx"), col("qy")))
      // `div` (integer division) ↔ DuckDB `//` — never `/`+cast, whose
      // double detour truncates differently from floor division.
      .groupBy(expr(s"zkey div $width").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_min"),
        max(col("l_partkey")).as("part_max"),
        min(col("l_suppkey")).as("supp_min"),
        max(col("l_suppkey")).as("supp_max"))
      .orderBy(col("file_id"))
  }

  def sqlZorderAudit: String = {
    val width = (1L << (2 * BitsPerDim)) / NFiles
    s"""WITH b AS (
       |  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |  FROM lineitem
       |), q AS (
       |  SELECT l_partkey, l_suppkey,
       |    ((l_partkey - pmin) * ${1L << BitsPerDim}) // (pmax - pmin + 1) AS qx,
       |    ((l_suppkey - smin) * ${1L << BitsPerDim}) // (smax - smin + 1) AS qy
       |  FROM lineitem, b
       |), z AS (
       |  SELECT l_partkey, l_suppkey,
       |    ${sqlZkey("qx", "qy")} AS zkey
       |  FROM q
       |)
       |SELECT zkey // $width AS file_id, COUNT(*) AS n_rows,
       |  MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
       |  MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
       |FROM z GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  // --------------------------------------------------- compaction planner
  /** Output file-group count for [[compactionPlan]]. */
  val CompactGroups = 4

  /** Small-file compaction planner — the OPTIMIZE-style maintenance op of
    * a lakehouse table: pack the layout's [[NFiles]] files into
    * [[CompactGroups]] contiguous target-sized rewrite groups by running
    * prefix sums over the file manifest (contiguous in Z-key order, so
    * each rewritten file still covers a compact key range and the
    * zone-map bounds stay tight). `group_id = cum_before div target` is
    * the standard deterministic bin-boundary assignment — groups can
    * exceed the target by at most one input file, and no greedy
    * driver-side loop is involved.
    *
    * Scale shape: the window runs over the FILE MANIFEST (|files| rows —
    * 16 here, ~10⁶ at a 100 TB table), never the data; at manifest sizes
    * where a single-partition window stings, the bucketized prefix-sum
    * pattern of `TrainingData.shard` drops in unchanged. The data itself
    * is only touched by the rewrite jobs the plan drives, one per group.
    */
  def compactionPlan(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = zorderAudit(lineitem).select(col("file_id"), col("n_rows"))
    val total = files.agg(sum(col("n_rows")).as("total"))
    val w = Window.orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.crossJoin(broadcast(total))
      .withColumn("target",
        expr(s"(total + ${CompactGroups - 1}) div $CompactGroups"))
      .withColumn("cum_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("group_id", expr("cum_before div target"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("group_rows"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .orderBy(col("group_id"))
  }

  def sqlCompactionPlan: String =
    s"""WITH files AS (
       |  SELECT file_id, n_rows FROM (
       |    ${sqlZorderAudit.linesIterator.mkString("\n    ")}
       |  )
       |), t AS (
       |  SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM files
       |), c AS (
       |  SELECT file_id, n_rows,
       |    CAST(COALESCE(SUM(n_rows) OVER (ORDER BY file_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before,
       |    (total + ${CompactGroups - 1}) // $CompactGroups AS target
       |  FROM files, t
       |)
       |SELECT cum_before // target AS group_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(n_rows) AS BIGINT) AS group_rows,
       |  MIN(file_id) AS first_file, MAX(file_id) AS last_file
       |FROM c GROUP BY 1 ORDER BY group_id""".stripMargin

  // --------------------------------------------------- Hilbert curve layout
  /** Bits per dimension for the Hilbert key (256 cells per dim — plenty
    * for a [[NFiles]]-file audit; the curve's locality advantage is
    * per-CELL, not per-bit).
    */
  val HilbertBits = 8

  /** Hilbert curve distance (Hilbert 1891; the xy2d walk popularized by
    * Warren, "Hacker's Delight" §16-1): unlike Z-order, every consecutive
    * pair of key values is an ADJACENT cell, so equal key ranges are more
    * compact rectangles — tighter per-file min/max bounds at the same
    * file count.
    *
    * Formulated as a STATE MACHINE over the original bits rather than the
    * textbook coordinate-rewriting loop: the per-level rotation group is
    * Z₂×Z₂ (swap × complement), so two boolean flags replace the (x, y)
    * rewrites — `rx = cf ⊕ bit(sf ? y : x)`, `ry = cf ⊕ bit(sf ? x : y)`,
    * quadrant = (3·rx) ⊕ ry, then `sf ⊕= [ry=0]`, `cf ⊕= [ry=0 ∧ rx=1]`.
    * Each level lands in NAMED intermediate columns: Catalyst keeps the
    * per-level projections separate (CollapseProject refuses to duplicate
    * non-cheap expressions), so the plan stays linear in [[HilbertBits]]
    * and fully codegen'd — the naive expression-substitution form grows
    * ~4^bits nodes and falls out of codegen. Integer-only ops, identical
    * in the DuckDB oracle's unrolled CTE chain.
    */
  def withHilbertKey(df: DataFrame, qx: String, qy: String,
      out: String): DataFrame = {
    var cur = df.withColumn(out, lit(0L))
      .withColumn("h_sf", lit(0)).withColumn("h_cf", lit(0))
    for (k <- HilbertBits - 1 to 0 by -1) {
      cur = cur
        .withColumn("h_bx",
          shiftright(col(qx), k).bitwiseAND(lit(1L)).cast("int"))
        .withColumn("h_by",
          shiftright(col(qy), k).bitwiseAND(lit(1L)).cast("int"))
        .withColumn("h_rx",
          (when(col("h_sf") === 1, col("h_by")).otherwise(col("h_bx"))
            + col("h_cf")) % 2)
        .withColumn("h_ry",
          (when(col("h_sf") === 1, col("h_bx")).otherwise(col("h_by"))
            + col("h_cf")) % 2)
        .withColumn(out, col(out) + lit(1L << (2 * k)) *
          when(col("h_rx") === 0 && col("h_ry") === 0, 0L)
            .when(col("h_rx") === 0, 1L)
            .when(col("h_ry") === 1, 2L)
            .otherwise(3L))
        .withColumn("h_nsf",
          (col("h_sf") + when(col("h_ry") === 0, 1).otherwise(0)) % 2)
        .withColumn("h_cf", (col("h_cf") +
          when(col("h_ry") === 0 && col("h_rx") === 1, 1).otherwise(0)) % 2)
        .withColumn("h_sf", col("h_nsf"))
    }
    cur.drop("h_sf", "h_cf", "h_bx", "h_by", "h_rx", "h_ry", "h_nsf")
  }

  /** Layout audit over lineitem clustered on the Hilbert key of
    * (l_partkey, l_suppkey) — identical audit shape to [[zorderAudit]]
    * (quantize → key → fixed key-range file assignment → per-file
    * bounds), so the two space-filling curves are directly comparable
    * row for row. Same scale shape: one tiny bounds aggregate broadcast
    * back, then pure map-side integer expressions.
    */
  def hilbertAudit(lineitem: DataFrame): DataFrame = {
    val width = (1L << (2 * HilbertBits)) / NFiles
    val bounds = lineitem.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val quantized = lineitem
      .select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(bounds))
      .withColumn("qx", expr(
        s"((l_partkey - pmin) * ${1L << HilbertBits}) div (pmax - pmin + 1)"))
      .withColumn("qy", expr(
        s"((l_suppkey - smin) * ${1L << HilbertBits}) div (smax - smin + 1)"))
    withHilbertKey(quantized, "qx", "qy", "hkey")
      .groupBy(expr(s"hkey div $width").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_min"),
        max(col("l_partkey")).as("part_max"),
        min(col("l_suppkey")).as("supp_min"),
        max(col("l_suppkey")).as("supp_max"))
      .orderBy(col("file_id"))
  }

  def sqlHilbertAudit: String = {
    val width = (1L << (2 * HilbertBits)) / NFiles
    // unrolled state-machine levels: h7 (MSB) … h0, each one CTE reading
    // the previous level's (d, sf, cf)
    val levels = (HilbertBits - 1 to 0 by -1).map { k =>
      val s = 1L << k
      val prev = if (k == HilbertBits - 1) "hq" else s"h${k + 1}"
      s"""h$k AS (
         |  SELECT l_partkey, l_suppkey, qx, qy,
         |    d + ${1L << (2 * k)} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |      WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END) AS d,
         |    (sf + CASE WHEN ry = 0 THEN 1 ELSE 0 END) % 2 AS sf,
         |    (cf + CASE WHEN ry = 0 AND rx = 1 THEN 1 ELSE 0 END) % 2 AS cf
         |  FROM (
         |    SELECT *,
         |      (CASE WHEN sf = 1 THEN (qy // $s) % 2
         |            ELSE (qx // $s) % 2 END + cf) % 2 AS rx,
         |      (CASE WHEN sf = 1 THEN (qx // $s) % 2
         |            ELSE (qy // $s) % 2 END + cf) % 2 AS ry
         |    FROM $prev
         |  )
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (
       |  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |  FROM lineitem
       |), hq AS (
       |  SELECT l_partkey, l_suppkey,
       |    ((l_partkey - pmin) * ${1L << HilbertBits}) // (pmax - pmin + 1) AS qx,
       |    ((l_suppkey - smin) * ${1L << HilbertBits}) // (smax - smin + 1) AS qy,
       |    CAST(0 AS BIGINT) AS d, 0 AS sf, 0 AS cf
       |  FROM lineitem, b
       |),
       |$levels
       |SELECT d // $width AS file_id, COUNT(*) AS n_rows,
       |  MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
       |  MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
       |FROM h0 GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  // ------------------------------------------------- zone-map pruning audit
  /** Quantified data skipping: replay the scan planner's
    * skip-it-or-scan-it decision against the Z-order layout's per-file
    * min/max zone maps for three representative probes (one per clustered
    * dimension, one rectangle), and report files scanned, rows scanned,
    * and rows actually matching — the over-scan ratio the layout exists
    * to minimize. Probe bounds derive from the data's own domain (bottom
    * eighth / quarter of each dimension), so the audit is scale-factor
    * independent in structure.
    *
    * Scale shape: the zone-map frame is [[NFiles]] rows and the probe
    * frame 3 rows — everything file-level is broadcast arithmetic. The
    * exact matching counts are ONE map-side pass over the fact table
    * (broadcast probe × filter before partial aggregation); production
    * reads the zone-map side alone and skips that pass.
    */
  def pruningAudit(lineitem: DataFrame): DataFrame = {
    val files = zorderAudit(lineitem)
    val bounds = lineitem.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val probes = bounds.select(explode(array(
      struct(lit("part_bottom_eighth").as("probe"),
        col("pmin").as("plo"),
        expr("pmin + (pmax - pmin) div 8").as("phi"),
        col("smin").as("slo"), col("smax").as("shi")),
      struct(lit("rect_bottom_quarter").as("probe"),
        col("pmin").as("plo"),
        expr("pmin + (pmax - pmin) div 4").as("phi"),
        col("smin").as("slo"),
        expr("smin + (smax - smin) div 4").as("shi")),
      struct(lit("supp_bottom_eighth").as("probe"),
        col("pmin").as("plo"), col("pmax").as("phi"),
        col("smin").as("slo"),
        expr("smin + (smax - smin) div 8").as("shi")))).as("p"))
      .select(col("p.*"))
    val filesTotal = files.agg(count(lit(1)).as("files_total"))
    val scanned = files.crossJoin(broadcast(probes))
      .filter(col("part_max") >= col("plo") && col("part_min") <= col("phi") &&
        col("supp_max") >= col("slo") && col("supp_min") <= col("shi"))
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("files_scanned"),
        sum(col("n_rows")).as("rows_scanned"))
    val matching = lineitem
      .select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(probes))
      .filter(col("l_partkey").between(col("plo"), col("phi")) &&
        col("l_suppkey").between(col("slo"), col("shi")))
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("rows_matching"))
    scanned.join(matching, Seq("probe")).crossJoin(broadcast(filesTotal))
      .select(col("probe"), col("files_total"), col("files_scanned"),
        col("rows_scanned"), col("rows_matching"))
      .orderBy(col("probe"))
  }

  def sqlPruningAudit: String =
    s"""WITH files AS (
       |  ${sqlZorderAudit.linesIterator.mkString("\n  ")}
       |), b2 AS (
       |  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |  FROM lineitem
       |), probes AS (
       |  SELECT 'part_bottom_eighth' AS probe, pmin AS plo,
       |    pmin + (pmax - pmin) // 8 AS phi, smin AS slo, smax AS shi FROM b2
       |  UNION ALL
       |  SELECT 'rect_bottom_quarter', pmin, pmin + (pmax - pmin) // 4,
       |    smin, smin + (smax - smin) // 4 FROM b2
       |  UNION ALL
       |  SELECT 'supp_bottom_eighth', pmin, pmax,
       |    smin, smin + (smax - smin) // 8 FROM b2
       |), ft AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS files_total FROM files
       |), scan AS (
       |  SELECT probe, CAST(COUNT(*) AS BIGINT) AS files_scanned,
       |         CAST(SUM(n_rows) AS BIGINT) AS rows_scanned
       |  FROM files JOIN probes
       |    ON part_max >= plo AND part_min <= phi
       |   AND supp_max >= slo AND supp_min <= shi
       |  GROUP BY probe
       |), m AS (
       |  SELECT probe, CAST(COUNT(*) AS BIGINT) AS rows_matching
       |  FROM lineitem JOIN probes
       |    ON l_partkey BETWEEN plo AND phi
       |   AND l_suppkey BETWEEN slo AND shi
       |  GROUP BY probe
       |)
       |SELECT probe, files_total, files_scanned, rows_scanned, rows_matching
       |FROM scan JOIN m USING (probe), ft
       |ORDER BY probe""".stripMargin

  // --------------------------------------------- bloom file-skipping audit
  /** Per-file Bloom-filter skipping audit — the EQUALITY-probe complement
    * of [[pruningAudit]]'s min/max zone maps. Zone maps prune RANGE
    * predicates, but an equality probe on a high-cardinality key inside a
    * file whose [min, max] spans most of the domain prunes nothing — the
    * lakehouse answer is a per-file Bloom filter over the key column
    * (Parquet's bloom_filter pages / Delta & Iceberg file-level blooms do
    * exactly this). This operator builds one [[BloomSkipBits]]-bit,
    * [[BloomSkipHashes]]-hash filter per Z-order file over `l_partkey`
    * and reports, for [[BloomSkipProbes]] deterministic point probes:
    * how many files the bloom would scan (`files_maybe`) vs how many
    * truly contain the key (`files_actual`). `files_maybe − files_actual`
    * is the false-positive scan cost; blooms have NO false negatives, so
    * `files_actual ≤ files_maybe` always (spec-pinned).
    *
    * Scale shape: file ids are the same map-side Z-key division as
    * [[zorderAudit]]; the per-file distinct-key frame shuffles ONCE on
    * (file_id, key); bit positions are three affine probes mod a prime
    * mod m (the [[graft.operators.TrainingData]] Bloom hash idiom —
    * integer-exact in both engines); the probe set is 16 broadcast rows,
    * so every join against it is map-side. Nothing materializes a bitset:
    * the filter IS the distinct (file_id, pos) frame, ≤ NFiles·m rows,
    * which is also how a real writer would spill footer-level bloom
    * pages — per file, sorted by position.
    */
  val BloomSkipBits = 4096L
  val BloomSkipHashes = 3
  val BloomSkipProbes = 16

  private def bsA(j: Int): Long = 1000003L * (j + 11) + 12345L
  private def bsB(j: Int): Long = 7919L * (j + 11) + 104729L
  private def bsPos(h: Column, j: Int): Column =
    (h.cast("long") * lit(bsA(j)) + lit(bsB(j))) %
      lit(Dedup.MinhashP) % lit(BloomSkipBits)
  private def sqlBsPos(h: String, j: Int): String =
    s"((CAST($h AS BIGINT) * ${bsA(j)} + ${bsB(j)}) % ${Dedup.MinhashP} % $BloomSkipBits)"

  def bloomSkipAudit(lineitem: DataFrame): DataFrame = {
    val width = (1L << (2 * BitsPerDim)) / NFiles
    val bounds = lineitem.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    // same file assignment as zorderAudit, reduced to the bloom's key
    // column; ONE shuffle builds the per-file distinct-key frame that
    // both the filter and the ground truth read
    val fileKeys = lineitem
      .select(col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(bounds))
      .withColumn("qx", expr(
        s"((l_partkey - pmin) * ${1L << BitsPerDim}) div (pmax - pmin + 1)"))
      .withColumn("qy", expr(
        s"((l_suppkey - smin) * ${1L << BitsPerDim}) div (smax - smin + 1)"))
      .withColumn("zkey", zkey(col("qx"), col("qy")))
      .select(expr(s"zkey div $width").as("file_id"), col("l_partkey"))
      .distinct()
      .transform(Iterate.pin)
    val filesTotal = fileKeys.select(col("file_id")).distinct()
      .agg(count(lit(1)).as("files_total"))
    // 16 deterministic equality probes spread across the key domain —
    // some land on present keys, some in gaps (both verdicts exercised)
    val probes = bounds.select(explode(array(
      (0 until BloomSkipProbes).map(i =>
        expr(s"CAST(pmin + ((pmax - pmin + 1) * $i) div $BloomSkipProbes" +
          " AS BIGINT)")): _*)).as("probe_key"))
    val probePos = probes.select(col("probe_key"), explode(array(
        (0 until BloomSkipHashes).map(j => bsPos(col("probe_key"), j)): _*))
        .as("pos")).distinct()
    val probeNeed = probePos.groupBy(col("probe_key"))
      .agg(count(lit(1)).as("need"))
    val filePos = fileKeys.select(col("file_id"), explode(array(
        (0 until BloomSkipHashes).map(j => bsPos(col("l_partkey"), j)): _*))
        .as("pos")).distinct()
    // a file is a bloom "maybe" iff EVERY probe position is set in it
    val maybe = filePos.join(broadcast(probePos), Seq("pos"))
      .groupBy(col("probe_key"), col("file_id"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(probeNeed), Seq("probe_key"))
      .filter(col("n_hit") === col("need"))
      .groupBy(col("probe_key")).agg(count(lit(1)).as("files_maybe"))
    val actual = fileKeys
      .join(broadcast(probes), col("l_partkey") === col("probe_key"))
      .groupBy(col("probe_key")).agg(count(lit(1)).as("files_actual"))
    probes.crossJoin(broadcast(filesTotal))
      .join(maybe, Seq("probe_key"), "left")
      .join(actual, Seq("probe_key"), "left")
      .select(col("probe_key"), col("files_total"),
        coalesce(col("files_maybe"), lit(0L)).as("files_maybe"),
        coalesce(col("files_actual"), lit(0L)).as("files_actual"))
      .orderBy(col("probe_key"))
  }

  def sqlBloomSkipAudit: String = {
    val width = (1L << (2 * BitsPerDim)) / NFiles
    val probeDefs = (0 until BloomSkipProbes).map(i =>
      s"SELECT CAST(pmin + ((pmax - pmin + 1) * $i) // $BloomSkipProbes AS BIGINT) AS probe_key FROM b")
      .mkString("\n  UNION ALL\n  ")
    def posRows(h: String, extra: String): String =
      (0 until BloomSkipHashes).map(j =>
        s"SELECT $extra, ${sqlBsPos(h, j)} AS pos FROM SRC")
        .mkString("\n    UNION ALL\n    ")
    s"""WITH b AS (
       |  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |  FROM lineitem
       |), q AS (
       |  SELECT l_partkey,
       |    ((l_partkey - pmin) * ${1L << BitsPerDim}) // (pmax - pmin + 1) AS qx,
       |    ((l_suppkey - smin) * ${1L << BitsPerDim}) // (smax - smin + 1) AS qy
       |  FROM lineitem, b
       |), fk AS (
       |  SELECT DISTINCT (${sqlZkey("qx", "qy")}) // $width AS file_id,
       |    l_partkey
       |  FROM q
       |), ft AS (
       |  SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) AS files_total FROM fk
       |), probes AS (
       |  $probeDefs
       |), probepos AS (
       |  SELECT DISTINCT probe_key, pos FROM (
       |    ${posRows("probe_key", "probe_key").replace("SRC", "probes")}
       |  )
       |), need AS (
       |  SELECT probe_key, CAST(COUNT(*) AS BIGINT) AS need
       |  FROM probepos GROUP BY probe_key
       |), filepos AS (
       |  SELECT DISTINCT file_id, pos FROM (
       |    ${posRows("l_partkey", "file_id").replace("SRC", "fk")}
       |  )
       |), hits AS (
       |  SELECT p.probe_key, f.file_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM filepos f JOIN probepos p ON f.pos = p.pos
       |  GROUP BY p.probe_key, f.file_id
       |), maybe AS (
       |  SELECT h.probe_key, CAST(COUNT(*) AS BIGINT) AS files_maybe
       |  FROM hits h JOIN need n ON h.probe_key = n.probe_key
       |  WHERE h.n_hit = n.need
       |  GROUP BY h.probe_key
       |), act AS (
       |  SELECT p.probe_key, CAST(COUNT(*) AS BIGINT) AS files_actual
       |  FROM fk JOIN probes p ON fk.l_partkey = p.probe_key
       |  GROUP BY p.probe_key
       |)
       |SELECT p.probe_key, ft.files_total,
       |  COALESCE(m.files_maybe, 0) AS files_maybe,
       |  COALESCE(a.files_actual, 0) AS files_actual
       |FROM probes p
       |LEFT JOIN maybe m ON p.probe_key = m.probe_key
       |LEFT JOIN act a ON p.probe_key = a.probe_key
       |CROSS JOIN ft
       |ORDER BY p.probe_key""".stripMargin
  }
}
