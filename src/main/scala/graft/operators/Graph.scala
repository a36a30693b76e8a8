package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over relational frames: PageRank (Page,
  * Brin, Motwani & Winograd, "The PageRank citation ranking", 1999) on the
  * bipartite customer–supplier graph induced by orders⋈lineitem. Together
  * with [[Dedup.connectedComponents]] (min-label + pointer jumping) this
  * covers the two classic iterative-dataflow shapes: reachability and
  * fixed-point value propagation.
  *
  * Scale shape per round: ONE hash-partitioned join (edges ⋈ ranks on src)
  * + ONE hash aggregate (incoming mass per dst) — the standard
  * edge-partitioned PageRank; no driver-side state, no collect. The edge
  * list is checkpointed once and reused every round; the rank frame is
  * `Iterate.pin`ned per round to cut iterative-lineage growth (same
  * discipline as connectedComponents and ivfKmeans). At 100 TB the edge
  * join and the mass aggregate share the same src/dst hash partitioning,
  * and AQE handles the power-law skew of hub nodes (or pre-split hubs with
  * [[Skew.saltedJoin]] mechanics).
  *
  * Cross-engine determinism: per-edge contribution `rank/deg` is one IEEE
  * division (deterministic per row); the incoming-mass SUM — the only
  * order-sensitive step — goes through the exact-decimal detour
  * ([[graft.functions.Exact.xsum]], scale 12: rank mass ≤ 1, so the
  * rescaled integer is far under 2^53); the damping update is two more
  * single IEEE ops. Constants are written `CAST(.. AS DOUBLE)` in the
  * oracle so DuckDB never routes them through DECIMAL arithmetic.
  */
object Graph {

  /** Supplier node ids are offset into their own range so the bipartite
    * node set lives in one BIGINT id space. 10^12, NOT a "big enough"
    * million: TPC-H custkeys reach 150 000·SF (1.5·10^10 at the 100 TB
    * scale point) and a too-small offset silently MERGES a customer with
    * a supplier node — wrong degrees and ranks that no shared-constant
    * oracle can catch. 10^12 keeps both ranges disjoint past SF 10^6
    * while dst = supp + SuppBase stays far under 2^63.
    */
  val SuppBase = 1000000000000L
  val Damping = 0.85
  val PrIters = 2
  val PrTopK = 20

  /** Undirected bipartite edges: customer ↔ supplier iff some order of the
    * customer has a line item from the supplier. Distinct — edge weight is
    * structural, not multiplicity.
    */
  def custSuppEdges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()

  /** Per-(session, key) memo of the PINNED distinct edge set — the
    * orders⋈lineitem DISTINCT is the expensive part of every graph query,
    * and the edge list is an interesting product on its own (`graph_edges`
    * is oracled independently), so compute it once and let pagerank pay
    * only the rounds. Same composition-cache discipline as
    * [[Dedup.clusterArtifactsCached]].
    */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), DataFrame]()

  def custSuppEdgesCached(orders: DataFrame, lineitem: DataFrame,
      cacheKey: String): DataFrame = {
    edgeCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    edgeCache.computeIfAbsent((orders.sparkSession, cacheKey),
      _ => Iterate.pin(custSuppEdges(orders, lineitem)))
  }

  def invalidateEdges(spark: org.apache.spark.sql.SparkSession): Unit =
    edgeCache.keySet.removeIf(_._1 eq spark)

  /** PageRank over the undirected bipartite graph (every node has deg ≥ 1,
    * so there is no dangling mass). Returns the top-`PrTopK` nodes by final
    * rank: (rk, node_id, rank).
    */
  def pagerank(orders: DataFrame, lineitem: DataFrame,
               iters: Int = PrIters): DataFrame =
    // pin the DISTINCT pair set (the orders⋈lineitem heavy subtree) and
    // derive both directions from the pinned blocks — pinning after the
    // union would run the join+distinct once per union branch first
    pagerankFrom(Iterate.pin(custSuppEdges(orders, lineitem)), iters)

  /** [[pagerank]] from an already-pinned distinct (cust, supp) edge frame
    * — the [[custSuppEdgesCached]] composition point.
    */
  def pagerankFrom(e0: DataFrame, iters: Int = PrIters): DataFrame = {
    import graft.functions.Exact
    val edges = e0
      .select(col("cust").as("src"), (col("supp") + SuppBase).as("dst"))
      .unionByName(e0.select((col("supp") + SuppBase).as("src"),
        col("cust").as("dst")))
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    // |V| rides along as a column (broadcast 1-row aggregate) — the plan
    // stays fully declarative, no driver-side scalar round trip.
    val n = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("n")).as("rank"),
        col("deg"), col("n"))
    for (i <- 1 to iters) {
      val incoming = edges.join(ranks, edges("src") === ranks("id"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(Exact.xsum(col("c"), 12).as("s"))
      ranks = ranks.join(incoming, ranks("id") === incoming("dst"), "left")
        .select(col("id"),
          (lit(1.0 - Damping) / col("n")
            + lit(Damping) * coalesce(col("s"), lit(0.0))).as("rank"),
          col("deg"), col("n"))
      // cut lineage every third round, not every round: each eager pin is
      // a full materialization job, and three rounds of join lineage is
      // well inside planner limits — the deep-iteration protection stays,
      // shallow runs (the default iters=2) skip the per-round jobs
      if (i % 3 == 0 && i < iters) ranks = Iterate.pin(ranks)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("rank").desc, col("id"))
    // global top-k: WindowGroupLimit prunes per partition before the
    // single-partition final ranking sees only candidates
    ranks
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= PrTopK)
      .select(col("rk"), col("id").as("node_id"), col("rank"))
      .orderBy(col("rk"))
  }

  /** DuckDB oracle: rounds unrolled as (s_k, r_k) CTE pairs. */
  def sqlPagerank(iters: Int = PrIters): String = {
    import graft.functions.Exact
    val oneMinusD = s"CAST(${1.0 - Damping} AS DOUBLE)"
    val dD = s"CAST($Damping AS DOUBLE)"
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (
         |  SELECT e.dst, ${Exact.sqlSum("r.rank / r.deg", 12)} AS s
         |  FROM edges e JOIN r${k - 1} r ON e.src = r.id GROUP BY e.dst
         |), r$k AS (
         |  SELECT r.id, $oneMinusD / r.n
         |      + $dD * COALESCE(s$k.s, CAST(0 AS DOUBLE)) AS rank,
         |    r.deg, r.n
         |  FROM r${k - 1} r LEFT JOIN s$k ON r.id = s$k.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), edges AS (
       |  SELECT cust AS src, supp + $SuppBase AS dst FROM e0
       |  UNION ALL
       |  SELECT supp + $SuppBase, cust FROM e0
       |), deg AS (
       |  SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src
       |), nn AS (SELECT COUNT(*) AS n FROM deg),
       |r0 AS (
       |  SELECT id, CAST(1 AS DOUBLE) / n AS rank, deg, n FROM deg, nn
       |),
       |$rounds
       |SELECT rk, id AS node_id, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY rank DESC, id) AS rk
       |  FROM r$iters
       |) WHERE rk <= $PrTopK ORDER BY rk""".stripMargin
  }
}
