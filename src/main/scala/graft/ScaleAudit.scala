package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling audit: measure the heaviest dedup/sim/text/graph
  * queries at 1× (the sf0.1 fixture) and at a builder-generated 10×
  * corpus, and report each query's growth exponent
  * log₁₀(t₁₀ₓ/t₁ₓ) — near-linear plans stay ≤ ~1.3 (a 10× input may
  * legitimately cost slightly more than 10×: deeper shuffles, spill
  * boundaries), and anything materially above that is a plan that will
  * not survive the brief's 100× question.
  *
  * The 10× corpus is TEN DISJOINT REPLICAS with per-replica key offsets
  * (orderkey/custkey/suppkey/partkey/doc_id/vec_id), so graph replicas
  * are disconnected subgraphs and the IDEAL cost of every audited
  * operator is exactly 10× — the measured exponent therefore isolates
  * the implementation's scaling, not the data's. Two de-correlations
  * keep the data's similarity structure from faking superlinearity:
  * document replicas k ≥ 1 interleave a replica token between every
  * word (no shingle survives across replicas, so LSH buckets don't
  * accumulate 10 near-copies of every doc — within-replica similarity
  * is preserved), and embedding replicas add a deterministic
  * index-dependent jitter. Replica 0 is the original fixture verbatim.
  * doc_id offsets are multiples of 5·10⁸·2 = 10⁹ ≡ 0 (mod 5), so the
  * train/eval residue split is replica-invariant.
  *
  * Protocol: every measurement runs in a FRESH cloned session
  * (`spark.newSession()`) — all shared-artifact memos key on the
  * session instance, so each measurement pays its query's FULL chain
  * including the memo builds it would amortize inside a suite run
  * (a first attempt that let passes ride the memos measured a 0.04 s
  * "dedup_minhash" — the post-memo marginal join, not the operator).
  * Two fresh-session measurements per (query, scale); the exponent
  * uses the min — JVM JIT and the codegen cache are warm after the
  * first, memos are cold in both, which is the honest cold-operator /
  * warm-runtime point.
  *
  * Usage: runMain graft.ScaleAudit [baseDir] [tenXDir] [outJson]
  * (defaults /root/testdata/sf0.1, target/scale10x,
  * tools/scale_audit_r09.json). Generation is skipped when tenXDir
  * already holds a _DONE marker.
  */
object ScaleAudit {

  /** Replica count (default 10×). SPARK_GRAFT_SCALE_REPS overrides —
    * e.g. 100 for a two-decade spot check; the key-offset strides
    * (10⁵…10⁹) keep every id range disjoint and under [[Graph.SuppBase]]
    * through k = 999. SPARK_GRAFT_SCALE_QUERIES (comma-separated)
    * restricts the audited set for such spot checks. */
  val Replicas: Int =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10").toInt
  /** The audit set: the heaviest non-stream dedup/sim/text/graph
    * queries of the round-8 bench (stream oracles carry a fixed
    * micro-batch lifecycle floor — wall time there measures the state
    * store, not a data-dependent plan). sim_nsw_* are excluded because
    * the registry path pins the two-tier ladder to the fixture sizes
    * (Similarity.nswModsCached's oracle guard) — the 10× corpus
    * legitimately plans three tiers, which is the guard's point.
    */
  val Queries: Seq[String] = Seq(
    "dedup_containment", "dedup_minhash", "decon_minhash",
    "graph_anf", "graph_pagerank", "graph_peel", "graph_ppr",
    "graph_triangles",
    "sim_ivfpq_topk", "sim_maxmin_cells",
    "text_boilerplate", "text_winnow_pairs")

  private def gen10x(spark: SparkSession, base: String,
      out: String): Unit = {
    // the marker records the replica count: a re-run with a different
    // SPARK_GRAFT_SCALE_REPS against the same dir must regenerate, or
    // it would silently time the stale corpus while normalizing by the
    // NEW factor (halving every exponent of a 100x run over a 10x dir)
    val done = new java.io.File(s"$out/_DONE")
    if (done.exists()) {
      val recorded = new String(
        java.nio.file.Files.readAllBytes(done.toPath), "UTF-8").trim
      if (recorded == Replicas.toString) return
      System.err.println(s"[scale] $out holds a ${recorded}x corpus, " +
        s"regenerating at ${Replicas}x")
    }
    def reps(df: DataFrame)(shift: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until Replicas).map(k => shift(df, k)).reduce(_ unionByName _)

    val orders = spark.read.parquet(s"$base/orders.parquet")
    reps(orders) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + k * 100000000L)
        .withColumn("o_custkey", col("o_custkey") + k * 1000000L)
    }.write.mode("overwrite").parquet(s"$out/orders.parquet")

    val lineitem = spark.read.parquet(s"$base/lineitem.parquet")
    reps(lineitem) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + k * 100000000L)
        .withColumn("l_suppkey", col("l_suppkey") + k * 100000L)
        .withColumn("l_partkey", col("l_partkey") + k * 10000000L)
    }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    reps(docs) { (df, k) =>
      // PREFIX-tag every word after the first (" " → " zw<k>"): the
      // token COUNT is unchanged — a first attempt that inserted a salt
      // word between every pair doubled the token stream for 9 of 10
      // replicas and made the ideal shingle CPU 19×, which read as a
      // fake 1.3 exponent on the minhash family
      val txt = if (k == 0) col("text")
        else regexp_replace(col("text"), " ", s" zw$k")
      df.withColumn("doc_id", col("doc_id") + k * 1000000000L)
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    reps(emb) { (df, k) =>
      val e = if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          x + ((i % 7) - 3).cast("float") * lit(0.0007f * k))
      df.withColumn("vec_id", col("vec_id") + k * 10000000L)
        .withColumn("embedding", e)
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    done.getParentFile.mkdirs()
    java.nio.file.Files.write(done.toPath,
      (Replicas.toString + "\n").getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out10 = args.lift(1).getOrElse("target/scale10x")
    val outJson = args.lift(2).getOrElse("tools/scale_audit_r09.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    gen10x(spark, base, out10)
    System.err.println(
      f"[scale] corpus ready (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    def time(name: String, dir: String): Double = {
      val fresh = spark.newSession() // cold memos: all caches key on it
      val t = System.nanoTime()
      SparkEntry.queries(name)(fresh, dir).count()
      val dt = (System.nanoTime() - t) / 1e9
      // release the dead session's eagerly persisted memo blocks: the
      // memo maps only sweep entries when the CONTEXT stops, so without
      // this every measurement's cachedPersist frames accumulate in the
      // shared block manager and later (especially 10x) measurements
      // run under eviction/spill pressure the early ones didn't face —
      // skewing exactly the ratio this tool reports
      fresh.sharedState.cacheManager.clearCache()
      dt
    }
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val audited = only.fold(Queries)(s => Queries.filter(s))
    require(audited.nonEmpty,
      s"SPARK_GRAFT_SCALE_QUERIES matched no audit query: " +
        s"${only.get.diff(Queries.toSet).mkString(", ")}")
    val logN = math.log10(Replicas.toDouble)
    val rows = audited.map { q =>
      val a1 = time(q, base); val b1 = time(q, base)
      val a10 = time(q, out10); val b10 = time(q, out10)
      // exponent vs the ACTUAL replica factor (log base Replicas)
      val exp = math.log10(math.min(a10, b10) / math.min(a1, b1)) / logN
      System.err.println(f"[scale] $q%-20s 1x ${math.min(a1, b1)}%7.2f s  " +
        f"${Replicas}x ${math.min(a10, b10)}%7.2f s  exp $exp%5.2f  " +
        f"(cold-jit 1x $a1%.2f ${Replicas}x $a10%.2f)")
      (q, a1, b1, a10, b10, exp)
    }
    val json = rows.map { case (q, a1, b1, a10, b10, e) =>
      f"""  "$q": {"t1": [$a1%.3f, $b1%.3f], "t10": [$a10%.3f, $b10%.3f], "exponent": $e%.3f}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    val worst = rows.maxBy(_._6)
    println(f"\nworst exponent: ${worst._1} ${worst._6}%.3f")
    spark.stop()
  }
}
