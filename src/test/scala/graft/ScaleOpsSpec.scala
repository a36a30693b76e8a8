package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ScdMerge, Skew}
import graft.streaming.Streams

/** Scale-machinery tests: salted join equivalence, partitioned sinks,
  * streaming SCD load via foreachBatch.
  */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted join produces exactly the plain join's rows") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey",
      col("l_linenumber"), saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted join: accepts the bare semi alias, rejects right-preserving") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"))
    val semi = Skew.saltedJoin(li, o, "l_orderkey",
      col("l_linenumber"), saltBuckets = 4, joinType = "semi")
    assert(semi.count() == li.join(o, Seq("l_orderkey"), "semi").count())
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 4, "right")
    }
    assert(ex.getMessage.contains("duplicate unmatched"))
  }

  test("batch-partitioned sink: dynamic overwrite touches only new batches") {
    val base = Files.createTempDirectory("graft_sink").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val b1 = Seq((1L, "b1"), (2L, "b1")).toDF("k", "batch_id")
    val b2 = Seq((3L, "b2")).toDF("k", "batch_id")
    Sinks.writeBatchPartitioned(b1, base)
    Sinks.writeBatchPartitioned(b2, base)
    val all = spark.read.parquet(base)
    assert(all.count() == 3)  // b1 partitions survived the second write
    // re-run of b2 replaces, not duplicates
    Sinks.writeBatchPartitioned(
      Seq((4L, "b2")).toDF("k", "batch_id"), base)
    val after = spark.read.parquet(base).orderBy("k").collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, dir).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, dir)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), Seq("o_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      // co-located: join consumes bucket layout directly, no Exchange
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$physical")
      assert(joined.count() == Tables.lineitem(spark, dir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("jaccard oversized blocks are sub-split by minhash band, not expanded") {
    def block(rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("t"))
        // pin every doc into ONE (lang, length-bucket) block regardless of
        // actual text length — isolates the cap behavior
        .withColumn("n_chars", lit(50L))
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten eleven"

    // (a) fail-safe: a block of 120 IDENTICAL docs sub-splits into one
    // band sub-block of 120 > JaccardMaxBlock — dropped, zero pairs (the
    // quadratic expansion never happens)
    val uniform = block((1L to 120L).map(i => (i, textA)): _*)
    assert(Dedup.ngramJaccard(uniform).count() == 0)

    // (b) signal preserved: 60 A + 60 B in the same oversized block split
    // into two band sub-blocks of 60 ≤ cap; all within-group pairs survive
    val mixed = block((1L to 120L).map(i =>
      (i, if (i % 2 == 0) textA else textB)): _*)
    val pairs = Dedup.ngramJaccard(mixed).collect()
    assert(pairs.length == 2 * (60 * 59 / 2), s"got ${pairs.length}")
    assert(pairs.forall(r => r.getDouble(2) == 1.0)) // no cross-text pair

    // (c) small blocks keep the plain (lang, bucket) key — all pairs
    val small = block((1L to 20L).map(i => (i, textA)): _*)
    assert(Dedup.ngramJaccard(small).count() == 20 * 19 / 2)
  }

  test("connected components fall back to star rounds past the maxIter bound") {
    // 64-node path: diameter 63 needs ~log2(63)+1 ≈ 7 pointer-jump rounds;
    // maxIter=2 can't cover it, so the large-star/small-star fallback must
    // produce the SAME labels instead of raising
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val viaFallback = Dedup.connectedComponents(path, maxIter = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaFallback.length == 64)
    assert(viaFallback.forall(_._2 == 0L)) // one component, min-node label
    val direct = Dedup.connectedComponents(path, maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaFallback.sorted.sameElements(direct.sorted))
  }

  test("adversarial diameter ≫ 2^10: components converge at default maxIter") {
    // a 2500-node path (diameter 2499) exceeds what 10 pointer-jumping
    // rounds can cover (~2^10 hops); the star fallback's round bound
    // depends on component size, not diameter, so the DEFAULT maxIter
    // must still converge to the exact labels
    val path = (0L until 2499L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(path).collect()
    assert(comp.length == 2500)
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("property: star components equal a union-find reference on random graphs") {
    // 10 seeded random graphs, both algorithms vs a sequential union-find
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = 30 + rnd.nextInt(40)
      val ids = new scala.util.Random(trial * 131L)
        .shuffle((0 until n).map(_ * 17L + 3))
      val edges = (1 until n).flatMap { i =>
        if (rnd.nextInt(3) == 0) None // drop some edges → multiple components
        else {
          val j = rnd.nextInt(i)
          Some((math.min(ids(i), ids(j)), math.max(ids(i), ids(j))))
        }
      }
      if (edges.nonEmpty) {
        // driver-side union-find ground truth (min id as representative)
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parent(hi) = lo }
        }
        val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(x => x -> find(x)).sorted
        val star = Dedup.starComponents(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        assert(star.sameElements(expect), s"trial=$trial n=$n")
      }
    }
  }

  test("cluster artifacts memo returns the same computed frames per (session, key)") {
    val docs = Tables.documents(spark, dir)
    val a = Dedup.clusterArtifactsCached(docs, s"$dir#memoTest")
    val b = Dedup.clusterArtifactsCached(docs, s"$dir#memoTest")
    assert(a.pairs eq b.pairs)
    assert(a.components eq b.components)
    assert(a.bands eq b.bands)
  }

  test("star components agree with pointer jumping on multi-cluster graphs") {
    // three components with shuffled, non-contiguous ids + a cycle — the
    // two algorithms must emit identical (doc_id, min-id label) frames
    val edges = Seq(
      (907L, 3L), (3L, 512L), (512L, 44L), (44L, 907L), // cycle, min 3
      (200L, 150L), (150L, 180L),                       // path, min 150
      (999L, 998L))                                     // pair, min 998
      .toDF("doc_a", "doc_b")
    val star = Dedup.starComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val prop = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(star.sameElements(prop))
    assert(star.toMap == Map(907L -> 3L, 3L -> 3L, 512L -> 3L, 44L -> 3L,
      200L -> 150L, 150L -> 150L, 180L -> 150L, 999L -> 998L, 998L -> 998L))
  }

  test("iterative pin goes through reliable checkpoint when a dir is set") {
    // With a checkpoint dir configured, every Iterate.pin cut must write
    // durable checkpoint files there (executor-loss-safe at cluster
    // scale) instead of executor-local blocks — and the iterative result
    // must be unchanged.
    val ckDir = Files.createTempDirectory("graft_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val path = (0L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val comp = Dedup.connectedComponents(path, maxIter = 10)
      assert(comp.collect().map(_.getLong(1)).toSet == Set(0L))
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => p.toFile.isFile).count()
      assert(files > 0, s"no reliable checkpoint files landed under $ckDir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("incremental dedup: cross-batch near-dups rejected, novel docs admitted") {
    def docsOf(rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    val sharedText = "the quick brown fox jumps over the lazy dog again today"
    // batch 1: two docs, one internal duplicate pair
    val b1 = docsOf(
      (1, sharedText),
      (2, sharedText),
      (3, "an entirely different first batch document with other words"))
    val empty = graft.operators.Dedup.minhashBands(b1).limit(0)
    val (adm1, bands1) = Streams.dedupBatch(b1, empty)
    assert(adm1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L)) // doc 2 is an in-batch near-dup of doc 1
    // batch 2: one near-dup of the admitted corpus, one novel doc
    val b2 = docsOf(
      (10, sharedText),
      (11, "novel second batch content that matches nothing seen before ever"))
    val (adm2, _) = Streams.dedupBatch(b2, bands1)
    assert(adm2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(11L)) // doc 10 collides with doc 1's bands in state
  }

  test("streaming SCD load: foreachBatch merges micro-batches into state") {
    val stateDir = Files.createTempDirectory("graft_state").toString
    val cfg = ScdMerge.Config(keys = Seq("k"), valueCol = "v", scd2 = false)
    val clockTs = lit("2026-02-02 00:00:00").cast("timestamp")
    val clockDate = lit("2026-02-02").cast("date")

    // durable seed state
    Sinks.writeState(
      Seq(("a", 1.0, "b0"), ("b", 2.0, "b0")).toDF("k", "v", "batch_id"),
      stateDir)

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    mem.addData(Seq(("b", 5.0), ("c", 3.0)))

    val writer = Streams.scdLoadStream(
      mem.toDF().toDF("k", "v"), cfg, clockTs, clockDate,
      mergeAndSwap = (batch, id) => {
        val target = spark.read.parquet(stateDir)
        val merged = ScdMerge.merge(
          batch.withColumn("batch_id", lit(s"stream-$id")),
          target, cfg, clockTs, clockDate, lit(s"stream-$id"))
        val next = merged.drop(ScdMerge.ChangeCol).collect()
        Sinks.writeState(spark.createDataFrame(
          spark.sparkContext.parallelize(next.toSeq), target.schema), stateDir)
      })
    val q = writer.start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()

    val state = spark.read.parquet(stateDir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(state.toSeq == Seq(
      ("a", 1.0, "b0"),            // carried
      ("b", 5.0, "stream-0"),      // updated by the micro-batch
      ("c", 3.0, "stream-0")))     // inserted
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB the fact-side scan of a selective fact⋈dim shuffle join
    // should be pre-filtered by a runtime bloom filter built from the dim
    // side — rows that cannot match never enter the exchange. Spark's
    // InjectRuntimeFilter does this when the creation side is small and
    // the application side is scan-heavy; the size thresholds are tuned
    // for real lakes, so the fixture test pins the MECHANISM by lowering
    // the application-side threshold (a no-op flip on a real cluster).
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "10GB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, dir)
      val sel = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 400000.0)
      val j = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
        .groupBy().count()
      val op = j.queryExecution.optimizedPlan.toString.toLowerCase
      assert(op.contains("might_contain"),
        "expected a runtime bloom filter on the fact side:\n" + op.take(2000))
      // and it must not change the answer
      val expected = li.join(sel.hint("broadcast"),
        li("l_orderkey") === sel("o_orderkey")).count()
      assert(j.collect().head.getLong(0) == expected)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // The OTHER half of the skew story (Skew.saltedJoin is the manual
    // fix): AQE's OptimizeSkewedJoin must split a hot key's partition at
    // runtime. Production thresholds are lake-sized, so the test lowers
    // them to pin the MECHANISM; the answer must be unchanged.
    import org.apache.spark.sql.functions._
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    try {
      // 95 % of the left side lands on key 7
      val left = spark.range(0, 200000).select(
        when(col("id") % 20 =!= 0, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS df (not a derived count plan) so ITS AdaptiveSparkPlan
      // finalizes and the skew split shows in the executed plan
      assert(joined.collect().length == 190000 + 50) // k=7 matches + id keys
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        "AQE did not split the skewed partition:\n" + plan)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
