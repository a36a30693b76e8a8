package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextOps, TrainingData}

/** Round-3 additions, part 2: exact substring-window dedup, edit-distance
  * candidate refinement, SemDeDup-style semantic dedup, overlap chunking,
  * and weighted priority sampling. Semantic properties beyond the oracle
  * hash gate.
  */
class CorpusExtSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docFrame(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("substringDup: exact clones are fully duplicated, unique docs zero") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = docFrame(Seq(
      (1L, shared), (2L, shared),
      (3L, (100 to 130).map(i => s"only$i").mkString(" "))))
    val out = Dedup.substringDup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_frac") == 1.0)
    assert(out(2L).getAs[Double]("dup_frac") == 1.0)
    assert(out(3L).getAs[Double]("dup_frac") == 0.0)
    // 20 words, k=12 -> 9 windows, all distinct
    assert(out(1L).getAs[Long]("n_windows") == 9L)
  }

  test("substringDup: a shared passage inside distinct docs is detected") {
    val passage = (1 to Dedup.SubstrK).map(i => s"quote$i").mkString(" ")
    val docs = docFrame(Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"one two three four five $passage six seven"),
      (3L, "unrelated words only nothing shared here at all " +
        "padding padding2 padding3 padding4 padding5")))
    val out = Dedup.substringDup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows"))
      .toMap
    // exactly one window (the passage itself) collides between docs 1 and 2
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 0L)
  }

  test("editPairs: subset of LSH candidates, zero distance for clones") {
    val docs = Tables.documents(spark, dir)
    val cand = Dedup.minhashPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Dedup.editPairs(docs).collect()
    assert(refined.nonEmpty)
    refined.foreach { r =>
      assert(cand((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
      assert(r.getAs[Int]("edit_dist") <= Dedup.EditMaxDist)
    }
    // identical texts => candidate pair with edit distance exactly 0
    val clones = docFrame(Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"w$i").mkString(" "))))
    val out = Dedup.editPairs(clones).collect()
    assert(out.length == 1 && out.head.getAs[Int]("edit_dist") == 0)
  }

  test("chunk: every token covered, stride respected, text matches slice") {
    val docs = Tables.documents(spark, dir)
    val stride = TrainingData.ChunkLen - TrainingData.ChunkOverlap
    val chunks = TrainingData.chunk(docs)
    // per doc: chunk_idx is 0..n-1, tok_start = idx*stride, and the last
    // chunk reaches exactly n_tokens
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("tok_start") + col("chunk_tokens")).as("covered"),
        count(lit(1)).as("n"),
        max("chunk_idx").as("maxidx"))
    val tok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    assert(cover.join(tok, "doc_id")
      .filter(col("covered") =!= col("n_tokens")).count() == 0)
    assert(cover.filter(col("n") =!= col("maxidx") + 1).count() == 0)
    assert(chunks.filter(col("tok_start") =!= col("chunk_idx") * stride)
      .count() == 0)
    // chunk_text really is the chunk's tokens
    assert(chunks
      .filter(size(split(col("chunk_text"), " ")) =!= col("chunk_tokens"))
      .count() == 0)
    // overlap: consecutive chunks share ChunkOverlap tokens when full-length
    assert(stride < TrainingData.ChunkLen)
  }

  test("chunk: short doc yields exactly one chunk") {
    val docs = docFrame(Seq((1L, "a b c")))
    val out = TrainingData.chunk(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("chunk_tokens") == 3L)
    assert(out.head.getAs[String]("chunk_text") == "a b c")
  }

  test("weightedSample: top-k by the documented priority, deterministic") {
    val docs = Tables.documents(spark, dir)
    val out = TrainingData.weightedSample(docs).collect()
    assert(out.length == TrainingData.WSampleK)
    val pr = out.map(_.getAs[Double]("priority"))
    assert(pr.zip(pr.tail).forall { case (a, b) => a >= b })
    // brute-force the same priorities locally and compare the selection
    val all = docs.select("doc_id", "n_chars").collect().map { r =>
      val id = r.getLong(0); val w = r.getLong(1)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsample:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5, 16) + 1L
      (id, (w * 4294967296L).toDouble / u.toDouble)
    }
    val expect = all.sortBy { case (id, p) => (-p, id) }
      .take(TrainingData.WSampleK).map(_._1).toSeq
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == expect)
  }

  test("bpeMerges: textbook low/lower corpus learns the expected merges") {
    // vocab {low:2, lower:1}; pairs l-o:3, o-w:3, w-e:1, e-r:1
    // round 1: tie (l,o)/(o,w) → sym_a tiebreak picks (l,o)
    // round 2: (lo,w):3; round 3: tie (e,r)/(low,e) → (e,r); round 4: (low,er)
    val docs = docFrame(Seq((1L, "low low lower")))
    val out = TextOps.bpeMerges(docs).collect().map(r =>
      (r.getAs[Int]("merge_rank"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[Long]("pair_count")))
    assert(out.toSeq == Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
  }

  test("bpeMerges: overlong unbroken tokens are excluded from the vocab") {
    // a 100-char token contributes no pairs (capped); the short word does
    val long = "x" * 100
    val docs = docFrame(Seq((1L, s"$long ab ab")))
    val out = TextOps.bpeMerges(docs, rounds = 1).collect()
    assert(out.length == 1)
    assert((out.head.getAs[String]("sym_a"), out.head.getAs[String]("sym_b"))
      == ("a", "b"))
  }

  test("bpeMerges: overlapping runs merge greedily left-to-right") {
    // "aaaa": pairs (a,a) ×3 → round 1 rewrites to [aa, aa] (parity rule:
    // positions 1 and 3 start, position 2 is consumed); round 2 merges
    // (aa,aa) once
    val docs = docFrame(Seq((1L, "aaaa")))
    val out = TextOps.bpeMerges(docs, rounds = 2).collect().map(r =>
      (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
        r.getAs[Long]("pair_count")))
    assert(out.toSeq == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("histogram: buckets cover all rows with monotone bounds") {
    val li = Tables.lineitem(spark, dir)
    val h = graft.operators.Profile.histogram(li, "l_extendedprice").collect()
    assert(h.map(_.getAs[Long]("n_items")).sum == li.count())
    val buckets = h.map(_.getAs[Long]("bucket"))
    assert(buckets.forall(b => b >= 0 && b < graft.operators.Profile.HistBuckets))
    val lo = h.map(_.getAs[Double]("bucket_lo"))
    assert(lo.zip(lo.tail).forall { case (a, b) => a < b })
  }

  test("histogram: NULLs are excluded, not binned into the top bucket") {
    val df = Seq(Some(0.0), Some(10.0), None, None).toDF("v")
    val h = graft.operators.Profile.histogram(df, "v").collect()
    assert(h.map(_.getAs[Long]("n_items")).sum == 2L)
    assert(!h.exists(r => r.getAs[Long]("bucket") ==
      graft.operators.Profile.HistBuckets - 1L &&
      r.getAs[Long]("n_items") > 1L))
  }

  test("histogram: constant column collapses to bucket 0, no NaN") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val h = graft.operators.Profile.histogram(df, "v").collect()
    assert(h.length == 1)
    assert(h.head.getAs[Long]("bucket") == 0L)
    assert(h.head.getAs[Long]("n_items") == 3L)
  }

  test("semanticDedup: partition into clusters with one representative") {
    val emb = Tables.embeddings(spark, dir)
    val out = Similarity.semanticDedup(emb)
    assert(out.count() == emb.count())
    // component is the min member (kept row) and appears exactly once kept
    val badKeep = out.groupBy("component")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("nk"),
        min("vec_id").as("mn"), first("component").as("c"))
      .filter(col("nk") =!= 1 || col("mn") =!= col("c"))
    assert(badKeep.count() == 0)
    // n_dups is the true component size
    val sz = out.groupBy("component").count()
    assert(out.join(sz, "component")
      .filter(col("n_dups") =!= col("count")).count() == 0)
  }

  test("budget select: quality-prefix property and exact running sum") {
    val docs = Tables.documents(spark, dir)
    val out = TrainingData.budgetSelect(docs).collect()
    // rows arrive in (score desc, doc_id) order; cum_tokens must be the
    // exact running sum and `selected` a prefix of that order
    var running = 0L
    var stillSelected = true
    out.foreach { r =>
      running += r.getAs[Long]("n_tok")
      assert(r.getAs[Long]("cum_tokens") == running)
      val sel = r.getAs[Boolean]("selected")
      assert(sel == (running <= TrainingData.TokenBudget))
      if (!sel) stillSelected = false
      else assert(stillSelected, "selected row after an unselected one")
    }
    val nSel = out.count(_.getAs[Boolean]("selected"))
    assert(nSel > 0 && nSel < out.length, s"budget not discriminating: $nSel")
  }

  test("soft weights: cluster members split one unit of mass; singletons keep 1.0") {
    val body = (1 to 30).map(i => s"dup$i").mkString(" ")
    val docs = docFrame(Seq(
      (1L, body), (2L, body), (3L, body), // one cluster of 3
      (4L, (1 to 30).map(i => s"solo$i").mkString(" "))))
    val out = Dedup.softWeights(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dups"), r.getAs[Double]("weight"))).toMap
    assert(out(1L) == (3L, 1.0 / 3.0))
    assert(out(2L) == (3L, 1.0 / 3.0))
    assert(out(3L) == (3L, 1.0 / 3.0))
    assert(out(4L) == (1L, 1.0))
    // total mass = number of effective documents (clusters); summed with a
    // tolerance — 3×(1/3) only hits 1.0 exactly in some addition orders
    assert(math.abs(out.values.map(_._2).sum - 2.0) < 1e-12)
  }

  test("containment: a short doc embedded in a long one scores 1.0") {
    val passage = (1 to 10).map(i => s"quote$i").mkString(" ")
    val docs = docFrame(Seq(
      (1L, passage), // every shingle of 1 appears in 2
      (2L, s"intro words here $passage closing words after"),
      (3L, (1 to 20).map(i => s"other$i").mkString(" "))))
    val out = Dedup.containmentPairs(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_small") == 1L)
    assert(out.head.getAs[Long]("doc_large") == 2L)
    assert(out.head.getAs[Double]("containment") == 1.0)
  }

  test("containment: catches the cross-length pair Jaccard blocking misses") {
    val passage = (1 to 12).map(i => s"core$i").mkString(" ")
    val long = s"${(1 to 40).map(i => s"pad$i").mkString(" ")} $passage"
    val docs = docFrame(Seq((1L, passage), (2L, long)))
    // lengths differ ~4x: different (lang, n_chars div 25) blocks, so the
    // Jaccard path structurally cannot pair them...
    assert(Dedup.ngramJaccard(docs).count() == 0)
    // ...but the containment join does, at full score
    val c = Dedup.containmentPairs(docs).collect()
    assert(c.length == 1 && c.head.getAs[Double]("containment") == 1.0)
  }

  test("containment: sub-threshold overlap produces no pair") {
    // 3 of 10 shingles shared (< 0.6 threshold)
    val docs = docFrame(Seq(
      (1L, ((1 to 5).map(i => s"sh$i") ++ (1 to 7).map(i => s"x$i"))
        .mkString(" ")),
      (2L, ((1 to 5).map(i => s"sh$i") ++ (1 to 30).map(i => s"y$i"))
        .mkString(" "))))
    assert(Dedup.containmentPairs(docs).isEmpty)
  }

  test("spanClean: repeated span removed everywhere but first occurrence") {
    val span = (1 to Dedup.SpanLen).map(i => s"rep$i").mkString(" ")
    val tail1 = (1 to Dedup.SpanLen).map(i => s"a$i").mkString(" ")
    val tail2 = (1 to Dedup.SpanLen).map(i => s"b$i").mkString(" ")
    val docs = docFrame(Seq(
      (1L, s"$span $tail1"),   // first occurrence: keeps the span
      (2L, s"$span $tail2"),   // later occurrence: loses it
      (3L, span)))             // exact dup of the span only: fully dropped
    val out = Dedup.spanClean(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_dropped") == 0L)
    assert(out(1L).getAs[String]("clean_text") == s"$span $tail1")
    assert(out(2L).getAs[Long]("n_dropped") == 1L)
    assert(out(2L).getAs[String]("clean_text") == tail2)
    assert(out(3L).getAs[Long]("n_dropped") == 1L)
    assert(out(3L).getAs[String]("clean_text") == "")
  }

  test("spanClean: unique corpus passes through unchanged") {
    val docs = docFrame(Seq(
      (1L, (1 to 25).map(i => s"u$i").mkString(" ")),
      (2L, (1 to 7).map(i => s"v$i").mkString(" "))))
    val out = Dedup.spanClean(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      (1 to 25).map(i => s"u$i").mkString(" "))
    assert(out(1L).getAs[Long]("n_spans") == 3L)
    assert(out(2L).getAs[String]("clean_text") ==
      (1 to 7).map(i => s"v$i").mkString(" "))
    assert(out.values.forall(_.getAs[Long]("n_dropped") == 0L))
  }

  test("property: spanClean keeps exactly one occurrence per distinct span") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet + span-aligned doc lengths make cross-doc span
    // collisions common; span texts are the 10-word slices themselves
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(1, 4).flatMap(ns =>
      Gen.listOfN(ns * Dedup.SpanLen, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, docGen))
    for (seed <- 1L to 8L) {
      val texts = corpusGen(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val docs = docFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      val out = Dedup.spanClean(docs).collect()
      val keptTotal = out.map(r =>
        r.getAs[Long]("n_spans") - r.getAs[Long]("n_dropped")).sum
      val distinctSpans = texts.flatMap(t =>
        t.split(" ").grouped(Dedup.SpanLen).map(_.mkString(" "))).distinct.size
      assert(keptTotal == distinctSpans.toLong, s"seed=$seed")
      // every doc's clean text is its surviving spans in original order —
      // re-derive the expectation with a global first-occurrence sweep
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").grouped(Dedup.SpanLen).map(_.mkString(" "))
          .filter(sp => seen.add(sp)).mkString(" ")
      }.toMap
      out.foreach { r =>
        assert(r.getAs[String]("clean_text") ==
          expected(r.getAs[Long]("doc_id")), s"seed=$seed")
      }
    }
  }

  test("dedupBatch admission: state dups rejected, first-in-batch wins") {
    import graft.streaming.Streams
    val cloneA = (1 to 20).map(i => s"sa$i").mkString(" ")
    val cloneB = (1 to 20).map(i => s"sb$i").mkString(" ")
    val fresh = (1 to 20).map(i => s"fr$i").mkString(" ")
    val state = docFrame(Seq((1L, cloneA), (2L, (1 to 20).map(i => s"st$i").mkString(" "))))
    val batch = docFrame(Seq(
      (10L, cloneA),   // duplicates state doc 1 → rejected
      (11L, cloneB),   // first occurrence of B in batch → admitted
      (12L, cloneB),   // duplicates lower-id batch doc 11 → rejected
      (13L, fresh)))   // unique → admitted
    val (admitted, bands) =
      Streams.dedupBatch(batch, Dedup.minhashBands(state))
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(11L, 13L))
    // carried-forward state covers exactly the admitted docs
    assert(bands.select("doc_id").distinct().collect().map(_.getLong(0))
      .sorted.toSeq == Seq(11L, 13L))
  }

  test("shard: every shard is a gapless 0..n-1 position range") {
    val docs = Tables.documents(spark, dir)
    val out = TrainingData.shard(docs).collect()
    assert(out.length == docs.count())
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.subsetOf((0 until TrainingData.NShards).toSet))
    byShard.foreach { case (_, rows) =>
      val pos = rows.map(_.getAs[Long]("pos")).sorted
      assert(pos.head == 0L && pos.last == pos.length - 1L &&
        pos.distinct.length == pos.length)
    }
    // deterministic across re-runs (pure hash, no rand())
    val again = TrainingData.shard(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }
}
