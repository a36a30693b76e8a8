package graft

import org.apache.spark.sql.functions._

/** Session-5 round-6 additions: semantic invariants beyond the oracle
  * hash gate — identities each operator must satisfy on ANY input,
  * checked on the sf0.001 fixture.
  */
class Round6Session5Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("promo revenue: conditional sum bounded by the total, pct coherent") {
    val r = q("q58_promo_revenue").collect().head
    val promo = r.getAs[Double]("promo_revenue")
    val total = r.getAs[Double]("total_revenue")
    assert(promo >= 0.0 && promo <= total)
    val pct = r.getAs[Double]("promo_pct")
    assert(pct >= 0.0 && pct <= 100.0)
    assert(math.abs(pct - 100.0 * promo / total) < 1e-9)
  }

  test("large orders: every row clears the quantity threshold, capped top-k") {
    val rows = q("q59_large_orders").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("market share: conditional revenue nested inside the total") {
    val rows = q("q60_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = r.getAs[Double]("nation_revenue")
      val tot = r.getAs[Double]("total_revenue")
      val share = r.getAs[Double]("mkt_share")
      assert(nat >= 0.0 && nat <= tot)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("order-count distribution: custdist masses add to the customer count") {
    val rows = q("q62_order_count_dist").collect()
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
  }

  test("dormant customers: a strict subset of the customer table") {
    val rows = q("q64_dormant_customers").collect()
    val n = rows.map(_.getAs[Long]("n_customers")).sum
    assert(n > 0 && n < Tables.customer(spark, dir).count())
  }

  test("waiting suppliers: counts positive, ranking sorted") {
    val rows = q("q65_waiting_suppliers").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("numwait") > 0))
    val nw = rows.map(_.getAs[Long]("numwait"))
    assert(nw.zip(nw.tail).forall { case (a, b) => a >= b })
  }

  test("volume shipping: only the configured nation pair, both directions allowed") {
    val rows = q("q66_volume_shipping").collect()
    assert(rows.nonEmpty)
    val pair = Set("NATION_3", "NATION_8")
    rows.foreach { r =>
      val sn = r.getAs[String]("supp_nation")
      val cn = r.getAs[String]("cust_nation")
      assert(pair.contains(sn) && pair.contains(cn) && sn != cn)
      assert(r.getAs[Double]("revenue") > 0.0)
    }
  }

  test("late priority: high/low counters partition the late join count") {
    val rows = q("q67_late_priority").collect()
    val counted = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val late = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") +
        expr("INTERVAL 60 DAYS"))
      .count()
    assert(counted == late)
  }

  test("top supplier: returned revenue is the global per-supplier maximum") {
    val rows = q("q68_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1) // all returned rows tie at the max
  }

  test("adamic-adar: RA never exceeds AA, both bounded by the raw count") {
    val rows = q("graph_adamic_adar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val aa = r.getAs[Double]("aa_score")
      val ra = r.getAs[Double]("ra_score")
      val nc = r.getAs[Long]("n_common")
      assert(nc >= 1)
      // deg(z) ≥ 2 and ln d ≤ d ⇒ 1/ln d ≥ 1/d per term
      assert(aa >= ra - 1e-12)
      // every term ≤ 1/ln 2
      assert(aa <= nc / math.log(2.0) + 1e-9)
    }
  }

  test("silhouette: scores in [-1,1], well-placed ≤ vectors, full coverage") {
    val rows = q("sim_silhouette").collect()
    val nEmb = Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nEmb)
    rows.foreach { r =>
      val s = r.getAs[Double]("avg_silhouette")
      assert(s >= -1.0 && s <= 1.0)
      assert(r.getAs[Long]("n_well_placed") <= r.getAs[Long]("n_vectors"))
    }
  }

  test("davies-bouldin: nonnegative scatters, positive worst-neighbor ratios") {
    val rows = q("sim_db_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("scatter") >= 0.0)
      assert(r.getAs[Double]("r_max") > 0.0)
    }
  }

  test("JS divergence: bounded by ln 2, one row per unordered source pair") {
    val rows = q("text_js_divergence").collect()
    val k = Tables.documents(spark, dir).select(col("source"))
      .distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { r =>
      val jsd = r.getAs[Double]("jsd")
      assert(jsd >= -1e-12 && jsd <= math.log(2.0) + 1e-9, s"jsd=$jsd")
    }
  }

  test("user entropy: within [0, ln n_types] for every ranked user") {
    val rows = q("events_user_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("n_types")
      assert(h >= -1e-12 && h <= math.log(k.toDouble) + 1e-9)
    }
  }

  test("hill tail: full tail taken, positive exponent") {
    val r = q("events_hill_tail").collect().head
    assert(r.getAs[Long]("n_tail") == 100L)
    assert(r.getAs[Double]("x_kplus1") > 0.0)
    assert(r.getAs[Double]("hill_alpha") > 0.0)
  }

  test("k-fold: folds partition the corpus") {
    val rows = q("corpus_kfold").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    assert(rows.map(_.getAs[Long]("fold")).sorted.toSeq ==
      (0L until graft.operators.TrainingData.KFolds.toLong))
    rows.foreach { r =>
      assert(r.getAs[Long]("max_source_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("rgb histogram: every channel covers the same pixel mass") {
    val rows = q("mm_rgb_hist").collect()
    val perChannel = rows.groupBy(_.getAs[String]("channel"))
      .view.mapValues(_.map(_.getAs[Long]("n_pixels")).sum).toMap
    assert(perChannel.keySet == Set("r", "g", "b"))
    assert(perChannel.values.toSet.size == 1) // equal mass per channel
    // and the mass is the total decoded pixel area
    val area = Tables.documents(spark, dir)
      .select(((col("doc_id") % 60 + 4) * (col("n_chars") % 40 + 2))
        .cast("long").as("a"))
      .agg(sum(col("a"))).collect().head.getLong(0)
    assert(perChannel("r") == area)
  }

  test("boilerplate: each leaderboard span repeats across documents") {
    val rows = q("text_boilerplate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("gram").split(" ").length ==
        graft.operators.TextOps.BoilerN)
    }
  }

  test("time to convert: converted users nested in viewers, quantiles ordered") {
    val r = q("events_time_to_convert").collect().head
    assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_view_users"))
    assert(r.getAs[Double]("p50_sec") <= r.getAs[Double]("p90_sec"))
    assert(r.getAs[Double]("p50_sec") >= 0.0)
  }

  test("multiset ops: EXCEPT ALL keeps per-occurrence counts") {
    // |A EXCEPT ALL B| = Σ_k max(0, a_k − b_k), and distinct EXCEPT is
    // a subset of the values EXCEPT ALL keeps
    val all = q("q72_except_all").collect().map(_.getLong(0))
    val distinct = q("q17_except").collect().map(_.getLong(0))
    assert(distinct.toSet.subsetOf(all.toSet))
    assert(all.length >= distinct.length)
  }

  test("skyline: every surviving part is undominated in the part table") {
    val sky = q("q69_skyline").collect()
      .map(r => (r.getAs[Int]("p_size"), r.getAs[Double]("p_retailprice")))
    assert(sky.nonEmpty)
    // pairwise: no skyline point dominates another
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)),
        s"$a dominates $b inside the skyline")
  }

  test("MMR: selections are distinct, step-1 is the pure-relevance argmax") {
    val rows = q("sim_mmr").collect()
    assert(rows.length == graft.operators.Similarity.MmrK)
    val ids = rows.map(_.getAs[Long]("cand_id"))
    assert(ids.distinct.length == ids.length)
    val byStep = rows.sortBy(_.getAs[Long]("step"))
    // step 1 scores as raw relevance; later steps are diversity-penalized
    assert(byStep.head.getAs[Double]("score") ==
      byStep.head.getAs[Double]("rel"))
    byStep.tail.foreach(r =>
      assert(r.getAs[Double]("score") <= r.getAs[Double]("rel") + 1e-12))
  }

  test("BM25: every hit count is within the query size, ranking sorted") {
    val rows = q("text_bm25").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1 && hits <= graft.operators.TextOps.Bm25Terms.size)
      assert(r.getAs[Double]("bm25") > 0.0)
    }
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("hybrid RRF: fused score equals the rank formula, both routes present") {
    val rows = q("text_hybrid_rrf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rt = Option(r.getAs[java.lang.Long]("rk_text")).map(_.toLong)
      val rv = Option(r.getAs[java.lang.Long]("rk_vec")).map(_.toLong)
      assert(rt.isDefined || rv.isDefined)
      val expected = rt.map(k => 1.0 / (60.0 + k)).getOrElse(0.0) +
        rv.map(k => 1.0 / (60.0 + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expected) < 1e-12)
    }
  }

  test("LM sweep: survival is monotone in the cutoff") {
    val rows = q("text_lm_sweep").collect().sortBy(_.getAs[Double]("cutoff"))
    val kept = rows.map(_.getAs[Long]("n_docs_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getAs[Long]("n_docs")).distinct.length == 1)
  }

  test("vocab coverage: monotone in k and bounded by 1") {
    val r = q("text_vocab_coverage").collect().head
    val c100 = r.getAs[Double]("coverage_100")
    val c1k = r.getAs[Double]("coverage_1000")
    val c10k = r.getAs[Double]("coverage_10000")
    assert(c100 <= c1k && c1k <= c10k && c10k <= 1.0 + 1e-12)
    assert(r.getAs[Long]("tok_top100") <= r.getAs[Long]("n_tokens"))
  }

  test("equi-depth histogram: buckets carry comparable mass") {
    val rows = q("profile_eqdepth").collect()
    assert(rows.length == 4)
    val ns = rows.map(_.getAs[Long]("n_values"))
    // quartile buckets: each within 2x of the smallest (ties at edges
    // can shift mass, exact quarters are not guaranteed)
    assert(ns.max <= ns.min * 2, ns.mkString(","))
    rows.foreach { r =>
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("max_value"))
    }
  }

  test("top values: shares within a column sum to ≤ 1, ranks dense") {
    val rows = q("profile_top_values").collect()
    rows.groupBy(_.getAs[String]("column_name")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-9)
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to g.length.toLong))
    }
  }

  test("conductance: cut bounded by the smaller volume where defined") {
    val rows = q("graph_conductance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phi = Option(r.getAs[java.lang.Double]("conductance"))
      phi.foreach(p => assert(p >= 0.0 && p <= 1.0, s"phi=$p"))
    }
  }

  test("streaks: longest streak never exceeds active days") {
    val rows = q("events_streak").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1)
    }
  }

  test("new vs returning: day-1 actives are all new") {
    val rows = q("events_new_returning").collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.head.getAs[Long]("n_returning") == 0)
    assert(rows.head.getAs[Long]("n_new") > 0)
  }

  test("l-diversity: min_l within [1, |event types|]") {
    val r = q("events_ldiversity").collect().head
    assert(r.getAs[Long]("min_l") >= 1)
    assert(r.getAs[Long]("max_l") <= 5) // fixture has 5 event types
    assert(r.getAs[Long]("min_l") <= r.getAs[Long]("max_l"))
  }

  test("wav histogram: total mass equals the sample count") {
    val rows = q("mm_wav_hist").collect()
    val mass = rows.map(_.getAs[Long]("n_samples")).sum
    val expected = Tables.documents(spark, dir)
      .select((col("n_chars") % 256 + 16).cast("long").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(mass == expected)
  }

  test("dominant suppliers: every flagged pair beats 2x its fair share") {
    val rows = q("q79_dominant_suppliers").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_dominated_parts") >= 1))
  }
}
