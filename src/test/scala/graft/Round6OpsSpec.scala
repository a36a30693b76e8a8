package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Similarity}

/** Session-4 round-6 additions: semantic invariants beyond the oracle
  * hash gate — the identities each operator must satisfy on ANY input,
  * checked on the sf0.001 fixture.
  */
class Round6OpsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("truss peel: round-1 edge count is round-0 survivors exactly") {
    val rows = q("graph_truss").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == Graph.TrussRounds + 1)
    // e1 = edges of e0 with support ≥ k−2, so the peel identity holds
    assert(rows(1).getAs[Long]("n_edges") ==
      rows(0).getAs[Long]("n_edges") - rows(0).getAs[Long]("n_below"))
    // frames only shrink
    val ne = rows.map(_.getAs[Long]("n_edges"))
    assert(ne.zip(ne.tail).forall { case (a, b) => b <= a })
  }

  test("rich club: phi in [0,1], club shrinks as the cutoff rises") {
    val rows = q("graph_richclub").collect()
      .sortBy(_.getAs[Long]("deg_threshold"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phi = r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0, s"phi out of range: $phi")
    }
    val nr = rows.map(_.getAs[Long]("n_rich"))
    val er = rows.map(_.getAs[Long]("e_rich"))
    assert(nr.zip(nr.tail).forall { case (a, b) => b <= a })
    assert(er.zip(er.tail).forall { case (a, b) => b <= a })
  }

  test("burstiness: B strictly inside (−1, 1) and gap counts add up") {
    val ev = Tables.events(spark, dir).filter(col("ts").isNotNull)
    val rows = q("events_burstiness").collect()
    rows.foreach { r =>
      val b = r.getAs[Double]("b_index")
      assert(b > -1.0 && b < 1.0, s"${r.getAs[String]("event_type")}: $b")
    }
    // each type contributes (its row count − 1) gaps
    val total = ev.count() - rows.length
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == total)
  }

  test("markov stationary: a probability distribution after every round") {
    val rows = q("events_markov_stationary").collect()
    val mass = rows.map(_.getAs[Double]("pi")).sum
    // the fixture chain is closed (every to-state also emits), so the
    // power iteration conserves mass up to the scale-12 rescales
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
    assert(rows.forall(_.getAs[Double]("pi") > 0))
  }

  test("CUPED: variance-reduction factor is a squared correlation") {
    val r = q("events_cuped").collect().head
    val vr = r.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0, s"rho^2 out of [0,1]: $vr")
    assert(!r.getAs[Double]("theta").isNaN)
    // the adjustment must not change which arm is measured, only the
    // spread: lift_cuped = lift_raw − θ·(x̄_t − x̄_c) stays finite
    assert(!r.getAs[Double]("lift_cuped").isNaN)
  }

  test("forecast interval: 7 future days, band ordered, floor at zero") {
    val rows = q("events_forecast_interval").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
      assert(r.getAs[Long]("lo") >= 0)
    }
  }

  test("MRR: reciprocal ranks are exactly 1/rank_of_truth or zero") {
    val rows = q("sim_mrr").collect()
    assert(rows.length == 2 * Similarity.NQueries) // two routes
    rows.foreach { r =>
      val rk = r.getAs[Long]("rank_of_truth")
      val rr = r.getAs[Double]("rr")
      assert(rk >= 0 && rk <= Similarity.AnnTopK)
      if (rk == 0) assert(rr == 0.0) else assert(rr == 1.0 / rk)
    }
  }

  test("triplet audit: negatives agree with hardNegatives' top-1") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val audit = q("sim_triplet_audit").collect()
      .map(r => r.getAs[Long]("anchor_id") ->
        (r.getAs[Long]("neg_id"), r.getAs[Double]("pos_cos"),
          r.getAs[Double]("neg_cos"), r.getAs[Boolean]("violation")))
      .toMap
    // violation flag is literally the margin predicate
    audit.values.foreach { case (_, pc, nc, v) =>
      assert(v == (pc - nc < Similarity.TripletMargin))
    }
    val hn = Similarity.hardNegatives(emb).filter(col("rk") === 1)
      .collect()
      .map(r => r.getAs[Long]("anchor_id") -> r.getAs[Long]("neg_id"))
      .toMap
    // every audited anchor's hardest negative IS hardNegatives rk=1
    // (same bucket, same tie-break); anchors missing from the audit
    // lacked an in-bucket positive, not a negative
    audit.foreach { case (a, (negId, _, _, _)) =>
      assert(hn.get(a).contains(negId), s"anchor $a: $negId vs ${hn.get(a)}")
    }
  }

  test("minhash estimator error: est is k-quantized and err consistent") {
    val rows = q("dedup_minhash_error").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val n = r.getAs[Long]("n_agree")
      assert(est == n.toDouble / Dedup.MinhashK)
      assert(r.getAs[Double]("err") == est - r.getAs[Double]("jaccard"))
      // an LSH candidate shares ≥ one full band, so ≥ BandSize components
      assert(n >= Dedup.BandSize)
    }
  }

  test("interval overlap audit: defect classes bounded by version pairs") {
    val rows = q("scd_overlap_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pairs = r.getAs[Long]("n_versions") - 1
      assert(r.getAs[Long]("n_overlaps") + r.getAs[Long]("n_gaps") <= pairs)
      assert(r.getAs[Long]("overlap_days") >= 0)
    }
    // the synthesized fixture genuinely exercises both defect classes
    assert(rows.map(_.getAs[Long]("n_overlaps")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_gaps")).sum > 0)
  }

  test("gap fill: the hourly spine is dense and totals are conserved") {
    val rows = q("events_gapfill").collect()
    val hrs = rows.map(_.getAs[Long]("hr"))
    assert(hrs.zip(hrs.tail).forall { case (a, b) => b == a + 1 })
    val errors = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("event_type") === "error").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == errors)
    assert(rows.exists(_.getAs[Long]("n_events") == 0), "no gaps filled")
  }

  test("drift monitor: each half's shares sum to one") {
    val rows = q("events_drift").collect()
    assert(math.abs(rows.map(_.getAs[Double]("share_early")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getAs[Double]("share_late")).sum - 1.0) < 1e-12)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("share_delta") -
      (r.getAs[Double]("share_late") - r.getAs[Double]("share_early"))) == 0))
  }

  test("value histogram: buckets tile the domain and count every row") {
    val rows = q("profile_histogram").collect()
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice").isNotNull)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li.count())
    rows.foreach { r =>
      val lo = r.getAs[Long]("lo")
      assert(r.getAs[Double]("min_val") >= lo)
      assert(r.getAs[Double]("max_val") <
        lo + graft.operators.Profile.HistWidth)
    }
  }

  test("experimentation suite: SRM, DiD and MDE agree on the user frame") {
    val users = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    val srm = q("events_srm").collect().head
    assert(srm.getAs[Long]("n_c") + srm.getAs[Long]("n_t") == users)
    assert(srm.getAs[Double]("chi2") >= 0.0)
    val did = q("events_did").collect().head
    assert(did.getAs[Long]("n_c") + did.getAs[Long]("n_t") == users)
    val est = (did.getAs[Double]("mean_t_post") - did.getAs[Double]("mean_t_pre")) -
      (did.getAs[Double]("mean_c_post") - did.getAs[Double]("mean_c_pre"))
    assert(did.getAs[Double]("did_estimate") == est)
    val mde = q("events_mde").collect().head
    val p = mde.getAs[Double]("p_base")
    assert(p >= 0.0 && p <= 1.0)
    assert(mde.getAs[Double]("mde_abs") > 0.0)
  }

  test("MAD: outliers bounded and spread nonnegative") {
    q("events_mad").collect().foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("threshold sweep: cumulative curve is monotone nonincreasing") {
    val rows = q("dedup_threshold_sweep").collect()
      .sortBy(_.getAs[Long]("t_pct"))
    val ns = rows.map(_.getAs[Long]("n_pairs_ge"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    rows.foreach { r =>
      val s = r.getAs[Double]("share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("bucketed AUC: a probability over the full labeled corpus") {
    val r = q("text_classifier_auc").collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == docs)
  }

  test("ship priority: a strict top-10 by exact revenue") {
    val rows = q("q54_ship_priority").collect()
    assert(rows.length == 10)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("textrank: a full top-k of positive, strictly ranked keywords") {
    val rows = q("text_textrank").collect()
    assert(rows.length == graft.operators.TextOps.TrTopK)
    val byRk = rows.sortBy(_.getAs[Int]("rk"))
    val scores = byRk.map(_.getAs[Double]("rank"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
