package graft

import org.apache.spark.sql.functions._

/** Round-18 additions. */
class Round18OpsSpec extends GraftSuite {

  private def thetaEsts(dir: String): Map[String, Long] =
    SparkEntry.queries("agg_theta_intersect")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exactSets(dir: String): (Set[Long], Set[Long]) = {
    val rows = T.lineitem(spark, dir)
      .where(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (rows.collect { case ("A", k) => k }.toSet,
     rows.collect { case ("R", k) => k }.toSet)
  }

  test("agg_theta_intersect: exact mode below k — estimates equal the true set algebra") {
    // at sf0.001 each slice's distinct partkeys sit below k = 2^12, so
    // the theta sketch is in exact mode and every estimate must equal
    // the true distinct count bit-for-bit — the strongest pin the
    // approximate family allows anywhere
    val (a, r) = exactSets(sf)
    assume(a.size < 4096 && r.size < 4096, "fixture outgrew exact mode")
    val est = thetaEsts(sf)
    assert(est("A") == a.size.toLong, s"A: ${est("A")} vs ${a.size}")
    assert(est("R") == r.size.toLong, s"R: ${est("R")} vs ${r.size}")
    assert(est("A_INTERSECT_R") == (a & r).size.toLong,
      s"A∩R: ${est("A_INTERSECT_R")} vs ${(a & r).size}")
    assert(est("A_NOT_R") == (a -- r).size.toLong,
      s"A∖R: ${est("A_NOT_R")} vs ${(a -- r).size}")
  }

  test("agg_kll_quantiles: every estimate is a retained data value whose true rank sits in the envelope") {
    val out = SparkEntry.queries("agg_kll_quantiles")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(0.01, 0.25, 0.5, 0.75, 0.99))
    val cents = T.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toDouble
    val values = cents.toSet
    out.foreach { case (q, est, err) =>
      assert(values(est), s"q=$q estimate $est is not a retained data value")
      val rank = cents.count(_ <= est) / n
      // the sketch's own normalized rank error, doubled for slack (the
      // published bound is 99%-confidence per query; 5 queries here)
      assert(math.abs(rank - q) <= 2 * err + 1e-9,
        s"q=$q est=$est true rank $rank outside ±${2 * err}")
    }
  }

  test("event_ab_mwu: exact rank algebra matches a driver-side recompute") {
    val row = SparkEntry.queries("event_ab_mwu")(spark, sf).collect()(0)
    val users = T.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("m"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    val nA = users.count(_._1 == 0L).toLong
    val nB = users.length - nA
    // doubled average ranks over the sorted metric (ties share a rank)
    val sorted = users.sortBy(_._2)
    val rank2 = sorted.map(_._2).zipWithIndex.groupBy(_._1).map { case (m, g) =>
      m -> (2 * g.head._2 + g.length + 1).toLong // 2*below + c + 1
    }
    val r2a = sorted.collect { case (0L, m) => rank2(m) }.sum
    val u2a = r2a - nA * (nA + 1)
    assert(row.getLong(0) == nA && row.getLong(1) == nB)
    assert(row.getLong(2) == u2a, s"u2_a ${row.getLong(2)} vs recomputed $u2a")
    val ties = users.groupBy(_._2).values.map(_.length.toLong)
      .map(c => c * c * c - c).sum
    assert(row.getLong(3) == ties)
    val nn = (nA + nB).toDouble
    val varU = nA * nB / 12.0 * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
    if (varU > 0) {
      val z = (u2a / 2.0 - nA * nB / 2.0) / math.sqrt(varU)
      assert(math.abs(row.getDouble(4) - z) < 1e-6,
        s"z ${row.getDouble(4)} vs recomputed $z")
    } else assert(row.isNullAt(4))
  }

  test("event_theil_sen: slope is the median of all pairwise daily slopes, robust recompute") {
    val out = SparkEntry.queries("event_theil_sen")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val daily = T.events(spark, sf)
      .groupBy(col("event_type"),
               (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val ds = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield (ds(j)._2 - ds(i)._2).toDouble / (ds(j)._1 - ds(i)._1)).sorted
      val n = slopes.length
      if (n > 0) {
        val med = (slopes((n + 1) / 2 - 1) + slopes((n + 2) / 2 - 1)) / 2.0
        val (nPairs, slope) = (out(tpe)._1, out(tpe)._2)
        assert(nPairs == n.toLong, s"$tpe: n_pairs $nPairs vs $n")
        assert(math.abs(slope - med) < 1e-6 + 1e-9, s"$tpe: slope $slope vs median $med")
      }
    }
  }

  test("osm_hausdorff_pairs: directed max-min distances match a driver recompute; pairs exist") {
    val out = SparkEntry.queries("osm_hausdorff_pairs")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(out.nonEmpty, "fixture produced no shared-edge candidate pairs")
    val pts = T.lineitem(spark, sf)
      .join(T.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), (col("p_size").cast("long") * 100).as("x"),
              expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (w, ps) => w -> ps.map(p => (p._2, p._3)).distinct }
    def h(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long =
      a.map(p => b.map(q => (p._1 - q._1) * (p._1 - q._1) + (p._2 - q._2) * (p._2 - q._2)).min).max
    out.foreach { case ((wa, wb), (_, hab, hba, h2)) =>
      val (a, b) = (pts(wa).toSeq, pts(wb).toSeq)
      assert(hab == h(a, b), s"($wa,$wb) h_ab $hab vs ${h(a, b)}")
      assert(hba == h(b, a), s"($wa,$wb) h_ba $hba vs ${h(b, a)}")
      assert(h2 == math.max(hab, hba))
    }
  }

  test("text_perplexity_kn: covers every >=2-token doc; per-context seen mass <= 1") {
    val kn = SparkEntry.queries("text_perplexity_kn")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mle = SparkEntry.queries("text_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kn.keySet == mle.keySet, "KN and MLE rungs must score the same docs")
    assert(kn.values.forall(_ > 0), "nll must be positive on a natural corpus")
    // soundness of the smoothing algebra: for every context w1, the KN
    // mass assigned to its SEEN continuations is <= 1 (discount D frees
    // exactly D*n1f/c1, and the continuation backoff re-spends at most
    // that); recomputed driver-side from the raw token streams
    val bigrams = T.documents(spark, sf)
      .select(split(col("text"), " ").as("w")).collect()
      .map(_.getSeq[String](0)).filter(_.length >= 2)
      .flatMap(w => w.sliding(2).map(p => (p(0), p(1))))
    val cb = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1f = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1b = cb.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val tt = cb.size.toDouble
    val D = 0.75
    cb.groupBy(_._1._1).foreach { case (w1, m) =>
      val mass = m.map { case ((_, w2), c12) =>
        (c12 - D) / c1(w1) + D * n1f(w1) / c1(w1) * (n1b(w2) / tt)
      }.sum
      assert(mass <= 1.0 + 1e-9, s"context '$w1' seen mass $mass > 1")
    }
  }

  test("sample_weighted_reservoir: 20 per language, deterministic, weight-biased") {
    val out = SparkEntry.queries("sample_weighted_reservoir")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perLang = out.groupBy(_._1)
    perLang.foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"$lang ranks not dense")
      assert(rows.length <= 20)
    }
    // determinism: an independent second run draws the identical sample
    val again = SparkEntry.queries("sample_weighted_reservoir")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq, "re-run drew a different sample")
    // weight bias: selection probability scales with n_chars, so the
    // sampled mean weight must exceed the corpus mean (deterministic on
    // the fixed fixture; a tie would mean the weights are being ignored)
    val corpusMean = T.documents(spark, sf)
      .where(col("lang").isNotNull && col("text").isNotNull && col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = out.map(_._4).sum.toDouble / out.length
    assert(sampleMean > corpusMean,
      s"sampled mean weight $sampleMean not above corpus mean $corpusMean")
  }

  test("event_qte: quartiles match a driver-side order-statistic recompute") {
    val out = SparkEntry.queries("event_qte")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val users = T.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "purchase",
                             round(col("value") * 100).cast("long")).otherwise(0L)), lit(0L)).as("cents"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1) / 100))
    def quart(v: Seq[Long], q: Int): Double = {
      val s0 = v.sorted; val n = s0.length.toLong
      val lo = ((q * (n - 1)) / 4 + 1).toInt; val hi = ((q * (n - 1) + 3) / 4 + 1).toInt
      (s0(lo - 1) + s0(hi - 1)) / 2.0
    }
    val a = users.collect { case (0L, m) => m }.toSeq
    val b = users.collect { case (1L, m) => m }.toSeq
    (1 to 3).foreach { q =>
      val (nA, nB, qA, qB, qte) = out(q.toLong)
      assert(nA == a.length.toLong && nB == b.length.toLong)
      assert(qA == quart(a, q), s"q$q A: $qA vs ${quart(a, q)}")
      assert(qB == quart(b, q), s"q$q B: $qB vs ${quart(b, q)}")
      assert(math.abs(qte - (quart(b, q) - quart(a, q))) < 1e-9)
    }
  }

  test("shard_rendezvous: removing a shard remaps ONLY that shard's docs (the HRW property)") {
    val out = SparkEntry.queries("shard_rendezvous")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet.size == 8, "all 8 shards should win somewhere on the fixture")
    // recompute the argmax with shard 7 removed, driver-side from the
    // same fingerprints
    val fps = T.documents(spark, sf).where(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.RollingHash(col("text")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def score(fp: Long, sh: Long) = (fp * ((sh + 1) * 2654435761L % 1000000007L) + sh) % 1000000007L
    fps.foreach { case (id, fp) =>
      val without7 = (0L to 6L).maxBy(sh => (score(fp, sh), -sh))
      if (out(id) != 7L)
        assert(without7 == out(id),
          s"doc $id moved from shard ${out(id)} to $without7 when shard 7 left — HRW violated")
    }
    // ...and the docs that WERE on 7 spread over the survivors
    val moved = fps.filter { case (id, _) => out(id) == 7L }
    assert(moved.nonEmpty)
  }

  test("agg_theta_intersect: estimation mode at sf0.01 stays inside the error envelope", Heavy) {
    // sf0.01 pushes the slices past k into estimation mode; the
    // published theta-framework bound is ~1/sqrt(k) relative error per
    // sketch (k=4096 → 1.6%), degrading for intersections of weakly
    // overlapping sets — 10% slice / 15% set-op slack is ~6 sigma
    val dir = "/root/testdata/sf0.01"
    val (a, r) = exactSets(dir)
    val est = thetaEsts(dir)
    def rel(e: Long, exact: Int): Double =
      math.abs(e - exact).toDouble / math.max(1, exact)
    assert(rel(est("A"), a.size) < 0.10, s"A: ${est("A")} vs ${a.size}")
    assert(rel(est("R"), r.size) < 0.10, s"R: ${est("R")} vs ${r.size}")
    assert(rel(est("A_INTERSECT_R"), (a & r).size) < 0.15,
      s"A∩R: ${est("A_INTERSECT_R")} vs ${(a & r).size}")
    assert(rel(est("A_NOT_R"), (a -- r).size) < 0.15,
      s"A∖R: ${est("A_NOT_R")} vs ${(a -- r).size}")
  }
}
