package graft

import org.apache.spark.sql.functions._

/** Round-17 second-batch invariants: the six keys added after the r17
  * close record (KM survival, power analysis, windowed road CC, CCNet
  * quality buckets, DSIR importance weights, ZCA whitening). Each test
  * pins the property the DuckDB hash can't see (or, for the smoke key,
  * IS the correctness gate).
  */
class Round17bOpsSpec extends GraftSuite {

  test("event_survival_km: risk sets, death counts, and monotone hazard recompute exactly") {
    val out = SparkEntry.queries("event_survival_km")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "fixture must produce at least one death time")
    // independent driver recompute of (dur, obs) per user from raw rows
    val ev = T.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").cast("string"), col("event_type"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val lifetimes = byUser.iterator.map { case (_, rows) =>
      val d0 = rows.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val errs = rows.filter(_._3 == "error").map(_._2)
      val te = if (errs.isEmpty) None
               else Some(java.time.temporal.ChronoUnit.DAYS.between(
                 d0, errs.min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))))
      te.filter(_ <= 5).map(t => (t, 1L)).getOrElse((5L, 0L))
    }.toSeq
    val nu = lifetimes.size.toLong
    val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    var seen = 0L
    var cum = 0L
    val expect = byT.flatMap { case (t, ls) =>
      val n = nu - seen
      val dd = ls.map(_._2).sum
      seen += ls.size
      if (dd > 0 && dd < n) {
        cum += -math.round(math.log((n - dd).toDouble / n) * 1000.0)
        Some((t, dd, n, cum))
      } else None
    }
    assert(out.toSeq == expect,
      s"KM table mismatch:\n got ${out.toSeq}\n exp $expect")
    // hazard is nondecreasing by construction — pin it anyway (regression guard)
    assert(out.sliding(2).forall(w => w.length < 2 || w(0)._4 <= w(1)._4))
  }

  test("event_power_mde: moments and the per-arm n recompute from raw values") {
    val out = SparkEntry.queries("event_power_mde")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val raw = T.events(spark, sf).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val n = rows.length.toLong
      val sv = rows.map(_._2).sum
      val svv = rows.map(c => c._2 * c._2).sum
      val mean = sv.toDouble / (100.0 * n)
      val vr = (n.toDouble * svv - sv.toDouble * sv) / (10000.0 * n * (n - 1.0))
      val zz = math.pow(1.959963984540054 + 0.8416212335729143, 2)
      val nReq = math.ceil(2.0 * zz * vr / math.pow(0.05 * mean, 2)).toLong
      val (gn, gm, gv, gr) = out(et)
      assert(gn == n && math.abs(gm - mean) < 1e-4 + 1e-9 &&
             math.abs(gv - vr) < 1e-6 + 1e-9 && gr == nReq,
        s"$et: got ($gn,$gm,$gv,$gr) expected ($n,$mean,$vr,$nReq)")
      // sanity: detecting a 5% lift needs more users than the z-test ran with
      assert(gr > 0L)
    }
  }

  test("osm_road_components: labels equal a driver union-find over the clipped edge set") {
    val out = SparkEntry.queries("osm_road_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recompute: consecutive-node edges, both endpoints in window
    val win = T.part(spark, sf).where(col("p_size") <= 5)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val memb = T.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    win.foreach(n => parent.getOrElseUpdate(n, n))
    memb.groupBy(_._1).foreach { case (_, rows) =>
      val refs = rows.sortBy(r => (r._2, r._3)).map(_._3)
      refs.sliding(2).foreach {
        case Array(a, b) if a != b && win(a) && win(b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
        case _ =>
      }
    }
    val expect = win.map(n => n -> find(n)).toMap
    // canonical min-label: path-compress once more after all unions
    val expectMin = expect.keys.map { n =>
      // the union-find root is not necessarily the min id — recompute min per class
      n -> find(n)
    }.toMap
    val classes = expectMin.groupBy(_._2).map { case (_, m) => m.keys.toSet }
    val minLabel = classes.flatMap(c => { val m = c.min; c.map(_ -> m) }).toMap
    assert(out == minLabel,
      s"component labels diverge from union-find (got ${out.size} rows, expected ${minLabel.size})")
    assert(classes.size >= 1 && out.size == win.size)
  }

  test("text_quality_buckets: partial-offset tercile equals the plain per-lang NTILE window") {
    // equivalence check: the distributed offset device must reproduce the
    // naive |langs|-partition window formulation row-for-row at test scale
    val out = SparkEntry.queries("text_quality_buckets")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // rebuild the per-doc score table via the oracled text_perplexity key
    val nll = SparkEntry.queries("text_perplexity")(spark, sf)
      .select(col("doc_id"), col("nll_millinats").as("nll"))
    val docs = T.documents(spark, sf).select(col("doc_id"), col("lang"), col("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("nll"), col("doc_id"))
    val expect = docs.join(nll, Seq("doc_id"))
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
           min(col("nll")).as("nll_lo"), max(col("nll")).as("nll_hi"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == expect, s"bucket table diverges from the NTILE window reference")
    // buckets are nll-ordered and balanced within ±1 per lang
    out.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val b = (1L to 3L).flatMap(i => out.get((lang, i)))
      if (b.length == 3) {
        assert(b(0)._3 <= b(1)._3 && b(1)._3 <= b(2)._3, s"$lang: bucket nll_lo not ordered")
        assert(b.map(_._1).max - b.map(_._1).min <= 1, s"$lang: bucket sizes differ by >1")
      }
    }
  }

  test("text_quality_buckets: no corpus window partitioned solely by lang (plan pin)") {
    // the agg_weighted_median lesson: a |langs|-partition window over a
    // corpus-sized table is single-task-sort growth in disguise. The
    // only WindowExec allowed here is the LOCAL one keyed by
    // (__pid, lang) — the partial-offset device's bounded window.
    val df = SparkEntry.queries("text_quality_buckets")(spark, sf)
    val lines = df.queryExecution.executedPlan.toString.split("\n")
      .filter(_.contains("Window ")).toSeq
    assert(lines.nonEmpty, "expected the partial-offset device's local window")
    lines.foreach { l =>
      assert(l.contains("__pid"),
        s"WindowExec without __pid in its partition spec — the banned " +
          s"|langs|-partition corpus window shape:\n$l")
    }
  }

  test("join_bloom_pruned: bloom stage is pure plan optimization and probes before the join") {
    val df = SparkEntry.queries("join_bloom_pruned")(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // bit-equal to the unfiltered join: false positives must all be
    // removed by the exact join
    val dim = T.customer(spark, sf).where(col("c_acctbal") > 9000).select(col("c_custkey"))
    val plain = T.orders(spark, sf)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == plain, "bloom-pruned join diverges from the plain join")
    // the probe expression must sit in the plan (on the fact side, below the join)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"),
      s"expected the codegen'd bloom probe in the plan:\n$plan")
    assert(got.nonEmpty)
  }

  test("text_dsir_weight: target-domain docs score above the raw-corpus average") {
    val out = SparkEntry.queries("text_dsir_weight")(spark, sf)
    val joined = out.join(T.documents(spark, sf).select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), (col("dsir_millinats").cast("double") / col("n_bigrams")).as("per_bigram"))
      .groupBy(col("lang")).agg(avg(col("per_bigram")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = joined.filter(_._1 != "en").values
    assert(joined.contains("en") && others.nonEmpty)
    // the importance weight must rank the target's own docs above every
    // other language's average — the signal DSIR resampling relies on
    assert(others.forall(_ < joined("en")),
      s"en per-bigram weight ${joined("en")} must exceed all others: $joined")
  }

  test("event_did: cell means and the DiD estimate recompute from raw rows") {
    val r = SparkEntry.queries("event_did")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val raw = T.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts")), round(col("value") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val lo = raw.map(_._2).min; val hi = raw.map(_._2).max
    def cellOf(u: Long, ms: Long) = (u % 2, ms * 2 >= lo + hi)
    val cells = raw.groupBy(x => cellOf(x._1, x._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    def mean(g: Long, post: Boolean) = {
      val (n, sv) = cells((g, post)); sv.toDouble / (100.0 * n)
    }
    val did = (mean(1, post = true) - mean(1, post = false)) -
              (mean(0, post = true) - mean(0, post = false))
    assert(row.getLong(0) == cells((0L, false))._1 && row.getLong(1) == cells((0L, true))._1)
    assert(row.getLong(2) == cells((1L, false))._1 && row.getLong(3) == cells((1L, true))._1)
    assert(math.abs(row.getDouble(8) - did) < 1e-6 + 1e-9,
      s"did ${row.getDouble(8)} vs recomputed $did")
  }

  test("emb_pca_project: component variances match the top eigenvalues, decorrelated") {
    // output is one CSV string cell per vector (driver contract) —
    // parse back into per-vector arrays for the covariance checks
    val proj = SparkEntry.queries("emb_pca_project")(spark, sf)
      .collect().map(_.getString(1).split(",").map(_.toDouble))
    val n = proj.length
    val k = proj.head.length
    assert(k == 8 && n > 100)
    val mu = new Array[Double](k)
    proj.foreach(v => (0 until k).foreach(i => mu(i) += v(i) / n))
    val cov = Array.ofDim[Double](k, k)
    proj.foreach(v => for (i <- 0 until k; j <- 0 until k)
      cov(i)(j) += (v(i) - mu(i)) * (v(j) - mu(j)) / n)
    // variances are in nonincreasing eigenvalue order and dominate the
    // per-dim average (top-8 of 64 must each carry more than 1/64 of
    // total original variance on a non-degenerate corpus)
    for (i <- 0 until k - 1)
      assert(cov(i)(i) >= cov(i + 1)(i + 1) - 1e-6,
        s"component $i variance ${cov(i)(i)} < component ${i + 1} ${cov(i + 1)(i + 1)}")
    // principal components are uncorrelated
    val maxOff = (for (i <- 0 until k; j <- 0 until k if i != j) yield math.abs(cov(i)(j))).max
    val minDiag = (0 until k).map(i => cov(i)(i)).min
    assert(maxOff < 0.05 * math.max(minDiag, 1e-9) + 1e-4,
      s"PC covariance off-diagonal up to $maxOff (min diag $minDiag)")
  }

  test("text_chunk_overlap: windows tile every doc with exact 16-token overlaps") {
    val out = SparkEntry.queries("text_chunk_overlap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    val docs = T.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val sorted = chunks.sortBy(_._2)
      // first window starts at 0; every next starts exactly stride=48 later
      sorted.zipWithIndex.foreach { case ((_, cid, lo, hi, n, text), ix) =>
        assert(cid == ix && lo == ix * 48L)
        assert(hi == math.min(lo + 64, toks.length) && n == hi - lo)
        assert(text == toks.slice(lo.toInt, hi.toInt).mkString(" "),
          s"doc $id chunk $cid text mismatch")
      }
      // full coverage: the last window reaches the end of the doc
      assert(sorted.last._4 == toks.length.toLong)
      // no absorbed-tail violation: every non-first window is longer than the overlap
      sorted.drop(1).foreach { case (_, cid, _, _, n, _) =>
        assert(n > 16, s"doc $id chunk $cid has $n ≤ overlap tokens")
      }
    }
  }

  test("sim_rrf_fusion: fused ranking recomputes from driver-side cosine and dot ranks") {
    val out = SparkEntry.queries("sim_rrf_fusion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val vecs = T.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val nq = math.sqrt(dot(q, q))
    val scored = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val d = dot(v, q)
      (id, BigDecimal(d / (math.sqrt(dot(v, v)) * nq)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
           BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    def ranks(key: ((Long, BigDecimal, BigDecimal)) => BigDecimal) =
      scored.sortBy(t => (-key(t), t._1)).take(20).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rc = ranks(_._2); val rm = ranks(_._3)
    val fused = (rc.keySet ++ rm.keySet).toSeq.map { id =>
      val s = rc.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
              rm.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, rc.getOrElse(id, 0L), rm.getOrElse(id, 0L),
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (-t._4, t._1)).take(10)
    assert(out.toSeq == fused, s"RRF fusion mismatch:\n got ${out.toSeq}\n exp $fused")
  }

  test("event_trend_mk: S, tie-corrected variance, and z recompute from daily counts") {
    val out = SparkEntry.queries("event_trend_mk")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val daily = T.events(spark, sf)
      .select(col("event_type"), (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      val n = series.length.toLong
      var s = 0L
      for (i <- series.indices; j <- i + 1 until series.length)
        s += java.lang.Long.signum(series(j) - series(i))
      val tie = series.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      val z = (s.toDouble - math.signum(s.toDouble)) / math.sqrt(var18.toDouble / 18.0)
      val (gn, gs, gv, gz) = out(et)
      assert(gn == n && gs == s && gv == var18 && math.abs(gz - z) < 1e-6 + 1e-9,
        s"$et: got ($gn,$gs,$gv,$gz) expected ($n,$s,$var18,$z)")
    }
  }

  test("event_benford: digit counts sum to n and χ² terms recompute exactly") {
    val out = SparkEntry.queries("event_benford")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byType = out.groupBy(_._1)
    val raw = T.events(spark, sf).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .filter(_._2 >= 1)
    byType.foreach { case (et, cells) =>
      assert(cells.map(_._2).sorted.toSeq == (1L to 9L), s"$et: missing digit rows")
      val n = raw.count(_._1 == et).toLong
      assert(cells.map(_._3).sum == n, s"$et: digit counts don't sum to n=$n")
      cells.foreach { case (_, d, nObs, expPpm, term) =>
        val p = math.log10(1.0 + 1.0 / d)
        assert(expPpm == math.round(p * 1e6))
        val expect = math.round((nObs.toDouble - n * p) * (nObs.toDouble - n * p) / (n * p) * 1e6)
        assert(term == expect, s"$et digit $d: χ² term $term vs $expect")
      }
      // observed digit counts match a driver recount
      val counts = raw.filter(_._1 == et).map(_._2.toString.head.asDigit.toLong)
        .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
      cells.foreach { case (_, d, nObs, _, _) =>
        assert(nObs == counts.getOrElse(d, 0L), s"$et digit $d count")
      }
    }
  }

  test("text_zipf_fit: slope recomputes from a driver-side frequency table") {
    val row = SparkEntry.queries("text_zipf_fit")(spark, sf).collect()(0)
    val toks = T.documents(spark, sf).select(col("text")).collect()
      .flatMap(r => Option(r.getString(0)).toSeq.flatMap(_.split(" ", -1)))
    val freq = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val top = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
    val xy = top.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log(i + 1.0) * 1000.0), math.round(math.log(f.toDouble) * 1000.0))
    }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n.toDouble * sxy - sx.toDouble * sy) / (n.toDouble * sxx - sx.toDouble * sx)
    assert(row.getLong(0) == n)
    // driver math.log vs the shared template agree to ≤1 millinats per
    // point; the OLS slope over ≥30 points absorbs that into <1e-3
    assert(math.abs(row.getDouble(1) - slope) < 1e-3,
      s"slope ${row.getDouble(1)} vs recomputed $slope")
    // a natural-language-ish corpus must slope DOWN
    assert(row.getDouble(1) < 0.0)
  }

  test("emb_whitening: whitened covariance is the identity on spanned directions") {
    // output is one CSV string cell per vector (driver contract) —
    // parse back into per-vector arrays for the covariance checks
    val out = SparkEntry.queries("emb_whitening")(spark, sf)
      .collect().map(_.getString(1).split(",").map(_.toDouble))
    val n = out.length
    assert(n > 100, "fixture should have hundreds of vectors")
    val d = out.head.length
    assert(n > d, "covariance must be full-rank for the identity check")
    val mu = new Array[Double](d)
    out.foreach(v => (0 until d).foreach(i => mu(i) += v(i) / n))
    var maxDiagErr = 0.0
    var maxOff = 0.0
    for (i <- 0 until d; j <- i until d) {
      var c = 0.0
      out.foreach(v => c += (v(i) - mu(i)) * (v(j) - mu(j)))
      c /= n
      if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(c - 1.0))
      else maxOff = math.max(maxOff, math.abs(c))
    }
    // ε-regularization + 6-dp output rounding leave small residue
    assert(maxDiagErr < 0.05, s"whitened variance off identity by $maxDiagErr")
    assert(maxOff < 0.05, s"whitened covariance off-diagonal up to $maxOff")
  }
}
