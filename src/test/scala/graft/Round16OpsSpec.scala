package graft

import org.apache.spark.sql.functions._

/** Round-16 invariants for the keys added this round.
  *
  * `win_lin_interp`: the oracle pins cross-engine equality; here the
  * SEMANTICS are pinned against an independent Scala recomputation
  * (same IEEE ops ⇒ exact doubles), plus the single-exchange plan
  * contract both Window passes must share.
  *
  * `osm_way_bearing`: the exact-integer octant rule is recomputed
  * independently per segment and the full histogram compared; the
  * ppm-share integer-division identity is asserted per class.
  */
class Round16OpsSpec extends GraftSuite {

  test("win_lin_interp: observed rows pass through; gaps interpolate on the exact line") {
    val rows = SparkEntry.queries("win_lin_interp")(spark, sf)
      .select("user_id", "ms", "v", "v_interp").collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 if (r.isNullAt(2)) None else Some(r.getDouble(2)),
                 if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    // observed rows pass through untouched
    rows.foreach { case (_, _, v, vi) =>
      if (v.isDefined) assert(vi.contains(v.get), "non-null v must pass through")
    }
    // independent recomputation per user (same arithmetic text ⇒ same doubles)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val seq = rs.sortBy(r => (r._2)) // (ms) — event_id tiebreak is baked into row order upstream
      seq.zipWithIndex.foreach { case ((_, ms, v, vi), i) =>
        if (v.isEmpty) {
          val prev = seq.take(i).reverse.find(_._3.isDefined)
          val next = seq.drop(i + 1).find(_._3.isDefined)
          val expect = (prev, next) match {
            case (None, None)         => None
            case (None, Some(n))      => n._3
            case (Some(p), None)      => p._3
            case (Some(p), Some(n)) if n._2 == p._2 => p._3
            case (Some(p), Some(n)) =>
              Some(p._3.get + (n._3.get - p._3.get) *
                ((ms - p._2).toDouble / (n._2 - p._2).toDouble))
          }
          assert(vi == expect, s"gap at ms=$ms: got $vi want $expect")
        }
      }
    }
  }

  test("win_lin_interp: both window passes share one user_id exchange") {
    val plan = SparkEntry.queries("win_lin_interp")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashParts = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(hashParts == 1,
      s"expected exactly one user_id hash exchange shared by both Window passes, got $hashParts:\n$plan")
  }

  test("osm_way_bearing: histogram equals an independent per-segment recomputation") {
    // rebuild segments the way the kernel does, classify in plain Scala
    val pts = T.lineitem(spark, sf)
      .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
              col("l_partkey").as("node_ref"))
      .join(T.part(spark, sf).select(
        col("p_partkey").as("node_ref2"),
        (col("p_size").cast("long") * 100).as("lon_c"),
        round(col("p_retailprice") * 100).cast("long").as("lat_c")),
        col("node_ref") === col("node_ref2"))
      .select("way_id", "pos", "node_ref", "lon_c", "lat_c").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val cls = T.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def orient(dx: Long, dy: Long): Option[String] = {
      if (dx == 0 && dy == 0) None
      else {
        val (ndx, ndy) = if (dy < 0 || (dy == 0 && dx < 0)) (-dx, -dy) else (dx, dy)
        Some(
          if (12 * ndy < 5 * math.abs(ndx)) "E-W"
          else if (5 * ndy > 12 * math.abs(ndx)) "N-S"
          else if (ndx > 0) "NE-SW"
          else "NW-SE")
      }
    }
    val expect = pts.groupBy(_._1).toSeq.flatMap { case (wayId, rs) =>
      val ordered = rs.map(_._2).sortBy(p => (p._1, p._2))
      ordered.zip(ordered.drop(1)).flatMap { case (a, b) =>
        orient(b._3 - a._3, b._4 - a._4).map(o => (cls(wayId), o))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("osm_way_bearing")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expect, s"histogram mismatch: got $got want $expect")
  }

  test("osm_way_sinuosity: ratio equals an independent recomputation; classes honor the rounded thresholds") {
    val pts = T.lineitem(spark, sf)
      .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
              col("l_partkey").as("node_ref"))
      .join(T.part(spark, sf).select(
        col("p_partkey").as("node_ref2"),
        (col("p_size").cast("long") * 100).as("lon_c"),
        round(col("p_retailprice") * 100).cast("long").as("lat_c")),
        col("node_ref") === col("node_ref2"))
      .select("way_id", "pos", "node_ref", "lon_c", "lat_c").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val expect = pts.groupBy(_._1).map { case (wayId, rs) =>
      val o = rs.map(_._2).sortBy(p => (p._1, p._2))
      val path = o.zip(o.drop(1)).foldLeft(0.0) { case (acc, (a, b)) =>
        val (dx, dy) = (b._3 - a._3, b._4 - a._4)
        acc + math.sqrt((dx * dx + dy * dy).toDouble)
      }
      val (cx, cy) = (o.last._3 - o.head._3, o.last._4 - o.head._4)
      val chord = math.sqrt((cx * cx + cy * cy).toDouble)
      val sin4 = if (chord == 0.0) None
                 else Some(BigDecimal(path / chord)
                   .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      wayId -> ((o.length - 1).toLong, sin4)
    }
    val got = SparkEntry.queries("osm_way_sinuosity")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (wayId, nSeg) = (r.getLong(0), r.getLong(1))
      val sin4 = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val label = r.getString(3)
      val (eSeg, eSin) = expect(wayId)
      assert(nSeg == eSeg, s"way $wayId n_segments")
      assert(sin4 == eSin, s"way $wayId sinuosity: got $sin4 want $eSin")
      val eLabel = sin4 match {
        case None                 => "CLOSED"
        case Some(v) if v < 1.05  => "STRAIGHT"
        case Some(v) if v < 1.25  => "WINDING"
        case Some(_)              => "TORTUOUS"
      }
      assert(label == eLabel, s"way $wayId label: got $label want $eLabel")
      sin4.foreach(v => assert(v >= 1.0 - 1e-9, s"sinuosity below 1 at way $wayId: $v"))
    }
  }

  test("osm_dwithin_count: trig factors ride the broadcast dimension, never the join residual") {
    // The r16 regression pin: inlining the WGS84 polynomial into the
    // spatial join's residual condition pushed the generated method past
    // HotSpot's JIT size cap and the probe loop ran interpreted (21×).
    // The polynomial literal must appear ONLY in the factor dimension's
    // own projection — never in a join condition or the pair-stream
    // project above it.
    val plan = SparkEntry.queries("osm_dwithin_count")(spark, sf)
      .queryExecution.executedPlan.toString
    val poly = "8.726646259971648E-5"
    plan.split("\n").foreach { line =>
      if (line.contains("Join") || line.contains("dist_m"))
        assert(!line.contains(poly),
          s"polynomial inlined into the pair stream:\n$line")
    }
    assert(plan.contains(poly), "factor dimension build must still carry the polynomial")
  }

  test("agg_weighted_median: equals the hand-computed lower weighted median per flag") {
    val rows = T.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getString(0),
                 BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
                 r.getDouble(2).toLong))
    val expect = rows.groupBy(_._1).map { case (flag, rs) =>
      val byV = rs.groupBy(_._2).map { case (v, g) => v -> g.map(_._3).sum }.toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      val med = byV.find { case (_, wt) => cum += wt; 2 * cum >= tot }.get._1
      flag -> ((tot, med.toDouble))
    }
    val got = SparkEntry.queries("agg_weighted_median")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("osm_node_use_count: histogram equals an independent distinct-way recomputation") {
    val refs = T.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = refs.groupBy(_._1).map { case (_, g) => g.map(_._2).distinct.size.toLong }
      .groupBy(identity).map { case (deg, g) => deg -> g.size.toLong }
    val got = SparkEntry.queries("osm_node_use_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"got $got want $expect")
    // every node appears in >= 1 way by construction of the membership table
    assert(!got.contains(0L))
  }

  test("win_rolling_slope: slopes equal an independent moment recomputation") {
    val daily = T.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(unix_millis(ts) / 86400000) AS BIGINT)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, day), g) => (et, day, g.size.toLong) }.toSeq
    val expect = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, day, n), i) =>
        val frame = sorted.slice(math.max(0, i - 6), i + 1)
        val k = frame.length.toLong
        val sx = frame.map(_._2).sum; val sy = frame.map(_._3).sum
        val sxy = frame.map(t => t._2 * t._3).sum; val sxx = frame.map(t => t._2 * t._2).sum
        val den = k * sxx - sx * sx
        val slope = if (den == 0) None
          else Some(BigDecimal((k * sxy - sx * sy).toDouble / den.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        (et, day) -> ((n, k, slope))
      }
    }
    val got = SparkEntry.queries("win_rolling_slope")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got == expect, s"slopes differ")
    assert(got.values.exists(_._3.isEmpty), "single-row frames must report NULL, not divide")
  }

  test("join_asof_tolerance: matches join_asof's rows, staleness nulls the value, never re-matches") {
    val plain = SparkEntry.queries("join_asof")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf).collect()
      .map(r => (r.getLong(0),
                 if (r.isNullAt(3)) None else Some(r.getDouble(3)),
                 if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(tol.map(_._1).toSet == plain.keySet,
      "tolerance must keep exactly the plain as-of's matched-trade rows")
    var fresh = 0; var stale = 0
    tol.foreach { case (id, v, age) =>
      (v, age) match {
        case (Some(value), Some(a)) =>
          fresh += 1
          assert(a >= 0 && a <= 172800000L, s"trade $id age out of bound: $a")
          assert(value == plain(id), s"trade $id fresh value must equal the plain as-of match")
        case (None, None) => stale += 1
        case other => fail(s"trade $id value/age must null together: $other")
      }
    }
    assert(fresh > 0 && stale > 0, s"fixture must exercise both arms (fresh=$fresh stale=$stale)")
  }

  test("osm_duplicate_ways: groups equal an independent signature recomputation") {
    val refs = T.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val sigs = refs.groupBy(_._1).map { case (w, g) =>
      w -> g.map(t => (t._2, t._3)).sorted.map(_._2).mkString(",")
    }
    val expect = sigs.groupBy(_._2).filter(_._2.size > 1).map { case (_, g) =>
      val ids = g.keys.toSeq.sorted
      ids.min -> ((g.size.toLong, ids.mkString(",")))
    }
    val got = SparkEntry.queries("osm_duplicate_ways")(spark, sf).collect()
      .map(r => r.getLong(2) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(got == expect, s"got $got want $expect")
    assert(got.nonEmpty, "fixture must contain duplicate ways")
  }

  test("osm_tag_cooccurrence: pair counts equal an independent per-element recomputation") {
    val parts = T.part(spark, sf)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"),
              col("p_type"), col("p_brand")).collect()
    val expectPairs = parts.flatMap { r =>
      val tags = Seq(
        if (r.getInt(1) >= 25) Some("heavy") else None,
        if (r.getDouble(2) > 970) Some("premium") else None,
        if (r.getString(3) == "PROMO") Some("promo") else None,
        if (r.getInt(1) < 10) Some("small") else None,
        if (r.getString(4).startsWith("Brand#4")) Some("brand4") else None).flatten
      for (a <- tags; b <- tags if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val total = parts.length.toLong
    val got = SparkEntry.queries("osm_tag_cooccurrence")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.view.mapValues(_._1).toMap == expectPairs, s"pair counts differ")
    got.foreach { case (_, (n, ppm)) =>
      assert(ppm == 1000000L * n / total, "support_ppm must be the exact integer division")
    }
  }

  test("data_profile_columns: profile matches independently computed column stats") {
    val rows = T.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_custkey")).collect()
    val got = SparkEntry.queries("data_profile_columns")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                    r.getString(4), r.getString(5)))).toMap
    assert(got.keySet == Set("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"))
    val st = rows.map(_.getString(0))
    assert(got("o_orderstatus") ==
      ((rows.length.toLong, st.length.toLong, st.distinct.length.toLong, st.min, st.max)))
    val ck = rows.map(_.getLong(1))
    assert(got("o_custkey")._3 == ck.distinct.length.toLong)
    assert(got("o_custkey")._4 == ck.min.toString && got("o_custkey")._5 == ck.max.toString)
    // plan contract: the multi-DISTINCT plans one tagged Expand as a
    // HASH aggregate (never per-column rescans), and the string-bounds
    // half must NOT demote it to a sort of the expanded rows
    val plan = SparkEntry.queries("data_profile_columns")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length == 2,
      s"profile is two purpose-split scans:\n$plan")
    assert(!plan.contains("Sort [o_custkey"),
      s"the expanded distinct rows must never be sorted:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"the distinct half must stay hash-based:\n$plan")
  }

  test("fn_collation: collated grouping equals lower()-keyed grouping") {
    val expect = T.part(spark, sf)
      .select(lower(col("p_brand")).as("b"), col("p_type")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (b, g) =>
        b -> ((g.size.toLong, g.map(_._2).distinct.size.toLong))
      }
    val got = SparkEntry.queries("fn_collation")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("sample_class_balance: every label keeps exactly the minority-class count") {
    val got = SparkEntry.queries("sample_class_balance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totals = T.embeddings(spark, sf).groupBy(col("label")).count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val m = totals.values.min
    val perLabel = got.groupBy(_._1).map { case (l, g) => l -> g.map(_._3).toSet }
    assert(perLabel.keySet == totals.keySet, "every label present")
    perLabel.foreach { case (l, ids) =>
      assert(ids.size.toLong == m, s"label $l kept ${ids.size}, want minority count $m")
    }
    // reproducibility: a second run selects the identical id set
    val again = SparkEntry.queries("sample_class_balance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == got.map(r => (r._1, r._3)).toSet)
  }

  test("tokenizer_oov_rate: rates equal an independent vocab-cut recomputation") {
    val toks = T.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
    val vocab = toks.groupBy(_._2).map { case (t, g) => (t, g.size) }.toSeq
      .sortBy { case (t, f) => (-f, t) }.take(10).map(_._1).toSet
    val expect = toks.groupBy(_._1).map { case (src, g) =>
      val n = g.size.toLong
      val oov = g.count(t => !vocab.contains(t._2)).toLong
      src -> ((n, oov, 1000000L * oov / n))
    }
    val got = SparkEntry.queries("tokenizer_oov_rate")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, s"got $got want $expect")
    assert(expect.values.exists(_._2 > 0), "fixture must exercise a non-trivial OOV tail")
  }

  test("emb_binary_hamming: codes and distances equal an independent bit-packing recomputation") {
    val vecs = T.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def pack(v: Array[Float], lo: Int): Long =
      v.slice(lo, lo + 32).foldLeft(0L)((a, x) => a * 2 + (if (x > 0) 1L else 0L))
    val words = vecs.map { case (id, v) => id -> ((pack(v, 0), pack(v, 32))) }.toMap
    val (q0, q1) = words(0L)
    val expect = words.toSeq.map { case (id, (w0, w1)) =>
      (id, java.lang.Long.bitCount(w0 ^ q0) + java.lang.Long.bitCount(w1 ^ q1))
    }.sortBy(t => (t._2, t._1)).take(20)
    val got = SparkEntry.queries("emb_binary_hamming")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2).toInt)).toSeq
    assert(got == expect, s"got $got want $expect")
    assert(got.head == ((0L, 0)), "the query vector must rank first at distance 0")
  }

  test("scan_dpp: the fact scan carries a DynamicPruningExpression in its partition filters") {
    val plan = SparkEntry.queries("scan_dpp")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected runtime partition pruning in the fact scan:\n$plan")
  }

  test("event_ab_srm: chi-square equals the exact identity on hand-counted exposure") {
    val users = T.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val expect = users.groupBy(_._1).map { case (et, g) =>
      val na = g.count(_._2 % 2 == 0).toLong
      val nb = g.size - na
      val chi2 = ((na - nb) * (na - nb)).toDouble / (na + nb).toDouble
      et -> ((na, nb, chi2 > 3.841))
    }
    val got = SparkEntry.queries("event_ab_srm")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("osm_way_bearing: ppm shares are the exact integer-division identity per class") {
    val rows = SparkEntry.queries("osm_way_bearing")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val total = rs.map(_._2).sum
      rs.foreach { case (_, n, ppm) =>
        assert(ppm == 1000000L * n / total, "share_ppm must be (1e6*n) DIV class_total")
      }
      val sumPpm = rs.map(_._3).sum
      assert(sumPpm <= 1000000L && sumPpm > 1000000L - 4 * 1,
        s"floor-division shares must sum to 1e6 minus < one ulp per bin, got $sumPpm")
    }
  }
}
