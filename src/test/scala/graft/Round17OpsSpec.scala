package graft

import org.apache.spark.sql.functions._

/** Round-17 invariants.
  *
  * `agg_weighted_median` plan pin (VERDICT r16 #1): the quantity-weighted
  * median must never run a running-weight window partitioned solely by
  * `l_returnflag` — on this corpus the distinct-(flag, price) table is
  * quasi-fact-sized (594k/600k at sf0.1), so a |flags|-partition window
  * is three single-task sorts that grow unboundedly with the corpus. The
  * rewrite rides the partial-offset device: the ONLY WindowExec allowed
  * is the local one partitioned by (_pid, l_returnflag). Semantics stay
  * pinned by the Round16 hand-recompute spec and the DuckDB oracle.
  */
class Round17OpsSpec extends GraftSuite {

  test("agg_weighted_median: window input is crossing-bucket-bounded, never the fact") {
    // The two-pass plan pin: the per-flag running-weight window is legal
    // ONLY because its input first passes the broadcast crossing-bucket
    // equi-join (bucket = cb), which bounds it by the price DOMAIN
    // (≤ 10 000 cents values per $100 bucket). A window whose subtree
    // lacks that join would be the banned fact-sized |flags|-partition
    // sort the r16 verdict flagged.
    val df = SparkEntry.queries("agg_weighted_median")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    val winIx = lines.indexWhere(_.contains("Window "))
    assert(winIx >= 0, s"expected the within-bucket cumulative window in plan:\n$plan")
    // the crossing-bucket broadcast join must sit BELOW the window
    val below = lines.drop(winIx).mkString("\n")
    assert(below.contains("BroadcastHashJoin") && below.contains("cb#"),
      s"window must consume the crossing-bucket join output, not the raw fact:\n$plan")
    assert(df.count() == 3)
  }

  test("multimodal_image_decode: bytes are genuine PNG and the codec round-trips every pixel") {
    import graft.functions.Multimodal
    // the encoded asset is a real PNG (magic bytes), not a fake container
    val png = Multimodal.makePng(42L)
    assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
           "payload must carry the PNG signature")
    // encode → decode equals the closed-form channel sums for a spread of ids
    for (id <- Seq(0L, 7L, 42L, 199L, 4990L)) {
      val (w, h) = Multimodal.pngDims(id)
      val (dw, dh, sr, sg, sb) = Multimodal.decodeSums(Multimodal.makePng(id))
      assert((dw, dh) == (w.toLong, h.toLong))
      val (r0, g0, b0) = (id % 200, (id * 3) % 200, (id * 7) % 200)
      assert(sr == w * h * r0 + h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2))
      assert(sg == w * h * g0 + h * (w * (w - 1) / 2))
      assert(sb == w * h * b0 + w * (h * (h - 1) / 2))
    }
    // undecodable payloads fail LOUD, never pass as zero-sum images
    intercept[IllegalArgumentException] {
      Multimodal.decodeSums(Array[Byte](1, 2, 3, 4))
    }
    // end-to-end through the binaryFile layout: one row per selected doc
    val out = SparkEntry.queries("multimodal_image_decode")(spark, sf).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.pngDims(id)
      assert(r.getLong(1) == w && r.getLong(2) == h)
    }
  }

  test("sql_grouping_id / sql_filter_clause: flags resolve subtotals; filters partition counts") {
    val g = SparkEntry.queries("sql_grouping_id")(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
                 r.getLong(2), r.getLong(3), r.getLong(4)))
    // the grand-total row is flagged (1,1) and equals the table size
    val total = T.orders(spark, sf).count()
    assert(g.filter(t => t._3 == 1 && t._4 == 1).map(_._5).toSeq == Seq(total))
    // GROUPING flag = 1 ⟺ the cell is a subtotal NULL, never a data NULL
    g.foreach { case (st, pr, gs, gp, _) =>
      assert((gs == 1) == st.isEmpty && (gp == 1) == pr.isEmpty)
    }
    // detail rows sum to the grand total
    assert(g.filter(t => t._3 == 0 && t._4 == 0).map(_._5).sum == total)

    val f = SparkEntry.queries("sql_filter_clause")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    f.foreach { case (_, all, fin, open) =>
      assert(fin + open <= all, "status filters must partition within the group")
    }
    assert(f.map(_._2).sum == total)
  }

  test("sim_graph_search: beam finds the seeds, clears the recall floor, scans a fraction") {
    val rows = SparkEntry.queries("sim_graph_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    val got = rows.map(_._1).toSet
    // exact top-10 by brute force with the operator's own ordering rule
    val emb = T.embeddings(spark, sf).select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = emb(0L).zip(emb(1L)).map { case (a, b) => (a + b) / 2.0f }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = emb.toSeq
      .map { case (id, v) => (id, BigDecimal(cos(v, q)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
      .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    val recall = (got & exact).size / 10.0
    assert(recall >= operators.RecallFloors.simGraphSearch,
      s"recall@10 $recall below floor ${operators.RecallFloors.simGraphSearch}; got $got want $exact")
    // the query seeds are the global top-2 by construction — must be found
    assert(got.contains(0L) && got.contains(1L), s"seeds not found: $got")
    // efficiency half: the search touched a FRACTION of the corpus
    val visited = rows.head._3
    assert(visited < emb.size / 2, s"beam search visited $visited of ${emb.size} — not sublinear")
    // scores descend with id tie-break (the operator's ordering contract)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    }
  }

  test("stream_idempotent_sink: re-delivery lands exactly-once rows") {
    // the key itself asserts the skip/rewrite flags via require(); here
    // the DATA contract: after a replay of batch 0 and a simulated
    // crash-recovery of batch 1, the landed set is exactly one copy
    val rows = SparkEntry.queries("stream_idempotent_sink")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)),
      s"re-delivery must neither duplicate nor drop rows, got ${rows.toSeq}")
  }

  test("osm_address_interpolation: parity, endpoints exact, positions monotone per way") {
    val rows = SparkEntry.queries("osm_address_interpolation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (wayId, pts) =>
      val sorted = pts.sortBy(_._2)
      // even/odd scheme: every generated number shares the endpoint parity, step 2
      val parities = sorted.map(_._2 % 2).distinct
      assert(parities.length == 1, s"way $wayId mixes parities")
      sorted.sliding(2).foreach { case Array(a, b) => assert(b._2 - a._2 == 2) }
      // endpoints reproduce the exact micro-unit corners (i=0 and i=k)
      val x1 = (wayId % 1000 * 0) + sorted.head._3 // head is i=0 → x1*1e6 exactly
      assert(x1 % 1000000L == 0, s"way $wayId: start not on an integer coordinate")
      assert(sorted.last._3 % 1000000L == 0 && sorted.last._4 % 1000000L == 0,
             s"way $wayId: end not on an integer coordinate")
      // interior points lie between the endpoints on each axis
      val (lox, hix) = (math.min(sorted.head._3, sorted.last._3), math.max(sorted.head._3, sorted.last._3))
      sorted.foreach { case (_, _, x, _) => assert(x >= lox && x <= hix) }
    }
  }

  test("event_concurrency: distributed sweep equals a driver-side sweep-line") {
    val starts = T.events(spark, sf).where(col("event_type") === "purchase")
      .select(unix_millis(col("ts"))).collect().map(_.getLong(0))
    val edges = (starts.map(t => (t, 1)) ++ starts.map(t => (t + 7200000L, -1)))
      .sortBy { case (t, d) => (t, d) }
    // tie-inclusive sweep: apply each (t, dlt) group as one step
    var depth = 0L
    val byBucket = scala.collection.mutable.Map.empty[Long, Long]
    edges.groupBy(identity).toSeq.sortBy(_._1).foreach { case ((t, d), g) =>
      depth += d.toLong * g.length
      val b = t / 3600000L
      byBucket(b) = math.max(byBucket.getOrElse(b, Long.MinValue), depth)
    }
    val got = SparkEntry.queries("event_concurrency")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.drain()
    assert(got == byBucket.toMap, "distributed prefix-sum sweep must equal the sequential sweep")
    assert(got.values.max >= 2, "fixture must exercise real overlap")
  }

  test("agg_bitmap_distinct: exact vs countDistinct, loud out-of-domain contract") {
    import graft.functions.BitmapDistinctAgg
    val li = T.lineitem(spark, sf)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exact, "bitmap distinct must be EXACT, not an estimate")
    // out-of-domain ids fail loud, never clamp
    val err = intercept[Exception] {
      li.agg(BitmapDistinctAgg(col("l_partkey"), 16)).collect()
    }
    assert(err.getMessage != null || err.getCause != null) // surfaced, not swallowed
  }

  test("lake_vacuum: survivors byte-intact, victims gone from the filesystem") {
    val rows = SparkEntry.queries("lake_vacuum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 6)
    // newest 3 kept, oldest 3 vacuumed
    assert(rows.filter(_._2).map(_._1).toSet == Set(3L, 4L, 5L))
    assert(rows.filterNot(_._2).forall(_._4 == 0L))
    // survivors hold exactly their slice of the source (content intact)
    val src = T.orders(spark, sf).select(col("o_orderkey")).collect().map(_.getLong(0))
    rows.filter(_._2).foreach { case (seq, _, _, nRows) =>
      assert(nRows == src.count(k => ((k % 6) + 6) % 6 == seq),
             s"snapshot $seq row count drifted after vacuum")
    }
    // victims are REALLY gone (filesystem, not just the report)
    val root = graft.Scratch.dir("lake_vacuum", sf)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (seq <- Seq(0, 1, 2))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/seq_$seq")),
             s"vacuumed snapshot seq_$seq still on disk")
    for (seq <- Seq(3, 4, 5))
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/seq_$seq")))
  }

  test("osm_turn_restrictions: in-row pair fold equals brute-force pair enumeration") {
    val memb = T.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = memb.groupBy(_._1).collect { case (node, g) if g.length >= 2 =>
      val ws = g.map(_._2).distinct.sorted
      val d = ws.length.toLong
      val restricted = (for (a <- ws; b <- ws if a != b
                             && (a + b + node) % 11 == 0) yield 1L).sum
      node -> ((d, d * (d - 1), restricted, d * (d - 1) - restricted))
    }
    val got = SparkEntry.queries("osm_turn_restrictions")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    // restrictions exist and never exceed the turn count
    assert(got.values.exists(_._3 > 0))
    got.values.foreach { case (_, turns, restr, allowed) =>
      assert(restr <= turns && allowed + restr == turns)
    }
  }

  test("join_interval: grid-blocked overlap equals the brute-force pair set") {
    val ev = T.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val p = ev.filter(_._2 == "purchase").map(t => (t._1, t._3, t._3 + 7200000L))
    val c = ev.filter(_._2 == "click").map(t => (t._1, t._3, t._3 + 3600000L))
    val expect = p.map { case (pid, s1, e1) =>
      val hits = c.filter { case (_, s2, e2) => s1 < e2 && s2 < e1 }
      pid -> ((hits.length.toLong,
               hits.map { case (_, s2, e2) => math.min(e1, e2) - math.max(s1, s2) }.sum))
    }.toMap
    val got = SparkEntry.queries("join_interval")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, "grid blocking must neither drop nor double-count a pair")
    // both arms live: some purchases overlap, some don't
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._1 == 0))
  }

  test("osm_changeset_stats: aggregate equals a recompute over the parsed rows") {
    val got = SparkEntry.queries("osm_changeset_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // recompute from the already-oracled parse surface (source_osc)
    val rows = SparkEntry.queries("source_osc")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(7), r.getLong(8)))
    val expect = rows.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> ((g.length.toLong, g.map(_._4).sum, g.map(_._5).sum, g.map(_._3).max))
    }
    assert(got == expect, s"got $got want $expect")
    // the diff fixture carries all three ops and all three kinds
    assert(got.keySet.map(_._2) == Set("node", "way", "relation"))
    assert(got.keySet.map(_._1) == Set("create", "modify", "delete"))
  }

  test("data_expectations: one scan, per-rule counts equal an independent recompute") {
    val rows = SparkEntry.queries("data_expectations")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rows.size == 5)
    // independent recompute of the one deliberately failing rule
    val li = T.lineitem(spark, sf).select("l_discount").collect().map(_.getDouble(0))
    val viol = li.count(_ > 0.05).toLong
    val (n, v, passed) = rows("discount_le_5pct")
    assert(n == li.length.toLong && v == viol, s"got ($n, $v) want (${li.length}, $viol)")
    assert(passed == (1000000L * viol / n <= 500000L))
    // strict rules hold at zero on this corpus and pass
    for (rule <- Seq("qty_in_range", "price_positive", "flag_in_domain", "shipdate_present")) {
      assert(rows(rule)._2 == 0L && rows(rule)._3, s"$rule should pass with 0 violations")
    }
    // plan shape: all five rules ride ONE scan (one FileScan of lineitem)
    val plan = SparkEntry.queries("data_expectations")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").count(_.contains("FileScan")) == 1,
      s"expectation rules must share one fact scan:\n$plan")
  }

  test("tokenizer_coverage_curve: monotone, exact, ends at full coverage of the 31-type vocab") {
    val rows = SparkEntry.queries("tokenizer_coverage_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 5L, 10L, 20L, 30L))
    // curve is strictly increasing in covered tokens and ppm ≤ 1e6
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 && b._3 >= a._3)
    }
    rows.foreach { case (_, _, ppm) => assert(ppm > 0 && ppm <= 1000000L) }
    // independent recompute at k=5
    val toks = T.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val byF = toks.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    val cum5 = byF.take(5).map(_._2).sum
    assert(rows.find(_._1 == 5L).get._2 == cum5)
    assert(rows.find(_._1 == 5L).get._3 == 1000000L * cum5 / toks.length)
  }

  test("multimodal_resize_exec: resample executes the plan geometry on decoded pixels") {
    import graft.functions.Multimodal
    for (id <- Seq(0L, 7L, 42L, 4990L)) {
      val (w, h) = Multimodal.pngDims(id)
      val sp = math.min(16L * 1000000L / w, 16L * 1000000L / h)
      val (ow, oh, sr, _, _) = Multimodal.decodeResizeSums(Multimodal.makePng(id), 16)
      assert(ow == w * sp / 1000000L && oh == h * sp / 1000000L,
             s"id=$id: output dims must follow the integer ppm plan")
      // independent recompute of the resized red-channel sum
      val r0 = id % 200
      val expect = (for (y <- 0L until oh; x <- 0L until ow)
        yield r0 + (x * w / ow) + (y * h / oh)).sum
      assert(sr == expect, s"id=$id: got $sr want $expect")
      // upscale into the 16-box: the long side fills it up to the
      // integer-DIV floor (w·(min DIV) can land one short of the box)
      assert(math.max(ow, oh) >= 15 && math.max(ow, oh) <= 16,
             s"id=$id: long side must fill the box modulo the DIV floor, got ${math.max(ow, oh)}")
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeResizeSums(Array[Byte](9, 9, 9), 16)
    }
  }

  test("multimodal_audio_decode: bytes are genuine RIFF WAV and the codec round-trips every sample") {
    import graft.functions.Multimodal
    val wav = Multimodal.makeWav(17L)
    // real RIFF/WAVE container magic
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
           new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
           "payload must carry the RIFF/WAVE signature")
    // encode → decode equals the closed-form stats for a spread of ids
    for (id <- Seq(0L, 5L, 17L, 63L, 4995L)) {
      val n = Multimodal.wavFrames(id)
      val (rate, frames, sumAbs) = Multimodal.decodeWav(Multimodal.makeWav(id))
      assert(rate == 8000L && frames == n.toLong)
      val expect = (0 until n).map(i => math.abs(Multimodal.wavSample(id, i).toLong)).sum
      assert(sumAbs == expect, s"id=$id: got $sumAbs want $expect")
    }
    // non-audio payloads fail LOUD
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not a wav".getBytes)
    }
    // end-to-end through the binaryFile layout
    val out = SparkEntry.queries("multimodal_audio_decode")(spark, sf).collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.getLong(2) == Multimodal.wavFrames(r.getLong(0)).toLong)
    }
  }

  test("codePointPairCodes: supplementary-plane symbols are single stream symbols") {
    import graft.functions.HashedGramsCore
    import org.apache.spark.unsafe.types.UTF8String
    def pairs(s: String): Seq[(Int, Int)] = {
      val a = HashedGramsCore.codePointPairCodes(UTF8String.fromString(s))
      (0 until a.numElements()).map { i =>
        val v = a.getLong(i); ((v >> 21).toInt, (v & 0x1FFFFF).toInt)
      }
    }
    // 🎉 is U+1F389 (4-byte UTF-8, a surrogate PAIR in Java chars) — it
    // must appear as ONE symbol on each side of a pair, never two
    assert(pairs("x🎉y") == Seq(('x'.toInt, 0x1F389), (0x1F389, 'y'.toInt)))
    // 2-byte (é U+00E9) and 3-byte (文 U+6587) classes
    assert(pairs("é文") == Seq((0xE9, 0x6587)))
    // token split on 0x20: no cross-token pairs, empty tokens yield none
    assert(pairs("ab  cd") == Seq(('a'.toInt, 'b'.toInt), ('c'.toInt, 'd'.toInt)))
    assert(pairs("") == Nil && pairs("a") == Nil)
    // pure-ASCII parity with the ASCII lane's pair stream (same positions)
    val ascii = "fast merge batch"
    val fromAscii = {
      val a = HashedGramsCore.charPairCodes(UTF8String.fromString(ascii))
      (0 until a.numElements()).map { i =>
        val v = a.getInt(i); (v >> 8, v & 0xff)
      }
    }
    assert(pairs(ascii) == fromAscii)
    // malformed UTF-8 fails LOUD (truncated lead byte)
    intercept[IllegalArgumentException] {
      HashedGramsCore.codePointPairCodes(
        UTF8String.fromBytes(Array[Byte](0x61, 0xC3.toByte)))
    }
  }
}
