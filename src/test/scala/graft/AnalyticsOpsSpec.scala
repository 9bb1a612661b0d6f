package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-10 analytics keys (`agg_histogram`,
  * `agg_corr`, `text_tfidf_topk`, `emb_quantize_int8`). All four are
  * DuckDB-oracled — these specs pin what the hash compare can't:
  * partition totals, the exact-moment formula, ranking contracts, and
  * the quantization error bound.
  */
class AnalyticsOpsSpec extends GraftSuite {

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("agg_histogram: buckets partition the table and bound their min/max") {
    val rows = q("agg_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = T.lineitem(spark, sf).count()
    assert(rows.map(_._2).sum == total, "bucket counts must partition the table")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per bucket")
    for ((bucket, n, lo, hi) <- rows) {
      assert(n > 0, "empty buckets are not emitted")
      assert(lo <= hi)
      assert(lo >= bucket * 5000.0 && hi < (bucket + 1) * 5000.0,
        s"bucket $bucket range [$lo,$hi] escapes its bin")
    }
  }

  test("agg_corr: matches an exact BigDecimal recompute and lands in [-1, 1]") {
    val row = q("agg_corr").collect().head
    val (n, corr) = (row.getLong(0), row.getDouble(1))
    assert(corr >= -1.0 && corr <= 1.0)
    val xy = T.lineitem(spark, sf).select(col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
                           BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    assert(n == xy.length)
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val nd = n.toDouble
    val expected = (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(nd * sxx.toDouble - sx.toDouble * sx.toDouble) *
       math.sqrt(nd * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(math.abs(corr - expected) < 1e-6,
      s"corr $corr != exact-moment recompute $expected")
  }

  test("agg_corr: result is invariant under repartitioning (decimal moments, no fp order)") {
    val a = q("agg_corr").collect().head.getDouble(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_corr_repart").toString
    // same rows, radically different partitioning → identical moments
    T.lineitem(spark, sf).repartition(17).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val b = SparkEntry.queries("agg_corr")(spark, dir).collect().head.getDouble(1)
    assert(a == b, s"corr must be bit-stable under repartitioning: $a vs $b")
  }

  test("text_tfidf_topk: per-doc top-3 contract — membership, count, ordering") {
    val rows = q("text_tfidf_topk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docTokens = T.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
      .toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == docTokens.filter(_._2.nonEmpty).keySet,
      "every non-empty doc yields keywords")
    for ((doc, rs) <- byDoc) {
      val distinctToks = docTokens(doc).distinct.length
      assert(rs.length == math.min(3, distinctToks), s"doc $doc keyword count")
      assert(rs.map(_._2).distinct.length == rs.length, s"doc $doc duplicate keyword")
      for ((_, tok, tf, _) <- rs) {
        assert(docTokens(doc).contains(tok), s"doc $doc keyword '$tok' not in doc")
        assert(tf == docTokens(doc).count(_ == tok), s"doc $doc '$tok' tf")
      }
      // emitted in (score desc, token) order, and scores are the doc's top scores
      val scores = rs.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores not non-increasing: ${scores.mkString(",")}")
    }
  }

  test("emb_quantize_int8: range, max-element saturation, and dequantization error bound") {
    val rows = q("emb_quantize_int8").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2)))
    val vecs = T.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(rows.length == vecs.size)
    for ((id, scale, qs) <- rows) {
      val xs = vecs(id)
      assert(qs.length == xs.length)
      assert(scale == xs.map(math.abs).max, s"vec $id scale")
      assert(qs.forall(v => v >= -127 && v <= 127), s"vec $id q out of int8 range")
      // the max-|x| element must saturate to ±127
      val argmax = xs.indexWhere(x => math.abs(x) == scale)
      assert(math.abs(qs(argmax)) == 127, s"vec $id max element must hit ±127")
      // dequantization error ≤ half a quantization step
      for ((x, qv) <- xs.zip(qs))
        assert(math.abs(qv * scale / 127.0 - x) <= scale / 254.0 + 1e-12,
          s"vec $id dequant error too large at x=$x q=$qv")
    }
  }
}
