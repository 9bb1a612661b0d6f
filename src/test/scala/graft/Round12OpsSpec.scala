package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-12 keys (`osm_way_area_m2`,
  * `osm_relation_area_m2`, `text_bigram_lm`). All three are oracled —
  * the driver hash-checks them against DuckDB — so these specs pin what
  * the fixture-derived compare can't: hand-computed areas on planted
  * geometry (including the negative-net broken-tagging signal) and the
  * predictable-beats-salad ordering of the bigram LM score.
  */
class Round12OpsSpec extends GraftSuite {

  /** m² per centi-unit² (1113.2² / 2 — shoe is twice the area). */
  private val K = 619667.12

  test("osm_relation_area_m2: planted outer+hole nets shell minus hole; flipped roles net negative") {
    val dir = java.nio.file.Files.createTempDirectory("graft_relarea").toString
    import spark.implicits._
    // nodes: outer square side 1000 centi-units (ids 1-4), inner square
    // side 500 (ids 5-8). lon_c = p_size*100, lat_c = round(p_retailprice*100).
    Seq((1L, 0, 0.0), (2L, 10, 0.0), (3L, 10, 10.0), (4L, 0, 10.0),
        (5L, 2, 2.0), (6L, 7, 2.0), (7L, 7, 7.0), (8L, 2, 7.0))
      .toDF("p_partkey", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // way 1 = outer ring, way 2 = inner ring (open; the kernel closes them)
    Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L), (1L, 4, 4L),
        (2L, 1, 5L), (2L, 2, 6L), (2L, 3, 7L), (2L, 4, 8L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // relation 100: big ring outer, small ring inner (well-tagged);
    // relation 200: SAME rings with roles flipped (broken tagging)
    Seq((1L, 100L, "1-URGENT"), (2L, 100L, "3-MEDIUM"),
        (1L, 200L, "3-MEDIUM"), (2L, 200L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = SparkEntry.queries("osm_relation_area_m2")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    // |shoe|: outer 2*1000² = 2e6, inner 2*500² = 5e5 (exact integers)
    val shell = 2000000.0 * K
    val hole = 500000.0 * K
    assert(got(100L) == ((1L, 1L, math.rint((shell - hole) * 10) / 10)),
      s"well-tagged relation: ${got(100L)}")
    assert(got(200L)._3 == math.rint((hole - shell) * 10) / 10 && got(200L)._3 < 0,
      s"flipped roles must net NEGATIVE (the QA signal): ${got(200L)}")
  }

  test("osm_way_area_m2: planted square has the exact hand-computed area") {
    // reuse the sf fixture path only for schema; plant the same square
    val dir = java.nio.file.Files.createTempDirectory("graft_wayarea").toString
    import spark.implicits._
    Seq((1L, 0, 0.0), (2L, 10, 0.0), (3L, 10, 10.0), (4L, 0, 10.0))
      .toDF("p_partkey", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L), (1L, 4, 4L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("osm_way_area_m2")(spark, dir).collect().head
    // CCW square → winding CCW; ring closed to 5 points; |shoe| = 2e6
    assert((r.getLong(0), r.getLong(1), r.getString(2)) == ((1L, 5L, "CCW")))
    assert(r.getDouble(3) == math.rint(2000000.0 * K * 10) / 10)
  }

  test("text_bigram_lm: predictable text outscores token salad, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bigram").toString
    import spark.implicits._
    // doc 1: 'a' always followed by 'b' (and back) — high P(next|prev);
    // doc 2: 'a' fans out to c/d/e/f — each continuation is 1-of-8.
    Seq((1L, "a b a b a b a b", "en", "s", 15L),
        (2L, "a c a d a e a f", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_bigram_lm")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // c(a,·)=8. doc1: ab×4 at (1e6·4)DIV8, ba×3 at (1e6·3)DIV3.
    // doc2: a?×4 at (1e6·1)DIV8, ?a×3 at (1e6·1)DIV1.
    assert(got(1L) == ((7L, (4L * 500000L + 3L * 1000000L) / 7L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((7L, (4L * 125000L + 3L * 1000000L) / 7L)), s"doc2: ${got(2L)}")
    assert(got(1L)._2 > got(2L)._2, "predictable text must outscore salad")
  }
}
