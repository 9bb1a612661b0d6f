package graft

/** Independent mathematical fixtures for `osm_poly_pair_area`'s kernel
  * (OsmKernels.pairPass). The DuckDB oracle shares the kernel TEMPLATE
  * (it validates the engine plumbing, not the math), so this spec pins
  * the math itself on hand-computable polygons: the two-sided boundary
  * integral Σ_∂A cross·measure(w_B) + Σ_∂B cross·measure(w_A) must equal
  * 2·∬ w_A·w_B — i.e. twice the intersection area for simple rings, the
  * signed winding measure in general.
  */
class PolyPairAreaSpec extends GraftSuite {

  private def sqlEdges(pts: Seq[(Long, Long)]): String =
    pts.zip(pts.tail :+ pts.head).map { case ((x1, y1), (x2, y2)) =>
      s"named_struct('x1', ${x1}L, 'y1', ${y1}L, 'x2', ${x2}L, 'y2', ${y2}L)"
    }.mkString("array(", ", ", ")")

  /** ∬ w_A·w_B via the kernel: (passA + passB) / 2. */
  private def windArea(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Double =
    spark.sql(
      s"""SELECT (${operators.OsmKernels.pairPass(duck = false, "ae", "be")}
         |      + ${operators.OsmKernels.pairPass(duck = false, "be", "ae")}) * 0.5 AS v
         |FROM (SELECT ${sqlEdges(a)} AS ae, ${sqlEdges(b)} AS be)""".stripMargin)
      .head().getDouble(0)

  private def sq(x0: Long, y0: Long, x1: Long, y1: Long): Seq[(Long, Long)] =
    Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1)) // CCW

  test("offset squares: [0,2]² ∩ [1,3]² = 1") {
    assert(windArea(sq(0, 0, 2, 2), sq(1, 1, 3, 3)) === 1.0)
  }

  test("disjoint squares have zero measure") {
    assert(windArea(sq(0, 0, 1, 1), sq(5, 5, 6, 6)) === 0.0)
  }

  test("containment: B inside A yields area(B)") {
    assert(windArea(sq(0, 0, 4, 4), sq(1, 1, 2, 2)) === 1.0)
  }

  test("triangle ∩ square with a diagonal cut: exact 2.0") {
    // x+y ≤ 4 over [1,3]²: ∫₁³ (3−x) dx = 2
    val tri = Seq((0L, 0L), (4L, 0L), (0L, 4L)) // CCW
    assert(windArea(tri, sq(1, 1, 3, 3)) === 2.0)
  }

  test("bowtie winding cancels: self-intersecting ring vs covering square = 0") {
    // (0,0)→(2,2)→(2,0)→(0,2) closes into two triangles of OPPOSITE
    // winding; their signed measures against any covering region cancel
    // — the documented winding semantics, same as osm_poly_clip_area.
    val bowtie = Seq((0L, 0L), (2L, 2L), (2L, 0L), (0L, 2L))
    assert(math.abs(windArea(bowtie, sq(-1, -1, 3, 3))) < 1e-12)
  }

  test("symmetry: swapping the layers is bit-identical") {
    val a = sq(0, 0, 3, 2); val b = Seq((1L, 1L), (5L, 1L), (4L, 4L))
    assert(windArea(a, b) === windArea(b, a))
  }

  test("orientation: reversing one ring negates the signed measure") {
    val a = sq(0, 0, 2, 2); val b = sq(1, 1, 3, 3)
    assert(windArea(a.reverse, b) === -windArea(a, b))
  }

  test("native kernel ≡ SQL template, bit-for-bit, on fixtures and random self-intersecting rings") {
    import org.apache.spark.sql.functions.{col, expr}
    // pseudo-random closed rings (seeded — reproducible), many self-intersecting
    val rnd = new scala.util.Random(42)
    def randRing(n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((rnd.nextInt(5000).toLong, rnd.nextInt(200000).toLong))
    val pairs: Seq[(Seq[(Long, Long)], Seq[(Long, Long)])] =
      Seq((sq(0, 0, 2, 2), sq(1, 1, 3, 3)),
          (sq(0, 0, 4, 4), sq(1, 1, 2, 2)),
          (Seq((0L, 0L), (2L, 2L), (2L, 0L), (0L, 2L)), sq(-1, -1, 3, 3))) ++
        (1 to 40).map(_ => (randRing(3 + rnd.nextInt(6)), randRing(3 + rnd.nextInt(6))))
    val rows = pairs.map { case (a, b) => s"(${sqlEdges(a)}, ${sqlEdges(b)})" }
      .mkString("VALUES ", ", ", "")
    val df = spark.sql(s"SELECT col1 AS ae, col2 AS be FROM ($rows)")
      .select(
        expr(s"${operators.OsmKernels.pairPass(duck = false, "ae", "be")}").as("tpl_a"),
        expr(s"${operators.OsmKernels.pairPass(duck = false, "be", "ae")}").as("tpl_b"),
        graft.functions.PolyPairPass(col("ae"), col("be")).as("nat_a"),
        graft.functions.PolyPairPass(col("be"), col("ae")).as("nat_b"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"pass A template ${r.getDouble(0)} != native ${r.getDouble(2)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1))
        === java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"pass B template ${r.getDouble(1)} != native ${r.getDouble(3)}")
    }
  }
}
