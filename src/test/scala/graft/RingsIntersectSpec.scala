package graft

/** Pins `functions.RingsIntersect` (the fused ST_Intersects kernel the
  * Spark side of `osm_poly_overlaps` runs) exactly equal to the SQL
  * template the DuckDB oracle keeps (OsmKernels.segInt + insideCase) —
  * all-Long decisions, so equality is exact — plus decision fixtures for
  * every branch class: proper crossing, collinear endpoint touch,
  * containment (no edge crossing), shared-vertex touch, disjoint, and
  * the degenerate 1-point ring (zero edges, one vertex) that forced the
  * vertex arrays to ride as separate children: seen live at sf0.01
  * (ways 2495/9980 pair by containment only), an edges-derived vertex
  * set silently drops it.
  */
class RingsIntersectSpec extends GraftSuite {

  private def sqlEdges(pts: Seq[(Long, Long)]): String =
    pts.zip(pts.tail :+ pts.head).map { case ((x1, y1), (x2, y2)) =>
      s"named_struct('x1', ${x1}L, 'y1', ${y1}L, 'x2', ${x2}L, 'y2', ${y2}L)"
    }.mkString("array(", ", ", ")")

  private def sqlVerts(pts: Seq[(Long, Long)]): String =
    pts.map { case (x, y) => s"named_struct('x', ${x}L, 'y', ${y}L)" }
      .mkString("array(", ", ", ")")

  private def sqlArr(vs: Seq[Long]): String = vs.mkString("array(", "L, ", "L)")

  /** The template decision, rendered exactly as the oracle's. */
  private def templateDecision: String = {
    val segP = operators.OsmKernels.segInt("ea.x1", "ea.y1", "ea.x2", "ea.y2",
                                           "eb.x1", "eb.y1", "eb.x2", "eb.y2")
    val aInB = "exists(sequence(1, size(alons)), i -> " +
      s"aggregate(bedges, CAST(0 AS BIGINT), (acc, eb) -> acc + ${operators.OsmKernels.insideCase("element_at(alons, i)", "element_at(alats, i)", "eb")}) % 2 = 1)"
    val bInA = "exists(sequence(1, size(blons)), i -> " +
      s"aggregate(aedges, CAST(0 AS BIGINT), (acc, ea) -> acc + ${operators.OsmKernels.insideCase("element_at(blons, i)", "element_at(blats, i)", "ea")}) % 2 = 1)"
    s"(exists(aedges, ea -> exists(bedges, eb -> $segP)) OR ($aInB) OR ($bInA))"
  }

  private def both(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): (Boolean, Boolean) = {
    import org.apache.spark.sql.functions.col
    val closedA = a :+ a.head; val closedB = b :+ b.head
    val r = spark.sql(
      s"""SELECT ${sqlEdges(a)} AS aedges, ${sqlEdges(b)} AS bedges,
         |       ${sqlVerts(closedA)} AS averts, ${sqlVerts(closedB)} AS bverts,
         |       ${sqlArr(closedA.map(_._1))} AS alons, ${sqlArr(closedA.map(_._2))} AS alats,
         |       ${sqlArr(closedB.map(_._1))} AS blons, ${sqlArr(closedB.map(_._2))} AS blats""".stripMargin)
      .select(org.apache.spark.sql.functions.expr(templateDecision).as("tpl"),
              graft.functions.RingsIntersect(col("aedges"), col("averts"),
                                             col("bedges"), col("bverts")).as("nat"))
      .head()
    (r.getBoolean(0), r.getBoolean(1))
  }

  private def sq(x0: Long, y0: Long, x1: Long, y1: Long): Seq[(Long, Long)] =
    Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1))

  test("decision fixtures: crossing / touch / containment / shared vertex / disjoint") {
    val cases: Seq[(Seq[(Long, Long)], Seq[(Long, Long)], Boolean)] = Seq(
      (sq(0, 0, 4, 4), sq(2, 2, 6, 6), true),   // proper edge crossing
      (sq(0, 0, 4, 4), sq(1, 1, 2, 2), true),   // containment: no edge crossing
      (sq(0, 0, 2, 2), sq(2, 2, 4, 4), true),   // shared corner: collinear touch
      (sq(0, 0, 2, 2), sq(2, 0, 4, 2), true),   // shared full edge
      (sq(0, 0, 1, 1), sq(5, 5, 6, 6), false))  // disjoint
    cases.foreach { case (a, b, want) =>
      val (tpl, nat) = both(a, b)
      assert(tpl === want, s"template wrong on $a vs $b")
      assert(nat === want, s"native wrong on $a vs $b")
    }
  }

  test("degenerate 1-point ring: containment decided by the vertex arrays alone") {
    import org.apache.spark.sql.functions.col
    // The operator's edgesExpr (zip_with over slice) yields ZERO edges for a
    // 1-point ring, so only the separate vertex child can see the point.
    val b = sq(0, 0, 10, 10)
    def run(px: Long, py: Long): Boolean = spark.sql(
      s"""SELECT CAST(array() AS array<struct<x1:bigint,y1:bigint,x2:bigint,y2:bigint>>) AS aedges,
         |       array(named_struct('x', ${px}L, 'y', ${py}L)) AS averts,
         |       ${sqlEdges(b)} AS bedges, ${sqlVerts(b :+ b.head)} AS bverts""".stripMargin)
      .select(graft.functions.RingsIntersect(col("aedges"), col("averts"),
                                             col("bedges"), col("bverts")).as("nat"))
      .head().getBoolean(0)
    assert(run(5, 5) === true,   "interior point must pair by containment")
    assert(run(20, 20) === false, "exterior point must not pair")
  }

  test("native ≡ template on random self-intersecting rings (exact, all-Long)") {
    val rnd = new scala.util.Random(1234)
    def ring(n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
    // small coordinate range on purpose: forces frequent touches,
    // collinearity and containment — the degenerate branches
    (1 to 60).foreach { _ =>
      val a = ring(3 + rnd.nextInt(5)); val b = ring(3 + rnd.nextInt(5))
      val (tpl, nat) = both(a, b)
      assert(tpl === nat, s"divergence on $a vs $b: template=$tpl native=$nat")
    }
  }
}
