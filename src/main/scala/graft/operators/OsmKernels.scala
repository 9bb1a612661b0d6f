package graft.operators

import graft.{Caches, Gate, Q, T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.J — the reference's actual ETL, re-expressed as Spark
  * dataflow.
  *
  * What PgOSM Flex / osm2pgsql compute (`/root/reference/README.md:80-81`):
  * "ways get their geometry from member nodes and relations get their
  * geometry from member nodes and ways" — an ordered N-way id-equi-join —
  * plus tag-driven layer shredding (`README.md:93`) and dated weekly
  * snapshots (`/root/reference/osm_etl.py:13,45`).
  *
  * Oracle isomorphism (FIXTURES.md): `lineitem` is the exploded way-
  * membership table (way_id = l_orderkey, member position = l_linenumber,
  * node ref = l_partkey); `part` is the node store with
  * (p_size, p_retailprice) as (lon, lat); `orders per customer` stands in
  * for relation membership.
  *
  * Coordinates are held as integer centi-units (×100 longs) through every
  * fold: the path/bbox math is then exact integer arithmetic — associative
  * and order-independent, so results are stable under any repartitioning
  * (the same trick the Det decimal helpers pull for money).
  */
object OsmKernels {

  // Node store: dim-sized in the fixture (grows with distinct parts) so
  // it broadcasts and the fact-sized ref table never shuffles for the
  // resolve — but a REAL planet node store is itself fact-sized, so the
  // broadcast is size-GATED (graft.Gate): above budget the resolve
  // degrades to a shuffle join on node_id (same result; at planet scale
  // it would ride the bucketed layout, join_bucketed).
  private def nodes(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Gate.bcast(T.part(s, d).select(
      col("p_partkey").as("node_id"),
      (col("p_size").cast("long") * 100).as("lon_c"),
      round(col("p_retailprice") * 100).cast("long").as("lat_c")))

  /** One xy2d Hilbert bit-walk stage at plane size `s` (Wikipedia's
    * public-domain formulation), as (x', y', d') SQL over columns
    * x, y, d — IDENTICAL text in Spark and DuckDB: the only dialect
    * hazard, XOR, is spelled as a CASE ((3·rx)⊕ry ∈ {ry, 3−ry}), and
    * `&` / `*` / `-` are two's-complement-identical in both engines
    * including on the rotation's transient negative intermediates. */
  private[operators] def hilbertStage(s: Int): (String, String, String) = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    val xNew = s"(CASE WHEN (y & $s) > 0 THEN x WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END)"
    val yNew = s"(CASE WHEN (y & $s) > 0 THEN y WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END)"
    val dNew = s"(d + $s * $s * (CASE WHEN $rx = 1 THEN 3 - $ry ELSE $ry END))"
    (xNew, yNew, dNew)
  }

  /** The `osm_hilbert_index` DuckDB oracle: same grid mapping and the
    * same 8 [[hilbertStage]] texts chained as CTE stages h0..h7. */
  private[operators] def hilbertOracleSql: String = {
    val stages = (0 until 8).map { k =>
      val (xe, ye, de) = hilbertStage(128 >> k)
      val prev = if (k == 0) "h" else s"h${k - 1}"
      s"h$k AS (SELECT node_id, cell_x, cell_y, $xe AS x, $ye AS y, $de AS d FROM $prev)"
    }.mkString(",\n")
    s"""WITH n AS (
       |  SELECT p_partkey AS node_id,
       |         CAST(p_size AS BIGINT) * 100 AS lon_c,
       |         CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
       |  FROM part),
       |b AS (SELECT min(lon_c) AS lox, max(lon_c) AS hix,
       |             min(lat_c) AS loy, max(lat_c) AS hiy FROM n),
       |h AS (SELECT node_id,
       |             ((lon_c - lox) * 256) // (hix - lox + 1) AS cell_x,
       |             ((lat_c - loy) * 256) // (hiy - loy + 1) AS cell_y,
       |             ((lon_c - lox) * 256) // (hix - lox + 1) AS x,
       |             ((lat_c - loy) * 256) // (hiy - loy + 1) AS y,
       |             CAST(0 AS BIGINT) AS d
       |      FROM n, b),
       |$stages
       |SELECT node_id, CAST(cell_x AS BIGINT) AS cell_x,
       |       CAST(cell_y AS BIGINT) AS cell_y, CAST(d AS BIGINT) AS hilbert_d
       |FROM h7 ORDER BY node_id""".stripMargin
  }

  /** Bounded-depth resolution of relation→relation membership (VERDICT
    * r14 item 3; reference README.md:80-81 — relations get geometry
    * from member nodes and ways, transitively through member
    * RELATIONS). Takes `roots` as (root_id, rel_id) seed pairs and the
    * relation-member edge table (parent_id, child_id); returns the
    * (root_id, rel_id) closure down to `maxDepth` plus a per-root count
    * of members still expandable AT the bound — deeper nesting or a
    * membership cycle (real OSM data contains both) is REPORTED loudly,
    * never silently dropped and never looped on: the unrolled plan
    * terminates by construction. Scale shape: the relation-edge table
    * is relation-count-sized (tiny next to way/node membership — each
    * frontier join is a size-gated broadcast), the closure is a union
    * of ≤ maxDepth frontier joins, and each iteration re-aliases the
    * edge columns so the unrolled self-joins stay unambiguous.
    */
  private[graft] def nestedClosure(roots: org.apache.spark.sql.DataFrame,
                                   relEdges: org.apache.spark.sql.DataFrame,
                                   maxDepth: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    def edges = graft.Gate.bcast(relEdges.select(
      col("parent_id").as("__p"), col("child_id").as("__c")))
    var frontier = roots.select(col("root_id"), col("rel_id"))
    var closure = frontier
    for (_ <- 1 to maxDepth) {
      frontier = frontier.join(edges, col("rel_id") === col("__p"))
        .select(col("root_id"), col("__c").as("rel_id"))
      closure = closure.unionByName(frontier)
    }
    val unresolved = frontier.join(edges, col("rel_id") === col("__p"))
      .groupBy(col("root_id")).agg(count(lit(1)).as("n_unresolved"))
    // distinct: a diamond (one relation reachable through two member
    // chains) must contribute its geometry ONCE, as osm2pgsql's
    // assembly does — the closure is relation-count-sized, so the
    // dedup exchange is dim-table cost, not corpus cost.
    (closure.distinct(), unresolved)
  }

  /** Per-way CLOSED ring + exact shoelace sum — the shared assembly step
    * of the area operators (`osm_way_polygon_wkb`,
    * `osm_relation_multipolygon_wkb`). osm2pgsql's area rule: a way whose
    * first and last refs coincide is ring-shaped; here every way is
    * treated as an area candidate and the ring is closed by appending the
    * first point when needed (same regroup as `osm_way_geometry` — no new
    * shuffle). `shoe` is the signed shoelace sum in integer centi-units
    * (= 2·area·10⁴, positive = CCW): exact long arithmetic, so winding
    * and area are partition-order invariant AND bit-identical to the
    * DuckDB oracle's fold.
    */
  private def wayRings(s: org.apache.spark.sql.SparkSession, d: String) =
    T.lineitem(s, d)
      .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
              col("l_partkey").as("node_ref"))
      .join(nodes(s, d), col("node_ref") === col("node_id"))
      .groupBy(col("way_id"))
      .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      .withColumn("ring",
        expr("""IF(element_at(pts, 1).lon_c = element_at(pts, -1).lon_c
               |   AND element_at(pts, 1).lat_c = element_at(pts, -1).lat_c,
               |   pts, concat(pts, slice(pts, 1, 1)))""".stripMargin))
      // r19 opt: the shoelace fold ran as a zip_with + aggregate lambda
      // — interpreted per ring point for every wayRings consumer.
      // functions/RingShoe is the same exact-BIGINT sum fused into one
      // codegen'd pass (integer ops — equivalence is algebraic; family
      // A/B measured a wash at sf0.1, the regroup dominates — kept
      // because it strictly removes interpreted work and two array
      // slices per ring).
      .withColumn("shoe", graft.functions.RingShoe(col("ring")))

  /** cos(x) as an 8th-order Maclaurin polynomial — the geodesic keys'
    * latitude scale factor, deliberately NOT the engine's `cos`:
    * libm (DuckDB) and JVM trig differ in the last ulp, which would
    * flip rounding boundaries in the oracle hash. A polynomial over
    * IEEE multiply/add with identical literal coefficients and
    * identical association is bit-deterministic in BOTH engines.
    * |error| ≤ x¹⁰/10! ≈ 2.5e-5 on |x| ≤ π/2 (≈ 2.8 m per 100 km at
    * the worst latitude — SCALE.md documents the bound); the Horner
    * tail ends on the +x⁸ term, so the value stays ≥ 0 on the domain.
    */
  private def cosPoly(x: String): String = {
    val x2 = s"(($x) * ($x))"
    s"(1.0 + $x2 * (-0.5 + $x2 * (0.041666666666666664 + $x2 * " +
      s"(-0.001388888888888889 + $x2 * 2.48015873015873e-5))))"
  }

  /** sin/cos as degree-13/12 Maclaurin polynomials — the Web-Mercator
    * projection's trig, one order class tighter than [[cosPoly]] because
    * tan = sin/cos near 87.5° divides by a small cosine and amplifies
    * relative error: at the domain edge x = 1.5272 rad the truncation
    * is |Δsin| ≤ x¹⁵/15! ≈ 4.4e-10 and |Δcos| ≤ x¹⁴/14! ≈ 4.3e-9, so
    * tan's relative error ≤ 4.3e-9/cos(87.5°) ≈ 1e-7 — about 0.6 m of
    * Mercator northing at the ±85° clamp, centimeters at mid-latitudes
    * (SCALE.md). Identical literals + identical Horner association in
    * both engines ⇒ bit-identical IEEE results, same as [[cosPoly]].
    */
  private def mercSinPoly(x: String): String = {
    val x2 = s"(($x) * ($x))"
    s"(($x) * (1.0 + $x2 * (-0.16666666666666666 + $x2 * (0.008333333333333333 + $x2 * " +
      s"(-0.0001984126984126984 + $x2 * (2.755731922398589e-6 + $x2 * " +
      s"(-2.505210838544172e-8 + $x2 * 1.6059043836821613e-10)))))))"
  }
  private def mercCosPoly(x: String): String = {
    val x2 = s"(($x) * ($x))"
    s"(1.0 + $x2 * (-0.5 + $x2 * (0.041666666666666664 + $x2 * (-0.001388888888888889 + $x2 * " +
      s"(2.48015873015873e-5 + $x2 * (-2.7557319223985893e-7 + $x2 * 2.08767569878681e-9))))))"
  }

  /** Shared sub-expressions of `osm_project_mercator` — ONE string each,
    * spliced verbatim into the Spark expr AND the DuckDB CTE so the IEEE
    * dataflow is identical (see the key's comment for the derivation).
    */
  // π/4 + φ/2 in radians, from degrees: (45 + lat/2)·π/180
  private val mercU = "(45.0 + lat * 0.5) * 0.017453292519943295"
  // k = floor(log2(t / 0.75)) via boundary CASE; t ∈ [tan 2.5°, tan 87.5°]
  private val mercK =
    "CASE WHEN t < 0.046875 THEN -5.0 WHEN t < 0.09375 THEN -4.0 " +
    "WHEN t < 0.1875 THEN -3.0 WHEN t < 0.375 THEN -2.0 WHEN t < 0.75 THEN -1.0 " +
    "WHEN t < 1.5 THEN 0.0 WHEN t < 3.0 THEN 1.0 WHEN t < 6.0 THEN 2.0 " +
    "WHEN t < 12.0 THEN 3.0 ELSE 4.0 END"
  // 2^(−k) over the same branches — every factor exact binary
  private val mercScale =
    "CASE WHEN t < 0.046875 THEN 32.0 WHEN t < 0.09375 THEN 16.0 " +
    "WHEN t < 0.1875 THEN 8.0 WHEN t < 0.375 THEN 4.0 WHEN t < 0.75 THEN 2.0 " +
    "WHEN t < 1.5 THEN 1.0 WHEN t < 3.0 THEN 0.5 WHEN t < 6.0 THEN 0.25 " +
    "WHEN t < 12.0 THEN 0.125 ELSE 0.0625 END"
  // ln t = 2·atanh(z) + k·ln2, z = (m−1)/(m+1) ∈ [−1/7, 1/5)
  private val mercLn =
    "2.0 * (z * (1.0 + (z * z) * (0.3333333333333333 + (z * z) * (0.2 + (z * z) * " +
    "(0.14285714285714285 + (z * z) * 0.1111111111111111))))) + kk * 0.6931471805599453"

  /** Exact integer segment-intersection predicate over 8 coordinate
    * accessor strings — the classic 4-orientation test plus the four
    * collinear-touch cases (endpoint on the other segment). All cross
    * products are BIGINT (|Δlon·Δlat| ≤ 5e3·2.1e5 ≈ 1e9), so the verdict
    * is exact and bit-identical in both engines; shared-boundary touches
    * count as intersecting, consistently. Rendered ONCE and spliced into
    * the Spark `exists` and the DuckDB `list_filter` wrappers verbatim.
    */
  private[graft] def segInt(ax1: String, ay1: String, ax2: String, ay2: String,
                     bx1: String, by1: String, bx2: String, by2: String): String = {
    def orient(ox: String, oy: String, px: String, py: String, qx: String, qy: String) =
      s"(($px - $ox) * ($qy - $oy) - ($py - $oy) * ($qx - $ox))"
    val d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    val d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    def onSeg(px: String, py: String, sx1: String, sy1: String, sx2: String, sy2: String) =
      s"($px >= least($sx1, $sx2) AND $px <= greatest($sx1, $sx2) AND " +
      s"$py >= least($sy1, $sy2) AND $py <= greatest($sy1, $sy2))"
    s"(((($d1 > 0 AND $d2 < 0) OR ($d1 < 0 AND $d2 > 0)) AND " +
      s"(($d3 > 0 AND $d4 < 0) OR ($d3 < 0 AND $d4 > 0))) OR " +
      s"($d1 = 0 AND ${onSeg(ax1, ay1, bx1, by1, bx2, by2)}) OR " +
      s"($d2 = 0 AND ${onSeg(ax2, ay2, bx1, by1, bx2, by2)}) OR " +
      s"($d3 = 0 AND ${onSeg(bx1, by1, ax1, ay1, ax2, ay2)}) OR " +
      s"($d4 = 0 AND ${onSeg(bx2, by2, ax1, ay1, ax2, ay2)}))"
  }

  /** One crossing-number term (0/1) of point (px, py) against the edge
    * struct `e` (fields x1/y1/x2/y2) — the same formulation as the
    * `osm_point_in_polygon` oracle lambda, shared verbatim cross-engine.
    */
  private[graft] def insideCase(px: String, py: String, e: String): String =
    s"CASE WHEN ($e.y1 > $py) <> ($e.y2 > $py) AND " +
      s"(($e.x1 - $px) * ($e.y2 - $e.y1) + ($e.x2 - $e.x1) * ($py - $e.y1)) * ($e.y2 - $e.y1) > 0 " +
      s"THEN 1 ELSE 0 END"

  /** `osm_poly_clip_area`'s per-edge kernel: the directed integral of the
    * edge's winding contribution CLIPPED to the rectangle [rx0,rx1]×
    * [ry0,ry1] (columns in scope):
    *   I_e = ∫_{x∈[x1→x2] ∩ [rx0,rx1]} (clamp(y_e(x), ry0, ry1) − ry0) dx
    * evaluated in closed form via the antiderivative F of
    * f(y) = max(0, min(y, ry1) − ry0):
    *   F(u) = (clamp(u,ry0,ry1) − ry0)²/2 + (ry1−ry0)·max(0, u−ry1),
    *   I_e = (F(y(x_b)) − F(y(x_a))) / m    (m = dy/dx, direction-aware)
    * with vertical edges contributing 0 and horizontal edges the exact
    * integer width × clamped height. Summed over the closed ring the I_e
    * telescope to the winding measure of P over the rectangle — the
    * self-check Σ_tiles S = −shoe/2 holds to 1 ulp on every fixture way.
    * One rational division per edge in doubles; the template is spliced
    * verbatim into BOTH engines, so every IEEE intermediate agrees.
    */
  private[graft] def clipTrapTerm(e: String): String = {
    val lo = s"greatest(rx0, least($e.x1, $e.x2))"
    val hi = s"least(rx1, greatest($e.x1, $e.x2))"
    val m  = s"(CAST($e.y2 - $e.y1 AS DOUBLE) / CAST($e.x2 - $e.x1 AS DOUBLE))"
    val xa = s"(CASE WHEN $e.x2 > $e.x1 THEN $lo ELSE $hi END)"
    val xb = s"(CASE WHEN $e.x2 > $e.x1 THEN $hi ELSE $lo END)"
    def yAt(x: String) = s"(CAST($e.y1 AS DOUBLE) + $m * CAST($x - $e.x1 AS DOUBLE))"
    def bigF(u: String) = {
      val v = s"least(greatest($u, CAST(ry0 AS DOUBLE)), CAST(ry1 AS DOUBLE))"
      s"(($v - CAST(ry0 AS DOUBLE)) * ($v - CAST(ry0 AS DOUBLE)) * 0.5 + " +
        s"CAST(ry1 - ry0 AS DOUBLE) * greatest(0.0, $u - CAST(ry1 AS DOUBLE)))"
    }
    s"CASE WHEN $e.x1 = $e.x2 THEN 0.0 " +
      s"WHEN $lo >= $hi THEN 0.0 " +
      s"WHEN $e.y1 = $e.y2 THEN CAST($xb - $xa AS DOUBLE) * " +
      s"CAST(greatest(CAST(0 AS BIGINT), least($e.y1, ry1) - ry0) AS DOUBLE) " +
      s"ELSE (${bigF(yAt(xb))} - ${bigF(yAt(xa))}) / $m END"
  }

  /** `osm_poly_pair_area`'s one-sided boundary integral: over the edges
    * of one ring (`edges`, lambda var `ea`), the directed measure
    *   Σ_e (x1·y2 − y1·x2) · ∫_{t∈[0,1]} w_other(e(t)) dt
    * where w_other is the WINDING NUMBER of the other ring (`others`,
    * lambda var `eb`) at the point. Along a straight edge the 1-form
    * x dy − y dx is CONSTANT (= the endpoint cross product), so the
    * integral needs only the Lebesgue measure of each winding level:
    * split [0,1] at every crossing parameter t = t_num/den with the
    * other ring's edges (conditions decided in EXACT BIGINT — products
    * ≤ 1.4e18, inside 63 bits), sort, and weight each sub-interval by
    * the winding number of its midpoint (signed upward/downward
    * crossing rule, evaluated in doubles on the exact-integer edges).
    * Summing this pass for BOTH rings gives exactly 2·∬ w_A·w_B dx dy
    * (Green's theorem applied to the arrangement; verified on offset
    * squares, containment, bowtie and disjoint fixtures in
    * PolyPairAreaSpec) — the ST_Intersection ring∩ring AREA, winding
    * semantics, with NO vertex clipping and NO rational coordinates.
    * All float folds are left-associated in array order and every
    * literal/cast is shared between the Spark and DuckDB renderings, so
    * the doubles agree bit-for-bit cross-engine.
    */
  private[graft] def pairPass(duck: Boolean, edges: String, others: String): String = {
    def bd(x: String) = s"CAST($x AS BIGINT)"
    val dax = bd("ea.x2 - ea.x1"); val day = bd("ea.y2 - ea.y1")
    val dbx = bd("eb.x2 - eb.x1"); val dby = bd("eb.y2 - eb.y1")
    val den = s"($dax * $dby - $day * $dbx)"
    val tn  = s"(${bd("eb.x1 - ea.x1")} * $dby - ${bd("eb.y1 - ea.y1")} * $dbx)"
    val un  = s"(${bd("eb.x1 - ea.x1")} * $day - ${bd("eb.y1 - ea.y1")} * $dax)"
    // sign agreement instead of `tn * den >= 0`: the PRODUCT of two
    // cross products can wrap BIGINT at wider coordinate domains (Spark
    // would wrap silently, DuckDB would error — divergent either way);
    // the factors themselves stay inside 63 bits. Identical text both
    // renderings, so cross-engine parity is preserved by construction.
    val cond = s"$den <> 0 AND " +
      s"($tn = 0 OR (($tn > 0) = ($den > 0) AND abs($tn) <= abs($den))) AND " +
      s"($un = 0 OR (($un > 0) = ($den > 0) AND abs($un) <= abs($den)))"
    val tval = s"(CAST($tn AS DOUBLE) / CAST($den AS DOUBLE))"
    val ts =
      if (duck) s"list_sort(list_transform(list_filter($others, eb -> $cond), eb -> $tval))"
      else s"array_sort(transform(filter($others, eb -> $cond), eb -> $tval))"
    val ts2 =
      if (duck) s"list_concat(list_prepend(0.0, $ts), [1.0])"
      else s"concat(array(CAST(0.0 AS DOUBLE)), $ts, array(CAST(1.0 AS DOUBLE)))"
    // winding number of the midpoint of [t1, t2] along edge `ea` w.r.t.
    // `others`: signed crossing rule, all-double arithmetic on exactly
    // converted integers (identical promotion both engines)
    def ival(t1: String, t2: String): String = {
      val mid = s"((($t1) + ($t2)) * 0.5)"
      val px = s"(CAST(ea.x1 AS DOUBLE) + $mid * CAST(ea.x2 - ea.x1 AS DOUBLE))"
      val py = s"(CAST(ea.y1 AS DOUBLE) + $mid * CAST(ea.y2 - ea.y1 AS DOUBLE))"
      val lft = s"(CAST(eb.x2 - eb.x1 AS DOUBLE) * ($py - CAST(eb.y1 AS DOUBLE)) - " +
        s"CAST(eb.y2 - eb.y1 AS DOUBLE) * ($px - CAST(eb.x1 AS DOUBLE)))"
      val wcase = s"CASE WHEN CAST(eb.y1 AS DOUBLE) <= $py AND CAST(eb.y2 AS DOUBLE) > $py " +
        s"AND $lft > 0.0 THEN 1.0 " +
        s"WHEN CAST(eb.y2 AS DOUBLE) <= $py AND CAST(eb.y1 AS DOUBLE) > $py " +
        s"AND $lft < 0.0 THEN -1.0 ELSE 0.0 END"
      val wind =
        if (duck) s"list_reduce(list_prepend(0.0, list_transform($others, eb -> $wcase)), (wa, wb) -> wa + wb)"
        else s"aggregate($others, CAST(0.0 AS DOUBLE), (wacc, eb) -> wacc + $wcase)"
      s"((($t2) - ($t1)) * $wind)"
    }
    val measure =
      if (duck)
        s"list_reduce(list_prepend(0.0, list_transform(range(1, len($ts2)), " +
          s"ii -> ${ival(s"($ts2)[ii]", s"($ts2)[ii+1]")})), (ma, mb) -> ma + mb)"
      else
        s"aggregate(zip_with(slice($ts2, 1, size($ts2) - 1), slice($ts2, 2, size($ts2) - 1), " +
          s"(t1, t2) -> ${ival("t1", "t2")}), CAST(0.0 AS DOUBLE), (macc, mx) -> macc + mx)"
    val crossPQ = s"CAST(${bd("ea.x1")} * ${bd("ea.y2")} - ${bd("ea.y1")} * ${bd("ea.x2")} AS DOUBLE)"
    if (duck)
      s"list_reduce(list_prepend(0.0, list_transform($edges, ea -> $crossPQ * $measure)), (pa, pb) -> pa + pb)"
    else
      s"aggregate($edges, CAST(0.0 AS DOUBLE), (acc, ea) -> acc + $crossPQ * $measure)"
  }

  /** WGS84-ellipsoid-corrected equirectangular segment length in
    * centi-units — same TEMPLATE rendered for both engines (only the
    * array/field accessors differ), so the expression trees and
    * therefore every IEEE intermediate agree bit-for-bit.
    * 8.726646259971648e-5 = (π/180) / 100 / 2: centi-unit lat SUM →
    * mid-latitude in radians in one multiply.
    *
    * The spherical kernel (radius a everywhere) overstated equatorial
    * meridians by +0.674% and understated polar parallels by −0.32%
    * (the measured band table in SCALE.md / tools/spheroid_error.py).
    * The r15-verdict item-8 upgrade scales each leg by its true local
    * WGS84 radius, as degree-2 shared-literal polynomials in
    * s² = sin²(mid-lat) = 1 − cos²(mid-lat):
    *   Δlon leg ×  N(φ)/a = (1 − e²s²)^(−1/2)  ≈ 1 + (e²/2)s² + (3e⁴/8)s⁴
    *   Δlat leg ×  M(φ)/a = (1−e²)(1 − e²s²)^(−3/2)
    *                        ≈ (1−e²)(1 + (3e²/2)s² + (15e⁴/8)s⁴)
    * with e² = f(2−f) = 0.0066943799901413165 (f = 1/298.257223563,
    * the published WGS84 flattening). Truncation ≤ (35/16)e⁶ ≈ 6.5e-7
    * relative — three orders below cosPoly's own 2.5e-5 bound, so the
    * residual error is projection-only (0.006% measured worst
    * band/shape, was 0.674%). Same bit-determinism rule as [[cosPoly]]: identical
    * literals + identical Horner association in both engines, never
    * libm pow/sqrt on the factor path (the one sqrt is the final
    * hypotenuse, correctly rounded IEEE in both engines).
    */
  /** The two per-segment WGS84 scale factors as expression-template
    * strings over a latitude-SUM (two centi-unit latitudes added):
    * f1 = cos(mid-lat)·N(φ)/a (the Δlon leg), f2 = M(φ)/a (the Δlat
    * leg). Split out of [[geoSeg]] so a caller on a PAIR STREAM (the
    * dwithin probe) can precompute them over the 36 001 possible
    * integer latitude sums as a broadcast factor DIMENSION instead of
    * inlining ~200 flops per candidate pair — Catalyst substitutes a
    * projected alias into the join residual AND the downstream project,
    * and the resulting generated method exceeds HotSpot's JIT size
    * limit, leaving the hot loop interpreted (measured 21× on
    * `osm_dwithin_count` before the factoring). Values are bit-equal to
    * the inline form by construction: same literals, same association —
    * [[geoSeg]] deliberately multiplies `dlon * (f1)`, never
    * `(dlon * c) * nf`, so factored and inline evaluation share the
    * exact IEEE op sequence. */
  private[graft] def geoFactors(latSum: String): (String, String) = {
    val x = s"(CAST($latSum AS DOUBLE) * 8.726646259971648e-5)"
    val c = cosPoly(x)
    val s2 = s"(1.0 - $c * $c)"
    val nf = s"(1.0 + $s2 * (0.0033471899950706582 + $s2 * 1.680552129465167e-5))"
    val mf = s"(0.9933056200098587 + $s2 * (0.009974347900033367 + $s2 * 8.34650937458643e-5))"
    (s"($c * $nf)", mf)
  }

  private[graft] def geoSeg(dlon: String, dlat: String, latSum: String): String = {
    val (f1, f2) = geoFactors(latSum)
    val dx = s"(CAST($dlon AS DOUBLE) * $f1)"
    val dy = s"(CAST($dlat AS DOUBLE) * $f2)"
    s"sqrt($dx * $dx + $dy * $dy)"
  }

  /** Ellipsoid-corrected area scale at reference latitude x (radians):
    * cos(φ)·M(φ)N(φ)/a² — the true WGS84 area element over the
    * spherical a²cos(φ) one. M·N/a² = (1−e²)(1−e²s²)^(−2)
    * ≈ (1−e²)(1 + 2e²s² + 3e⁴s⁴) as a degree-2 shared-literal
    * polynomial in s² = 1 − cos²(φ); truncation ≤ 4e⁶ ≈ 1.2e-6
    * relative. Same shared-template bit-determinism rule as [[geoSeg]].
    */
  private[graft] def geoAreaScale(x: String): String = {
    val c = cosPoly(x)
    val s2 = s"(1.0 - $c * $c)"
    s"($c * (0.9933056200098587 + $s2 * (0.013299130533377824 + $s2 * 0.00013354414999338287)))"
  }

  /** DuckDB mirror of [[wayRings]]: closed per-way coordinate lists +
    * the same exact integer shoelace sum, shared by both area oracles.
    */
  private val duckRingsCte =
    """pts AS (
      |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
      |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |ways AS (
      |  SELECT way_id,
      |         list(lon_c ORDER BY pos, node_ref) AS lons,
      |         list(lat_c ORDER BY pos, node_ref) AS lats
      |  FROM pts GROUP BY way_id),
      |closed AS (
      |  SELECT way_id,
      |         CASE WHEN lons[1] = lons[-1] AND lats[1] = lats[-1]
      |              THEN lons ELSE list_append(lons, lons[1]) END AS clons,
      |         CASE WHEN lons[1] = lons[-1] AND lats[1] = lats[-1]
      |              THEN lats ELSE list_append(lats, lats[1]) END AS clats
      |  FROM ways),
      |rings AS (
      |  SELECT way_id, clons, clats,
      |         CAST(coalesce(list_sum(list_transform(range(2, len(clons) + 1),
      |                i -> clons[i-1] * clats[i] - clons[i] * clats[i-1])), 0) AS BIGINT) AS shoe
      |  FROM closed)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "osm_way_geometry",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (
        |  SELECT way_id,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats
        |  FROM pts GROUP BY way_id)
        |SELECT way_id,
        |       len(lons) AS n_points,
        |       lons[1] / 100.0 AS first_lon, lats[1] / 100.0 AS first_lat,
        |       lons[-1] / 100.0 AS last_lon, lats[-1] / 100.0 AS last_lat,
        |       CAST(coalesce(list_sum(list_transform(range(2, len(lons) + 1),
        |              i -> abs(lons[i] - lons[i-1]) + abs(lats[i] - lats[i-1]))), 0) AS DOUBLE) / 100.0 AS path_len
        |FROM ways
        |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // resolve ordered refs → points → regroup → fold to a linestring
      // summary. collect_list has NO post-shuffle order guarantee: the
      // array_sort(struct(pos, …)) idiom pins member order (§7.3).
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .select(
          col("way_id"),
          size(col("pts")).cast("long").as("n_points"),
          (element_at(col("pts"), 1).getField("lon_c") / 100.0).as("first_lon"),
          (element_at(col("pts"), 1).getField("lat_c") / 100.0).as("first_lat"),
          (element_at(col("pts"), -1).getField("lon_c") / 100.0).as("last_lon"),
          (element_at(col("pts"), -1).getField("lat_c") / 100.0).as("last_lat"),
          // r20 opt: the manhattan segment fold ran as a zip_with +
          // aggregate() lambda (interpreted per segment); PathManhattan
          // is the same exact-BIGINT sum as one codegen'd pass.
          (graft.functions.PathFolds.manhattan(col("pts")) / 100.0).as("path_len"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_way_length_m",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (
        |  SELECT way_id,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats
        |  FROM pts GROUP BY way_id)
        |SELECT way_id,
        |       len(lons) AS n_points,
        |       len(lons) - 1 AS n_segments,
        |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(2, len(lons) + 1), i ->
        |           sqrt(CAST((lons[i] - lons[i-1]) * (lons[i] - lons[i-1])
        |                   + (lats[i] - lats[i-1]) * (lats[i] - lats[i-1]) AS DOUBLE)))),
        |         (a, b) -> a + b) * 1113.2, 1) AS length_m
        |FROM ways
        |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // Way length in METERS — the first real-unit geometry measure a
      // user of the PostGIS layers expects (ST_Length on the way table).
      // Scaled-plane metric, chosen over haversine DELIBERATELY: each
      // segment is sqrt(exact-integer Δlon² + Δlat²) — IEEE requires
      // sqrt to be correctly rounded, so the per-segment doubles are
      // BIT-IDENTICAL across engines, unlike libm-vs-JVM trig which
      // drifts in the last ulp and would flip rounding boundaries. The
      // fold is left-to-right in both engines (emb_normalize's proven
      // list_reduce mirror), the 1113.2 m-per-centi-unit factor
      // (0.01° ≈ 1.1132 km at the equator) is one literal multiply, and
      // only the FINAL value rounds. Same single regroup shuffle as
      // osm_way_geometry — length is a per-row array fold, codegen'd.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .select(
          col("way_id"),
          size(col("pts")).cast("long").as("n_points"),
          (size(col("pts")) - 1).cast("long").as("n_segments"),
          // r20 opt: fused euclid fold (PathEuclid) — same exact-BIGINT
          // Δ² sum, one cast, correctly rounded sqrt, left-assoc double
          // accumulation as the lambda it replaces; codegen'd.
          round(graft.functions.PathFolds.euclid(col("pts")) * 1113.2, 1)
            .as("length_m"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_length_by_class",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (
        |  SELECT way_id,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats
        |  FROM pts GROUP BY way_id),
        |lens AS (
        |  SELECT way_id,
        |         CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(2, len(lons) + 1), i ->
        |             sqrt(CAST((lons[i] - lons[i-1]) * (lons[i] - lons[i-1])
        |                     + (lats[i] - lats[i-1]) * (lats[i] - lats[i-1]) AS DOUBLE)))),
        |           (a, b) -> a + b) * 1113.2, 1) AS DECIMAL(18,1)) AS length_m
        |  FROM ways)
        |SELECT o_orderpriority AS highway_class,
        |       count(*) AS n_ways,
        |       round(CAST(sum(length_m) AS DOUBLE) / 1000, 3) AS total_km
        |FROM lens JOIN orders ON way_id = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY highway_class""".stripMargin
    ) { (s, d) =>
      // "Total km per road class" — THE serving query a PostGIS layer
      // table exists for (ST_Length + GROUP BY highway). Class rides the
      // way's order row (the fixture's tag table). The determinism move
      // is in the ROLLUP: per-way lengths are doubles whose cross-way
      // float sum would drift with aggregation order, so each way's
      // 0.1 m-rounded length is cast to DECIMAL(18,1) FIRST — the class
      // totals are then exact decimal sums, order- and
      // partitioning-invariant, divided once at output. Same single
      // regroup as the length kernel; the class tag joins broadcast;
      // the rollup aggregates |ways| rows on a bounded key.
      val lens = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .select(col("way_id"),
          // r20 opt: same fused euclid fold as osm_way_length_m
          round(graft.functions.PathFolds.euclid(col("pts")) * 1113.2, 1)
            .cast("decimal(18,1)").as("length_m"))
      val cls = T.orders(s, d)
        .select(col("o_orderkey").as("way_id"), col("o_orderpriority").as("highway_class"))
      lens.join(graft.Gate.bcast(cls), "way_id")
        .groupBy(col("highway_class"))
        .agg(count(lit(1)).as("n_ways"),
             round(sum(col("length_m")).cast("double") / 1000, 3).as("total_km"))
        .orderBy(col("highway_class"))
    },

    Q(
      "osm_way_bearing",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (
        |  SELECT way_id,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats
        |  FROM pts GROUP BY way_id),
        |segs AS (
        |  SELECT way_id,
        |         unnest(list_transform(range(2, len(lons) + 1),
        |                i -> {dx: lons[i] - lons[i-1], dy: lats[i] - lats[i-1]})) AS s
        |  FROM ways),
        |nrm AS (
        |  SELECT way_id,
        |         CASE WHEN s.dy < 0 OR (s.dy = 0 AND s.dx < 0) THEN -s.dx ELSE s.dx END AS ndx,
        |         abs(s.dy) AS ndy
        |  FROM segs
        |  WHERE NOT (s.dx = 0 AND s.dy = 0)),
        |cls AS (
        |  SELECT way_id,
        |         CASE WHEN 12 * ndy < 5 * abs(ndx) THEN 'E-W'
        |              WHEN 5 * ndy > 12 * abs(ndx) THEN 'N-S'
        |              WHEN ndx > 0 THEN 'NE-SW'
        |              ELSE 'NW-SE' END AS orientation
        |  FROM nrm),
        |cnt AS (
        |  SELECT o_orderpriority AS highway_class, orientation,
        |         count(*) AS n_segments
        |  FROM cls JOIN orders ON way_id = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT highway_class, orientation, n_segments,
        |       CAST((1000000 * n_segments) // sum(n_segments) OVER (PARTITION BY highway_class)
        |            AS BIGINT) AS share_ppm
        |FROM cnt
        |ORDER BY highway_class, orientation""".stripMargin
    ) { (s, d) =>
      // Street-grid ORIENTATION histogram — the classic OSM urban-form
      // analysis ("does this city grid run N-S or diagonal?"): each way
      // segment classified into one of four undirected orientation bins
      // (E-W, NE-SW, N-S, NW-SE), counted per highway class with a
      // per-class ppm share. The determinism move: NO trig at all —
      // a segment (dx, dy) is first direction-folded into the upper
      // half-plane (dy<0, or dy=0 ∧ dx<0, negates both — undirected
      // bearings live in [0°,180°)), then binned by exact INTEGER
      // cross-multiplication against the rational boundary slopes 5/12
      // and 12/5 (tan 22.5° = 0.414 ≈ 5/12, tan 67.5° = 2.414 ≈ 12/5 —
      // a documented ±0.57° convention that keeps every comparison
      // exact BIGINT, bit-identical in both engines, where atan2 would
      // ride libm). Boundary rule pinned: a segment exactly ON the
      // rational slope goes to the diagonal bin (both tests strict).
      // Zero-length segments (duplicate nodes — an OSM data reality)
      // are excluded before binning. Plan shape: the same single
      // way-regroup as every length kernel, then the FOUR bin counts
      // fold per way INSIDE the array aggregate (one 4-long struct per
      // way — no segment explode, so the class join probes |ways| rows,
      // not |segments|) → broadcast class join → bounded-key sum →
      // stack to rows; share_ppm is exact integer division over a
      // |classes×4|-row window — driver-cheap, never a funnel. The
      // in-fold rule is the same integer classification: for the E-W /
      // N-S bands normalization cancels (both compare |dy| to |dx|),
      // and on the diagonal band (dx≠0 ∧ dy≠0 by elimination) the
      // folded ndx > 0 test reduces to dx·dy > 0.
      val cls = T.orders(s, d)
        .select(col("o_orderkey").as("way_id"), col("o_orderpriority").as("highway_class"))
      val perWay = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        // r19 opt: the 4-bin segment classification ran as a zip_with +
        // aggregate() lambda — interpreted per segment (higher-order
        // lambdas never enter codegen). functions/BearingBins is the
        // same exact-BIGINT rule (zero-length skip, 12·|dy| < 5·|dx| →
        // E-W, 5·|dy| > 12·|dx| → N-S, sign(dx·dy) for the diagonals)
        // as one fused codegen'd pass over the sorted point array.
        .select(col("way_id"), graft.functions.BearingBins(col("pts")).as("c"))
      val cnt = perWay
        .join(graft.Gate.bcast(cls), "way_id")
        .groupBy(col("highway_class"))
        .agg(sum(col("c.ew")).as("ew"), sum(col("c.ns")).as("ns"),
             sum(col("c.ne")).as("ne"), sum(col("c.nw")).as("nw"))
        .selectExpr("highway_class",
          "stack(4, 'E-W', ew, 'N-S', ns, 'NE-SW', ne, 'NW-SE', nw) AS (orientation, n_segments)")
        .where(col("n_segments") > 0)
      cnt
        .withColumn("share_ppm",
          expr("(1000000 * n_segments) DIV sum(n_segments) OVER (PARTITION BY highway_class)"))
        .orderBy(col("highway_class"), col("orientation"))
    },

    Q(
      "osm_way_sinuosity",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (
        |  SELECT way_id,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats
        |  FROM pts GROUP BY way_id),
        |m AS (
        |  SELECT way_id, len(lons) - 1 AS n_segments,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(2, len(lons) + 1), i ->
        |             sqrt(CAST((lons[i] - lons[i-1]) * (lons[i] - lons[i-1])
        |                     + (lats[i] - lats[i-1]) * (lats[i] - lats[i-1]) AS DOUBLE)))),
        |           (a, b) -> a + b) AS path,
        |         sqrt(CAST((lons[-1] - lons[1]) * (lons[-1] - lons[1])
        |                 + (lats[-1] - lats[1]) * (lats[-1] - lats[1]) AS DOUBLE)) AS chord
        |  FROM ways)
        |SELECT way_id, n_segments,
        |       CASE WHEN chord = 0 THEN NULL ELSE round(path / chord, 4) END AS sinuosity,
        |       CASE WHEN chord = 0 THEN 'CLOSED'
        |            WHEN round(path / chord, 4) < 1.05 THEN 'STRAIGHT'
        |            WHEN round(path / chord, 4) < 1.25 THEN 'WINDING'
        |            ELSE 'TORTUOUS' END AS shape_class
        |FROM m
        |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // Way SINUOSITY — path length over endpoint chord, the road-
      // curviness measure (1 = perfectly straight; mountain switchbacks
      // run 2+): the route-quality attribute navigation/safety consumers
      // derive from the PostGIS way layer. Scale-INVARIANT by
      // construction, so the planar centi-unit doubles divide directly —
      // no meter factor, no trig, and both path and chord are the
      // established correctly-rounded-sqrt/order-pinned-fold recipes, so
      // the ratio is bit-identical cross-engine before its final-only
      // 4-dp round (magnitude ~1 ⇒ ULP 2e-16 against a 5e-5 boundary —
      // the r13 rounding rule holds with 11 orders to spare). The class
      // label compares the ROUNDED value to exact decimal literals, so
      // label and printed ratio can never disagree. Closed/degenerate
      // ways (chord = 0 — loops are routine OSM data) are REPORTED as
      // their own class, never divided through. Same single way-regroup
      // as every length kernel; everything after is per-row arithmetic.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .withColumn("n_segments", (size(col("pts")) - 1).cast("long"))
        // r20 opt: same fused euclid fold as osm_way_length_m
        .withColumn("path", graft.functions.PathFolds.euclid(col("pts")))
        .withColumn("chord",
          expr("""sqrt(CAST((element_at(pts, -1).lon_c - element_at(pts, 1).lon_c)
                 |         * (element_at(pts, -1).lon_c - element_at(pts, 1).lon_c)
                 |         + (element_at(pts, -1).lat_c - element_at(pts, 1).lat_c)
                 |         * (element_at(pts, -1).lat_c - element_at(pts, 1).lat_c) AS DOUBLE))"""
            .stripMargin))
        .select(col("way_id"), col("n_segments"),
          expr("CASE WHEN chord = 0 THEN NULL ELSE round(path / chord, 4) END").as("sinuosity"),
          expr("""CASE WHEN chord = 0 THEN 'CLOSED'
                 |     WHEN round(path / chord, 4) < 1.05 THEN 'STRAIGHT'
                 |     WHEN round(path / chord, 4) < 1.25 THEN 'WINDING'
                 |     ELSE 'TORTUOUS' END""".stripMargin).as("shape_class"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_way_length_geodesic",
      s"""WITH pts AS (
         |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
         |         p_size * 100 AS lon_c,
         |         CAST(round(p_retailprice * 100) AS BIGINT) % 18000 - 9000 AS vlat_c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |ways AS (
         |  SELECT way_id,
         |         list(lon_c ORDER BY pos, node_ref) AS lons,
         |         list(vlat_c ORDER BY pos, node_ref) AS vlats
         |  FROM pts GROUP BY way_id)
         |SELECT way_id,
         |       len(lons) AS n_points,
         |       len(lons) - 1 AS n_segments,
         |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |         list_transform(range(2, len(lons) + 1), i ->
         |           ${geoSeg("(lons[i] - lons[i-1])", "(vlats[i] - vlats[i-1])",
                              "(vlats[i-1] + vlats[i])")})),
         |         (a, b) -> a + b) * 1113.2, 1) AS length_m
         |FROM ways
         |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // GEODESIC way length — the SRID-aware measure VERDICT r12 item 3
      // asked for. The planar osm_way_length_m treats 0.01° of longitude
      // as 1113.2 m everywhere; real parallels shrink by cos(lat), so at
      // 60°N the planar number is 2× too long (PostGIS's geography
      // measures get this right, README.md:80-82). Equirectangular-with-
      // cos(mid-latitude) per segment, each leg further scaled by its
      // local WGS84 radius (N(φ)/a for Δlon, M(φ)/a for Δlat — the r15
      // item-8 flattening correction, see [[geoSeg]]): measured worst
      // band error 0.006% vs Vincenty WGS84 (was 0.674% on the pure
      // sphere, tools/spheroid_error.py), and bit-deterministic
      // cross-engine because every trig/radius factor is a shared
      // literal polynomial, never libm (SCALE.md documents the bounds). The fixture's synthetic lat_c overflows ±90°, so the
      // key folds it into the valid band ([lat_c % 18000] - 9000) BEFORE
      // measuring — same exact integer map in both engines. Same single
      // regroup shuffle as osm_way_length_m; the per-segment polynomial
      // is codegen'd arithmetic inside one whole-stage span.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .withColumn("vlat_c", col("lat_c") % 18000 - 9000)
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, vlat_c)))").as("pts"))
        .select(
          col("way_id"),
          size(col("pts")).cast("long").as("n_points"),
          (size(col("pts")) - 1).cast("long").as("n_segments"),
          // r20 opt: fused geoSeg fold (PathGeodesic) — the per-segment
          // WGS84 polynomial bit-mirrored op-for-op from [[geoSeg]];
          // codegen'd instead of the interpreted aggregate() lambda.
          round(graft.functions.PathFolds.geodesic(col("pts")) * 1113.2, 1)
            .as("length_m"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_way_area_geodesic",
      s"""WITH pts AS (
         |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref,
         |         p_size * 100 AS lon_c,
         |         CAST(round(p_retailprice * 100) AS BIGINT) % 18000 - 9000 AS vlat_c
         |  FROM pts_src),
         |ways AS (
         |  SELECT way_id,
         |         list(lon_c ORDER BY pos, node_ref) AS lons,
         |         list(vlat_c ORDER BY pos, node_ref) AS vlats
         |  FROM pts GROUP BY way_id),
         |closed AS (
         |  SELECT way_id, vlats,
         |         CASE WHEN lons[1] = lons[-1] AND vlats[1] = vlats[-1]
         |              THEN lons ELSE list_append(lons, lons[1]) END AS clons,
         |         CASE WHEN lons[1] = lons[-1] AND vlats[1] = vlats[-1]
         |              THEN vlats ELSE list_append(vlats, vlats[1]) END AS clats
         |  FROM ways),
         |rings AS (
         |  SELECT way_id, vlats, len(clons) AS nrp,
         |         CAST(coalesce(list_sum(list_transform(range(2, len(clons) + 1),
         |                i -> clons[i-1] * clats[i] - clons[i] * clats[i-1])), 0) AS BIGINT) AS shoe
         |  FROM closed)
         |SELECT way_id,
         |       nrp AS n_ring_points,
         |       round((CAST(list_sum(vlats) AS DOUBLE) / CAST(len(vlats) AS DOUBLE)) * 0.01, 4) AS lat_ref,
         |       round(CAST(abs(shoe) AS DOUBLE) * 619667.12 * ${geoAreaScale(
             "((CAST(list_sum(vlats) AS DOUBLE) / CAST(len(vlats) AS DOUBLE)) * 1.7453292519943295e-4)")} / 1e6, 1) AS area_km2
         |FROM rings
         |ORDER BY way_id""".stripMargin
        .replace("FROM pts_src",
          "FROM lineitem JOIN part ON l_partkey = p_partkey")
    ) { (s, d) =>
      // GEODESIC ring area: the exact integer shoelace (same fold as
      // osm_way_area_m2, but over the ±90°-folded latitude) scaled by
      // cos(mean ring latitude) · M·N/a² — the equirectangular area
      // correction (parallels shrink by cos(lat)) times the WGS84
      // ellipsoid area-element factor (geoAreaScale; r15 item 8 — the
      // sphere-radius term dominated the measured error table before).
      // The reference latitude is the ring's vertex MEAN: an exact
      // integer sum divided by an exact count, one IEEE division —
      // deterministic, unlike any centroid needing its own rounding.
      // Shoelace stays exact-integer; ONE double product chain at the
      // end (abs(shoe) → ×619667.12 → ×geoAreaScale), so the oracle
      // hash can't drift. lat_ref (mean vertex latitude, 4dp) rides
      // along for interpretability.
      // r20 opt: the r19 plan spliced the latBar aggregate() fold
      // TEXTUALLY into every occurrence of geoAreaScale's s² chain —
      // ~40 interpreted fold evaluations per row. StructLongSum3 is the
      // exact-BIGINT vlat sum fused to one codegen'd pass, and
      // GeoAreaScale carries the whole polynomial (same literals, same
      // association — bit-identical, see the kernel's scaladoc), so the
      // mean latitude is computed ONCE per ring.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .withColumn("vlat_c", col("lat_c") % 18000 - 9000)
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, vlat_c)))").as("pts"))
        .withColumn("vlatsum", graft.functions.PathFolds.fieldSum3(col("pts")))
        .withColumn("nv", size(col("pts")))
        .withColumn("ring",
          expr("""IF(element_at(pts, 1).lon_c = element_at(pts, -1).lon_c
                 |   AND element_at(pts, 1).vlat_c = element_at(pts, -1).vlat_c,
                 |   pts, concat(pts, slice(pts, 1, 1)))""".stripMargin))
        // the shoelace lambda here is term-for-term RingShoe's
        // exact-BIGINT sum (ordinals 2/3 = lon_c/vlat_c) — reuse the
        // fused kernel instead of the interpreted zip_with + aggregate.
        .withColumn("shoe", graft.functions.RingShoe(col("ring")))
        .select(
          col("way_id"),
          size(col("ring")).cast("long").as("n_ring_points"),
          round(col("vlatsum").cast("double") / col("nv").cast("double") * 0.01, 4)
            .as("lat_ref"),
          // RULE (learned r13): never round() a double above ~1e9 to
          // sub-integer precision in an oracled key unless the true value
          // is decimal by construction. Raw areas reach ~1e13 m² where a
          // double's ULP (~0.002) swamps the 0.05 rounding boundary and
          // DuckDB (nearbyint-style) vs Spark (BigDecimal HALF_UP on the
          // shortest repr) disagree on boundary rows. The sibling
          // osm_way_area_m2 is safe *structurally* (integer-shoelace ×
          // 2-dp literal can't land on .x5), but the irrational cosPoly
          // factor here can. Fix: rescale to km² (~1e7 magnitude, ULP
          // ~2e-9) before rounding — both engines then agree except with
          // ~3e-7 probability per row.
          round(expr(s"CAST(abs(shoe) AS DOUBLE)") * 619667.12 *
            graft.functions.PathFolds.geoAreaScale(col("vlatsum"), col("nv")) / 1e6, 1)
            .as("area_km2"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_bbox_intersection_area",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, p_size * 100 AS lon_c,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |bb AS (
        |  SELECT way_id, min(lon_c) AS xmin, max(lon_c) AS xmax,
        |         min(lat_c) AS ymin, max(lat_c) AS ymax
        |  FROM pts GROUP BY way_id),
        |tx_exp AS (
        |  SELECT way_id, xmin, xmax, ymin, ymax,
        |         unnest(range(xmin // 500, xmax // 500 + 1)) AS tx
        |  FROM bb),
        |ty_exp AS (
        |  SELECT way_id, xmin, xmax, ymin, ymax, tx,
        |         unnest(range(ymin // 4000, ymax // 4000 + 1)) AS ty
        |  FROM tx_exp),
        |clipped AS (
        |  SELECT tx, ty, way_id,
        |         greatest(CAST(0 AS BIGINT),
        |                  least(xmax, (tx + 1) * 500) - greatest(xmin, tx * 500)) *
        |         greatest(CAST(0 AS BIGINT),
        |                  least(ymax, (ty + 1) * 4000) - greatest(ymin, ty * 4000)) AS ia
        |  FROM ty_exp
        |  WHERE tx BETWEEN 2 AND 5 AND ty BETWEEN 23 AND 24)
        |SELECT tx, ty, count(*) AS n_ways,
        |       CAST(sum(ia) AS BIGINT) AS inter_area,
        |       CAST((1000000 * sum(ia)) // 2000000 AS BIGINT) AS density_ppm
        |FROM clipped
        |GROUP BY tx, ty
        |ORDER BY tx, ty""".stripMargin
    ) { (s, d) =>
      // BBox-clip density per tile — the polygon-intersection kernel of
      // VERDICT r12 item 4 in its exact-integer-oracle-able form: each
      // way's bbox (exact min/max from the same membership join the
      // geometry ops pay) is clipped against every 500×4000-centi-unit
      // tile it touches inside the query window (tx∈[2,5], ty∈[6,8] —
      // the [1000,3000]×[92000,100000] box; density_ppm = 1e6·covered/tile-area, tile = 2e6 sq-centi-units); the rectangle∩rectangle
      // area is pure integer max/min arithmetic (the same
      // exact-both-engines recipe as PointInRing), and the per-tile
      // rollup is the "POI density per tile" serving query. Scale shape:
      // min/max bboxes are a partial+final agg (map-side combine — the
      // regroup never carries point lists); the tile explosion is
      // bounded by bbox extent (≤ ~70 tiles/way here, typically 1-4 for
      // real OSM ways), and the final groupBy runs over the BOUNDED tile
      // key space, not the data. At planet scale this is the standard
      // tile-pyramid materialization: same plan, tile ids as the
      // partition key of the written layer.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(min(col("lon_c")).as("xmin"), max(col("lon_c")).as("xmax"),
             min(col("lat_c")).as("ymin"), max(col("lat_c")).as("ymax"))
        .withColumn("tx", explode(expr("sequence(xmin DIV 500, xmax DIV 500)")))
        .withColumn("ty", explode(expr("sequence(ymin DIV 4000, ymax DIV 4000)")))
        .where(col("tx").between(2, 5) && col("ty").between(23, 24))
        .withColumn("ia",
          greatest(lit(0L), least(col("xmax"), (col("tx") + 1) * 500) -
                            greatest(col("xmin"), col("tx") * 500)) *
          greatest(lit(0L), least(col("ymax"), (col("ty") + 1) * 4000) -
                            greatest(col("ymin"), col("ty") * 4000)))
        .groupBy(col("tx"), col("ty"))
        .agg(count(lit(1)).as("n_ways"),
             sum(col("ia")).cast("long").as("inter_area"))
        .withColumn("density_ppm", expr("(1000000 * inter_area) DIV 2000000"))
        .orderBy(col("tx"), col("ty"))
    },

    Q(
      "osm_bbox_union_area",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, CAST(p_size * 100 AS BIGINT) AS lon_c,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |bb AS (
        |  SELECT way_id, min(lon_c) AS xmin, max(lon_c) AS xmax,
        |         min(lat_c) AS ymin, max(lat_c) AS ymax
        |  FROM pts GROUP BY way_id),
        |w AS (
        |  SELECT way_id, greatest(xmin, 1000) AS x1, least(xmax, 3000) AS x2,
        |         greatest(ymin, 92000) AS y1, least(ymax, 100000) AS y2
        |  FROM bb
        |  WHERE least(xmax, 3000) > greatest(xmin, 1000)
        |    AND least(ymax, 100000) > greatest(ymin, 92000)),
        |cellx AS (
        |  SELECT way_id, x1, x2, y1, y2, unnest(range(x1 // 250, x2 // 250 + 1)) AS cx
        |  FROM w),
        |celly AS (
        |  SELECT way_id, x1, x2, y1, y2, cx,
        |         unnest(range(y1 // 2000, y2 // 2000 + 1)) AS cy
        |  FROM cellx),
        |boxes AS (
        |  SELECT cx, cy, way_id,
        |         greatest(x1, cx * 250) AS bx1, least(x2, (cx + 1) * 250) AS bx2,
        |         greatest(y1, cy * 2000) AS by1, least(y2, (cy + 1) * 2000) AS by2
        |  FROM celly
        |  WHERE least(x2, (cx + 1) * 250) > greatest(x1, cx * 250)
        |    AND least(y2, (cy + 1) * 2000) > greatest(y1, cy * 2000)),
        |edges AS (
        |  SELECT cx, cy, bx1 AS xs FROM boxes
        |  UNION SELECT cx, cy, bx2 FROM boxes),
        |strips AS (
        |  SELECT cx, cy, xs, lead(xs) OVER (PARTITION BY cx, cy ORDER BY xs) AS xe
        |  FROM edges),
        |cover AS (
        |  SELECT s.cx, s.cy, s.xs, s.xe, b.by1, b.by2, b.way_id
        |  FROM strips s JOIN boxes b
        |    ON s.cx = b.cx AND s.cy = b.cy AND b.bx1 <= s.xs AND b.bx2 >= s.xe
        |  WHERE s.xe IS NOT NULL),
        |seg AS (
        |  SELECT cx, cy, xs, xe, by1, by2,
        |         max(by2) OVER (PARTITION BY cx, cy, xs ORDER BY by1, by2, way_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM cover),
        |striplen AS (
        |  SELECT cx, cy, xs, xe,
        |         sum(greatest(CAST(0 AS BIGINT),
        |                      by2 - greatest(by1, coalesce(pmax, by1)))) AS ulen
        |  FROM seg GROUP BY cx, cy, xs, xe),
        |tile AS (
        |  SELECT cx // 2 AS tx, cy // 2 AS ty,
        |         CAST(sum((xe - xs) * ulen) AS BIGINT) AS union_area
        |  FROM striplen GROUP BY 1, 2),
        |nw AS (
        |  SELECT cx // 2 AS tx, cy // 2 AS ty, count(DISTINCT way_id) AS n_ways
        |  FROM boxes GROUP BY 1, 2)
        |SELECT t.tx, t.ty, n.n_ways, t.union_area,
        |       CAST((1000000 * t.union_area) // 2000000 AS BIGINT) AS covered_ppm
        |FROM tile t JOIN nw n ON t.tx = n.tx AND t.ty = n.ty
        |ORDER BY t.tx, t.ty""".stripMargin
    ) { (s, d) =>
      // ST_Union-class kernel (VERDICT r12 "spatial-op breadth"): EXACT
      // union area of way-bbox footprints per tile — overlap counted
      // once, unlike `osm_bbox_intersection_area`'s per-way density sum.
      // Algorithm: coordinate-compression sweep over WINDOW-WIDE x-strips
      // (r18 replan; the oracle SQL keeps the earlier cell-decomposed
      // recipe — union area is additive over ANY disjoint decomposition
      // and every quantity is exact BIGINT, so both plans hash-match by
      // construction, and the A/B was verified row-identical at sf0.1):
      // (1) clip each bbox to the query window and split it at tile
      // y-boundaries (y DIV 4000 bands, ≤3 rows/box); (2) the DISTINCT
      // clipped x-edges plus the 500-grid tile x-boundaries cut the
      // window into strips — the fixture's lon axis is quantized
      // (p_size×100), so this is a k-bounded table (~25 rows; its
      // single-partition lead window is the documented bounded-window
      // exception) and strips never straddle a tile; (3) bands join
      // strips via BROADCAST (pure range predicate → BroadcastNestedLoop
      // over the tiny strip table — no shuffle of the fact side, the
      // r18 win: the previous 250×2000 cell shred carried a 2.8 M-row
      // persist and an 8 M-row shuffle join into ≤32 cell groups, 3.3 s
      // fresh; this plan's cover table is ~1.3 M rows and the only fact
      // shuffle is the window below — 1.9-2.3 s measured); (4) the
      // classic running-max window per (band, strip) computes the 1-D
      // union length of y-intervals: contribution = max(0, y2 − max(y1,
      // prev_max)) — order-invariant, exact BIGINT; (5) Σ strip_width ×
      // union_len rolls up to the serving 500×4000 tiles. At planet
      // scale the window is a user query region (city/continent tile
      // batch); one strip table per region stays k-bounded because real
      // query regions are processed per tile-batch, and the sweep
      // parallelizes over (region × band × strip).
      val bb = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(min(col("lon_c")).as("xmin"), max(col("lon_c")).as("xmax"),
             min(col("lat_c")).as("ymin"), max(col("lat_c")).as("ymax"))
      val band = graft.Caches.register(bb.select(col("way_id"),
          greatest(col("xmin"), lit(1000L)).as("x1"),
          least(col("xmax"), lit(3000L)).as("x2"),
          greatest(col("ymin"), lit(92000L)).as("y1"),
          least(col("ymax"), lit(100000L)).as("y2"))
        .where(col("x2") > col("x1") && col("y2") > col("y1"))
        .withColumn("ty", explode(expr("sequence(y1 DIV 4000, y2 DIV 4000)")))
        .select(col("way_id"), col("ty"), col("x1"), col("x2"),
          greatest(col("y1"), col("ty") * 4000).as("by1"),
          least(col("y2"), (col("ty") + 1) * 4000).as("by2"))
        .where(col("by2") > col("by1"))
        .persist())
      val strips = band.select(explode(array(col("x1"), col("x2"))).as("xs"))
        .union(s.range(2, 7).select((col("id") * 500).as("xs")))
        .distinct()
        .withColumn("xe", lead(col("xs"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("xs"))))
        .where(col("xe").isNotNull)
        .select(col("xs"), col("xe"), expr("xs DIV 500").as("tx"))
      val cover = band.join(broadcast(strips),
        col("x1") <= col("xs") && col("x2") >= col("xe"))
      val wseg = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ty"), col("xs"))
        .orderBy(col("by1"), col("by2"), col("way_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val striplen = cover
        .withColumn("pmax", max(col("by2")).over(wseg))
        .withColumn("contrib",
          greatest(lit(0L),
            col("by2") - greatest(col("by1"), coalesce(col("pmax"), col("by1")))))
        .groupBy(col("tx"), col("ty"), col("xs"), col("xe"))
        .agg(sum(col("contrib")).as("ulen"))
      val tile = striplen.groupBy(col("tx"), col("ty"))
        .agg(sum((col("xe") - col("xs")) * col("ulen")).cast("long").as("union_area"))
      // r19 opt: n_ways per tile straight from the |ways×bands|-bounded
      // band table — a way covers tile tx iff [x1,x2]∩[tx·500,(tx+1)·500)
      // has positive width, i.e. tx ∈ [x1 DIV 500, (x2−1) DIV 500] (x2 >
      // x1 by the clip filter; strips never straddle tiles, so this is
      // exactly the set of tiles the old cover-based DISTINCT produced).
      // The before-plan recomputed the ~1.3 M-row BroadcastNestedLoop
      // cover join a SECOND time and ran DISTINCT over it just for this
      // count; band rows are unique per (way_id, ty) by construction and
      // the explode emits each tx once, so a plain count suffices.
      val nw = band
        .select(col("ty"), explode(expr("sequence(x1 DIV 500, (x2 - 1) DIV 500)")).as("tx"))
        .groupBy(col("tx"), col("ty")).agg(count(lit(1)).as("n_ways"))
      tile.join(nw, Seq("tx", "ty"))
        .select(col("tx"), col("ty"), col("n_ways"), col("union_area"),
                expr("(1000000 * union_area) DIV 2000000").as("covered_ppm"))
        .orderBy(col("tx"), col("ty"))
    },

    Q(
      "osm_dwithin_count",
      s"""WITH nd AS (
         |  SELECT p_partkey AS node_id, CAST(p_size * 100 AS BIGINT) AS lon_c,
         |         CAST(round(p_retailprice * 100) AS BIGINT) % 18000 - 9000 AS vlat_c,
         |         p_brand
         |  FROM part),
         |poi AS (
         |  SELECT node_id AS poi_id, lon_c AS plon, vlat_c AS plat
         |  FROM nd WHERE p_brand = 'Brand#4'),
         |px AS (
         |  SELECT poi_id, plon, plat, (plon // 500) + unnest(range(-1, 2)) AS cellx
         |  FROM poi),
         |pc AS (
         |  SELECT poi_id, plon, plat, cellx,
         |         ((plat + 9000) // 500) + unnest(range(-1, 2)) AS celly
         |  FROM px),
         |d AS (
         |  SELECT pc.poi_id, n.node_id,
         |         ${geoSeg("(n.lon_c - pc.plon)", "(n.vlat_c - pc.plat)",
                            "(pc.plat + n.vlat_c)")} * 1113.2 AS dist_m
         |  FROM pc JOIN nd n
         |    ON n.lon_c // 500 = pc.cellx AND (n.vlat_c + 9000) // 500 = pc.celly
         |  WHERE n.node_id <> pc.poi_id)
         |SELECT poi_id, count(*) AS n_within, round(min(dist_m), 1) AS nearest_m
         |FROM d WHERE dist_m <= 500000.0
         |GROUP BY poi_id
         |ORDER BY poi_id""".stripMargin
    ) { (s, d) =>
      // Geodesic ST_DWithin — "everything within R meters of each POI",
      // the buffer-class serving query (PostGIS `ST_DWithin(geography)`,
      // README.md:70,80-82): a metric radius, so the lon leg must shrink
      // by cos(lat) exactly as the geodesic measures do (a planar radius
      // is 2× too generous at 60°N). Plan shape: the POI set is the
      // small side — it explodes to its 3×3 neighbor cells and
      // size-gate-broadcasts onto the node store via a
      // pure cell equi-join; the metric test only FILTERS the bounded
      // candidate set, never drives the join (join_spatial_grid's
      // discipline). HALO BOUND (ADVICE r16): the 3×3 halo is exact
      // only on the LATITUDE leg (cell edge 500 centi-units ≥ the
      // 449-centi-unit metric radius in latitude, which never shrinks);
      // on the LONGITUDE leg the metric radius spans 449/cos(lat)
      // centi-units of grid, so above ~|48°| a node can be inside the
      // 500 km circle yet 2+ cells away in x — BOTH engines run the
      // identical halo (oracle text above), so the key is
      // self-consistent and hash-stable, but it is a deliberate
      // approximation of PostGIS ST_DWithin semantics at high
      // latitudes, not an exact match; an exact variant would widen
      // the x-halo per latitude band (ceil(1/cos(lat_band)) cells).
      // The WGS84 trig/radius factors do NOT evaluate
      // inline on the pair stream: latitudes are integer centi-units,
      // so the per-pair (f1, f2) scale factors take exactly 36 001
      // values — precomputed ONCE into a broadcast factor DIMENSION
      // ([[geoFactors]]) and equi-joined on the latitude sum. Inlined,
      // Catalyst substitutes ~200 flops of polynomial into the join
      // residual AND the downstream project; the generated method blew
      // past HotSpot's JIT size cap and the probe loop ran INTERPRETED
      // (measured 21× on this key). At planet scale the same shape
      // holds: the node store stays hash-partitioned by cell, each POI
      // touches 9 cells regardless of corpus size, and the trig rides a
      // 36 001-row broadcast, O(1) hash probe per pair. The factors are
      // bit-equal to the oracle's inline template (same literals, same
      // association — [[geoSeg]] multiplies dlon * (c·nf), never
      // (dlon·c) · nf), so even round(min(dist)) hashes stably.
      val ns = T.part(s, d).select(
          col("p_partkey").as("node_id"),
          (col("p_size").cast("long") * 100).as("lon_c"),
          (round(col("p_retailprice") * 100).cast("long") % 18000 - 9000).as("vlat_c"),
          col("p_brand"))
      val (f1T, f2T) = geoFactors("lat_sum")
      val factors = Gate.bcast(s.range(-18000L, 18001L)
        .select(col("id").as("lat_sum"))
        .select(col("lat_sum"), expr(f1T).as("gf1"), expr(f2T).as("gf2")))
      val poi = ns.where(col("p_brand") === "Brand#4")
        .select(col("node_id").as("poi_id"), col("lon_c").as("plon"),
                col("vlat_c").as("plat"))
        .withColumn("cellx", explode(expr("sequence(plon DIV 500 - 1, plon DIV 500 + 1)")))
        .withColumn("celly", explode(expr(
          "sequence((plat + 9000) DIV 500 - 1, (plat + 9000) DIV 500 + 1)")))
      Gate.bcast(poi)
        .join(ns, expr("lon_c DIV 500") === col("cellx")
                  && expr("(vlat_c + 9000) DIV 500") === col("celly")
                  && col("node_id") =!= col("poi_id"))
        .join(factors, col("plat") + col("vlat_c") === col("lat_sum"))
        .withColumn("dist_m", expr(
          """sqrt((CAST((lon_c - plon) AS DOUBLE) * gf1) * (CAST((lon_c - plon) AS DOUBLE) * gf1)
            |   + (CAST((vlat_c - plat) AS DOUBLE) * gf2) * (CAST((vlat_c - plat) AS DOUBLE) * gf2))
            | * 1113.2""".stripMargin))
        .where(col("dist_m") <= 500000.0)
        .groupBy(col("poi_id"))
        .agg(count(lit(1)).as("n_within"),
             round(min(col("dist_m")), 1).as("nearest_m"))
        .orderBy(col("poi_id"))
    },

    Q(
      "osm_node_use_count",
      """WITH u AS (
        |  SELECT l_partkey AS node_id, count(DISTINCT l_orderkey) AS deg
        |  FROM lineitem GROUP BY 1)
        |SELECT deg AS way_degree, count(*) AS n_nodes
        |FROM u GROUP BY 1
        |ORDER BY way_degree""".stripMargin
    ) { (s, d) =>
      // Node USE-COUNT histogram — osm2pgsql's middle computes exactly
      // this statistic (how many ways reference each node) to pick its
      // node-storage strategy and to find shared nodes = INTERSECTIONS
      // during geometry assembly (README.md:80-81); degree ≥ 2 nodes are
      // where the road graph branches, so the histogram is the
      // intersection-density readout of a region. Two bounded
      // aggregations: distinct ways per node (shuffles the membership
      // table once on node_id — the same key the way→node resolve
      // shuffles on, so at planet scale this rides the bucketed layout
      // for free), then a count over |nodes| rows into a handful of
      // degree buckets. Everything is exact integers.
      T.lineitem(s, d)
        .groupBy(col("l_partkey").as("node_id"))
        .agg(countDistinct(col("l_orderkey")).as("deg"))
        .groupBy(col("deg").as("way_degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("way_degree"))
    },

    Q(
      "osm_way_area_m2",
      s"""WITH $duckRingsCte
         |SELECT way_id,
         |       len(clons) AS n_ring_points,
         |       CASE WHEN shoe > 0 THEN 'CCW' WHEN shoe < 0 THEN 'CW'
         |            ELSE 'DEGENERATE' END AS winding,
         |       round(CAST(abs(shoe) AS DOUBLE) * 619667.12, 1) AS area_m2
         |FROM rings
         |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // Polygon area in SQUARE METERS — the ST_Area twin of
      // `osm_way_length_m`, the real-unit measure the building/water/
      // landuse area layers get queried with (README.md:80-82). The
      // signed shoelace sum `shoe` is already EXACT BIGINT centi-unit²
      // (wayRings — the same regroup the WKB area ops ride; no new
      // shuffle), so the whole conversion is ONE IEEE multiply of an
      // exact integer by the literal m²-per-centi-unit² factor
      // (1113.2² / 2 = 619667.12, shoe = 2·area) — bit-identical
      // cross-engine, final-only rounding. No trig, no per-segment
      // float accumulation: the only double ever formed is the answer.
      wayRings(s, d)
        .select(col("way_id"),
          size(col("ring")).cast("long").as("n_ring_points"),
          when(col("shoe") > 0, "CCW").when(col("shoe") < 0, "CW")
            .otherwise("DEGENERATE").as("winding"),
          round(abs(col("shoe")).cast("double") * 619667.12, 1).as("area_m2"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_area_by_landuse",
      s"""WITH $duckRingsCte
         |SELECT o_orderpriority AS landuse_class,
         |       count(*) AS n_polys,
         |       CAST(sum(abs(shoe)) AS BIGINT) AS shoe_sum,
         |       round(CAST(sum(abs(shoe)) AS BIGINT) * 619667.12 / 1000000, 3)
         |         AS total_km2
         |FROM rings JOIN orders ON way_id = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY landuse_class""".stripMargin
    ) { (s, d) =>
      // "Total km² per landuse class" — ST_Area + GROUP BY landuse, the
      // area twin of `osm_length_by_class` and the other half of the
      // PostGIS serving pair. Strictly STRONGER determinism than the
      // length rollup needed: the per-way shoelace `shoe` is already an
      // EXACT BIGINT, so the class total is an exact integer sum
      // (order- and partitioning-invariant by construction — no decimal
      // cast required) and the only double ever formed is the one final
      // multiply of shoe_sum by the literal area factor. The exact
      // integer shoe_sum ships in the output so the oracle compare pins
      // the rollup at full precision, not only through the rounded km².
      // Same regroup as the area kernel; the class tag broadcasts.
      val cls = T.orders(s, d)
        .select(col("o_orderkey").as("way_id"), col("o_orderpriority").as("landuse_class"))
      wayRings(s, d)
        .join(graft.Gate.bcast(cls), "way_id")
        .groupBy(col("landuse_class"))
        .agg(count(lit(1)).as("n_polys"),
             sum(abs(col("shoe"))).cast("long").as("shoe_sum"))
        .select(col("landuse_class"), col("n_polys"), col("shoe_sum"),
                round(col("shoe_sum") * 619667.12 / 1000000, 3).as("total_km2"))
        .orderBy(col("landuse_class"))
    },

    Q(
      "osm_way_wkb",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ways AS (SELECT way_id, count(*) AS n_points FROM pts GROUP BY way_id)
        |SELECT way_id, n_points,
        |       9 + 16 * n_points AS wkb_len,
        |       '0102000000' AS wkb_header
        |FROM ways
        |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // WKB LineString encode — the terminal step SURVEY §1.2 maps the
      // PostGIS geometry column to (README.md:80-82): assembled point
      // array → OGC little-endian WKB bytes via the codegen'd
      // graft.functions.WkbLineString. The oracle pins the structure
      // (9+16n length, NDR+type header read back out of the bytes);
      // WkbSpec round-trips the coordinate payload bit-exactly.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .select(col("way_id"), size(col("pts")).cast("long").as("n_points"),
          graft.functions.WkbLineString(
            expr("transform(pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D)"),
            expr("transform(pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D)")).as("wkb"))
        .select(col("way_id"), col("n_points"),
                octet_length(col("wkb")).cast("long").as("wkb_len"),
                substring(hex(col("wkb")), 1, 10).as("wkb_header"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_relation_wkb",
      """WITH wp AS (SELECT l_orderkey AS way_id, count(*) AS n FROM lineitem GROUP BY 1),
        |rel AS (SELECT o_custkey AS relation_id, way_id, n
        |        FROM orders JOIN wp ON o_orderkey = way_id)
        |SELECT relation_id,
        |       count(*) AS n_ways,
        |       CAST(sum(n) AS BIGINT) AS n_points,
        |       CAST(9 + sum(9 + 16 * n) AS BIGINT) AS wkb_len,
        |       '0105000000' AS wkb_header
        |FROM rel GROUP BY relation_id ORDER BY relation_id""".stripMargin
    ) { (s, d) =>
      // Relation-level WKB: member ways (each an ordered point array)
      // collected — ordered by way id — into one OGC MultiLineString
      // (type 5) via the codegen'd WkbMultiLineString. Two aggregations
      // (way regroup, relation regroup) and one fact⋈fact join on the way
      // key — the nesting lives inside the row, so no extra shuffle
      // beyond osm_relation_geometry's. Oracle pins the structure
      // (Σ member sizes, 9+Σ(9+16nᵢ) length, NDR+type header);
      // WkbSpec round-trips member coordinates bit-exactly.
      val ways = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
      T.orders(s, d)
        .select(col("o_custkey").as("relation_id"), col("o_orderkey"))
        .join(ways, col("o_orderkey") === col("way_id"))
        .groupBy(col("relation_id"))
        .agg(expr("array_sort(collect_list(struct(way_id, pts)))").as("ways"))
        .select(col("relation_id"),
          size(col("ways")).cast("long").as("n_ways"),
          expr("aggregate(ways, 0L, (acc, w) -> acc + size(w.pts))").as("n_points"),
          graft.functions.WkbMultiLineString(
            expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
            expr("transform(ways, w -> transform(w.pts, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))")).as("wkb"))
        .select(col("relation_id"), col("n_ways"), col("n_points"),
                octet_length(col("wkb")).cast("long").as("wkb_len"),
                substring(hex(col("wkb")), 1, 10).as("wkb_header"))
        .orderBy(col("relation_id"))
    },

    Q(
      "osm_relation_nested",
      """SELECT 25000000 + n_nationkey AS relation_id,
        |       count(DISTINCT o_orderkey) AS n_member_ways,
        |       count(*) AS n_points,
        |       min(p_size * 100) / 100.0 AS bbox_min_lon,
        |       CAST(min(round(p_retailprice * 100)) AS DOUBLE) / 100.0 AS bbox_min_lat,
        |       max(p_size * 100) / 100.0 AS bbox_max_lon,
        |       CAST(max(round(p_retailprice * 100)) AS DOUBLE) / 100.0 AS bbox_max_lat,
        |       CAST(0 AS BIGINT) AS n_unresolved
        |FROM nation
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON p_partkey = l_partkey
        |GROUP BY n_nationkey
        |ORDER BY relation_id""".stripMargin
    ) { (s, d) =>
      // RELATION-OF-RELATIONS resolution (VERDICT r14 item 3; reference
      // README.md:80-81 — relations take geometry from member nodes AND
      // ways, transitively through member relations). Fixture mapping:
      // nation-relations (id-space-shifted by 25e6) contain customer-
      // relations contain ways contain nodes — one real nesting level,
      // resolved by the generic bounded-depth [[nestedClosure]]; the
      // oracle states the same closure as the flat join chain it
      // flattens to at this depth, with the loud n_unresolved column
      // pinned to zero (nothing in the fixture exceeds the bound —
      // cycles and over-deep chains are spec-pinned on synthetic edges
      // instead, Round15OpsSpec).
      val base = lit(25000000L)
      val roots = T.nation(s, d).select(
        (base + col("n_nationkey")).as("root_id"),
        (base + col("n_nationkey")).as("rel_id"))
      val relEdges = T.customer(s, d).select(
        (base + col("c_nationkey")).as("parent_id"), col("c_custkey").as("child_id"))
      val (closure, unresolved) = nestedClosure(roots, relEdges, maxDepth = 4)
      val wayMembers = T.orders(s, d).select(
        col("o_custkey").as("rel_id"), col("o_orderkey").as("way_id"))
      // r19 A/B (wash): gate-broadcasting the closure and the
      // closure⋈members product to keep the fact chain unshuffled
      // measured 1.22 → 1.26 s solo at sf0.1 — the closure unroll, not
      // the two SortMergeJoins, is the cost here. Original shape stands.
      val agged = closure
        .join(wayMembers, Seq("rel_id"))
        .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
              col("way_id") === col("l_orderkey"))
        .join(nodes(s, d), col("l_partkey") === col("node_id"))
        .groupBy(col("root_id"))
        .agg(
          countDistinct(col("way_id")).as("n_member_ways"),
          count(lit(1)).as("n_points"),
          (min(col("lon_c")) / 100.0).as("bbox_min_lon"),
          (min(col("lat_c")) / 100.0).as("bbox_min_lat"),
          (max(col("lon_c")) / 100.0).as("bbox_max_lon"),
          (max(col("lat_c")) / 100.0).as("bbox_max_lat"))
      agged.join(unresolved, Seq("root_id"), "left")
        .select(col("root_id").as("relation_id"), col("n_member_ways"),
                col("n_points"), col("bbox_min_lon"), col("bbox_min_lat"),
                col("bbox_max_lon"), col("bbox_max_lat"),
                coalesce(col("n_unresolved"), lit(0L)).as("n_unresolved"))
        .orderBy(col("relation_id"))
    },

    Q(
      "osm_relation_geometry",
      """SELECT o_custkey AS relation_id,
        |       count(DISTINCT l_orderkey) AS n_member_ways,
        |       count(*) AS n_points,
        |       min(p_size * 100) / 100.0 AS bbox_min_lon,
        |       CAST(min(round(p_retailprice * 100)) AS DOUBLE) / 100.0 AS bbox_min_lat,
        |       max(p_size * 100) / 100.0 AS bbox_max_lon,
        |       CAST(max(round(p_retailprice * 100)) AS DOUBLE) / 100.0 AS bbox_max_lat
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY o_custkey
        |ORDER BY relation_id""".stripMargin
    ) { (s, d) =>
      // Two-level resolution (relation → member ways → member nodes,
      // README.md:80-81): fact⋈fact shuffle join on the way key, node store
      // broadcast, then one partial+final agg for the relation bbox.
      T.orders(s, d).select(col("o_custkey").as("relation_id"), col("o_orderkey"))
        .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
              col("o_orderkey") === col("l_orderkey"))
        .join(nodes(s, d), col("l_partkey") === col("node_id"))
        .groupBy(col("relation_id"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_member_ways"),
          count(lit(1)).as("n_points"),
          (min(col("lon_c")) / 100.0).as("bbox_min_lon"),
          (min(col("lat_c")) / 100.0).as("bbox_min_lat"),
          (max(col("lon_c")) / 100.0).as("bbox_max_lon"),
          (max(col("lat_c")) / 100.0).as("bbox_max_lat"))
        .orderBy(col("relation_id"))
    },

    Q(
      "osm_way_polygon_wkb",
      s"""WITH $duckRingsCte
         |SELECT way_id,
         |       len(clons) AS n_ring_points,
         |       CAST(abs(shoe) AS DOUBLE) / 20000.0 AS area,
         |       CASE WHEN shoe > 0 THEN 'CCW' WHEN shoe < 0 THEN 'CW'
         |            ELSE 'DEGENERATE' END AS winding,
         |       CAST(13 + 16 * len(clons) AS BIGINT) AS wkb_len,
         |       '0103000000' AS wkb_header
         |FROM rings
         |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // Closed way → OGC WKB Polygon (type 3) — the area assembly
      // osm2pgsql performs for building/water/landuse layers
      // (README.md:80-82); VERDICT r3's #1 semantic gap. Ring closure
      // (append first point), exact integer shoelace (area + winding),
      // and CCW shell normalization are declarative transforms over the
      // same per-way regroup `osm_way_geometry` already pays — no new
      // shuffle (PlanSpec). The oracle pins ring size, exact area,
      // winding, and the 13+16n byte length + NDR/type header read back
      // out of the bytes; WkbSpec round-trips coordinates and asserts
      // closure + CCW on the decoded shell.
      wayRings(s, d)
        .withColumn("shell", expr("IF(shoe < 0, reverse(ring), ring)"))
        .select(col("way_id"),
          size(col("ring")).cast("long").as("n_ring_points"),
          (abs(col("shoe")).cast("double") / 20000.0).as("area"),
          when(col("shoe") > 0, "CCW").when(col("shoe") < 0, "CW")
            .otherwise("DEGENERATE").as("winding"),
          graft.functions.WkbPolygon(
            expr("array(transform(shell, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
            expr("array(transform(shell, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))")).as("wkb"))
        .select(col("way_id"), col("n_ring_points"), col("area"), col("winding"),
                octet_length(col("wkb")).cast("long").as("wkb_len"),
                substring(hex(col("wkb")), 1, 10).as("wkb_header"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_relation_multipolygon_wkb",
      s"""WITH $duckRingsCte,
         |rel AS (
         |  SELECT o_custkey AS relation_id, way_id, len(clons) AS n, shoe,
         |         CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
         |              THEN 'outer' ELSE 'inner' END AS role,
         |         row_number() OVER (PARTITION BY o_custkey
         |                            ORDER BY (CASE WHEN o_orderpriority LIKE '1%'
         |                                        OR o_orderpriority LIKE '2%'
         |                                      THEN 0 ELSE 1 END),
         |                                     abs(shoe) DESC, way_id) AS rk
         |  FROM orders JOIN rings ON o_orderkey = way_id)
         |SELECT relation_id,
         |       count(*) AS n_rings,
         |       count(*) - 1 AS n_holes,
         |       CAST(sum(n) AS BIGINT) AS n_points,
         |       max(CASE WHEN rk = 1 THEN way_id END) AS outer_way,
         |       max(CASE WHEN rk = 1 THEN role END) AS outer_role,
         |       CAST(max(CASE WHEN rk = 1 THEN abs(shoe) END) AS DOUBLE) / 20000.0 AS outer_area,
         |       CAST(18 + sum(4 + 16 * n) AS BIGINT) AS wkb_len,
         |       '0106000000' AS wkb_header
         |FROM rel GROUP BY relation_id ORDER BY relation_id""".stripMargin
    ) { (s, d) =>
      // Relation → OGC WKB MultiPolygon (type 6) with ROLE-DRIVEN
      // outer/inner assembly (README.md:80-82, osm2pgsql semantics): each
      // member carries a role — derived deterministically from the
      // fixture's o_orderpriority ('1-URGENT'/'2-HIGH' → outer, rest →
      // inner), standing in for OSM's member-role tags — and the shell is
      // the largest-|area| member AMONG THE OUTER-ROLE ONES, so a small
      // role-outer ring beats a big role-inner one (WkbSpec pins such a
      // fixture relation). Relations whose members carry no outer role at
      // all (broken tagging, which real planet data has) fall back to
      // osm2pgsql's repair: largest |area| overall. Shell normalized CCW,
      // holes CW, ring 0 first — the OGC layout PostGIS expects. Same two
      // aggregations + one fact⋈fact join as osm_relation_wkb: the role
      // split and winding fixes live INSIDE the row (ordered struct sort
      // + positional transform), so no shuffle is added. Oracle pins
      // ring/hole/point counts, the role-selected outer pick + its role,
      // exact area, and the byte length; WkbSpec decodes shell-CCW /
      // holes-CW / closure.
      val rings = wayRings(s, d).select(col("way_id"), col("ring"), col("shoe"))
      T.orders(s, d)
        .select(col("o_custkey").as("relation_id"), col("o_orderkey"),
          when(col("o_orderpriority").startsWith("1")
                 || col("o_orderpriority").startsWith("2"), "outer")
            .otherwise("inner").as("role"))
        .join(rings, col("o_orderkey") === col("way_id"))
        .groupBy(col("relation_id"))
        .agg(expr(
          """array_sort(collect_list(named_struct(
            |  'rolerank', IF(role = 'outer', 0, 1),
            |  'neg_area', -abs(shoe), 'way_id', way_id,
            |  'ring', ring, 'shoe', shoe, 'role', role)))""".stripMargin)
          .as("rs"))
        // shell (position 0) must wind CCW, holes CW: reverse on demand,
        // decided by the exact integer shoelace sign
        .withColumn("norm",
          expr("""transform(rs, (r, i) ->
                 |  IF((i = 0 AND r.shoe < 0) OR (i > 0 AND r.shoe > 0),
                 |     reverse(r.ring), r.ring))""".stripMargin))
        .select(col("relation_id"),
          size(col("rs")).cast("long").as("n_rings"),
          (size(col("rs")) - 1).cast("long").as("n_holes"),
          expr("aggregate(rs, CAST(0 AS BIGINT), (acc, r) -> acc + size(r.ring))").as("n_points"),
          expr("rs[0].way_id").as("outer_way"),
          expr("rs[0].role").as("outer_role"),
          (abs(expr("rs[0].shoe")).cast("double") / 20000.0).as("outer_area"),
          graft.functions.WkbMultiPolygon(
            expr("transform(norm, ring -> transform(ring, p -> CAST(p.lon_c AS DOUBLE) / 100.0D))"),
            expr("transform(norm, ring -> transform(ring, p -> CAST(p.lat_c AS DOUBLE) / 100.0D))"),
            array(lit(0))).as("wkb"))
        .select(col("relation_id"), col("n_rings"), col("n_holes"), col("n_points"),
                col("outer_way"), col("outer_role"), col("outer_area"),
                octet_length(col("wkb")).cast("long").as("wkb_len"),
                substring(hex(col("wkb")), 1, 10).as("wkb_header"))
        .orderBy(col("relation_id"))
    },

    Q(
      "osm_relation_area_m2",
      s"""WITH $duckRingsCte,
         |rel AS (
         |  SELECT o_custkey AS relation_id,
         |         CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
         |              THEN 'outer' ELSE 'inner' END AS role,
         |         abs(shoe) AS a
         |  FROM orders JOIN rings ON o_orderkey = way_id)
         |SELECT relation_id,
         |       CAST(sum(CASE WHEN role = 'outer' THEN 1 ELSE 0 END) AS BIGINT) AS n_outer,
         |       CAST(sum(CASE WHEN role = 'inner' THEN 1 ELSE 0 END) AS BIGINT) AS n_inner,
         |       round(CAST(CAST(sum(CASE WHEN role = 'outer' THEN a ELSE 0 END) AS BIGINT) AS DOUBLE) * 619667.12, 1) AS outer_m2,
         |       round(CAST(CAST(sum(CASE WHEN role = 'inner' THEN a ELSE 0 END) AS BIGINT) AS DOUBLE) * 619667.12, 1) AS inner_m2,
         |       round(CAST(CAST(sum(CASE WHEN role = 'outer' THEN a ELSE -a END) AS BIGINT) AS DOUBLE) * 619667.12, 1) AS area_m2
         |FROM rel GROUP BY relation_id
         |ORDER BY relation_id""".stripMargin
    ) { (s, d) =>
      // MultiPolygon ST_Area in m² — the relation-level twin of
      // `osm_way_area_m2`, and the number a PostGIS user reads off the
      // area layers for multipolygon relations: Σ outer-role ring areas
      // MINUS Σ inner-role (hole) areas, roles as in
      // `osm_relation_multipolygon_wkb`. Where the WKB op REPAIRS broken
      // tagging (no outer role → largest ring promoted to shell), this
      // op deliberately REPORTS it: a relation whose hole area exceeds
      // its shell area nets NEGATIVE — exactly the QA signal a pipeline
      // flags before serving (the two ops are complementary views of the
      // same role data). All accumulation is exact BIGINT |shoe| — the
      // per-relation sums are partition-order invariant and bit-identical
      // cross-engine; each m² figure is ONE IEEE multiply of an exact
      // integer by the literal 1113.2²/2 factor, final-only rounding.
      // Plan: the same single fact⋈fact join + one partial+final agg as
      // osm_relation_wkb — no window, no second shuffle.
      val rings = wayRings(s, d).select(col("way_id"), abs(col("shoe")).as("a"))
      val k = 619667.12
      T.orders(s, d)
        .select(col("o_custkey").as("relation_id"), col("o_orderkey"),
          when(col("o_orderpriority").startsWith("1")
                 || col("o_orderpriority").startsWith("2"), "outer")
            .otherwise("inner").as("role"))
        .join(rings, col("o_orderkey") === col("way_id"))
        .groupBy(col("relation_id"))
        .agg(
          sum(when(col("role") === "outer", 1L).otherwise(0L)).as("n_outer"),
          sum(when(col("role") === "inner", 1L).otherwise(0L)).as("n_inner"),
          round(sum(when(col("role") === "outer", col("a")).otherwise(0L))
            .cast("double") * k, 1).as("outer_m2"),
          round(sum(when(col("role") === "inner", col("a")).otherwise(0L))
            .cast("double") * k, 1).as("inner_m2"),
          round(sum(when(col("role") === "outer", col("a")).otherwise(-col("a")))
            .cast("double") * k, 1).as("area_m2"))
        .orderBy(col("relation_id"))
    },

    Q(
      "osm_point_in_polygon",
      s"""WITH $duckRingsCte,
         |pois AS (
         |  SELECT p_partkey AS node_id, p_size * 100 AS px,
         |         CAST(round(p_retailprice * 100) AS BIGINT) AS py
         |  FROM part WHERE p_partkey % 97 = 0)
         |SELECT way_id, count(*) AS n_pois
         |FROM rings, pois
         |WHERE px BETWEEN list_min(clons) AND list_max(clons)
         |  AND py BETWEEN list_min(clats) AND list_max(clats)
         |  AND (list_sum(list_transform(range(2, len(clons) + 1), i ->
         |        CASE WHEN (clats[i-1] > py) <> (clats[i] > py)
         |              AND ((clons[i-1] - px) * (clats[i] - clats[i-1])
         |                   + (clons[i] - clons[i-1]) * (py - clats[i-1]))
         |                  * (clats[i] - clats[i-1]) > 0
         |             THEN 1 ELSE 0 END)) % 2 = 1)
         |GROUP BY way_id
         |ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // ST_Contains over the assembled area geometry — the defining query
      // of the reference's terminal store ("amenable to efficient
      // querying" in PostGIS, README.md:70): which POIs fall inside each
      // way-polygon. Same scalable shape as join_spatial_grid: the
      // inequality NEVER drives the join — polygons explode over the
      // coarse grid cells their bbox covers, POIs snap to their cell,
      // the equi-join proposes candidates, bbox + exact crossing-number
      // (PointInRing, codegen'd integer kernel, boundary-consistent with
      // the oracle) decide them, and pair-dedupe absorbs multi-cell
      // meetings. POI side is size-gated broadcast (dim-sized here;
      // fact-sized POIs degrade to a cell-key shuffle). Cell size is a
      // replication-vs-precision knob per axis (coords are centi-units;
      // lat spans ~24× lon on this fixture).
      val pois = T.part(s, d).where(col("p_partkey") % 97 === 0).select(
        col("p_partkey").as("node_id"),
        (col("p_size").cast("long") * 100).as("px"),
        round(col("p_retailprice") * 100).cast("long").as("py"),
        expr("(p_size * 100) DIV 2500").as("cx"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT) DIV 60000").as("cy"))
      val polyCells = wayRings(s, d)
        .select(col("way_id"),
          expr("transform(ring, p -> p.lon_c)").as("rlons"),
          expr("transform(ring, p -> p.lat_c)").as("rlats"))
        .withColumn("minx", expr("array_min(rlons)"))
        .withColumn("maxx", expr("array_max(rlons)"))
        .withColumn("miny", expr("array_min(rlats)"))
        .withColumn("maxy", expr("array_max(rlats)"))
        .withColumn("cx", explode(sequence(expr("minx DIV 2500"), expr("maxx DIV 2500"))))
        .withColumn("cy", explode(sequence(expr("miny DIV 60000"), expr("maxy DIV 60000"))))
      polyCells
        .join(graft.Gate.bcast(pois), Seq("cx", "cy"))
        .where(col("px").between(col("minx"), col("maxx")) &&
               col("py").between(col("miny"), col("maxy")))
        .where(graft.functions.PointInRing(col("rlons"), col("rlats"), col("px"), col("py")))
        .select(col("node_id"), col("way_id")).distinct()
        .groupBy(col("way_id")).agg(count(lit(1)).as("n_pois"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_poly_overlaps", {
        val segP = segInt("ea.x1", "ea.y1", "ea.x2", "ea.y2",
                          "eb.x1", "eb.y1", "eb.x2", "eb.y2")
        val duckEdges =
          "list_transform(range(2, len(clons) + 1), i -> " +
          "{'x1': clons[i-1], 'y1': clats[i-1], 'x2': clons[i], 'y2': clats[i]})"
        val edgeCross =
          s"len(list_filter(aedges, ea -> len(list_filter(bedges, eb -> $segP)) > 0)) > 0"
        val aInB = s"len(list_filter(range(1, len(alons) + 1), i -> " +
          s"list_sum(list_transform(bedges, eb -> ${insideCase("alons[i]", "alats[i]", "eb")})) % 2 = 1)) > 0"
        val bInA = s"len(list_filter(range(1, len(blons) + 1), i -> " +
          s"list_sum(list_transform(aedges, ea -> ${insideCase("blons[i]", "blats[i]", "ea")})) % 2 = 1)) > 0"
        s"""WITH $duckRingsCte,
           |la AS (SELECT way_id AS way_a, clons AS alons, clats AS alats, $duckEdges AS aedges,
           |              list_min(clons) AS aminx, list_max(clons) AS amaxx,
           |              list_min(clats) AS aminy, list_max(clats) AS amaxy
           |       FROM rings WHERE way_id % 499 = 0),
           |lb AS (SELECT way_id AS way_b, clons AS blons, clats AS blats, $duckEdges AS bedges,
           |              list_min(clons) AS bminx, list_max(clons) AS bmaxx,
           |              list_min(clats) AS bminy, list_max(clats) AS bmaxy
           |       FROM rings WHERE way_id % 499 = 13)
           |SELECT way_a, way_b FROM la, lb
           |WHERE aminx <= bmaxx AND bminx <= amaxx AND aminy <= bmaxy AND bminy <= amaxy
           |  AND (($edgeCross) OR ($aInB) OR ($bInA))
           |ORDER BY way_a, way_b""".stripMargin
      }
    ) { (s, d) =>
      // Ring-exact polygon⋈polygon ST_Intersects (VERDICT r13 missing
      // #2): area-overlaps-area between two layers over the ACTUAL
      // assembled rings, not bboxes — the PostGIS `a.geom && b.geom AND
      // ST_Intersects(a.geom, b.geom)` pair over two area layers
      // (README.md:70,80-82). Exact decision rule: two rings intersect
      // iff some edge pair intersects (4-orientation + collinear-touch
      // test, [[segInt]]) or one ring's vertex lies strictly inside the
      // other (crossing number, [[insideCase]]) — all BIGINT cross
      // products, bit-identical cross-engine, no epsilon. Scale shape =
      // join_spatial_grid's: both layers explode their bbox over coarse
      // grid cells, the cell EQUI-join proposes candidates (never the
      // inequality), bbox-overlap prefilters, the exact kernel decides,
      // and the pair dedupes WITHOUT a distinct — only the cell holding
      // the pair's bbox-intersection min corner reports it (both boxes
      // cover that cell by construction, so exactly one cell emits).
      // Fixture caveat, documented: random-vertex rings have near-global
      // bboxes, so the grid prunes little HERE; on real OSM geometry
      // (local polygons) the same plan prunes to near-linear candidates.
      // Layers are sparse (way_id mod 499) to keep the degenerate
      // fixture's candidate quadratic bounded — the plan, not the
      // subset, is what scales. The exact kernel runs FUSED
      // (functions.RingsIntersect — branch-identical to the template the
      // oracle keeps, all-Long so equality is exact; pinned by
      // RingsIntersectSpec; 2.2 s → sub-second, the PolyPairPass lesson).
      val edgesExpr =
        "zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1), " +
        "(a, b) -> named_struct('x1', CAST(a.lon_c AS BIGINT), 'y1', CAST(a.lat_c AS BIGINT), " +
        "'x2', CAST(b.lon_c AS BIGINT), 'y2', CAST(b.lat_c AS BIGINT)))"
      val vertsExpr =
        "transform(ring, x -> named_struct('x', CAST(x.lon_c AS BIGINT), 'y', CAST(x.lat_c AS BIGINT)))"
      def layer(m: Int, p: String) = wayRings(s, d)
        .where(col("way_id") % 499 === m)
        .select(col("way_id").as(s"way_$p"),
          expr("transform(ring, x -> x.lon_c)").as(s"${p}lons"),
          expr("transform(ring, x -> x.lat_c)").as(s"${p}lats"),
          expr(edgesExpr).as(s"${p}edges"),
          expr(vertsExpr).as(s"${p}verts"))
        .withColumn(s"${p}minx", expr(s"array_min(${p}lons)"))
        .withColumn(s"${p}maxx", expr(s"array_max(${p}lons)"))
        .withColumn(s"${p}miny", expr(s"array_min(${p}lats)"))
        .withColumn(s"${p}maxy", expr(s"array_max(${p}lats)"))
        .withColumn("cx", explode(sequence(expr(s"${p}minx DIV 2500"), expr(s"${p}maxx DIV 2500"))))
        .withColumn("cy", explode(sequence(expr(s"${p}miny DIV 60000"), expr(s"${p}maxy DIV 60000"))))
      layer(0, "a")
        .join(layer(13, "b"), Seq("cx", "cy"))
        .where(col("aminx") <= col("bmaxx") && col("bminx") <= col("amaxx") &&
               col("aminy") <= col("bmaxy") && col("bminy") <= col("amaxy"))
        .where(expr("cx = greatest(aminx, bminx) DIV 2500 AND cy = greatest(aminy, bminy) DIV 60000"))
        .where(graft.functions.RingsIntersect(col("aedges"), col("averts"),
                                              col("bedges"), col("bverts")))
        .select(col("way_a"), col("way_b"))
        .orderBy(col("way_a"), col("way_b"))
    },

    Q(
      "osm_poly_clip_area", {
        val duckEdges =
          "list_transform(range(2, len(clons) + 1), i -> " +
          "{'x1': clons[i-1], 'y1': clats[i-1], 'x2': clons[i], 'y2': clats[i]})"
        s"""WITH $duckRingsCte,
           |ew AS (SELECT way_id, $duckEdges AS edges,
           |              list_min(clons) AS minx, list_max(clons) AS maxx,
           |              list_min(clats) AS miny, list_max(clats) AS maxy
           |       FROM rings WHERE way_id % 7 = 0),
           |tx_e AS (SELECT *, unnest(range(minx // 2500, maxx // 2500 + 1)) AS tx FROM ew),
           |ty_e AS (SELECT *, unnest(range(miny // 60000, maxy // 60000 + 1)) AS ty FROM tx_e),
           |cells AS (SELECT way_id, edges, tx, ty,
           |                 tx * 2500 AS rx0, (tx + 1) * 2500 AS rx1,
           |                 ty * 60000 AS ry0, (ty + 1) * 60000 AS ry1
           |          FROM ty_e),
           |calc AS (SELECT way_id, tx, ty,
           |                list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |                  list_transform(edges, e -> ${clipTrapTerm("e")})),
           |                  (acc, x) -> acc + x) AS s
           |         FROM cells)
           |SELECT way_id, tx, ty, round(s * -1.23933424, 1) + 0.0 AS area_km2
           |FROM calc WHERE s <> 0.0
           |ORDER BY way_id, tx, ty""".stripMargin
      }
    ) { (s, d) =>
      // Exact ST_Intersection-class AREA over the actual rings (VERDICT
      // r13 missing #1): the winding area of each way-polygon ∩ each
      // serving tile its bbox covers — the "residential landuse ∩ flood
      // zone area" query (README.md:70,80-82) when the zone is a tile
      // set, computed on the assembled shoelace rings, not bboxes. No
      // Sutherland–Hodgman vertex clipping and no rational coordinates:
      // per tile, Green's theorem turns the clipped area into a SUM OF
      // PER-EDGE closed-form integrals ([[clipTrapTerm]]) — each edge's
      // contribution needs only that edge and the tile bounds, so the
      // whole kernel is one codegen'd fold over the ring array, map-only
      // after the explode. Signed semantics: CCW positive, matching the
      // shoelace; Σ over a way's tiles reproduces shoe/2 (1-ulp checked
      // on every fixture way — the decomposition is conservative).
      // Scale shape: rings explode over ONLY their bbox-covered tiles
      // (output is tile-partitionable work, the same shape the bbox
      // union kernel scales by); each (way, tile) row is independent —
      // no shuffle beyond the regroup the ring assembly already paid.
      // Way subset (mod 7) bounds the degenerate fixture's near-global
      // bboxes, as in osm_poly_overlaps.
      val edgesExpr =
        "zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1), " +
        "(a, b) -> named_struct('x1', a.lon_c, 'y1', a.lat_c, 'x2', b.lon_c, 'y2', b.lat_c))"
      wayRings(s, d)
        .where(col("way_id") % 7 === 0)
        .select(col("way_id"), expr(edgesExpr).as("edges"),
          expr("array_min(transform(ring, x -> x.lon_c))").as("minx"),
          expr("array_max(transform(ring, x -> x.lon_c))").as("maxx"),
          expr("array_min(transform(ring, x -> x.lat_c))").as("miny"),
          expr("array_max(transform(ring, x -> x.lat_c))").as("maxy"))
        // tx/ty are OUTPUT columns here (unlike the internal grid-join
        // cells above, which only need self-consistency): they must
        // match the oracle's `//`, which FLOORS, while Spark's DIV
        // truncates toward zero — divergent for negative coordinates.
        // FLOOR over double division is exact at centi-unit magnitudes
        // (|coord| < 2^31 ≪ 2^53).
        .withColumn("tx", explode(sequence(
          expr("CAST(FLOOR(minx / 2500.0) AS BIGINT)"),
          expr("CAST(FLOOR(maxx / 2500.0) AS BIGINT)"))))
        .withColumn("ty", explode(sequence(
          expr("CAST(FLOOR(miny / 60000.0) AS BIGINT)"),
          expr("CAST(FLOOR(maxy / 60000.0) AS BIGINT)"))))
        .withColumn("rx0", col("tx") * 2500)
        .withColumn("rx1", (col("tx") + 1) * 2500)
        .withColumn("ry0", col("ty") * 60000)
        .withColumn("ry1", (col("ty") + 1) * 60000)
        // r19 opt: the per-(way, tile) edge fold ran as an aggregate()
        // lambda — interpreted per edge×tile. functions/ClipTrapFold is
        // the same left-associated acc+term sequence with every double
        // op mirrored op-for-op from the clipTrapTerm SQL template, as
        // one native loop per row; the oracle hash pins the IEEE
        // equivalence. (An earlier A/B that exploded the edges into a
        // codegen projection + hash agg measured 2.02 s vs 1.51 s — the
        // row explosion cost more than interpretation; fusing WITHOUT
        // exploding is the shape that wins.)
        .withColumn("s", graft.functions.ClipTrapFold(
          col("edges"), col("rx0"), col("rx1"), col("ry0"), col("ry1")))
        .where(col("s") =!= 0.0)
        .select(col("way_id"), col("tx"), col("ty"),
          (round(col("s") * -1.23933424, 1) + lit(0.0)).as("area_km2"))
        .orderBy(col("way_id"), col("tx"), col("ty"))
    },

    Q(
      "osm_poly_pair_area", {
        val duckEdges =
          "list_transform(range(2, len(clons) + 1), i -> " +
          "{'x1': clons[i-1], 'y1': clats[i-1], 'x2': clons[i], 'y2': clats[i]})"
        val passA = pairPass(duck = true, "aedges", "bedges")
        val passB = pairPass(duck = true, "bedges", "aedges")
        s"""WITH $duckRingsCte,
           |la AS (SELECT way_id AS way_a, $duckEdges AS aedges,
           |              CASE WHEN shoe >= 0 THEN 1.0 ELSE -1.0 END AS sa,
           |              list_min(clons) AS aminx, list_max(clons) AS amaxx,
           |              list_min(clats) AS aminy, list_max(clats) AS amaxy
           |       FROM rings WHERE way_id % 1499 = 0),
           |lb AS (SELECT way_id AS way_b, $duckEdges AS bedges,
           |              CASE WHEN shoe >= 0 THEN 1.0 ELSE -1.0 END AS sb,
           |              list_min(clons) AS bminx, list_max(clons) AS bmaxx,
           |              list_min(clats) AS bminy, list_max(clats) AS bmaxy
           |       FROM rings WHERE way_id % 1499 = 13),
           |pairs AS (
           |  SELECT way_a, way_b,
           |         round(sa * sb * (($passA) + ($passB)) * 0.61966712, 1) + 0.0 AS inter_km2
           |  FROM la, lb
           |  WHERE aminx <= bmaxx AND bminx <= amaxx AND aminy <= bmaxy AND bminy <= amaxy)
           |SELECT way_a, way_b, inter_km2 FROM pairs
           |WHERE inter_km2 <> 0.0
           |ORDER BY way_a, way_b""".stripMargin
      }
    ) { (s, d) =>
      // Exact pairwise ST_Intersection AREA between two area layers —
      // the capstone of the overlay trio: osm_poly_overlaps answers
      // WHETHER two polygons intersect, osm_poly_clip_area measures a
      // polygon against the fixed tile grid, and this key measures each
      // overlapping PAIR against each other — PostGIS's
      // `ST_Area(ST_Intersection(a.geom, b.geom))` over two layers, the
      // literal "residential landuse ∩ flood zone km²" serving query
      // (README.md:70,80-82). The kernel ([[pairPass]]) needs no
      // polygon-clipping library: along a straight edge x dy − y dx is
      // constant, so 2·∬w_A·w_B = Σ_{∂A} cross·measure(w_B) +
      // Σ_{∂B} cross·measure(w_A), where each edge's [0,1] parameter
      // splits at EXACT-BIGINT-decided crossings and each sub-interval
      // weighs by its midpoint's winding number. Winding semantics,
      // consistent with clip/shoelace (self-intersecting fixture rings
      // get their signed measure); orientation normalizes by the shoe
      // sign so CW/CCW inputs agree. Scale shape = osm_poly_overlaps':
      // layer⋈layer candidates come from the bbox prefilter (the grid
      // cell equi-join at real-OSM locality; the near-global random
      // bboxes here make cells pure overhead, so the sparser mod-1499
      // layers bound the quadratic instead — the PLAN is what scales);
      // per-pair work is |E_A|·|E_B| exact integer ops, map-only after
      // the join. round(km², 1) at ~1e7 magnitude — inside the r13
      // rounding-safety rule; `+ 0.0` normalizes −0.0. The Spark side
      // runs the FUSED native kernel (functions.PolyPairPass — the
      // RollingHash lesson: five nested interpreted lambdas measured
      // 5.3 s at sf0.1, the compiled loop with the IDENTICAL IEEE
      // dataflow is bit-equal and fast); the oracle keeps the template,
      // and PolyPairAreaSpec pins template ≡ kernel on fixtures and
      // pseudo-random self-intersecting rings. Candidates come from the
      // osm_poly_overlaps grid: bbox→cell explode, cell EQUI-join (never
      // the inequality — PlanSpec pins no CartesianProduct), bbox
      // prefilter, min-corner cell dedup (exactly one cell emits each
      // pair, no distinct), THEN the expensive kernel on survivors only.
      val edgesExpr =
        "zip_with(slice(ring, 1, size(ring) - 1), slice(ring, 2, size(ring) - 1), " +
        "(a, b) -> named_struct('x1', CAST(a.lon_c AS BIGINT), 'y1', CAST(a.lat_c AS BIGINT), " +
        "'x2', CAST(b.lon_c AS BIGINT), 'y2', CAST(b.lat_c AS BIGINT)))"
      def layer(m: Int, p: String) = wayRings(s, d)
        .where(col("way_id") % 1499 === m)
        .select(col("way_id").as(s"way_$p"),
          expr(edgesExpr).as(s"${p}edges"),
          when(col("shoe") >= 0, 1.0).otherwise(-1.0).as(s"s$p"),
          expr("array_min(transform(ring, x -> x.lon_c))").as(s"${p}minx"),
          expr("array_max(transform(ring, x -> x.lon_c))").as(s"${p}maxx"),
          expr("array_min(transform(ring, x -> x.lat_c))").as(s"${p}miny"),
          expr("array_max(transform(ring, x -> x.lat_c))").as(s"${p}maxy"))
        .withColumn("cx", explode(sequence(expr(s"${p}minx DIV 2500"), expr(s"${p}maxx DIV 2500"))))
        .withColumn("cy", explode(sequence(expr(s"${p}miny DIV 60000"), expr(s"${p}maxy DIV 60000"))))
      val passA = graft.functions.PolyPairPass(col("aedges"), col("bedges"))
      val passB = graft.functions.PolyPairPass(col("bedges"), col("aedges"))
      layer(0, "a")
        .join(layer(13, "b"), Seq("cx", "cy"))
        .where(col("aminx") <= col("bmaxx") && col("bminx") <= col("amaxx") &&
               col("aminy") <= col("bmaxy") && col("bminy") <= col("amaxy"))
        .where(expr("cx = greatest(aminx, bminx) DIV 2500 AND cy = greatest(aminy, bminy) DIV 60000"))
        .select(col("way_a"), col("way_b"),
          (round(col("sa") * col("sb") * (passA + passB) * 0.61966712, 1)
            + lit(0.0)).as("inter_km2"))
        .where(col("inter_km2") =!= 0.0)
        .orderBy(col("way_a"), col("way_b"))
    },

    Q(
      "osm_layer_extract",
      """SELECT layer, p_partkey AS element_id, brand, size_val
        |FROM (
        |  SELECT 'heavy' AS layer, p_partkey, p_brand AS brand, p_size AS size_val
        |  FROM part WHERE p_size >= 25
        |  UNION ALL
        |  SELECT 'premium', p_partkey, p_brand, p_size
        |  FROM part WHERE p_retailprice > 1500)
        |ORDER BY layer, element_id""".stripMargin
    ) { (s, d) =>
      // Flex-style shredding (README.md:93): element tags → map column; a
      // layer spec = (tag predicate, promoted typed columns). Since r13
      // the spec is DATA — a checked-in JSON style compiled to Catalyst
      // columns by graft.config.LayerSpecs (VERDICT r12 item 5: PgOSM
      // Flex's defining feature is that layer styles are configuration,
      // not code). The compiled plan is byte-identical to the previously
      // hardcoded one: one scan, codegen'd predicates, one generator
      // (explode-of-matching-layers) regardless of layer count. One
      // element can route to several layers, exactly like OSM layer sets.
      val spec = graft.config.LayerSpecs.default
      val tagged = T.part(s, d).select(
        col("p_partkey"),
        map(lit("brand"), col("p_brand"),
            lit("size"), col("p_size").cast("string"),
            lit("price"), col("p_retailprice").cast("string")).as("tags"))
      tagged
        .select(col("p_partkey"), col("tags"), spec.layersCol.as("layers"))
        .select(col("p_partkey"), col("tags"), explode(col("layers")).as("layer"))
        .select(col("layer") +: col("p_partkey").as("element_id") +:
                spec.promotions.map { case (name, c) => c.as(name) }: _*)
        .orderBy(col("layer"), col("element_id"))
    },

    Q(
      "osm_duplicate_ways",
      """WITH w AS (
        |  SELECT l_orderkey AS way_id,
        |         string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS sig
        |  FROM lineitem GROUP BY 1),
        |g AS (
        |  SELECT sig, CAST(count(*) AS BIGINT) AS n_ways,
        |         CAST(min(way_id) AS BIGINT) AS canonical_id,
        |         string_agg(CAST(way_id AS VARCHAR), ',' ORDER BY way_id) AS way_ids
        |  FROM w GROUP BY sig HAVING count(*) > 1)
        |SELECT md5(sig) AS sig_hash, n_ways, canonical_id, way_ids
        |FROM g
        |ORDER BY canonical_id""".stripMargin
    ) { (s, d) =>
      // Duplicate-GEOMETRY detection — the OSM QA check (JOSM/Osmose
      // "duplicated way" validator): two ways tracing the identical
      // ordered node sequence are almost always an upload accident, and
      // the fixer needs the whole group with a canonical survivor. The
      // signature is the ordered node-ref list serialized to one string
      // (exact integers — no geometry tolerance games), grouped once;
      // groups of one drop out. dedup_exact's shape on the way table:
      // the regroup shuffle carries |ways| signature strings, the dup
      // report is tiny by construction. The emitted key is md5(sig) —
      // identical hex in both engines — so downstream tooling can join
      // fixes back without shipping the full signature.
      // r20 opt: both signature builds ran as interpreted transform(..,
      // CAST(x AS STRING)) lambdas + array_join (one UTF8String per
      // element per row); StructLongCsv/LongsCsv render the identical
      // bytes (CAST(bigint AS STRING) = Long.toString) in one fused
      // pass. array_sort stays outside — it is codegen-native.
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .groupBy(col("way_id"))
        .agg(graft.functions.CsvJoins.structCsv(
          expr("array_sort(collect_list(struct(pos, node_ref)))")).as("sig"))
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("n_ways"),
             min(col("way_id")).as("canonical_id"),
             graft.functions.CsvJoins.longsCsv(
               expr("array_sort(collect_list(way_id))")).as("way_ids"))
        .where(col("n_ways") > 1)
        .select(md5(col("sig").cast("binary")).as("sig_hash"),
                col("n_ways"), col("canonical_id"), col("way_ids"))
        .orderBy(col("canonical_id"))
    },

    Q(
      "osm_hausdorff_pairs",
      """WITH pts AS (
        |  SELECT l_orderkey AS way_id, CAST(p_size * 100 AS BIGINT) AS x,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |seq AS (
        |  SELECT l_orderkey AS way_id, l_partkey AS node_ref,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_linenumber, l_partkey) AS pos
        |  FROM lineitem),
        |edges AS (
        |  SELECT a.way_id, least(a.node_ref, b.node_ref) AS n1,
        |         greatest(a.node_ref, b.node_ref) AS n2
        |  FROM seq a JOIN seq b ON a.way_id = b.way_id AND b.pos = a.pos + 1),
        |pairs AS (
        |  SELECT a.way_id AS way_a, b.way_id AS way_b,
        |         CAST(count(*) AS BIGINT) AS n_shared
        |  FROM edges a JOIN edges b
        |    ON a.n1 = b.n1 AND a.n2 = b.n2 AND a.way_id < b.way_id
        |  GROUP BY 1, 2),
        |dab AS (
        |  SELECT p.way_a, p.way_b, pa.x, pa.y,
        |         min((pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y)) AS dmin
        |  FROM pairs p JOIN pts pa ON pa.way_id = p.way_a
        |               JOIN pts pb ON pb.way_id = p.way_b
        |  GROUP BY 1, 2, 3, 4),
        |hab AS (SELECT way_a, way_b, CAST(max(dmin) AS BIGINT) AS h_ab FROM dab GROUP BY 1, 2),
        |dba AS (
        |  SELECT p.way_a, p.way_b, pb.x, pb.y,
        |         min((pa.x - pb.x) * (pa.x - pb.x) + (pa.y - pb.y) * (pa.y - pb.y)) AS dmin
        |  FROM pairs p JOIN pts pa ON pa.way_id = p.way_a
        |               JOIN pts pb ON pb.way_id = p.way_b
        |  GROUP BY 1, 2, 3, 4),
        |hba AS (SELECT way_a, way_b, CAST(max(dmin) AS BIGINT) AS h_ba FROM dba GROUP BY 1, 2)
        |SELECT p.way_a, p.way_b, p.n_shared, hab.h_ab, hba.h_ba,
        |       greatest(hab.h_ab, hba.h_ba) AS hausdorff2
        |FROM pairs p JOIN hab USING (way_a, way_b) JOIN hba USING (way_a, way_b)
        |ORDER BY p.way_a, p.way_b""".stripMargin
    ) { (s, d) =>
      // Discrete Hausdorff distance between NEAR-duplicate way pairs —
      // the QA rung above osm_duplicate_ways: that key catches ways with
      // IDENTICAL node sequences; this one scores how far apart two ways
      // that merely SHARE geometry actually run (JOSM's "overlapping
      // ways" class needs the magnitude to rank fixes). H²(A,B) =
      // max(h(A,B), h(B,A)), h(A,B) = max over A's vertices of the min
      // squared centi-unit distance to B's vertices — pure BIGINT, no
      // sqrt, no epsilon, bit-identical in both engines. Scale shape:
      // candidate pairs come from SHARED-EDGE blocking (two ways are
      // "overlapping" in the JOSM sense only when they trace a common
      // SEGMENT, i.e. the same consecutive node pair): the normalized
      // edge table equi-joins on (n1, n2) — measured at sf0.1 this
      // drives ~500 joined rows where the first cut (ways sharing ≥3
      // nodes ANYWHERE) drove a 9M-row expansion that then produced
      // ZERO survivors; the point×point expansion runs only per
      // surviving pair, bounded by way length² — the index-first,
      // measure-second asymmetry Osmose runs at planet scale.
      val pts = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .select(col("way_id"), col("lon_c").as("x"), col("lat_c").as("y"))
      // edges via ONE per-way regroup (the osm_way_geometry discipline —
      // a window + positional self-join would pay two extra exchanges)
      val edges = T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber"),
                col("l_partkey").as("node_ref"))
        .groupBy(col("way_id"))
        .agg(expr("transform(array_sort(collect_list(struct(l_linenumber, node_ref))), p -> p.node_ref)")
               .as("ns"))
        .select(col("way_id"), explode(expr(
          """transform(slice(ns, 1, size(ns) - 1),
            |          (x, i) -> struct(least(x, ns[i + 1]) AS n1,
            |                           greatest(x, ns[i + 1]) AS n2))""".stripMargin)).as("e"))
        .select(col("way_id"), col("e.n1").as("n1"), col("e.n2").as("n2"))
      val pairs = edges.as("a")
        .join(edges.as("b"),
              col("a.n1") === col("b.n1") && col("a.n2") === col("b.n2") &&
              col("a.way_id") < col("b.way_id"))
        .groupBy(col("a.way_id").as("way_a"), col("b.way_id").as("way_b"))
        .agg(count(lit(1)).cast("long").as("n_shared"))
      // r19 opt: carry n_shared INTO the cached cross so the final join
      // no longer recomputes the whole pairs subtree (the before-plan
      // duplicated operators 1-25: a second edge regroup + self-join).
      // The pre-persist repartition BALANCES the cached cross over the
      // executor slots for the two directed-agg passes (an AQE-planned
      // cache reports unknown partitioning downstream, so the exchange
      // is not elided — but the balance is what pays: measured 1.87 s
      // with vs 2.46 s without at sf0.1 isolated).
      // r19 A/B (follow-ups, all reverted): gate-broadcasting pairs and
      // the pair×A-points product (the gate falls back — aggregate-side
      // size estimates are inflated), forcing real sizes via
      // localCheckpoint (1.65 → 1.87 s: two barriers cost more than the
      // SMJ→BHJ saves), and gate-broadcasting hba (1.65 → 1.95 s). The
      // committed shape below stands on those measurements.
      val cross = graft.Caches.register(pairs
        .join(pts.select(col("way_id").as("way_a"), col("x").as("xa"), col("y").as("ya")), Seq("way_a"))
        .join(pts.select(col("way_id").as("way_b"), col("x").as("xb"), col("y").as("yb")), Seq("way_b"))
        .withColumn("d2", (col("xa") - col("xb")) * (col("xa") - col("xb")) +
                          (col("ya") - col("yb")) * (col("ya") - col("yb")))
        .repartition(col("way_a"), col("way_b"))
        .persist())
      def directed(px: String, py: String, out: String) = cross
        .groupBy(col("way_a"), col("way_b"), col("n_shared"), col(px), col(py))
        .agg(min(col("d2")).as("dmin"))
        .groupBy(col("way_a"), col("way_b"), col("n_shared"))
        .agg(max(col("dmin")).cast("long").as(out))
      val hab = directed("xa", "ya", "h_ab")
      val hba = directed("xb", "yb", "h_ba").drop("n_shared")
      // (gate-broadcasting hba here measured 1.95 s vs 1.65–1.87 s for
      // the plain join across repeats — never better; reverted)
      hab.join(hba, Seq("way_a", "way_b"))
        .select(col("way_a"), col("way_b"), col("n_shared"), col("h_ab"), col("h_ba"),
                greatest(col("h_ab"), col("h_ba")).as("hausdorff2"))
        .orderBy(col("way_a"), col("way_b"))
    },

    Q(
      "osm_tag_cooccurrence",
      """WITH t AS (
        |  SELECT p_partkey,
        |         list_filter([
        |           CASE WHEN p_size >= 25 THEN 'heavy' END,
        |           CASE WHEN p_retailprice > 970 THEN 'premium' END,
        |           CASE WHEN p_type = 'PROMO' THEN 'promo' END,
        |           CASE WHEN p_size < 10 THEN 'small' END,
        |           CASE WHEN p_brand LIKE 'Brand#4%' THEN 'brand4' END
        |         ], x -> x IS NOT NULL) AS tags
        |  FROM part),
        |e1 AS (SELECT p_partkey, tags, unnest(tags) AS k1 FROM t),
        |e2 AS (SELECT p_partkey, k1, unnest(tags) AS k2 FROM e1),
        |c AS (
        |  SELECT k1 AS tag_a, k2 AS tag_b, count(*) AS n_elements
        |  FROM e2 WHERE k1 < k2 GROUP BY 1, 2),
        |tot AS (SELECT count(*) AS n FROM part)
        |SELECT tag_a, tag_b, n_elements,
        |       (1000000 * n_elements) // n AS support_ppm
        |FROM c, tot
        |ORDER BY tag_a, tag_b""".stripMargin
    ) { (s, d) =>
      // Tag CO-OCCURRENCE — taginfo's core statistic ("which tags appear
      // together?"), the market-basket readout mappers use to find
      // tagging conventions and QA tools use to flag unlikely combos.
      // Presence tags derive from predicates over the element's typed
      // columns (the flex promotion in reverse), each element carries a
      // ≤5-entry tag array, and unordered pairs come from two in-row
      // generators with a k1 < k2 cut (each pair counted once; the pair
      // stream is ≤ C(5,2)·|elements|, map-side). One bounded-key count
      // (tag vocabulary², tiny) + a 1-row total broadcast for the exact
      // integer support ppm. At 100 TB the pair explode stays in the
      // scan stage — the only shuffle carries |tag-pairs| counts.
      val tags = T.part(s, d).select(
        col("p_partkey"),
        expr("""filter(array(
               |  IF(p_size >= 25, 'heavy', NULL),
               |  IF(p_retailprice > 970, 'premium', NULL),
               |  IF(p_type = 'PROMO', 'promo', NULL),
               |  IF(p_size < 10, 'small', NULL),
               |  IF(p_brand LIKE 'Brand#4%', 'brand4', NULL)),
               |x -> x IS NOT NULL)""".stripMargin).as("tags"))
      val total = T.part(s, d).agg(count(lit(1)).as("n"))
      tags
        .select(col("p_partkey"), col("tags"), explode(col("tags")).as("k1"))
        .select(col("p_partkey"), col("k1"), explode(col("tags")).as("k2"))
        .where(col("k1") < col("k2"))
        .groupBy(col("k1").as("tag_a"), col("k2").as("tag_b"))
        .agg(count(lit(1)).as("n_elements"))
        .crossJoin(Gate.bcast(total))
        .selectExpr("tag_a", "tag_b", "n_elements",
                    "(1000000 * n_elements) DIV n AS support_ppm")
        .orderBy(col("tag_a"), col("tag_b"))
    },

    // Douglas–Peucker generalization of assembled ways (the reference
    // stack's low-zoom generalized layers; PostGIS ST_Simplify). The
    // kernel (functions/SimplifyIndices.scala) emits KEPT point indices
    // so the same pass serves any row layout; tolerance is in integer
    // centi-units. Recursive geometry → no SQL oracle; SimplifySpec
    // asserts endpoints, subsequence, the deviation bound against brute
    // force, and idempotence.
    Q.smoke("osm_way_simplify") { (s, d) =>
      val tol = 20000L // 200 units: meaningful reduction on this corpus
      T.lineitem(s, d)
        .select(col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
                col("l_partkey").as("node_ref"))
        .join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(expr("array_sort(collect_list(struct(pos, node_ref, lon_c, lat_c)))").as("pts"))
        .withColumn("rlons", expr("transform(pts, p -> p.lon_c)"))
        .withColumn("rlats", expr("transform(pts, p -> p.lat_c)"))
        .withColumn("keep",
          graft.functions.SimplifyIndices(col("rlons"), col("rlats"), lit(tol)))
        .select(col("way_id"),
          size(col("pts")).cast("long").as("n_points"),
          size(col("keep")).cast("long").as("n_kept"),
          graft.functions.WkbLineString(
            expr("transform(keep, i -> CAST(element_at(rlons, i + 1) AS DOUBLE) / 100.0D)"),
            expr("transform(keep, i -> CAST(element_at(rlats, i + 1) AS DOUBLE) / 100.0D)")).as("wkb"))
        .select(col("way_id"), col("n_points"), col("n_kept"),
                octet_length(col("wkb")).cast("long").as("wkb_len"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_snapshot_delta",
      """WITH snap_a AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-07-01'),
        |snap_b AS (
        |  SELECT o_orderkey AS id,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS status
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01')
        |SELECT coalesce(a.id, b.id) AS id,
        |       CASE WHEN b.id IS NULL THEN 'removed'
        |            WHEN a.id IS NULL THEN 'added'
        |            WHEN a.status <> b.status THEN 'changed'
        |            ELSE 'unchanged' END AS change
        |FROM snap_a a FULL OUTER JOIN snap_b b ON a.id = b.id
        |ORDER BY id""".stripMargin
    ) { (s, d) =>
      // Week-over-week diff (osm_etl.py:13,45): two dated snapshots,
      // classify added/removed/changed/unchanged via one full-outer join on
      // the element id. Snapshots here are overlapping date windows of
      // orders; snap_b mutates status on every 10th key to stand in for
      // OSM edits between weekly runs. At scale both sides shuffle once on
      // id; AQE handles the skew if an id range is hot.
      val o = T.orders(s, d)
      val a = o.where(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey").as("a_id"), col("o_orderstatus").as("a_status"))
      val b = o.where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey").as("b_id"),
                when(col("o_orderkey") % 10 === 0, "X").otherwise(col("o_orderstatus")).as("b_status"))
      a.join(b, col("a_id") === col("b_id"), "full_outer")
        .select(
          coalesce(col("a_id"), col("b_id")).as("id"),
          when(col("b_id").isNull, "removed")
            .when(col("a_id").isNull, "added")
            .when(col("a_status") =!= col("b_status"), "changed")
            .otherwise("unchanged").as("change"))
        .orderBy(col("id"))
    },

    Q(
      "merge_upsert",
      """WITH base AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS price
        |  FROM orders WHERE o_orderkey % 4 <> 0),
        |delta AS (
        |  SELECT o_orderkey AS id,
        |         CASE WHEN o_orderkey % 8 = 1 THEN 'D'
        |              WHEN o_orderkey % 4 = 0 THEN 'I' ELSE 'U' END AS op,
        |         o_orderstatus AS status,
        |         o_totalprice + 100 AS price
        |  FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 8 = 1)
        |SELECT coalesce(d.id, b.id) AS id,
        |       coalesce(d.status, b.status) AS status,
        |       coalesce(d.price, b.price) AS price
        |FROM base b FULL OUTER JOIN delta d ON b.id = d.id
        |WHERE d.op IS NULL OR d.op <> 'D'
        |ORDER BY id""".stripMargin
    ) { (s, d) =>
      // MERGE INTO semantics (the lakehouse upsert the weekly snapshot
      // reload becomes once deltas replace full dumps): one full-outer
      // join on the key applies inserts, updates and deletes in a single
      // shuffle. Rows only in base survive unchanged; delta rows override
      // (update) or add (insert); 'D' markers drop the row. At scale the
      // join inherits the bucketed layout (`join_bucketed`), making the
      // weekly merge exchange-free too. Delta here is synthesized from
      // orders: every even key upserts (+100 price), every 8k+1 key
      // deletes, keys ≡ 0 (mod 4) are absent from base → pure inserts.
      val o = T.orders(s, d)
      val base = o.where(col("o_orderkey") % 4 =!= 0)
        .select(col("o_orderkey").as("b_id"), col("o_orderstatus").as("b_status"),
                col("o_totalprice").as("b_price"))
      val delta = o.where(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 8 === 1)
        .select(col("o_orderkey").as("d_id"),
                when(col("o_orderkey") % 8 === 1, "D")
                  .when(col("o_orderkey") % 4 === 0, "I").otherwise("U").as("op"),
                col("o_orderstatus").as("d_status"),
                (col("o_totalprice") + 100).as("d_price"))
      base.join(delta, col("b_id") === col("d_id"), "full_outer")
        .where(col("op").isNull || col("op") =!= "D")
        .select(coalesce(col("d_id"), col("b_id")).as("id"),
                coalesce(col("d_status"), col("b_status")).as("status"),
                coalesce(col("d_price"), col("b_price")).as("price"))
        .orderBy(col("id"))
    },

    Q(
      "merge_scd2",
      """WITH base AS (
        |  SELECT c_custkey AS id, c_acctbal AS bal FROM customer),
        |upd AS (
        |  SELECT c_custkey AS id, c_acctbal + 100 AS bal
        |  FROM customer WHERE c_custkey % 2 = 1)
        |SELECT b.id, b.bal, CAST(0 AS BIGINT) AS valid_from,
        |       CASE WHEN u.id IS NULL THEN CAST(NULL AS BIGINT)
        |            ELSE CAST(1 AS BIGINT) END AS valid_to
        |FROM base b LEFT JOIN upd u ON b.id = u.id
        |UNION ALL
        |SELECT id, bal, CAST(1 AS BIGINT) AS valid_from,
        |       CAST(NULL AS BIGINT) AS valid_to
        |FROM upd
        |ORDER BY id, valid_from""".stripMargin
    ) { (s, d) =>
      // Slowly-changing-dimension type 2 (`merge_upsert`'s history-keeping
      // sibling): an update CLOSES the current version (valid_to set) and
      // appends a new open one, so every historical state stays queryable
      // by validity interval — the dimension shape a weekly snapshot
      // pipeline needs for as-of reprocessing. One left join marks closed
      // rows (the update set is corpus-fraction-sized → size-gated
      // broadcast, the dimension never shuffles) plus a union of the new
      // versions; at scale the join inherits the bucketed dim layout like
      // merge_upsert. Updates synthesized deterministically: odd custkeys
      // re-balance (+100) at version time 1.
      val c = T.customer(s, d)
      val base = c.select(col("c_custkey").as("id"), col("c_acctbal").as("bal"))
      val upd = c.where(col("c_custkey") % 2 === 1)
        .select(col("c_custkey").as("u_id"), (col("c_acctbal") + 100).as("u_bal"))
      val closedOrCurrent = base
        .join(Gate.bcast(upd.select(col("u_id"))), col("id") === col("u_id"), "left")
        .select(col("id"), col("bal"), lit(0L).as("valid_from"),
                when(col("u_id").isNull, lit(null).cast("long"))
                  .otherwise(lit(1L)).as("valid_to"))
      val newVersions = upd
        .select(col("u_id").as("id"), col("u_bal").as("bal"),
                lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      closedOrCurrent.unionAll(newVersions).orderBy(col("id"), col("valid_from"))
    },

    Q(
      "osm_region_partition_write",
      """SELECT r_name, n_name, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('AMERICA', 'EUROPE')
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin
    ) { (s, d) =>
      // The reference's per-{region,subregion} fan-out (osm_etl.py:69-85)
      // becomes ONE job + a region-partitioned lake layout; "process only
      // colorado" becomes partition pruning on re-read (PartitionFilters —
      // unselected regions' files are never opened).
      val out = graft.Scratch.dir("region_partitioned", d)
      // customer grows with sf — size-gated broadcast (nation/region are
      // constant-cardinality and stay hard-broadcast)
      val staged = T.orders(s, d)
        .join(graft.Gate.bcast(T.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("r_name"), col("n_name"))
      // r19 opt: cluster by the partition columns before the write (the
      // sink_parquet note — one file per (region, nation) dir instead of
      // every scan task writing every dir, the M×P small-files
      // anti-pattern at scale). Locally a wash (1.02 → 1.08 s solo,
      // inside noise); the layout is the point.
      staged.repartition(col("r_name"), col("n_name"))
        .write.mode("overwrite")
        .partitionBy("r_name", "n_name")
        .parquet(out)
      // explicit re-read schema: an empty region/snapshot writes no files,
      // and schema inference over zero files crashes the job (EmptyInputSpec)
      s.read.schema(staged.schema).parquet(out)
        .where(col("r_name").isin("AMERICA", "EUROPE"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    },

    Q(
      "osm_nearest_node",
      """WITH p AS (SELECT s_suppkey AS poi_id, (s_suppkey * 13) % 1000 AS px,
        |                  (s_suppkey * 29) % 1000 AS py FROM supplier),
        |n AS (SELECT p_partkey AS node_id, p_partkey % 1000 AS nx,
        |             (p_partkey * 7) % 1000 AS ny FROM part),
        |j AS (SELECT poi_id, node_id,
        |             (px - nx) * (px - nx) + (py - ny) * (py - ny) AS d2,
        |             row_number() OVER (PARTITION BY poi_id
        |               ORDER BY (px - nx) * (px - nx) + (py - ny) * (py - ny), node_id) AS rn
        |      FROM p JOIN n ON (px - nx) * (px - nx) + (py - ny) * (py - ny) <= 3600)
        |SELECT poi_id, node_id, d2 FROM j WHERE rn = 1
        |ORDER BY poi_id""".stripMargin
    ) { (s, d) =>
      // Radius-bounded nearest node per POI (the ST_DWithin + closest-k
      // query over the geometry store — "which road node is this address
      // on"). EXACT by construction: with cell size = radius R, every
      // node within R of a POI lies in the POI's 3×3 cell neighborhood,
      // so replicating each POI over 9 cells (the SMALL side fans out,
      // the node store keys on its single home cell) makes the grid
      // equi-join a complete candidate set — the distance inequality
      // only FILTERS, it never drives the join, the scale rule every
      // spatial operator here obeys. Each (poi, node) pair arises at
      // most once (a node has one home cell), so no dedup is needed
      // before the per-POI rank. Distances are exact integer d² — no
      // sqrt, no float compare — and the nearest pick tie-breaks on
      // node_id. POIs with no node within R drop out in both engines.
      val R = 60
      val pois = T.supplier(s, d).select(col("s_suppkey").as("poi_id"),
        (col("s_suppkey") * 13 % 1000).as("px"), (col("s_suppkey") * 29 % 1000).as("py"))
      val nodeCells = T.part(s, d).select(col("p_partkey").as("node_id"),
          (col("p_partkey") % 1000).as("nx"), (col("p_partkey") * 7 % 1000).as("ny"))
        .withColumn("cx", floor(col("nx") / R)).withColumn("cy", floor(col("ny") / R))
      val poiCells = pois
        .withColumn("dxy", explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))")))
        .withColumn("cx", floor(col("px") / R) + col("dxy.dx"))
        .withColumn("cy", floor(col("py") / R) + col("dxy.dy"))
        .drop("dxy")
      val d2 = (col("px") - col("nx")) * (col("px") - col("nx")) +
               (col("py") - col("ny")) * (col("py") - col("ny"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("poi_id")).orderBy(col("d2"), col("node_id"))
      poiCells.join(nodeCells, Seq("cx", "cy"))
        .withColumn("d2", d2)
        .where(col("d2") <= R * R)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("poi_id"), col("node_id"), col("d2"))
        .orderBy(col("poi_id"))
    },

    Q(
      "lake_stats",
      """WITH m AS (
        |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders)
        |SELECT col_name, count(*) AS n_rows, count(v) AS n_nonnull,
        |       count(DISTINCT v) AS ndv, min(v) AS min_v, max(v) AS max_v
        |FROM m GROUP BY 1
        |ORDER BY 1""".stripMargin
    ) { (s, d) =>
      // ANALYZE-style per-column statistics (count / nulls / exact NDV /
      // min / max) — the lake-maintenance pass that feeds CBO join
      // ordering and file-skipping metadata. One scan + an inline
      // generator melts the columns into (col_name, value) rows, then a
      // single partial+final aggregate per column computes all five
      // stats — DuckDB pays four scans for its UNION ALL; Spark reads
      // the table once. Values travel as strings (BIGINT→string is
      // exact, and min/max over binary collation agrees cross-engine);
      // the melt key space is #columns, so the shuffle is tiny.
      T.orders(s, d)
        .select(expr("""inline(array(
          |  named_struct('col_name', 'o_orderkey',      'v', CAST(o_orderkey AS STRING)),
          |  named_struct('col_name', 'o_custkey',       'v', CAST(o_custkey AS STRING)),
          |  named_struct('col_name', 'o_orderstatus',   'v', o_orderstatus),
          |  named_struct('col_name', 'o_orderpriority', 'v', o_orderpriority)))""".stripMargin))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_nonnull"),
             countDistinct(col("v")).as("ndv"),
             min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("col_name"))
    },

    // Z-order clustering — multi-dimensional file-skipping layout, the
    // lake-maintenance answer to "my queries filter on y but the table
    // is sorted by x". Interleaving the bits of both keys makes every
    // file's [min,max] box LOCAL in both dimensions, so a filter on
    // EITHER key prunes most files by footer stats; a linear x-sort
    // prunes only x-filters. Layout (file counts aren't SQL) → smoke;
    // AnalyticsOpsSpec asserts the z-layout's hit set for a y-filter is
    // strictly smaller than the linear layout's, identical row content.
    // The one-time layout writes are conf-keyed per (session, dataset)
    // like the bucket tables.
    Q.smoke("lake_zorder") { (s, d) =>
      val confKey = s"spark.sql.graft.zorderdir:$d"
      val root = s.conf.getOption(confKey).getOrElse {
        val dir = graft.Scratch.dir("zorder", d)
        val src = T.orders(s, d).select(col("o_orderkey"),
          (col("o_custkey") % 1024).as("x"), (col("o_orderkey") % 1024).as("y"))
        // 20-bit Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1
        val z = (0 until 10).map { i =>
          shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
            shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
        }.reduce(_ + _)
        src.withColumn("z", z).repartitionByRange(16, col("z"))
          .write.mode("overwrite").parquet(s"$dir/zorder")
        src.withColumn("z", col("x")).repartitionByRange(16, col("z"))
          .write.mode("overwrite").parquet(s"$dir/linear")
        s.conf.set(confKey, dir)
        dir
      }
      // per-file min(y): which files could a y < 64 filter touch?
      def hits(path: String, layout: String) =
        s.read.parquet(path)
          .select(input_file_name().as("f"), col("y"))
          .groupBy(col("f")).agg(min(col("y")).as("miny"))
          .agg(count(lit(1)).as("n_files"),
               sum(when(col("miny") < 64, 1L).otherwise(0L)).as("n_hit"))
          .select(lit(layout).as("layout"), col("n_files"), col("n_hit"))
      hits(s"$root/zorder", "zorder")
        .unionByName(hits(s"$root/linear", "linear"))
        .orderBy(col("layout"))
    },

    // Small-file compaction — the weekly lake-maintenance pass every
    // partitioned 100 TB lake needs (each incremental append writes
    // #tasks files per partition; a year of appends makes scans
    // metadata-bound). One keyed repartition rewrites each partition
    // into a bounded file count: the salt term caps files per partition
    // dir (at scale: ceil(partition_bytes / target_file_bytes) from the
    // lake's stats, here a fixed 2), so hot partitions still split into
    // multiple right-sized files instead of one huge one — compaction
    // must not undo `join_skew_salted`'s lesson. Layout/behavioral (file
    // counts aren't SQL) → smoke + AnalyticsOpsSpec asserts files
    // collapse 16→≤2 per partition with bit-identical row content.
    // Snapshot RETENTION sweep — the vacuum a versioned lake needs once
    // `stream_osc_apply` / `merge_scd2`-class writers start landing one
    // snapshot dir per applied sequence: list `seq_<n>` dirs, keep the
    // newest K, delete the rest. The deletes are a METADATA-plane
    // driver loop by design (same as any table format's VACUUM — the
    // work is proportional to snapshot count, never data size); the
    // data itself was written executor-side. Loud guards: keep ≥ 1,
    // and the newest snapshot is structurally undeletable (it sorts
    // first). Readout: one row per snapshot seen with its fate, file
    // count, and surviving row count — the spec asserts survivors are
    // byte-intact and victims are gone from the filesystem.
    Q.smoke("lake_vacuum") { (s, d) =>
      val root = graft.Scratch.dir("lake_vacuum", d)
      val src = T.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      // r19 opt: the six snapshot writes are independent fixture-setup
      // jobs — submit them concurrently (guide §2.6 back-fill: the next
      // write's tasks fill executors freed by the previous one's tail)
      // instead of six sequential job round-trips. Outputs are the same
      // six directories; the retention sweep below is unchanged.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((0 until 6).map { n => Future {
        src.where(pmod(col("o_orderkey"), lit(6)) === n)
          .write.mode("overwrite").parquet(s"$root/seq_$n")
      }}), Duration.Inf)
      val keep = 3
      require(keep >= 1, "lake_vacuum: retention must keep at least one snapshot")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snaps = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("seq_"))
        .map(st => (st.getPath.getName.stripPrefix("seq_").toLong, st.getPath))
        .sortBy(-_._1)
      val report = snaps.zipWithIndex.map { case ((seq, path), rank) =>
        val nFiles = fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
        val kept = rank < keep
        if (!kept) require(fs.delete(path, true), s"lake_vacuum: failed to delete $path")
        val nRows = if (kept) s.read.parquet(path.toString).count() else 0L
        (seq, kept, nFiles.toLong, nRows)
      }
      import s.implicits._
      report.toSeq.toDF("seq", "kept", "n_files", "n_rows").orderBy(col("seq"))
    },

    Q.smoke("lake_compact") { (s, d) =>
      val root = graft.Scratch.dir("lake_compact", d)
      val src = T.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      // fragment: 16 writer tasks × every priority → 16 files per partition
      src.repartition(16).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(s"$root/fragmented")
      val frag = s.read.schema(src.schema).parquet(s"$root/fragmented")
      val targetFiles = 2
      frag.repartition(col("o_orderpriority"),
                       pmod(col("o_orderkey"), lit(targetFiles)))
        .write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(s"$root/compacted")
      def stats(path: String, label: String) =
        s.read.schema(src.schema).parquet(path)
          // project the file name first: the analyzer (correctly) rejects
          // nondeterministic expressions as direct aggregate arguments
          .select(col("o_orderpriority").as("part"), input_file_name().as("f"))
          .groupBy(col("part"))
          .agg(countDistinct(col("f")).as(s"files_$label"),
               count(lit(1)).as(s"rows_$label"))
      stats(s"$root/fragmented", "before")
        .join(stats(s"$root/compacted", "after"), "part")
        .orderBy(col("part"))
    },

    Q(
      "osm_address_interpolation",
      """WITH w AS (
        |  SELECT o_orderkey AS way_id,
        |         o_custkey % 1000 AS x1, o_orderkey % 1000 AS y1,
        |         (o_custkey * 3) % 1000 AS x2, (o_orderkey * 7) % 1000 AS y2,
        |         2 * (o_orderkey % 5) + o_orderkey % 2 AS h1,
        |         2 * (o_orderkey % 5) + o_orderkey % 2 + 2 * (3 + o_orderkey % 4) AS h2
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |pts AS (
        |  SELECT way_id, h1 + 2 * i AS housenumber, (h2 - h1) // 2 AS k, i,
        |         x1, y1, x2, y2
        |  FROM w, unnest(range(0, (h2 - h1) // 2 + 1)) AS t(i))
        |SELECT way_id, CAST(housenumber AS BIGINT) AS housenumber,
        |       CAST(((x1 * (k - i) + x2 * i) * 1000000) // k AS BIGINT) AS x_micro,
        |       CAST(((y1 * (k - i) + y2 * i) * 1000000) // k AS BIGINT) AS y_micro
        |FROM pts ORDER BY way_id, housenumber""".stripMargin
    ) { (s, d) =>
      // OSM `addr:interpolation` semantics — an interpolation way joins
      // two addressed endpoints and GENERATES the addresses between
      // them (even/odd scheme: step 2, endpoint parity shared); the
      // geocoder table every Nominatim-class consumer materializes from
      // the raw tags. Endpoints, scheme base, and span derive
      // deterministically from the dim so the oracle recomputes the
      // expansion; a real feed reads the endpoint nodes' addr tags
      // instead — same shape. Positions interpolate in EXACT integer
      // micro-units with the barycentric form
      // ((x1·(k−i) + x2·i)·1e6) DIV k: every term is non-negative, so
      // Spark's truncating DIV and DuckDB's flooring // agree (the
      // (x2−x1)-delta form would diverge on negative deltas — floor vs
      // trunc). The expansion is a GENERATOR (explode(sequence)): rows
      // stream per input way with no shuffle at all; the ~k-fold
      // fan-out is the point of the operator.
      T.orders(s, d)
        .where(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("way_id"),
                (col("o_custkey") % 1000).as("x1"),
                (col("o_orderkey") % 1000).as("y1"),
                (col("o_custkey") * 3 % 1000).as("x2"),
                (col("o_orderkey") * 7 % 1000).as("y2"),
                (col("o_orderkey") % 5 * 2 + col("o_orderkey") % 2).as("h1"),
                (col("o_orderkey") % 5 * 2 + col("o_orderkey") % 2
                  + (col("o_orderkey") % 4 + 3) * 2).as("h2"))
        .withColumn("k", expr("(h2 - h1) DIV 2"))
        .withColumn("i", explode(expr("sequence(0L, k)")))
        .select(col("way_id"),
                (col("h1") + col("i") * 2).as("housenumber"),
                expr("((x1 * (k - i) + x2 * i) * 1000000) DIV k").as("x_micro"),
                expr("((y1 * (k - i) + y2 * i) * 1000000) DIV k").as("y_micro"))
        .orderBy(col("way_id"), col("housenumber"))
    },

    Q(
      "osm_turn_restrictions",
      """WITH memb AS (
        |  SELECT DISTINCT l_partkey AS node_id, l_orderkey AS way_id FROM lineitem),
        |j AS (
        |  SELECT node_id, list_sort(list(way_id)) AS ws, count(*) AS d
        |  FROM memb GROUP BY node_id HAVING count(*) >= 2)
        |SELECT node_id, CAST(d AS BIGINT) AS n_ways,
        |       CAST(d * (d - 1) AS BIGINT) AS n_turns,
        |       CAST(list_sum(list_transform(ws, a ->
        |              list_sum(list_transform(ws, b ->
        |                CASE WHEN a <> b AND (a + b + node_id) % 11 = 0
        |                     THEN 1 ELSE 0 END)))) AS BIGINT) AS n_restricted,
        |       CAST(d * (d - 1) - list_sum(list_transform(ws, a ->
        |              list_sum(list_transform(ws, b ->
        |                CASE WHEN a <> b AND (a + b + node_id) % 11 = 0
        |                     THEN 1 ELSE 0 END)))) AS BIGINT) AS n_allowed
        |FROM j ORDER BY node_id""".stripMargin
    ) { (s, d) =>
      // TURN-RESTRICTION accounting at routing junctions — the OSM
      // `type=restriction` relation semantics (no_left_turn etc.: a
      // (from_way, via_node, to_way) triple forbids one ordered way
      // pair at one junction) applied to the same junction set
      // `osm_road_graph` splits on. Per junction: possible ordered
      // turns d·(d−1) (U-turns excluded), restricted pairs (the
      // restriction set derives deterministically from the ids so the
      // oracle recomputes it — a real feed joins the relation table
      // instead, same shape), and the allowed remainder a router
      // actually expands. Scale shape: the ordered-pair space is
      // degree² and must NEVER materialize as rows — the way set
      // collects into one in-row sorted array per junction (bounded by
      // street degree; the collect_set is the same single regroup the
      // road graph pays) and the pair count folds INSIDE the row with
      // higher-order lambdas, so the shuffle carries one row per
      // junction and the d² work stays in-row arithmetic. Everything
      // is exact integer; both engines run the identical lambda text.
      val memb = T.lineitem(s, d)
        .select(col("l_partkey").as("node_id"), col("l_orderkey").as("way_id"))
        .distinct()
      memb.groupBy(col("node_id"))
        .agg(sort_array(collect_set(col("way_id"))).as("ws"),
             count(lit(1)).as("d"))
        .where(col("d") >= 2)
        .withColumn("n_restricted", expr(
          """aggregate(ws, CAST(0 AS BIGINT), (acc, a) ->
            |  acc + aggregate(ws, CAST(0 AS BIGINT), (acc2, b) ->
            |    acc2 + IF(a != b AND (a + b + node_id) % 11 = 0,
            |              CAST(1 AS BIGINT), CAST(0 AS BIGINT))))""".stripMargin))
        .select(col("node_id"),
                col("d").as("n_ways"),
                (col("d") * (col("d") - 1)).as("n_turns"),
                col("n_restricted"),
                (col("d") * (col("d") - 1) - col("n_restricted")).as("n_allowed"))
        .orderBy(col("node_id"))
    },

    Q(
      "osm_road_graph",
      """WITH memb AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref
        |  FROM lineitem),
        |junc AS (
        |  SELECT node_ref AS jnode
        |  FROM (SELECT node_ref, count(DISTINCT way_id) AS c FROM memb GROUP BY node_ref)
        |  WHERE c >= 2),
        |pts AS (
        |  SELECT m.way_id, m.pos, m.node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c,
        |         (jnode IS NOT NULL) AS is_junc
        |  FROM memb m JOIN part ON m.node_ref = p_partkey
        |  LEFT JOIN junc ON m.node_ref = jnode),
        |ways AS (
        |  SELECT way_id,
        |         list(node_ref ORDER BY pos, node_ref) AS refs,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats,
        |         list(is_junc ORDER BY pos, node_ref) AS js
        |  FROM pts GROUP BY way_id),
        |cuts AS (
        |  SELECT way_id, refs, lons, lats,
        |         list_filter(range(1, len(refs) + 1),
        |                     i -> i = 1 OR i = len(refs) OR js[i]) AS cs
        |  FROM ways),
        |edges AS (
        |  SELECT way_id, refs, lons, lats,
        |         unnest(list_transform(range(2, len(cs) + 1),
        |                k -> struct_pack(seq := k - 1, i0 := cs[k-1], i1 := cs[k]))) AS e
        |  FROM cuts)
        |SELECT way_id,
        |       CAST(e['seq'] AS BIGINT) AS edge_seq,
        |       refs[e['i0']] AS from_node,
        |       refs[e['i1']] AS to_node,
        |       CAST(e['i1'] - e['i0'] + 1 AS BIGINT) AS n_pts,
        |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(range(e['i0'] + 1, e['i1'] + 1), i ->
        |           sqrt(CAST((lons[i] - lons[i-1]) * (lons[i] - lons[i-1])
        |                   + (lats[i] - lats[i-1]) * (lats[i] - lats[i-1]) AS DOUBLE)))),
        |         (a, b) -> a + b) * 1113.2, 1) AS length_m
        |FROM edges
        |ORDER BY way_id, edge_seq""".stripMargin
    ) { (s, d) =>
      // Routing-graph edge extraction — the osm2po/pgRouting shape the
      // PostGIS store serves next ("efficient querying", README.md:70):
      // a node referenced by ≥ 2 distinct ways is a JUNCTION; each way
      // splits at its interior junctions into routable edges
      // (from_node → to_node with the traversed vertex count and metric
      // length). Scale shape: the junction table is a fact-scale degree
      // aggregate whose OUTPUT is node-store-sized → size-gated
      // broadcast back onto the membership scan (shuffle join past the
      // budget); the split itself runs INSIDE the one per-way regroup
      // row (the same single shuffle `osm_way_geometry` pays) via
      // higher-order functions — cut indices, pair zip, per-edge exact
      // integer sqrt fold — so no second shuffle and no explode before
      // the regroup. Edge length reuses `osm_way_length_m`'s
      // bit-deterministic recipe (correctly-rounded sqrt over exact
      // integer deltas, left fold, one literal meter factor, final-only
      // round). The fixture's dense membership makes every node a
      // junction (all edges 2-point); RoadGraphSpec plants a sparse
      // fixture to pin interior-run splitting, edge chaining, and
      // length additivity.
      roadGraph(s, d).orderBy(col("way_id"), col("edge_seq"))
    },

    Q(
      "osm_hilbert_index",
      OsmKernels.hilbertOracleSql
    ) { (s, d) =>
      // Hilbert-curve spatial index at order 8 (256×256 grid over the
      // node bbox) — `lake_zorder`'s LOCALITY-OPTIMAL sibling: both
      // linearize 2-D for range-pruned storage, but Morton/Z-order has
      // seam jumps (cell (255,0)→(0,1) is adjacent in key space,
      // continents apart on the map) while every consecutive Hilbert
      // pair is a GRID-ADJACENT pair (spec-pinned), so a contiguous key
      // range reads a compact disk region — measurably fewer false
      // positives per bbox scan at 100 TB, which is why it's the
      // layout in production spatial stores. EXACT integer end-to-end:
      // grid cell = ((coord − lo)·256) DIV (hi − lo + 1) on micro-unit
      // BIGINTs, then the standard xy2d bit walk (Wikipedia/Warren) as
      // 8 UNROLLED stages whose per-stage SQL text is generated ONCE by
      // [[OsmKernels.hilbertStage]] and spliced into BOTH engines —
      // even the XOR is spelled as a CASE so the text is dialect-free;
      // the transient negative intermediates the rotation produces use
      // two's-complement & identically in both engines. Scale shape:
      // one 1-row bounds broadcast onto the node scan, then 8 pure
      // map-side projections — no shuffle at all beyond the final
      // presentation sort.
      val n = nodes(s, d)
      val bounds = n.agg(min(col("lon_c")).as("lox"), max(col("lon_c")).as("hix"),
                         min(col("lat_c")).as("loy"), max(col("lat_c")).as("hiy"))
      var df = n.crossJoin(broadcast(bounds))
        .selectExpr("node_id",
          "((lon_c - lox) * 256) DIV (hix - lox + 1) AS cell_x",
          "((lat_c - loy) * 256) DIV (hiy - loy + 1) AS cell_y")
        .selectExpr("node_id", "cell_x", "cell_y",
          "cell_x AS x", "cell_y AS y", "CAST(0 AS BIGINT) AS d")
      for (k <- 0 until 8) {
        val (xe, ye, de) = OsmKernels.hilbertStage(128 >> k)
        df = df.selectExpr("node_id", "cell_x", "cell_y",
          s"$xe AS x", s"$ye AS y", s"$de AS d")
      }
      df.selectExpr("node_id", "CAST(cell_x AS BIGINT) AS cell_x",
          "CAST(cell_y AS BIGINT) AS cell_y", "CAST(d AS BIGINT) AS hilbert_d")
        .orderBy(col("node_id"))
    },

    Q(
      "osm_tile_pyramid",
      """WITH z2 AS (
        |  SELECT CAST((p_size * 100) // 400 AS BIGINT) AS tx,
        |         CAST(CAST(round(p_retailprice * 100) AS BIGINT) // 1000 AS BIGINT) AS ty,
        |         count(*) AS n
        |  FROM part GROUP BY tx, ty),
        |z1 AS (
        |  SELECT CAST(tx // 2 AS BIGINT) AS tx, CAST(ty // 2 AS BIGINT) AS ty,
        |         CAST(sum(n) AS BIGINT) AS n
        |  FROM z2 GROUP BY 1, 2),
        |z0 AS (
        |  SELECT CAST(tx // 2 AS BIGINT) AS tx, CAST(ty // 2 AS BIGINT) AS ty,
        |         CAST(sum(n) AS BIGINT) AS n
        |  FROM z1 GROUP BY 1, 2)
        |SELECT CAST(0 AS BIGINT) AS z, tx, ty, n FROM z0
        |UNION ALL SELECT CAST(1 AS BIGINT), tx, ty, n FROM z1
        |UNION ALL SELECT CAST(2 AS BIGINT), tx, ty, n FROM z2
        |ORDER BY z, tx, ty""".stripMargin
    ) { (s, d) =>
      // Tile-pyramid density precompute — what a vector-tile serving
      // stack materializes per zoom level from the PostGIS store
      // (README.md:70): element counts per (z, tile_x, tile_y), cell
      // edges halving each zoom. Built the way a 100 TB pyramid must
      // be: the fact table is scanned and aggregated ONCE at the
      // FINEST zoom, and every coarser level rolls up from the
      // previous LEVEL's tile counts (parent tile = child DIV 2 —
      // exact on non-negative integer indices), so z1/z0 aggregate
      // tile-count rows, never elements. Three bounded-key-space
      // aggregates, exact integer arithmetic throughout.
      // the finest level is CACHED (a bounded tile table, not facts):
      // the three union branches must not re-run the element scan —
      // without this the plan recomputes z2 under every branch
      val z2 = graft.Caches.register(T.part(s, d)
        .select((col("p_size").cast("long") * 100).as("lon_c"),
                round(col("p_retailprice") * 100).cast("long").as("lat_c"))
        .select(expr("lon_c DIV 400").as("tx"), expr("lat_c DIV 1000").as("ty"))
        .groupBy(col("tx"), col("ty")).agg(count(lit(1)).as("n"))
        .persist())
      def up(df: org.apache.spark.sql.DataFrame) =
        df.select(expr("tx DIV 2").as("tx"), expr("ty DIV 2").as("ty"), col("n"))
          .groupBy(col("tx"), col("ty")).agg(sum(col("n")).cast("long").as("n"))
      val z1 = up(z2)
      val z0 = up(z1)
      def lvl(z: Int, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(z.toLong).as("z"), col("tx"), col("ty"), col("n"))
      lvl(0, z0).unionAll(lvl(1, z1)).unionAll(lvl(2, z2))
        .orderBy(col("z"), col("tx"), col("ty"))
    },

    Q(
      "osm_project_mercator",
      s"""WITH n AS (
         |  SELECT p_partkey AS node_id, p_size * 100 AS lon_c,
         |         CAST(round(p_retailprice * 100) AS BIGINT) % 17000 - 8500 AS vlat_c
         |  FROM part),
         |a AS (
         |  SELECT node_id, CAST(lon_c AS DOUBLE) * 0.01 AS lon,
         |         CAST(vlat_c AS DOUBLE) * 0.01 AS lat
         |  FROM n),
         |b AS (SELECT *, $mercU AS u FROM a),
         |c AS (SELECT *, ${mercSinPoly("u")} / ${mercCosPoly("u")} AS t FROM b),
         |d AS (SELECT *, $mercK AS kk, t * ($mercScale) AS m FROM c),
         |e AS (SELECT *, (m - 1.0) / (m + 1.0) AS z FROM d),
         |f AS (SELECT *, $mercLn AS lnt FROM e)
         |SELECT node_id, lon, lat,
         |       round(lon * 111319.49079327358, 1) AS mx,
         |       round(lnt * 6378137.0, 1) + 0.0 AS my,
         |       CAST(floor((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) AS tile_x,
         |       CAST(floor((1.0 - lnt / 3.141592653589793) * 0.5 * 1024.0) AS BIGINT) AS tile_y
         |FROM f
         |ORDER BY node_id""".stripMargin
    ) { (s, d) =>
      // SRID-style reprojection (VERDICT r13 missing #3): lon/lat →
      // EPSG:3857 Web-Mercator meters + true z/x/y tile addressing at
      // z=10 — what osm2pgsql does to every geometry by default
      // (/root/reference/README.md:80-82, osm2pgsql's -3857 output).
      // my = R·ln(tan(π/4 + φ/2)) with BOTH transcendentals under the
      // house bit-determinism discipline: tan from the degree-13/12
      // Maclaurin pair [[mercSinPoly]]/[[mercCosPoly]], and ln by exact
      // power-of-two range reduction — a 10-branch CASE picks k with
      // m = t·2^(−k) ∈ [0.75, 1.5) (the scale factors 32…0.0625 are
      // exact binary, branch choice is identical on identical doubles),
      // then ln(m) = 2·atanh((m−1)/(m+1)) as a 5-term odd series
      // (|z| ≤ 0.2 ⇒ truncation ≤ z¹¹/11 ≈ 1.9e-9) plus k·ln2 with ln2
      // a shared literal. Latitudes fold to the ±85° Mercator clamp the
      // way the geodesic keys fold to ±90°. Scale shape: map-only —
      // a projection with zero shuffles; the tile floor runs on
      // identical doubles in both engines, so z/x/y addressing cannot
      // drift. Error bound in SCALE.md (≤ ~0.6 m at the clamp).
      T.part(s, d)
        .select(col("p_partkey").as("node_id"),
                (col("p_size").cast("long") * 100).as("lon_c"),
                (round(col("p_retailprice") * 100).cast("long") % 17000 - 8500).as("vlat_c"))
        .withColumn("lon", col("lon_c").cast("double") * 0.01)
        .withColumn("lat", col("vlat_c").cast("double") * 0.01)
        .withColumn("u", expr(mercU))
        .withColumn("t", expr(s"${mercSinPoly("u")} / ${mercCosPoly("u")}"))
        .withColumn("kk", expr(mercK))
        .withColumn("m", expr(s"t * ($mercScale)"))
        .withColumn("z", expr("(m - 1.0) / (m + 1.0)"))
        .withColumn("lnt", expr(mercLn))
        .select(col("node_id"), col("lon"), col("lat"),
          round(col("lon") * 111319.49079327358, 1).as("mx"),
          // + 0.0 collapses IEEE −0.0 (a sub-ULP negative northing at
          // the equator row rounds to the signed zero in DuckDB but the
          // unsigned one in Spark) onto +0.0 in both engines
          (round(col("lnt") * 6378137.0, 1) + lit(0.0)).as("my"),
          floor((col("lon") + 180.0) / 360.0 * 1024.0).cast("long").as("tile_x"),
          floor((lit(1.0) - col("lnt") / 3.141592653589793) * 0.5 * 1024.0).cast("long").as("tile_y"))
        .orderBy(col("node_id"))
    },

    Q(
      "osm_name_trigram",
      """WITH probes AS (
        |  SELECT * FROM (VALUES ('q1', 'red wdget'), ('q2', 'blu bolt'),
        |                        ('q3', 'smal gizmo'), ('q4', 'hott gear'),
        |                        ('q5', 'old blot')) AS v(probe_id, probe_text)),
        |pg AS (
        |  SELECT probe_id, probe_text,
        |         list_distinct(flatten(list_transform(
        |           list_filter(string_split(lower(probe_text), ' '), w -> length(w) > 0),
        |           w -> list_transform(range(1, length(w) + 2),
        |                               i -> substring('  ' || w || ' ', i, 3))))) AS gs
        |  FROM probes),
        |pl AS (SELECT probe_id, probe_text, len(gs) AS n2, unnest(gs) AS g FROM pg),
        |ng AS (
        |  SELECT p_partkey AS node_id, p_name AS name,
        |         list_distinct(flatten(list_transform(
        |           list_filter(string_split(lower(p_name), ' '), w -> length(w) > 0),
        |           w -> list_transform(range(1, length(w) + 2),
        |                               i -> substring('  ' || w || ' ', i, 3))))) AS gs
        |  FROM part),
        |nl AS (SELECT node_id, name, len(gs) AS n1, unnest(gs) AS g FROM ng),
        |shared AS (
        |  SELECT probe_id, probe_text, node_id, name, n1, n2,
        |         CAST(count(*) AS BIGINT) AS sh
        |  FROM nl JOIN pl USING (g)
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |scored AS (
        |  SELECT probe_id, probe_text, node_id, name,
        |         CAST((1000000 * sh) // (n1 + n2 - sh) AS BIGINT) AS sim_ppm,
        |         row_number() OVER (PARTITION BY probe_id
        |           ORDER BY (1000000 * sh) // (n1 + n2 - sh) DESC, node_id) AS rank
        |  FROM shared)
        |SELECT probe_id, probe_text, CAST(rank AS BIGINT) AS rank,
        |       node_id, name, sim_ppm
        |FROM scored WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin
    ) { (s, d) =>
      // pg_trgm-style fuzzy name search — the PostGIS serving stack's
      // `name % 'red wdget' ORDER BY similarity DESC` query (pg_trgm is
      // the standard OSM/Nominatim name index on exactly the kind of
      // store the reference loads — README.md:70). Semantics follow
      // pg_trgm: each lowercased word is padded '  w ' and shredded to
      // 3-grams, the doc's gram SET is the union over words, and
      // similarity is trigram Jaccard |∩|/|∪| — here in exact integer
      // ppm ((10⁶·shared) DIV (n1+n2−shared)), so scores and the
      // (sim DESC, node_id) top-5 cut are bit-identical cross-engine.
      // Scale shape (the GIN-index recipe): the PROBE batch is the tiny
      // side — its exploded gram postings broadcast; the name store
      // explodes its grams map-side and equi-joins on the gram key
      // (candidates = names sharing ≥1 trigram with a probe; never an
      // all-pairs or LIKE scan), one (node, probe) count shuffle, and
      // the rank window partitions per probe over candidates only. At
      // 100 TB names the same plan holds: per-gram posting lists bound
      // the join fan-out exactly as the GIN index bounds page reads.
      // gram sets ride as xxhash64 longs from the fused pg_trgm hasher
      // (functions.PgTrigrams — the padded-word shred never enters
      // codegen as lambdas; HashedGramsSpec pins native ≡ template):
      // only per-pair COUNTS cross to the oracle, so the join key
      // representation is free, with the standard 2^-64 collision bound.
      import s.implicits._
      val probes = Seq("q1" -> "red wdget", "q2" -> "blu bolt", "q3" -> "smal gizmo",
                       "q4" -> "hott gear", "q5" -> "old blot")
        .toDF("probe_id", "probe_text")
        .withColumn("gs", graft.functions.PgTrigrams(col("probe_text")))
        .select(col("probe_id"), col("probe_text"), size(col("gs")).as("n2"),
                explode(col("gs")).as("g"))
      val names = T.part(s, d)
        .select(col("p_partkey").as("node_id"), col("p_name").as("name"),
                graft.functions.PgTrigrams(col("p_name")).as("gs"))
        .select(col("node_id"), col("name"), size(col("gs")).as("n1"),
                explode(col("gs")).as("g"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
        .orderBy(col("sim_ppm").desc, col("node_id"))
      names.join(broadcast(probes), "g")
        .groupBy(col("probe_id"), col("probe_text"), col("node_id"),
                 col("name"), col("n1"), col("n2"))
        .agg(count(lit(1)).as("sh"))
        .select(col("probe_id"), col("probe_text"), col("node_id"), col("name"),
                expr("(1000000 * sh) DIV (n1 + n2 - sh)").cast("long").as("sim_ppm"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .select(col("probe_id"), col("probe_text"), col("rank"),
                col("node_id"), col("name"), col("sim_ppm"))
        .orderBy(col("probe_id"), col("rank"))
    },

    Q(
      "osm_geometry_qa",
      """WITH memb AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref
        |  FROM lineitem),
        |pts AS (
        |  SELECT m.way_id, m.pos, m.node_ref,
        |         CAST(p_size AS BIGINT) * 100 AS lon_c,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c
        |  FROM memb m JOIN part ON m.node_ref = p_partkey),
        |w AS (
        |  SELECT way_id,
        |         list(node_ref ORDER BY pos, node_ref) AS refs,
        |         list(lon_c * 100000000 + lat_c ORDER BY pos, node_ref) AS pk
        |  FROM pts GROUP BY way_id),
        |f AS (
        |  SELECT way_id,
        |         CAST(len(refs) AS BIGINT) AS n_pts,
        |         CAST(len(list_filter(range(1, len(pk)), i -> pk[i] = pk[i + 1])) AS BIGINT) AS n_zero_len,
        |         (len(refs) >= 2 AND refs[1] = refs[len(refs)]) AS is_ring,
        |         CAST(len(refs) - len(list_distinct(refs))
        |              - CASE WHEN len(refs) >= 2 AND refs[1] = refs[len(refs)] THEN 1 ELSE 0 END AS BIGINT) AS n_illegal_repeats,
        |         CAST(len(list_distinct(pk)) AS BIGINT) AS n_distinct_pts
        |  FROM w)
        |SELECT way_id, n_pts, n_zero_len, is_ring, n_illegal_repeats,
        |       (n_zero_len = 0 AND n_illegal_repeats = 0
        |        AND NOT (is_ring AND n_distinct_pts < 3)) AS is_valid
        |FROM f ORDER BY way_id""".stripMargin
    ) { (s, d) =>
      // Geometry validity report — the osmose/JOSM-validator QA pass a
      // real OSM pipeline runs before assembly: per way, count
      // zero-length segments (consecutive identical coordinates — they
      // break simplification and length kernels), illegal repeated node
      // refs (a ref may legitimately repeat ONCE, as a ring's closing
      // point; any other repeat is a self-touch), and degenerate closed
      // rings (< 3 distinct points — no interior). All EXACT-INTEGER on
      // the fixed-point coords: points compare as a single injective
      // BIGINT key (lon·10⁸ + lat, lat < 10⁸ by fixture construction),
      // so no float epsilon to disagree cross-engine. Scale shape: the
      // one ordered regroup every geometry kernel already pays
      // (sort_array(collect_list)), then a map-only per-way projection —
      // flags compute in-row, nothing re-shuffles.
      val memb = T.lineitem(s, d).select(
        col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
        col("l_partkey").as("node_ref"))
      // r20 opt: the flags ran as two transform() + one filter() lambdas
      // plus two array_distinct passes per way — all interpreted.
      // GeomQaStats is the same exact-integer logic (consecutive pk
      // equality, ring test, distinct cardinalities) as ONE codegen'd
      // walk per row; equivalence is algebraic (FusedFoldsSpec pins it
      // expression-equal on adversarial ways + the oracle hash).
      memb.join(nodes(s, d), col("node_ref") === col("node_id"))
        .groupBy(col("way_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("node_ref"),
             col("lon_c"), col("lat_c")))).as("a"))
        .select(col("way_id"), graft.functions.GeomQaStats(col("a")).as("q"))
        .select(col("way_id"),
          col("q.n_pts").as("n_pts"),
          col("q.n_zero_len").as("n_zero_len"),
          col("q.is_ring").as("is_ring"),
          col("q.n_illegal_repeats").as("n_illegal_repeats"),
          (col("q.n_zero_len") === 0 && col("q.n_illegal_repeats") === 0 &&
            !(col("q.is_ring") && col("q.n_distinct_pts") < 3)).as("is_valid"))
        .orderBy(col("way_id"))
    },

    Q(
      "osm_route_dist",
      """WITH RECURSIVE memb AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node_ref
        |  FROM lineitem),
        |junc AS (
        |  SELECT node_ref AS jnode
        |  FROM (SELECT node_ref, count(DISTINCT way_id) AS c FROM memb GROUP BY node_ref)
        |  WHERE c >= 2),
        |pts AS (
        |  SELECT m.way_id, m.pos, m.node_ref,
        |         p_size * 100 AS lon_c, CAST(round(p_retailprice * 100) AS BIGINT) AS lat_c,
        |         (jnode IS NOT NULL) AS is_junc
        |  FROM memb m JOIN part ON m.node_ref = p_partkey
        |  LEFT JOIN junc ON m.node_ref = jnode),
        |ways AS (
        |  SELECT way_id,
        |         list(node_ref ORDER BY pos, node_ref) AS refs,
        |         list(lon_c ORDER BY pos, node_ref) AS lons,
        |         list(lat_c ORDER BY pos, node_ref) AS lats,
        |         list(is_junc ORDER BY pos, node_ref) AS js
        |  FROM pts GROUP BY way_id),
        |cuts AS (
        |  SELECT way_id, refs, lons, lats,
        |         list_filter(range(1, len(refs) + 1),
        |                     i -> i = 1 OR i = len(refs) OR js[i]) AS cs
        |  FROM ways),
        |edges AS (
        |  SELECT way_id, refs, lons, lats,
        |         unnest(list_transform(range(2, len(cs) + 1),
        |                k -> struct_pack(seq := k - 1, i0 := cs[k-1], i1 := cs[k]))) AS e
        |  FROM cuts),
        |rg AS (
        |  SELECT refs[e['i0']] AS from_node,
        |         refs[e['i1']] AS to_node,
        |         round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(e['i0'] + 1, e['i1'] + 1), i ->
        |             sqrt(CAST((lons[i] - lons[i-1]) * (lons[i] - lons[i-1])
        |                     + (lats[i] - lats[i-1]) * (lats[i] - lats[i-1]) AS DOUBLE)))),
        |           (a, b) -> a + b) * 1113.2, 1) AS w
        |  FROM edges),
        |und AS (
        |  SELECT from_node AS u, to_node AS v, w FROM rg
        |  UNION ALL SELECT to_node, from_node, w FROM rg),
        |walk(node, dist, hops) AS (
        |  SELECT CAST((SELECT min(node_ref) FROM memb) AS BIGINT), CAST(0 AS DOUBLE), 0
        |  UNION ALL
        |  SELECT und.v, walk.dist + und.w, walk.hops + 1
        |  FROM walk JOIN und ON und.u = walk.node WHERE walk.hops < 3)
        |SELECT node, round(min(dist), 1) AS dist_m
        |FROM walk GROUP BY node ORDER BY node""".stripMargin
    ) { (s, d) =>
      // Weighted single-source shortest distance over the EXTRACTED road
      // graph (3 relaxation rounds from the lowest node id) — routing on
      // the network `osm_road_graph` builds, i.e. the pgRouting serving
      // query. Distributed Bellman–Ford: each round is one equi-join
      // frontier relaxation + a min-aggregate — dist(v, r) = min over
      // ≤ r-edge paths, so three rounds ≡ the oracle's exhaustive
      // ≤ 3-hop path enumeration, at join cost instead of
      // path-explosion cost (the oracle materializes degreeᵏ paths; the
      // engine's per-round work is O(frontier × degree) with the min
      // folded in — the shape that survives a planet graph, the same
      // unrolled-rounds discipline as graph_shortest_path).
      // Determinism: every candidate distance is a left-assoc sum of
      // the per-edge 0.1-rounded weights along its path — bit-identical
      // in both engines — and min() picks from identical candidate
      // sets; only the final value rounds.
      // The routing GRAPH is a derived index, not query work: extract it
      // once per (session, dataset) into a parquet edge table (the same
      // build/probe split as the IVF and PQ indexes — production routing
      // never re-splits ways per query; `osm_road_graph` itself remains
      // the live extraction operator).
      val confKey = s"spark.sql.graft.roadgraphdir:$d"
      val root = s.conf.getOption(confKey).getOrElse {
        val dir = java.nio.file.Files.createTempDirectory("graft_roadgraph").toString
        roadGraph(s, d).select(col("from_node"), col("to_node"), col("length_m"))
          .write.mode("overwrite").parquet(s"$dir/edges")
        s.conf.set(confKey, dir)
        dir
      }
      val rg = s.read.parquet(s"$root/edges")
      val und = rg.select(col("from_node").as("u"), col("to_node").as("v"),
                          col("length_m").as("w"))
        .unionAll(rg.select(col("to_node"), col("from_node"), col("length_m")))
      // empty corpus: min is NULL -> no source -> empty result (the
      // driver's oracle compare only runs on non-empty fixtures; this
      // lane exists so a fresh/filtered region can't NPE the job)
      val srcRow = T.lineitem(s, d).agg(min(col("l_partkey"))).head
      import s.implicits._
      var dist =
        if (srcRow.isNullAt(0)) Seq.empty[(Long, Double)].toDF("node", "dist")
        else Seq((srcRow.getLong(0), 0.0)).toDF("node", "dist")
      for (_ <- 1 to 3) {
        val relaxed = dist.join(und, dist("node") === und("u"))
          .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
        // r19 A/B (negative result): localCheckpoint-per-round to stop
        // the frontier's plan doubling (the executed plan re-scans the
        // edge index 14 times) measured 0.84 s → 1.64 s solo at sf0.1 —
        // the tiny parallel re-scans are near-free while each checkpoint
        // is a serializing job. The unrolled lineage stands; the
        // convergence sibling (relaxConverged) keeps its per-round
        // truncation because its round count is unbounded.
        dist = dist.unionAll(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      }
      dist.select(col("node"), round(col("dist"), 1).as("dist_m"))
        .orderBy(col("node"))
    },

    // Convergence-detected WEIGHTED routing (VERDICT r14 "what's
    // missing" item 2) — the full pgRouting-class single-source
    // shortest distance `osm_route_dist`'s depth-3 oracle deliberately
    // bounds: frontier-delta Bellman–Ford iterated until no node's
    // distance improves, with a LOUD round budget (termination is
    // guaranteed without it — relaxation strictly decreases a finite
    // path-sum set — but a planet-scale graph that somehow exceeds the
    // budget should abort with the live frontier, not spin silently).
    // Same cached road-graph index, same source, same left-associated
    // 0.1-rounded edge-weight sums as the oracled key, so distances are
    // deterministic under re-runs and repartitioning; no SQL oracle —
    // the stopping rule is a runtime property, not a fixed point DuckDB
    // can state (Round15OpsSpec pins agreement with the depth-3 key
    // where 3 hops suffice, exactness on a long weighted chain the
    // unroll cannot reach, and the loud budget).
    Q.smoke("osm_route_dist_conv") { (s, d) =>
      val confKey = s"spark.sql.graft.roadgraphdir:$d"
      val root = s.conf.getOption(confKey).getOrElse {
        val dir = java.nio.file.Files.createTempDirectory("graft_roadgraph").toString
        roadGraph(s, d).select(col("from_node"), col("to_node"), col("length_m"))
          .write.mode("overwrite").parquet(s"$dir/edges")
        s.conf.set(confKey, dir)
        dir
      }
      val rg = s.read.parquet(s"$root/edges")
      val und = rg.select(col("from_node").as("u"), col("to_node").as("v"),
                          col("length_m").as("w"))
        .unionAll(rg.select(col("to_node"), col("from_node"), col("length_m")))
      val srcRow = T.lineitem(s, d).agg(min(col("l_partkey"))).head
      import s.implicits._
      if (srcRow.isNullAt(0))
        Seq.empty[(Long, Double)].toDF("node", "dist_m")
      else
        relaxConverged(und, srcRow.getLong(0))
          .select(col("node"), round(col("dist"), 1).as("dist_m"))
          .orderBy(col("node"))
    },

    Q(
      "osm_road_components",
      """WITH RECURSIVE memb AS (
        |  SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS node
        |  FROM lineitem),
        |w AS (
        |  SELECT way_id, list(node ORDER BY pos, node) AS refs
        |  FROM memb GROUP BY way_id),
        |pe AS (
        |  SELECT refs[i] AS a, refs[i+1] AS b
        |  FROM w, unnest(range(1, len(refs))) AS t(i)
        |  WHERE refs[i] <> refs[i+1]),
        |win AS (SELECT p_partkey AS node FROM part WHERE p_size <= 5),
        |eu AS (
        |  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM pe
        |  WHERE a IN (SELECT node FROM win) AND b IN (SELECT node FROM win)),
        |e AS (SELECT a AS src, b AS dst FROM eu UNION ALL SELECT b, a FROM eu),
        |reach AS (
        |  SELECT node AS src, node AS dst FROM win
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
        |SELECT src AS node, CAST(min(dst) AS BIGINT) AS component
        |FROM reach GROUP BY src
        |ORDER BY node""".stripMargin
    ) { (s, d) =>
      // Road-network connected components inside an analysis window —
      // the routing-QA readout behind "is the network one island?"
      // (orphaned subgraphs are the first thing a router build flags;
      // PostGIS users run exactly this with pgr_connectedComponents,
      // usually per extract/tile — the window here is the fixture's
      // p_size ≤ 5 node band, i.e. the clipped-extract shape: an edge
      // survives iff BOTH endpoints are inside). Connectivity needs no
      // junction splitting: every CONSECUTIVE node pair within a way is
      // an edge of the walk graph, so the edge set is one per-way
      // regroup (the osm_way_geometry shuffle) + an in-row pair unfold,
      // canonicalized undirected + distinct, clipped by two size-gated
      // semi-joins against the window node set. Components then come
      // from [[LlmOps.connectedComponents]] — large-star/small-star
      // contraction, O(log n) rounds to a star forest with a structural
      // certificate, per-round localCheckpoint lineage truncation — so
      // the component label is the exact MIN node id per component (the
      // oracle's transitive-closure min; CC-MR makes the same answer
      // O(log n) rounds instead of O(diameter) with no driver-side
      // graph, and is the lane that also runs UNWINDOWED at 100 TB —
      // the oracle's closure is O(V·|comp|), which is why the ORACLE
      // needs the bounded window; the Spark path does not).
      val memb = T.lineitem(s, d).select(
        col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
        col("l_partkey").as("node"))
      val win = T.part(s, d).where(col("p_size") <= 5)
        .select(col("p_partkey").as("node"))
      val pairs = memb
        .groupBy(col("way_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("node")))).as("r"))
        .where(size(col("r")) >= 2) // 1-node way: no edge (oracle's range(1,1) = empty)
        .select(explode(expr(
          "transform(sequence(0, size(r) - 2), i -> struct(r[i].node AS a, r[i+1].node AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .where(col("a") =!= col("b"))
      val edges = pairs
        .join(graft.Gate.bcast(win).withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(graft.Gate.bcast(win).withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"))
        .distinct()
      val (labels, _) = LlmOps.connectedComponents(win.select(col("node").as("id")), edges)
      labels.select(col("id").as("node"), col("lbl").as("component"))
        .orderBy(col("node"))
    }
  )

  /** Frontier-delta single-source WEIGHTED shortest distance, iterated
    * TO CONVERGENCE — `bfsConverged`'s relaxation-valued sibling: each
    * round relaxes only edges out of the nodes whose distance improved
    * last round (any further improvement must propagate through one of
    * them), min-collapses the candidates, and keeps the strict
    * improvers as the next frontier; an empty frontier IS convergence.
    * Strict `<` guards termination against zero-weight cycles, and
    * `localCheckpoint` per round truncates the lineage exactly as in
    * the iterative-op family (dedup_clusters / bfsConverged). Scale
    * shape per round: the delta frontier size-gate-broadcasts onto the
    * shuffle-partitioned edge fact, one min-collapse on dst, one
    * left-join against the |V|-sized dist table; the tiny frontier
    * count is the convergence action. Distances stay deterministic:
    * every candidate is a left-associated sum of the 0.1-rounded edge
    * weights along its path, and min() picks from identical candidate
    * sets on any partitioning.
    */
  private[graft] def relaxConverged(edges: org.apache.spark.sql.DataFrame, source: Long,
                                    maxRounds: Int = 128): org.apache.spark.sql.DataFrame = {
    val s = edges.sparkSession
    val e = edges.localCheckpoint() // derived index: scan once, not once per round
    // Size-gated driver fast path (the connectedComponents union-find
    // arm's routing sibling): convergence-depth iteration costs one
    // scheduling round-trip PER RELAXATION ROUND — ~0.25 s × graph
    // diameter of pure overhead at any data size — while the answer is
    // fully determined by the edge set alone. Under the budget, collect
    // the edges and run heap Dijkstra on the driver; distances are
    // bit-identical to the distributed fixpoint because both arms
    // evaluate the SAME left-associated dist[u]+w path sums and take
    // the same min over them (non-negative weights make Dijkstra's
    // settled value that min). Above the budget — a planet graph's edge
    // set can exceed any driver heap — the frontier-delta relaxation
    // below takes over silently; Round15OpsSpec pins the arms equal
    // with the gate forced off.
    val nE = e.count()
    val gateEdges = s.conf.getOption("spark.sql.graft.routeDriverGateEdges")
      .map(_.toLong).getOrElse(4000000L)
    val shapeOk = e.schema.fields.map(_.dataType) match {
      case Array(org.apache.spark.sql.types.LongType,
                 org.apache.spark.sql.types.LongType,
                 org.apache.spark.sql.types.DoubleType) => true
      case _ => false
    }
    if (nE <= gateEdges && shapeOk) {
      import scala.jdk.CollectionConverters._
      val adj = new java.util.HashMap[Long, java.util.ArrayList[(Long, Double)]]()
      for (r <- e.toLocalIterator().asScala)
        adj.computeIfAbsent(r.getLong(0), _ => new java.util.ArrayList[(Long, Double)]())
          .add((r.getLong(1), r.getDouble(2)))
      val best = new java.util.HashMap[Long, Double]()
      val pq = new java.util.PriorityQueue[(Double, Long)](
        11, java.util.Comparator.comparingDouble((p: (Double, Long)) => p._1))
      best.put(source, 0.0); pq.add((0.0, source))
      while (!pq.isEmpty) {
        val (d0, u) = pq.poll()
        if (d0 == best.get(u)) { // stale entries skip; settled = current best
          val out = adj.get(u)
          if (out != null) out.forEach { case (v, w) =>
            val nd = d0 + w
            // containsKey, not get-vs-null: a missing key's null would
            // silently unbox to 0.0 under the primitive value type
            if (!best.containsKey(v) || nd < best.get(v)) { best.put(v, nd); pq.add((nd, v)) }
          }
        }
      }
      val rows = best.entrySet().asScala.toSeq.map(kv => (kv.getKey.longValue(), kv.getValue.doubleValue()))
      import s.implicits._
      return rows.toDF("node", "dist")
    }
    var dist = s.range(1).select(lit(source).as("node"), lit(0.0).as("dist")).localCheckpoint()
    var frontier = dist
    var round = 0
    var live = 1L
    while (live > 0) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"relaxConverged: frontier still live ($live nodes) after $maxRounds rounds — " +
            "graph needs more relaxation rounds than the budget; raise maxRounds explicitly")
      val cand = e.join(graft.Gate.bcast(frontier.withColumnRenamed("node", "u")), Seq("u"))
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      frontier = cand.join(dist.withColumnRenamed("dist", "old"), Seq("node"), "left")
        .where(col("old").isNull || col("dist") < col("old"))
        .select(col("node"), col("dist")).localCheckpoint()
      live = frontier.count()
      if (live > 0)
        dist = dist.unionByName(frontier)
          .groupBy(col("node")).agg(min(col("dist")).as("dist")).localCheckpoint()
    }
    dist
  }

  /** Shared routing-edge dataflow (rationale at `osm_road_graph`):
    * junction-split way edges with way_id / edge_seq / from / to /
    * n_pts and the bit-deterministic metric length. */
  private def roadGraph(s: org.apache.spark.sql.SparkSession, d: String) = {
    val memb = T.lineitem(s, d).select(
      col("l_orderkey").as("way_id"), col("l_linenumber").as("pos"),
      col("l_partkey").as("node_ref"))
    val junc = memb.groupBy(col("node_ref"))
      .agg(countDistinct(col("way_id")).as("nways"))
      .where(col("nways") >= 2).select(col("node_ref").as("jnode"))
    // sort-cut-split-fold runs FUSED per way (functions.RoadEdges — one
    // pass over the point array, bit-equal IEEE dataflow to the four
    // interpreted lambdas it replaces; RoadGraphSpec's sparse fixture
    // pins the splitting semantics). Meter factor + final-only round
    // stay here, next to the oracle's.
    memb.join(nodes(s, d), col("node_ref") === col("node_id"))
      .join(graft.Gate.bcast(junc), col("node_ref") === col("jnode"), "left")
      .withColumn("is_junc", col("jnode").isNotNull)
      .groupBy(col("way_id"))
      .agg(collect_list(struct(col("pos"), col("node_ref"), col("lon_c"),
                               col("lat_c"), col("is_junc"))).as("pts"))
      .select(col("way_id"),
        posexplode(graft.functions.RoadEdges(col("pts"))).as(Seq("seq0", "e")))
      .select(
        col("way_id"),
        (col("seq0") + 1).cast("long").as("edge_seq"),
        col("e.from_node"),
        col("e.to_node"),
        col("e.n_pts"),
        round(col("e.len_raw") * 1113.2, 1).as("length_m"))
  }
}
