package graft

import graft.functions.SimplifyIndices
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** `osm_way_simplify` — Douglas–Peucker generalization: the classic DP
  * contracts, checked against brute force on random polylines and on the
  * registered query's real output.
  */
class SimplifySpec extends GraftSuite {

  private def dp(lons: Array[Long], lats: Array[Long], tol: Long): Seq[Int] = {
    val out = SimplifyIndices.simplify(
      new GenericArrayData(lons), new GenericArrayData(lats), tol)
    (0 until out.numElements()).map(out.getInt)
  }

  /** True perpendicular deviation of point k from chord (i, j). */
  private def dev(lons: Array[Long], lats: Array[Long], i: Int, j: Int, k: Int): Double = {
    val dx = (lons(j) - lons(i)).toDouble
    val dy = (lats(j) - lats(i)).toDouble
    val len = math.hypot(dx, dy)
    if (len == 0) math.hypot((lons(k) - lons(i)).toDouble, (lats(k) - lats(i)).toDouble)
    else math.abs(dx * (lats(i) - lats(k)).toDouble - (lons(i) - lons(k)).toDouble * dy) / len
  }

  test("DP contracts on random polylines: endpoints, subsequence, deviation bound, idempotence") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 40) {
      val n = 2 + rnd.nextInt(40)
      val lons = Array.fill(n)(rnd.nextInt(5000).toLong)
      val lats = Array.fill(n)(rnd.nextInt(120000).toLong + 90000)
      val tol = 1000L + rnd.nextInt(40000)
      val keep = dp(lons, lats, tol)
      // endpoints always kept; indices strictly ascending (a subsequence)
      assert(keep.head == 0 && keep.last == n - 1)
      assert(keep == keep.sorted && keep.distinct == keep)
      // every DROPPED point deviates ≤ tol from the chord of its
      // surviving neighbors (the DP guarantee)
      keep.sliding(2).foreach {
        case Seq(a, b) =>
          ((a + 1) until b).foreach { k =>
            assert(dev(lons, lats, a, b, k) <= tol + 1e-6,
              s"dropped point $k deviates ${dev(lons, lats, a, b, k)} > $tol")
          }
        case _ => ()
      }
      // idempotence: simplifying the simplified line keeps everything
      val slons = keep.map(lons).toArray
      val slats = keep.map(lats).toArray
      assert(dp(slons, slats, tol) == slons.indices.toList)
    }
  }

  test("registered query reduces point counts and keeps wkb consistent") {
    val out = SparkEntry.queries("osm_way_simplify")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, wkbLen) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept >= math.min(n, 2) && kept <= n)
      assert(wkbLen == 9 + 16 * kept)
    }
    // the tolerance actually generalizes this corpus (not a no-op)
    val total = rows.map(_.getLong(1)).sum
    val keptTotal = rows.map(_.getLong(2)).sum
    assert(keptTotal < total, s"no reduction: $keptTotal of $total")
  }
}
