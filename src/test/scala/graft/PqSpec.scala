package graft

import org.apache.spark.sql.functions._

/** Product-quantization invariants (`emb_pq_quantize` / `sim_pq_adc` are
  * approximate → non-oracled). Reference semantics are recomputed
  * DRIVER-SIDE from first principles (collected fixture vectors + the
  * trained codebook), independent of every Spark expression under test.
  */
class PqSpec extends GraftSuite {

  private val M = operators.EmbeddingOps.PqM
  private val DSUB = operators.EmbeddingOps.PqDsub
  private val K = operators.EmbeddingOps.PqK

  private def vecs: Map[Long, Array[Double]] =
    T.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def encode(v: Array[Double], cb: Map[Int, Seq[(Int, Array[Double])]]): Array[(Int, Double)] =
    (0 until M).map { j =>
      val sub = v.slice(j * DSUB, (j + 1) * DSUB)
      cb(j).map { case (cid, c) =>
        (sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min.swap
    }.toArray

  test("emb_pq_quantize: coverage, code range, deterministic re-run, driver-recomputed codes") {
    val rows = SparkEntry.queries("emb_pq_quantize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getDouble(3)))).toMap
    val vs = vecs
    assert(rows.size == vs.size * M, "every vector must get exactly m codes")
    assert(rows.values.forall { case (c, _) => c >= 0 && c < K }, "codes in [0, k)")
    val again = SparkEntry.queries("emb_pq_quantize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getDouble(3)))).toMap
    assert(rows == again, "re-run must be bit-identical")
    val cb = operators.EmbeddingOps.pqTrain(T.embeddings(spark, sf), M, DSUB, K, iters = 2)
    for ((vid, v) <- vs; (j, (code, dist)) <- encode(v, cb).zipWithIndex.map(_.swap)) {
      val (gotCode, gotDist) = rows((vid, j))
      assert(gotCode == code, s"vec $vid sub $j: code $gotCode vs driver $code")
      assert(math.abs(gotDist - dist) < 1e-6, s"vec $vid sub $j: dist $gotDist vs driver $dist")
    }
  }

  test("pqTrain: Lloyd iterations never increase total distortion") {
    val e = T.embeddings(spark, sf)
    val vs = vecs
    def distortion(cb: Map[Int, Seq[(Int, Array[Double])]]): Double =
      vs.values.map(v => encode(v, cb).map(_._2).sum).sum
    val d0 = distortion(operators.EmbeddingOps.pqTrain(e, M, DSUB, K, iters = 0))
    val d1 = distortion(operators.EmbeddingOps.pqTrain(e, M, DSUB, K, iters = 1))
    val d2 = distortion(operators.EmbeddingOps.pqTrain(e, M, DSUB, K, iters = 2))
    assert(d1 <= d0 + 1e-9 && d2 <= d1 + 1e-9, s"distortion must be monotone: $d0 -> $d1 -> $d2")
  }

  test("sim_pq_adc: shortlist+rerank reproduces the driver-side pipeline exactly; recall floor holds") {
    val got = SparkEntry.queries("sim_pq_adc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == math.min(10, vecs.size - 1))
    val vs = vecs
    val q = vs(0L)
    val cb = operators.EmbeddingOps.pqTrain(T.embeddings(spark, sf), M, DSUB, K, iters = 2)
    val lut = (0 until M).map { j =>
      cb(j).sortBy(_._1).map { case (_, c) =>
        c.zipWithIndex.map { case (v, i) => val t = q(j * DSUB + i) - v; t * t }.sum
      }
    }
    def adc(v: Array[Double]): Double =
      encode(v, cb).zipWithIndex.map { case ((code, _), j) => lut(j)(code) }.sum
    def exact(v: Array[Double]): Double =
      v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    // the full pipeline is deterministic — recompute it from scratch:
    // ADC-order the corpus, shortlist 64, exact-rerank, take 10
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = vs.toSeq.filter(_._1 != 0L)
      .map { case (vid, v) => (vid, r6(adc(v)), r6(exact(v))) }
      .sortBy { case (vid, a, _) => (a, vid) }.take(64)
      .sortBy { case (vid, _, e) => (e, vid) }.take(10)
    assert(got.toSeq == expected,
      s"pipeline mismatch:\n got  ${got.toSeq}\n want $expected")
    // rerank recall against the exact full-corpus scan
    val exactTop = vs.toSeq.filter(_._1 != 0L)
      .map { case (vid, v) => vid -> exact(v) }
      .sortBy { case (vid, d) => (d, vid) }.take(10).map(_._1).toSet
    val recall = got.map(_._1).count(exactTop) / 10.0
    assert(recall >= operators.RecallFloors.simPqAdc, s"rerank recall@10 $recall below floor (got ${got.map(_._1).toSeq})")
  }
}
