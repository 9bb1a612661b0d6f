package graft

import graft.operators.EmbeddingOps
import org.apache.spark.sql.functions._

/** `emb_kmeans` (§2.K trainer for the IVF coarse quantizer): the
  * properties an approximate iterative fitter must still guarantee.
  */
class KmeansSpec extends GraftSuite {

  test("spherical lloyd: inertia is non-increasing across iterations") {
    val (_, hist) = EmbeddingOps.kmeans(T.embeddings(spark, sf), k = 4, iters = 4, trackInertia = true)
    assert(hist.size === 4)
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $hist")
    }
  }

  test("assignment covers every vector exactly once, cids within range") {
    val e = T.embeddings(spark, sf)
    val (assigned, _) = EmbeddingOps.kmeans(e, k = 4, iters = 2)
    assert(assigned.count() === e.count())
    assert(assigned.select(countDistinct(col("vec_id"))).head.getLong(0) === e.count())
    assert(assigned.where(col("cid") < 0 || col("cid") >= 4).count() === 0)
  }

  test("assignment stage is map-only: zero Exchange in the plan") {
    // The 100 TB contract (VERDICT r5): scoring the corpus against the
    // codebook must be a pure projection — the literal-folded argmax
    // means no corpus row ever leaves its task during assignment. The
    // returned assignments frame IS the assignment dataflow (projection
    // over the scan), so its physical plan must contain no Exchange.
    val (assigned, _) = EmbeddingOps.kmeans(T.embeddings(spark, sf), k = 4, iters = 2)
    val p = assigned.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"assignment shuffled the corpus:\n$p")
    // and the scoring kernel is codegen'd ("*(n)" marks a
    // WholeStageCodegen stage in the plan string)
    assert(p.contains("*("), p)
  }

  test("training is deterministic: identical codebook on re-run") {
    val e = T.embeddings(spark, sf)
    val a = EmbeddingOps.kmeans(e, k = 4, iters = 2)._1.orderBy("vec_id").collect().map(_.toSeq)
    val b = EmbeddingOps.kmeans(e, k = 4, iters = 2)._1.orderBy("vec_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
