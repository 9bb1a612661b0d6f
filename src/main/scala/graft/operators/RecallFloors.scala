package graft.operators

/** Recall floors for the approximate-similarity keys (r15 verdict item
  * 6): ONE set of constants shared by the asserting specs
  * (SmokeOpsSpec, IvfIndexSpec, PqSpec, Round15OpsSpec) and by the
  * pinned measured-recall table in `SCALE.md` §"Round 16", so a recall
  * regression is visible in review — the table and the spec boundary
  * can't drift apart. Floors are measured values minus sampling slack on
  * the synthetic corpus (top-10 membership ⇒ ±0.1 granularity), not
  * aspirations: the fixture's true neighbours are WEAK (cosine ≈ 0.36,
  * 63–69° — SmokeOpsSpec's analytic note), which bounds what any
  * 8-bit/8-cell blocking can recall here.
  */
object RecallFloors {
  /** `sim_cosine_lsh`: the primary pin is exact (result ≡ brute force
    * over the hamming≤2-reachable set); this is the |measured −
    * analytic| BAND of the angular-model cross-check. */
  val simCosineLshAnalyticBand = 0.2

  /** `sim_cosine_ivf` recall@10 vs exact cosine top-10 (3 of 10 label
    * cells probed; labels are not tight clusters on this corpus). */
  val simCosineIvf = 0.2

  /** `sim_ivf_partitioned` recall@10 vs exact cosine top-10 (nprobe=3
    * of 8 TRAINED cells — trained blocks beat label blocks). */
  val simIvfPartitioned = 0.5

  /** `sim_pq_adc` rerank recall@10 vs the exact full-corpus L2 scan
    * (M=8 sub-quantizers, shortlist 64, exact rerank). */
  val simPqAdc = 0.4

  /** `dedup_semantic_kmeans` drop recall vs the global un-blocked ≥ τ
    * truth (one-hop keep-lowest-id; cells split some true pairs by
    * design — the scan-budget/recall trade SemDeDup makes). */
  val dedupSemanticKmeans = 0.2

  /** `sim_graph_search` beam-search recall@10 vs the exact full-corpus
    * cosine top-10 (greedy beam B=8 over the label-blocked k=3 kNN
    * graph + representative long-edge star; measured 0.3 at sf0.001 —
    * graph navigability, not beam width, is the binding limit on this
    * weak-neighbour fixture, the same geometry that bounds the LSH
    * row). The efficiency half is pinned separately: visited ≪ corpus. */
  val simGraphSearch = 0.2
}
