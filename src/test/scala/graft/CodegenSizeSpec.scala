package graft

import org.apache.spark.sql.GraftCodegenProbe

/** JIT-cliff audit (VERDICT r16 #7). HotSpot never JIT-compiles a method
  * past 8000 bytecode bytes (`HugeMethodLimit`), so any whole-stage-
  * generated method near that bound runs the risk of dropping the whole
  * produce/consume loop to the interpreter — measured live at 21× on
  * `osm_dwithin_count` in r16 when the WGS84 polynomial template landed
  * in a join residual. This spec measures the ACTUAL compiled bytecode
  * (Janino's stats via GraftCodegenProbe) for every key that substitutes
  * a large shared arithmetic template into projections or join
  * conditions, and fails if any generated method crosses HALF the cliff
  * (4000 bytes) — 2× headroom, so template growth trips a spec long
  * before it trips the interpreter. Audit numbers per round live in
  * ADVICE.md.
  */
class CodegenSizeSpec extends GraftSuite {

  private val cliff = 8000
  private val budget = cliff / 2

  // every key carrying a transcendental/polynomial template that Catalyst
  // could substitute multiple times into one generated method, with its
  // audit allowance. Default = half the cliff (2× headroom). The one
  // documented exemption: data_drift_psi substitutes lnProbTpl twice
  // (plus two share divisions) into the PSI term projection — 5473 bytes
  // measured (r17) — but that projection consumes the |event_types|×24
  // bucket GRID, bounded by construction at any corpus size (hours are
  // 24; PSI is a bucketed statistic), so even interpreted execution
  // costs microseconds; the pin sits at 6500, still under the cliff, so
  // ~20% template growth fails this spec before it can reach the
  // interpreter on ANY key that copies the pattern onto a fact stream.
  private val audited = Seq(
    "osm_dwithin_count"       -> budget, // r16 incident site (factor-dim fix)
    "osm_way_length_geodesic" -> budget, // geoSeg template per segment
    "osm_way_area_geodesic"   -> budget, // geoAreaScale template
    "osm_project_mercator"    -> budget, // range-reduced ln/tan polynomial
    "text_perplexity"         -> budget, // shared lnProbTpl
    "text_bigram_lm"          -> budget, // lnProbTpl in projection
    "text_entropy"            -> budget, // lnProbTpl in projection
    "data_drift_psi"          -> 6500,   // lnProbTpl ×2, bounded grid input
    "event_survival_km"       -> budget, // lnProbTpl on the duration axis
    "text_quality_buckets"    -> budget, // lnProbTpl inside the nll aggregate
    "text_dsir_weight"        -> budget, // lnProbTpl ×2 on the bigram stream
    // lnProbTpl ×2, but the projection consumes the top-100 TakeOrdered
    // cut — input bounded at 100 rows by construction, so interpreted
    // execution would cost microseconds; same exemption class as
    // data_drift_psi, pin still trips ~20% template growth
    "text_zipf_fit"           -> 6500,
    "text_perplexity_kn"      -> budget, // lnProbTpl over the KN mixture (r18)
    "sample_weighted_reservoir" -> budget) // lnProbTpl over the ES key (r18)

  test("r16 incident key stays under its JIT-cliff budget (quick lane)") {
    // single-key sibling of the Heavy sweep below (TagDisciplineSpec):
    // the per-commit lane re-audits the one key where the cliff was hit
    // live, so a template regression is caught without the full matrix
    val df = SparkEntry.queries("osm_dwithin_count")(spark, sf)
    df.collect()
    val sizes = org.apache.spark.sql.GraftCodegenProbe.maxMethodBytecode(df.queryExecution.executedPlan)
    Caches.drain()
    val worst = if (sizes.isEmpty) 0 else sizes.map(_._2).max
    assert(worst <= budget,
      s"osm_dwithin_count: $worst bytecode bytes exceeds the $budget-byte budget; per-stage: $sizes")
  }

  test("audited template keys: every whole-stage method stays under its JIT-cliff budget", Heavy) {
    val report = audited.map { case (key, allowance) =>
      val df = SparkEntry.queries(key)(spark, sf)
      df.collect() // finalize AQE stages; compile hits the codegen cache
      val sizes = GraftCodegenProbe.maxMethodBytecode(df.queryExecution.executedPlan)
      Caches.drain()
      val worst = if (sizes.isEmpty) 0 else sizes.map(_._2).max
      (key, allowance, worst, sizes)
    }
    info(report.map { case (k, _, w, _) => s"$k=$w" }.mkString("max method bytecode: ", ", ", ""))
    report.foreach { case (key, allowance, worst, sizes) =>
      assert(worst <= allowance,
        s"$key: generated method at $worst bytecode bytes exceeds the " +
          s"$allowance-byte audit budget (cliff $cliff) — stage the template into a " +
          s"broadcast factor dimension like osm_dwithin_count; per-stage: $sizes")
    }
  }
}
