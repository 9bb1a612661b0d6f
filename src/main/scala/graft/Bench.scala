package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR (driver: sf0.1) on local[32] and emits machine-
  * readable timings.
  *
  * Output contract (driver tail-captures ~2000 chars of stdout, so the
  * record is made robust to that):
  *  - per-query progress goes to STDERR (never pollutes the stdout tail);
  *  - the full record is ALSO written to ./BENCH_FULL.json;
  *  - stdout gets the full `{"metric":"total",...}` line, then a compact
  *    total-only line LAST so a tail capture always contains one complete,
  *    parseable record (the full line's queries map alone exceeds 2 KB).
  *
  * Stability protocol (VERDICT r3 item 5: the same code recorded 59.5s /
  * 65.5s / 93.9s totals on the shared box — the gate must not hinge on
  * box weather): the suite now runs SPARK_GRAFT_RUNS (default 3) FULL
  * sweeps in one JVM. Per query, the reported time is the MIN across all
  * sweeps × intra-sweep repeats (steady-state plan cost — what predicts
  * cluster behavior). The headline `value` is the MEDIAN of complete
  * sweep totals (sweep 1 carries one-time codegen/JIT; the median sheds
  * both that and one-off noise spikes); all sweep totals are recorded so
  * consecutive artifacts can be compared run-over-run.
  *
  * JVM-lifecycle hygiene (round-2 lesson: identical trivial plans ran
  * 10–50× slower at the END of the 122-query single-JVM run — the
  * signature of code-cache/metaspace pressure from accumulated janino
  * classes and unreaped broadcasts, not plan regressions):
  *  - every query: clearCache + drop stray temp tables;
  *  - every GC_EVERY queries: System.gc() — a full GC unloads dead
  *    generated classes (freeing JIT code cache + metaspace) and lets
  *    ContextCleaner reap broadcast blocks;
  *  - build.sbt gives the forked JVM -XX:ReservedCodeCacheSize headroom.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local profiling aid: SPARK_GRAFT_ONLY=q1,q2 restricts the run;
    // the driver never sets it, so the recorded bench is always complete.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // SPARK_GRAFT_RUNS full sweeps; SPARK_GRAFT_REPEAT executions per
    // query within a sweep (min taken over all runs × repeats).
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(1)
    val GC_EVERY = 8
    val wall0 = System.nanoTime()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    var done = 0
    // perRun(r): name -> seconds for queries that succeeded in sweep r
    val perRun: Seq[Map[String, Double]] = (1 to runs).map { r =>
      names.flatMap { case (name, fn) =>
        val times = (1 to repeat).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch {
              case t: Throwable =>
                errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
                false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          // operators may cache small intermediates; drop them so queries
          // don't compete for executor memory across the run
          spark.catalog.clearCache()
          spark.catalog.listTables().collect()
            .filter(_.name.startsWith("graft_bkt"))
            .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
          if (ok) Some(dt) else None
        }
        done += 1
        if (done % GC_EVERY == 0) System.gc()
        // a failed query contributes NO timing (VERDICT r2: a fast
        // exception path must never masquerade as a fast query)
        val rec = times.minOption.map(name -> _)
        System.err.println(
          rec.fold(s"[bench] run $r/$runs $name FAILED: ${errors.getOrElse(name, "?")}") {
            case (_, t) => f"[bench] run $r/$runs $name ${t}%.3f s"
          })
        rec
      }.toMap
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    def jnum(v: Double): String = f"$v%.3f"
    // per-query steady-state cost: min over every successful execution
    val best: Seq[(String, Double)] = names.map(_._1)
      .flatMap(n => perRun.flatMap(_.get(n)).minOption.map(n -> _))
    // sweep totals, only over sweeps in which every query succeeded —
    // a partial sweep's total would undercount and skew the median down
    val complete = perRun.filter(_.size == names.size)
    val totals = complete.map(_.values.sum)
    val sortedTotals = totals.sorted
    val median =
      if (sortedTotals.isEmpty) best.map(_._2).sum // all sweeps partial: fall back
      else sortedTotals(sortedTotals.size / 2)
    val qs = best.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val totalsJson = totals.map(jnum).mkString("[", ",", "]")
    val minTotal = sortedTotals.headOption.getOrElse(best.map(_._2).sum)
    val full =
      s"""{"metric":"total","value":${jnum(median)},"unit":"sec","queries":$qs,""" +
        s""""errors":$es,"n_queries":${best.size},"runs":$runs,"repeat":$repeat,""" +
        s""""run_totals":$totalsJson,"total_median":${jnum(median)},"total_min":${jnum(minTotal)},""" +
        s""""sum_of_query_mins":${jnum(best.map(_._2).sum)},""" +
        s""""wall_sec":${jnum(wall)},"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        full.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort; stdout is the contract
    // refresh the pipeline-chain round artifact (ETL lake → unified
    // serving load at sf0.01, ~17 s): record goes to PIPELINE_CHAIN.json
    // + stderr only — stdout stays a single parseable bench record.
    // Best-effort: a chain failure is reported, never fails the bench.
    try {
      val chainSf = sys.env.getOrElse("SPARK_GRAFT_CHAIN_SF_DIR", "/root/testdata/sf0.01")
      System.err.println("[bench] " + graft.plans.PipelineChain.record(spark, chainSf))
    } catch {
      case t: Throwable => System.err.println(
        s"[bench] pipeline_chain FAILED: ${Option(t.getMessage).getOrElse(t.getClass.getName).take(200)}")
    }
    println(full)
    // compact duplicate LAST: complete within any >=300-char stdout tail
    println(
      s"""{"metric":"total","value":${jnum(median)},"unit":"sec","queries":{},""" +
        s""""n_queries":${best.size},"n_errors":${errors.size},"runs":$runs,""" +
        s""""run_totals":$totalsJson,"total_min":${jnum(minTotal)},""" +
        s""""wall_sec":${jnum(wall)},"sf":"$sfDir","full_record":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
