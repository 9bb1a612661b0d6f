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
    // SPARK_GRAFT_REPEAT=n runs each query n times, reporting the
    // per-query MIN. Default 2: the first pass pays one-time codegen/JIT,
    // the min reflects the plan's steady-state cost — the number that
    // actually predicts cluster behavior (VERDICT r2 recommended min-of-n
    // inside the official run; wall_sec below keeps the raw cost honest).
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2)
    val GC_EVERY = 8
    val wall0 = System.nanoTime()
    var done = 0
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
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
          rec.fold(s"[bench] $done $name FAILED: ${errors.getOrElse(name, "?")}") { case (_, t) =>
            f"[bench] $done $name ${t}%.3f s (min of ${times.size})"
          })
        rec
      }
    val wall = (System.nanoTime() - wall0) / 1e9
    def jnum(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val full =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,""" +
        s""""errors":$es,"n_queries":${results.size},"repeat":$repeat,""" +
        s""""wall_sec":${jnum(wall)},"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        full.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort; stdout is the contract
    println(full)
    // compact duplicate LAST: complete within any >=300-char stdout tail
    println(
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":{},""" +
        s""""n_queries":${results.size},"n_errors":${errors.size},"repeat":$repeat,""" +
        s""""wall_sec":${jnum(wall)},"sf":"$sfDir","full_record":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
