package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session keeps the
  * suite fast; tests must not depend on session-level mutable state).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Tag for the whole-registry sweeps, tri-scale probes, and streaming
  * soak tests (VERDICT r17 #7: suite wall clock grows linearly with the
  * key inventory — 321 tests → ~13 min). The per-commit lane runs
  * `sbt quickTest` (excludes these); the full matrix (`sbt test`) runs
  * at round close and before any driver hand-off. Tag a test Heavy when
  * it iterates the whole registry or runs a multi-batch streaming query;
  * every Heavy test must have a quick sibling covering the same code's
  * single-key path (the registry sweeps are breadth, not depth).
  */
object Heavy extends org.scalatest.Tag("graft.Heavy")

abstract class GraftSuite extends AnyFunSuite {
  protected lazy val spark: SparkSession = TestSpark.spark
  protected val sf: String = TestSpark.sf
}
