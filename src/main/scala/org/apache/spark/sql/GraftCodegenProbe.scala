package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Bridge into Spark's `private[spark]` codegen compiler to MEASURE the
  * bytecode size of every whole-stage-generated method in a plan — the
  * JIT-cliff audit instrument (VERDICT r16 #7).
  *
  * Why bytecode, not source text: HotSpot's `-XX:-DontCompileHugeMethods`
  * cap is 8000 BYTECODE bytes per method (`HugeMethodLimit`); a generated
  * method past it never JIT-compiles and the whole produce/consume loop
  * runs interpreted — the failure mode measured live at 21× on
  * `osm_dwithin_count` in r16 when a ~200-flop WGS84 polynomial template
  * was substituted into a join residual. Source-length proxies miss the
  * constant-pool/expression-tree blowup; Janino's own stats are exact.
  */
object GraftCodegenProbe {

  /** (codegenStageId, maxMethodBytecodeBytes) for every WholeStageCodegen
    * subtree in the EXECUTED plan (call after an action so AQE stages are
    * final). Compilation hits Spark's codegen cache when the query already
    * ran, so the probe is cheap.
    */
  def maxMethodBytecode(plan: SparkPlan): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case w: WholeStageCodegenExec =>
        val (_, code) = w.doCodeGen()
        val (_, stats) = CodeGenerator.compile(code)
        out += ((w.codegenStageId, stats.maxMethodCodeSize))
        w.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }
}
