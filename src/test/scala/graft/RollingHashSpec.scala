package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._

/** The codegen'd RollingHash must be value-identical to the higher-order
  * lambda fold it replaced (which itself is pinned to DuckDB's
  * `list_reduce` by the text_fingerprint oracle) — over the real corpus
  * and on unicode/empty edges the corpus may not contain.
  */
class RollingHashSpec extends GraftSuite {

  private def lambdaFp(lenExpr: String) = expr(
    s"""aggregate(transform(sequence(1, $lenExpr), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
       |  0L, (acc, c) -> (acc * 131 + c) % 1000000007)""".stripMargin)

  test("expression equals the lambda fold over the whole corpus (full + prefix64)") {
    val diff = T.documents(spark, sf)
      .select(col("doc_id"),
        RollingHash(col("text")).as("a"),
        lambdaFp("length(text)").as("b"),
        RollingHash(col("text"), 64).as("ap"),
        lambdaFp("least(length(text), 64)").as("bp"))
      .where(col("a") =!= col("b") || col("ap") =!= col("bp"))
    assert(diff.count() === 0)
  }

  test("unicode and empty edges match the lambda fold") {
    import spark.implicits._
    val edges = Seq("", "A", "éé", "中文 mixed ascii é", "a\nb\tc", " ").toDF("text")
    val diff = edges
      .select(RollingHash(col("text")).as("a"), lambdaFp("length(text)").as("b"),
              RollingHash(col("text"), 3).as("ap"), lambdaFp("least(length(text), 3)").as("bp"))
      .where(col("a") =!= col("b") || col("ap") =!= col("bp"))
    assert(diff.count() === 0)
  }
}
