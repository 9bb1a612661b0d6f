package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All keyed operator queries (SURVEY.md §2 inventory). */
  def registry: Seq[Q] =
    operators.Flagship.all ++
      operators.Scans.all ++
      operators.Filters.all ++
      operators.Joins.all ++
      operators.Aggs.all ++
      operators.Sorts.all ++
      operators.SetOps.all ++
      operators.Windows.all ++
      operators.Scalars.all ++
      operators.OsmKernels.all ++
      operators.LlmOps.all ++
      operators.TrainingOps.all ++
      operators.EmbeddingOps.all ++
      operators.StreamOps.all ++
      operators.EventOps.all ++
      operators.SqlSurface.all ++
      operators.Extensibility.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.key -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
