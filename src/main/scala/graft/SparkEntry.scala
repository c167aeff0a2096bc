package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §3 + the builder prompt.
  * Queries are contributed by the §2 operator-family groups; every oracled
  * entry is parity-gated locally by scripts/parity.py before being
  * declared here (SURVEY.md §5 t2 pre-flight).
  */
object SparkEntry {
  private val groups: Seq[QueryGroup] = Seq(
    operators.Scans,
    operators.Filters,
    operators.Joins,
    operators.Aggregates,
    operators.Windows,
    operators.SortsSets,
    functions.ScalarFns,
    operators.LlmText,
    operators.LlmVector,
    operators.EventsBatch,
    operators.Graph,
    operators.SqlSurface,
    operators.Pipeline,
    operators.Sampling,
    operators.Curation,
    functions.Udx,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, streaming) → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}
