package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One SURVEY.md §2 operator family. Each member contributes
  * (name -> query fn) pairs plus DuckDB oracle SQL for the driver's t2
  * hash-compare. Contract (SURVEY.md §3.2, §7.4):
  *   - every query fn ends in a total ORDER BY (ties fully broken);
  *   - oracle SQL carries the identical ORDER BY with explicit
  *     NULLS FIRST/LAST matching Spark defaults (ASC→first, DESC→last);
  *   - output column names match exactly on both sides;
  *   - a query appears in `oracles` only once local parity
  *     (scripts/parity.py) passes.
  */
trait QueryGroup {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Seq[(String, QFn)]
  def oracles: Seq[(String, String)]
}
