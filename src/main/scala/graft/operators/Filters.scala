package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.B — projections, filters, predicates. All shapes are
  * fully pushdown-able; at scale these never shuffle. */
object Filters extends QueryGroup {

  /** Select/alias/arithmetic + explicit casts. Cross-engine cast policy
    * (SURVEY.md §7.4): double→int truncation differs between engines
    * (Spark truncates, DuckDB rounds) so integer-ize via floor() on both
    * sides; int→string is safe. */
  private val projectCast: QFn = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      col("p_size").cast(LongType).as("size_l"),
      col("p_size").cast(StringType).as("size_s"),
      floor(col("p_retailprice")).cast(LongType).as("price_floor"),
      (col("p_retailprice") * lit(2.0)).as("price_x2"),
      (col("p_size").cast(DoubleType) / lit(4.0)).as("size_quarter"),
    ).orderBy(col("p_partkey"))

  /** =, <>, <, BETWEEN, IN, IS NOT NULL. */
  private val filterBasic: QFn = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "P" &&
        col("o_totalprice").between(1000.0, 80000.0) &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_custkey").isNotNull &&
        col("o_orderkey") < 100000000L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** LIKE / RLIKE / case-insensitive match (POSIX-safe regex only —
    * SURVEY.md §7.4). */
  private val filterString: QFn = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%ol%") ||
        col("p_name").rlike("^(red|blue) ") ||
        lower(col("p_type")) === "economy")
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  /** Null-safe equality (`<=>` / IS NOT DISTINCT FROM) on two derived
    * nullable columns: equal when both NULL (≤200k), equal when both set
    * (>300k), distinct in the 200–300k band. */
  private val filterNullsafe: QFn = (s, d) =>
    Tables.orders(s, d)
      .withColumn("a", when(col("o_totalprice") > 200000.0, col("o_orderstatus")))
      .withColumn("b", when(col("o_totalprice") > 300000.0, col("o_orderstatus")))
      .filter(col("a") <=> col("b"))
      .select(col("o_orderkey"), col("a").as("band_status"))
      .orderBy(col("o_orderkey"))

  val queries: Seq[(String, QFn)] = Seq(
    "project_cast" -> projectCast,
    "filter_basic" -> filterBasic,
    "filter_string" -> filterString,
    "filter_nullsafe" -> filterNullsafe,
  )

  val oracles: Seq[(String, String)] = Seq(
    "project_cast" ->
      """SELECT p_partkey,
                CAST(p_size AS BIGINT) AS size_l,
                CAST(p_size AS VARCHAR) AS size_s,
                CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
                p_retailprice * 2.0 AS price_x2,
                CAST(p_size AS DOUBLE) / 4.0 AS size_quarter
         FROM part ORDER BY p_partkey ASC NULLS FIRST""",
    "filter_basic" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus <> 'P'
           AND o_totalprice BETWEEN 1000.0 AND 80000.0
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
           AND o_custkey IS NOT NULL
           AND o_orderkey < 100000000
         ORDER BY o_orderkey ASC NULLS FIRST""",
    "filter_string" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE p_name LIKE '%ol%'
            OR regexp_matches(p_name, '^(red|blue) ')
            OR lower(p_type) = 'economy'
         ORDER BY p_partkey ASC NULLS FIRST""",
    "filter_nullsafe" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 200000.0 THEN o_orderstatus END AS band_status
         FROM orders
         WHERE (CASE WHEN o_totalprice > 200000.0 THEN o_orderstatus END)
               IS NOT DISTINCT FROM
               (CASE WHEN o_totalprice > 300000.0 THEN o_orderstatus END)
         ORDER BY o_orderkey ASC NULLS FIRST""",
  )
}
