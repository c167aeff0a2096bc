package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F (sorts / limits / top-k) + §2.G (set operations).
  * topk_global compiles to TakeOrderedAndProject (per-partition top-k +
  * driver merge of k·partitions rows — no global sort, the right shape at
  * scale); topk_per_group is the windowed row_number pattern that shuffles
  * once on the group key.
  */
object SortsSets extends QueryGroup {

  /** Global sort, mixed direction + explicit null placement on a derived
    * nullable column. */
  private val sortMulti: QFn = (s, d) =>
    Tables.orders(s, d)
      .withColumn("open_status", nullif(col("o_orderstatus"), lit("P")))
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"), col("open_status"), col("o_totalprice"))
      .orderBy(col("open_status").asc_nulls_first,
               col("o_totalprice").desc_nulls_last,
               col("o_orderkey"))

  /** Global top-20 by price (TakeOrderedAndProject), ties broken. */
  private val topkGlobal: QFn = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** Top-3 orders per customer via windowed row_number. */
  private val topkPerGroup: QFn = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private def bigF(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
  private def bigUrgent(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))

  private val setUnionAll: QFn = (s, d) =>
    bigF(s, d).unionByName(bigUrgent(s, d))
      .orderBy(col("o_orderkey"), col("o_orderpriority"))

  private val setUnion: QFn = (s, d) =>
    bigF(s, d).union(bigUrgent(s, d)).distinct()
      .orderBy(col("o_orderkey"), col("o_orderpriority"))

  private val setIntersect: QFn = (s, d) => {
    val a = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))
    a.intersect(b).orderBy(col("c_custkey"))
  }

  /** Bag intersection of the priority multisets of F vs O orders. */
  private val setIntersectAll: QFn = (s, d) => {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority"))
    a.intersectAll(b).orderBy(col("o_orderpriority"))
  }

  private val setExcept: QFn = (s, d) => {
    val a = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))
    a.except(b).orderBy(col("c_custkey"))
  }

  /** Bag difference of the same priority multisets. */
  private val setExceptAll: QFn = (s, d) => {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority"))
    a.exceptAll(b).orderBy(col("o_orderpriority"))
  }

  /** Schema-evolving union: the two inputs project different column
    * sets; unionByName(allowMissingColumns=true) null-fills the gaps —
    * the set-op twin of mergeSchema ingestion. */
  private val setUnionEvolve: QFn = (s, d) => {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("o_orderkey"))
  }

  val queries: Seq[(String, QFn)] = Seq(
    "sort_multi" -> sortMulti,
    "topk_global" -> topkGlobal,
    "topk_per_group" -> topkPerGroup,
    "set_union_all" -> setUnionAll,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_intersect_all" -> setIntersectAll,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_union_evolve" -> setUnionEvolve,
  )

  private val fSlice =
    "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000.0"
  private val uSlice =
    "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000.0"

  val oracles: Seq[(String, String)] = Seq(
    "sort_multi" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS open_status, o_totalprice
         FROM orders WHERE o_totalprice > 450000.0
         ORDER BY open_status ASC NULLS FIRST, o_totalprice DESC NULLS LAST,
                  o_orderkey ASC NULLS FIRST""",
    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC NULLS FIRST,
                  l_linenumber ASC NULLS FIRST
         LIMIT 20""",
    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS rn
           FROM orders) t
         WHERE rn <= 3
         ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""",
    "set_union_all" ->
      s"""SELECT * FROM (($fSlice) UNION ALL ($uSlice)) t
          ORDER BY o_orderkey ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "set_union_evolve" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
         UNION ALL BY NAME
         SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey ASC NULLS FIRST""",
    "set_union" ->
      s"""SELECT * FROM (($fSlice) UNION ($uSlice)) t
          ORDER BY o_orderkey ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "set_intersect" ->
      """SELECT * FROM (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) t
         ORDER BY c_custkey ASC NULLS FIRST""",
    "set_intersect_all" ->
      """SELECT * FROM (
           SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
           INTERSECT ALL
           SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') t
         ORDER BY o_orderpriority ASC NULLS FIRST""",
    "set_except" ->
      """SELECT * FROM (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
           EXCEPT
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) t
         ORDER BY c_custkey ASC NULLS FIRST""",
    "set_except_all" ->
      """SELECT * FROM (
           SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
           EXCEPT ALL
           SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') t
         ORDER BY o_orderpriority ASC NULLS FIRST""",
  )
}
