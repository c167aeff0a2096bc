package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** The pure-SQL entry path: the same engine driven through
  * `spark.sql(...)` over registered views instead of the DataFrame DSL —
  * proof that a SQL-first user of the reference's query surface can run
  * unchanged ANSI SQL here. Catalyst compiles both surfaces to the same
  * plans, so every DataFrame-side scale property (pushdown, broadcast,
  * partial aggregation) carries over for free; PlanSpec asserts the Q3
  * plan keeps the selective-dim broadcast + partial-agg shape.
  */
object SqlSurface extends QueryGroup {

  /** TPC-H Q3 analog (shipping-priority revenue): selective customer
    * segment dim → orders → lineitem, revenue per urgent order, top 10.
    * The date literals split the fixture's 1995-2001 range; revenue goes
    * through the per-element DECIMAL cast (§7.4) and the ORDER BY is
    * fully tie-broken so LIMIT 10 is deterministic. */
  private val sqlQ3: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_v")
    s.sql("""
      SELECT l_orderkey,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                             * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
             CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
      FROM graft_customer_v
      JOIN graft_orders_v ON c_custkey = o_custkey
      JOIN graft_lineitem_v ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < CAST('1997-01-01' AS TIMESTAMP_NTZ)
        AND l_shipdate > CAST('1997-01-01' AS TIMESTAMP_NTZ)
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      ORDER BY revenue DESC, o_date ASC, l_orderkey ASC
      LIMIT 10""")
  }

  /** TPC-H Q5 analog (local-supplier volume) — the join-HEAVY statement
    * shape: a six-table star-plus-snowflake join (facts ⋈ facts on
    * orderkey; customer/supplier/nation/region dims), the LOCAL-supplier
    * correlation c_nationkey = s_nationkey tying the two dim branches,
    * a region filter on the snowflaked dim and one year of orders,
    * revenue per nation. Catalyst broadcasts the dim chain (they are
    * KBs) and shuffles the two fact tables once on orderkey — the only
    * data-sized exchange; revenue is the DECIMAL-pre-cast exact sum.
    * This is the query join-order optimizers are judged on: the
    * declarative statement leaves Catalyst free to push the region
    * filter through nation before any fact touches a dim. */
  private val sqlQ5: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_c5_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o5_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l5_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s5_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n5_v")
    Tables.region(s, d).createOrReplaceTempView("graft_r5_v")
    s.sql("""
      SELECT n_name,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                         * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
      FROM graft_c5_v c
      JOIN graft_o5_v o ON c.c_custkey = o.o_custkey
      JOIN graft_l5_v l ON l.l_orderkey = o.o_orderkey
      JOIN graft_s5_v s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
      JOIN graft_n5_v n ON s.s_nationkey = n.n_nationkey
      JOIN graft_r5_v r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
        AND o.o_orderdate <  CAST('1997-01-01' AS TIMESTAMP_NTZ)
      GROUP BY n_name
      ORDER BY revenue DESC, n_name ASC""")
  }

  /** The subquery surface — scalar subquery + correlated EXISTS / NOT
    * EXISTS, what hand-written analyst SQL leans on: Catalyst rewrites
    * EXISTS into a left-semi join, NOT EXISTS into a left-anti join,
    * and evaluates the uncorrelated scalar subquery once (a broadcast
    * 1-row value) — the declarative spellings cost exactly their join
    * twins. The threshold is the exact-DECIMAL sum divided by the
    * count — one double division on identical operands — so the filter
    * boundary cannot drift between engines. */
  private val sqlSubquery: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_cs_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_os_v")
    s.sql("""
      SELECT c_custkey, c_acctbal
      FROM graft_cs_v c
      WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                                     AS DOUBLE) / count(*)
                         FROM graft_cs_v)
        AND EXISTS (SELECT 1 FROM graft_os_v o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'O')
        AND NOT EXISTS (SELECT 1 FROM graft_os_v o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_totalprice > 450000.0)
      ORDER BY c_custkey ASC""")
  }

  /** The LATERAL join surface — a correlated derived table in FROM
    * (what sql_subquery's scalar form cannot express: ONE correlated
    * subquery returning SEVERAL columns per outer row). Per high-balance
    * customer, the lateral block aggregates that customer's open orders
    * into (n_open, open_total, last_odate) in a single pass. Catalyst
    * decorrelates the lateral aggregate into a groupBy(o_custkey) on the
    * inner side + one equality join — the same plan a hand-rewritten
    * join/groupBy pairing gets, so the declarative spelling costs one
    * key-partitioned aggregate + one join at any scale (no per-row
    * re-execution; that is the POINT of decorrelation). An aggregate
    * with no GROUP BY yields exactly one row even on zero matches
    * (count=0, sum NULL), so the lateral never drops customers —
    * coalesce pins those cells on both engines. */
  private val sqlLateral: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_cl_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_ol_v")
    s.sql("""
      SELECT c_custkey, c_acctbal,
             l.n_open,
             coalesce(round(CAST(l.open_total AS DOUBLE), 4), 0.0) AS open_total,
             CAST(l.last_odate AS DATE) AS last_odate
      FROM graft_cl_v c,
      LATERAL (SELECT count(*) AS n_open,
                      sum(CAST(o_totalprice AS DECIMAL(18,6))) AS open_total,
                      max(o_orderdate) AS last_odate
               FROM graft_ol_v o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'O') l
      WHERE c_acctbal > 9000.0
      ORDER BY c_custkey ASC""")
  }

  /** Parameterized SQL — the named-parameter statement surface
    * (`spark.sql(text, args)`, Spark 3.4+): the injection-safe way a
    * service layer runs user-scoped analytics (the driver binds values,
    * the TEXT never changes, so plan caching keys stay stable and no
    * string concatenation can smuggle SQL). Parameters bind as typed
    * literals BEFORE analysis — the plan is identical to the
    * literal-inlined statement, so the surface costs nothing; the
    * oracle IS that literal-inlined statement. Dates cross the binding
    * as strings and cast inside the text (a bound string comparing
    * against TIMESTAMP_NTZ would otherwise depend on engine coercion
    * rules). */
  private val sqlParams: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_pp_v")
    s.sql(
      """SELECT o_orderpriority,
                count(*) AS n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS total
         FROM graft_pp_v
         WHERE o_orderdate >= CAST(:lo AS TIMESTAMP_NTZ)
           AND o_orderstatus = :st
           AND o_totalprice > :minPrice
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC""",
      Map("lo" -> "1997-01-01", "st" -> "O", "minPrice" -> 1000.0))
  }

  /** The pure-SQL DDL path: CREATE TABLE … USING parquet (CTAS into an
    * external location) registers a CATALOG table, and the analytical
    * query then runs against the catalog entry — the workflow of a SQL
    * pipeline that materializes curated tables once and queries them by
    * name forever after (sink_bucketed does the same through the
    * DataFrame writer; this is the `spark.sql` spelling). The catalog
    * read plans exactly like a path read — FileScan parquet with
    * pushdown/pruning (PlanSpec) — so the DDL surface costs nothing at
    * scale. Deterministic rebuild per evaluation: drop + clear the
    * external location first (CTAS refuses a non-empty dir). */
  private val sqlDdl: QFn = (s, d) => {
    val loc = s"${Tables.scratchDir}/catalog/part_cat"
    s.sql("DROP TABLE IF EXISTS graft_part_cat")
    Tables.deleteRecursively(new java.io.File(loc))
    Tables.part(s, d).createOrReplaceTempView("graft_part_src_v")
    s.sql(s"""CREATE TABLE graft_part_cat
              USING parquet LOCATION '$loc'
              AS SELECT p_partkey, p_brand, p_size, p_retailprice
                 FROM graft_part_src_v""")
    s.sql("""
      SELECT p_brand,
             count(*) AS n_parts,
             round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS total_price
      FROM graft_part_cat
      WHERE p_size >= 25
      GROUP BY p_brand
      ORDER BY p_brand ASC NULLS FIRST""")
  }

  /** SQL WINDOW-clause surface: named windows + an inline running-sum
    * frame in one statement — the third spelling of the SQL entry path
    * (after the join/agg pipeline and the DDL path). The statement is
    * dialect-shared: the SAME text runs on DuckDB as the oracle modulo
    * the view name, which is the portability claim a SQL-first migrator
    * cares about. Frame sums go through the per-element DECIMAL cast
    * (§7.4) like every running sum in the repo. */
  private val sqlWindow: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_v")
    s.sql("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate ASC, o_orderkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE), 4) AS run_total
      FROM graft_orders_v
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""")
  }

  /** The catalog DML rung after CTAS: CREATE TABLE with an explicit
    * schema (no AS SELECT — the empty-table DDL spelling), then two
    * INSERT INTO … SELECT batches (initial load + a second append, the
    * incremental-materialization workflow), then an aggregate read-back
    * by catalog name with a pushable predicate. Each INSERT is a
    * distributed parquet append — rows never visit the driver — and the
    * post-insert read keeps the FileScan pushdown/pruning shape
    * (PlanSpec), so the DML surface also costs nothing at scale.
    * Deterministic rebuild per evaluation, the sqlDdl convention. */
  private val sqlInsert: QFn = (s, d) => {
    val loc = s"${Tables.scratchDir}/catalog/orders_ins"
    s.sql("DROP TABLE IF EXISTS graft_orders_ins")
    Tables.deleteRecursively(new java.io.File(loc))
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_src_v")
    s.sql(s"""CREATE TABLE graft_orders_ins (
                o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
              USING parquet LOCATION '$loc'""")
    s.sql("""INSERT INTO graft_orders_ins
             SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM graft_orders_src_v WHERE o_orderstatus = 'F'""")
    s.sql("""INSERT INTO graft_orders_ins
             SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM graft_orders_src_v WHERE o_orderstatus <> 'F'""")
    s.sql("""
      SELECT o_orderstatus,
             count(*) AS n_orders,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS total_price
      FROM graft_orders_ins
      WHERE o_totalprice >= 1000.0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus ASC NULLS FIRST""")
  }

  /** The logical-view rung of the SQL surface: CREATE OR REPLACE
    * TEMPORARY VIEW twice (a row-level enrichment view, then an
    * aggregate view stacked on it) and a final query against the top
    * view — the semantic-layer workflow where curated views, not
    * tables, are the shared vocabulary. Views are pure catalog
    * metadata: Catalyst inlines the stack at plan time, so the final
    * plan is identical to the hand-fused query (filter still pushed to
    * the scan, one partial agg) and the abstraction costs nothing at
    * scale. Oracle = the equivalent single SELECT. */
  private val sqlView: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_src_v")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_li_net_v AS
             SELECT l_orderkey, l_quantity,
                    l_extendedprice * (1.0 - l_discount) AS net
             FROM graft_li_src_v
             WHERE l_quantity > 10""")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_li_order_v AS
             SELECT l_orderkey, count(*) AS n_items,
                    round(CAST(sum(CAST(floor(net * 1e6 + 0.5) AS BIGINT))
                               AS DOUBLE) / 1e6, 4)
                      AS net_total
             FROM graft_li_net_v
             GROUP BY l_orderkey""")
    s.sql("""SELECT l_orderkey, CAST(n_items AS BIGINT) AS n_items, net_total
             FROM graft_li_order_v
             WHERE n_items >= 5
             ORDER BY net_total DESC, l_orderkey ASC
             LIMIT 20""")
  }

  /** MERGE-INTO emulation for plain parquet — the upsert recipe every
    * non-ACID parquet shop actually runs (no Delta/Iceberg in the
    * sandbox, and none needed for the semantics): target snapshot
    * (CTAS, customers with key%4≠0), an updates batch (even keys, bal
    * +50 — covering matched-update, not-matched-insert, and untouched
    * rows in one shot), staged merge (updates ∪ target ANTI JOIN
    * updates — each side one equality shuffle, no driver rows), then
    * `INSERT OVERWRITE` of the target from the STAGING table. The
    * stage/overwrite split is the point: Spark (correctly) refuses to
    * overwrite a table it is reading in the same statement, so the
    * production shape is stage → atomic swap, and that is what a MERGE
    * compiles to on file tables anyway. Oracle derives the expected
    * post-merge state independently from `customer` (even → updated,
    * odd → base, key%4=0∧odd → absent — vacuous — so all three MERGE
    * branches are pinned). bal stays a raw double: both engines add
    * the same two IEEE doubles, bit-identical without rounding. */
  private val sqlMerge: QFn = (s, d) => {
    val locT = s"${Tables.scratchDir}/catalog/cust_merge_t"
    val locS = s"${Tables.scratchDir}/catalog/cust_merge_s"
    s.sql("DROP TABLE IF EXISTS graft_cust_merge_t")
    s.sql("DROP TABLE IF EXISTS graft_cust_merge_s")
    Tables.deleteRecursively(new java.io.File(locT)); Tables.deleteRecursively(new java.io.File(locS))
    Tables.customer(s, d).createOrReplaceTempView("graft_cust_src_v")
    s.sql(s"""CREATE TABLE graft_cust_merge_t
              USING parquet LOCATION '$locT'
              AS SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal
                 FROM graft_cust_src_v WHERE c_custkey % 4 <> 0""")
    s.sql(s"""CREATE TABLE graft_cust_merge_s
              USING parquet LOCATION '$locS'
              AS WITH upd AS (SELECT c_custkey AS key, c_name AS name,
                                     c_acctbal + 50.0 AS bal
                              FROM graft_cust_src_v WHERE c_custkey % 2 = 0)
                 SELECT key, name, bal FROM upd
                 UNION ALL
                 SELECT t.key, t.name, t.bal
                 FROM graft_cust_merge_t t
                 LEFT ANTI JOIN upd ON t.key = upd.key""")
    s.sql("""INSERT OVERWRITE TABLE graft_cust_merge_t
             SELECT key, name, bal FROM graft_cust_merge_s""")
    s.sql("""SELECT key, name, bal
             FROM graft_cust_merge_t
             WHERE key <= 300
             ORDER BY key ASC NULLS FIRST""")
  }

  /** Recursive-CTE surface (Spark 4's WITH RECURSIVE → UnionLoopExec;
    * the same statement text runs on DuckDB modulo view names): BFS
    * hop distance from nation 0 over a SPARSE trade graph — each
    * nation keeps its top-2 trade partners by weight (row_number
    * window, ties broken by dst), then the recursive member walks
    * edges breadth-first to depth 6 and min(hop) collapses path
    * multiplicity. Scale shape: the heavy work is the fact-fact edge
    * AGGREGATION (shuffle on nation pairs, ≤|V|² rows out); it runs
    * ONCE and is localCheckpointed (the graph-family idiom) BEFORE the
    * recursive statement — Catalyst inlines non-recursive CTEs into the
    * loop body, so leaving `agg`/`edges` as CTEs re-ran the 4-way fact
    * join on every UnionLoopExec iteration (benched 5.6 s vs 0.9 s
    * here). The recursion itself iterates over the ≤2|V|-row
    * checkpointed edge list — per-hop cost is one tiny hash join, and
    * the engine (not the user) owns the loop, exactly like the
    * hand-rolled label-prop operators. The oracle keeps the edge build
    * as CTEs (DuckDB materializes multiply-referenced CTEs). */
  private val sqlRecursive: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_rec_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_ord_rec_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_sup_rec_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_cus_rec_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_nat_rec_v")
    s.sql("""
      WITH agg AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
        FROM graft_li_rec_v l JOIN graft_ord_rec_v o ON l.l_orderkey = o.o_orderkey
             JOIN graft_sup_rec_v s ON l.l_suppkey = s.s_suppkey
             JOIN graft_cus_rec_v c ON o.o_custkey = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY s.s_nationkey, c.c_nationkey)
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst ASC) AS rn
        FROM agg) t WHERE rn <= 2""")
      .localCheckpoint()
      .createOrReplaceTempView("graft_edges_rec_v")
    s.sql("""
      WITH RECURSIVE reach(nationkey, hop) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        -- round-19 opt (§3.1): the checkpointed edge view is a LogicalRDD
        -- with no stats, so every UnionLoopExec iteration planned a
        -- 32-partition sort-merge join for a ≤2|V|-row edge list × a
        -- ≤|V|-row frontier; the explicit broadcast makes each hop one
        -- shuffle-free hash probe (same rows — hints never change
        -- semantics, and the DuckDB oracle text is unchanged)
        SELECT /*+ BROADCAST(e) */ e.dst, r.hop + 1
        FROM reach r JOIN graft_edges_rec_v e ON e.src = r.nationkey
        WHERE r.hop < 6)
      SELECT /*+ BROADCAST(r) */
             n.n_nationkey AS nationkey, n.n_name, min(r.hop) AS dist
      FROM graft_nat_rec_v n LEFT JOIN reach r ON r.nationkey = n.n_nationkey
      GROUP BY n.n_nationkey, n.n_name
      ORDER BY nationkey ASC NULLS FIRST""")
  }

  /** The SQL PIVOT surface — agg_pivot's statement spelling (that rung
    * drives the DataFrame `.pivot()`; BI tools emit the PIVOT clause):
    * order counts and exact-DECIMAL revenue per priority, pivoted on
    * the three order statuses. Catalyst compiles PIVOT to the same
    * single Expand + two-phase aggregate as the DataFrame form — one
    * corpus pass, map-side combining, |priorities| × 3 cells out. The
    * oracle is the portable FILTER spelling (DuckDB's PIVOT syntax
    * differs; the semantics equality is the point). Spark leaves an
    * unmatched pivot COUNT cell NULL where the FILTER form gives 0 —
    * coalesced in the outer select so the contract is engine-neutral
    * (every status occurs at every fixture SF, but the guard makes the
    * shape safe on any slice). */
  private val sqlPivot: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_ord_piv_v")
    s.sql("""
      SELECT o_orderpriority,
             CAST(coalesce(f_n, 0) AS BIGINT) AS f_n,
             round(CAST(f_total AS DOUBLE), 4) AS f_total,
             CAST(coalesce(o_n, 0) AS BIGINT) AS o_n,
             round(CAST(o_total AS DOUBLE), 4) AS o_total,
             CAST(coalesce(p_n, 0) AS BIGINT) AS p_n,
             round(CAST(p_total AS DOUBLE), 4) AS p_total
      FROM (SELECT o_orderpriority, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,6)) AS tp
            FROM graft_ord_piv_v)
      PIVOT (count(tp) AS n, sum(tp) AS total
             FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
      ORDER BY o_orderpriority ASC NULLS FIRST""")
  }

  /** The SQL UNPIVOT surface — sql_pivot's dual and profile_numeric's
    * statement spelling (wide measure columns → long (metric, value)
    * rows, the shape metric stores and melt/longify steps consume).
    * UNPIVOT is a row-local Expand — a 4× generator on each row inside
    * the scan stage, no shuffle until the final ORDER BY; the capped
    * key range bounds the declared output. Oracle = the portable
    * UNION ALL spelling (DuckDB's UNPIVOT exists but the per-dialect
    * syntax differs; semantics equality is the point). INCLUDE NULLS
    * because Spark's UNPIVOT drops NULL measure values by default
    * while the UNION ALL form keeps them — TPC-H lineitem measures are
    * NOT NULL so the fixtures never see the difference, but the
    * declared query and its oracle must agree on any nullable slice. */
  private val sqlUnpivot: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_unpiv_v")
    s.sql("""
      SELECT l_orderkey, l_linenumber, metric, val
      FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax
            FROM graft_li_unpiv_v WHERE l_orderkey < 200)
      UNPIVOT INCLUDE NULLS
              (val FOR metric IN (l_quantity, l_extendedprice,
                                  l_discount, l_tax))
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
               metric ASC NULLS FIRST""")
  }

  /** TPC-H Q18 analog (large-volume customers) — the HAVING-heavy
    * statement shape sql_subquery/sql_q5 leave uncovered: a fact-fact
    * join FILTERED by a grouped-aggregate subquery (`o_orderkey IN
    * (SELECT l_orderkey ... GROUP BY ... HAVING sum(l_quantity) > k)`).
    * Catalyst plans the HAVING subquery as a keyed two-phase aggregate
    * over lineitem feeding a left-semi join on orderkey — never a
    * per-row re-execution (PlanSpec pins LeftSemi + no nested-loop) —
    * and (PLANS.md) REPLICATES that semi filter onto BOTH fact inputs,
    * pruning orders and lineitem each before the fact-fact join: the
    * aggregate runs twice, but both joins' inputs shrink to the
    * qualifying orders first, the right trade at 100 TB where the
    * subquery aggregate is map-side-combined on the same orderkey the
    * outer join shuffles on. Both the HAVING threshold and the output
    * quantity go through the exact-DECIMAL pre-cast (§7.4) so the
    * filter boundary cannot drift between engines; the ORDER BY is
    * fully tie-broken (o_orderkey is unique per group) so LIMIT 100 is
    * deterministic. */
  private val sqlQ18: QFn = (s, d) => {
    // Quantity sums are PLAIN double sums (round 17; was DECIMAL(18,6)
    // casts): quantities are integral 1..50, so every partial and final
    // sum is an exact integer far below 2^53 — order-free and
    // engine-identical with zero per-row Decimal work. The same
    // reasoning the flagship's sum_qty always used; money columns (none
    // summed here) keep the integer-micros recipe.
    Tables.customer(s, d).createOrReplaceTempView("graft_c18_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o18_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l18_v")
    s.sql("""
      SELECT c_name, c_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
             round(sum(l_quantity), 4) AS total_qty
      FROM graft_c18_v c
      JOIN graft_o18_v o ON c_custkey = o_custkey
      JOIN graft_l18_v l ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM graft_l18_v
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity) > 200)
      GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
               o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100""")
  }

  /** TPC-H Q21 analog (suppliers who kept orders waiting) — the
    * EXISTS + NOT EXISTS statement shape where BOTH correlated
    * subqueries target the SAME fact table the outer query scans: find
    * suppliers who were the SOLE late shipper on a multi-supplier
    * finished order. The synthetic lineitem has no receipt/commit
    * dates, so "late" is spelled against the order header —
    * l_shipdate > o_orderdate + INTERVAL 60 DAY — which also makes the
    * NOT EXISTS correlate on TWO outer tables at once (l1.l_orderkey
    * AND o.o_orderdate), the hardest decorrelation case analysts
    * actually write. Catalyst rewrites EXISTS → LeftSemi and
    * NOT EXISTS → LeftAnti, each a hash/sort join on the l_orderkey
    * equi-key with the `<>` and date conjuncts as join-residual
    * conditions — never a per-row re-execution, never a nested loop
    * (PlanSpec pins LeftSemi + LeftAnti + no BroadcastNestedLoop). At
    * 100 TB all three lineitem legs shuffle on the same l_orderkey key,
    * so AQE can reuse the exchange; the date arithmetic is exact
    * timestamp+interval in both engines and the ORDER BY is fully
    * tie-broken by the group key. */
  /** TPC-H Q10 analog (returned-item revenue): the "who sent things
    * back last quarter" report — customer ⋈ orders (one quarter) ⋈
    * lineitem (returnflag = 'R') ⋈ nation, revenue lost per customer,
    * top 20. The statement shape the CRM-style ranked-join report
    * always takes: two broadcast dims (customer is fixture-small but
    * the JOIN ORDER leaves Catalyst free to shuffle it at 100 TB;
    * nation broadcasts at any scale), one data-sized orderkey shuffle,
    * DECIMAL-pre-cast revenue, fully tie-broken LIMIT. */
  private val sqlQ10: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_c10_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o10_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l10_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n10_v")
    s.sql("""
      SELECT c_custkey, c_name,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                             * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
             n_name
      FROM graft_c10_v
      JOIN graft_o10_v ON c_custkey = o_custkey
      JOIN graft_l10_v ON l_orderkey = o_orderkey
      JOIN graft_n10_v ON c_nationkey = n_nationkey
      WHERE o_orderdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
        AND o_orderdate < CAST('1997-04-01' AS TIMESTAMP_NTZ)
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 20""")
  }

  /** TPC-H Q7 analog (volume shipping): bilateral trade between two
    * nations — the SELF-JOINED-dim statement shape: nation joins the
    * query TWICE under different roles (supplier's nation, customer's
    * nation) with a symmetric pair predicate, two years of shipments
    * bucketed by year. Q7's literal two-nation pair is empty at the
    * smallest fixture (10 suppliers cover 10 of 25 nations), so the
    * pair predicate is the STRUCTURAL spelling of the same shape:
    * cross-border trade within one region (different nations, same
    * regionkey) — populated at every SF, same dual-role join and
    * symmetric filter. Both nation roles broadcast; the lineitem ⋈
    * orders backbone is the one data-sized shuffle. */
  private val sqlQ7: QFn = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("graft_s7_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_c7_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o7_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l7_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n7_v")
    s.sql("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                             * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
             count(*) AS n_lines
      FROM graft_s7_v
      JOIN graft_l7_v ON s_suppkey = l_suppkey
      JOIN graft_o7_v ON o_orderkey = l_orderkey
      JOIN graft_c7_v ON c_custkey = o_custkey
      JOIN graft_n7_v n1 ON s_nationkey = n1.n_nationkey
      JOIN graft_n7_v n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
        AND n1.n_regionkey = n2.n_regionkey
        AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
        AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)
      GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
      ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""")
  }

  /** ANALYZE TABLE + cost-based optimization — the catalog STATISTICS
    * plane no other rung exercises: real deployments run `ANALYZE
    * TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]` after every
    * ingest so the optimizer can estimate filter selectivity and join
    * sizes from ndv/min/max instead of raw file sizes (at 100 TB the
    * difference is broadcasting a filtered dim the rule-based
    * estimator thinks is table-sized). The rung lands the orders
    * fixture as a catalog table, collects table + column statistics,
    * and runs the selective-dim join through a CBO-enabled forked
    * session (conf is analysis-time, the join_bloom isolation
    * posture). Stats change PLANS, never RESULTS — the oracle checks
    * exactly that; PlanSpec asserts the catalog holds the stats and
    * that CBO's estimated row counts actually shrink through the
    * selective filter (selectivity from column ndv, the thing ANALYZE
    * bought). The CTAS + ANALYZE re-run per call is fixture-sized,
    * the scratch-layout posture. */
  private val sqlAnalyze: QFn = (s, d) => {
    val loc = s"${Tables.scratchDir}/catalog/cbo_orders"
    // deterministic rebuild per evaluation, the sqlDdl convention (a
    // stale external location from another JVM would otherwise refuse
    // the CTAS)
    s.sql("DROP TABLE IF EXISTS graft_cbo_orders")
    Tables.deleteRecursively(new java.io.File(loc))
    Tables.orders(s, d).createOrReplaceTempView("graft_cbo_src_v")
    s.sql(s"""CREATE TABLE graft_cbo_orders
              USING parquet LOCATION '$loc'
              AS SELECT * FROM graft_cbo_src_v""")
    s.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS")
    s.sql("""ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS
             FOR COLUMNS o_orderkey, o_orderpriority""")
    val s2 = s.newSession()
    s2.conf.set("spark.sql.cbo.enabled", "true")
    s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    Tables.lineitem(s2, d).createOrReplaceTempView("graft_cbo_lineitem_v")
    s2.sql("""
      SELECT o_orderpriority, count(*) AS n_lines,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                             * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
      FROM graft_cbo_lineitem_v
      JOIN graft_cbo_orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  private val sqlQ21: QFn = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("graft_s21_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o21_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l21_v")
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM graft_s21_v s
      JOIN graft_l21_v l1 ON s_suppkey = l1.l_suppkey
      JOIN graft_o21_v o ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM graft_l21_v l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM graft_l21_v l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC
      LIMIT 100""")
  }

  /** Inline VALUES reference table — the "five rows of config in the
    * statement" pattern analysts use instead of a lookup file: a
    * literal (segment, boost, tier) table joined onto the fact.
    * Catalyst reads the inline table as a LocalTableScan (a
    * LocalRelation — no I/O, no distribution) and broadcasts it into
    * the join, exactly what a literal dim should do at any scale
    * (PlanSpec pins LocalTableScan + BroadcastHashJoin). The boost
    * literals are DECIMALs in both engines' parsers, so the
    * double×decimal product is one IEEE multiply on identical values
    * before the exact-DECIMAL aggregation pre-cast. */
  private val sqlValues: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_cvals_v")
    s.sql("""
      SELECT m.tier, count(*) AS n_cust,
             round(CAST(sum(CAST(c_acctbal * m.boost AS DECIMAL(18,6)))
                        AS DOUBLE), 4) AS boosted_bal
      FROM graft_cvals_v c
      JOIN (SELECT * FROM VALUES
              ('BUILDING', 1.10, 'core'), ('AUTOMOBILE', 1.05, 'core'),
              ('MACHINERY', 1.00, 'standard'), ('HOUSEHOLD', 0.95, 'standard'),
              ('FURNITURE', 0.90, 'long_tail')
            AS v(seg, boost, tier)) m
        ON c.c_mktsegment = m.seg
      GROUP BY m.tier
      ORDER BY m.tier ASC NULLS FIRST""")
  }

  /** TPC-H Q2 analog (minimum-cost supplier) — the correlated SCALAR
    * AGGREGATE subquery statement shape, the one decorrelation path
    * the sql_* surface did not yet cover (sql_subquery = uncorrelated
    * scalar; sql_q21 = correlated EXISTS; sql_lateral = LATERAL): the
    * outer row qualifies only when its price EQUALS
    * `(SELECT min(...) WHERE inner.partkey = outer.partkey)`, and the
    * subquery is itself a 4-table join (offers restricted to one
    * region — the correlated aggregate must respect the same
    * snowflake filter as the outer block, exactly Q2's trap). The
    * fixture has no partsupp, so lineitem plays the offer table:
    * cheapest EUROPE offer per qualifying part. Catalyst's
    * RewriteCorrelatedScalarSubquery turns the subquery into ONE
    * keyed min-aggregate over the filtered offers joined back on
    * partkey — never a per-outer-row re-execution (PlanSpec pins
    * partial_min + no nested-loop join). Predicates are the
    * structural spelling populated at every SF (the sql_q7 policy).
    * best_price is a SELECTED value, not an arithmetic result —
    * min() picks an existing double, so equality and output are
    * engine-exact with no rounding; ORDER BY is fully tie-broken
    * down to the unique (l_orderkey, l_linenumber) so ties at the
    * same min price survive LIMIT deterministically. */
  private val sqlQ2: QFn = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("graft_p2_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l2q_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s2q_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n2q_v")
    Tables.region(s, d).createOrReplaceTempView("graft_r2q_v")
    s.sql("""
      SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
             l_extendedprice AS best_price, l_orderkey, l_linenumber
      FROM graft_p2_v, graft_l2q_v, graft_s2q_v, graft_n2q_v, graft_r2q_v
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND p_type = 'STANDARD' AND p_size <= 25
        AND l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM graft_l2q_v l2, graft_s2q_v s2, graft_n2q_v n2, graft_r2q_v r2
          WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC,
               l_orderkey ASC, l_linenumber ASC
      LIMIT 100""")
  }

  /** TPC-H Q19 analog (discounted revenue from promotional parts) — the
    * DISJUNCTIVE-predicate statement shape: the WHERE is an OR of three
    * conjunctive arms, each arm touching BOTH join sides (part brand/size
    * AND lineitem quantity), so no single disjunct can move below the
    * join as-is. This is the query predicate-pushdown engines are judged
    * on: Catalyst's PushExtraPredicateThroughJoin extracts each side's
    * CNF-convertible slice — the brand/size OR-tree to the part scan, the
    * quantity OR-tree to the lineitem scan — as DERIVED (non-complete)
    * filters under the original condition, so both parquet scans carry an
    * Or(...) in PushedFilters and row-group stats skip non-matching data
    * BEFORE the join at any scale (PlanSpec pins both pushed Or trees).
    * Revenue per brand through the per-element DECIMAL cast (§7.4);
    * 3-row output, fully ordered. */
  private val sqlQ19: QFn = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("graft_p19_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l19_v")
    s.sql("""
      SELECT p_brand,
             count(*) AS n_lines,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                             * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
      FROM graft_l19_v JOIN graft_p19_v ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#24' AND p_size BETWEEN 10 AND 35
             AND l_quantity BETWEEN 20 AND 40)
      GROUP BY p_brand
      ORDER BY p_brand ASC""")
  }

  /** TPC-H Q16 analog (supplier-part relationships minus a blocklist) —
    * the NOT IN statement shape: a column-level NOT IN (SELECT ...) is
    * NOT an anti join until null semantics are resolved (one NULL in the
    * subquery empties the whole result), so Catalyst plans it as a
    * NULL-AWARE anti join — the remaining subquery rewrite after
    * sql_subquery/sql_q21 (EXISTS→semi/anti) and sql_q2/sql_lateral
    * (scalar/lateral decorrelation). Spark's single-column NAAJ REQUIRES
    * the exclusion side broadcast (a shuffled NAAJ does not exist; a
    * non-broadcastable set degrades to BroadcastNestedLoopJoin) — fine
    * here and in production, where exclusion lists (complaint suppliers,
    * blocklists) are metadata-sized; spell NOT EXISTS instead when the
    * excluded set is data-sized, which shuffles as a plain LeftAnti
    * (sql_q21's path). PlanSpec pins the NAAJ. count(DISTINCT) rides the
    * standard two-phase Expand plan; all-integer output, fully ordered. */
  private val sqlQ16: QFn = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("graft_p16_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l16_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s16_v")
    s.sql("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM graft_l16_v JOIN graft_p16_v ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_type NOT LIKE 'STANDARD%'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_s16_v
                              WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""")
  }

  /** TPC-H Q13 analog (customer order-count distribution) — the DOUBLE
    * aggregation over an OUTER join, the one relational shape the suite
    * didn't yet pin: per-customer order counts must keep zero-order
    * customers (LEFT OUTER with the exclusion predicate INSIDE the join
    * condition — moving it to WHERE would silently turn the join inner
    * and drop the c_count=0 bucket), then a second aggregation
    * histograms the counts. Q13 excludes 'special requests' orders; the
    * fixture carries no comment column, so the urgent-priority class
    * stands in. Catalyst plans customer⋈orders as one equality
    * shuffle (both sides fact-scale at 100 TB — no broadcast), and both
    * aggregates are two-phase with map-side combine; the second one
    * reduces customer-count-sized data, negligible. count(o_orderkey)
    * counts non-NULL fact keys only — the LEFT-OUTER-safe spelling. */
  private val sqlQ13: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_c13_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o13_v")
    s.sql("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM graft_c13_v c LEFT OUTER JOIN graft_o13_v o
              ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  }

  /** TPC-H Q22 analog (well-funded inactive customers) — the remaining
    * subquery pairing: an UNCORRELATED scalar aggregate threshold (the
    * global positive-balance average) gating the outer scan, plus a
    * correlated NOT EXISTS planned as a LEFT ANTI join. Q22's country
    * code is substring(c_phone); the fixture has no phone, so
    * c_nationkey is the code and 'no urgent order' stands in for 'no
    * order' (every fixture customer has orders). Exactness: balances
    * are quantized to integer MICROS (floor(x·1e6 + 0.5), the portable
    * recipe — a DECIMAL cast of a DOUBLE rounds differently per
    * engine), and the threshold compare is CROSS-MULTIPLIED
    * (bal_u · n > sum_u) so no division ever happens — the boundary
    * customer cannot flip engines. int64 bound: bal_u ≤ 1e10 µ and the
    * product must stay < 2^63, so this spelling holds to ~1e8 positive
    * customers; past that, pre-divide the threshold once (sum_u DIV n,
    * with the ±1 µ boundary documented) or lift the sum to
    * DECIMAL(38,0). Catalyst broadcasts the 1-row aggregate and plans
    * the NOT EXISTS as a broadcast/shuffle anti join on o_custkey. */
  private val sqlQ22: QFn = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_c22_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o22_v")
    s.sql("""
      WITH pos AS (SELECT CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) AS bal_u
                   FROM graft_c22_v WHERE c_acctbal > 0.0),
           thr AS (SELECT CAST(sum(bal_u) AS BIGINT) AS su,
                          CAST(count(*) AS BIGINT) AS n FROM pos)
      SELECT c_nationkey AS cntrycode,
             count(*) AS numcust,
             sum(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS totbal_micro
      FROM graft_c22_v CROSS JOIN thr
      WHERE CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) * thr.n > thr.su
        AND NOT EXISTS (SELECT 1 FROM graft_o22_v o
                        WHERE o.o_custkey = c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey
      ORDER BY cntrycode ASC""")
  }

  /** TPC-H Q11 analog (important stock) — the remaining HAVING shape:
    * a grouped aggregate filtered against UNCORRELATED scalar
    * subqueries over the SAME grouped table (keep parts whose value
    * exceeds 1.5× the mean part value — Q11's fixed 0.0001 fraction is
    * deliberately replaced by a mean-relative gate because the spec's
    * own `0.0001 / SF` scaling admits it isn't scale-invariant; this
    * spelling selects ~1.2% of parts at every fixture SF where the
    * fixed fraction selects 0 at sf0.1). The threshold compare is
    * CROSS-MULTIPLIED with integer factors only (s · n · 2 > total ·
    * 3 — decimal × integer stays exact) so no fraction literal ever
    * mixes double into the gate; the display value rounds AFTER the
    * gate. Plan shape (round-15 fix): Catalyst INLINES a
    * multiply-referenced CTE, so spelling `p` as a CTE evaluated the
    * grouped aggregate three times — three full lineitem scans for one
    * statement, the single worst plan-level scale cost the round-13/14
    * audits found. The aggregate now runs ONCE and is localCheckpointed
    * BEFORE the statement (the sql_recursive idiom; on a cluster:
    * checkpoint(reliable) or a stats table), and both global stats
    * collapse into ONE 1-row cross-joined subquery over the
    * parts-sized checkpoint — one fact scan, one tiny stats pass,
    * however many references the statement spells. */
  private val sqlQ11: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l11_v")
    s.sql("""
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(18,6))) AS s
      FROM graft_l11_v GROUP BY l_partkey""")
      .localCheckpoint()
      .createOrReplaceTempView("graft_p11_v")
    s.sql("""
      SELECT l_partkey,
             round(CAST(s AS DOUBLE), 4) AS value
      FROM graft_p11_v
           CROSS JOIN (SELECT count(*) AS n, sum(s) AS t
                       FROM graft_p11_v) g
      WHERE s * g.n * 2 > g.t * 3
      ORDER BY value DESC, l_partkey ASC""")
  }

  /** TPC-H Q15 analog (top supplier) — the max-over-aggregate shape:
    * a revenue view referenced TWICE (once joined to the dim, once
    * under max()) with equality on the exact INT64-micros revenue
    * picking the winner — ties would return multiple rows, exactly
    * like the spec's Q15, and exact-integer equality is what makes
    * that deterministic cross-engine (a double revenue could disagree
    * in the last bit and drop the winner on one engine; round 17 moved
    * the accumulator from DECIMAL(18,6) to floor-micros int64 — same
    * guarantee, cheaper per row, sql_q1's bound note applies). Catalyst inlines
    * the CTE into both references; the quarter filter pushes into both
    * fact scans, and the supplier join broadcasts. */
  private val sqlQ15: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l15_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s15_v")
    s.sql("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                * 1e6 + 0.5) AS BIGINT)) AS total_rev
        FROM graft_l15_v
        WHERE l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
          AND l_shipdate < CAST('1997-04-01' AS TIMESTAMP_NTZ)
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
             round(CAST(total_rev AS DOUBLE) / 1e6, 4) AS total_rev
      FROM graft_s15_v JOIN revenue ON s_suppkey = supplier_no
      WHERE total_rev = (SELECT max(total_rev) FROM revenue)
      ORDER BY s_suppkey ASC""")
  }

  /** TPC-H Q17 analog (small-quantity-order revenue) — the correlated
    * SCALAR-AGGREGATE shape: each fact row gated against an aggregate
    * of ITS OWN group (quantity below 20% of the part's average).
    * Catalyst must decorrelate the subquery into ONE per-part
    * aggregate joined back on l_partkey — the naive interpretation
    * re-runs the aggregate per outer row, a full fact scan per row at
    * 100 TB (PlanSpec pins the decorrelated two-phase avg + equality
    * join, no nested loop). Exactness: l_quantity is integral-valued,
    * so Σ quantity is exact in doubles on any partitioning and
    * avg = exact-sum / count is the SAME IEEE double on both engines;
    * `0.2 * avg` spells the same literal both sides and the < gate
    * compares identical bits — no quantization needed (the fn_trig
    * identical-inputs precedent, unlike sums of non-integral doubles
    * which always quantize). Revenue output goes through the exact
    * DECIMAL cast; /7.0 mirrors Q17's spec constant. */
  private val sqlQ17: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l17_v")
    Tables.part(s, d).createOrReplaceTempView("graft_p17_v")
    s.sql("""
      SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                     AS DOUBLE) / 7.0, 4) AS avg_yearly,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM graft_l17_v l JOIN graft_p17_v p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#2' AND p.p_type = 'ECONOMY'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM graft_l17_v l2
                            WHERE l2.l_partkey = l.l_partkey)""")
  }

  /** TPC-H Q8 analog (national market share) — the WIDEST join tree in
    * the suite: the fact joined to part + supplier + orders + customer
    * with nation rendered TWICE (customer side filtered through the
    * region snowflake, supplier side labeling the volume) — 8 relation
    * references, 7 joins. Every dimension is broadcast; the one
    * data-sized exchange is the lineitem ⋈ orders fact-fact join on
    * orderkey (PlanSpec pins ≥5 broadcast joins and no nested loop).
    * Share = ΣCASE(volume)/Σvolume per order year: both sums are
    * exact DECIMAL (the CASE's else arm is a DECIMAL zero so the
    * branch types unify without a double detour), the ratio divides
    * two identical exact values — engine-identical, rounded
    * output-only. */
  private val sqlQ8: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l8_v")
    Tables.part(s, d).createOrReplaceTempView("graft_p8_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s8_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o8_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_c8_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n8_v")
    Tables.region(s, d).createOrReplaceTempView("graft_r8_v")
    s.sql("""
      WITH an AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1.0 - l.l_discount)
                    AS DECIMAL(18,6)) AS volume,
               s_n.n_name AS supp_nation
        FROM graft_p8_v p
             JOIN graft_l8_v l ON p.p_partkey = l.l_partkey
             JOIN graft_s8_v s ON s.s_suppkey = l.l_suppkey
             JOIN graft_o8_v o ON o.o_orderkey = l.l_orderkey
             JOIN graft_c8_v c ON c.c_custkey = o.o_custkey
             JOIN graft_n8_v c_n ON c_n.n_nationkey = c.c_nationkey
             JOIN graft_r8_v r ON r.r_regionkey = c_n.n_regionkey
             JOIN graft_n8_v s_n ON s_n.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP_NTZ)
          AND o.o_orderdate < CAST('1998-01-01' AS TIMESTAMP_NTZ))
      SELECT CAST(o_year AS BIGINT) AS o_year,
             CAST(count(*) AS BIGINT) AS n_rows,
             round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   / CAST(sum(volume) AS DOUBLE), 6) + 0.0 AS mkt_share
      FROM an GROUP BY o_year
      ORDER BY o_year ASC""")
  }

  /** TPC-H Q9 analog (product-line revenue by nation and year) — the
    * substring-predicate shape: parts selected by `p_name LIKE
    * '%bolt%'`, which Catalyst must push into the part scan as a
    * StringContains parquet filter (PlanSpec asserts it — an unpushed
    * contains() re-reads the whole dim at every scale), feeding a
    * 5-table join grouped by (supplier nation, order year). The spec's
    * profit term needs partsupp.ps_supplycost, which the fixture
    * doesn't carry; revenue keeps the plan shape identical. Exact
    * int64-micros volume sums (the sql_q1 recipe); year from the
    * timestamp on both engines. */
  private val sqlQ9: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l9_v")
    Tables.part(s, d).createOrReplaceTempView("graft_p9_v")
    Tables.supplier(s, d).createOrReplaceTempView("graft_s9_v")
    Tables.orders(s, d).createOrReplaceTempView("graft_o9_v")
    Tables.nation(s, d).createOrReplaceTempView("graft_n9_v")
    s.sql("""
      SELECT n_name AS nation, CAST(o_year AS BIGINT) AS o_year,
             CAST(count(*) AS BIGINT) AS n_rows,
             round(CAST(sum(volume) AS DOUBLE) / 1e6, 4) AS sum_profit
      FROM (SELECT s_n.n_name, year(o.o_orderdate) AS o_year,
                   CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                * 1e6 + 0.5) AS BIGINT) AS volume
            FROM graft_p9_v p
                 JOIN graft_l9_v l ON p.p_partkey = l.l_partkey
                 JOIN graft_s9_v s ON s.s_suppkey = l.l_suppkey
                 JOIN graft_o9_v o ON o.o_orderkey = l.l_orderkey
                 JOIN graft_n9_v s_n ON s_n.n_nationkey = s.s_nationkey
            WHERE p.p_name LIKE '%bolt%') profit
      GROUP BY n_name, o_year
      ORDER BY nation ASC, o_year DESC""")
  }

  /** TPC-H Q1, the full spec statement (pricing summary with the
    * shipdate cutoff) — distinct from the DSL flagship
    * `agg_pricing_summary`, which omits the WHERE gate and the
    * tax-bearing charge term: this one carries the spec's
    * `l_shipdate <= date - 90 days` predicate SHAPE (pushed to the
    * scan) — the literal cutoff 2001-09-02 is shifted to the fixture's
    * date range, not the spec's 1998-09-02, the same analog treatment
    * sql_q4/q6/q12/q14/q20 get — and
    * sum_charge = Σ price·(1−disc)·(1+tax). With it the SQL surface
    * spells ALL 22 TPC-H statements as sql_q* keys. Exactness: each
    * charge element is two IEEE products of read bits cast to DECIMAL
    * BEFORE summation, so every aggregate is partitioning-proof; the
    * averages divide exact sums by exact counts, rounded output-only.
    * Scale: one filtered fact pass, 6-row result, two-phase agg. */
  private val sqlQ1: QFn = (s, d) => {
    // Round 17 (verdict item 2): the four money sums accumulate integer
    // MICROS (floor(x·1e6 + 0.5), the Q22/ingest_fixed_width portable
    // recipe) instead of per-row DECIMAL(18,6) casts — the per-row work
    // drops from a Decimal allocation + BigDecimal-path sum to one IEEE
    // multiply-floor and an int64 add, and both engines compute the
    // SAME integers (identical double ops → identical floor), so parity
    // is exact by construction rather than by matching two engines'
    // double→DECIMAL rounding. The suite's slowest key benched 2.4 s
    // local on the DECIMAL spelling. Bound: int64 micros hold to ~9.2e18
    // µ ≈ $9.2e12 per group; a 100 TB-scale group (≈1.5e11 rows ×
    // ~1e11 µ) would overflow, so at that scale lift the accumulator to
    // sum(CAST(u AS DECIMAL(38,0))) — one widening on the partial
    // aggregate, the per-row floor stays integer. NOTE the '2001-09-02'
    // cutoff is fixture-shifted (the classic statement subtracts 90
    // days from 1998-12-01; this fixture's dates run later).
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l1_v")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             round(CAST(sum(CAST(floor(l_extendedprice * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4)
               AS sum_base_price,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                         * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4)
               AS sum_disc_price,
             round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                         * (1.0 + l_tax) * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6, 4)
               AS sum_charge,
             round(avg(l_quantity), 6) AS avg_qty,
             round(CAST(sum(CAST(floor(l_extendedprice * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6 / count(*), 6)
               AS avg_price,
             round(CAST(sum(CAST(floor(l_discount * 1e6 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e6 / count(*), 6)
               AS avg_disc,
             CAST(count(*) AS BIGINT) AS count_order
      FROM graft_l1_v
      WHERE l_shipdate <= CAST('2001-09-02' AS TIMESTAMP_NTZ)
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag ASC, l_linestatus ASC""")
  }

  /** TPC-H Q6 analog (forecast-revenue change) — the pure
    * SCAN-FILTER-AGGREGATE statement, deliberately join-free: one fact
    * pass, three conjunctive range predicates, one ungrouped sum. This
    * is the pushdown showcase: all three predicates are
    * parquet-pushable comparisons, so the scan itself discards
    * everything but the ~2% qualifying slice (PlanSpec asserts
    * PushedFilters carries the shipdate range) and the aggregate sees
    * only survivors — at 100 TB the statement costs one filtered
    * columnar scan of three columns plus a 32-partial-row final fold,
    * no shuffle of data rows at all. The revenue term is the
    * per-element exact DECIMAL cast of `l_extendedprice * l_discount`
    * (both operands read bits, the product one IEEE op — identical on
    * both engines), so the sum is partitioning-proof. */
  private val sqlQ6: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l6_v")
    s.sql("""
      SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM graft_l6_v
      WHERE l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
        AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24.0""")
  }

  /** TPC-H Q4 analog (order-priority checking) — the correlated-EXISTS
    * count: orders from one half-year counted per priority when at
    * least one of their lines shipped late. The spec's lateness test
    * (l_commitdate < l_receiptdate) uses columns the fixture doesn't
    * carry, so lateness here is "shipped more than 60 days after the
    * order date" — which keeps the structurally interesting part: the
    * EXISTS correlates on BOTH the join key and an outer-column
    * comparison (l_shipdate > o_orderdate + 60 days). Catalyst
    * decorrelates that into ONE left-semi join with the non-equi term
    * as a join residual (PlanSpec pins LeftSemi and no nested loop) —
    * the naive reading re-scans lineitem per order, which at 100 TB is
    * a full fact scan per fact row. Semi-join semantics also
    * deduplicate for free: an order with five late lines counts once,
    * with no DISTINCT pass. Output is pure integer counts. */
  private val sqlQ4: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_o4_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l4_v")
    s.sql("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      FROM graft_o4_v o
      WHERE o_orderdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
        AND o_orderdate < CAST('1997-07-01' AS TIMESTAMP_NTZ)
        AND EXISTS (SELECT 1 FROM graft_l4_v l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority ASC""")
  }

  /** TPC-H Q12 analog (late-line priority split) — the fact-fact join
    * with CONDITIONAL counting: lineitem ⋈ orders on orderkey, lines
    * that shipped late (>90 days after the order date — the fixture
    * has no shipmode/receiptdate, so the lateness predicate and the
    * returnflag grouping stand in for Q12's shipmode slice), split per
    * returnflag into high-priority (URGENT/HIGH) vs low-priority
    * counts via two CASE sums in one pass. Scale: the one data-sized
    * exchange is the orderkey shuffle both facts already need; the
    * shipdate year-range prunes the lineitem scan BEFORE the join
    * (pushed to parquet), the join-residual lateness test needs both
    * sides so it evaluates as a post-join filter, and the CASE sums
    * are exact BIGINTs — no second pass, no pivot shuffle. */
  private val sqlQ12: QFn = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_o12_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l12_v")
    s.sql("""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM graft_o12_v o JOIN graft_l12_v l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL '90' DAY
        AND l.l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
        AND l.l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)
      GROUP BY l_returnflag
      ORDER BY l_returnflag ASC""")
  }

  /** TPC-H Q14 analog (promo-revenue share) — the GLOBAL-RATIO shape:
    * one quarter of the fact joined to the part dim, and the answer is
    * a single row, 100 × Σ(promo revenue) / Σ(all revenue). The
    * fixture's p_type domain carries 'PROMO' literally, so the spec's
    * `LIKE 'PROMO%'` gate is the exact equality here. Scale: part
    * broadcasts (PlanSpec pins it — a 20M-row dim is still KBs per
    * p_type/p_partkey projection next to a 100 TB fact), the quarter
    * range is pushed into the fact scan, and both sums ride ONE
    * aggregation — the CASE's else arm is a DECIMAL zero so the branch
    * types unify exactly and numerator/denominator accumulate in the
    * same exact-DECIMAL pass; the closing division is one double op on
    * engine-identical operands, rounded output-only (sql_q8's idiom,
    * `+ 0.0` normalizing a signed zero). */
  private val sqlQ14: QFn = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l14_v")
    Tables.part(s, d).createOrReplaceTempView("graft_p14_v")
    s.sql("""
      SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1.0 - l_discount)
                               AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE), 6) + 0.0
               AS promo_revenue,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM graft_l14_v l JOIN graft_p14_v p ON l.l_partkey = p.p_partkey
      WHERE l_shipdate >= CAST('1997-06-01' AS TIMESTAMP_NTZ)
        AND l_shipdate < CAST('1997-09-01' AS TIMESTAMP_NTZ)""")
  }

  /** TPC-H Q20 analog (potential part promotion) — the NESTED-IN
    * shape: suppliers selected by an IN whose subquery itself filters
    * by another IN (parts named like '%bolt%'), with a HAVING
    * threshold on per-(supplier, part) shipped quantity standing in
    * for the spec's partsupp.ps_availqty comparison (the fixture has
    * no partsupp table). Catalyst rewrites BOTH membership tests into
    * left-semi joins — the inner one gates the fact scan against the
    * ~KB bolt-part key set (broadcast semi), the outer one gates the
    * 100-row supplier dim against the surviving aggregated supplier
    * keys (PlanSpec pins two LeftSemis and no nested loop). Scale: one
    * pruned fact pass, one (suppkey, partkey) partial+final aggregate,
    * then dim-sized work only. l_quantity is integral-valued so the
    * HAVING sum is exact in doubles on any partitioning. */
  private val sqlQ20: QFn = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("graft_s20_v")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_l20_v")
    Tables.part(s, d).createOrReplaceTempView("graft_p20_v")
    s.sql("""
      SELECT s_suppkey, s_name
      FROM graft_s20_v
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM graft_l20_v
        WHERE l_partkey IN (SELECT p_partkey FROM graft_p20_v
                            WHERE p_name LIKE '%bolt%')
          AND l_shipdate >= CAST('1997-01-01' AS TIMESTAMP_NTZ)
          AND l_shipdate < CAST('1998-01-01' AS TIMESTAMP_NTZ)
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 60.0)
      ORDER BY s_suppkey ASC""")
  }

  val queries: Seq[(String, QFn)] = Seq(
    "sql_q11" -> sqlQ11,
    "sql_q15" -> sqlQ15,
    "sql_q17" -> sqlQ17,
    "sql_q8" -> sqlQ8,
    "sql_q9" -> sqlQ9,
    "sql_q1" -> sqlQ1,
    "sql_q4" -> sqlQ4,
    "sql_q6" -> sqlQ6,
    "sql_q12" -> sqlQ12,
    "sql_q14" -> sqlQ14,
    "sql_q20" -> sqlQ20,
    "sql_q13" -> sqlQ13,
    "sql_q22" -> sqlQ22,
    "sql_q2" -> sqlQ2,
    "sql_q3" -> sqlQ3,
    "sql_q19" -> sqlQ19,
    "sql_q16" -> sqlQ16,
    "sql_q18" -> sqlQ18,
    "sql_q21" -> sqlQ21,
    "sql_q10" -> sqlQ10,
    "sql_q7" -> sqlQ7,
    "sql_analyze" -> sqlAnalyze,
    "sql_values" -> sqlValues,
    "sql_q5" -> sqlQ5,
    "sql_subquery" -> sqlSubquery,
    "sql_lateral" -> sqlLateral,
    "sql_params" -> sqlParams,
    "sql_pivot" -> sqlPivot,
    "sql_unpivot" -> sqlUnpivot,
    "sql_ddl" -> sqlDdl,
    "sql_insert" -> sqlInsert,
    "sql_merge" -> sqlMerge,
    "sql_view" -> sqlView,
    "sql_window" -> sqlWindow,
    "sql_recursive" -> sqlRecursive,
  )

  val oracles: Seq[(String, String)] = Seq(
    "sql_q11" ->
      """WITH p AS (SELECT l_partkey,
                           sum(CAST(l_extendedprice * (1.0 - l_discount)
                                    AS DECIMAL(18,6))) AS s
                    FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey,
                round(CAST(s AS DOUBLE), 4) AS value
         FROM p
         WHERE s * (SELECT count(*) FROM p) * 2 > (SELECT sum(s) FROM p) * 3
         ORDER BY value DESC NULLS LAST, l_partkey ASC NULLS FIRST""",
    "sql_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 1e6 + 0.5) AS BIGINT)) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
                round(CAST(total_rev AS DOUBLE) / 1e6, 4) AS total_rev
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_rev = (SELECT max(total_rev) FROM revenue)
         ORDER BY s_suppkey ASC NULLS FIRST""",
    "sql_q17" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                        AS DOUBLE) / 7.0, 4) AS avg_yearly,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand = 'Brand#2' AND p.p_type = 'ECONOMY'
           AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)""",
    "sql_q8" ->
      """WITH an AS (
           SELECT year(o.o_orderdate) AS o_year,
                  CAST(l.l_extendedprice * (1.0 - l.l_discount)
                       AS DECIMAL(18,6)) AS volume,
                  s_n.n_name AS supp_nation
           FROM part p
                JOIN lineitem l ON p.p_partkey = l.l_partkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation c_n ON c_n.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = c_n.n_regionkey
                JOIN nation s_n ON s_n.n_nationkey = s.s_nationkey
           WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
             AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             AND o.o_orderdate < TIMESTAMP '1998-01-01')
         SELECT CAST(o_year AS BIGINT) AS o_year,
                CAST(count(*) AS BIGINT) AS n_rows,
                round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 6) + 0.0 AS mkt_share
         FROM an GROUP BY o_year
         ORDER BY o_year ASC NULLS FIRST""",
    "sql_q9" ->
      """SELECT n_name AS nation, CAST(o_year AS BIGINT) AS o_year,
                CAST(count(*) AS BIGINT) AS n_rows,
                round(CAST(sum(volume) AS DOUBLE) / 1e6, 4) AS sum_profit
         FROM (SELECT s_n.n_name, year(o.o_orderdate) AS o_year,
                      CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                   * 1e6 + 0.5) AS BIGINT) AS volume
               FROM part p
                    JOIN lineitem l ON p.p_partkey = l.l_partkey
                    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                    JOIN orders o ON o.o_orderkey = l.l_orderkey
                    JOIN nation s_n ON s_n.n_nationkey = s.s_nationkey
               WHERE p.p_name LIKE '%bolt%') profit
         GROUP BY n_name, o_year
         ORDER BY nation ASC NULLS FIRST, o_year DESC NULLS LAST""",
    "sql_q1" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                round(CAST(sum(CAST(floor(l_extendedprice * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4)
                  AS sum_base_price,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                            * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4)
                  AS sum_disc_price,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                            * (1.0 + l_tax) * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4)
                  AS sum_charge,
                round(avg(l_quantity), 6) AS avg_qty,
                round(CAST(sum(CAST(floor(l_extendedprice * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6 / count(*), 6)
                  AS avg_price,
                round(CAST(sum(CAST(floor(l_discount * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6 / count(*), 6)
                  AS avg_disc,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "sql_q6" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                                 AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24.0""",
    "sql_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-07-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS FIRST""",
    "sql_q12" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
           AND l.l_shipdate >= TIMESTAMP '1997-01-01'
           AND l.l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS FIRST""",
    "sql_q14" ->
      """SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                  AS DECIMAL(18,6))) AS DOUBLE), 6) + 0.0
                  AS promo_revenue,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-06-01'
           AND l_shipdate < TIMESTAMP '1997-09-01'""",
    "sql_q20" ->
      """SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_name LIKE '%bolt%')
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY l_suppkey, l_partkey
           HAVING sum(l_quantity) > 60.0)
         ORDER BY s_suppkey ASC NULLS FIRST""",
    "sql_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c LEFT OUTER JOIN orders o
                 ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
               GROUP BY c.c_custkey) c_orders
         GROUP BY c_count
         ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""",
    "sql_q22" ->
      """WITH pos AS (SELECT CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) AS bal_u
                      FROM customer WHERE c_acctbal > 0.0),
            thr AS (SELECT CAST(sum(bal_u) AS BIGINT) AS su,
                           CAST(count(*) AS BIGINT) AS n FROM pos)
         SELECT c_nationkey AS cntrycode,
                CAST(count(*) AS BIGINT) AS numcust,
                CAST(sum(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                  AS totbal_micro
         FROM customer CROSS JOIN thr
         WHERE CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) * thr.n > thr.su
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c_custkey
                             AND o.o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey
         ORDER BY cntrycode ASC NULLS FIRST""",
    "sql_q2" ->
      """SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
                l_extendedprice AS best_price, l_orderkey, l_linenumber
         FROM part, lineitem, supplier, nation, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'EUROPE'
           AND p_type = 'STANDARD' AND p_size <= 25
           AND l_extendedprice = (
             SELECT min(l2.l_extendedprice)
             FROM lineitem l2, supplier s2, nation n2, region r2
             WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
               AND s2.s_nationkey = n2.n_nationkey
               AND n2.n_regionkey = r2.r_regionkey
               AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC,
                  l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",
    "sql_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
                CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
                round(sum(l_quantity), 4) AS total_qty
         FROM customer c
         JOIN orders o ON c_custkey = o_custkey
         JOIN lineitem l ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING sum(l_quantity) > 200)
         GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
                  o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 100""",
    "sql_analyze" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                                * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS FIRST""",
    "sql_q10" ->
      """SELECT c_custkey, c_name,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                                * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
                n_name
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC
         LIMIT 20""",
    "sql_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                                * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
                count(*) AS n_lines
         FROM supplier
         JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name <> n2.n_name
           AND n1.n_regionkey = n2.n_regionkey
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
         ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
                  l_year ASC NULLS FIRST""",
    "sql_q21" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders o ON o_orderkey = l1.l_orderkey
         WHERE o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                       WHERE l3.l_orderkey = l1.l_orderkey
                         AND l3.l_suppkey <> l1.l_suppkey
                         AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name ASC
         LIMIT 100""",
    "sql_values" ->
      """SELECT m.tier, count(*) AS n_cust,
                round(CAST(sum(CAST(c_acctbal * m.boost AS DECIMAL(18,6)))
                           AS DOUBLE), 4) AS boosted_bal
         FROM customer c
         JOIN (VALUES
                 ('BUILDING', 1.10, 'core'), ('AUTOMOBILE', 1.05, 'core'),
                 ('MACHINERY', 1.00, 'standard'), ('HOUSEHOLD', 0.95, 'standard'),
                 ('FURNITURE', 0.90, 'long_tail')) m(seg, boost, tier)
           ON c.c_mktsegment = m.seg
         GROUP BY m.tier
         ORDER BY m.tier ASC NULLS FIRST""",
    "sql_pivot" ->
      """SELECT o_orderpriority,
                count(*) FILTER (o_orderstatus = 'F') AS f_n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                           FILTER (o_orderstatus = 'F') AS DOUBLE), 4) AS f_total,
                count(*) FILTER (o_orderstatus = 'O') AS o_n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                           FILTER (o_orderstatus = 'O') AS DOUBLE), 4) AS o_total,
                count(*) FILTER (o_orderstatus = 'P') AS p_n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                           FILTER (o_orderstatus = 'P') AS DOUBLE), 4) AS p_total
         FROM orders
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS FIRST""",
    "sql_unpivot" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
                           l_extendedprice, l_discount, l_tax
                    FROM lineitem WHERE l_orderkey < 200)
         SELECT l_orderkey, l_linenumber, metric, val FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                  l_quantity AS val FROM b
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                  l_extendedprice FROM b
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
                  l_discount FROM b
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
                  l_tax FROM b) t
         ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
                  metric ASC NULLS FIRST""",
    "sql_q3" ->
      """SELECT l_orderkey,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                                * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue,
                CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
         ORDER BY revenue DESC, o_date ASC, l_orderkey ASC
         LIMIT 10""",
    "sql_q19" ->
      """SELECT p_brand,
                count(*) AS n_lines,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                                * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#24' AND p_size BETWEEN 10 AND 35
                AND l_quantity BETWEEN 20 AND 40)
         GROUP BY p_brand
         ORDER BY p_brand ASC NULLS FIRST""",
    "sql_q16" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#5'
           AND p_type NOT LIKE 'STANDARD%'
           AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS FIRST,
                  p_type ASC NULLS FIRST, p_size ASC NULLS FIRST""",
    "sql_q5" ->
      """SELECT n_name,
                round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                            * 1e6 + 0.5)
                                    AS BIGINT)) AS DOUBLE) / 1e6, 4) AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""",
    "sql_subquery" ->
      """SELECT c_custkey, c_acctbal
         FROM customer c
         WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                                        AS DOUBLE) / count(*)
                            FROM customer)
           AND EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'O')
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_totalprice > 450000.0)
         ORDER BY c_custkey ASC NULLS FIRST""",
    "sql_params" ->
      """SELECT o_orderpriority,
                count(*) AS n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS total
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderstatus = 'O'
           AND o_totalprice > 1000.0
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS FIRST""",
    "sql_lateral" ->
      """SELECT c_custkey, c_acctbal,
                l.n_open,
                coalesce(round(CAST(l.open_total AS DOUBLE), 4), 0.0) AS open_total,
                CAST(l.last_odate AS DATE) AS last_odate
         FROM customer c,
         LATERAL (SELECT count(*) AS n_open,
                         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS open_total,
                         max(o_orderdate) AS last_odate
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'O') l
         WHERE c_acctbal > 9000.0
         ORDER BY c_custkey ASC NULLS FIRST""",
    "sql_ddl" ->
      """SELECT p_brand,
                count(*) AS n_parts,
                round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS total_price
         FROM part
         WHERE p_size >= 25
         GROUP BY p_brand
         ORDER BY p_brand ASC NULLS FIRST""",
    "sql_insert" ->
      """SELECT o_orderstatus,
                count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS total_price
         FROM orders
         WHERE o_totalprice >= 1000.0
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus ASC NULLS FIRST""",
    "sql_merge" ->
      """SELECT c_custkey AS key, c_name AS name,
                CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 50.0
                     ELSE c_acctbal END AS bal
         FROM customer
         WHERE (c_custkey % 2 = 0 OR c_custkey % 4 <> 0)
           AND c_custkey <= 300
         ORDER BY key ASC NULLS FIRST""",
    "sql_view" ->
      """WITH net AS (
           SELECT l_orderkey, l_quantity,
                  l_extendedprice * (1.0 - l_discount) AS net
           FROM lineitem
           WHERE l_quantity > 10),
            ord AS (
           SELECT l_orderkey, count(*) AS n_items,
                  round(CAST(sum(CAST(floor(net * 1e6 + 0.5) AS BIGINT))
                             AS DOUBLE) / 1e6, 4)
                    AS net_total
           FROM net GROUP BY l_orderkey)
         SELECT l_orderkey, CAST(n_items AS BIGINT) AS n_items, net_total
         FROM ord
         WHERE n_items >= 5
         ORDER BY net_total DESC, l_orderkey ASC
         LIMIT 20""",
    "sql_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER w AS BIGINT) AS rn,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate ASC, o_orderkey ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE), 4) AS run_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""",
    "sql_recursive" ->
      """WITH RECURSIVE agg AS (
           SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE s.s_nationkey <> c.c_nationkey
           GROUP BY s.s_nationkey, c.c_nationkey),
         edges AS (
           SELECT src, dst FROM (
             SELECT src, dst,
                    row_number() OVER (PARTITION BY src
                                       ORDER BY w DESC, dst ASC) AS rn
             FROM agg) t WHERE rn <= 2),
         reach(nationkey, hop) AS (
           SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           UNION ALL
           SELECT e.dst, r.hop + 1
           FROM reach r JOIN edges e ON e.src = r.nationkey
           WHERE r.hop < 6)
         SELECT n.n_nationkey AS nationkey, n.n_name, min(r.hop) AS dist
         FROM nation n LEFT JOIN reach r ON r.nationkey = n.n_nationkey
         GROUP BY n.n_nationkey, n.n_name
         ORDER BY nationkey ASC NULLS FIRST""",
  )
}
