package graft.functions

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.K — UDF / UDAF / UDTF surface.
  * udf_jaccard intentionally stays in higher-order functions
  * (array_intersect/array_union survive whole-stage codegen; a Scala
  * closure UDF would not) — the UDF-shaped API is demonstrated, the hot
  * path is HOFs. udtf_ngrams is the generator (flatMap-on-Dataset) form.
  */
object Udx extends QueryGroup {

  /** Jaccard of token SETS of each doc vs doc 0, first 100 docs. */
  private val udfJaccard: QFn = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("toks", array_distinct(split(col("text"), " ")))
    val base = docs.filter(col("doc_id") === 0L).select(col("toks").as("toks0"))
    docs.filter(col("doc_id") > 0L && col("doc_id") < 100L)
      .crossJoin(broadcast(base))
      .select(col("doc_id"),
        round(size(array_intersect(col("toks"), col("toks0"))).cast(DoubleType) /
              size(array_union(col("toks"), col("toks0"))).cast(DoubleType), 6)
          .as("jaccard_vs_0"))
      .orderBy(col("doc_id"))
  }

  /** Custom typed Aggregator: geometric mean of extended price per flag. */
  private val udafGeomean: QFn = (s, d) => {
    val geo = udaf(GeoMean)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(geo(col("l_extendedprice")), 6).as("geomean_price"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** UDTF-equivalent generator: word 3-grams with ordinal per document
    * (typed flatMap — one output partition per input partition, no
    * shuffle). */
  private val udtfNgrams: QFn = (s, d) => {
    val sp = s
    import sp.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") < 30L)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // limit -1 keeps trailing empty tokens, matching DuckDB string_split
        val t = text.split(" ", -1)
        (0 to t.length - 3).iterator.map(i =>
          (id, i.toLong, s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
      }
      .toDF("doc_id", "pos", "ngram")
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Custom TypedImperativeAggregate (HistogramAgg): 10-bin histogram of
    * event values over [0, 500) per event type — the buffer/merge shape
    * of real sketches, with exactly-reproducible (oracled) output. */
  private val udafHistogram: QFn = (s, d) => {
    graft.functions.HistogramAgg.ensureRegistered(s)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      // counts joined to one string — the driver's checker can't hash
      // array cells (round-1 ERR); int→string formatting is engine-stable
      .agg(expr("array_join(cast(histogram10(value) AS array<string>), ',')").as("hist"))
      .orderBy(col("event_type"))
  }

  /** Custom TypedImperativeAggregate (TopKAgg): bounded top-5 orders by
    * price per priority — the map-side-partial top-k shape whose shuffle
    * carries k pairs per (task, group) instead of every row (contrast
    * topk_per_group's window, which must move the whole table). */
  private val udafTopk: QFn = (s, d) => {
    graft.functions.TopKAgg.ensureRegistered(s)
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(expr("topk5(o_totalprice, o_orderkey)").as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast(LongType).as("rank"),
        col("col.ord").as("o_totalprice"),
        col("col.payload").as("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  val queries: Seq[(String, QFn)] = Seq(
    "udf_jaccard" -> udfJaccard,
    "udaf_geomean" -> udafGeomean,
    "udaf_histogram" -> udafHistogram,
    "udaf_topk" -> udafTopk,
    "udtf_ngrams" -> udtfNgrams,
  )

  val oracles: Seq[(String, String)] = Seq(
    "udaf_histogram" ->
      """WITH b AS (SELECT event_type,
                           CAST(least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS INT) AS bin
                    FROM events),
            c AS (SELECT event_type, bin, count(*) n FROM b GROUP BY 1, 2),
            g AS (SELECT DISTINCT event_type, CAST(gs.i AS INT) AS bin
                  FROM events CROSS JOIN (SELECT unnest(range(10)) AS i) gs)
         SELECT event_type,
                string_agg(CAST(coalesce(n, 0) AS VARCHAR), ',' ORDER BY bin) AS hist
         FROM g LEFT JOIN c USING (event_type, bin)
         GROUP BY event_type
         ORDER BY event_type ASC NULLS FIRST""",
    "udaf_topk" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_totalprice, o_orderkey
         FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
               FROM orders) t
         WHERE rn <= 5
         ORDER BY o_orderpriority ASC NULLS FIRST, rank ASC NULLS FIRST""",
    "udf_jaccard" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) toks FROM documents),
            b AS (SELECT toks AS toks0 FROM t WHERE doc_id = 0)
         SELECT doc_id,
                round(CAST(len(list_filter(toks, x -> list_contains(toks0, x))) AS DOUBLE)
                      / (len(toks) + len(toks0)
                         - len(list_filter(toks, x -> list_contains(toks0, x)))), 6)
                  AS jaccard_vs_0
         FROM t CROSS JOIN b
         WHERE doc_id > 0 AND doc_id < 100
         ORDER BY doc_id ASC NULLS FIRST""",
    "udaf_geomean" ->
      """SELECT l_returnflag,
                round(exp(avg(ln(l_extendedprice))), 6) AS geomean_price,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS FIRST""",
    "udtf_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents
                       WHERE doc_id < 30)
         SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
         FROM toks, unnest(range(1, len(t) - 1)) r(i)
         ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""",
  )
}
