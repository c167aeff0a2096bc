package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-data pipeline composed from the library's own
  * building blocks, declared as ONE DataFrame so Catalyst plans the
  * whole flow (filters pushed into the scans, dedup shuffle on fixed-
  * width digests, broadcast-free doc↔embedding join on the shared key):
  *
  *   documents → normalize → exact-dedup (min-doc_id survivor per md5
  *   digest) → quality gate → join embeddings → per-language rollup.
  *
  * This is the "switch your pipeline to this library" demonstration:
  * each stage follows the corresponding standalone operator's shape
  * (text_normalize, dedup_exact, text_quality, multimodal_join) with
  * the stopword list shared; the gate uses the UNROUNDED stop ratio
  * (text_quality rounds its reported ratio for display) — and the
  * whole composition is DuckDB-oracled. At
  * 100 TB each stage keeps its individual scale property — nothing in
  * the composition adds a shuffle the stages alone would not have. */
object Pipeline extends QueryGroup {

  private val pipelineE2e: QFn = (s, d) => {
    val norm = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("text"),
      regexp_replace(
        trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")),
        " +", " ").as("norm_text"))
    // survivor ids: groupBy on the digest (fixed-width shuffle rows,
    // map-side min) — the dedup_exact shape, then an equi-join brings
    // the surviving rows back without moving documents twice
    val survIds = norm
      .select(col("doc_id"), md5(col("norm_text")).as("nh"))
      .groupBy(col("nh")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val gated = norm.join(survIds, Seq("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => t.isin(LlmText.StopTokens: _*))).cast(DoubleType) /
          size(col("toks")).cast(DoubleType))
      .withColumn("quality",
        log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("stop_ratio")))
      .filter(col("quality") > 2.0)
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
        lit(0.0), (a, v) => a + v)).as("l2"))
    gated.join(e, gated("doc_id") === e("vec_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           round(avg(col("quality")), 6).as("avg_quality"),
           round(avg(col("l2")), 6).as("avg_l2"))
      .orderBy(col("lang"))
  }

  val queries: Seq[(String, QFn)] = Seq(
    "pipeline_e2e" -> pipelineE2e,
  )

  val oracles: Seq[(String, String)] = Seq(
    "pipeline_e2e" ->
      """WITH norm AS (
           SELECT doc_id, lang, text,
                  regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                                 ' +', ' ', 'g') AS norm_text
           FROM documents),
         surv AS (
           SELECT min(doc_id) AS doc_id
           FROM (SELECT doc_id, md5(norm_text) AS nh FROM norm) t
           GROUP BY nh),
         gated AS (
           SELECT n.doc_id, n.lang,
                  CAST(len(string_split(n.text, ' ')) AS BIGINT) AS n_tokens,
                  ln(1.0 + len(string_split(n.text, ' ')))
                    * (1.0 - CAST(len(list_filter(string_split(n.text, ' '),
                                t -> t = 'the' OR t = 'a')) AS DOUBLE)
                             / len(string_split(n.text, ' '))) AS quality
           FROM norm n JOIN surv s ON n.doc_id = s.doc_id),
         q AS (SELECT * FROM gated WHERE quality > 2.0),
         e AS (SELECT vec_id,
                      sqrt(list_reduce(list_prepend(0.0,
                             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                           (a, b) -> a + b)) AS l2
               FROM embeddings)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                round(avg(quality), 6) AS avg_quality,
                round(avg(l2), 6) AS avg_l2
         FROM q JOIN e ON q.doc_id = e.vec_id
         GROUP BY lang
         ORDER BY lang ASC NULLS FIRST""",
  )
}
