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
  *   digest) → minhash near-dup drop (anti-join against the larger
  *   member of every verified pair — the transitive-closure variant is
  *   dedup_clusters) → quality gate → deterministic train/val split →
  *   join embeddings → per-(language, split) rollup.
  *
  * This is the "switch your pipeline to this library" demonstration:
  * each stage follows the corresponding standalone operator's shape
  * (text_normalize, dedup_exact, dedup_near_minhash, text_quality,
  * split_train_val, multimodal_join) with the stopword list, minhash
  * constants, and hash-bucket split shared with those operators so the
  * composition cannot silently drift from them — and the whole flow is
  * DuckDB-oracled. The quality gate compares the 6-dp-ROUNDED score
  * (`round(quality, 6) > 2.0`): both engines quantize before the
  * comparison, so a cross-engine ln() ULP difference can no longer flip
  * the gate for a doc sitting exactly at the boundary. At 100 TB each
  * stage keeps its individual scale property — the near-dup drop is an
  * anti-join on doc_id (shuffle on the key, no pair re-verification),
  * the split adds no shuffle at all (pure row hash), and nothing in the
  * composition adds a shuffle the stages alone would not have. */
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
    // near-dup drop: every doc that is the larger member of a verified
    // minhash pair is dropped via LEFT ANTI on the key — at scale this
    // moves doc_ids, never documents or shingles
    val nearDropped = LlmText.minhashPairsCached(s, d)
      .select(col("db").as("doc_id")).distinct()
    val gated = norm.join(survIds, Seq("doc_id"))
      .join(nearDropped, Seq("doc_id"), "left_anti")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => t.isin(LlmText.StopTokens: _*))).cast(DoubleType) /
          size(col("toks")).cast(DoubleType))
      .withColumn("quality",
        log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("stop_ratio")))
      .filter(round(col("quality"), 6) > 2.0)
      .withColumn("split",
        when(Sampling.hashBucket(col("doc_id"), 10) === 9L, "val")
          .otherwise("train"))
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
        lit(0.0), (a, v) => a + v)).as("l2"))
    gated.join(e, gated("doc_id") === e("vec_id"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           round(avg(col("quality")), 6).as("avg_quality"),
           round(avg(col("l2")), 6).as("avg_l2"))
      .orderBy(col("lang"), col("split"))
  }

  val queries: Seq[(String, QFn)] = Seq(
    "pipeline_e2e" -> pipelineE2e,
  )

  val oracles: Seq[(String, String)] = Seq(
    "pipeline_e2e" ->
      s"""WITH ${LlmText.duckMinhashPairsCtes},
         norm AS (
           SELECT doc_id, lang, text,
                  regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                                 ' +', ' ', 'g') AS norm_text
           FROM documents),
         surv AS (
           SELECT min(doc_id) AS doc_id
           FROM (SELECT doc_id, md5(norm_text) AS nh FROM norm) t
           GROUP BY nh),
         near_dropped AS (SELECT DISTINCT db AS doc_id FROM pairs),
         gated AS (
           SELECT n.doc_id, n.lang,
                  CAST(len(string_split(n.text, ' ')) AS BIGINT) AS n_tokens,
                  ln(1.0 + len(string_split(n.text, ' ')))
                    * (1.0 - CAST(len(list_filter(string_split(n.text, ' '),
                                t -> t = 'the' OR t = 'a')) AS DOUBLE)
                             / len(string_split(n.text, ' '))) AS quality
           FROM norm n JOIN surv s ON n.doc_id = s.doc_id
           WHERE n.doc_id NOT IN (SELECT doc_id FROM near_dropped)),
         q AS (SELECT gated.*,
                      CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 = 9
                           THEN 'val' ELSE 'train' END AS split
               FROM gated WHERE round(quality, 6) > 2.0),
         e AS (SELECT vec_id,
                      sqrt(list_reduce(list_prepend(0.0,
                             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                           (a, b) -> a + b)) AS l2
               FROM embeddings)
         SELECT lang, split, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                round(avg(quality), 6) AS avg_quality,
                round(avg(l2), 6) AS avg_l2
         FROM q JOIN e ON q.doc_id = e.vec_id
         GROUP BY lang, split
         ORDER BY lang ASC NULLS FIRST, split ASC NULLS FIRST""",
  )
}
