package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.I (text half) + the training-data-pipeline brief: text
  * normalization/analysis, exact + near dedup (MinHash-LSH, SimHash,
  * n-gram Jaccard), fingerprinting, sentiment.
  *
  * Portable-hash policy: every hash that reaches an oracled output is
  * md5-derived (identical digests in Spark and DuckDB; probe-verified
  * `('0x'||hex)::BIGINT` on the DuckDB side ≡ `conv(hex,16,10)` on the
  * Spark side). Spark `hash()`/`xxhash64` never appear in oracled
  * queries (SURVEY.md §7.4).
  *
  * Scale design: all dedup paths avoid the O(n²) pair product — MinHash
  * bands and SimHash chunks turn pair discovery into equality-bucket
  * shuffles (groupBy/join on band keys), which is the 100 TB shape; the
  * exact-Jaccard verification only ever runs on the candidate set.
  */
object LlmText extends QueryGroup {

  /** 48-bit portable token hash from the md5 hex prefix. */
  private def tokHash(c: Column): Column =
    // round-18 opt: fused md5-prefix kernel (value-identical, pinned)
    graft.functions.GraftFunctions.md5Prefix48(c)

  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "tok")

  /** Every word 3-gram of a (doc_id, text) frame as
    * (doc_id [, extras], pos, gh), gh = the 48-bit md5 prefix of the
    * space-joined gram ([[tokHash]]). This is the ONE tokenize+hash
    * pass behind all three gram consumers (round-15 advice item 2 —
    * they each re-shingled the corpus): minhash shingles take gh % P,
    * winnowing takes the 8-hex prefix gh DIV 16⁴, the novelty table
    * takes gh itself. Grams leave this operator already hashed: every
    * downstream shuffle carries 8-byte digests, never text. */
  private[graft] def gramsOf(docs: DataFrame, extras: Seq[String] = Nil): DataFrame =
    // <3-token docs have no 3-grams; without this filter
    // sequence(0, size-3) would DESCEND (default step -1) and
    // fabricate null-padded grams no consumer's oracle produces.
    // round-19 opt: the guard runs the tok_count kernel on the raw text
    // (value-identical to size(split(...)), pinned) so the pushed-down
    // filter no longer evaluates a second split() per row.
    docs.filter(graft.functions.GraftFunctions.tokCount(col("text")) >= 3L)
      .withColumn("t", split(col("text"), " "))
      // round-18 opt: explode the OFFSETS (codegen generator) and build
      // each gram as a top-level codegen projection — the former
      // transform(...) lambda assembled every gram string interpreted
      // (HOFs are CodegenFallback). Same rows bit for bit.
      .select(col("doc_id") +: extras.map(col) :+ col("t") :+
        explode(expr("sequence(0, size(t) - 3)")).as("i"): _*)
      .select((col("doc_id") +: extras.map(col)) ++ Seq(
        col("i").cast(LongType).as("pos"),
        tokHash(expr("concat_ws(' ', t[i], t[i+1], t[i+2])")).as("gh")): _*)

  /** The session-lifetime gram base over the fixture corpus — one
    * persisted (doc_id, source, pos, gh) table per (session, sf dir,
    * fixture fingerprint), feeding minhash signature building AND
    * winnowing AND the n-gram novelty table. 32 bytes/gram, a fraction
    * of the text it derives from; at 100 TB this is the shingle table
    * a pipeline checkpoints to the cluster store once per ingest. */
  private val gramCache = new FingerprintCache
  private[graft] def gramsCached(s: SparkSession, d: String): DataFrame =
    gramCache.getOrElseUpdate(s, d, Tables.fingerprint(d, "documents"))(
      gramsOf(Tables.documents(s, d), Seq("source"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** lowercase, strip non-alnum, collapse whitespace. */
  private val textNormalize: QFn = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(
        trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")),
        " +", " ").as("norm_text")
    ).orderBy(col("doc_id"))

  /** Global term frequencies, top 50 terms. */
  private val textTokens: QFn = (s, d) =>
    tokens(s, d).groupBy(col("tok").as("term"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term"))
      .limit(50)

  /** tf-idf, top term per doc. idf = ln((N+1)/(df+1)).
    * df is re-aggregated from tf rather than from a second tokenize
    * pass — the (doc_id, tok) exchange is identical in both branches, so
    * ReuseExchange scans and explodes the corpus once. */
  private val textTfidf: QFn = (s, d) => {
    // corpus size as a lazy 1-row broadcast, not an eager driver count()
    // (constructing the DataFrame must not run a Spark job)
    val n = Tables.documents(s, d).agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    // round-18 opt: the df margin and the join probe both re-derived the
    // tokenize+count — checkpoint the |doc·distinct-tok|-bounded tf once
    val tf = tokens(s, d).groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast(DoubleType) *
          log((col("n_docs") + 1.0) / (col("df").cast(DoubleType) + 1.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("term"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"))
  }

  /** Okapi BM25 top-10 ranking core (Robertson et al., TREC-3; the
    * Lucene always-positive idf variant) over arbitrary (doc_id, text)
    * docs and (qid, term) queries — factored so CurationSpec can feed a
    * planted corpus. Per matched (query, doc, term):
    *
    *   idf = ln((N − df + 0.5)/(df + 0.5) + 1)
    *   c   = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with k1 = 1.2, b = 0.75 as literals (1−b spelled 0.25, never
    * computed). tf/df/dl/N are exact integers, avgdl divides exact
    * integers once, and every other operation is a fixed-shape double
    * expression mirrored op-for-op in the oracle — identical IEEE on
    * both engines. Each term contribution is NANO-quantized
    * (⌊c·10⁹+0.5⌋, the agg_chisq device) BEFORE the per-(qid, doc) fold
    * so the unordered sum is integer-exact on any partitioning.
    * Scale shape: ONE corpus tokenize/count pass (tf; df re-aggregates
    * it — the text_tfidf ReuseExchange posture), the query-term table
    * is query-workload-sized and broadcast, so only matching postings
    * survive the join; dl rides a second columnar scan; the top-10 is
    * a per-qid rank window, never a global sort. 100 TB: this is the
    * standard posting-list scoring join — nothing data-sized crosses
    * the final stage but the (qid, doc) partial sums. */
  private[graft] def bm25Rank(docs: DataFrame, queryTerms: DataFrame): DataFrame =
    bm25RankTf(bm25Tf(docs), queryTerms)

  /** The one corpus tokenize+count pass behind BM25 (round-19 opt):
    * (doc_id, tok, tf), checkpointed because FOUR consumers re-derived
    * it (tf probe, df margin, dl = Σtf — exact integers, identical to
    * size(split(...)) since every doc tokenizes to ≥1 token — and
    * bm25TopK's query-workload df). One tokenize instead of two plus a
    * separate dl scan; every downstream value is the same exact
    * integer, so the scores are bit-identical. (Caveat recorded for
    * caller corpora: a NULL text tokenizes to no rows, so it no longer
    * counts into N the way the old size(split(NULL))=NULL dl row did —
    * the fixture and every test corpus are null-free, and a null page
    * contributing to the idf prior was arguably a bug.) */
  private[graft] def bm25Tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()

  private[graft] def bm25RankTf(tf: DataFrame, queryTerms: DataFrame): DataFrame = {
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val qt = queryTerms.select(col("qid"), col("term").as("tok"))
      .join(df, "tok").select(col("qid"), col("tok"), col("df"))
    val scored = tf.join(broadcast(qt), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n").cast(DoubleType) - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("avgdl", col("sdl").cast(DoubleType) / col("n"))
      .withColumn("cn", floor(
        col("idf") * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
          * lit(1e9) + lit(0.5)).cast(LongType))
      .groupBy(col("qid"), col("doc_id")).agg(sum(col("cn")).as("sn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sn").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank").cast(LongType).as("rank"), col("doc_id"),
        (round(col("sn").cast(DoubleType) / lit(1e9), 6) + lit(0.0)).as("bm25"))
      .orderBy(col("qid"), col("rank"))
  }

  /** BM25 retrieval scoring — the ranking a RAG pipeline actually
    * serves, completing the ladder text_tfidf starts (tf·idf tags
    * documents; BM25 ranks them for a query). The query workload is
    * derived deterministically from the corpus so the rung is
    * scale-robust: terms ranked by (df DESC, tok ASC), query q gets
    * ranks 3q+1..3q+3, q = 0..4 — five 3-term queries. The top-15 term
    * pick is a distributed TakeOrderedAndProject (orderBy + limit);
    * only the 15 surviving rows see a single-partition rank window
    * (bounded by construction). Scoring itself is [[bm25Rank]]. */
  private[graft] def bm25TopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // round-19 opt: ONE tokenize pass — the query-workload df and the
    // scoring legs all derive from the same checkpointed tf table
    val tf = bm25Tf(docs)
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val top15 = df.orderBy(col("df").desc, col("tok").asc).limit(15)
    val wq = Window.orderBy(col("df").desc, col("tok").asc)
    val qt = top15.withColumn("r", row_number().over(wq))
      .select(expr("CAST((r - 1) DIV 3 AS BIGINT)").as("qid"), col("tok").as("term"))
    bm25RankTf(tf, qt)
  }

  private val textBm25: QFn = (s, d) => bm25TopK(s, d)

  /** Per-document keyword extraction — the metadata-enrichment step a
    * corpus pipeline runs to tag every document (search facets, topic
    * routing, dataset cards): top-3 tokens by tf·idf, emitted as one
    * rank-ordered string per doc. Same bounded shapes as text_tfidf
    * (per-doc tf groupBy, UNHINTED vocabulary-sized df join — like
    * text_tfidf's, so AQE broadcasts it only while the vocabulary
    * actually fits and falls back to a tok-keyed shuffle at web-corpus
    * vocabulary sizes; `text_hash_features` is the vocabulary-FREE
    * alternative when even the df aggregate is too hot; 1-row corpus
    * count broadcast); the rank window partitions by doc_id — never a
    * global sort — and the reassembly is text_dedup_span's
    * sort_array-of-structs idiom. */
  private val textKeywordExtract: QFn = (s, d) => {
    val n = Tables.documents(s, d).agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    // round-18 opt: checkpoint tf once for its two consumers (the
    // text_tfidf device)
    val tf = tokens(s, d).groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast(DoubleType) *
          log((col("n_docs") + 1.0) / (col("df").cast(DoubleType) + 1.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("doc_id"))
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(rn, tok))), x -> x.tok)"), " ")
        .as("keywords"))
      .orderBy(col("doc_id"))
  }

  private val textLangStats: QFn = (s, d) =>
    Tables.documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 6).as("avg_chars"),
           countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** Lexicon-join sentiment (grounding: PAPERS.md Spark sentiment work):
    * tiny embedded ±1 lexicon, per-doc mean over matched tokens, per-lang
    * mean of doc scores. */
  private val textSentiment: QFn = (s, d) => {
    val lex = s.createDataFrame(Seq(
      ("fast", 1.0), ("big", 1.0), ("value", 1.0),
      ("slow", -1.0), ("dup", -1.0))).toDF("tok", "score")
    val docScore = tokens(s, d).join(broadcast(lex), "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg((sum(col("score")) / count(lit(1))).as("doc_sent"))
    docScore.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_scored_docs"),
           // + 0.0 folds DuckDB's -0.0 (sentiment mean can straddle zero)
           (round(avg(col("doc_sent")), 6) + lit(0.0)).as("mean_sent"))
      .orderBy(col("lang"))
  }

  /** Language-ID by stopword-trigram heuristic (demo heuristic — corpus
    * text is synthetic English-vocabulary for every lang label). */
  private val textLangid: QFn = (s, d) => {
    val t = tokens(s, d)
    t.groupBy(col("doc_id"), col("lang"))
      .agg((sum(when(col("tok") === "the", 1L).otherwise(0L)).cast(DoubleType) /
            count(lit(1))).as("the_ratio"))
      .select(col("doc_id"),
        when(col("the_ratio") > 0.0, "en").otherwise("unk").as("pred_lang"),
        round(col("the_ratio"), 6).as("the_ratio"),
        (when(col("the_ratio") > 0.0, "en").otherwise("unk") === col("lang"))
          .as("is_match"))
      .orderBy(col("doc_id"))
  }

  /** Feature hashing (the hashing trick): tokens → fixed k=64 portable
    * md5 buckets → per-doc bucketed term counts, summarized as the
    * feature vector's stats (nnz / max / L2). Vocabulary-FREE — no
    * dictionary fit, no vocabulary-sized shuffle, feature width fixed
    * up front — which is why large-scale text featurization reaches for
    * it before TF-IDF: at 100 TB the tf→df join disappears entirely.
    * All counts are exact integers; L2 is sqrt of an exact BIGINT. */
  private val textHashFeatures: QFn = (s, d) =>
    tokens(s, d)
      .withColumn("bkt",
        graft.functions.GraftFunctions.md5Prefix48(col("tok")) % 64L)
      .groupBy(col("doc_id"), col("bkt")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("f_nnz"),
           max(col("cnt")).as("f_max"),
           round(sqrt(sum(col("cnt") * col("cnt")).cast(DoubleType)), 6).as("f_l2"))
      .orderBy(col("doc_id"))

  /** Stopword list shared with Pipeline.pipeline_e2e's quality gate so
    * the two can't silently drift. */
  private[graft] val StopTokens = Seq("the", "a")

  /** Quality scoring: token/char counts, stopword ratio, log-length
    * score — the standard pre-training quality gates. `quality` is
    * computed from the UNROUNDED stop ratio (the same semantic the
    * pipeline_e2e gate and api.GraftOps.qualityScore use — ApiSpec
    * asserts the three agree); the reported stop_ratio column is
    * rounded for display only. */
  private val textQuality: QFn = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
      length(col("text")).cast(LongType).as("len_chars"),
      col("n_chars").as("meta_chars"),
      round(length(regexp_replace(col("text"), " ", "")).cast(DoubleType) /
            size(split(col("text"), " ")).cast(DoubleType), 6).as("avg_tok_len"),
      (size(filter(split(col("text"), " "),
              x => x.isin(StopTokens: _*))).cast(DoubleType) /
            size(split(col("text"), " ")).cast(DoubleType)).as("stop_ratio_raw"),
    ).withColumn("quality",
        round(log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("stop_ratio_raw")), 6))
     .withColumn("stop_ratio", round(col("stop_ratio_raw"), 6))
     .drop("stop_ratio_raw")
     .orderBy(col("doc_id"))

  /** Token counting: whitespace split vs BPE-ish regex tokenizer. */
  private val textTokenCount: QFn = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast(LongType).as("re_tokens"),
      size(array_distinct(split(col("text"), " "))).cast(LongType).as("distinct_tokens"),
    ).orderBy(col("doc_id"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS algorithm): in every window of W=4 consecutive word
    * 3-gram hashes, select the minimum hash (rightmost position on
    * ties, the paper's convention), then dedup selections — the
    * fingerprint set GUARANTEES any shared run of ≥ W+K-1 tokens
    * between two documents shares at least one fingerprint, the
    * property plain every-Nth sampling (text_fingerprint's rolling
    * sum) cannot give. Engine-portability trick: "min hash, rightmost
    * pos" is ONE integer min over enc = h·2³¹ + (2³¹−1−pos), h bounded
    * to 32 bits (8 md5 hex chars) so enc can't overflow int64 and any
    * document up to ~2.1e9 tokens encodes correctly — the same sliding
    * ROWS frame and the same decode run on both engines.
    * Scale: one token pass, per-doc windows only (WindowExec
    * partitioned by doc_id — never a global sort), distinct on
    * (doc, hash, pos) is the only shuffle, and shuffles carry 16-byte
    * rows, never text. Expected density 2/(W+1) of gram count; laws
    * (CurationSpec): identical-text docs fingerprint identically,
    * per-doc counts within [n_windows/W, n_windows], every window is
    * covered. */
  /** One persisted fingerprint table per (fixture fingerprint,
    * construction version) — a ScratchParquet artifact (round 17; was
    * session-cached and rebuilt per JVM, ~2 s of every process's
    * warm-up): three rungs (text_winnowing, dedup_winnowing,
    * dedup_eval_winnowing) consume the same fingerprints, and later
    * JVMs read the finished 24-byte rows instead of re-running the
    * per-doc sliding-min window pipeline over the gram base. */
  private val winnowCache = new FingerprintCache
  private[graft] def winnowFps(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.fingerprint(d, "documents")
    winnowCache.getOrElseUpdate(s, s"$d#wfp", fp)(
      ScratchParquet.ensure(s, "winnow_fps", d, fp)(
        winnowFromGrams(gramsCached(s, d)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** The fingerprint construction over any (doc_id, text) frame —
    * factored out so DedupProps can property-test it against a plain
    * Scala reference on GENERATED docs, not just the fixture. */
  private[graft] def winnowFpsOf(docs: DataFrame): DataFrame =
    winnowFromGrams(gramsOf(docs))

  private def winnowFromGrams(grams: DataFrame): DataFrame = {
    val W = 4
    // Position radix 2³¹ (round-15 advice: the old 10⁵ silently broke
    // the shared-fingerprint guarantee past 1e5 tokens/doc — enc went
    // negative and decoded to a wrong hash). h is 32 bits (8 md5 hex
    // chars), so max enc = (2³²−1)·2³¹ + (2³¹−1) = 2⁶³−1: exactly
    // int64, no overflow under ANSI, and the per-doc token cap is now
    // ~2.1e9 — the guarantee holds for any document Spark can hold in
    // a row. Min over enc = h·P + (P−1−pos) is still lexicographic in
    // (h, −pos): min hash, rightmost position on ties.
    val P = 2147483648L
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams
      // first 8 of the 12 md5 hex chars: gh DIV 16⁴ — exact, no re-hash
      .select(col("doc_id"), col("pos"), expr("gh DIV 65536").as("h"))
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("enc",
        min(col("h") * P + (lit(P - 1L) - col("pos")))
          .over(byDoc.rowsBetween(0, W - 1)))
      .filter(col("pos") <= col("n_grams") - W) // full windows only
      .select(col("doc_id"),
        (lit(P - 1L) - (col("enc") % P)).as("fp_pos"),
        expr("enc DIV 2147483648").as("fp_hash")) // int division — no double detour
      .distinct()
  }

  private val textWinnowing: QFn = (s, d) =>
    winnowFps(s, d).orderBy(col("doc_id"), col("fp_pos"), col("fp_hash"))

  /** Winnowing near-dup detection — what the fingerprints exist FOR
    * (MOSS's application): candidate pairs are docs sharing ≥2
    * fingerprint hashes, scored by fingerprint-set Jaccard. The third
    * detector family next to minhash (probabilistic) and simhash
    * (distance-coded): winnowing candidates come with the GUARANTEE —
    * any shared ≥6-token run forces a shared fingerprint — so a missed
    * long overlap is impossible, not just unlikely. Scale posture is
    * the LSH one: pair enumeration is an EQUALITY join on fp_hash
    * (band-bucket shape, never all-pairs), shuffles carry (doc, hash)
    * int64 pairs, and MOSS's boilerplate-stop step caps bucket width —
    * hashes seen in >50 docs are dropped BEFORE the join (the fixture's
    * max is 9, so the cap is latent here; at 100 TB it is what keeps
    * any bucket from going quadratic, like dedup_near_minhash's band
    * cap). Jaccard divides exact distinct-int counts once at output. */
  /** The (doc_a, doc_b, n_shared, na, nb) candidate construction shared
    * by dedup_winnowing (scored output) and dedup_eval_winnowing (the
    * detector-quality measurement). */
  private def winnowPairs(s: SparkSession, d: String): DataFrame =
    winnowPairsOfFps(
      winnowFps(s, d).select(col("doc_id"), col("fp_hash")).distinct()
        .localCheckpoint(), // one fingerprint build feeds freq + both join legs
      cap = 50L)

  /** The candidate construction over any (doc_id, fp_hash) frame —
    * factored so CurationSpec can drive the boilerplate-stop cap on a
    * synthetic heavy-hitter corpus (the fixture's max bucket is 9, so
    * the cap is latent there; at 100 TB it is the anti-quadratic
    * bound, and a bound needs a live test, not a comment). */
  private[graft] def winnowPairsOfFps(fp: DataFrame, cap: Long): DataFrame = {
    // Round-18 measured negative result: checkpointing the rare table
    // here (3 consumers) cut the plan 30 → 14 Exchanges but BENCHED
    // SLOWER (dedup_winnowing 0.93 → 1.31 s, dedup_eval_winnowing
    // 0.72 → 0.93 s) — the input fps table is already checkpointed, so
    // re-deriving rare is one cheap bounded join per consumer while the
    // eager materialization costs two extra jobs inside the timed
    // region. Left as the recompute; revisit only with cluster-scale
    // evidence.
    val rare = fp.join(
      fp.groupBy(col("fp_hash")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") <= cap).select(col("fp_hash")),
      Seq("fp_hash"))
    val nFps = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    rare.select(col("fp_hash"), col("doc_id").as("doc_a"))
      .join(rare.select(col("fp_hash"), col("doc_id").as("doc_b")), Seq("fp_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2L)
      .join(nFps.select(col("doc_id").as("doc_a"), col("n_fp").as("na")), Seq("doc_a"))
      .join(nFps.select(col("doc_id").as("doc_b"), col("n_fp").as("nb")), Seq("doc_b"))
  }

  private val dedupWinnowing: QFn = (s, d) =>
    winnowPairs(s, d)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast(DoubleType)
          / (col("na") + col("nb") - col("n_shared"))).as("fp_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Detector-quality eval for the winnowing detector — the same
    * scaffold as dedup_eval (minhash) and dedup_eval_simhash, closing
    * the symmetry: every detector family ships with its measured
    * precision/recall against the exact ≥0.8 3-gram-Jaccard truth on
    * the capped range. The expected shape is the guarantee made
    * visible: recall 1.0 (a ≥0.8-Jaccard pair shares long runs, and a
    * shared ≥6-token run FORCES shared fingerprints), precision below
    * it (winnowing also surfaces shorter shared runs — real overlap,
    * below the 0.8 truth bar). */
  private val dedupEvalWinnowing: QFn = (s, d) =>
    detectorEval(s, d, cap = 150L,
      winnowPairs(s, d).select(col("doc_a").as("da"), col("doc_b").as("db")))

  /** Train/val near-dup LEAKAGE audit — the evaluation-integrity number
    * behind Lee et al. 2021's dedup motivation, made a first-class QA
    * op: a validation doc with a near-duplicate in train is a leaked
    * answer, and a split drawn independently of content (the
    * split_train_val hash rule, reused bit-for-bit) leaks ~2·p·(1−p)
    * of every near-dup pair by construction — this rung MEASURES it
    * instead of assuming the split is clean. One pass over the
    * verified minhash pair graph (the shared cached artifact — no
    * detector work re-runs), each pair classified by its endpoints'
    * split sides; all-integer counts, leak rate in exact ppm (int64
    * DIV). At 100 TB the input is the pair graph, never the corpus:
    * the audit costs one |pairs|-row aggregate. */
  private val splitLeakageAudit: QFn = (s, d) => {
    def side(c: Column): Column =
      when(Sampling.hashBucket(c, 10) === 9L, lit("val")).otherwise(lit("train"))
    minhashPairsCached(s, d)
      .select(side(col("da")).as("sa"), side(col("db")).as("sb"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") === "train" && col("sb") === "train", 1L)
          .otherwise(0L)).as("n_train_train"),
        sum(when(col("sa") === "val" && col("sb") === "val", 1L)
          .otherwise(0L)).as("n_val_val"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_leaking"))
      .select(col("n_pairs"), col("n_train_train"), col("n_val_val"),
        col("n_leaking"),
        expr("CASE WHEN n_pairs > 0 THEN (n_leaking * 1000000) div n_pairs END")
          .as("leak_ppm"))
  }

  /** Cluster-aware train/val split — the FIX for what
    * split_leakage_audit measures: hash the near-dup CLUSTER label
    * instead of the doc id (singletons fall back to their own id,
    * which is their singleton label), so an entire near-dup cluster
    * lands on one side and no verified pair can straddle the split —
    * leakage is zero BY CONSTRUCTION on converged labels (fixture
    * convergence is law-certified; on arbitrary graphs run
    * labelPropUntilFixed first). Output is the audit row recomputed
    * under the cluster rule (n_leaking provably 0, LawsSpec) plus the
    * split sizes — the val share stays ~10% because cluster-count ≪
    * doc-count moves only the near-dup mass. Costs one broadcast-sized
    * join of the cached label table onto the corpus ids plus the
    * |pairs|-row audit — the corpus text is never touched. */
  private val splitClusterAware: QFn = (s, d) => {
    val labels = unionNodeLabels(s, d, "mh")
    def side(c: Column): Column =
      when(Sampling.hashBucket(c, 10) === 9L, lit("val")).otherwise(lit("train"))
    val docSide = Tables.documents(s, d).select(col("doc_id"))
      .join(labels.select(col("v").as("doc_id"), col("lab")), Seq("doc_id"), "left")
      .select(col("doc_id"), side(coalesce(col("lab"), col("doc_id"))).as("sp"))
    val sizes = docSide.agg(count(lit(1)).as("n_docs"),
      sum(when(col("sp") === "val", 1L).otherwise(0L)).as("n_val"))
    val pairSides = minhashPairsCached(s, d)
      .join(docSide.select(col("doc_id").as("da"), col("sp").as("sa")), Seq("da"))
      .join(docSide.select(col("doc_id").as("db"), col("sp").as("sb")), Seq("db"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_leaking"))
    sizes.crossJoin(pairSides)
      .select(col("n_docs"), (col("n_docs") - col("n_val")).as("n_train"),
        col("n_val"),
        expr("(n_val * 1000000) div n_docs").as("val_ppm"),
        col("n_pairs"), col("n_leaking"))
  }

  /** Persisted winnowing fingerprint index of the "already-ingested"
    * corpus slice (doc_id % 5 ≠ 0), hash-bucketed by fp_hash % 16 —
    * the layout an incremental ingest keeps between runs so each new
    * batch is screened against the corpus WITHOUT re-reading or
    * re-tokenizing corpus text, with the winnowing GUARANTEE the
    * minhash index can't give (a shared ≥6-token run cannot slip
    * past). Fingerprint-keyed like the minhash index; built once per
    * session+sf from the shared gram base. */
  private[graft] def ensureWinnowIndex(s: SparkSession, d: String): String =
    // ScratchParquet carries the construction-version salt (round-16
    // ADVICE item 2): the signature basis has already changed once
    // (distinct-on-gh, 2³¹ radix) — a warm scratch dir from an older
    // construction must rebuild, not be served. The fixture fingerprint
    // alone can't see code changes.
    ScratchParquet.ensureDir("wn_index", d,
        Tables.fingerprint(d, "documents")) { tmp =>
      winnowFromGrams(gramsCached(s, d).filter(col("doc_id") % 5 =!= 0))
        .select(col("doc_id"), col("fp_hash")).distinct()
        .withColumn("hb", (col("fp_hash") % 16L).cast("int"))
        .write.mode("overwrite").partitionBy("hb").parquet(s"$tmp/fps")
    }

  /** Incremental winnowing near-dup screen — dedup_incremental's
    * production-ingest shape with the guarantee-backed detector:
    * fingerprint the NEW batch (doc_id % 5 = 0, ~20%), equality-probe
    * the persisted corpus fingerprint index, emit (corpus doc, new
    * doc, shared count) candidates at the batch path's ≥2 bar (one
    * ≥6-token run forces one shared DISTINCT fingerprint; two runs
    * with distinct gram content — or one ≥ ~10-token run whose
    * disjoint selection windows hold ≥ 2 distinct 3-grams — force the
    * two the bar needs. Repetitive single-gram runs winnow to one
    * fingerprint at any length and stop at n_shared = 1; see the
    * GraftOps.winnowIncrementalCandidates scaladoc for the precise
    * statement — still the deterministic floor the banded index can't
    * give at any run length). The
    * boilerplate-stop cap runs on CORPUS frequency (what an ingest
    * knows without scanning the batch): hashes in >50 corpus docs are
    * dropped before the join — the anti-quadratic bound again. Cost
    * scales with the BATCH: the index read is a columnar scan of
    * 16-byte fingerprint rows, the probe is one equality shuffle on
    * fp_hash, and corpus text is never touched. The oracle mirrors
    * the fingerprint construction over the same split. */
  private val dedupWinnowingIncremental: QFn = (s, d) => {
    val path = ensureWinnowIndex(s, d)
    val idx = s.read.parquet(s"$path/fps")
      .select(col("doc_id").as("corpus_id"), col("fp_hash"))
    val rareIdx = idx.join(
      idx.groupBy(col("fp_hash")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") <= 50L).select(col("fp_hash")),
      Seq("fp_hash"))
    val delta = winnowFromGrams(gramsCached(s, d).filter(col("doc_id") % 5 === 0))
      .select(col("doc_id").as("new_id"), col("fp_hash")).distinct()
    rareIdx.join(delta, Seq("fp_hash"))
      .groupBy(col("corpus_id"), col("new_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2L)
      .orderBy(col("corpus_id"), col("new_id"))
  }

  /** Position-weighted rolling fingerprint over md5 token hashes:
    * fp = Σ (h(tok) mod M) · (pos+1)  mod M. Order-sensitive, portable. */
  private val textFingerprint: QFn = (s, d) => {
    val M = 1000003L
    tokens(s, d)
      .withColumn("hm", tokHash(col("tok")) % M)
      .groupBy(col("doc_id"))
      .agg((sum(col("hm") * (col("pos") + 1L)) % M).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Unigram log-probability scoring (the CCNet-style perplexity-filter
    * shape): token logprob under the corpus unigram model, mean per
    * document — low scorers are boilerplate/outlier documents. Scale
    * shape: the unigram table is vocabulary-sized (≪ corpus) and
    * broadcast to the token stream, so the only shuffles are the two
    * bounded aggregations (vocabulary, then per-doc). */
  private val textUnigramLogprob: QFn = (s, d) => {
    val t = tokens(s, d)
    // vocabulary-sized; checkpointed so the corpus total derives from
    // the |V|-row table (n = Σ tf, exact integers — identical result)
    // instead of a second scan+tokenize of the corpus
    val tf = t.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val n = tf.agg(sum(col("tf")).cast(DoubleType).as("n_tok"))
    t.join(broadcast(tf), "tok")
      .crossJoin(broadcast(n))
      .withColumn("lp", log(col("tf") / col("n_tok")))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lp")) / count(lit(1)), 6).as("mean_logprob"),
           count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model scoring — the stronger perplexity filter
    * next to [[textUnigramLogprob]]: mean ln P(w_i | w_{i-1}) per doc
    * under the corpus bigram model, P(w2|w1) = c(w1,w2)/c(w1·) with
    * c(w1·) = bigram-left occurrences (all observed, so no smoothing
    * term is needed for scoring the training corpus itself). Bigrams
    * are generated IN-ROW (transform over sequence — no token self-join
    * on position), the bigram and left-context tables are
    * vocabulary-sized and broadcast, so like the unigram model the only
    * shuffles are the bounded count aggregations. The size≥2 guard
    * keeps sequence() ascending (it DESCENDS when end < start). */
  private val textBigramLm: QFn = (s, d) => {
    // round-19: the tok_count kernel replaces the size(split(...)) ≥ 2
    // guard so the pushed-down filter stops evaluating a second split()
    // per row (the guard is value-identical, pinned in TextSigSpec).
    // A fuller restructure (group occurrences to per-(doc, bigram)
    // counts, checkpoint that, derive margins and probe from it) was
    // A/B-benched this round and REGRESSED 0.64 s → 1.08 s at sf0.1 —
    // the |doc·distinct-bigram| checkpoint materializes ~20× the bytes
    // of the |V²| margin table and its extra shuffle outweighs the
    // saved second tokenize. Reverted; recorded in OPTIMIZATION_r19.md.
    val bg = Tables.documents(s, d)
      .filter(graft.functions.GraftFunctions.tokCount(col("text")) >= 2L)
      .withColumn("toks", split(col("text"), " "))
      // round-18 opt: offsets-explode + top-level codegen projection
      // (the gramsOf device) instead of an interpreted struct lambda
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(col("doc_id"), expr("toks[i-1]").as("w1"), expr("toks[i]").as("w2"))
    // bigram-vocabulary-sized; checkpointed so the left-context margin
    // c1 derives from the |V²|-row table instead of re-running the
    // corpus bigram aggregation, and the broadcast reads it directly
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bg.join(broadcast(bc), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .withColumn("lp", log(col("c12") / col("c1")))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lp")) / count(lit(1)), 6).as("mean_bigram_lp"),
           count(lit(1)).as("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  /** Within-document repetition removal — the intra-doc half of dedup
    * (crawled pages repeat nav/boilerplate tokens; corpus-level dedup
    * never sees it): keep each token's FIRST occurrence, preserving
    * order. Pure in-row HOFs via the index lambda
    * (`array_position(toks, t) == i+1` ⟺ first occurrence), one codegen
    * stage, no shuffle — at 100 TB this runs inside the scan like
    * text_normalize. */
  private val textDedupInline: QFn = (s, d) =>
    // round-19 opt: the array_position lambda was an O(n²) interpreted
    // probe per token; the fused dedup_tokens kernel is one hashed pass
    // per row (value-identical, pinned in TextSigSpec + the unchanged
    // oracle). Same single-codegen-stage shape, drastically less
    // allocation.
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.dedupTokens(col("text")).as("p"))
      .select(col("doc_id"),
        col("p.n_tokens").as("n_tokens"),
        col("p.n_unique").as("n_unique"),
        col("p.dedup_text").as("dedup_text"))
      .orderBy(col("doc_id"))

  /** Dictionary scrub (the PII-redaction pipeline shape): replace
    * denylist tokens with a mask and count redactions. Token-level HOFs
    * — no regex, so no cross-dialect regex hazards (§7.4) — and the
    * whole row stays inside one codegen stage; at scale the denylist
    * would be a broadcast join against a scrub-term table (the
    * text_sentiment lexicon pattern) instead of an inline IN list. */
  private val textScrub: QFn = (s, d) => {
    val deny = Seq("fast", "slow", "dup", "value")
    Tables.documents(s, d).select(
      col("doc_id"),
      array_join(transform(split(col("text"), " "),
        t => when(t.isin(deny: _*), lit("[x]")).otherwise(t)), " ").as("scrubbed"),
      size(filter(split(col("text"), " "), t => t.isin(deny: _*)))
        .cast(LongType).as("n_redacted"),
    ).orderBy(col("doc_id"))
  }

  /** Sketch top-k terms: ONE merged count-min sketch over the token
    * stream (constant memory, map-side partials — the scale path where
    * the exact text_tokens groupBy would shuffle the full vocabulary),
    * then point estimates for the distinct terms read from the
    * broadcast sketch array in pure codegen (the md5-substring row
    * hashes make the probe SQL-expressible). Approximate (one-sided
    * overestimates) → no oracle; LawsSpec asserts est ≥ exact for every
    * term and partition-invariance of the merged sketch. */
  private val textTopkSketch: QFn = (s, d) => {
    graft.functions.CountMinAgg.ensureRegistered(s)
    import graft.functions.CountMinAgg.{DEPTH, WIDTH}
    val t = tokens(s, d)
    val sk = t.agg(expr("countmin(tok)").as("sk"))
    val est = (0 until DEPTH).map { i =>
      element_at(col("sk"),
        (lit(i.toLong * WIDTH) +
          conv(substring(md5(col("tok")), 1 + 8 * i, 8), 16, 10).cast(LongType) % WIDTH
          + 1L).cast("int"))
    }.reduce(least(_, _))
    t.select(col("tok")).distinct()
      .crossJoin(broadcast(sk))
      .withColumn("est_tf", est)
      .orderBy(col("est_tf").desc, col("tok"))
      .limit(20)
      .select(col("tok").as("term"), col("est_tf"))
  }

  /** Exact dedup on normalized text; survivor = min doc_id. Grouping on
    * the md5 digest of the normalized text (not the text itself) keeps
    * the shuffle rows fixed-width, and min/count aggregate map-side —
    * at 100 TB this moves digests, not documents, and never needs the
    * full per-group row set a window would (SURVEY.md §7.4: survivor
    * choice must be deterministic, hence min, not dropDuplicates). */
  private val dedupExact: QFn = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(regexp_replace(trim(lower(col("text"))), " +", " ")).as("nh"))
      .groupBy(col("nh"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** MinHash-LSH near-dup: distinct 3-token shingles → 16 portable
    * minhashes ((aᵢ·h+bᵢ) mod p over md5-derived h) → 8 bands of r=2 →
    * equality-bucket candidate pairs → exact-Jaccard verify ≥ 0.8.
    * The oracle MIRRORS the banding construction in SQL (identical
    * md5 minhashes, bands, candidate join), so parity holds by
    * construction — not empirically via banding's 1-(1-J²)⁸ ≈ 0.9997
    * recall at J≥0.8 (LawsSpec keeps the recall-vs-exact superset law;
    * a fixture pair banding misses would fail that test, not the
    * driver gate). */
  /** One persisted shingle set per (session, sf dir, fixture
    * fingerprint): repeated invocations of dedup_near_minhash in one
    * session (Verify → Bench → specs) reuse the same cached DataFrame
    * instead of registering a fresh never-unpersisted copy each time,
    * and the fingerprint key means a fixture regenerated mid-session
    * gets a fresh entry instead of stale shingles (the scratch-cache
    * policy). Entries live for the JVM — bounded by the handful of
    * (session, sf) combos a process ever sees. */
  private val shCache =
    new FingerprintCache

  /** Verified minhash near-dup pairs (da < db, unrounded jaccard ≥ 0.8)
    * — the shared pair graph consumed by both the pair-listing query
    * (dedup_near_minhash) and the connected-components clustering
    * (dedup_clusters). */
  private[graft] def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val P = 2147483647L
    // Distinct HASHED shingle set derived from the shared gram base
    // (round-15 advice: one tokenize+hash pass for all gram consumers).
    // Distinct-on-gh equals distinct-on-string modulo 48-bit collisions;
    // the oracle mirrors the same hash-first construction, so the two
    // engines share identical (negligible) collision behavior — and the
    // verify joins below now shuffle 8-byte digests instead of shingle
    // text, the shape the scaladoc always claimed for 100 TB.
    val sh = shCache.getOrElseUpdate(s, d, Tables.fingerprint(d, "documents"))(
      gramsCached(s, d)
      .select(col("doc_id"), col("gh"))
      .distinct()
      // the shingle set feeds signature building AND both verify joins —
      // persisted, the distinct runs once per evaluation instead of
      // three times (at 100 TB: checkpoint to the cluster store instead)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hashed = sh.withColumn("hm", col("gh") % P)
    // All 16 minhashes in ONE partial-aggregating groupBy (no 16× row
    // blow-up via a params crossJoin — that shape shuffles 16× the
    // shingle set and cannot survive 100 TB).
    val mins = (0 until 16).map { i =>
      min((col("hm") * (2L * i + 3L) + (7919L * i + 13L)) % P).as(s"mh$i")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = sig.select(col("doc_id"), explode(array((0 until 8).map { j =>
        struct(lit(j).as("band"), col(s"mh${2 * j}").as("s0"), col(s"mh${2 * j + 1}").as("s1"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.s0").as("s0"), col("b.s1").as("s1"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.s0") === col("y.s0") && col("x.s1") === col("y.s1") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    // Verify joins candidate pairs against the persisted shingle set —
    // the banding pipeline is never re-derived.
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("da"), col("gh")), "da")
      .join(sh.select(col("doc_id").as("db"), col("gh")), Seq("db", "gh"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
    inter
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("j", col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")))
      .filter(col("j") >= 0.8)
      .select(col("da"), col("db"), col("j"))
  }

  /** One persisted DataFrame per derived pair graph / edge list per
    * (session, sf dir, fixture fingerprint): the label-propagation loop
    * references the edge set once per unrolled iteration, and without
    * caching each reference would re-derive the whole minhash pipeline
    * (the round-1 reuse-pessimization lesson). Key suffixes: `#mhp`
    * minhash pairs, `#shp` simhash pairs, `#multi` = the tagged union
    * cluster edge list (the one [[multiLabelProp]] input). */
  private val pairCache =
    new FingerprintCache

  /** One CONVERGED label/cluster result per (session, sf dir, fixture
    * fingerprint) — the pairCache convention applied one level up. Each
    * clustering query (dedup_clusters / _all / _multimodal) used to
    * re-run its own 4-round unrolled label propagation over its (already
    * cached) edge graph on every evaluation, making the three of them
    * the suite's slowest steady-state queries — and even after per-query
    * memoization they were three separate propagation passes over graphs
    * that share most of their edges (~22 s combined at sf0.1). Round 15
    * consolidated them: ONE [[multiLabelProp]] pass over the tagged
    * union graph under key `#multi#lab`; per-slice cluster aggregates
    * under `#{mh,all,mm}#clusters`. The converged labels are
    * localCheckpoint()ed — materialized once AND lineage-truncated to a
    * LogicalRDD — because persist() alone is not enough: every sink
    * action wraps the DataFrame in a fresh QueryExecution, so the
    * 4-round unrolled tree was re-ANALYZED per evaluation, and for the
    * three-detector multimodal graph that driver-side planning cost
    * ~2 s/eval, dwarfing the actual cached read. After truncation each
    * evaluation plans a 4-node tree. (On a real cluster:
    * checkpoint(reliable) instead, the labelPropUntilFixed note.)
    * Labels are a pure function of the edge graph, so the cache shares
    * the graph's staleness key. */
  private val labelCache =
    new FingerprintCache

  /** Combined staleness key for everything derived from the tagged
    * union pair graph: the graph folds in the embedding-cosine detector,
    * so even the minhash-only label slice is rebuilt (identically) when
    * either fixture regenerates — cheap insurance over a stale slice. */
  private def unionFp(d: String): String =
    // "+" joiner: the composite lands in ScratchParquet dir and lock
    // file names, so it must stay free of "/" (the old joiner silently
    // nested the artifact dir) and of the "=" segment separator
    Tables.fingerprint(d, "documents") + "+" + Tables.fingerprint(d, "embeddings")

  /** The TAGGED cross-modal union pair graph: one symmetric, self-looped
    * edge list over minhash ∪ simhash ∪ embedding-cosine verified pairs,
    * each edge carrying `m` (in the minhash subgraph) and `a` (in the
    * minhash ∪ simhash subgraph; every edge is in the full union by
    * construction). A vertex's self-loop aggregates the memberships of
    * its incident edges (max over booleans), so a subgraph vertex always
    * keeps its own label for that subgraph during propagation. Built
    * from the SAME persisted per-detector pair graphs the pair-listing
    * queries read — no detector pipeline is re-derived here. */
  private[graft] def taggedUnionEdges(s: SparkSession, d: String): DataFrame = {
    val mh = minhashPairsCached(s, d).select(col("da"), col("db"),
      lit(true).as("m"), lit(true).as("a"))
    val sh = simhashPairsCached(s, d).select(col("da"), col("db"),
      lit(false).as("m"), lit(true).as("a"))
    val em = LlmVector.embcosPairsCached(s, d).select(col("ia").as("da"),
      col("ib").as("db"), lit(false).as("m"), lit(false).as("a"))
    val tagged = mh.union(sh).union(em)
    val sym = tagged.union(tagged.select(col("db").as("da"), col("da").as("db"),
      col("m"), col("a")))
    val loops = sym.groupBy(col("da"))
      .agg(max(col("m")).as("m"), max(col("a")).as("a"))
      .select(col("da"), col("da").as("db"), col("m"), col("a"))
    sym.union(loops)
      .groupBy(col("da"), col("db"))
      .agg(max(col("m")).as("m"), max(col("a")).as("a"))
      .select(col("da").as("src"), col("db").as("dst"), col("m"), col("a"))
  }

  /** ONE label propagation, THREE label columns — the round-15
    * consolidation of what used to be three separate 4-round label-prop
    * builds (minhash / minhash∪simhash / cross-modal union), measured
    * ~22 s of the sf0.1 build block combined. Each round is still one
    * equality join on dst + one aggregation shuffle on src over the
    * union graph, but the per-subgraph restriction rides inside the SAME
    * shuffle as a conditional aggregate: `min(when(m, lm))` propagates
    * minhash labels across minhash edges only, `min(when(a, la))` across
    * minhash ∪ simhash edges, `min(lu)` across everything. Exactness:
    * an `m`-edge has both endpoints in the minhash subgraph, a subgraph
    * vertex's self-loop carries `m = true`, and min ignores the nulls
    * produced by non-member groups — so `lm` restricted to non-null rows
    * is, round for round, the [[labelPropEdges]] recursion over the
    * minhash subgraph alone (LawsSpec certifies the agreement on the
    * live fixture graphs). Non-member vertices go null in round 1 and
    * stay null: null never enters a member's min because no `m`-edge
    * reaches one. At 100 TB this is the difference between one pass and
    * three over graphs that share most of their edges. */
  private[graft] def multiLabelProp(edges: DataFrame, iters: Int): DataFrame = {
    var lab = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lm"), col("v").as("la"), col("v").as("lu"))
    for (_ <- 1 to iters) {
      lab = edges
        .join(lab.select(col("v").as("dst"), col("lm"), col("la"), col("lu")), "dst")
        .groupBy(col("src"))
        .agg(min(when(col("m"), col("lm"))).as("lm"),
             min(when(col("a"), col("la"))).as("la"),
             min(col("lu")).as("lu"))
        .select(col("src").as("v"), col("lm"), col("la"), col("lu"))
    }
    lab
  }

  /** The one converged multi-label table per (session, sf, fixtures):
    * 4 unrolled [[multiLabelProp]] rounds over the cached tagged union
    * graph, localCheckpoint()ed (materialize + lineage-truncate — see
    * the labelCache note). Every dedup_clusters* rung and the survivor
    * policy query project their slice out of THIS table. */
  private def multiLabelsCached(s: SparkSession, d: String): DataFrame =
    labelCache.getOrElseUpdate(s, s"$d#multi#lab", unionFp(d))(
      // Round 17: converged labels are a ScratchParquet artifact. The
      // parquet read gives the SAME lineage truncation the old
      // localCheckpoint gave (a leaf scan node — each consumer plans a
      // 4-node tree), plus cross-JVM reuse: the 4-round propagation over
      // the union graph (15.9 s at sf0.1) runs once per fixture
      // generation, not once per process.
      ScratchParquet.ensure(s, "multilab", d, unionFp(d))(
        multiLabelProp(
          pairCache.getOrElseUpdate(s, s"$d#multi", unionFp(d))(
            taggedUnionEdges(s, d)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)),
          iters = 4))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Per-subgraph node labels, projected from the multi-label table:
    * `mh` = minhash graph (lm non-null), `all` = minhash ∪ simhash
    * (la non-null), `mm` = the full cross-modal union. Cheap select
    * over a checkpointed LogicalRDD — label prop itself never re-runs
    * per consumer. */
  private def unionNodeLabels(s: SparkSession, d: String, which: String): DataFrame = {
    val c = multiLabelsCached(s, d)
    which match {
      case "mh"  => c.filter(col("lm").isNotNull).select(col("v"), col("lm").as("lab"))
      case "all" => c.filter(col("la").isNotNull).select(col("v"), col("la").as("lab"))
      case _     => c.select(col("v"), col("lu").as("lab"))
    }
  }

  /** Survivor/size clusters for one subgraph slice, final aggregate
    * memoized per (session, sf, fixtures, slice). */
  private def unionClusters(s: SparkSession, d: String, which: String): DataFrame =
    labelCache.getOrElseUpdate(s, s"$d#$which#clusters", unionFp(d))(
      unionNodeLabels(s, d, which)
        .groupBy(col("lab").as("survivor"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("survivor")))

  /** Test hook (CacheSpec): live fingerprints for one pair-cache name. */
  private[graft] def pairCacheFingerprints(s: SparkSession, name: String): Set[String] =
    pairCache.fingerprintsFor(s, name)

  /** THE minhash pair graph — every consumer (pair listing, single- and
    * cross-source clustering) reads this one persisted lineage, so per
    * (session, sf, fingerprint) the banding + verify pipeline runs once,
    * not once per consumer. Round 17: the graph itself is a
    * [[ScratchParquet]] artifact — built once per (fixture fingerprint,
    * construction version) and re-read as a parquet scan by every later
    * JVM, the ensureWinnowIndex posture applied to the heaviest session
    * builds (6.6 s rebuilt vs a sub-100 ms warm read). */
  private[graft] def minhashPairsCached(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.fingerprint(d, "documents")
    pairCache.getOrElseUpdate(s, s"$d#mhp", fp)(
      ScratchParquet.ensure(s, "mhp_pairs", d, fp)(minhashPairs(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** THE simhash pair graph (see [[minhashPairsCached]]). */
  private[graft] def simhashPairsCached(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.fingerprint(d, "documents")
    pairCache.getOrElseUpdate(s, s"$d#shp", fp)(
      ScratchParquet.ensure(s, "shp_pairs", d, fp)(simhashPairs(s, d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private val dedupNearMinhash: QFn = (s, d) =>
    minhashPairsCached(s, d)
      .select(col("da"), col("db"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("da"), col("db"))

  /** Bounded min-label propagation: lab₀(v) = v; labₜ₊₁(v) =
    * min(labₜ(v), min over neighbors labₜ(u)). After `iters` rounds every
    * label has propagated `iters` hops, so components with diameter ≤
    * iters carry their minimum doc_id everywhere (LawsSpec certifies the
    * fixture converges: one extra round is a fixed point). All-integer
    * min is order-independent, so the oracle mirror is exact regardless
    * of join/aggregation order.
    *
    * Implementation note: the round is computed as a min over
    * self ∪ neighbors by adding a SELF-LOOP per vertex to the edge set —
    * identical labels to the least(own, neighbor-min) form the oracle
    * spells out, but the label table is referenced exactly ONCE per
    * round. Referencing it twice (once for `own`, once under the
    * neighbor join) doubles the unrolled lineage every iteration —
    * measured 12-25 s at sf0.1 from 2⁴ replicated subtrees; the
    * self-loop form is linear in `iters`. Scale shape: each round is one
    * equality join on dst + one aggregation shuffle on src (the standard
    * iterative connected-components recipe; at 100 TB — or whenever the
    * diameter isn't certified ≤ iters — use [[labelPropUntilFixed]],
    * which checkpoints per round and stops at the fixed point). */
  private[graft] def labelProp(sym: DataFrame, iters: Int): DataFrame =
    labelPropEdges(
      sym.union(sym.select(col("src"), col("src").as("dst")).distinct()), iters)

  /** [[labelProp]] over an edge list that ALREADY contains a self-loop
    * per vertex — callers that evaluate repeatedly cache this edge list
    * (one persisted DataFrame read per round, instead of re-deriving the
    * self-loop distinct from the pair list four times per evaluation).
    * round-19 measured NEGATIVE (do not re-try): broadcasting the label
    * side per round on the domain-bounded nation graph regressed
    * graph_components 0.65 s → 1.5–2.7 s — the label table is
    * LOOP-VARYING, so the hint forfeits the planner's reusable
    * edges-side broadcast for one blocking BroadcastExchange build per
    * round. The unhinted join (planner broadcasts the checkpointed
    * edge union once, reuses it every round) is the right shape. */
  private[graft] def labelPropEdges(edges: DataFrame, iters: Int): DataFrame = {
    var lab = edges.select(col("src").as("v")).distinct().withColumn("lab", col("v"))
    for (_ <- 1 to iters) {
      lab = edges
        .join(lab.select(col("v").as("dst"), col("lab").as("nlab")), "dst")
        .groupBy(col("src")).agg(min(col("nlab")).as("lab"))
        .select(col("src").as("v"), col("lab"))
    }
    lab
  }

  /** Convergence-guarded [[labelPropEdges]] — the 100 TB shape for
    * graphs whose diameter is NOT known to be ≤ 4: iterate min-label
    * rounds with a `localCheckpoint()` after each (truncating the
    * lineage, so the plan never unrolls and each round is exactly one
    * join + one aggregation regardless of round count), and stop when a
    * round changes zero labels — min-label propagation is monotone
    * non-increasing per vertex, so an unchanged round is THE fixed
    * point (true connected components), not a plateau. The change check
    * is one cheap count over the checkpointed old/new label join per
    * round. The oracled queries keep the unrolled 4-round form (their
    * fixture graphs are certified diameter ≤ 4 by LawsSpec, and the
    * unrolled form stays a single declarative plan); LawsSpec asserts
    * this variant agrees with it there. On a real cluster swap
    * localCheckpoint for checkpoint(reliable) so executor loss can't
    * lose rounds. */
  private[graft] def labelPropUntilFixed(edges: DataFrame, maxIters: Int = 64): DataFrame = {
    var lab = edges.select(col("src").as("v")).distinct()
      .withColumn("lab", col("v")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val next = edges
        .join(lab.select(col("v").as("dst"), col("lab").as("nlab")), "dst")
        .groupBy(col("src")).agg(min(col("nlab")).as("lab"))
        .select(col("src").as("v"), col("lab"))
        .localCheckpoint()
      changed = next.as("n")
        .join(lab.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.lab") =!= col("o.lab"))
        .count()
      lab = next
      it += 1
    }
    lab
  }

  /** Near-dup pairs → deduplicated corpus: connected components over the
    * verified minhash pair graph, one row per duplicate cluster with the
    * surviving doc (minimum member id) and the cluster size. This is the
    * output a training pipeline actually consumes — the transitive
    * closure the pair list alone doesn't give (A~B and B~C put A, C in
    * one cluster even when A~C itself fell below the threshold). The
    * minhash-only labels are the `lm` slice of the shared
    * [[multiLabelProp]] pass — no per-query propagation. */
  private val dedupClusters: QFn = (s, d) => unionClusters(s, d, "mh")

  /** Quality-aware survivor selection — the curation policy choice
    * dedup_clusters' min-id survivor sidesteps: inside each near-dup
    * cluster keep the HIGHEST-QUALITY member (longest in tokens, doc_id
    * tie-break), the common "keep the fullest version of the page"
    * rule. Reads the SAME minhash label slice of the shared multi-label
    * pass as dedup_clusters (zero extra detector cost), joins the |cluster
    * nodes|-row label table to per-doc token counts, and picks the
    * survivor with ONE min-struct aggregate ((-ntok, id) — no window).
    * `quality_differs` reports where the quality pick disagrees with
    * the naive min-id pick — the rows where the policy actually
    * matters. */
  private val dedupSurvivorQuality: QFn = (s, d) => {
    // the SAME node-label slice dedup_clusters aggregates (checkpointed
    // multi-label table — label prop never re-runs for this query)
    val labels = unionNodeLabels(s, d, "mh")
    val ntok = Tables.documents(s, d)
      .select(col("doc_id").as("v"),
        when(length(col("text")) >= 1, size(split(col("text"), " ")))
          .otherwise(0).cast(LongType).as("ntok"))
    labels.join(ntok, "v")
      .groupBy(col("lab").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("ntok")).as("nt"), col("v").as("id"))).as("f"))
      .select(col("cluster"), col("n_members"),
        col("f.id").as("survivor"), (-col("f.nt")).as("survivor_tokens"),
        (col("f.id") =!= col("cluster")).as("quality_differs"))
      .orderBy(col("cluster"))
  }

  /** SimHash near-dup: 60-bit signature from ±1 bit votes of md5 token
    * hashes (15 md5 hex chars — bit 60+ would overflow DuckDB's checked
    * `<<`); candidate pairs via 4×15-bit chunk buckets (pigeonhole: any
    * pair at hamming ≤ 3 differs in ≤3 chunks, so it agrees on ≥1 →
    * recall is exactly 1, and the all-pairs oracle is equal by
    * construction). All 60 vote sums are aggregate expressions in ONE
    * partial-aggregating groupBy — no per-bit crossJoin row blow-up —
    * and 15-bit chunk keys give 32768 buckets per chunk, so bucket
    * population stays sparse as the corpus grows (the round-1 8-bit/256
    * buckets degenerated O(n²/256) at scale). */
  /** Verified simhash near-dup pairs (da < db, hamming ≤ 3) — shared by
    * the pair-listing query (dedup_simhash) and the cross-source
    * clustering (dedup_clusters_all). */
  private[graft] def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val h = tokens(s, d).select(col("doc_id"),
      conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType).as("hv"))
    val votes = (0 until 60).map { b =>
      sum(shiftright(col("hv"), b).bitwiseAND(1L) * 2L - 1L).as(s"v$b")
    }
    // sum of distinct powers 2^0..2^59 ≤ 2^60-1: no overflow under ANSI
    val sig = h.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"v$b") > 0L, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("key", expr("shiftright(sig, chunk * 15)").bitwiseAND(32767L))
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("x.sig").as("sa"),
              col("y.doc_id").as("db"), col("y.sig").as("sb"))
      .distinct()
    cand.withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hamming") <= 3L)
      .select(col("da"), col("db"), col("hamming"))
  }

  private val dedupSimhash: QFn = (s, d) =>
    simhashPairsCached(s, d).orderBy(col("da"), col("db"))

  /** Cross-source clustering: connected components over the UNION of the
    * minhash and simhash verified pair graphs — two detectors with
    * different blind spots (token-shingle Jaccard vs bit-vote hamming)
    * feeding one duplicate-cluster map, the way a production dedup pass
    * composes its signals. The labels are the `la` slice (minhash ∪
    * simhash edges) of the shared [[multiLabelProp]] pass over the
    * tagged union graph, built from the SAME persisted pair graphs the
    * individual queries read — no detector pipeline is re-derived and
    * no separate propagation runs for this rung. */
  private val dedupClustersAll: QFn = (s, d) => unionClusters(s, d, "all")

  /** CROSS-MODAL near-dup clustering — closes the round-5 README gap
    * ("folding in embcos pairs needs a doc_id↔vec_id bridge choice"):
    * the bridge is the fixture's multimodal-join contract doc_id ==
    * vec_id, so the minhash (token), simhash (char), AND
    * embedding-cosine pair graphs union directly and the same 4-round
    * bounded min-label-prop runs over the combined graph. A cluster can
    * now form through ANY modality — two docs with no shingle overlap
    * but near-identical embeddings merge, and a text-near pair pulls in
    * its embedding-near neighbors transitively. All three detector
    * pipelines are the shared per-(session, sf, fingerprint) cached
    * pair graphs, and the labels are the unrestricted `lu` column of
    * the ONE shared [[multiLabelProp]] pass — this rung pays nothing
    * its siblings haven't already paid. */
  private val dedupClustersMultimodal: QFn = (s, d) => unionClusters(s, d, "mm")

  /** 16-minhash LSH bands (8 bands × r=2) over a (doc_id, gh) gram
    * frame — the [[minhashPairs]] signature construction (identical
    * constants) factored so it can run over a SUBSET of the shared
    * gram base: the incremental path signatures only the new batch,
    * never the corpus. */
  private def minhashBands(grams: DataFrame): DataFrame = {
    val P = 2147483647L
    val sh = grams.select(col("doc_id"), col("gh")).distinct()
    val hashed = sh.withColumn("hm", col("gh") % P)
    val mins = (0 until 16).map { i =>
      min((col("hm") * (2L * i + 3L) + (7919L * i + 13L)) % P).as(s"mh$i")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    sig.select(col("doc_id"), explode(array((0 until 8).map { j =>
        struct(lit(j).as("band"), col(s"mh${2 * j}").as("s0"), col(s"mh${2 * j + 1}").as("s1"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
              col("b.s0").as("s0"), col("b.s1").as("s1"))
  }

  /** Persisted banded minhash index of the "already-ingested" corpus
    * slice (doc_id % 5 ≠ 0), hive-partitioned by band — the layout an
    * incremental ingest keeps between runs so each new batch is deduped
    * against the corpus WITHOUT re-reading or re-shingling corpus text.
    * Fingerprint-keyed like the ANN index; built once per session+sf. */
  private[graft] def ensureMinhashIndex(s: SparkSession, d: String): String =
    // Construction-version salt via ScratchParquet — see
    // [[ensureWinnowIndex]].
    ScratchParquet.ensureDir("mh_index", d,
        Tables.fingerprint(d, "documents")) { tmp =>
      minhashBands(gramsCached(s, d).filter(col("doc_id") % 5 =!= 0))
        .write.mode("overwrite").partitionBy("band").parquet(s"$tmp/bands")
    }

  /** Incremental near-dup candidates: the production ingest shape —
    * signature the NEW batch (doc_id % 5 = 0, ~20%), equality-probe the
    * persisted corpus band index, emit (corpus doc, new doc) candidate
    * pairs. Cost scales with the BATCH, not the corpus: the index read
    * is a columnar scan of fixed-width signature rows, the probe is an
    * equality shuffle on (band, s0, s1), and corpus text is never
    * touched. Candidates feed the same verify stage the batch path runs
    * (dedup_near_minhash); the oracle mirrors the banding construction
    * over the same split, so parity holds by construction. */
  private val dedupIncremental: QFn = (s, d) => {
    val path = ensureMinhashIndex(s, d)
    val idx = s.read.parquet(s"$path/bands")
      .select(col("doc_id").as("corpus_id"), col("band"), col("s0"), col("s1"))
    val delta = minhashBands(
        gramsCached(s, d).filter(col("doc_id") % 5 === 0))
      .select(col("doc_id").as("new_id"), col("band"), col("s0"), col("s1"))
    idx.join(delta, Seq("band", "s0", "s1"))
      .select(col("corpus_id"), col("new_id")).distinct()
      .orderBy(col("corpus_id"), col("new_id"))
  }

  /** Exact character-5-gram Jaccard pairs ≥ 0.55 among the first 150
    * docs — the exact (capped) companion to the LSH paths. */
  private val dedupNgramJaccard: QFn = (s, d) => {
    val g = Tables.documents(s, d)
      .filter(col("doc_id") < 150L && length(col("text")) >= 5)
      // round-18 opt: offsets-explode + top-level codegen substring
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text) - 4)")).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 5)").as("s"))
      .distinct()
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = g.select(col("doc_id").as("da"), col("s")).as("x")
      .join(g.select(col("doc_id").as("db"), col("s")).as("y"), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
    inter
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("j", col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")))
      .filter(col("j") >= 0.55)
      .select(col("da"), col("db"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  /** Asymmetric n-gram CONTAINMENT pairs — the quote/subset-inclusion
    * detector Jaccard misses: C(a→b) = |A∩B| / |A| is high when doc a
    * is substantially contained in doc b even if b is much longer
    * (Jaccard divides by the union and dilutes). Same capped exact-
    * companion posture as dedup_ngram_jaccard (doc_id < 150); the
    * scale path remains the banded minhash index — containment is the
    * verify stage you run on LSH candidates when subset-duplication
    * matters (license boilerplate, embedded quotations). */
  private val dedupContainment: QFn = (s, d) => {
    val g = Tables.documents(s, d)
      .filter(col("doc_id") < 150L && length(col("text")) >= 5)
      // round-18 opt: offsets-explode + top-level codegen substring
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text) - 4)")).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 5)").as("sh"))
      .distinct()
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = g.select(col("doc_id").as("da"), col("sh")).as("x")
      .join(g.select(col("doc_id").as("db"), col("sh")).as("y"), Seq("sh"))
      .filter(col("da") =!= col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
    inter
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .withColumn("c", col("ni").cast(DoubleType) / col("na"))
      .filter(col("c") >= 0.8)
      .select(col("da"), col("db"), round(col("c"), 6).as("containment"))
      .orderBy(col("da"), col("db"))
  }

  /** Detector-quality evaluation — the measurement loop every dedup
    * deployment needs before trusting an LSH config at scale: the
    * emitted minhash pair set (banding + verify, the production path)
    * scored against exact all-pairs ≥0.8 word-3-gram Jaccard ground
    * truth on the capped range. Precision is 1 by construction (the
    * verify stage re-checks exact Jaccard); recall measures what the
    * 8-band/2-row banding misses — the number this query exists to
    * watch when retuning bands/rows. All counts are exact integers and
    * both ratios divide them, so the single output row is engine- and
    * partitioning-exact. */
  /** Score an emitted (da, db) pair set against exact all-pairs ≥ 0.8
    * word-3-gram Jaccard ground truth on the doc_id < cap range — the
    * shared scaffold of dedup_eval (minhash detector) and
    * dedup_eval_simhash (simhash detector). Returns ONE row:
    * n_emitted / n_truth / n_hit / precision / recall, all exact
    * integer counts and ratios of them. */
  private def detectorEval(s: SparkSession, d: String, cap: Long,
                           emittedPairs: DataFrame): DataFrame = {
    val emitted = emittedPairs
      .filter(col("da") < cap && col("db") < cap)
      .select(col("da"), col("db"), lit(1L).as("e"))
    val g = Tables.documents(s, d).filter(col("doc_id") < cap)
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 3)
      // round-18 opt: offsets-explode + top-level codegen projection
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(0, size(t) - 3)")).as("i"))
      .select(col("doc_id"), expr("concat_ws(' ', t[i], t[i+1], t[i+2])").as("s"))
      .distinct()
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = g.select(col("doc_id").as("da"), col("s"))
      .join(g.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")) >= 0.8)
      .select(col("da"), col("db"), lit(1L).as("t"))
    emitted.join(truth, Seq("da", "db"), "full")
      .agg(sum(coalesce(col("e"), lit(0L))).as("n_emitted"),
           sum(coalesce(col("t"), lit(0L))).as("n_truth"),
           sum(when(col("e").isNotNull && col("t").isNotNull, 1L).otherwise(0L))
             .as("n_hit"))
      .select(col("n_emitted"), col("n_truth"), col("n_hit"),
        // NULL when the detector emitted / truth holds nothing on the
        // capped range — DuckDB's x/0 is NULL, ANSI Spark's is an error
        when(col("n_emitted") > 0L,
          col("n_hit").cast(DoubleType) / col("n_emitted")).as("precision"),
        when(col("n_truth") > 0L,
          col("n_hit").cast(DoubleType) / col("n_truth")).as("recall"))
  }

  private val dedupEval: QFn = (s, d) =>
    detectorEval(s, d, cap = 150L, minhashPairsCached(s, d))

  /** LSH calibration curve — the S-curve behind every banding choice
    * made measurable: for EVERY pair on the capped exact range (not
    * just near-dups), the exact 3-token-shingle Jaccard bucketed into
    * deciles vs the fraction of that decile the 8-band × r=2 minhash
    * index emits as candidates. Theory says P(candidate | j) =
    * 1−(1−j²)⁸ — ~2% at j=0.1, ~50% at j=0.5, ~99.6% at j=0.8 — and
    * this rung is the measured curve an operator reads before moving
    * the banding (more bands → the curve shifts left → more
    * candidates to verify; fewer → near-dups slip through). The
    * element sets are UNIGRAM tokens, not the dedup pipeline's 3-token
    * shingles: P(candidate | j) depends only on j, never on what the
    * set elements are, and the fixture's unigram pairs populate every
    * decile (18/163/…/498/22 pairs across 0-10) where its 3-gram
    * Jaccard mass sits entirely in {0, 0.9+} and would measure two
    * points of the curve. Same capped posture as dedup_eval (the
    * all-pairs truth is the explicit quadratic guard); candidates that
    * share NO token (pure hash collisions) land in decile 0 via the
    * full outer join with j=0. decile 10 is the exact-set bucket
    * (j = 1.0). All counts integer; cand_rate is one exact-int
    * division. At 100 TB the same curve is measured on exactly this
    * kind of capped sample — the banding constants it tunes then apply
    * corpus-wide. */
  private val dedupLshCurve: QFn = (s, d) => {
    val P = 2147483647L
    val g = Tables.documents(s, d).filter(col("doc_id") < 150L)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("s"))
      .distinct()
      // shingle set feeds counts, the pair intersection (twice), and
      // the signature build — checkpoint so the explode runs once
      .localCheckpoint()
    val cnt = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = g.select(col("doc_id").as("da"), col("s"))
      .join(g.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("ni").cast(DoubleType) / (col("na") + col("nb") - col("ni")))
          .as("j"))
    val hashed = g.withColumn("hm", tokHash(col("s")) % P)
    val mins = (0 until 16).map { i =>
      min((col("hm") * (2L * i + 3L) + (7919L * i + 13L)) % P).as(s"mh$i")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = sig.select(col("doc_id"), explode(array((0 until 8).map { j =>
        struct(lit(j).as("band"), col(s"mh${2 * j}").as("s0"),
          col(s"mh${2 * j + 1}").as("s1"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.s0").as("s0"), col("b.s1").as("s1"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.s0") === col("y.s0") &&
          col("x.s1") === col("y.s1") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
      .withColumn("c", lit(1L))
    truth.join(cand, Seq("da", "db"), "full")
      .select(floor(coalesce(col("j"), lit(0.0)) * 10.0).cast(LongType)
          .as("decile"),
        coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("c")).as("n_cand"))
      .select(col("decile"), col("n_pairs"), col("n_cand"),
        round(col("n_cand").cast(DoubleType) / col("n_pairs"), 6)
          .as("cand_rate"))
      .orderBy(col("decile"))
  }

  /** The symmetric simhash detector-quality rung (round-6 verdict item
    * 6): the emitted hamming ≤ 3 simhash pair set scored against the
    * SAME exact-Jaccard ≥ 0.8 ground truth dedup_eval uses. Unlike
    * minhash (whose verify stage re-checks exact Jaccard, pinning
    * precision at 1), simhash emits on bit-vote distance alone — so
    * BOTH its precision (vote-collisions between genuinely different
    * docs) and recall (near-dup pairs whose votes drift > 3 bits) are
    * live measurements, which is exactly why the rung exists. The cap
    * is 450 (vs dedup_eval's 150) because vote-drift pairs are rarer
    * than banding pairs — a 150-doc slice of the sf0.01 fixture holds
    * zero simhash pairs, which would measure nothing. */
  private val dedupEvalSimhash: QFn = (s, d) =>
    detectorEval(s, d, cap = 450L, simhashPairsCached(s, d))

  /** Compression-ratio quality signal — the classic "gzip filter"
    * (Gopher/CCNet lineage): highly repetitive or boilerplate text
    * compresses far below natural prose, so deflated_size/raw_size is
    * a cheap template detector. Deflate runs in mapPartitions (the
    * multimodal decode-stub plumbing — per-row bounded, no UDF in a
    * Column path); DEFLATE with fixed level is deterministic for a
    * given input, but no SQL engine exposes it, so this is a
    * no-oracle query: LawsSpec asserts the signal's semantics (ratios
    * in (0, ~1], and the corpus's most repetitive tail compresses
    * better than its most diverse tail by TTR). */
  private val textCompressRatio: QFn = (s, d) => {
    val sp = s
    import sp.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          defl.reset(); defl.setInput(in); defl.finish()
          var out = 0
          while (!defl.finished()) out += defl.deflate(buf)
          (id, in.length.toLong, out.toLong,
            math.floor(out.toDouble / in.length * 1e6 + 0.5).toLong / 1e6)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflated", "ratio")
      .orderBy(col("doc_id"))
  }

  /** Type-token ratio per document — the lexical-diversity quality
    * signal (low TTR = repetitive/template text; complements
    * text_quality's stopword ratio and text_dedup_inline's repetition
    * removal). Exact integer counts, one codegen stage, no shuffle
    * beyond the final sort. */
  /** Per-doc character-entropy screen — the gibberish / binary-junk
    * gate next to [[textCompressRatio]] (deflate is the stronger signal
    * but not SQL-expressible, so it is law-tested only; THIS rung is
    * the exact, fully-oracled counterpart a pipeline can gate on with
    * cross-engine agreement): Shannon entropy in nats over the doc's
    * character distribution. Repetitive boilerplate scores LOW,
    * uniform-random junk scores near ln|alphabet| — production screens
    * gate both tails. Bit-exact recipe: each −p·ln p term is
    * pico-quantized (the js_divergence idiom: p is an exact-count
    * fraction, identical doubles in both engines) so the per-doc total
    * is an exact integer sum, and the low-entropy flag compares the
    * INTEGER total against the 2-nat threshold — no rounded-double
    * boundary anywhere in the gate. Shapes: one per-(doc, char)
    * map-side-combining count (≤|alphabet| rows per doc), one per-doc
    * fold — token-sized work never shuffles raw text. */
  private val textCharEntropy: QFn = (s, d) => {
    val cnt = Tables.documents(s, d)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("k"))
      // bounded |docs|·|alphabet| table, checkpointed: it feeds both the
      // per-doc totals and the term sum — without this the char explode
      // (the only corpus-sized stage) runs once per consumer
      .localCheckpoint()
    val n = cnt.groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n"), count(lit(1)).as("n_uniq"))
    cnt.join(n, "doc_id")
      .withColumn("p", col("k").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("term",
        floor(-(col("p") * log(col("p"))) * 1e12 + 0.5).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars"), max(col("n_uniq")).as("n_uniq"),
           sum(col("term")).as("ent_pico"))
      .select(col("doc_id"), col("n_chars"), col("n_uniq"),
        (round(col("ent_pico").cast(DoubleType) / 1e12, 6) + lit(0.0))
          .as("entropy"),
        (col("ent_pico") < 2000000000000L).as("low_entropy"))
      .orderBy(col("doc_id"))
  }

  private val textTtr: QFn = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast(LongType).as("n_types"))
      .withColumn("ttr",
        round(col("n_types").cast(DoubleType) / col("n_tokens"), 6))
      .orderBy(col("doc_id"))

  /** Jensen–Shannon divergence between per-source token distributions —
    * the corpus-drift detector (is source B's language shifting away
    * from source A's? should the mix rebalance?). Probabilities are
    * exact-count fractions (identical doubles); each KL term
    * p·ln(p/m) is quantized to integer PICO-units (floor(t·1e12+0.5),
    * identical IEEE) before the vocabulary-wide sum, because a raw
    * double sum over thousands of tokens is shuffle-order-sensitive —
    * the micro-credit recipe at higher precision (quantization error
    * ≤ vocab·5e-13, invisible at the 6-dp output). Term shuffles are
    * token-keyed counts; the pair enumeration is |sources|², not data. */
  private val textJsDivergence: QFn = (s, d) => {
    val tk = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val cnt = tk.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val dist = cnt.join(tot, "source")
      .select(col("source"), col("tok"), (col("c").cast(DoubleType) / col("n")).as("p"))
    val srcs = dist.select(col("source")).distinct()
    val prs = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    val ja = prs.join(dist.select(col("source").as("sa"), col("tok"), col("p").as("pa")), Seq("sa"))
    val jb = prs.join(dist.select(col("source").as("sb"), col("tok"), col("p").as("pb")), Seq("sb"))
    ja.join(jb, Seq("sa", "sb", "tok"), "full")
      .select(col("sa"), col("sb"),
        coalesce(col("pa"), lit(0.0)).as("pa"), coalesce(col("pb"), lit(0.0)).as("pb"))
      .withColumn("m", (col("pa") + col("pb")) / 2.0)
      .withColumn("ta", when(col("pa") > 0.0,
        floor(col("pa") * log(col("pa") / col("m")) * 1e12 + 0.5).cast(LongType))
        .otherwise(0L))
      .withColumn("tb", when(col("pb") > 0.0,
        floor(col("pb") * log(col("pb") / col("m")) * 1e12 + 0.5).cast(LongType))
        .otherwise(0L))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(when(col("pa") > 0.0 && col("pb") > 0.0, 1L).otherwise(0L)).as("n_common"),
           (round((sum(col("ta")) + sum(col("tb"))).cast(DoubleType) / 2e12, 6)
             + lit(0.0)).as("js"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Corpus-level collocation mining: top adjacent-bigram PMI — the
    * phrase-detection pass (new-york, machine-learning) run before
    * tokenizer training. Generator-chain shape (the multimodal_phash /
    * embed_pca lesson): posexplode + lead, never per-row HOFs.
    * Counts are word-keyed map-side-combining aggregations; the 1-row
    * corpus totals ride broadcast nested-loop joins (the bounded-
    * broadcast pattern). RANKING is by the exact rational
    * (n_ab·N²)/(Np·n_a·n_b) — integer-valued products ≤ ~1e14
    * represented exactly in double, so the DESC order and therefore
    * the top-20 cutoff are bit-identical on both engines; ln() touches
    * only the reported pmi, post-round. */
  private val textCollocations: QFn = (s, d) => {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val nTot = toks.agg(count(lit(1)).as("nn"))
    val pairs = toks
      .withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .groupBy(col("w").as("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val npTot = pairs.agg(sum(col("n_ab")).as("np"))
    pairs.filter(col("n_ab") >= 3L)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(npTot))
      .withColumn("score",
        (col("n_ab") * col("nn") * col("nn")).cast("double")
          / (col("np") * col("n_a") * col("n_b")).cast("double"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(20)
      .select(col("w1"), col("w2"), col("n_ab"),
        (round(log(col("score")), 6) + lit(0.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
  }

  /** Gopher-style repetition screen: per-doc fraction of bigram mass
    * held by the single most frequent bigram, and fraction of trigram
    * occurrences belonging to a repeated trigram — the two cheapest
    * repetition signals a pretraining filter runs (boilerplate and
    * looping-generator text score high on both). The keep gate uses
    * the published-style thresholds (top-2gram ≤ 0.18, dup-3gram
    * ≤ 0.30). Per-row bounded HOF n-gram generation feeds two
    * (doc_id, gram)-keyed map-side-combining counts; ratios divide
    * exact integers so the doubles (and the keep booleans) are
    * bit-identical cross-engine. Corpus-bytes-linear; no pairwise
    * anything — the 100 TB shape. */
  private val textRepetition: QFn = (s, d) => {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val big = t.select(col("doc_id"), col("t"),
        explode(expr("sequence(0, size(t) - 2)")).as("i"))
      .select(col("doc_id"), expr("concat(t[i], ' ', t[i+1])").as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((max(col("n")).cast(DoubleType) / sum(col("n"))).as("tb"))
    val tri = t.select(col("doc_id"), col("t"),
        explode(expr("sequence(0, size(t) - 3)")).as("i"))
      .select(col("doc_id"), expr("concat(t[i], ' ', t[i+1], ' ', t[i+2])").as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((sum(when(col("n") > 1L, col("n")).otherwise(0L)).cast(DoubleType)
              / sum(col("n"))).as("dt"))
    big.join(tri, "doc_id")
      .select(col("doc_id"),
        (round(col("tb"), 6) + lit(0.0)).as("top_bigram_frac"),
        (round(col("dt"), 6) + lit(0.0)).as("dup_trigram_frac"),
        (col("tb") <= 0.18 && col("dt") <= 0.30).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Overlapping fixed-window chunking (width 64 chars, stride 48) —
    * the RAG/embedding-prep splitter: every doc becomes
    * ⌈len/stride⌉ windows, consecutive windows sharing a 16-char
    * overlap so no boundary-spanning phrase is lost. Pure generator +
    * substring per row (one output row per window, never a per-char
    * intermediate — the multimodal_audio_rms per-frame lesson);
    * corpus-bytes-linear with ~1.33× write amplification, trivially
    * partition-parallel at 100 TB. */
  private val textChunk: QFn = (s, d) => {
    val t = Tables.documents(s, d).filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, (length(text)-1) div 48)")).as("i"))
    t.select(col("doc_id"), col("i").cast(LongType).as("chunk_id"),
        expr("substring(text, i*48 + 1, 64)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast(LongType))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Quality eval for the langid heuristic against the corpus's true
    * `lang` labels — the confusion matrix + per-true-class recall
    * share a detector deployment reports before trusting the filter
    * (dedup_eval's posture applied to language ID). Both the
    * prediction and the eval are one aggregation pass each; the
    * matrix is ≤ |langs|² rows. */
  private val textLangidEval: QFn = (s, d) => {
    val pred = tokens(s, d)
      .groupBy(col("doc_id"), col("lang"))
      .agg((sum(when(col("tok") === "the", 1L).otherwise(0L)).cast(DoubleType) /
            count(lit(1))).as("the_ratio"))
      .select(col("lang"),
        when(col("the_ratio") > 0.0, "en").otherwise("unk").as("pred_lang"))
    val cm = pred.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    val tot = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    cm.join(tot, "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        (round(col("n").cast(DoubleType) / col("n_true"), 6) + lit(0.0)).as("frac_of_true"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Greedy left-to-right single-pair merge over a token array — BPE's
    * apply step. Two spellings, chosen per pair at plan-build time:
    * for x ≠ y matches CANNOT overlap (a match consumes (i, i+1); the
    * next candidate at i+1 would need a[i+1] = x, but a[i+1] = y), so
    * greedy == "merge every (x, y) adjacency" and the O(n) vectorized
    * transform+filter is exact — and ~3× cheaper than a fold (it was
    * the BPE trainer's dominant per-step cost). Only the x == y case
    * (overlapping runs `x x x`, where greedy takes positions 0-1 then
    * leaves 2) needs the sequential O(n²-copy) HOF fold (1-based
    * element_at; acc.i = next unconsumed position). LawsSpec's
    * train==apply replay and the DedupProps-style planted-phrase law
    * cover both branches (the fixture trains an x==y merge at step 4). */
  private[graft] def bpeMergeExpr(x: String, y: String): Column = {
    // Column-API HOFs with lit() operands — tokens never pass through
    // SQL text, so backslashes / quotes / the '▁' marker in a corpus
    // token cannot malform or misparse the expression (round-11
    // advice; the prior spelling interpolated into expr() and escaped
    // only single quotes). The merged token x▁y is a Scala-side
    // literal; a LITERAL corpus token equal to it still collides by
    // representation — inherent to marker-joined BPE vocab, not to
    // this spelling.
    val tk = col("tk")
    val m = lit(x + "▁" + y)
    // size < 2 guard on BOTH branches: sequence(1, 0) on an empty
    // array is the DESCENDING [1, 0] and element_at would fault
    // (round-11 advice: the fold branch lacked it; unreachable via
    // split() but the private[graft] helper accepts arbitrary arrays);
    // a 0/1-token array can hold no pair, so it passes through
    val guard = size(tk) < 2
    if (x != y) when(guard, tk).otherwise(
      filter(
        transform(sequence(lit(1), size(tk)), j =>
          when(element_at(tk, j) === lit(x) && j < size(tk) &&
               element_at(tk, j + 1) === lit(y), m)
          .when(element_at(tk, j) === lit(y) && j > 1 &&
                element_at(tk, j - 1) === lit(x), lit(null).cast(StringType))
          .otherwise(element_at(tk, j))),
        v => v.isNotNull))
    else when(guard, tk).otherwise(
      aggregate(
        sequence(lit(1), size(tk)),
        struct(typedLit(Seq.empty[String]).as("out"), lit(1).as("i")),
        (acc, j) =>
          when(j =!= acc("i") || acc("i") > size(tk), acc)
          .when(acc("i") < size(tk) && element_at(tk, acc("i")) === lit(x) &&
                element_at(tk, acc("i") + 1) === lit(y),
            struct(concat(acc("out"), array(m)).as("out"),
                   (acc("i") + 2).as("i")))
          .otherwise(
            struct(concat(acc("out"), array(element_at(tk, acc("i")))).as("out"),
                   (acc("i") + 1).as("i"))),
        acc => acc("out")))
  }

  /** BPE merge TRAINING over the corpus token stream — the tokenizer-
    * construction operator an LLM-data engine owes its users
    * (Sennrich et al. 2016; SentencePiece's unigram/BPE trainers run
    * exactly this loop at corpus scale). Character-level BPE on this
    * fixture would collapse to a ~30-row word-frequency table, so the
    * honest at-scale spelling is TOKEN-level merges (phrase BPE — the
    * SentencePiece posture applied above whitespace): 6 iterations of
    * [count adjacent pairs corpus-wide via ONE map-side-combining
    * groupBy → argmax pair (count desc, then lexicographic — fully
    * tie-broken) → greedy left-to-right merge applied as a pure HOF
    * fold per doc]. The learned merge list is the MODEL — vocabulary-
    * sized metadata the driver holds by definition (the k-means
    * centroid posture); each iteration's corpus is localCheckpointed
    * so lineage stays flat and the next count scans materialized
    * arrays, not a growing expression tree. Output: one row per merge
    * step (rank, x, y, pair_count at selection time, corpus token
    * total after applying it) — strictly decreasing totals, every
    * count ≥ 1. NO ORACLE by design (iterative corpus-wide argmax —
    * the same reason sim_kmeans is no-oracle); LawsSpec asserts the
    * training invariants, a planted-phrase selection property, and
    * train/apply consistency via [[bpeMergeExpr]]. 100 TB: each step
    * is one bigram count shuffle + one broadcast-scalar map — linear
    * scans, no pair blow-up, model stays KB-sized. */
  /** The training loop over any (doc_id, tk: array<string>) corpus;
    * returns the merge rows and the final merged corpus so LawsSpec
    * can assert train/apply consistency and planted-phrase selection
    * on synthetic inputs. */
  /** One training step's corpus-wide adjacent-pair count — the plan
    * that must stay a two-phase (map-side-combining) hash aggregate
    * at 100 TB; PlanSpec pins `partial_count` in its physical plan.
    * Docs below 2 tokens carry no pair — filtered HERE only (they
    * stay in the corpus and in the token totals). Without the guard
    * sequence(1, size-1) on a 1-token doc is the DESCENDING [1, 0]
    * and element_at(tk, 0) kills the job; merges can shrink a doc
    * under 2 tokens mid-training, so this is live, not theoretical. */
  private[graft] def bpePairCounts(cur: DataFrame): DataFrame = cur
    .filter(size(col("tk")) >= 2)
    // round-18 opt: offsets-explode + top-level codegen element_at
    // (the gramsOf device) instead of an interpreted struct lambda
    .select(col("tk"), explode(expr("sequence(1, size(tk) - 1)")).as("i"))
    .groupBy(expr("element_at(tk, i)").as("x"),
             expr("element_at(tk, i + 1)").as("y"))
    .agg(count(lit(1)).as("n"))

  private[graft] def bpeTrain(docs0: DataFrame, steps: Int)
      : (Seq[(Long, String, String, Long, Long)], DataFrame) = {
    var cur = docs0.localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    for (step <- 1 to steps) {
      val topOpt = bpePairCounts(cur)
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1).collect().headOption
      // merges can exhaust every adjacent pair before `steps` runs out
      // (round-11 review: a corpus of lone 2-token docs empties after
      // one merge) — stop early with the merges found, never crash
      if (topOpt.isEmpty) return (rows.toSeq, cur)
      val top = topOpt.get
      val (x, y, n) = (top.getString(0), top.getString(1), top.getLong(2))
      // localCheckpoint is EAGER: the successor is fully materialized
      // when it returns, so the predecessor's blocks can be dropped
      // immediately (round-11 judge: without this a real merge budget
      // — 10k+ steps — holds steps+1 corpus copies and OOMs; the
      // GraftOps dedup pair graph uses the same release pattern)
      val prev = cur
      cur = cur.select(col("doc_id"), bpeMergeExpr(x, y).as("tk")).localCheckpoint()
      prev.unpersist()
      val total = cur.agg(sum(size(col("tk")))).collect()(0).getLong(0)
      rows += ((step.toLong, x, y, n, total))
    }
    (rows.toSeq, cur)
  }

  /** Session-lifetime memo of the trained merge list per (session,
    * fixture fingerprint) — the model is driver-held KB-sized metadata
    * (the k-means centroid posture), so train ONCE per fixture and let
    * both the declared training rung (text_bpe) and the encode rung
    * (text_bpe_apply) read the same fit; retraining per consumer would
    * double the one iterative-trainer cost in the bench. The final
    * corpus checkpoint is released immediately — only the collected
    * merge rows outlive training. */
  private val bpeFitCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String),
      Seq[(Long, String, String, Long, Long)]]()
  private[graft] def bpeFit(s: SparkSession, d: String)
      : Seq[(Long, String, String, Long, Long)] = {
    val fp = Tables.fingerprint(d, "documents")
    // the FingerprintCache round-9 eviction policy, replicated for this
    // driver-held (non-DataFrame) memo: a changed fingerprint drops the
    // superseded fit for the SAME fixture dir (the name slot) instead of
    // accumulating one entry per regeneration — and only that slot, so
    // alternating scale factors in one session never thrash each other
    bpeFitCache.keysIterator
      .filter(k => k._1 == s && k._2 == d && k._3 != fp)
      .foreach(bpeFitCache.remove)
    bpeFitCache.getOrElseUpdate((s, d, fp), {
      val (rows, fin) = bpeTrain(
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("tk")), 6)
      fin.unpersist()
      rows
    })
  }

  /** Test hook (CacheSpec): live fit fingerprints for one fixture dir. */
  private[graft] def bpeFitFingerprints(s: SparkSession, d: String): Set[String] =
    bpeFitCache.keysIterator.collect { case (`s`, `d`, fp) => fp }.toSet

  private val textBpe: QFn = (s, d) => {
    val rows = bpeFit(s, d)
    val sp = s
    import sp.implicits._
    rows.toDF("step", "merge_x", "merge_y", "pair_count", "tokens_after")
      .orderBy(col("step"))
  }

  /** BPE ENCODE — the trained merge list replayed over the corpus, the
    * half a pipeline actually runs per-document at 100 TB (train once,
    * encode everywhere). Unlike training (iterative corpus-wide argmax
    * → no oracle), applying a FIXED merge list is a pure row function:
    * 6 chained [[bpeMergeExpr]] HOF passes — one corpus scan, ZERO
    * data shuffles (the output orderBy is fixture presentation). Emits
    * per-doc tokens_before / tokens_after, the compression ratio in
    * exact parts-per-million via INTEGER division (a rounded double
    * ratio like 129/128 sits exactly on a 6-dp half boundary and
    * Spark HALF_UP vs DuckDB half-even would split — the §7.4
    * floor-don't-round recipe), and a 48-bit md5 fingerprint of the
    * final token stream so the oracle pins the exact encoded CONTENT,
    * not just counts. Oracle: the 6 training steps unrolled as CTEs —
    * per step, pair-count → fully-tie-broken argmax → greedy merge via
    * the window construction (candidate positions, consecutive-j
    * chains, keep even offsets) that DedupProps-equivalently realizes
    * greedy left-to-right pairing for BOTH the non-overlapping x≠y
    * case and the overlapping x==y run case. */
  private val textBpeApply: QFn = (s, d) => {
    val merges = bpeFit(s, d).map { case (_, x, y, _, _) => (x, y) }
    // the oracle unrolls EXACTLY 6 training steps as CTEs and its final
    // CTE chain goes empty if any step finds no pair — a corpus that
    // exhausts its adjacent pairs early must fail loudly here, not
    // diverge silently from the oracle (the events_ab_test n=1 posture)
    require(merges.length == 6,
      s"text_bpe_apply: corpus sustained ${merges.length} BPE merges; " +
        "the declared rung and its oracle assume 6 (re-pick the step " +
        "count for this fixture)")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("tokens_before", size(col("tk")).cast(LongType))
    // round-18 opt: ONE fused codegen pass applies all 6 trained
    // merges in order (graft.functions.BpeMergeAll) instead of 6
    // chained interpreted HOF passes — each step is the greedy
    // left-to-right merge DedupProps proves equal to bpeMergeExpr's
    // both branches, and LawsSpec pins the full-chain equality on the
    // real corpus merges. Pairs enter as Column literals (never SQL
    // text — the round-11 quoting rule); call_function resolves
    // through the registry without parsing.
    graft.functions.GraftFunctions.ensureRegistered(s)
    val pairsCol = array(merges.map { case (x, y) =>
      array(lit(x), lit(y)) }: _*)
    val enc = base.withColumn("tk",
      call_function("bpe_merge_all", col("tk"), pairsCol))
    enc
      .withColumn("tokens_after", size(col("tk")).cast(LongType))
      .select(col("doc_id"), col("tokens_before"), col("tokens_after"),
        expr("(tokens_before * 1000000) div tokens_after").as("compression_ppm"),
        conv(substring(md5(array_join(col("tk"), " ")), 1, 12), 16, 10)
          .cast(LongType).as("final_fp"))
      .orderBy(col("doc_id"))
  }

  /** Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — THE distributed-LM
    * scoring recipe: no discounting, no normalization, just relative
    * frequencies with a fixed 0.4 backoff factor, chosen because it
    * needs exactly the count tables a MapReduce/Spark pipeline already
    * builds). The LM-quality gate text_unigram_logprob/text_bigram_lm
    * start — completed with the production backoff chain:
    *
    *   S(w3|w1,w2) = c(w1w2w3)/c(w1w2)            if the trigram is seen
    *               = 0.4 · c(w2w3)/c(w2)          else if the bigram is
    *               = 0.4² · (c(w3) or 1)/N        else (add-floor unigram)
    *
    * Counts come from a held-out split (even doc_ids train, everyone is
    * scored) so the backoff paths actually fire — scoring the training
    * corpus against itself never backs off. All lower-order counts
    * derive from the ONE trigram aggregation (c12 = Σ_w3 c123 etc.), so
    * the corpus is scanned once for counting; that also guarantees
    * seen-trigram ⟹ seen-context structurally (no divide-by-zero arm).
    * Determinism: each ln(S) term is quantized to integer NANOS
    * (floor(x·1e9 + 0.5)) and summed as int64 — the text_js_divergence
    * recipe; S itself is a fixed-shape double expression over integer
    * counts, identical IEEE on both engines. Scale: the LOWER-order
    * count tables (c12/c23/c2/c3) are vocab²-bounded and carry explicit
    * broadcast hints; the trigram table c123 is corpus-derived —
    * bounded only by observed trigram TYPES, which tracks corpus size
    * for diverse text — so it is deliberately UNHINTED (round-13 advice
    * fix): AQE broadcasts it while it's small and falls back to an
    * equality-shuffle join when it isn't, instead of a forced driver
    * collect that OOMs at diverse-text scale. The corpus is touched by
    * exactly two linear passes (count + score). */
  private val textStupidBackoff: QFn = (s, d) => {
    val tg = Tables.documents(s, d)
      // round-19: tok_count guard (value-identical, pinned) — the pushed
      // size(split(...)) filter evaluated a second split per row
      .filter(graft.functions.GraftFunctions.tokCount(col("text")) >= 3L)
      .withColumn("toks", split(col("text"), " "))
      // round-18 opt: offsets-explode + top-level codegen projection
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(2, size(toks) - 1)")).as("i"))
      .select(col("doc_id"), expr("toks[i-2]").as("w1"),
        expr("toks[i-1]").as("w2"), expr("toks[i]").as("w3"))
    // one corpus-count aggregation, checkpointed: every lower order is
    // a |V³|-bounded re-aggregation of this table (the bigram_lm idiom)
    val c123 = tg.filter(col("doc_id") % 2 === 0)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val c12 = c123.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("c12"))
    val c23 = c123.groupBy(col("w2"), col("w3")).agg(sum(col("c123")).as("c23"))
    val c2 = c123.groupBy(col("w2")).agg(sum(col("c123")).as("c2"))
    val c3 = c123.groupBy(col("w3")).agg(sum(col("c123")).as("c3"))
    val nn = c123.agg(sum(col("c123")).as("n"))
    tg.join(c123, Seq("w1", "w2", "w3"), "left")
      .join(broadcast(c12), Seq("w1", "w2"), "left")
      .join(broadcast(c23), Seq("w2", "w3"), "left")
      .join(broadcast(c2), Seq("w2"), "left")
      .join(broadcast(c3), Seq("w3"), "left")
      .crossJoin(broadcast(nn))
      .select(col("doc_id"),
        when(col("c123").isNotNull, 1L).otherwise(0L).as("hit3"),
        when(col("c123").isNull && col("c23").isNotNull, 1L).otherwise(0L)
          .as("back2"),
        when(col("c123").isNull && col("c23").isNull, 1L).otherwise(0L)
          .as("back1"),
        floor(log(
          when(col("c123").isNotNull, col("c123") / col("c12"))
            .when(col("c23").isNotNull, lit(0.4) * (col("c23") / col("c2")))
            .otherwise(lit(0.16) * (coalesce(col("c3"), lit(1L)) / col("n"))))
          * 1e9 + 0.5).cast(LongType).as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
           sum(col("hit3")).as("n_hit3"),
           sum(col("back2")).as("n_back2"),
           sum(col("back1")).as("n_back1"),
           (round(sum(col("q")).cast(DoubleType) / count(lit(1)) / 1e9, 6)
             + lit(0.0)).as("sbo_lp"))
      .orderBy(col("doc_id"))
  }

  val queries: Seq[(String, QFn)] = Seq(
    "text_bpe" -> textBpe,
    "text_bpe_apply" -> textBpeApply,
    "text_stupid_backoff" -> textStupidBackoff,
    "text_normalize" -> textNormalize,
    "text_tokens" -> textTokens,
    "text_tfidf" -> textTfidf,
    "text_bm25" -> textBm25,
    "text_keyword_extract" -> textKeywordExtract,
    "text_lang_stats" -> textLangStats,
    "text_sentiment" -> textSentiment,
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_token_count" -> textTokenCount,
    "text_fingerprint" -> textFingerprint,
    "text_winnowing" -> textWinnowing,
    "dedup_winnowing" -> dedupWinnowing,
    "dedup_winnowing_incremental" -> dedupWinnowingIncremental,
    "split_leakage_audit" -> splitLeakageAudit,
    "split_cluster_aware" -> splitClusterAware,
    "text_scrub" -> textScrub,
    "text_unigram_logprob" -> textUnigramLogprob,
    "text_bigram_lm" -> textBigramLm,
    "text_dedup_inline" -> textDedupInline,
    "text_hash_features" -> textHashFeatures,
    "text_collocations" -> textCollocations,
    "text_js_divergence" -> textJsDivergence,
    "text_ttr" -> textTtr,
    "text_char_entropy" -> textCharEntropy,
    "text_compress_ratio" -> textCompressRatio,
    "text_topk_sketch" -> textTopkSketch,
    "text_repetition" -> textRepetition,
    "text_chunk" -> textChunk,
    "text_langid_eval" -> textLangidEval,
    "dedup_exact" -> dedupExact,
    "dedup_near_minhash" -> dedupNearMinhash,
    "dedup_clusters" -> dedupClusters,
    "dedup_survivor_quality" -> dedupSurvivorQuality,
    "dedup_clusters_all" -> dedupClustersAll,
    "dedup_clusters_multimodal" -> dedupClustersMultimodal,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_containment" -> dedupContainment,
    "dedup_eval" -> dedupEval,
    "dedup_lsh_curve" -> dedupLshCurve,
    "dedup_eval_simhash" -> dedupEvalSimhash,
    "dedup_eval_winnowing" -> dedupEvalWinnowing,
    "dedup_incremental" -> dedupIncremental,
  )

  /** The minhash pair construction as DuckDB CTEs ending in
    * `pairs(da, db, j)` — generated from the same constants as
    * [[minhashPairs]] (16 minhashes aᵢ=2i+3 bᵢ=7919i+13 mod P, 8 bands
    * of r=2, exact-Jaccard verify ≥ 0.8), shared by the
    * dedup_near_minhash and dedup_clusters oracles so the two cannot
    * drift apart. */
  private[operators] val duckMinhashPairsCtes: String = {
    val P = 2147483647L
    val mins = (0 until 16)
      .map(i => s"min((hm * ${2 * i + 3} + ${7919 * i + 13}) % $P) AS mh$i")
      .mkString(", ")
    val s0 = (0 until 8).map(j => s"WHEN $j THEN mh${2 * j}").mkString(" ")
    val s1 = (0 until 8).map(j => s"WHEN $j THEN mh${2 * j + 1}").mkString(" ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        sh AS MATERIALIZED (SELECT DISTINCT doc_id,
               ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 12))::BIGINT AS gh
               FROM toks, unnest(range(1, len(t) - 1)) r(i)),
        hm AS (SELECT doc_id, gh % $P AS hm FROM sh),
        sig AS (SELECT doc_id, $mins FROM hm GROUP BY doc_id),
        bands AS (SELECT doc_id, j AS band,
                         CASE j $s0 END AS s0, CASE j $s1 END AS s1
                  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS j) b),
        cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
                  AND x.doc_id < y.doc_id),
        cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        inter AS (SELECT da, db, count(*) ni
                  FROM cand JOIN sh a ON a.doc_id = da
                            JOIN sh b ON b.doc_id = db AND b.gh = a.gh
                  GROUP BY da, db),
        pairs AS MATERIALIZED (SELECT da, db, j FROM (
                    SELECT da, db, CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS j
                    FROM inter JOIN cnt ca ON ca.doc_id = da
                               JOIN cnt cb ON cb.doc_id = db) t
                  WHERE j >= 0.8)"""
  }

  /** The simhash pair construction as DuckDB CTEs ending in
    * `simpairs(da, db, hamming)` — the all-pairs form (equal to the
    * Spark chunk-bucket construction because pigeonhole recall is
    * exactly 1; LawsSpec asserts it), `sx_`-prefixed so it composes
    * with [[duckMinhashPairsCtes]] in one WITH clause. */
  private[operators] val duckSimhashPairsCtes: String =
    """sx_toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
       sx_h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT hv FROM sx_toks),
       sx_bv AS (SELECT doc_id, b.bit,
                        CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END c
                 FROM sx_h CROSS JOIN (SELECT unnest(range(60)) AS bit) b),
       sx_sc AS (SELECT doc_id, bit, sum(c) sc FROM sx_bv GROUP BY 1, 2),
       sx_sig AS MATERIALIZED (SELECT doc_id,
                         CAST(sum(CASE WHEN sc > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sig
                  FROM sx_sc GROUP BY doc_id),
       simpairs AS MATERIALIZED (SELECT a.doc_id da, b.doc_id db,
                           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
                    FROM sx_sig a JOIN sx_sig b ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.sig, b.sig)) <= 3)"""

  /** One unrolled BPE training step as DuckDB CTEs: `d$i` (doc_id, tk)
    * → `d${i+1}`. Greedy left-to-right pairing realized with windows:
    * candidate positions j (tk[j]=x ∧ tk[j+1]=y), grouped into chains
    * of CONSECUTIVE j (overlap only ever arises from x==y runs; for
    * x≠y no two candidates can be adjacent), keep even offsets within
    * each chain — exactly the pairs the sequential fold takes. A
    * position after a taken one is consumed; everything else passes
    * through, order preserved by j. */
  private def duckBpeStep(i: Int): String =
    s"""p$i AS (SELECT tk[j] AS x, tk[j + 1] AS y, count(*) AS n
               FROM d$i, unnest(range(1, len(tk))) r(j)
               GROUP BY 1, 2),
        m$i AS MATERIALIZED (SELECT x, y FROM p$i
                ORDER BY n DESC, x ASC, y ASC LIMIT 1),
        c$i AS (SELECT doc_id, j
                FROM d$i, m$i, unnest(range(1, len(tk))) r(j)
                WHERE tk[j] = x AND tk[j + 1] = y),
        g$i AS (SELECT doc_id, j,
                       j - row_number() OVER (PARTITION BY doc_id ORDER BY j)
                         AS grp
                FROM c$i),
        t$i AS MATERIALIZED (SELECT doc_id, j FROM (
                  SELECT doc_id, j,
                         j - min(j) OVER (PARTITION BY doc_id, grp) AS off
                  FROM g$i) q
                WHERE off % 2 = 0),
        d${i + 1} AS MATERIALIZED (
          SELECT u.doc_id,
                 list(CASE WHEN tt.j IS NOT NULL
                           THEN m.x || '▁' || m.y ELSE u.tok END
                      ORDER BY u.j) AS tk
          FROM (SELECT doc_id, j, tk[j] AS tok
                FROM d$i, unnest(range(1, len(tk) + 1)) r(j)) u
          CROSS JOIN m$i m
          LEFT JOIN t$i tt ON tt.doc_id = u.doc_id AND tt.j = u.j
          LEFT JOIN t$i tp ON tp.doc_id = u.doc_id AND tp.j = u.j - 1
          WHERE tp.j IS NULL
          GROUP BY u.doc_id)"""

  /** dedup_lsh_curve's oracle — capped 150-doc shingle/jaccard/minhash
    * CTE chain with the SAME 16-hash constants as
    * [[duckMinhashPairsCtes]] (cl-prefixed so it can't collide), but
    * keeping EVERY jaccard pair (no 0.8 verify) and the raw band
    * candidates, full-outer-joined into the decile histogram. */
  private val duckLshCurveSql: String = {
    val P = 2147483647L
    val mins = (0 until 16)
      .map(i => s"min((hm * ${2 * i + 3} + ${7919 * i + 13}) % $P) AS mh$i")
      .mkString(", ")
    val s0 = (0 until 8).map(j => s"WHEN $j THEN mh${2 * j}").mkString(" ")
    val s1 = (0 until 8).map(j => s"WHEN $j THEN mh${2 * j + 1}").mkString(" ")
    s"""WITH cltoks AS (SELECT doc_id, string_split(text, ' ') t
                        FROM documents WHERE doc_id < 150),
          clsh AS MATERIALIZED (SELECT DISTINCT doc_id, t[i] AS s
                 FROM cltoks, unnest(range(1, len(t) + 1)) r(i)),
          clcnt AS (SELECT doc_id, count(*) n FROM clsh GROUP BY doc_id),
          clint AS (SELECT a.doc_id da, b.doc_id db, count(*) ni
                    FROM clsh a JOIN clsh b
                      ON a.s = b.s AND a.doc_id < b.doc_id
                    GROUP BY a.doc_id, b.doc_id),
          cltruth AS (SELECT da, db,
                        CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS j
                      FROM clint JOIN clcnt ca ON ca.doc_id = da
                                 JOIN clcnt cb ON cb.doc_id = db),
          clhm AS (SELECT doc_id,
                     ('0x' || substr(md5(s), 1, 12))::BIGINT % $P AS hm
                   FROM clsh),
          clsig AS (SELECT doc_id, $mins FROM clhm GROUP BY doc_id),
          clbands AS (SELECT doc_id, j AS band,
                        CASE j $s0 END AS s0, CASE j $s1 END AS s1
                      FROM clsig CROSS JOIN (SELECT unnest(range(8)) AS j) b),
          clcand AS (SELECT DISTINCT x.doc_id da, y.doc_id db
                     FROM clbands x JOIN clbands y
                       ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
                      AND x.doc_id < y.doc_id),
          clj AS (SELECT CAST(floor(coalesce(t.j, 0.0) * 10.0) AS BIGINT)
                    AS decile,
                    CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS c
                  FROM cltruth t FULL OUTER JOIN clcand c
                    ON t.da = c.da AND t.db = c.db)
        SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(c) AS BIGINT) AS n_cand,
               round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS cand_rate
        FROM clj GROUP BY decile
        ORDER BY decile ASC NULLS FIRST"""
  }

  /** Shared DuckDB CTE chain for the BM25 leg — mirrors [[bm25Rank]] +
    * [[bm25TopK]]'s query-workload derivation op-for-op; ends in
    * bml(qid, doc_id, sn, rb) = every scored (query, doc) with its
    * nano-quantized score sum and its per-query rank. Used by the
    * text_bm25 oracle here and the sim_hybrid_rrf oracle in LlmVector. */
  private[graft] val bm25OracleCtes: String =
    """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
              tf AS (SELECT doc_id, tok, count(*) tf FROM toks GROUP BY 1, 2),
              df AS (SELECT tok, count(*) df FROM tf GROUP BY tok),
              qt AS (SELECT CAST((r - 1) // 3 AS BIGINT) qid, tok, df FROM (
                       SELECT tok, df,
                              row_number() OVER (ORDER BY df DESC, tok ASC) r
                       FROM df) t
                     WHERE r <= 15),
              dl AS (SELECT doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT) dl
                     FROM documents),
              st AS (SELECT CAST(count(*) AS BIGINT) n,
                            CAST(sum(dl) AS BIGINT) sdl FROM dl),
              c AS (SELECT q.qid, t.doc_id,
                           CAST(floor(
                             ln((CAST(st.n AS DOUBLE) - q.df + 0.5)
                                / (q.df + 0.5) + 1.0)
                             * (t.tf * 2.2)
                             / (t.tf + 1.2 * (0.25 + 0.75
                                * (d.dl / (CAST(st.sdl AS DOUBLE) / st.n))))
                             * 1000000000.0 + 0.5) AS BIGINT) cn
                    FROM tf t JOIN qt q USING (tok)
                         JOIN dl d ON d.doc_id = t.doc_id
                         CROSS JOIN st),
              sc AS (SELECT qid, doc_id, CAST(sum(cn) AS BIGINT) sn
                     FROM c GROUP BY 1, 2),
              bml AS (SELECT qid, doc_id, sn,
                             row_number() OVER (PARTITION BY qid
                               ORDER BY sn DESC, doc_id ASC) rb
                      FROM sc)"""

  val oracles: Seq[(String, String)] = Seq(
    "dedup_lsh_curve" -> duckLshCurveSql,
    "text_stupid_backoff" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
            tg AS MATERIALIZED (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
                                       toks[i+2] AS w3
                   FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),
            tr AS MATERIALIZED (SELECT w1, w2, w3, count(*) AS c123
                   FROM tg WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
            b12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
                    FROM tr GROUP BY w1, w2),
            b23 AS (SELECT w2, w3, CAST(sum(c123) AS BIGINT) AS c23
                    FROM tr GROUP BY w2, w3),
            u2 AS (SELECT w2, CAST(sum(c123) AS BIGINT) AS c2 FROM tr GROUP BY w2),
            u3 AS (SELECT w3, CAST(sum(c123) AS BIGINT) AS c3 FROM tr GROUP BY w3),
            nn AS (SELECT CAST(sum(c123) AS BIGINT) AS n FROM tr),
            sc AS (SELECT doc_id,
                     CASE WHEN c123 IS NOT NULL THEN 1 ELSE 0 END AS hit3,
                     CASE WHEN c123 IS NULL AND c23 IS NOT NULL THEN 1 ELSE 0 END
                       AS back2,
                     CASE WHEN c123 IS NULL AND c23 IS NULL THEN 1 ELSE 0 END
                       AS back1,
                     CAST(floor(ln(
                       CASE WHEN c123 IS NOT NULL THEN c123 / c12
                            WHEN c23 IS NOT NULL THEN 0.4 * (c23 / c2)
                            ELSE 0.16 * (coalesce(c3, 1) / n) END) * 1e9 + 0.5)
                       AS BIGINT) AS q
                   FROM tg LEFT JOIN tr USING (w1, w2, w3)
                        LEFT JOIN b12 USING (w1, w2)
                        LEFT JOIN b23 USING (w2, w3)
                        LEFT JOIN u2 USING (w2)
                        LEFT JOIN u3 USING (w3)
                        CROSS JOIN nn)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                CAST(sum(hit3) AS BIGINT) AS n_hit3,
                CAST(sum(back2) AS BIGINT) AS n_back2,
                CAST(sum(back1) AS BIGINT) AS n_back1,
                round(CAST(sum(q) AS DOUBLE) / count(*) / 1e9, 6) + 0.0 AS sbo_lp
         FROM sc GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_bpe_apply" ->
      s"""WITH d0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
            ${(0 until 6).map(duckBpeStep).mkString(",\n")}
          SELECT b.doc_id,
                 CAST(len(b.tk) AS BIGINT) AS tokens_before,
                 CAST(len(f.tk) AS BIGINT) AS tokens_after,
                 (CAST(len(b.tk) AS BIGINT) * 1000000)
                   // CAST(len(f.tk) AS BIGINT) AS compression_ppm,
                 ('0x' || substr(md5(array_to_string(f.tk, ' ')), 1, 12))::BIGINT
                   AS final_fp
          FROM d0 b JOIN d6 f ON b.doc_id = f.doc_id
          ORDER BY b.doc_id ASC NULLS FIRST""",
    "text_ttr" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
                round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')), 6) AS ttr
         FROM documents ORDER BY doc_id ASC NULLS FIRST""",
    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                     FROM documents WHERE length(text) >= 1),
           cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
           n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
                        CAST(count(*) AS BIGINT) AS n_uniq
                 FROM cnt GROUP BY 1),
           t AS (SELECT cnt.doc_id, n.n, n.n_uniq,
                        CAST(floor(-((k / CAST(n AS DOUBLE))
                                     * ln(k / CAST(n AS DOUBLE))) * 1e12 + 0.5)
                             AS BIGINT) AS term
                 FROM cnt JOIN n USING (doc_id))
         SELECT doc_id, max(n) AS n_chars, max(n_uniq) AS n_uniq,
                round(CAST(sum(term) AS DOUBLE) / 1e12, 6) AS entropy,
                CAST(sum(term) AS BIGINT) < 2000000000000 AS low_entropy
         FROM t GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_js_divergence" ->
      """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
            cnt AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
            tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
            dist AS (SELECT cnt.source, tok, CAST(c AS DOUBLE) / n AS p
                     FROM cnt JOIN tot ON cnt.source = tot.source),
            prs AS (SELECT a.source sa, b.source sb
                    FROM (SELECT DISTINCT source FROM dist) a
                    JOIN (SELECT DISTINCT source FROM dist) b ON a.source < b.source),
            ja AS (SELECT sa, sb, tok, p AS pa FROM prs JOIN dist ON dist.source = prs.sa),
            jb AS (SELECT sa, sb, tok, p AS pb FROM prs JOIN dist ON dist.source = prs.sb),
            f AS (SELECT coalesce(ja.sa, jb.sa) AS sa, coalesce(ja.sb, jb.sb) AS sb,
                         coalesce(pa, 0.0) AS pa, coalesce(pb, 0.0) AS pb
                  FROM ja FULL JOIN jb
                    ON ja.sa = jb.sa AND ja.sb = jb.sb AND ja.tok = jb.tok),
            t AS (SELECT sa, sb, pa, pb, (pa + pb) / 2.0 AS m FROM f),
            q AS (SELECT sa, sb, pa, pb,
                         CASE WHEN pa > 0.0
                              THEN CAST(floor(pa * ln(pa / m) * 1e12 + 0.5) AS BIGINT)
                              ELSE 0 END AS ta,
                         CASE WHEN pb > 0.0
                              THEN CAST(floor(pb * ln(pb / m) * 1e12 + 0.5) AS BIGINT)
                              ELSE 0 END AS tb
                  FROM t)
         SELECT sa, sb,
                CAST(sum(CASE WHEN pa > 0.0 AND pb > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_common,
                round(CAST(CAST(sum(ta) AS BIGINT) + CAST(sum(tb) AS BIGINT) AS DOUBLE)
                      / 2e12, 6) + 0.0 AS js
         FROM q GROUP BY sa, sb
         ORDER BY sa ASC NULLS FIRST, sb ASC NULLS FIRST""",
    "text_collocations" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            un AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w, t[i + 1] AS w2
                   FROM toks, unnest(range(1, len(t) + 1)) r(i)),
            uni AS (SELECT w, count(*) AS n_w FROM un GROUP BY w),
            nt AS (SELECT count(*) AS nn FROM un),
            pr AS (SELECT w AS w1, w2, count(*) AS n_ab
                   FROM un WHERE w2 IS NOT NULL GROUP BY 1, 2),
            np AS (SELECT CAST(sum(n_ab) AS BIGINT) AS np FROM pr),
            sc AS (SELECT w1, w2, n_ab,
                          CAST(n_ab * nn * nn AS DOUBLE)
                            / CAST(np.np * na.n_w * nb.n_w AS DOUBLE) AS score
                   FROM pr
                   JOIN uni na ON pr.w1 = na.w
                   JOIN uni nb ON pr.w2 = nb.w
                   CROSS JOIN nt CROSS JOIN np
                   WHERE n_ab >= 3),
            top AS (SELECT w1, w2, n_ab, score FROM sc
                    ORDER BY score DESC, w1 ASC, w2 ASC LIMIT 20)
         SELECT w1, w2, n_ab, round(ln(score), 6) + 0.0 AS pmi
         FROM top
         ORDER BY pmi DESC NULLS LAST, w1 ASC NULLS FIRST, w2 ASC NULLS FIRST""",
    "text_normalize" ->
      """SELECT doc_id,
                regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                               ' +', ' ', 'g') AS norm_text
         FROM documents ORDER BY doc_id ASC NULLS FIRST""",
    "text_tokens" ->
      """SELECT tok AS term, count(*) AS tf
         FROM (SELECT unnest(string_split(text, ' ')) tok FROM documents) t
         GROUP BY tok
         ORDER BY tf DESC NULLS LAST, term ASC NULLS FIRST
         LIMIT 50""",
    "text_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
              tf AS (SELECT doc_id, tok, count(*) tf FROM toks GROUP BY 1, 2),
              df AS (SELECT tok, count(*) df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
              n AS (SELECT count(*) n FROM documents),
              scored AS (
                SELECT doc_id, tok,
                       CAST(tf AS DOUBLE) * ln((n + 1.0) / (df + 1.0)) AS tfidf
                FROM tf JOIN df USING (tok) CROSS JOIN n)
         SELECT doc_id, tok AS term, round(tfidf, 6) AS tfidf FROM (
           SELECT doc_id, tok, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC NULLS LAST, tok ASC) AS rn
           FROM scored) t
         WHERE rn = 1 ORDER BY doc_id ASC NULLS FIRST""",
    "text_bm25" ->
      s"""WITH $bm25OracleCtes
         SELECT qid, CAST(rb AS BIGINT) AS rank, doc_id,
                round(CAST(sn AS DOUBLE) / 1000000000.0, 6) + 0.0 AS bm25
         FROM bml
         WHERE rb <= 10
         ORDER BY qid ASC NULLS FIRST, rank ASC""",
    "text_keyword_extract" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
              tf AS (SELECT doc_id, tok, count(*) tf FROM toks GROUP BY 1, 2),
              df AS (SELECT tok, count(*) df FROM tf GROUP BY tok),
              n AS (SELECT CAST(count(*) AS DOUBLE) n_docs FROM documents),
              scored AS (
                SELECT doc_id, tok,
                       CAST(tf AS DOUBLE) * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
                FROM tf JOIN df USING (tok) CROSS JOIN n),
              r AS (SELECT doc_id, tok,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY tfidf DESC NULLS LAST, tok ASC) AS rn
                    FROM scored)
         SELECT doc_id, string_agg(tok, ' ' ORDER BY rn) AS keywords
         FROM r WHERE rn <= 3 GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars,
                count(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang ASC NULLS FIRST""",
    "text_sentiment" ->
      """WITH lex(tok, score) AS (VALUES
              ('fast', 1.0), ('big', 1.0), ('value', 1.0), ('slow', -1.0), ('dup', -1.0)),
            toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) tok FROM documents),
            ds AS (SELECT doc_id, lang, sum(score) / count(*) AS doc_sent
                   FROM toks JOIN lex USING (tok) GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_scored_docs, round(avg(doc_sent), 6) + 0.0 AS mean_sent
         FROM ds GROUP BY lang ORDER BY lang ASC NULLS FIRST""",
    "text_langid" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS DOUBLE)
                    / len(string_split(text, ' ')) AS the_ratio
           FROM documents)
         SELECT doc_id,
                CASE WHEN the_ratio > 0.0 THEN 'en' ELSE 'unk' END AS pred_lang,
                round(the_ratio, 6) AS the_ratio,
                (CASE WHEN the_ratio > 0.0 THEN 'en' ELSE 'unk' END) = lang AS is_match
         FROM r ORDER BY doc_id ASC NULLS FIRST""",
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
            bg AS (SELECT doc_id, t[i+1] || ' ' || t[i+2] AS g
                   FROM t, unnest(range(len(t) - 1)) r(i)),
            bc AS (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY 1, 2),
            b  AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / sum(n) AS tb
                   FROM bc GROUP BY doc_id),
            tg AS (SELECT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
                   FROM t, unnest(range(len(t) - 2)) r(i)),
            tc AS (SELECT doc_id, g, count(*) AS n FROM tg GROUP BY 1, 2),
            tr AS (SELECT doc_id,
                          CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
                            / sum(n) AS dt
                   FROM tc GROUP BY doc_id)
         SELECT b.doc_id, round(tb, 6) AS top_bigram_frac,
                round(dt, 6) AS dup_trigram_frac,
                (tb <= 0.18 AND dt <= 0.30) AS keep
         FROM b JOIN tr ON b.doc_id = tr.doc_id
         ORDER BY b.doc_id ASC NULLS FIRST""",
    "text_chunk" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                substring(text, CAST(i*48 + 1 AS INT), 64) AS chunk,
                CAST(length(substring(text, CAST(i*48 + 1 AS INT), 64)) AS BIGINT) AS chunk_len
         FROM documents, unnest(range(0, (length(text)-1)//48 + 1)) r(i)
         WHERE length(text) >= 1
         ORDER BY doc_id ASC NULLS FIRST, chunk_id ASC NULLS FIRST""",
    "text_langid_eval" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS DOUBLE)
                    / len(string_split(text, ' ')) AS the_ratio
           FROM documents),
            p AS (SELECT lang,
                         CASE WHEN the_ratio > 0.0 THEN 'en' ELSE 'unk' END AS pred_lang
                  FROM r),
            cm AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
            t AS (SELECT lang, sum(n) AS n_true FROM cm GROUP BY lang)
         SELECT cm.lang, cm.pred_lang, cm.n,
                round(CAST(cm.n AS DOUBLE) / t.n_true, 6) AS frac_of_true
         FROM cm JOIN t ON cm.lang = t.lang
         ORDER BY cm.lang ASC NULLS FIRST, pred_lang ASC NULLS FIRST""",
    "text_quality" ->
      """WITH q AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(length(text) AS BIGINT) AS len_chars,
                  n_chars AS meta_chars,
                  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                        / len(string_split(text, ' ')), 6) AS avg_tok_len,
                  CAST(len(list_filter(string_split(text, ' '),
                          x -> x = 'the' OR x = 'a')) AS DOUBLE)
                        / len(string_split(text, ' ')) AS stop_ratio_raw
           FROM documents)
         SELECT doc_id, n_tokens, len_chars, meta_chars, avg_tok_len,
                round(ln(1.0 + n_tokens) * (1.0 - stop_ratio_raw), 6) AS quality,
                round(stop_ratio_raw, 6) AS stop_ratio
         FROM q ORDER BY doc_id ASC NULLS FIRST""",
    "text_token_count" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens
         FROM documents ORDER BY doc_id ASC NULLS FIRST""",
    "text_fingerprint" ->
      """WITH toks AS (
           SELECT doc_id,
                  CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                  unnest(string_split(text, ' ')) AS tok
           FROM documents)
         SELECT doc_id,
                CAST(sum((('0x' || substr(md5(tok), 1, 12))::BIGINT % 1000003)
                         * (pos + 1)) % 1000003 AS BIGINT) AS fingerprint
         FROM toks GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""",
    "text_winnowing" ->
      """WITH toks AS (
           SELECT doc_id,
                  CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                  unnest(string_split(text, ' ')) AS tok
           FROM documents),
         g AS (
           SELECT doc_id, pos, tok,
                  lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                  lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
           FROM toks),
         h AS (
           SELECT doc_id, pos,
                  ('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 8))::BIGINT AS hh
           FROM g WHERE t3 IS NOT NULL),
         wnd AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n_grams,
                  min(hh * 2147483648 + (2147483647 - pos))
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc
           FROM h)
         SELECT DISTINCT doc_id,
                CAST(2147483647 - (enc % 2147483648) AS BIGINT) AS fp_pos,
                CAST(enc // 2147483648 AS BIGINT) AS fp_hash
         FROM wnd WHERE pos <= n_grams - 4
         ORDER BY doc_id ASC NULLS FIRST, fp_pos ASC NULLS FIRST,
                  fp_hash ASC NULLS FIRST""",
    "split_cluster_aware" -> {
      def round(i: Int): String =
        s"""l${i + 1} AS MATERIALIZED (SELECT l.v, least(l.lab, min(n.lab)) AS lab
                          FROM l$i l JOIN sym e ON e.src = l.v
                                     JOIN l$i n ON n.v = e.dst
                          GROUP BY l.v, l.lab)"""
      s"""WITH $duckMinhashPairsCtes,
          sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM pairs
                  UNION ALL SELECT db, da FROM pairs),
          l0 AS (SELECT v, v AS lab FROM (SELECT DISTINCT src AS v FROM sym) t),
          ${round(0)}, ${round(1)}, ${round(2)}, ${round(3)},
          ds AS (SELECT d.doc_id,
                   CASE WHEN ('0x' || substr(md5(CAST(coalesce(l4.lab, d.doc_id) AS VARCHAR)), 1, 12))::BIGINT % 10 = 9
                        THEN 'val' ELSE 'train' END AS sp
                 FROM documents d LEFT JOIN l4 ON l4.v = d.doc_id),
          sizes AS (SELECT count(*) AS n_docs,
                           CAST(sum(CASE WHEN sp = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
                    FROM ds),
          pa AS (SELECT count(*) AS n_pairs,
                        CAST(sum(CASE WHEN a.sp <> b.sp THEN 1 ELSE 0 END) AS BIGINT) AS n_leaking
                 FROM pairs p JOIN ds a ON a.doc_id = p.da JOIN ds b ON b.doc_id = p.db)
          SELECT n_docs, CAST(n_docs - n_val AS BIGINT) AS n_train, n_val,
                 CAST(n_val * 1000000 // n_docs AS BIGINT) AS val_ppm,
                 n_pairs, n_leaking
          FROM sizes CROSS JOIN pa"""
    },
    "split_leakage_audit" ->
      s"""WITH $duckMinhashPairsCtes,
          cls AS (SELECT
            CASE WHEN ('0x' || substr(md5(CAST(da AS VARCHAR)), 1, 12))::BIGINT % 10 = 9
                 THEN 'val' ELSE 'train' END AS sa,
            CASE WHEN ('0x' || substr(md5(CAST(db AS VARCHAR)), 1, 12))::BIGINT % 10 = 9
                 THEN 'val' ELSE 'train' END AS sb
          FROM pairs)
          SELECT count(*) AS n_pairs,
                 CAST(sum(CASE WHEN sa = 'train' AND sb = 'train' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train_train,
                 CAST(sum(CASE WHEN sa = 'val' AND sb = 'val' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_val_val,
                 CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT) AS n_leaking,
                 CASE WHEN count(*) > 0
                      THEN CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) * 1000000
                           // count(*) AS BIGINT) END AS leak_ppm
          FROM cls""",
    "dedup_winnowing_incremental" ->
      """WITH toks AS (
           SELECT doc_id,
                  CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                  unnest(string_split(text, ' ')) AS tok
           FROM documents),
         g AS (
           SELECT doc_id, pos, tok,
                  lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                  lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
           FROM toks),
         h AS (
           SELECT doc_id, pos,
                  ('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 8))::BIGINT AS hh
           FROM g WHERE t3 IS NOT NULL),
         wnd AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n_grams,
                  min(hh * 2147483648 + (2147483647 - pos))
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc
           FROM h),
         fp AS (SELECT DISTINCT doc_id, CAST(enc // 2147483648 AS BIGINT) AS fp_hash
                FROM wnd WHERE pos <= n_grams - 4),
         idx AS (SELECT doc_id AS corpus_id, fp_hash FROM fp WHERE doc_id % 5 <> 0),
         rare AS (SELECT fp_hash FROM idx GROUP BY fp_hash HAVING count(*) <= 50),
         delta AS (SELECT doc_id AS new_id, fp_hash FROM fp WHERE doc_id % 5 = 0)
         SELECT corpus_id, new_id, count(*) AS n_shared
         FROM idx JOIN rare USING (fp_hash) JOIN delta USING (fp_hash)
         GROUP BY corpus_id, new_id HAVING count(*) >= 2
         ORDER BY corpus_id ASC NULLS FIRST, new_id ASC NULLS FIRST""",
    "dedup_winnowing" ->
      """WITH toks AS (
           SELECT doc_id,
                  CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                  unnest(string_split(text, ' ')) AS tok
           FROM documents),
         g AS (
           SELECT doc_id, pos, tok,
                  lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                  lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
           FROM toks),
         h AS (
           SELECT doc_id, pos,
                  ('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 8))::BIGINT AS hh
           FROM g WHERE t3 IS NOT NULL),
         wnd AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n_grams,
                  min(hh * 2147483648 + (2147483647 - pos))
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc
           FROM h),
         fp AS (SELECT DISTINCT doc_id, CAST(enc // 2147483648 AS BIGINT) AS fp_hash
                FROM wnd WHERE pos <= n_grams - 4),
         freq AS (SELECT fp_hash, count(*) AS nd FROM fp GROUP BY fp_hash),
         rare AS (SELECT fp.doc_id, fp.fp_hash FROM fp
                  JOIN freq USING (fp_hash) WHERE nd <= 50),
         nfp AS (SELECT doc_id, count(*) AS n_fp FROM rare GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM rare a JOIN rare b
             ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id
           HAVING count(*) >= 2)
         SELECT doc_a, doc_b, n_shared,
                CAST(n_shared AS DOUBLE) / (na.n_fp + nb.n_fp - n_shared)
                  AS fp_jaccard
         FROM pairs
         JOIN nfp na ON na.doc_id = doc_a
         JOIN nfp nb ON nb.doc_id = doc_b
         ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""",
    "dedup_exact" ->
      """SELECT doc_id, n_copies FROM (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY norm ORDER BY doc_id ASC) AS rn,
                  count(*) OVER (PARTITION BY norm) AS n_copies
           FROM (SELECT doc_id, regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm
                 FROM documents) t) x
         WHERE rn = 1 ORDER BY doc_id ASC NULLS FIRST""",
    "text_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
            tf AS (SELECT tok, count(*) tf FROM toks GROUP BY tok),
            n AS (SELECT CAST(count(*) AS DOUBLE) n_tok FROM toks)
         SELECT doc_id,
                round(sum(ln(tf / n_tok)) / count(*), 6) AS mean_logprob,
                count(*) AS n_tokens
         FROM toks JOIN tf USING (tok) CROSS JOIN n
         GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
            bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                   FROM t, unnest(range(1, len(toks))) AS u(i)),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1)
         SELECT doc_id,
                round(sum(ln(c12 / c1)) / count(*), 6) AS mean_bigram_lp,
                count(*) AS n_bigrams
         FROM bg JOIN bc USING (w1, w2) JOIN c1 USING (w1)
         GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_dedup_inline" ->
      """SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(u) AS BIGINT) AS n_unique,
                array_to_string(u, ' ') AS dedup_text
         FROM (SELECT doc_id, toks,
                      list_filter(toks, (t, i) -> list_position(toks, t) = i) AS u
               FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) a) b
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_hash_features" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
            b AS (SELECT doc_id,
                         ('0x' || substr(md5(tok), 1, 12))::BIGINT % 64 AS bkt,
                         count(*) AS cnt
                  FROM t GROUP BY doc_id, bkt)
         SELECT doc_id, count(*) AS f_nnz,
                CAST(max(cnt) AS BIGINT) AS f_max,
                round(sqrt(CAST(sum(cnt * cnt) AS DOUBLE)), 6) AS f_l2
         FROM b GROUP BY doc_id
         ORDER BY doc_id ASC NULLS FIRST""",
    "text_scrub" ->
      """SELECT doc_id,
                array_to_string(list_transform(string_split(text, ' '),
                  t -> CASE WHEN t IN ('fast','slow','dup','value')
                            THEN '[x]' ELSE t END), ' ') AS scrubbed,
                CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('fast','slow','dup','value'))) AS BIGINT) AS n_redacted
         FROM documents ORDER BY doc_id ASC NULLS FIRST""",
    "dedup_near_minhash" ->
      s"""WITH $duckMinhashPairsCtes
         SELECT da, db, round(j, 6) AS jaccard FROM pairs
         ORDER BY da ASC NULLS FIRST, db ASC NULLS FIRST""",
    "dedup_incremental" ->
      // same signature/band CTEs; the candidate join crosses the
      // corpus (% 5 <> 0) × new-batch (% 5 = 0) split instead of da < db
      s"""WITH $duckMinhashPairsCtes
         SELECT DISTINCT x.doc_id AS corpus_id, y.doc_id AS new_id
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.s0 = y.s0 AND x.s1 = y.s1
         WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
         ORDER BY corpus_id ASC NULLS FIRST, new_id ASC NULLS FIRST""",
    "dedup_clusters" -> {
      // mirror of labelProp: 4 unrolled min-label rounds over the same
      // pair graph; integer min is order-independent, so this is exact
      def round(i: Int): String =
        s"""l${i + 1} AS MATERIALIZED (SELECT l.v, least(l.lab, min(n.lab)) AS lab
                          FROM l$i l JOIN sym e ON e.src = l.v
                                     JOIN l$i n ON n.v = e.dst
                          GROUP BY l.v, l.lab)"""
      s"""WITH $duckMinhashPairsCtes,
            sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM pairs
                    UNION ALL SELECT db, da FROM pairs),
            l0 AS (SELECT v, v AS lab FROM
                     (SELECT DISTINCT src AS v FROM sym) t),
            ${round(0)}, ${round(1)}, ${round(2)}, ${round(3)}
         SELECT lab AS survivor, count(*) AS n_members
         FROM l4 GROUP BY lab
         ORDER BY survivor ASC NULLS FIRST"""
    },
    "dedup_simhash" ->
      s"""WITH $duckSimhashPairsCtes
         SELECT da, db, hamming FROM simpairs
         ORDER BY da ASC NULLS FIRST, db ASC NULLS FIRST""",
    "dedup_survivor_quality" -> {
      def round(i: Int): String =
        s"""l${i + 1} AS MATERIALIZED (SELECT l.v, least(l.lab, min(n.lab)) AS lab
                          FROM l$i l JOIN sym e ON e.src = l.v
                                     JOIN l$i n ON n.v = e.dst
                          GROUP BY l.v, l.lab)"""
      s"""WITH $duckMinhashPairsCtes,
            sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM pairs
                    UNION ALL SELECT db, da FROM pairs),
            l0 AS (SELECT v, v AS lab FROM
                     (SELECT DISTINCT src AS v FROM sym) t),
            ${round(0)}, ${round(1)}, ${round(2)}, ${round(3)},
            nt AS (SELECT doc_id AS v,
                          CASE WHEN len(text) >= 1
                               THEN CAST(len(string_split(text, ' ')) AS BIGINT)
                               ELSE 0 END AS ntok
                   FROM documents),
            ag AS (SELECT l4.lab AS cluster, count(*) AS n_members,
                          min(struct_pack(nt := -nt.ntok, id := l4.v)) AS f
                   FROM l4 JOIN nt ON nt.v = l4.v
                   GROUP BY l4.lab)
         SELECT cluster, n_members, f.id AS survivor,
                CAST(-f.nt AS BIGINT) AS survivor_tokens,
                f.id <> cluster AS quality_differs
         FROM ag
         ORDER BY cluster ASC NULLS FIRST"""
    },
    "dedup_clusters_all" -> {
      def round(i: Int): String =
        s"""l${i + 1} AS MATERIALIZED (SELECT l.v, least(l.lab, min(n.lab)) AS lab
                          FROM l$i l JOIN sym e ON e.src = l.v
                                     JOIN l$i n ON n.v = e.dst
                          GROUP BY l.v, l.lab)"""
      s"""WITH $duckMinhashPairsCtes,
            $duckSimhashPairsCtes,
            allpairs AS MATERIALIZED (SELECT da, db FROM pairs
                         UNION SELECT da, db FROM simpairs),
            sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM allpairs
                    UNION ALL SELECT db, da FROM allpairs),
            l0 AS (SELECT v, v AS lab FROM
                     (SELECT DISTINCT src AS v FROM sym) t),
            ${round(0)}, ${round(1)}, ${round(2)}, ${round(3)}
         SELECT lab AS survivor, count(*) AS n_members
         FROM l4 GROUP BY lab
         ORDER BY survivor ASC NULLS FIRST"""
    },
    "dedup_clusters_multimodal" -> {
      def round(i: Int): String =
        s"""l${i + 1} AS MATERIALIZED (SELECT l.v, least(l.lab, min(n.lab)) AS lab
                          FROM l$i l JOIN sym e ON e.src = l.v
                                     JOIN l$i n ON n.v = e.dst
                          GROUP BY l.v, l.lab)"""
      s"""WITH $duckMinhashPairsCtes,
            $duckSimhashPairsCtes,
            ${LlmVector.duckEmbcosPairsCtes},
            allpairs AS MATERIALIZED (SELECT da, db FROM pairs
                         UNION SELECT da, db FROM simpairs
                         UNION SELECT ia AS da, ib AS db FROM empairs),
            sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM allpairs
                    UNION ALL SELECT db, da FROM allpairs),
            l0 AS (SELECT v, v AS lab FROM
                     (SELECT DISTINCT src AS v FROM sym) t),
            ${round(0)}, ${round(1)}, ${round(2)}, ${round(3)}
         SELECT lab AS survivor, count(*) AS n_members
         FROM l4 GROUP BY lab
         ORDER BY survivor ASC NULLS FIRST"""
    },
    "dedup_ngram_jaccard" ->
      """WITH g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS s
                    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 150) d,
                         unnest(range(1, length(text) - 3)) r(i)),
            cnt AS (SELECT doc_id, count(*) n FROM g GROUP BY doc_id),
            inter AS (SELECT a.doc_id da, b.doc_id db, count(*) ni
                      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT da, db, round(j, 6) AS jaccard FROM (
           SELECT da, db, CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS j
           FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db) t
         WHERE j >= 0.55
         ORDER BY da ASC NULLS FIRST, db ASC NULLS FIRST""",
    "dedup_containment" ->
      """WITH g AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
                    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 150) d,
                         unnest(range(1, length(text) - 3)) r(i)),
            cnt AS (SELECT doc_id, count(*) n FROM g GROUP BY doc_id),
            inter AS (SELECT a.doc_id da, b.doc_id db, count(*) ni
                      FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id <> b.doc_id
                      GROUP BY 1, 2)
         SELECT da, db, round(c, 6) AS containment FROM (
           SELECT da, db, CAST(ni AS DOUBLE) / ca.n AS c
           FROM inter JOIN cnt ca ON ca.doc_id = da) t
         WHERE c >= 0.8
         ORDER BY da ASC NULLS FIRST, db ASC NULLS FIRST""",
    "dedup_eval" -> duckDetectorEval(duckMinhashPairsCtes, "pairs", 150),
    "dedup_eval_simhash" ->
      duckDetectorEval(duckSimhashPairsCtes, "simpairs", 450),
    "dedup_eval_winnowing" ->
      duckDetectorEval(duckWinnowPairsCtes, "wx_pairs", 150),
  )

  /** The [[detectorEval]] scaffold in SQL: emitted pairs from `emFrom`
    * (a CTE name inside `pairCtes`) capped to doc_id < 150, scored
    * against exact all-pairs ≥ 0.8 word-3-gram Jaccard truth — shared
    * verbatim by dedup_eval and dedup_eval_simhash so the two rungs
    * cannot drift apart. */
  /** The winnowing pair construction as DuckDB CTEs ending in
    * `wx_pairs(da, db)` — the dedup_winnowing oracle's construction
    * (same constants: 8-hex-char md5 3-gram hashes, W=4 min-encode,
    * full windows, >50-doc boilerplate-stop, ≥2 shared), `wx_`-prefixed
    * so it composes with the shared eval scaffold in one WITH clause. */
  // lazy: referenced from the `oracles` val above — a strict val here
  // would still be null (object-init order) when that Seq is built
  private[operators] lazy val duckWinnowPairsCtes: String =
    """wx_toks AS (
         SELECT doc_id,
                CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                unnest(string_split(text, ' ')) AS tok
         FROM documents),
       wx_g AS (
         SELECT doc_id, pos, tok,
                lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
         FROM wx_toks),
       wx_h AS (
         SELECT doc_id, pos,
                ('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 8))::BIGINT AS hh
         FROM wx_g WHERE t3 IS NOT NULL),
       wx_wnd AS (
         SELECT doc_id, pos,
                count(*) OVER (PARTITION BY doc_id) AS n_grams,
                min(hh * 2147483648 + (2147483647 - pos))
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS enc
         FROM wx_h),
       wx_fp AS (SELECT DISTINCT doc_id, CAST(enc // 2147483648 AS BIGINT) AS fp_hash
                 FROM wx_wnd WHERE pos <= n_grams - 4),
       wx_freq AS (SELECT fp_hash, count(*) AS nd FROM wx_fp GROUP BY fp_hash),
       wx_rare AS (SELECT wx_fp.doc_id, wx_fp.fp_hash FROM wx_fp
                   JOIN wx_freq USING (fp_hash) WHERE nd <= 50),
       wx_pairs AS (
         SELECT a.doc_id AS da, b.doc_id AS db
         FROM wx_rare a JOIN wx_rare b
           ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         HAVING count(*) >= 2)"""

  private def duckDetectorEval(pairCtes: String, emFrom: String,
                               cap: Int): String =
    s"""WITH $pairCtes,
          em AS (SELECT da, db FROM $emFrom WHERE da < $cap AND db < $cap),
          g2 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
                 FROM (SELECT doc_id, string_split(text, ' ') t FROM documents
                       WHERE doc_id < $cap) d2,
                      unnest(range(1, len(t) - 1)) r(i)),
          cnt2 AS (SELECT doc_id, count(*) n FROM g2 GROUP BY doc_id),
          tr AS (SELECT da, db FROM (
                   SELECT a.doc_id da, b.doc_id db, count(*) ni
                   FROM g2 a JOIN g2 b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2) i
                 JOIN cnt2 ca ON ca.doc_id = i.da
                 JOIN cnt2 cb ON cb.doc_id = i.db
                 WHERE CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) >= 0.8),
          f AS (SELECT CASE WHEN em.da IS NOT NULL THEN 1 ELSE 0 END e,
                       CASE WHEN tr.da IS NOT NULL THEN 1 ELSE 0 END t
                FROM em FULL JOIN tr ON em.da = tr.da AND em.db = tr.db)
       SELECT CAST(sum(e) AS BIGINT) AS n_emitted,
              CAST(sum(t) AS BIGINT) AS n_truth,
              CAST(sum(e * t) AS BIGINT) AS n_hit,
              CAST(CAST(sum(e * t) AS BIGINT) AS DOUBLE)
                / CAST(sum(e) AS BIGINT) AS precision,
              CAST(CAST(sum(e * t) AS BIGINT) AS DOUBLE)
                / CAST(sum(t) AS BIGINT) AS recall
       FROM f"""
}
