package graft

import org.scalatest.funsuite.AnyFunSuite

/** §7.4's core promise, executed: declared results must be IDENTICAL
  * under different physical partitioning. Each listed query — chosen
  * because its aggregates are the accumulation-order-sensitive kind —
  * is evaluated under two shuffle-partition settings and compared
  * row-for-row. A raw double sum would pass the single-run parity gate
  * and still fail here (the round-1 sink_bucketed failure mode). */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Two guarantee strengths, and the assertion matches each:
  //  - hardDeterministic: decimal/integer accumulation is exact, so any
  //    partitioning yields the same unrounded value — asserted
  //    BIT-IDENTICAL.
  //  - postRounded: raw-double accumulations whose queries round(…, 6)
  //    at the output. Order-dependent last-bit drift below 0.5e-6 is
  //    absorbed by that rounding, but an unrounded value within 1 ulp
  //    of a 6-dp rounding boundary can flip the rounded output by one
  //    step — so double cells are asserted within 1.5e-6 and everything
  //    else bit-identical. (The driver's hash gate stays exact; this
  //    spec documents the strictly-weaker cross-partitioning promise.)
  private val hardDeterministic = Seq(
    "agg_pricing_summary", // int64-micros money sums + derived avgs
    "win_running_sum",     // windowed decimal prefix sums
    "join_outer_left",     // decimal total_spent
    "ingest_incremental",  // decimal balance totals over the merged state
    "dedup_clusters",      // all-integer min labels
    "agg_moments",         // exact BIGINT power sums → double folds
    "agg_argmax",          // max-of-struct: total order on (price, key)
    "win_time_range",      // decimal frame sums over tie-prone event times
    "ingest_cdc_scd2",     // lead() over per-key integer generations
    "embed_pca",           // every aggregate 9-dp-rounded before reuse (kmeans-mirror technique)
    "udaf_topk",           // bounded-heap partial/merge — lexicographic
    "agg_weighted",        // ratios of exact decimal sums
    "text_hash_features",  // exact integer bucket counts + sqrt of exact BIGINT
    "sample_reservoir",    // md5 string rank — pure function of ids
    "events_anomaly",      // z from exact decimal s1/s2; max is order-free
    "agg_linreg",          // closed form over exact decimal co-moment sums
    "sample_weighted",     // all-integer hash-threshold membership + counts
    "events_markov",       // exact integer pair counts, exact-int division
    "text_collocations",   // integer counts; score/pmi from identical doubles
    "graph_degree",        // exact integer edge counts/weights
    "text_bm25",           // nano-quantized per-term fold; int rank tie-break
    "sim_hybrid_rrf",      // RRF of exact int ranks; fused rank tie-broken
    "sql_q17",             // exact integral-double avg gate + decimal revenue
    "sql_q8",              // exact-DECIMAL share ratio over the 7-join tree
    "sql_q1",              // spec Q1: int64-micros charge terms, exact counts
    "sql_q6",              // join-free exact-DECIMAL sum + count
    "sql_q4",              // pure integer semi-join counts
    "sql_q12",             // exact BIGINT CASE counts over the fact-fact join
    "sql_q14",             // exact-DECIMAL promo ratio (sql_q8's idiom)
    "sql_q20",             // integral-double HAVING gate; key/name output
    "dedup_containment",   // exact integer shingle counts
    "win_streak",          // all-integer island ids and counts
    "sql_window",          // decimal frame sums through the SQL surface
    "join_range_exec",     // custom sweep: exact integer band counts
    "dedup_eval",          // exact integer hit/truth counts and ratios
    "dedup_winnowing_incremental", // integer fp-match counts over md5 hashes
    "ivf_eval",            // exact integer hit counts; recall = n_hit/10
    "ivf_nprobe_curve",    // exact int hit/truth sums per radius, one division
    "text_winnowing",      // all-integer encoded min; pure row-function hashes
    "sample_curriculum",   // pure-hash ranks, all-integer key arithmetic
    "dedup_winnowing",     // exact distinct-int counts; one closing division
    "dedup_eval_winnowing", // exact integer hit/truth/emitted counts
    "join_asof_nearest",   // exact int offsets; unique (user, ts) picks
    "text_ngram_novelty",  // exact distinct-int counts; one rounded division
    "sample_kfold",        // pure-hash fold membership, integer counts
    "profile_freshness",   // exact int64 ns staleness, integer SLA compare
    "sql_insert",          // decimal sums through the catalog DML path
    "join_asof_exec",      // unique (key, time) → unambiguous latest pick
    "multimodal_audio_rms", // integer frame sums; µ-unit mean, no round()
    "events_basket",       // integer session ids, pair counts, exact ratio
    "win_ewma",            // fixed-order 10-term sum, no shuffle-order exposure
    "agg_gini",            // all-int64 rank sums, single closing division
    "events_attribution",  // integer micro-credits, exact rollup
    "text_js_divergence",  // pico-quantized KL terms, exact int64 fold
    "agg_hhi",             // exact int64 squares, single closing division
    "text_ttr",            // pure row function of the text
    "events_latency",      // int64 gaps; interpolation on identical ints
    "win_drawdown",        // frame-set max; identical-double subtraction
    "ingest_fixed_width",  // integer cents; pure string recipes
    "agg_benford",         // integer-cents digit; exact-count shares
    "agg_autocorr",        // exact decimal co-moments, closed form
    "text_repetition",     // exact int n-gram counts; identical-int divisions
    "text_chunk",          // pure row function (substring slices)
    "text_langid_eval",    // exact integer confusion counts
    "agg_chisq",           // nano-quantized int64 cell terms, exact marginals
    "graph_triangles",     // all-integer triangle corner counts
    "sql_view",            // int64-micros sums through the inlined view stack
    "agg_ttest",           // exact decimal moments, closed-form Welch t
    "agg_ks",              // all-int64 grid CDF gap, one closing division
    "win_share",           // decimal partition totals; tie-broken cume_dist
    "sql_merge",           // row-level merged state, IEEE-exact bal update
    "multimodal_frame_dedup", // all-integer frame sigs and bucket counts
    "agg_psi",             // pico-quantized int64 PSI terms, exact counts
    "graph_jaccard",       // exact integer neighbor counts, one division
    "dedup_clusters_multimodal", // all-integer min labels (3-detector graph)
    "events_forecast",     // integer hourly counts and abs errors
    "join_fuzzy",          // exact integer edit distances on a capped set
    "events_quota",        // all-integer (user, hour) counts and flags
    "events_dau_wau",      // exact distinct counts; identical-int division
    "profile_numeric",     // DECIMAL sums, min/max, null counts
    "sample_token_budget", // exact int64 prefix sums, integer budget
    "text_pii_scan",       // pure row function (regex on synthesized text)
    "sample_temperature",  // int64-quantized normalizer; identical-double pow
    "dedup_eval_embcos",   // exact int counts over the cached pair graph
    "events_rfm",          // int64 ns recency, exact-DECIMAL monetary, tie-broken ntile
    "agg_mad",             // percentile interpolation on identical ints/doubles
    "graph_components",    // all-integer min labels over the sparse graph
    "ingest_xml",          // pure round-trip of ints/strings
    "sink_zorder",         // all-integer Morton math + decimal sums
    "scan_manifest",       // integer counts + decimal sums over the pruned read
    "embed_project",       // nano-quantized int64 projection terms, one closing division
    "sample_balanced",     // md5 rank membership — pure function of the class id set
    "sink_manifest_append", // integer counts + decimal sums over the composed read
    "sql_q5",              // int64-micros revenue sums through the 6-table join
    "sql_subquery",        // exact-DECIMAL threshold; row-level semi/anti membership
    "events_sequence",     // integer session ids and triple counts, tie-broken top-10
    "profile_topk",        // integer counts, tie-broken per-column rank
    "agg_bitmap_distinct", // bitmap OR/popcount folds are order-free integers
    "dedup_url",           // pure-row canonicalization; integer count + min id
    "graph_clustering",    // integer deg/triangles; one identical-double division
    "sim_mmr",             // 9-dp re-rounded scores + struct-argmax tie-breaks
    "embed_truncate_eval", // exact integer hit counts; recall = n_hit/10
    "scan_time_travel",    // integer counts + decimal sums per snapshot
    "scan_delete_merge",   // the same over the anti-joined merge-on-read state
    "agg_listagg",         // WITHIN GROUP order makes the string total
    "sample_epochs",       // all-integer coin + copies; exact-int realized ratio
    "text_blocklist",      // pure row function (token-exact list hits)
    "events_cumulative_users", // integer first-seen days; expanding int sum
    "sql_params",          // decimal sums; literals bound pre-analysis
    "sql_lateral",         // decorrelated decimal aggregate per customer
    "multimodal_scene_detect", // int64 sig XOR/popcount; one closing division
    "sql_q18",             // exact-int quantity HAVING threshold; tie-broken LIMIT
    "sample_pack",         // all-integer interval arithmetic over the exact prefix sum
    "sample_dsir",         // nano-quantized bucket units, exact int doc sums;
                           // rank key = one IEEE division on identical ints
    "ingest_avro",         // byte round trip; ordered read-back
    "multimodal_mime",     // pure row function over ≤8 magic bytes
    "text_char_entropy",   // pico-quantized −p·ln p terms; exact int totals
    "sql_q21",             // integer waits; semi/anti membership is row-exact;
                           // tie-broken LIMIT on the unique group key
    "fn_trycast",          // pure row functions; safe_div is one IEEE
                           // division on identical doubles
    "sql_values",          // literal dim; decimal pre-cast sums; int counts
    "text_dedup_substring", // integer offset folds over md5-equality dups
    "text_boilerplate",    // pure row function (line gates + reassembly)
    "profile_observe",     // decimal pre-cast sums; observation rides along
    "sink_vacuum",         // integer counts + decimal sums over the retained snapshot
    "sql_q10",             // int64-micros revenue sums; tie-broken LIMIT 20
    "sql_q7",              // int64-micros revenue sums; fully ordered group keys
    "sql_analyze",         // stats change plans never results; micros sums
    "scan_file_metadata",  // integer counts; row_index density per file
    "events_ab_test",      // exact decimal per-user sums, Welch closed form
    "fn_mask",             // pure row functions (regex masking, md5 tokens)
    "join_asof_tol",       // unique (ts, event_id) window order; int staleness
    "text_bpe",            // exact pair counts; fully tie-broken argmax
    "text_bpe_apply",      // all-integer encode: ppm via int division, md5 fp
    "pipeline_multimodal_e2e", // all-integer rollup; L2 nano-quantized pre-sum
    "sql_q2",              // min picks an existing double; tie-broken LIMIT
    "text_quality_classifier", // int-nano weight terms, order-free int64 fold
    "sql_q19",             // int64-micros revenue sums; disjunctive row membership
    "sql_q16",             // exact distinct counts; null-aware anti membership
    "profile_kanon",       // all-integer class sizes and k-sweep counts
    "agg_bitmap_intersect", // bitmap OR/popcount folds; ppm int division
    "join_asof_fwd",       // unique (ts, event_id) window order; int lead
    "multimodal_clip_filter", // micro-quantized int64 dot/norms, one closing division
    "embed_binarize",      // pure row function: unrolled integer bit packs
    "sim_knn_hamming",     // integer XOR/popcount distances, tie-broken rank
    "hamming_eval",        // exact integer hit counts; recall = n_hit/10
    "sim_knn_rerank",      // per-row cosine on identical doubles; int shortlist
                           // order; final order tie-broken on (rounded, id)
    "sim_hard_negatives",  // per-row cosine; rank order (raw cs, vec_id) total
    "multimodal_audio_vad",// all-integer frame gates, island keys, counts
    "text_stupid_backoff", // nano-quantized int64 ln terms; exact counts
    "text_readability",    // pure row function (regex counts, fixed formula)
    "sql_q13",             // integer order counts histogrammed
    "sql_q22",             // integer-micro balances, cross-multiplied gate
    "sql_q11",             // exact-decimal sums, cross-multiplied HAVING gate
    "sql_q15",             // exact int64-micros revenue equality picks the winner
    "sql_q3",              // int64-micros revenue sums; tie-broken LIMIT 10
    "sql_q9",              // int64-micros volume sums; fully ordered group keys
    "dedup_lsh_curve",     // integer pair/candidate counts per decile
  )

  private val postRounded = Seq(
    "agg_stats",           // stddev/variance accumulation
    "sim_centroids",       // per-dimension double averages
    "text_unigram_logprob",// per-doc double log sums
    "pipeline_e2e",        // composed flow: ln()-derived gate + double avgs
    "text_bigram_lm",      // per-doc double log sums (like unigram)
    "agg_corr",            // corr/covar accumulation (like agg_stats)
    "events_sessionize_lag", // per-session double value sums (like events_session)
    "agg_entropy",         // ≤|types|-term p·ln p sums (like the LM log sums)
    "events_gap_fill",     // per-(user, hour) raw double sums (like events_session)
    "graph_pagerank",      // ≤V-term contribution sums, 9-dp re-round per iter
    "fn_geo",              // 5-call libm chain, 4-dp rounded (fn_trig tier)
    "text_quality_bucket", // unigram-logprob double sums feed the ntile;
                           // bucket strings compare EXACTLY, so an
                           // order-flip at a rounding boundary fails loudly
  )

  private def result(name: String, parts: String): Seq[org.apache.spark.sql.Row] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries(name)(spark, TestSpark.sf).collect().toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- hardDeterministic)
    test(s"$name is bit-identical under 3 vs 13 shuffle partitions") {
      assert(result(name, "3").map(_.toString) == result(name, "13").map(_.toString))
    }

  for (name <- postRounded)
    test(s"$name matches to 1.5e-6 (post-round) under 3 vs 13 shuffle partitions") {
      val (a, b) = (result(name, "3"), result(name, "13"))
      assert(a.length == b.length, s"row counts: ${a.length} vs ${b.length}")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra.length == rb.length, s"row $i arity")
        (0 until ra.length).foreach { j =>
          (ra.get(j), rb.get(j)) match {
            case (x: java.lang.Double, y: java.lang.Double) =>
              assert(math.abs(x - y) <= 1.5e-6, s"row $i col $j: $x vs $y")
            case (x, y) =>
              assert(x == y, s"row $i col $j: $x vs $y")
          }
        }
      }
    }

  // The -0.0 output convention (VERDICT r4 "what's wrong" #1): every
  // rounded output column whose domain straddles zero appends `+ 0.0`,
  // because DuckDB's round can emit -0.0 where Spark emits +0.0 — equal
  // under ==, different under the driver's typed hash. Round-trip a
  // tiny negative through the exact Spark output expression shape and
  // assert the sign bit is gone (doubleToRawLongBits distinguishes
  // what == cannot).
  test("round(x, 6) + 0.0 output path folds -0.0 to +0.0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq(-2.4e-7, -0.0, 0.0, 2.4e-7, -1.5, 1.5).toDF("x")
      .select((round(col("x"), 6) + lit(0.0)).as("r"))
      .collect().map(_.getDouble(0))
    vals.filter(_ == 0.0).foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
        s"negative zero leaked through the fold: $v")
    }
    assert(vals.count(_ == 0.0) == 4)
  }
}
