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

  // NOTE on the guarantee's strength: the decimal-cast queries
  // (agg_pricing_summary, win_running_sum, join_outer_left) are hard-
  // deterministic — decimal addition is exact, so any partitioning
  // yields the same unrounded value. The raw-double ones (agg_stats,
  // sim_centroids, text_unigram_logprob, pipeline_e2e) are deterministic
  // POST-ROUNDING only: their queries round(…, 6) at the output, and
  // order-dependent last-bit drift below 0.5e-6 is absorbed by that
  // rounding. An unrounded sum landing within 1 ulp of a 6-dp rounding
  // boundary could in principle still flip — accepted and documented
  // here rather than masked with an epsilon, because the driver's hash
  // compare is exact on the same rounded values.
  private val sensitive = Seq(
    "agg_pricing_summary", // DECIMAL-pre-cast money sums + derived avgs
    "agg_stats",           // stddev/variance accumulation
    "win_running_sum",     // windowed decimal prefix sums
    "sim_centroids",       // per-dimension double averages
    "text_unigram_logprob",// per-doc double log sums
    "join_outer_left",     // decimal total_spent
    "pipeline_e2e",        // composed flow: ln()-derived gate + double avgs
    "ingest_incremental",  // decimal balance totals over the merged state
    "dedup_clusters",      // all-integer min labels — hard-deterministic
    "agg_moments",         // exact BIGINT power sums → double folds — hard-deterministic
    "agg_argmax",          // max-of-struct: total order on (price, key) — hard
    "win_time_range",      // decimal frame sums over tie-prone event times
    "text_bigram_lm",      // per-doc double log sums (post-rounding, like unigram)
    "ingest_cdc_scd2",     // lead() over per-key integer generations — hard
    "embed_pca",           // every aggregate 9-dp-rounded before reuse (kmeans-mirror technique)
    "agg_corr",            // corr/covar accumulation (post-rounding, like agg_stats)
    "udaf_topk",           // bounded-heap partial/merge — lexicographic, hard-deterministic
  )

  private def rows(name: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries(name)(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- sensitive)
    test(s"$name is bit-identical under 3 vs 13 shuffle partitions") {
      assert(rows(name, "3") == rows(name, "13"))
    }
}
