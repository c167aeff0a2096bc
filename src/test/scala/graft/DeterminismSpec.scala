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

  private val sensitive = Seq(
    "agg_pricing_summary", // DECIMAL-pre-cast money sums + derived avgs
    "agg_stats",           // stddev/variance accumulation
    "win_running_sum",     // windowed decimal prefix sums
    "sim_centroids",       // per-dimension double averages
    "text_unigram_logprob",// per-doc double log sums
    "join_outer_left",     // decimal total_spent
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
