package graft

import org.apache.spark.sql.SparkSession

/** The canonical inventory of once-per-(session, fixture) artifact and
  * cache builds — everything a rung body may trigger as a side effect
  * the first time it is invoked (ScratchParquet artifacts, persisted
  * pair graphs, converged labels, layout copies). Factored out of
  * Bench (round-16 ADVICE item 5) so the two consumers share one list:
  *
  *   - Bench runs it untimed-but-itemized before the timed loop, so
  *     steady-state per-query numbers exclude exactly these named
  *     steps and a reader of the builds JSON line can see what they
  *     cost;
  *   - PlanSpec's whole-surface plan sweep runs it FIRST, so capturing
  *     every query's optimizedPlan is deterministic and cheap instead
  *     of order-dependent on which earlier spec happened to warm which
  *     scratch artifact.
  *
  * Each step is timed individually; NON-fatal failures are absorbed
  * but FLAGGED (a build that fails still surfaces in the query that
  * needs it, with its own error — the warm-up must never mask that
  * attribution — but the step's record says failed instead of emitting
  * a misleadingly tiny elapsed time, round-18 ADVICE item 4). Fatal
  * errors (OutOfMemoryError, InterruptedException...) propagate: after
  * one of those the JVM can't be trusted to keep benchmarking. */
object Warmup {
  /** ONE spelling of the timed-step convention, shared with Bench's
    * session_init/jit_* steps: seconds elapsed plus a succeeded flag,
    * NonFatal-only so a fatal error (OOM) aborts instead of running on
    * in a broken JVM. */
  def step(out: scala.collection.mutable.Growable[(String, Double, Boolean)],
           name: String)(body: => Unit): Unit = {
    val t0 = System.nanoTime()
    val ok = try { body; true }
             catch { case scala.util.control.NonFatal(_) => false }
    out += ((name, (System.nanoTime() - t0) / 1e9, ok))
  }

  /** Run every named build; returns (name, seconds, succeeded) per step. */
  def all(spark: SparkSession, sfDir: String): Seq[(String, Double, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Double, Boolean)]()
    def build(name: String)(body: => Unit): Unit = step(out, name)(body)
    // Fingerprint-keyed one-time artifact builds (ANN index, embcos
    // anchor cells, DPP layout): on a cold scratch dir these would
    // otherwise be silently absorbed by whichever query runs first.
    build("ann_index") { operators.LlmVector.ensureAnnIndex(spark, sfDir) }
    build("embcos_anchors") { operators.LlmVector.ensureEmbcosAnchors(spark, sfDir) }
    build("dpp_layout") { operators.Scans.ensureDppLayout(spark, sfDir) }
    build("compact_fragments") { operators.Scans.ensureCompactFragments(spark, sfDir) }
    build("manifest_layout") { operators.Scans.ensureManifestLayout(spark, sfDir) }
    build("manifest_delta") { operators.Scans.ensureManifestDelta(spark, sfDir) }
    build("manifest_delete") { operators.Scans.ensureManifestDelete(spark, sfDir) }
    build("trade_edges") { operators.Graph.tradeEdgesCached(spark, sfDir).count() }
    // the shared gram base (round-15 advice item 2): ONE tokenize+md5
    // pass feeding minhash signatures, winnowing, the novelty table,
    // and the incremental index — warmed here so no single consumer's
    // timing absorbs the whole corpus pass
    build("gram_base") { operators.LlmText.gramsCached(spark, sfDir).count() }
    build("minhash_index") { operators.LlmText.ensureMinhashIndex(spark, sfDir) }
    build("winnow_index") { operators.LlmText.ensureWinnowIndex(spark, sfDir) }
    build("winnow_fps") { operators.LlmText.winnowFps(spark, sfDir).count() }
    // the shared pair graphs — round 17: ScratchParquet artifacts, so
    // on a warm scratch dir these read finished parquet instead of
    // re-running the detector pipelines (6.6 + 3.1 + 12.0 s at sf0.1)
    build("minhash_pairs") { operators.LlmText.minhashPairsCached(spark, sfDir).count() }
    build("simhash_pairs") { operators.LlmText.simhashPairsCached(spark, sfDir).count() }
    build("embcos_pairs") { operators.LlmVector.embcosPairsCached(spark, sfDir).count() }
    // the converged-cluster labels (round 17: also a ScratchParquet
    // artifact — the 4-round propagation runs once per fixture
    // generation, later JVMs read the finished label table)
    for (q <- Seq("dedup_clusters", "dedup_clusters_all",
                  "dedup_clusters_multimodal"))
      build(s"labels_$q") {
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    out.toSeq
  }
}
