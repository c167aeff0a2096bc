package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The session-lifetime DataFrame memo used by every fingerprint-keyed
  * cache (minhash/simhash shingles and pair graphs, converged cluster
  * labels, embcos pairs, PQ codebooks): entries key on (session, logical
  * name, fixture fingerprint), and — the round-9 policy — a lookup that
  * MISSES because the fingerprint changed EVICTS the superseded entry
  * for the same (session, name) before building the fresh one.
  *
  * Without eviction a fixture regenerated mid-session (the driver did
  * exactly that in round 7) leaves the old entry's persisted blocks
  * pinned in executor storage for the life of the JVM — invisible on
  * fixtures, an executor-memory leak at 100 TB artifact sizes. Eviction
  * frees BOTH storage forms the builders use:
  *   - `persist()`ed lineages via `DataFrame.unpersist` (cache-manager
  *     entries), and
  *   - `localCheckpoint()`ed results, whose blocks belong to the
  *     backing RDD, not the cache manager — found by collecting
  *     [[org.apache.spark.sql.execution.LogicalRDD]] leaves from the
  *     analyzed plan and unpersisting their RDDs.
  * Non-blocking on both paths: eviction must never stall the fresh
  * build that triggered it. */
private[graft] final class FingerprintCache {
  private val m =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  private def free(df: DataFrame): Unit = {
    try df.unpersist(blocking = false) catch { case _: Throwable => () }
    try df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(r => r.unpersist(blocking = false))
    catch { case _: Throwable => () }
  }

  def getOrElseUpdate(s: SparkSession, name: String, fp: String)
                     (build: => DataFrame): DataFrame = {
    m.keysIterator
      .filter(k => k._1 == s && k._2 == name && k._3 != fp)
      .foreach(k => m.remove(k).foreach(free))
    m.getOrElseUpdate((s, name, fp), build)
  }

  /** Test hook: live fingerprints for one (session, name). */
  private[graft] def fingerprintsFor(s: SparkSession, name: String): Set[String] =
    m.keysIterator.collect { case (`s`, `name`, fp) => fp }.toSet
}
