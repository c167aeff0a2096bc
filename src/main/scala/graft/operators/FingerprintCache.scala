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

/** Fingerprint-keyed scratch-parquet artifacts — the ensureWinnowIndex
  * posture generalized (round-16 verdict item 1): expensive derived
  * tables that are a pure function of (fixture, construction) are
  * written ONCE per (sf dir, fixture fingerprint, construction version)
  * and re-read as a plain parquet scan by every later JVM. The
  * in-memory [[FingerprintCache]] still fronts them (persist + eviction
  * semantics unchanged); this layer just replaces "rebuild the whole
  * detector pipeline on every JVM start" with "columnar scan of the
  * finished artifact" — measured 0.000 s warm for the winnowing index,
  * vs 6–16 s per pair graph rebuilt from scratch each Bench/Verify run.
  * On a real cluster the same artifacts live in the shared object
  * store, written by the ingest job and read by everyone.
  *
  * Three policies the ensure* builders established, kept here:
  *   - `_DONE` marker: a crashed half-write is rebuilt, never served.
  *   - construction-version salt in the path (round-16 ADVICE item 2):
  *     a semantic change to how an artifact is built — new radix, new
  *     distinct basis, new threshold — MUST invalidate artifacts
  *     persisted by older code, or a warm scratch dir silently serves
  *     stale answers. Bump [[ScratchParquet.ConstructionVersion]]
  *     whenever any persisted construction changes.
  *   - stale-generation cleanup: artifacts for superseded fingerprints
  *     or versions of the same (name, sf) are deleted before the fresh
  *     build, so a regenerating fixture can't grow scratch unboundedly.
  *
  * The result schema is stored alongside the data (`schema.json`) and
  * applied explicitly on read: zero-row artifacts (a pair graph with no
  * near-dups is a legitimate answer) round-trip correctly even when the
  * writer emitted no part files, and re-reads skip footer inference. */
private[graft] object ScratchParquet {
  /** Salt folded into every artifact path. Bump on ANY semantic change
    * to a persisted construction (detector constants, hash radix,
    * distinct basis, verify threshold...). */
  val ConstructionVersion = "c17"

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** Build-or-read: returns a DataFrame backed by the persisted
    * artifact. `name` must be unique per construction; `fp` is the
    * fixture fingerprint (or a composite for multi-fixture builds). */
  def ensure(s: SparkSession, name: String, d: String, fp: String)
            (build: => DataFrame): DataFrame = {
    val base = new java.io.File(d).getName
    val prefix = s"${name}_${base}_"
    val dir = new java.io.File(graft.Tables.scratchDir,
      s"$prefix${fp}_$ConstructionVersion")
    val done = new java.io.File(dir, "_DONE")
    if (!done.exists()) {
      // evict superseded generations of this artifact first (stale
      // fingerprint or stale construction version)
      Option(new java.io.File(graft.Tables.scratchDir).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) && f.getName != dir.getName)
        .foreach(rmTree)
      val df = build
      df.write.mode("overwrite").parquet(s"$dir/data")
      java.nio.file.Files.write(dir.toPath.resolve("schema.json"),
        df.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      done.createNewFile()
    }
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(dir.toPath.resolve("schema.json")),
        java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    s.read.schema(schema).parquet(s"$dir/data")
  }
}
