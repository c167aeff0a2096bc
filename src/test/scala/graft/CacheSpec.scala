package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The round-9 fingerprint-cache eviction policy: a lookup that misses
  * because the fixture fingerprint changed must EVICT the superseded
  * (session, name) entry — unpersisting its blocks — instead of
  * accumulating stale persisted state for the life of the JVM (the
  * driver regenerated a fixture mid-session in round 7; at 100 TB
  * artifact sizes a leaked pair graph pins executor storage). */
class CacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("FingerprintCache evicts persisted entries on fingerprint change") {
    val c = new operators.FingerprintCache
    val df1 = spark.range(100).toDF("v").persist(StorageLevel.MEMORY_AND_DISK)
    df1.count()
    assert(c.getOrElseUpdate(spark, "k", "fp1")(df1) eq df1)
    assert(df1.storageLevel != StorageLevel.NONE)
    val df2 = spark.range(200).toDF("v").persist(StorageLevel.MEMORY_AND_DISK)
    assert(c.getOrElseUpdate(spark, "k", "fp2")(df2) eq df2)
    assert(c.fingerprintsFor(spark, "k") == Set("fp2"),
      "stale fingerprint must be dropped from the map")
    assert(df1.storageLevel == StorageLevel.NONE,
      "superseded entry's persisted blocks must be unpersisted")
    // an unrelated name is untouched
    val other = spark.range(5).toDF("v").persist(StorageLevel.MEMORY_AND_DISK)
    c.getOrElseUpdate(spark, "other", "fpX")(other)
    c.getOrElseUpdate(spark, "k", "fp2")(fail("cached — builder must not run"))
    assert(c.fingerprintsFor(spark, "other") == Set("fpX"))
    df2.unpersist(); other.unpersist()
  }

  test("FingerprintCache frees localCheckpoint blocks too") {
    val c = new operators.FingerprintCache
    val df1 = spark.range(50).toDF("v").localCheckpoint()
    val rddIds = df1.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(rddIds.nonEmpty, "localCheckpoint must leave a LogicalRDD leaf")
    assert(rddIds.forall(spark.sparkContext.getPersistentRDDs.contains),
      "checkpoint blocks should be persistent before eviction")
    c.getOrElseUpdate(spark, "lc", "fp1")(df1)
    val df2 = spark.range(60).toDF("v").localCheckpoint()
    c.getOrElseUpdate(spark, "lc", "fp2")(df2)
    assert(rddIds.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "superseded localCheckpoint RDD must be unpersisted")
  }

  test("regenerated fixture evicts the stale minhash pair graph") {
    val base = s"${Tables.scratchDir}/cache_spec_fixture"
    def writeDocs(texts: Seq[String]): Unit = {
      val sp = spark
      import sp.implicits._
      val tmp = s"$base/_tmp"
      // source column: the shared gram base (LlmText.gramsCached)
      // carries it for the novelty consumer, so the synthetic fixture
      // needs the real table's shape
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"src${i % 3}") }
        .toDF("doc_id", "text", "source").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      // Tables.fingerprint needs a FILE at <dir>/documents.parquet (the
      // driver fixtures are single files): move the lone part file there
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$base/documents.parquet")
      dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
    }
    // generation 1: 12 IDENTICAL docs → every pair verifies at jaccard 1
    writeDocs(Seq.fill(12)("alpha beta gamma delta epsilon zeta eta theta"))
    val p1 = operators.LlmText.minhashPairsCached(spark, base)
    assert(p1.count() == 12L * 11L / 2L)
    assert(p1.storageLevel != StorageLevel.NONE)
    val fps1 = operators.LlmText.pairCacheFingerprints(spark, s"$base#mhp")
    assert(fps1.size == 1)
    // generation 2, SAME path: pairwise-disjoint token sets → zero pairs.
    // Both generations share one canonicalized plan (same parquet file),
    // so without eviction p2.persist() would no-op against the stale
    // entry ("already cached") and serve generation-1 blocks — the
    // content assertion below is the actual staleness gate, storage
    // levels can't see it.
    writeDocs(Seq.tabulate(15)(i =>
      (0 to 7).map(j => s"tok_${i}_$j").mkString(" ")))
    val p2 = operators.LlmText.minhashPairsCached(spark, base)
    val fps2 = operators.LlmText.pairCacheFingerprints(spark, s"$base#mhp")
    assert(fps2.size == 1, s"stale entry survived: $fps2")
    assert(fps2 != fps1, "regenerated fixture must key a fresh entry")
    assert(p2.count() == 0L,
      "pair graph served stale generation-1 cached blocks")
    assert(p2.storageLevel != StorageLevel.NONE)
  }

  test("regenerated fixture evicts the stale BPE fit (driver-held memo)") {
    // the bpeFit memo holds a driver-side Seq, not a DataFrame, but the
    // round-9 eviction policy applies the same: a changed fingerprint
    // must drop the superseded entry, not accumulate one per generation
    val base = s"${Tables.scratchDir}/cache_spec_bpe"
    def writeDocs(texts: Seq[String]): Unit = {
      val sp = spark
      import sp.implicits._
      val tmp = s"$base/_tmp"
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$base/documents.parquet")
      dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
    }
    writeDocs(Seq.fill(8)("a b a b a b c d a b"))
    val fit1 = operators.LlmText.bpeFit(spark, base)
    assert(fit1.nonEmpty)
    assert(fit1.exists(r => r._2 == "a" && r._3 == "b"))
    val fps1 = operators.LlmText.bpeFitFingerprints(spark, base)
    assert(fps1.size == 1)
    writeDocs(Seq.fill(8)("x y x y x y z w x y"))
    val fit2 = operators.LlmText.bpeFit(spark, base)
    val fps2 = operators.LlmText.bpeFitFingerprints(spark, base)
    assert(fit2.exists(r => r._2 == "x" && r._3 == "y"),
      "fit must reflect the regenerated corpus, not the stale one")
    assert(fps2.size == 1, s"stale fit entry survived: $fps2")
    assert(fps2 != fps1, "regenerated fixture must key a fresh entry")
    // a DIFFERENT fixture dir's slot is untouched by this eviction
    // (the keying regression the dir slot exists to prevent) — the
    // test-SF fit, if the suite already built one, must still be live
    val otherFps = operators.LlmText.bpeFitFingerprints(spark, TestSpark.sf)
    operators.LlmText.bpeFit(spark, TestSpark.sf)
    assert(operators.LlmText.bpeFitFingerprints(spark, TestSpark.sf).size == 1)
    if (otherFps.nonEmpty)
      assert(operators.LlmText.bpeFitFingerprints(spark, TestSpark.sf) == otherFps,
        "evicting one fixture's fit must not thrash another fixture's slot")
  }

  test("ScratchParquet: build-once, warm read, version/fp invalidation") {
    val sp = spark
    import sp.implicits._
    val d = s"${Tables.scratchDir}/cache_spec_scratch_fixture"
    new java.io.File(d).mkdirs()
    var builds = 0
    def build() = { builds += 1
      Seq((1L, 0.5, "a"), (2L, 0.25, "b")).toDF("id", "x", "s") }
    // cold: builds and persists
    val r1 = operators.ScratchParquet.ensure(spark, "cachespec_art", d, "fpA")(build())
    assert(builds == 1)
    assert(r1.orderBy("id").collect().map(_.toSeq.toList).toList ==
      List(List(1L, 0.5, "a"), List(2L, 0.25, "b")))
    // warm: SAME (name, fp, version) must NOT rebuild — reads the artifact
    val r2 = operators.ScratchParquet.ensure(spark, "cachespec_art", d, "fpA")(
      { builds += 1; fail("warm read must not invoke the builder") })
    assert(builds == 1)
    assert(r2.schema == r1.schema, "schema must round-trip exactly")
    // zero-row artifacts round-trip (pair graph with no near-dups)
    val e1 = operators.ScratchParquet.ensure(spark, "cachespec_empty", d, "fpA")(
      Seq.empty[(Long, Long)].toDF("da", "db"))
    assert(e1.count() == 0 && e1.schema.fieldNames.toList == List("da", "db"))
    // new fingerprint: rebuilds AND deletes the superseded generation
    operators.ScratchParquet.ensure(spark, "cachespec_art", d, "fpB")(build())
    assert(builds == 2)
    val dirs = Option(new java.io.File(Tables.scratchDir).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(_.startsWith("cachespec_art_cache_spec_scratch_fixture_")).toList
    assert(dirs.length == 1 && dirs.head.contains("fpB"),
      s"stale generation must be cleaned up, saw: $dirs")
  }
}
