package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native CosineSimF32 expression: numerics + plan-shape guarantees. */
class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val hofCos =
    """aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)
       / (sqrt(aggregate(transform(ea, x -> CAST(x AS DOUBLE) * x), 0D, (a, v) -> a + v))
        * sqrt(aggregate(transform(eb, x -> CAST(x AS DOUBLE) * x), 0D, (a, v) -> a + v)))"""

  test("cosine_f32 is bit-identical to the HOF formula on every pair") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, TestSpark.sf).limit(100)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(expr("cosine_f32(ea, eb)").as("native"), expr(hofCos).as("hof"))
    // bit-identical, not approximately equal: both are the same left fold
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("cosine_f32 participates in whole-stage codegen") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, TestSpark.sf)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val df = a.join(b, col("ia") < col("ib"))
      .select(expr("cosine_f32(ea, eb)").as("c")).filter(col("c") > 0.4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // codegen span covers the join+filter
  }

  test("kmeans partitions the corpus and improves on the init assignment") {
    val rows = SparkEntry.queries("sim_kmeans")(spark, TestSpark.sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables.embeddings(spark, TestSpark.sf).count()
    assert(total == corpus) // every vector assigned to exactly one cluster
    assert(rows.length <= 4 && rows.forall(_.getDouble(2) >= 0.0))
  }

  test("dedup_embcos: precision 1 vs exact all-pairs; recall measured") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val got = SparkEntry.queries("dedup_embcos")(spark, TestSpark.sf)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.embeddings(spark, TestSpark.sf)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val exact = a.join(b, col("ia") < col("ib"))
      .withColumn("cos", expr("cosine_f32(ea, eb)"))
      .filter(col("cos") > 0.4)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair is a true >0.4 pair (exact verify ⇒ precision 1)
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact)}")
    // cell partitioning is lossy by design (SemDeDup); recall must be
    // nonzero and is reported for the record
    assert(exact.isEmpty || got.nonEmpty,
      s"cells found none of ${exact.size} true pairs")
    info(s"recall = ${got.size}/${exact.size}")
  }

  test("dedup_eval_embcos: precision pinned at 1, recall floor holds") {
    // the oracled detector-quality rung must agree with this spec's own
    // exact-truth measurement: precision exactly 1 (every emitted pair
    // is exact-verified), recall live but floored — a probe-width or
    // anchor-count regression that halves recall must fail loudly
    val r = SparkEntry.queries("dedup_eval_embcos")(spark, TestSpark.sf).head
    assert(r.getAs[Long]("n_truth") > 0L, "capped range holds no true pairs")
    assert(r.getAs[Double]("precision") == 1.0, r.toString)
    // round-9 floor: the 4/3/4 probe widths score 0.966 at sf0.01 and
    // 0.970 at sf0.001 (sweep table on LlmVector.ProbeCoarseCells); a
    // width regression back to the 0.59-recall r8 setting must fail
    assert(r.getAs[Double]("recall") >= 0.8, s"recall collapsed: $r")
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
  }

  test("ivf ANN returns 10 rows and overlaps brute force") {
    val knn = SparkEntry.queries("sim_knn")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("sim_knn_ivf")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    assert(knn.intersect(ivf).nonEmpty) // label cells ≠ learned clusters: partial recall
  }

  test("deployed IVF index: recall@10 floors and nprobe monotonicity") {
    // the executable version of the "by construction" ANN quality
    // claim: 20 queries against the persisted k-means index, scored
    // against exact full-corpus kNN across the nprobe ladder —
    // measured floors (0.865/0.9+ on fixtures) plus the structural
    // guarantee that probing more cells never loses recall
    import org.apache.spark.sql.expressions.Window
    val sf = TestSpark.sf
    val path = operators.LlmVector.ensureAnnIndex(spark, sf)
    def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def cosc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dotc(a, b) / (sqrt(dotc(a, a)) * sqrt(dotc(b, b)))
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20L)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("vec_id"))
    val rankedCells = spark.read.parquet(s"$path/centroids").crossJoin(broadcast(q))
      .select(col("qid"), col("cell"), cosc(col("centroid"), col("qe")).as("cc"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cc").desc, col("cell"))))
    def topAt(nprobe: Int): Set[(Long, Long)] = {
      val probed = rankedCells.filter(col("crn") <= nprobe)
        .select(col("qid"), col("cell"))
      spark.read.parquet(s"$path/cells")
        .join(broadcast(probed), Seq("cell"))
        .join(broadcast(q), Seq("qid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), cosc(col("embedding"), col("qe")).as("cs"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosc(col("embedding"), col("qe")).as("cs"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) = exact.intersect(s).size.toDouble / exact.size
    val r4 = recall(topAt(4)); val r5 = recall(topAt(5)); val r8 = recall(topAt(8))
    info(f"deployed-index recall@10: nprobe4=$r4%.3f nprobe5=$r5%.3f nprobe8=$r8%.3f")
    assert(r4 >= 0.8, f"nprobe=4 recall $r4%.3f below 0.8 floor")
    assert(r5 >= 0.85, f"nprobe=5 recall $r5%.3f below 0.85 floor")
    assert(r5 >= r4 && r8 >= r5, "recall must be monotone in nprobe")
    assert(r8 == 1.0, f"probing every cell must recover exact kNN, got $r8%.3f")
  }

  test("sim_knn_ivfpq: scores identical to flat ADC, output = top-10 of the pruned set") {
    val sf = TestSpark.sf
    val got = SparkEntry.queries("sim_knn_ivfpq")(spark, sf).collect()
    assert(got.length == 10 && got.forall(_.getLong(0) != 0L))
    // the composite must score candidates IDENTICALLY to the flat ADC
    // search — only the candidate set differs (that is the IVFPQ
    // contract: coarse pruning never changes a surviving distance)
    val full = operators.LlmVector.adcScores(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      assert(full(r.getLong(0)) == r.getDouble(1),
        s"ADC drift for vec ${r.getLong(0)}")
    }
    // pruning is real: the probed cells hold fewer vectors than the
    // corpus, and the result is exactly the top-10 of (ADC ∩ probed)
    val path = operators.LlmVector.ensureAnnIndex(spark, sf)
    val probedIds = {
      val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
        .select(col("embedding").as("qe"))
      // centroids are DOUBLE[] — use the HOF cosine the declared probe
      // uses (cosine_f32 is float-only)
      val hof =
        """aggregate(zip_with(centroid, qe, (x, y) -> x * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)
           / (sqrt(aggregate(transform(centroid, x -> x * x), 0D, (a, v) -> a + v))
            * sqrt(aggregate(transform(qe, y -> CAST(y AS DOUBLE) * y), 0D, (a, v) -> a + v)))"""
      val cells = spark.read.parquet(s"$path/centroids").crossJoin(q)
        .selectExpr("cell", s"$hof AS ccos")
        .orderBy(col("ccos").desc, col("cell")).limit(3).select("cell")
      spark.read.parquet(s"$path/cells").join(cells, Seq("cell"))
        .filter(col("vec_id") =!= 0L)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val corpusN = Tables.embeddings(spark, sf).count() - 1
    assert(probedIds.nonEmpty && probedIds.size < corpusN,
      s"pruning not real: ${probedIds.size} of $corpusN")
    val expected = full.filter(kv => probedIds(kv._1)).toSeq
      .sortBy { case (id, adc) => (adc, id) }.take(10).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == expected)
  }

  test("ann_upsert: delta conserves the batch and upserts are their own top-1") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sf = TestSpark.sf
    val counts = SparkEntry.queries("ann_upsert")(spark, sf).collect()
    // conservation: every one of the 50 batch vectors lands in exactly
    // one delta cell
    assert(counts.map(_.getLong(2)).sum == 50L, counts.mkString(","))
    val path = operators.LlmVector.ensureAnnIndex(spark, sf)
    val all = spark.read.parquet(s"$path/cells")
      .select(col("vec_id"), col("embedding"))
      .union(spark.read.parquet(s"$path/delta_cells")
        .select(col("vec_id"), col("embedding")))
    // an upserted vector queried against the COMBINED index must return
    // itself as exact top-1 (cos = 1 with itself; the +0.25 dim-0 shift
    // breaks parallelism with its source vector)
    val q = spark.read.parquet(s"$path/delta_cells")
      .filter(col("vec_id") === 1000007L).select(col("embedding").as("qe"))
    val top = all.crossJoin(broadcast(q))
      .select(col("vec_id"), expr("cosine_f32(embedding, qe)").as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(1).collect()
    assert(top.head.getLong(0) == 1000007L, top.mkString(","))
  }

  test("ann_upsert is idempotent: re-invocation reuses the published delta") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sf = TestSpark.sf
    val first = SparkEntry.queries("ann_upsert")(spark, sf).collect().toSeq
    val path = operators.LlmVector.ensureAnnIndex(spark, sf)
    val marker = new java.io.File(s"$path/delta_cells/_DONE")
    assert(marker.exists(), "atomic publish must leave the _DONE marker")
    val stamp = marker.lastModified()
    val second = SparkEntry.queries("ann_upsert")(spark, sf).collect().toSeq
    assert(second == first, "re-invocation changed the declared output")
    // the published delta was REUSED, not rebuilt — the round-6 advice:
    // a query evaluation must not overwrite shared state as a side
    // effect, or a concurrent reader can observe partial directories
    assert(marker.lastModified() == stamp,
      "re-invocation rewrote the delta instead of reusing it")
  }

  test("embed_project scores are centered, non-degenerate, and unit-direction-bounded") {
    val sf = TestSpark.sf
    val pc = SparkEntry.queries("embed_project")(spark, sf)
      .collect().map(_.getAs[Double]("pc1"))
    // centered data projected on any fixed direction has ~zero mean
    // (exact up to the 9-dp mean rounding and nano-quantization)
    assert(math.abs(pc.sum / pc.length) < 1e-3,
      s"projection not centered: mean ${pc.sum / pc.length}")
    assert(pc.max > pc.min, "projection collapsed to a constant")
    // |w| = 1 after the fit's normalization, so |pc1| <= max ||x - m||
    val maxNorm = Tables.embeddings(spark, sf)
      .select(expr("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0.0D, (a, b) -> a + b))").as("n"))
      .agg(org.apache.spark.sql.functions.max(col("n"))).collect()(0).getDouble(0)
    // centering shifts norms by at most ||m|| (small); 1.5x covers it
    assert(pc.forall(v => math.abs(v) <= 1.5 * maxNorm),
      s"projection exceeds the Cauchy-Schwarz bound: ${pc.maxBy(math.abs)}")
  }

  test("binary-code ladder: code sanity, recall floor, and rerank dominates the raw Hamming rank") {
    val sf = TestSpark.sf
    // embed_binarize: each 32-bit half stays in [0, 2^32), n_pos = total
    // set bits across both halves (the packing and the popcount must
    // count the SAME >= 0 convention)
    val codes = SparkEntry.queries("embed_binarize")(spark, sf).collect()
    assert(codes.forall { r =>
      val (hi, lo) = (r.getLong(1), r.getLong(2))
      hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32) &&
        java.lang.Long.bitCount(hi) + java.lang.Long.bitCount(lo) == r.getLong(3)
    }, "code half out of range or popcount drift")
    // hamming_eval: the deployed 64-bit sign code must beat noise —
    // random top-10 of ~500 candidates recalls ~0.02; floor at 0.1
    val ev = SparkEntry.queries("hamming_eval")(spark, sf)
      .agg(avg(col("recall_at_10"))).collect()(0).getDouble(0)
    assert(ev >= 0.1, s"mean Hamming recall@10 $ev below floor")
    // rerank law (provable, asserted as a regression tripwire): every
    // exact-top-10 member that survives the Hamming shortlist is kept
    // by the cosine rerank, so rerank recall >= raw-Hamming-top-10
    // recall for the same query
    val exact = SparkEntry.queries("sim_knn")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rerank = SparkEntry.queries("sim_knn_rerank")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val hamTop = SparkEntry.queries("sim_knn_hamming")(spark, sf)
      .filter(col("qid") === 0L).collect().map(_.getLong(2)).toSet
    assert((rerank & exact).size >= (hamTop & exact).size,
      s"rerank recall ${(rerank & exact).size} < raw Hamming ${(hamTop & exact).size}")
    // and on this fixture the cascade must genuinely help (not both 0)
    assert((rerank & exact).size >= 5, s"rerank overlap ${(rerank & exact).size}")
  }

  test("ivf_nprobe_curve is monotone and ends at recall exactly 1.0") {
    // the two provable curve laws: widening the probe set can only add
    // candidates (recall non-decreasing in radius), and radius 3 probes
    // ALL 8 grid cells so the approx ranking IS the exact ranking —
    // terminal recall must be exactly 1.0, not approximately
    val rows = SparkEntry.queries("ivf_nprobe_curve")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3), "radii 0..3")
    assert(rows.map(_._2).toSeq == Seq(1, 4, 7, 8), "nprobe 1/4/7/8 of 8")
    assert(rows.sliding(2).forall { case Array(a, b) => b._5 >= a._5 },
      s"recall not monotone: ${rows.map(_._5).toSeq}")
    assert(rows.last._4 == rows.last._3 && rows.last._5 == 1.0,
      s"full probe must recall everything: ${rows.last}")
    // and every radius retrieves over the same ground truth
    assert(rows.map(_._3).distinct.length == 1, "n_exact differs per radius")
  }

  test("sim_hybrid_rrf fuses both legs and both-leg docs outrank every single-leg doc") {
    // the provable RRF constant law: min both-leg score 2/(60+10) =
    // 0.02857 > max single-leg score 1/(60+1) = 0.01639, so ANY doc in
    // both top-10s must rank above ANY single-leg doc for its query
    val fused = SparkEntry.queries("sim_hybrid_rrf")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(fused.nonEmpty)
    fused.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._2)
      // scores are non-increasing in fused rank
      assert(byRank.map(_._4).sliding(2).forall(p => p(0) >= p(1) - 1e-12),
        s"qid $qid: rrf not monotone in rank")
      val worstBoth = rows.filter(_._5 == 2L).map(_._2).maxOption
      val bestSingle = rows.filter(_._5 == 1L).map(_._2).minOption
      (worstBoth, bestSingle) match {
        case (Some(wb), Some(bs)) =>
          assert(wb < bs, s"qid $qid: single-leg doc at rank $bs above a both-leg doc at $wb")
        case _ => ()
      }
    }
    // the fusion is genuinely hybrid on the fixture: at least one query
    // surfaces docs from both legs in its fused top-10
    assert(fused.exists(_._5 == 2L) || {
      // degenerate fixtures may have disjoint legs; then every doc is
      // single-leg and the law above is vacuous — require both LEGS
      // present instead (some docs from bm25, some from cosine)
      val bm = SparkEntry.queries("text_bm25")(spark, TestSpark.sf)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      fused.exists(t => bm.contains((t._1, t._3))) &&
        fused.exists(t => !bm.contains((t._1, t._3)))
    }, "fusion degenerated to a single leg")
  }

  test("anchorsFitOf on a bounded hash sample: the 100 TB training path stays usable") {
    // the FitPointsPerAnchor cap (FAISS max_points_per_centroid): past
    // n = 256·√n the anchors train on a 1-in-m hash sample instead of the
    // full corpus (O(n) instead of O(n^1.5)). The cap can't bind on any
    // fixture, so exercise the sampled branch directly: fit on the same
    // deterministic 1-in-4 md5 sample the ensure path would draw, then
    // assign EVERY vector — the fit must yield k usable, distinct anchors
    // that partition the full corpus without empty assignments.
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val dim = 8; val n = 500; val k = 6
    // deterministic synthetic corpus: 6 well-separated centers + per-id wobble
    val vecs = (0 until n).map { i =>
      val c = i % k
      (i.toLong, Array.tabulate(dim)(j =>
        (if (j == c) 10.0f else 0.0f) + ((i * 31 + j * 7) % 5) * 0.01f))
    }.toDF("vec_id", "embedding")
    val m = 4L
    val sample = vecs.filter(
      conv(substring(md5(col("vec_id").cast("string")), 1, 12), 16, 10)
        .cast("long") % m === 0L)
    val nSample = sample.count()
    assert(nSample > k && nSample < n / 2,
      s"hash sample out of range: $nSample of $n")
    val anchors = operators.LlmVector.anchorsFitOf(sample, k, iters = 2).collect()
    assert(anchors.length == k, s"expected $k anchors, got ${anchors.length}")
    assert(anchors.map(_.getInt(0)).distinct.length == k, "anchor ids must be distinct")
    // every full-corpus vector assigns to a nearest sampled-fit anchor,
    // and the fit recovered the cluster structure: >= k-1 distinct cells
    // populated (one center could theoretically merge under sampling)
    val aDf = spark.createDataFrame(java.util.Arrays.asList(anchors: _*),
      anchors.head.schema)
    val asg = vecs
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .crossJoin(broadcast(aDf))
      .groupBy(col("vec_id"))
      .agg(min(struct(
        aggregate(zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"), col("cid"))).as("mn"))
      .select(col("mn.cid"))
    assert(asg.count() == n, "every vector must assign")
    assert(asg.distinct().count() >= k - 1,
      "sampled fit must recover the cluster structure")
  }
}
