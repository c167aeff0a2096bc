package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws (SURVEY.md §5.5) checked on the sf0.001 fixtures. */
class LawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("dedup is idempotent: dedup output has no duplicate norms") {
    val out = SparkEntry.queries("dedup_exact")(spark, sf)
    assert(out.count() == out.select(col("doc_id")).distinct().count())
  }

  test("union-all count additivity") {
    val a = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
    val b = Tables.orders(spark, sf).filter(col("o_orderstatus") =!= "F")
    assert(a.count() + b.count() == a.unionByName(b).count())
    assert(a.unionByName(b).count() == Tables.orders(spark, sf).count())
  }

  test("exceptAll inverts unionAll on bags") {
    val a = Tables.orders(spark, sf).select(col("o_orderpriority"))
    val b = a.limit(100)
    assert(a.unionByName(b).exceptAll(b).count() == a.count())
  }

  test("running sum final value equals group sum") {
    val run = SparkEntry.queries("win_running_sum")(spark, sf)
    val lastPer = run.groupBy(col("o_custkey"))
      .agg(max(col("running_spent")).as("final_sum"))
    val direct = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      // same DECIMAL pre-cast as the operator so both sides round the
      // identical exact sum
      .agg(round(sum(expr("CAST(o_totalprice AS DECIMAL(18,6))")).cast("double"), 4)
        .as("direct_sum"))
    val joined = lastPer.join(direct, "o_custkey")
      .filter(abs(col("final_sum") - col("direct_sum")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("cosine(v, v) == 1 for every embedding") {
    val e = Tables.embeddings(spark, sf)
    val selfCos = e.select(
      expr("""aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y),
              0D, (acc, v) -> acc + v)
              / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (a, v) -> a + v))
               * sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (a, v) -> a + v)))""")
        .as("c"))
    assert(selfCos.filter(abs(col("c") - 1.0) > 1e-12).count() == 0)
  }

  test("minhash candidates are a superset of exact near-dup pairs (recall)") {
    val got = SparkEntry.queries("dedup_near_minhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs Jaccard >= 0.8 via the ngram machinery on word shingles
    val docs = Tables.documents(spark, sf)
      .withColumn("t", split(col("text"), " "))
      // same <3-token guard as the operator: sequence(0, size-3) DESCENDS
      // for shorter docs and would fabricate null-padded shingles here
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("s"))
      .distinct()
    val cnt = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = docs.select(col("doc_id").as("da"), col("s"))
      .join(docs.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("ni").cast("double") / (col("na") + col("nb") - col("ni")) >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == got, s"missed: ${exact.diff(got)}, extra: ${got.diff(exact)}")
  }

  for ((graphName, pairsOf) <- Seq(
    "minhash" -> (() => operators.LlmText.minhashPairs(spark, sf)),
    "minhash∪simhash" -> (() => operators.LlmText.minhashPairs(spark, sf)
      .select(col("da"), col("db"))
      .union(operators.LlmText.simhashPairs(spark, sf).select(col("da"), col("db")))
      .distinct())))
  test(s"dedup_clusters($graphName): 4 label-prop rounds are a fixed point; clusters tile the pair graph") {
    val pairs = pairsOf()
      .select(col("da"), col("db")).persist()
    val sym = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
    def labels(iters: Int): Set[(Long, Long)] =
      operators.LlmText.labelProp(sym, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l4 = labels(4)
    // convergence certificate: the declared 4 rounds already reached the
    // true connected components (one more round changes nothing)
    assert(labels(5) == l4)
    // every edge is intra-cluster, every survivor is its cluster's min
    val lab = l4.toMap
    pairs.collect().foreach { r =>
      assert(lab(r.getLong(0)) == lab(r.getLong(1)))
    }
    l4.groupBy(_._2).foreach { case (survivor, members) =>
      assert(members.map(_._1).min == survivor)
    }
    pairs.unpersist()
  }

  test("topk5 rejects wrong arity at analysis with the expected signature") {
    graft.functions.TopKAgg.ensureRegistered(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk5(o_totalprice) FROM (SELECT 1.0 AS o_totalprice)")
        .collect()
    }
    assert(e.getMessage.contains("topk5"), e.getMessage)
  }

  test("text_quality_bucket_approx agrees with the exact thirds within the sketch's rank error") {
    val exact = SparkEntry.queries("text_quality_bucket")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val approx = SparkEntry.queries("text_quality_bucket_approx")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val n = approx.length
    assert(n == exact.size)
    // bucket sizes within the GK sketch's rank error (n/10^4, floor 2 —
    // boundary ties can move at most that many docs across a cut)
    val tol = math.max(2L, n / 10000L)
    val sizes = approx.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    for (b <- Seq("head", "middle", "tail")) {
      val want = n / 3L
      assert(math.abs(sizes.getOrElse(b, 0L) - want) <= tol + 1,
        s"$b: ${sizes.getOrElse(b, 0L)} vs ~$want ± $tol")
    }
    // bucketing is monotone in score by construction: every head score
    // >= every middle score >= every tail score
    def scoresOf(b: String) = approx.filter(_._3 == b).map(_._2)
    assert(scoresOf("head").min >= scoresOf("middle").max)
    assert(scoresOf("middle").min >= scoresOf("tail").max)
    // disagreement with the exact rung is confined to cut boundaries:
    // count it and bound it by the two cuts' combined rank error
    val moved = approx.count { case (id, _, b) => exact(id) != b }
    assert(moved <= 2 * (tol + 1), s"$moved docs changed bucket")
  }

  test("events_rfm_approx agrees with the exact quintiles within tie mass + rank error") {
    val exact = SparkEntry.queries("events_rfm")(spark, sf).collect()
    val approx = SparkEntry.queries("events_rfm_approx")(spark, sf).collect()
    val n = approx.length
    assert(n == exact.length && n > 0)
    assert(exact.head.schema == approx.head.schema, "twin must mirror the exact schema")
    val tol = math.max(2L, n / 10000L) // GK rank error at accuracy 10⁴
    // value-threshold scoring is monotone by construction: sorting by
    // the dimension value must sort the score (exact-int dims only;
    // monetary is rounded in the output so ties there are ambiguous)
    val byR = approx.sortBy(r => (r.getLong(1), r.getLong(0)))
    assert(byR.sliding(2).forall(p => p(0).getLong(4) <= p(1).getLong(4)),
      "r_score not monotone in r_hours")
    val byF = approx.sortBy(r => (-r.getLong(2), r.getLong(0)))
    assert(byF.sliding(2).forall(p => p(0).getLong(5) <= p(1).getLong(5)),
      "f_score not monotone in frequency")
    // disagreement with the exact ntile is confined to quintile
    // boundaries: bounded by the boundary-value tie mass (ntile splits
    // equal values by user_id, a threshold keeps them together) plus
    // the sketch's rank error per cut
    def movedBound(dim: Int, value: Row => Long, asc: Boolean): Unit = {
      val exactByUser = exact.map(r => r.getLong(0) -> r.getLong(dim)).toMap
      val moved = approx.count(r => r.getLong(dim) != exactByUser(r.getLong(0)))
      val ties = (1L to 4L).map { k =>
        val bucket = exact.filter(_.getLong(dim) == k).map(value)
        if (bucket.isEmpty) 0L
        else {
          val boundary = if (asc) bucket.max else bucket.min
          exact.count(value(_) == boundary).toLong
        }
      }.sum
      assert(moved <= ties + 8 * tol,
        s"dim $dim: $moved moved > tie mass $ties + 8·$tol")
    }
    movedBound(4, _.getLong(1), asc = true)   // r_score vs r_hours
    movedBound(5, _.getLong(2), asc = false)  // f_score vs frequency
    // monetary: compare via the rounded output value (ties on the
    // rounded value are a superset of ties on the exact DECIMAL)
    val exactM = exact.map(r => r.getLong(0) -> r.getLong(6)).toMap
    val movedM = approx.count(r => r.getLong(6) != exactM(r.getLong(0)))
    val tiesM = (1L to 4L).map { k =>
      val bucket = exact.filter(_.getLong(6) == k).map(_.getDouble(3))
      if (bucket.isEmpty) 0L else exact.count(_.getDouble(3) == bucket.min).toLong
    }.sum
    assert(movedM <= tiesM + 8 * tol, s"m_score: $movedM moved > $tiesM + 8·$tol")
  }

  test("sample_dsir_approx shares exact weights and agrees with the exact quarter at the boundary") {
    val exact = SparkEntry.queries("sample_dsir")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val approx = SparkEntry.queries("sample_dsir_approx")(spark, sf).collect()
    val n = approx.length
    assert(n == exact.size && n > 0)
    // the twin differs ONLY in selection: n_tokens, w_nano, imp_nano
    // must be bit-identical per doc (shared dsirPerDoc construction)
    approx.foreach { r =>
      val e = exact(r.getLong(0))
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2) &&
             r.getLong(3) == e.getLong(3), s"weights diverged for doc ${r.getLong(0)}")
    }
    // threshold selection is separated by construction: every selected
    // importance >= every unselected importance
    def imp(r: Row): Double = r.getLong(2).toDouble / r.getLong(1).toDouble
    val selImp = approx.filter(_.getBoolean(4)).map(imp)
    val unselImp = approx.filterNot(_.getBoolean(4)).map(imp)
    assert(selImp.nonEmpty && unselImp.nonEmpty, "selection must split the corpus")
    assert(selImp.min >= unselImp.max, "threshold separation violated")
    // disagreement with the exact rank-based quarter is confined to the
    // boundary: ties at the exact rung's last-selected importance plus
    // the sketch's rank error
    val tol = math.max(2L, n / 10000L)
    val exactSel = exact.values.filter(_.getBoolean(4)).toSeq
    val boundary = exactSel.map(imp).min
    val ties = exact.values.count(r => imp(r) == boundary).toLong
    val moved = approx.count(r => r.getBoolean(4) != exact(r.getLong(0)).getBoolean(4))
    assert(moved <= ties + 2 * tol, s"$moved docs changed selection > $ties + 2·$tol")
  }

  test("split_cluster_aware eliminates the leakage split_leakage_audit measures") {
    val audit = SparkEntry.queries("split_leakage_audit")(spark, sf).collect()(0)
    assert(audit.getLong(0) > 0L, "no near-dup pairs — the audit is vacuous")
    assert(audit.getLong(3) > 0L,
      "the hash split leaks nothing on this fixture — the fix has nothing to show")
    val fixed = SparkEntry.queries("split_cluster_aware")(spark, sf).collect()(0)
    // zero by construction on converged labels (an entire cluster
    // shares one hash side)
    assert(fixed.getLong(5) == 0L, s"cluster-aware split still leaks: $fixed")
    // and the split stays a real ~10% split — cluster-level hashing
    // moves only the near-dup mass, not the whole corpus
    val valShare = fixed.getLong(2).toDouble / fixed.getLong(0)
    assert(valShare > 0.05 && valShare < 0.15, s"val share drifted: $valShare")
  }

  test("labelPropUntilFixed agrees with the unrolled form on the fixture graph") {
    val pairs = operators.LlmText.minhashPairs(spark, sf)
      .select(col("da"), col("db")).persist()
    val sym = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
    val edges = sym.union(sym.select(col("src"), col("src").as("dst")).distinct())
      .persist()
    val unrolled = operators.LlmText.labelPropEdges(edges, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = operators.LlmText.labelPropUntilFixed(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixed == unrolled)
    pairs.unpersist(); edges.unpersist()
  }

  test("multiLabelProp slices agree with per-graph labelProp on all three fixture graphs") {
    // the round-15 consolidation contract: one conditional-aggregate
    // pass over the tagged union graph must reproduce, exactly, the
    // three independent 4-round propagations it replaced
    val combined = operators.LlmText
      .multiLabelProp(operators.LlmText.taggedUnionEdges(spark, sf), iters = 4)
      .persist()
    def slice(c: String): Set[(Long, Long)] = combined
      .filter(col(c).isNotNull).select(col("v"), col(c))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def independent(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val p = pairs.select(col("da"), col("db"))
      val sym = p.select(col("da").as("src"), col("db").as("dst"))
        .union(p.select(col("db").as("src"), col("da").as("dst")))
      operators.LlmText.labelProp(sym, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val mh = operators.LlmText.minhashPairs(spark, sf)
    val sh = operators.LlmText.simhashPairs(spark, sf)
    val em = operators.LlmVector.embcosPairsCached(spark, sf)
      .select(col("ia").as("da"), col("ib").as("db"))
    assert(slice("lm") == independent(mh))
    assert(slice("la") == independent(
      mh.select(col("da"), col("db")).union(sh.select(col("da"), col("db"))).distinct()))
    assert(slice("lu") == independent(
      mh.select(col("da"), col("db")).union(sh.select(col("da"), col("db")))
        .union(em).distinct()))
    combined.unpersist()
  }

  test("labelPropUntilFixed converges on a diameter-10 chain the 4-round unroll cannot") {
    // 0-1-2-…-10: min label 0 needs 10 hops to reach vertex 10; the
    // bounded form stops early by design, the guarded form must not
    import spark.implicits._
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("da", "db").persist()
    val sym = chain.select(col("da").as("src"), col("db").as("dst"))
      .union(chain.select(col("db").as("src"), col("da").as("dst")))
    val edges = sym.union(sym.select(col("src"), col("src").as("dst")).distinct())
      .persist()
    val fixed = operators.LlmText.labelPropUntilFixed(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixed == (0L to 10L).map(v => (v, 0L)).toSet)
    val bounded = operators.LlmText.labelPropEdges(edges, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded != fixed) // the gap the convergence guard closes
    chain.unpersist(); edges.unpersist()
  }

  test("simhash chunk buckets have recall 1 vs all-pairs hamming (pigeonhole)") {
    // recompute the 60-bit signatures exactly as the operator does, then
    // compare its bucketed candidate pairs with the O(n²) reference
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("hv", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { b =>
      sum(shiftright(col("hv"), b).bitwiseAND(1L) * 2L - 1L).as(s"v$b")
    }
    val sig = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"v$b") > 0L, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allPairs = (for {
      (da, sa) <- sig; (db, sb) <- sig if da < db
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (da, db)).toSet
    val got = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == allPairs, s"missed: ${allPairs.diff(got)}, extra: ${got.diff(allPairs)}")
  }

  test("embed_quantize round-trip error is bounded by scale/2") {
    val out = SparkEntry.queries("embed_quantize")(spark, sf)
      .select(col("vec_id"), col("lo"), col("qscale"),
        split(col("q"), ",").cast("array<double>").as("qs"))
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    // dequant = lo + q·scale must sit within half a quantization step of
    // the original for every in-range dim (clamping only affects values
    // outside [lo, hi], which cannot exist for per-vector lo/hi)
    val bad = out.join(orig, "vec_id")
      .withColumn("err", expr(
        """aggregate(zip_with(qs, e, (qv, x) -> abs(lo + qv * qscale - x)),
           0D, (m, v) -> greatest(m, v))"""))
      .filter(col("err") > col("qscale") * 0.5 + lit(1e-12))
    assert(bad.count() == 0)
  }

  test("approx_count_distinct lands within its rsd of exact") {
    val got = SparkEntry.queries("agg_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rsd is 0.01; allow 3 standard deviations
    for ((k, e) <- exact) {
      val a = got(k)
      assert(math.abs(a - e).toDouble / e <= 0.03, s"$k: approx $a exact $e")
    }
  }

  test("approx quantiles bracket the exact neighborhood quantiles") {
    val got = SparkEntry.queries("agg_approx_quantiles")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap // p50
    val bounds = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.40)").as("lo"),
           expr("percentile(value, 0.60)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((k, (lo, hi)) <- bounds) {
      val p50 = got(k)
      assert(p50 >= lo && p50 <= hi, s"$k: approx p50 $p50 outside [$lo, $hi]")
    }
  }

  test("hll union of per-group sketches equals the direct global sketch") {
    val ev = Tables.events(spark, sf)
    val viaUnion = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)"))
      .collect()(0).getLong(0)
    val direct = ev.agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS BIGINT)"))
      .collect()(0).getLong(0)
    assert(viaUnion == direct) // merge transparency: union of partials == whole
    val exact = ev.select(col("user_id")).distinct().count()
    assert(math.abs(direct - exact).toDouble / exact <= 0.05,
      s"est $direct vs exact $exact")
  }

  test("count-min estimates dominate exact counts; sketch is partition-invariant") {
    graft.functions.CountMinAgg.ensureRegistered(spark)
    import graft.functions.CountMinAgg.{DEPTH, WIDTH}
    val t = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // merge order must not matter: same sketch under different partitioning
    val sk2 = t.repartition(2).agg(expr("countmin(tok)")).collect()(0).getSeq[Long](0)
    val sk16 = t.repartition(16).agg(expr("countmin(tok)")).collect()(0).getSeq[Long](0)
    assert(sk2 == sk16)
    // one-sided error: est >= exact tf for EVERY term (the CMS guarantee)
    val sk = t.agg(expr("countmin(tok)").as("sk"))
    val est = (0 until DEPTH).map { i =>
      element_at(col("sk"),
        (lit(i.toLong * WIDTH) +
          conv(substring(md5(col("tok")), 1 + 8 * i, 8), 16, 10).cast("long") % WIDTH
          + 1L).cast("int"))
    }.reduce(least(_, _))
    val bad = t.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(sk))
      .withColumn("est", est)
      .filter(col("est") < col("tf"))
    assert(bad.count() == 0)
  }

  test("kmeans inertia is monotonically non-increasing over Lloyd iterations") {
    def inertia(iters: Int): Double =
      operators.LlmVector.kmeansFit(spark, sf, k = 4, iters = iters)
        .agg(sum(col("d2"))).collect()(0).getDouble(0)
    val i0 = inertia(0); val i1 = inertia(1); val i3 = inertia(3)
    assert(i1 <= i0 + 1e-9, s"$i1 > $i0")
    assert(i3 <= i1 + 1e-9, s"$i3 > $i1")
  }

  test("text_normalize is idempotent (normalized text is a fixpoint)") {
    val out = SparkEntry.queries("text_normalize")(spark, sf)
    val renorm = out.select(col("doc_id"),
      regexp_replace(trim(regexp_replace(lower(col("norm_text")), "[^a-z0-9 ]", "")),
        " +", " ").as("again"), col("norm_text"))
    assert(renorm.filter(col("again") =!= col("norm_text")).count() == 0)
  }

  test("hash split partitions the corpus exactly") {
    val out = SparkEntry.queries("split_train_val")(spark, sf)
    val total = out.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("text_scrub is idempotent and never leaves denylist tokens") {
    val out = SparkEntry.queries("text_scrub")(spark, sf)
    val deny = Seq("fast", "slow", "dup", "value")
    val leftover = out.filter(
      size(filter(split(col("scrubbed"), " "), t => t.isin(deny: _*))) > 0)
    assert(leftover.count() == 0)
    // re-scrubbing scrubbed text changes nothing ('[x]' is not denylisted)
    val rescrub = out.select(col("doc_id"), col("scrubbed"),
      array_join(transform(split(col("scrubbed"), " "),
        t => when(t.isin(deny: _*), lit("[x]")).otherwise(t)), " ").as("again"))
    assert(rescrub.filter(col("again") =!= col("scrubbed")).count() == 0)
  }

  test("intersect and except partition a distinct set") {
    val a = Tables.customer(spark, sf).select(col("c_custkey")).distinct()
    val b = Tables.orders(spark, sf).select(col("o_custkey").as("c_custkey")).distinct()
    assert(a.intersect(b).count() + a.except(b).count() == a.count())
  }

  test("embed_pca: unit eigenvector, Rayleigh quotient non-decreasing under power iteration") {
    // collect the scatter once; check (a) the declared loadings are a
    // unit vector (up to output rounding), (b) power iteration improved
    // the Rayleigh quotient over the flat init — the mathematical
    // guarantee of the method for a symmetric PSD scatter matrix
    val cm = Array.ofDim[Double](64, 64)
    // round-19: the scatter ships the upper triangle; mirror is exact
    operators.LlmVector.pcaScatter(spark, sf).collect()
      .foreach { r =>
        cm(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        cm(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
      }
    def rayleigh(v: Array[Double]): Double = {
      val cv = Array.tabulate(64)(i => (0 until 64).map(j => cm(i)(j) * v(j)).sum)
      (0 until 64).map(i => v(i) * cv(i)).sum / v.map(x => x * x).sum
    }
    val w = SparkEntry.queries("embed_pca")(spark, sf)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    val norm = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
    val w0 = Array.fill(64)(0.125)
    assert(rayleigh(w) >= rayleigh(w0) - 1e-9,
      s"rayleigh(w3)=${rayleigh(w)} < rayleigh(w0)=${rayleigh(w0)}")
  }

  test("geomean aggregator matches exp(avg(ln)) closed form") {
    val got = SparkEntry.queries("udaf_geomean")(spark, sf)
    val expected = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(round(exp(avg(log(col("l_extendedprice")))), 6).as("closed_form"))
    val bad = got.join(expected, "l_returnflag")
      .filter(abs(col("geomean_price") - col("closed_form")) > 1e-6)
    assert(bad.count() == 0)
  }

  test("RangeJoinExec sweep emits exactly the builtin band-join pairs") {
    // the custom operator vs Spark's own planning of the same predicate
    // (SMJ on key + post-join band filter) — bag equality on full rows
    val hourNs = 3600L * 1000L * 1000L * 1000L
    val a = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("event_id").as("a_event_id"), col("user_id").as("a_user_id"),
        col("ts").as("a_ts"))
    val b = Tables.events(spark, sf)
      .select(col("user_id").as("b_user_id"), col("ts").as("b_ts"))
    val custom = graft.plans.RangeJoin.rangeJoin(a, b,
      "a_user_id", "b_user_id", "a_ts", "b_ts", 0L, hourNs)
    val builtin = a.join(b,
      col("a_user_id") === col("b_user_id") &&
        col("b_ts") > col("a_ts") && col("b_ts") <= col("a_ts") + lit(hourNs))
      .select(custom.columns.map(col).toSeq: _*)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(custom) == bag(builtin))
  }

  test("RangeJoinExec hot key spills instead of OOM and stays exact") {
    // one key with 4096 right rows under tiny SMJ buffer thresholds —
    // the row-count threshold forces ExternalAppendOnlyUnsafeRowArray
    // onto its spill path (a spill every 1024 adds), and the sweep must
    // still emit exactly the builtin band-join pairs. Kept small on
    // purpose: every per-left-row probe of a spilled buffer re-opens
    // one ~1 MB reader per spill file (SMJ pays the same), so #files ×
    // #probes bounds the test's allocation churn.
    import spark.implicits._
    val lhs = (0 until 50).map(i => (1L, i.toLong * 80, s"L$i"))
      .toDF("lk", "lt", "lv")
    val rhs = (0 until 4096).map(i => (1L, i.toLong, s"R$i"))
      .toDF("rk", "rt", "rv")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", 32)
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", 1024)
    try {
      val custom = graft.plans.RangeJoin.rangeJoin(
        lhs, rhs, "lk", "rk", "lt", "rt", 0L, 40L)
      val builtin = lhs.join(rhs, col("lk") === col("rk") &&
        col("rt") > col("lt") && col("rt") <= col("lt") + lit(40L))
        .select(custom.columns.map(col).toSeq: _*)
      def bag(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
      assert(bag(custom) == bag(builtin))
      // as-of through the same spilled buffer: latest-only, one row per left
      val asof = graft.plans.RangeJoin.asofJoin(
        lhs, rhs, "lk", "rk", "lt", "rt", maxLag = 500L)
      val expect = lhs.join(rhs, col("lk") === col("rk") &&
          col("rt") >= col("lt") - lit(500L) && col("rt") < col("lt"))
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("lk"), col("lt")).orderBy(col("rt").desc)))
        .filter(col("rn") === 1).drop("rn")
        .select(asof.columns.map(col).toSeq: _*)
      assert(bag(asof) == bag(expect))
    } finally {
      spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
      spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    }
  }

  test("RangeJoin drops NULL keys/times instead of matching them as 0") {
    // SQL semantics: NULL never equi-matches — including genuine key-0
    // rows on the other side (the getLong-reads-NULL-as-0 hazard)
    import spark.implicits._
    val lhs = Seq((Some(0L), Some(10L), "a"), (None: Option[Long], Some(20L), "b"),
        (Some(0L), None: Option[Long], "c"), (Some(2L), Some(10L), "d"))
      .toDF("lk", "lt", "lv")
    val rhs = Seq((Some(0L), Some(15L), "x"), (None: Option[Long], Some(25L), "y"),
        (Some(2L), Some(12L), "z"))
      .toDF("rk", "rt", "rv")
    val custom = graft.plans.RangeJoin.rangeJoin(
      lhs, rhs, "lk", "rk", "lt", "rt", 0L, 50L)
    val builtin = lhs.join(rhs, col("lk") === col("rk") &&
      col("rt") > col("lt") && col("rt") <= col("lt") + lit(50L))
      .select(custom.columns.map(col).toSeq: _*)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(custom) == bag(builtin))
    // the NULL-key left row matched nothing
    assert(custom.filter(col("lv") === "b" || col("lv") === "c").count() == 0)
  }

  test("PQ codes cover every (vector, subspace) once, in range, beating the k=1 baseline") {
    val fit = operators.LlmVector.pqFit(spark, sf).persist()
    val nVec = Tables.embeddings(spark, sf).count()
    // exactly one code per (vector, subspace); codes in [0, 16)
    assert(fit.count() == nVec * 4)
    assert(fit.filter(col("cid") < 0 || col("cid") >= 16).count() == 0)
    // total distortion must beat quantizing every subvector to the
    // global per-subspace mean (the k=1 codebook) — Lloyd can't be
    // worse than the degenerate baseline it starts ahead of
    val pqD = fit.agg(sum(col("d2"))).head().getDouble(0)
    val base = fit.select(col("j"), col("vj"), posexplode(col("vj")))
      .groupBy(col("j"), col("pos")).agg(avg(col("col")).as("mu"),
        sum(col("col") * col("col")).as("ss"), count(lit(1)).as("n"))
      // Σ(x−μ)² per (subspace, dim) = Σx² − n·μ²
      .select((col("ss") - col("n") * col("mu") * col("mu")).as("v"))
      .agg(sum(col("v"))).head().getDouble(0)
    assert(pqD <= base + 1e-6, s"pq distortion $pqD worse than k=1 baseline $base")
    fit.unpersist(); ()
  }

  test("PQ ADC obeys the triangle inequality through the reconstruction") {
    // √‖q−v‖ ≤ √ADC(q,v) + √‖v−v̂‖ for EVERY vector — the metric-space
    // guarantee that holds regardless of codebook quality
    val fit = operators.LlmVector.pqFit(spark, sf).persist()
    val q = fit.filter(col("vec_id") === 0L)
      .select(col("j"), col("vj").as("qj"))
    val per = fit.filter(col("vec_id") =!= 0L)
      .join(broadcast(q), "j")
      .select(col("vec_id"),
        expr("aggregate(zip_with(vj, qj, (a, b) -> (a - b) * (a - b)), 0D, (x, y) -> x + y)").as("ex"),
        expr("aggregate(zip_with(cv, qj, (a, b) -> (a - b) * (a - b)), 0D, (x, y) -> x + y)").as("adc"),
        col("d2"))
      .groupBy(col("vec_id"))
      .agg(sum(col("ex")).as("exact"), sum(col("adc")).as("adc"), sum(col("d2")).as("rec"))
    val bad = per.filter(sqrt(col("exact")) > sqrt(col("adc")) + sqrt(col("rec")) + 1e-9)
    assert(bad.count() == 0)
    fit.unpersist(); ()
  }

  test("asof sweep equals the window composition on matched rows") {
    val viaExec = SparkEntry.queries("join_asof_exec")(spark, sf)
    val viaWindow = SparkEntry.queries("join_asof")(spark, sf)
      .filter(col("prev_click_value").isNotNull)
    assert(viaExec.collect().map(_.toString).sorted.toSeq ==
      viaWindow.collect().map(_.toString).sorted.toSeq)
  }

  test("asof nearest picks the true time-minimum purchase within tolerance") {
    // independent ground truth: for each click, scan ALL purchases of
    // that user and take min |Δt| (ties → the earlier purchase) — the
    // window composition must match it row for row
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val purchByUser = ev.filter(_._3 == "purchase").groupBy(_._2)
    val truth = ev.filter(_._3 == "click").map { case (id, u, _, t, _) =>
      val cands = purchByUser.getOrElse(u, Array.empty)
        .map { case (_, _, _, pt, pv) => ((pt - t) / 1000000000L, pv, pt) }
        .filter { case (off, _, pt) => math.abs(if (pt >= t) (pt - t) / 1000000000L else -((t - pt) / 1000000000L)) <= 3600 }
      if (cands.isEmpty) id -> None
      else {
        // exact integer offsets, floor-div like the operator
        val scored = cands.map { case (_, pv, pt) =>
          val off = if (pt >= t) (pt - t) / 1000000000L else -((t - pt) / 1000000000L)
          (math.abs(off), off <= 0, off, pv) // backward (off<=0) wins ties
        }
        val best = scored.minBy { case (a, back, _, _) => (a, !back) }
        id -> Some((best._3, best._4))
      }
    }.toMap
    val got = SparkEntry.queries("join_asof_nearest")(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(4))
        Some((r.getLong(3), r.getDouble(2))) else None)).toMap
    assert(got.keySet == truth.keySet, "click set mismatch")
    val diffs = got.filter { case (k, v) => truth(k) != v }
    assert(diffs.isEmpty, s"nearest disagrees with scan truth: ${diffs.take(3)}")
  }

  test("compression ratio is a repetitiveness signal (bounded; tracks TTR)") {
    val cr = SparkEntry.queries("text_compress_ratio")(spark, sf)
      .select(col("doc_id"), col("ratio"))
    // deflate's worst case is stored blocks + header — on the ~50-byte
    // shortest docs that overhead can reach ~13%, never 50%
    val r = cr.agg(min(col("ratio")).as("lo"), max(col("ratio")).as("hi")).head()
    assert(r.getDouble(0) > 0.0 && r.getDouble(1) < 1.5, r.toString)
    // semantic check: the 50 most-repetitive docs by TTR compress
    // better on average than the 50 most-diverse
    val ttr = SparkEntry.queries("text_ttr")(spark, sf)
      .select(col("doc_id"), col("ttr"))
    val j = cr.join(ttr, "doc_id").orderBy(col("ttr")).collect()
    val low = j.take(50).map(_.getDouble(1))
    val high = j.takeRight(50).map(_.getDouble(1))
    assert(low.sum / low.length < high.sum / high.length,
      s"repetitive docs should compress better: ${low.sum / low.length} vs ${high.sum / high.length}")
  }

  test("pagerank mass: teleport floor per node; total in [(1-d), 1]") {
    // every node keeps at least the teleport share (1-d)/n, so total
    // mass is ≥ (1-d); it is ≤ 1, with equality only when no node is
    // dangling (at sf0.001 most nations have no out-edges, so the leak
    // is large and legitimate — the bounds must hold on ANY graph)
    val r = SparkEntry.queries("graph_pagerank")(spark, sf)
      .agg(min(col("pagerank")).as("lo"), sum(col("pagerank")).as("mass"))
      .head()
    assert(r.getDouble(0) >= 0.15 / 25 - 1e-6, s"floor violated: ${r.getDouble(0)}")
    assert(r.getDouble(1) <= 1.0 + 25 * 1e-6 && r.getDouble(1) >= 0.15 - 1e-4,
      s"mass out of range: ${r.getDouble(1)}")
  }

  test("multimodal clustering: every detector pair lands in one converged cluster") {
    // the defining property of the cross-modal union: at the label-prop
    // FIXED POINT, both endpoints of every minhash, simhash, AND embcos
    // pair carry the same label (4-round declared output is oracled
    // separately; convergence is what makes the membership claim exact)
    import graft.operators.{LlmText, LlmVector}
    val mh = LlmText.minhashPairsCached(spark, sf).select(col("da"), col("db"))
    val sh = LlmText.simhashPairsCached(spark, sf).select(col("da"), col("db"))
    val em = LlmVector.embcosPairsCached(spark, sf)
      .select(col("ia").as("da"), col("ib").as("db"))
    val pairs = mh.union(sh).union(em).distinct()
    // self-loops make the min-over-neighbors rule include the node's own
    // label (monotone → true fixed point) — the symEdges construction
    val sym0 = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
    val sym = sym0.union(sym0.select(col("src"), col("src").as("dst")).distinct())
    val lab = LlmText.labelPropUntilFixed(sym)
    val split = pairs
      .join(lab.select(col("v").as("da"), col("lab").as("la")), "da")
      .join(lab.select(col("v").as("db"), col("lab").as("lb")), "db")
      .filter(col("la") =!= col("lb")).count()
    assert(split == 0, s"$split pairs split across converged clusters")
  }

  test("welchT is antisymmetric under class swap; ksDistance is symmetric") {
    val ev = Tables.events(spark, sf)
    val ab = graft.api.GraftOps.welchT(ev, col("event_type"), col("value"),
      "click", "purchase").head()
    val ba = graft.api.GraftOps.welchT(ev, col("event_type"), col("value"),
      "purchase", "click").head()
    assert(ab.getLong(0) == ba.getLong(1) && ab.getLong(1) == ba.getLong(0))
    assert(math.abs(ab.getDouble(2) + ba.getDouble(2)) < 1e-9, "mean_diff")
    assert(math.abs(ab.getDouble(3) + ba.getDouble(3)) < 1e-9, "t_stat")
    assert(ab.getDouble(4) == ba.getDouble(4), "df invariant under swap")
    val k1 = graft.api.GraftOps.ksDistance(ev, col("event_type"), col("value"),
      "click", "purchase").head()
    val k2 = graft.api.GraftOps.ksDistance(ev, col("event_type"), col("value"),
      "purchase", "click").head()
    assert(k1.getDouble(2) == k2.getDouble(2), "KS must be symmetric")
  }

  test("KS distance of a distribution against itself is exactly zero") {
    // c1 == c2 in every grid bucket when both classes are the same
    // label, so the all-integer CDF gap is identically 0 — any nonzero
    // value would mean the fold itself leaks partitioning noise
    val r = graft.api.GraftOps.ksDistance(Tables.events(spark, sf),
      col("event_type"), col("value"), "click", "click").head()
    assert(r.getDouble(2) == 0.0, r.toString)
  }

  test("triangle corner counts sum to a multiple of 3") {
    // every triangle contributes exactly its 3 corners — a sum not
    // divisible by 3 would mean a triangle was counted asymmetrically
    val total = SparkEntry.queries("graph_triangles")(spark, sf)
      .agg(sum(col("n_triangles"))).head().getLong(0)
    assert(total % 3 == 0, s"corner sum $total not divisible by 3")
  }

  test("docs sharing an identical first frame are flagged as dup candidates") {
    // the near-dup fixture docs share long prefixes: two docs with the
    // same first 64 chars produce byte-identical frame 0 → identical
    // signatures → that bucket spans >= 2 docs → BOTH docs must report
    // n_dup_frames >= 1 (recall direction of the LSH-bucket contract;
    // precision is the verify pass's job, not the bucketer's)
    val twins = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 64)
      .groupBy(substring(col("text"), 1, 64).as("p"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
    val fd = SparkEntry.queries("multimodal_frame_dedup")(spark, sf)
    val covered = fd.join(twins, "doc_id").count()
    val bad = fd.join(twins, "doc_id").filter(col("n_dup_frames") < 1).count()
    assert(covered > 0, "fixture should contain prefix-twin docs >= 64 chars")
    assert(bad == 0, s"$bad prefix-twin docs with zero flagged frames")
  }

  test("join_fuzzy_blocked: blocked canonical map equals the exact all-pairs map on the capped range") {
    // precision is 1 by construction (exact Levenshtein verify after
    // blocking), so the only thing blocking can get wrong is RECALL —
    // a missed neighbor shows up as a canon_pk larger than the exact
    // one. On the capped range the exact all-pairs map is computable:
    // the two must agree, and blocked counts can never exceed exact.
    val full = Tables.part(spark, sf)
      .select(col("p_partkey").as("pk"), col("p_name").as("nm"))
    // left side capped (the entities under test), right side the FULL
    // table — the blocked query resolves capped entities against every
    // part, so the exact reference must see the same candidate pool
    val exact = full.filter(col("pk") < 300)
      .select(col("pk").as("pa"), col("nm").as("na"))
      .crossJoin(full.select(col("pk").as("pb"), col("nm").as("nb")))
      .filter(levenshtein(col("na"), col("nb")) <= 2)
      .groupBy(col("pa"))
      .agg(min(col("pb")).as("canon_pk"),
        countDistinct(when(col("pb") =!= col("pa"), col("pb"))).as("n_fuzzy"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val blocked = SparkEntry.queries("join_fuzzy_blocked")(spark, sf)
      .filter(col("pk") < 300)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(blocked.keySet == exact.keySet,
      s"entity sets differ: ${blocked.keySet.diff(exact.keySet)} / ${exact.keySet.diff(blocked.keySet)}")
    val subsetOk = blocked.forall { case (k, (c, n)) =>
      c >= exact(k)._1 && n <= exact(k)._2 } // blocking can only LOSE pairs
    assert(subsetOk, "blocked found a pair exact did not — precision broken")
    assert(blocked == exact,
      s"blocking missed pairs on the capped range: ${blocked.toSet.diff(exact.toSet).take(5)}")
  }

  test("graph_components: 6 rounds are the fixed point on the sparse trade graph; edges stay intra-component") {
    // all three fixture SFs: the graph is ≤2|V| edges at any scale, so
    // certifying the bench fixture (sf0.1) too costs only the one edge
    // aggregation pass
    for (dir <- Seq(TestSpark.sf, "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val sym = operators.Graph.sparseSymEdges(spark, dir).persist()
      def labels(iters: Int): Map[Int, Int] =
        operators.LlmText.labelProp(sym, iters)
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val l6 = labels(6)
      // convergence certificate: the declared 6 rounds already reached
      // the true connected components (one more round changes nothing)
      assert(labels(7) == l6, s"round 7 still changes labels at $dir")
      // every sparse edge connects same-component endpoints
      sym.collect().foreach { r =>
        assert(l6(r.getInt(0)) == l6(r.getInt(1)),
          s"edge (${r.getInt(0)}, ${r.getInt(1)}) crosses components at $dir")
      }
      // the declared query's comp_size tiles |V|
      val out = SparkEntry.queries("graph_components")(spark, dir).collect()
      assert(out.map(_.getAs[Int]("nationkey")).toSet.size == 25)
      val byComp = out.groupBy(_.getAs[Int]("component"))
      byComp.foreach { case (comp, members) =>
        assert(members.head.getAs[Long]("comp_size") == members.length.toLong)
        assert(members.map(_.getAs[Int]("nationkey")).min == comp,
          s"component label $comp is not its min member at $dir")
      }
      sym.unpersist()
    }
  }

  test("events_rfm: quintiles balanced ±1, scores monotone in their metric, segment is the digit concat") {
    val rows = SparkEntry.queries("events_rfm")(spark, sf).collect()
    val n = rows.length
    assert(n > 5)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val counts = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.size).toMap
      assert(counts.keySet == (1L to 5L).toSet, s"$c buckets: ${counts.keySet}")
      assert(counts.values.max - counts.values.min <= 1,
        s"$c unbalanced: $counts")
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}${r.getAs[Long]("m_score")}")
      assert(r.getAs[Long]("r_hours") >= 0L)
    }
    // a strictly better metric can never land in a strictly worse bucket
    for (a <- rows; b <- rows) {
      if (a.getAs[Long]("frequency") > b.getAs[Long]("frequency"))
        assert(a.getAs[Long]("f_score") <= b.getAs[Long]("f_score"))
      if (a.getAs[Long]("r_hours") < b.getAs[Long]("r_hours"))
        assert(a.getAs[Long]("r_score") <= b.getAs[Long]("r_score"))
    }
  }

  test("sample_balanced: every class cut to exactly the minority size") {
    val out = SparkEntry.queries("sample_balanced")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kMin = counts.values.min
    val perLang = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(perLang.keySet == counts.keySet, "a class vanished or appeared")
    perLang.foreach { case (lang, n) =>
      assert(n == kMin, s"$lang kept $n, expected minority size $kMin")
    }
    // kept ids really belong to their class
    val ids = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (lang, id) => assert(ids(id) == lang) }
  }

  test("agg_mad: mad nonnegative; at least half of each lang's docs lie within mad of the median") {
    val stats = SparkEntry.queries("agg_mad")(spark, sf).collect()
    assert(stats.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    stats.foreach { r =>
      val (lang, n) = (r.getAs[String]("lang"), r.getAs[Long]("n_docs"))
      val (med, mad) = (r.getAs[Double]("median"), r.getAs[Double]("mad"))
      val out = r.getAs[Long]("n_outliers")
      assert(mad >= 0.0 && out >= 0L && out < n)
      // median-of-deviations property (1e-6 absorbs the 6-dp output round)
      val within = docs.count { case (l, x) =>
        l == lang && math.abs(x - med) <= mad + 1e-6 }
      assert(within * 2 >= n, s"$lang: only $within of $n within mad of median")
    }
  }

  test("profile_observe: metrics arrive via a listener, equal an independent aggregation, and leave the result unchanged") {
    val seen = new java.util.concurrent.LinkedBlockingQueue[(Long, Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get("graft_ingest_metrics").foreach { r =>
          seen.put((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null_cust"),
            r.getAs[Long]("n_domain_bad")))
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val res = SparkEntry.queries("profile_observe")(spark, sf).collect()
      // the listener fires asynchronously after the action completes
      val m = seen.poll(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(m != null, "observed metrics never reached the listener")
      val o = Tables.orders(spark, sf)
      val exp = (o.count(),
        o.filter(col("o_custkey").isNull).count(),
        o.filter(col("o_totalprice") <= 0.0).count())
      assert(m == exp, s"observed $m != independent $exp")
      // and the observation must not perturb the query result
      val plain = o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(expr("CAST(o_totalprice AS DECIMAL(18,6))")).cast("double"), 4)
            .as("revenue"))
        .orderBy(col("o_orderpriority")).collect()
      assert(res.toSeq.map(_.toString) == plain.toSeq.map(_.toString))
    } finally spark.listenerManager.unregister(listener)
  }

  test("text_bpe: training invariants hold and merges never repeat") {
    val out = SparkEntry.queries("text_bpe")(spark, sf).collect()
    assert(out.length == 6)
    val counts = out.map(_.getAs[Long]("pair_count"))
    val totals = out.map(_.getAs[Long]("tokens_after"))
    assert(counts.forall(_ >= 1L), "a selected pair had zero occurrences")
    // totals strictly decrease, and each step removes at most
    // pair_count tokens (greedy merges <= pair occurrences)
    val before = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    (before +: totals.toSeq).sliding(2).zip(counts.iterator).foreach {
      case (Seq(prev, next), n) =>
        assert(next < prev, s"token total did not shrink: $prev -> $next")
        assert(prev - next <= n, s"removed ${prev - next} > pair count $n")
      case _ => ()
    }
    // greedy merge of (x, y) leaves no (x, y) adjacency, so a pair can
    // never be selected twice
    val pairs = out.map(r => (r.getAs[String]("merge_x"), r.getAs[String]("merge_y")))
    assert(pairs.distinct.length == pairs.length, s"repeated merge: ${pairs.toSeq}")
  }

  test("text_bpe: sub-2-token docs survive training unchanged (no pair to count)") {
    // round-11 review finding: sequence(1, size-1) on a 1-token doc is
    // the DESCENDING [1, 0] and element_at(tk, 0) killed the pair job;
    // merges can shrink a doc under 2 tokens mid-training, so the
    // guard is live. One-token and two-token docs must both train.
    val sp = spark
    import sp.implicits._
    val docs = Seq((0L, "solo"), (1L, "alpha beta"), (2L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val (rows, fin) = graft.operators.LlmText.bpeTrain(docs, 2)
    assert(rows.head._2 == "alpha" && rows.head._3 == "beta")
    val out = fin.orderBy(col("doc_id")).collect()
      .map(_.getSeq[String](1).toSeq)
    assert(out(0) == Seq("solo"), out(0).toString)           // untouched
    assert(out(1).length == 1 && out(2).length <= 2)         // merged
  }

  test("text_bpe: a planted dominant phrase is learned first, train == apply") {
    val sp = spark
    import sp.implicits._
    // "alpha beta" dominates; filler tokens are unique per position
    val docs = (0L until 8L).map { i =>
      (i, (s"f${i}a " + ("alpha beta " * 5) + s"f${i}b").trim)
    }.toDF("doc_id", "text").select(col("doc_id"), split(col("text"), " ").as("tk"))
    val (rows, fin) = graft.operators.LlmText.bpeTrain(docs, 2)
    assert(rows.head._2 == "alpha" && rows.head._3 == "beta",
      s"first merge was ${rows.head}")
    assert(rows.head._4 == 40L) // 5 occurrences x 8 docs
    // train/apply consistency: replaying the learned merge list with
    // bpeMergeExpr reproduces the trained corpus token total
    var applied = docs
    rows.foreach { case (_, x, y, _, _) =>
      applied = applied.select(col("doc_id"),
        graft.operators.LlmText.bpeMergeExpr(x, y).as("tk"))
    }
    val appliedTotal = applied.agg(sum(size(col("tk")))).head.getLong(0)
    assert(appliedTotal == rows.last._5)
    // and the final corpora agree row-for-row
    val a = applied.orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val b = fin.orderBy(col("doc_id")).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("text_bpe_apply encodes the corpus row-for-row to bpeTrain's final state") {
    // the declared encode rung must be the training loop's fixed point:
    // replaying the fit over the fixture yields EXACTLY the corpus
    // training ended on — per-doc token counts and the 48-bit content
    // fingerprint of the token stream, not just totals (round-11 judge:
    // promote the replay law to the declared rung).
    val (rows, fin) = graft.operators.LlmText.bpeTrain(
      Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ").as("tk")), 6)
    assert(rows.length == 6)
    val expected = fin
      .select(col("doc_id"), size(col("tk")).cast("long").as("tokens_after"),
        conv(substring(md5(array_join(col("tk"), " ")), 1, 12), 16, 10)
          .cast("long").as("final_fp"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    fin.unpersist()
    val got = SparkEntry.queries("text_bpe_apply")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tokens_after"),
        r.getAs[Long]("final_fp")))
    assert(got.toSeq == expected.toSeq)
    // and the declared training rung reads the SAME cached fit — its
    // last token total equals the apply rung's corpus-wide sum
    val trained = SparkEntry.queries("text_bpe")(spark, sf).collect()
    assert(trained.last.getAs[Long]("tokens_after") ==
      got.map(_._2).sum)
  }

  test("ingest_avro fails fast on a torn scratch dir (_DONE but no shards)") {
    // round-11 advice: a surviving _DONE marker over a cleaned shard
    // dir must raise, never silently return an empty DataFrame. The
    // round-18 atomic publish means this state can no longer arise from
    // a crash (shards and marker rename into place together) — plant it
    // at the published artifact path directly (external tampering /
    // manual cleanup) and assert the read-side backstop still fires.
    // Use a test-owned copy of the fixture so the real cached layout
    // for the production sfDir is untouched.
    val tmp = java.nio.file.Files.createTempDirectory("graft_torn_avro")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/customer.parquet"),
        tmp.resolve("customer.parquet"))
      val scratch = new java.io.File(s"${Tables.scratchDir}/ingest_avro=" +
        s"${tmp.getFileName}=${Tables.fingerprint(tmp.toString, "customer")}=" +
        operators.ScratchParquet.ConstructionVersion)
      scratch.mkdirs()
      new java.io.File(scratch, "_DONE").createNewFile()
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("ingest_avro")(spark, tmp.toString)
      }
      assert(e.getMessage.contains("torn scratch"), e.getMessage)
      scratch.listFiles().foreach(_.delete()); scratch.delete()
    } finally {
      tmp.toFile.listFiles().foreach(_.delete())
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  test("text_stupid_backoff: training-half docs never back off; scores are log-probabilities <= 0") {
    val out = SparkEntry.queries("text_stupid_backoff")(spark, TestSpark.sf)
      .collect()
    // every trigram of an even (training) doc is in the count table by
    // construction, so the trigram arm always fires for them
    val trainBackoffs = out.filter(r => r.getLong(0) % 2 == 0)
      .map(r => r.getLong(3) + r.getLong(4)).sum
    assert(trainBackoffs == 0L, s"training docs backed off $trainBackoffs times")
    // every arm's score is a probability-like ratio <= 1 (trigram
    // c123/c12 <= 1; backoffs carry 0.4 / 0.16 factors), so ln <= 0
    assert(out.forall(_.getDouble(5) <= 0.0), "positive mean log score")
    // the held-out half must actually exercise the backoff paths
    val heldBackoffs = out.filter(r => r.getLong(0) % 2 == 1)
      .map(r => r.getLong(3) + r.getLong(4)).sum
    assert(heldBackoffs > 0L, "no backoff fired - the split is not held out")
  }

  test("dedup_lsh_curve is a real S-curve: low deciles rare, high deciles certain") {
    val rows = SparkEntry.queries("dedup_lsh_curve")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // sanity: decile domain, candidates never exceed pairs
    assert(rows.forall { case (d, np, nc, _) => d >= 0 && d <= 10 && nc <= np })
    // the curve must be measurable across the range, not two points
    assert(rows.length >= 8, s"only ${rows.length} deciles populated")
    // banding theory (8 bands x r=2): P(cand | j<=0.2) <= 0.166+slack,
    // P(cand | j>=0.7) >= 0.993-slack - the S-curve's two shoulders
    rows.filter(_._1 <= 1).foreach { case (d, _, _, rate) =>
      assert(rate <= 0.35, s"decile $d rate $rate - low shoulder broke") }
    rows.filter(_._1 >= 7).foreach { case (d, _, _, rate) =>
      assert(rate >= 0.9, s"decile $d rate $rate - high shoulder broke") }
  }
}
