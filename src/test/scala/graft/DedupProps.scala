package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck property tests (SURVEY.md §5.5) over generated token sets —
  * pure-logic twins of the Spark HOF formulas, small case count because
  * each Spark check is a full local job. */
class DedupProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val tokenGen = Gen.listOfN(12, Gen.oneOf(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "slow",
    "small", "value", "hash"))

  private def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  property("jaccard symmetric") = Prop.forAll(tokenGen, tokenGen) { (a, b) =>
    math.abs(jaccard(a, b) - jaccard(b, a)) < 1e-15
  }

  property("jaccard(x, x) == 1") = Prop.forAll(tokenGen) { a =>
    a.isEmpty || jaccard(a, a) == 1.0
  }

  property("spark HOF jaccard equals reference formula") =
    Prop.forAll(tokenGen, tokenGen) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val spark = TestSpark.spark
        import org.apache.spark.sql.functions._
        val df = spark.createDataFrame(Seq((a, b))).toDF("a", "b")
        val got = df.select(
          (size(array_intersect(array_distinct(col("a")), array_distinct(col("b")))).cast("double") /
           size(array_union(col("a"), col("b"))).cast("double")).as("j"))
          .collect()(0).getDouble(0)
        math.abs(got - jaccard(a, b)) < 1e-12
      }
    }

  property("ntile closed form matches the ceil/floor split for every n") =
    Prop.forAll(Gen.choose(1, 200)) { n =>
      // reference semantics: the first n%4 tiles get ceil(n/4) rows,
      // the rest floor(n/4) — exactly what SQL ntile(4) assigns
      val base = n / 4
      val rem = n % 4
      val tiles = (Seq.fill(rem)(base + 1) ++ Seq.fill(4 - rem)(base))
        .zipWithIndex.flatMap { case (sz, i) => Seq.fill(sz)(i + 1) }
      (1 to n).forall { r =>
        // the win_ntile_pctrank closed form (Windows.scala); when
        // base == 0 the first branch always applies, so no div by zero
        val q =
          if (r <= rem * (base + 1)) (r - 1) / (base + 1) + 1
          else rem + (r - rem * (base + 1) - 1) / base + 1
        q == tiles(r - 1)
      }
    }

  property("minhash of identical sets is identical (via md5 min)") =
    Prop.forAll(tokenGen) { a =>
      a.nonEmpty ==> {
        def mh(xs: Seq[String]): String = xs.map(x =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString).min
        mh(a) == mh(scala.util.Random.shuffle(a))
      }
    }

  private val corpusGen = Gen.listOfN(6, Gen.listOfN(10, Gen.oneOf(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge")))

  property("spanDedup conserves spans on random corpora") =
    Prop.forAll(corpusGen) { docs =>
      docs.nonEmpty ==> {
        // keep-first span dedup keeps EXACTLY one occurrence per
        // distinct span text, and totals conserve — on ANY corpus,
        // not just the fixtures (the CurationSpec law, generalized)
        val spark = TestSpark.spark
        import org.apache.spark.sql.functions._
        val df = spark.createDataFrame(
          docs.zipWithIndex.map { case (tks, i) => (i.toLong, tks.mkString(" ")) })
          .toDF("doc_id", "text")
        val out = graft.api.GraftOps.spanDedup(df, col("doc_id"), col("text"),
          spanTokens = 3).collect()
        val spans = docs.flatMap(_.grouped(3).map(_.mkString(" ")).toSeq)
        out.map(_.getAs[Long]("n_kept")).sum == spans.distinct.size &&
          out.map(_.getAs[Long]("n_spans")).sum == spans.size
      }
    }
}
