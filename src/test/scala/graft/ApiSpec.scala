package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.api.GraftOps is the schema-agnostic library surface; every
  * function must produce EXACTLY the rows of the corresponding declared
  * (DuckDB-oracled) query when pointed at the fixture columns — that
  * equality is what carries the verified semantics over to user data. */
class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf
  import graft.api.GraftOps

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("normalizeText matches text_normalize") {
    val api = Tables.documents(spark, sf)
      .select(col("doc_id"), GraftOps.normalizeText(col("text")).as("norm_text"))
    assert(rows(api) == rows(SparkEntry.queries("text_normalize")(spark, sf)))
  }

  test("qualityScore matches text_quality's quality column") {
    val api = Tables.documents(spark, sf)
      .select(col("doc_id"),
        round(GraftOps.qualityScore(col("text"), operators.LlmText.StopTokens), 6)
          .as("quality"))
    val declared = SparkEntry.queries("text_quality")(spark, sf)
      .select(col("doc_id"), col("quality"))
    assert(rows(api) == rows(declared))
  }

  test("hashBucket reproduces the split_train_val membership") {
    val api = Tables.documents(spark, sf)
      .withColumn("split",
        when(GraftOps.hashBucket(col("doc_id"), 10) === 9L, "val").otherwise("train"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    assert(rows(api) == rows(SparkEntry.queries("split_train_val")(spark, sf)))
  }

  test("cosineSim is bit-identical to cosine_f32") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf).limit(80)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("ib"), col("embedding").as("eb")),
        col("ia") < col("ib"))
    val diff = pairs.select(
        GraftOps.cosineSim(col("ea"), col("eb")).as("api"),
        expr("cosine_f32(ea, eb)").as("native"))
      .filter(col("api") =!= col("native"))
    assert(diff.count() == 0)
  }

  test("dedupExact matches dedup_exact") {
    val api = GraftOps.dedupExact(
        Tables.documents(spark, sf), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
    assert(rows(api) == rows(SparkEntry.queries("dedup_exact")(spark, sf)))
  }

  test("minhashNearDupPairs matches dedup_near_minhash") {
    val api = GraftOps.minhashNearDupPairs(
        Tables.documents(spark, sf), col("doc_id"), col("text"))
      .select(col("ida").as("da"), col("idb").as("db"),
        round(col("jaccard"), 6).as("jaccard"))
    assert(rows(api) == rows(SparkEntry.queries("dedup_near_minhash")(spark, sf)))
  }

  test("connectedComponents over the pair graph matches dedup_clusters") {
    val pairs = GraftOps.minhashNearDupPairs(
        Tables.documents(spark, sf), col("doc_id"), col("text"))
      .select(col("ida"), col("idb")).persist()
    val api = GraftOps.connectedComponents(pairs, "ida", "idb")
      .groupBy(col("lab").as("survivor"))
      .agg(count(lit(1)).as("n_members"))
    assert(rows(api) == rows(SparkEntry.queries("dedup_clusters")(spark, sf)))
    pairs.unpersist()
  }

  test("int8Quantize matches embed_quantize") {
    val api = Tables.embeddings(spark, sf)
      .select(col("vec_id"), GraftOps.int8Quantize(col("embedding")).as("z"))
      .select(col("vec_id"), col("z.lo").as("lo"), col("z.hi").as("hi"),
        col("z.qscale").as("qscale"),
        concat_ws(",", expr("transform(z.q, x -> CAST(x AS STRING))")).as("q"))
    assert(rows(api) == rows(SparkEntry.queries("embed_quantize")(spark, sf)))
  }
}
