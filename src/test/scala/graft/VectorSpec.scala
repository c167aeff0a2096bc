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

  test("ivf ANN returns 10 rows and overlaps brute force") {
    val knn = SparkEntry.queries("sim_knn")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("sim_knn_ivf")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    assert(knn.intersect(ivf).nonEmpty) // label cells ≠ learned clusters: partial recall
  }
}
