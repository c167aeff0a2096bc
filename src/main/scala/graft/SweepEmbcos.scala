package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off tuning harness for the embcos probe widths (round-9 recall
  * work): prints recall of the cell-bucketed pair detector vs exact
  * all-pairs truth on the capped vec_id < 500 range, for a grid of
  * (probeCoarse, mapWidth, cellsPerVec) settings, plus the candidate
  * pair count (the cost proxy — pairs entering exact verification). */
object SweepEmbcos {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cap = 500L
    val e = Tables.embeddings(spark, d).filter(col("vec_id") < cap)
    val truth = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("ib"), col("embedding").as("eb")),
        col("ia") < col("ib"))
      .filter(expr("cosine_f32(ea, eb)") > 0.4)
      .select(col("ia"), col("ib"))
      .cache()
    val nTruth = truth.count()
    println(s"n_truth=$nTruth")
    val grid = Seq((3, 2, 2), (3, 2, 3), (4, 2, 3), (4, 3, 3), (5, 3, 3), (4, 3, 4), (5, 3, 4))
    for ((pc, mw, cv) <- grid) {
      val t0 = System.nanoTime()
      val pairs = operators.LlmVector.embcosPairsBuild(spark, d, pc, mw, cv)
        .filter(col("ia") < cap && col("ib") < cap)
        .select(col("ia"), col("ib"))
      val nHit = pairs.join(truth, Seq("ia", "ib")).count()
      val allPairs = operators.LlmVector.embcosPairsBuild(spark, d, pc, mw, cv).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"probeCoarse=$pc mapWidth=$mw cellsPerVec=$cv recall=${nHit.toDouble / nTruth}%.3f emitted_total=$allPairs time=$sec%.1fs")
    }
    spark.stop()
  }
}
