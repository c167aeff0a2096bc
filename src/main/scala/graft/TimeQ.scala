package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // session-BUILD-time, per the Tables.events contract (no read-time set)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    for (name <- args; i <- 1 to runs) {
      val t0 = System.nanoTime()
      // noop sink = full evaluation (count() lets Catalyst prune all
      // columns, timing projection queries as bare row counts)
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
