package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run on sf0.001 without throwing; the
  * flagship entry must return rows (the driver's t1 smoke). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val n = fn(spark, TestSpark.sf).count()
      assert(n >= 0)
    }
  }
}
