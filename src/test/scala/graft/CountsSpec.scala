package graft

import org.scalatest.funsuite.AnyFunSuite

/** README count claims, structurally un-driftable (round-9 verdict item
  * 2 — three consecutive rounds shipped stale counts): the numbers in
  * README's COUNTS block and the §"Operator inventory" header are
  * asserted against `SparkEntry` itself, so `sbt test` goes red the
  * moment a query is added without re-running `scripts/counts.sh`
  * (which rewrites the block) or editing the header. Test-count and
  * bench lines inside the block are refreshed by the script from
  * target/test-reports / BENCH_r*.json and deliberately NOT asserted
  * here — a suite can't know its own final size mid-run. */
class CountsSpec extends AnyFunSuite {
  private lazy val readme =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")

  test("COUNTS block matches SparkEntry.queries / oracleSql") {
    val block = readme.split("<!-- COUNTS:BEGIN")(1).split("COUNTS:END -->")(0)
    val m = """(\d+) declared queries, (\d+) DuckDB-oracled \((\d+) """.r
      .findFirstMatchIn(block)
      .getOrElse(fail("COUNTS block missing the declared/oracled line"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README declares ${m.group(1)} queries; SparkEntry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README declares ${m.group(2)} oracled; SparkEntry has ${SparkEntry.oracleSql.size}")
    assert(m.group(3).toInt == SparkEntry.queries.size - SparkEntry.oracleSql.size,
      "non-oracled count drifted")
  }

  test("Operator inventory header matches SparkEntry") {
    val m = """## Operator inventory \((\d+) queries; (\d+) DuckDB-oracled\)""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("inventory header missing or reshaped"))
    assert(m.group(1).toInt == SparkEntry.queries.size)
    assert(m.group(2).toInt == SparkEntry.oracleSql.size)
  }

  test("every oracleSql key is a declared query") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
  }
}
