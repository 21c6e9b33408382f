package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage contract, as a failing test instead of a doc convention:
  * every `SparkEntry.queries` key must be (a) oracle-verified or on the
  * short declared rows-only list, (b) inventoried in SURVEY.md §2, and
  * (c) measurable against a BASELINE.md row. Round 6's d8 drift (an
  * operator shipping outside the inventory/baseline) cannot recur while
  * this suite is green.
  */
class ContractSpec extends AnyFunSuite {

  /** Queries whose semantics are not SQL-expressible; each must carry
    * spec-level verification instead. Empty since round 9: s2's k-means
    * was re-derived in scaled-integer arithmetic and gained a replica.
    */
  private val declaredRowsOnly = Set.empty[String]

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("every query has a DuckDB oracle or a declared rows-only justification") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- declaredRowsOnly
    assert(missing.isEmpty, s"queries with neither oracle nor rows-only declaration: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracle entries without a matching query: $stale")
    val pointless = declaredRowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(pointless.isEmpty, s"rows-only declarations that actually have oracles: $pointless")
  }

  test("SURVEY.md §2 inventories every query key") {
    val survey = read("SURVEY.md")
    val missing = SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty, s"SURVEY.md §2 is missing rows for: $missing")
  }

  test("BASELINE.md has a measured row for every query key") {
    val base = read("BASELINE.md")
    val missing = SparkEntry.queries.keySet.filterNot(k => base.contains(s"| $k |"))
    assert(missing.isEmpty, s"BASELINE.md is missing entries for: $missing")
  }

  test("BASELINE.md's published total equals the sum of its per-query rows") {
    // the total is what BENCH_r{N} is compared against at a glance; a
    // hand-added row that forgets to update it silently misstates the
    // within-2x envelope
    // scoped to the contiguous floor-table block after its header, the
    // same rule Bench.baselineFloors applies — a `| word | number |` row
    // in a LATER table must not pollute the sum
    val lines = read("BASELINE.md").linesIterator.toSeq
    val header = lines.indexWhere(_.replace(" ", "").startsWith("|query|sec|"))
    assert(header >= 0, "BASELINE.md has no | query | sec | table header")
    val rows = lines.drop(header + 1).takeWhile(_.trim.startsWith("|"))
      .filter(_.matches("""\| [a-z0-9_]+ \| [0-9.]+ \|.*"""))
      .map(_.split("\\|")(2).trim.toDouble)
    assert(rows.size == SparkEntry.queries.size,
      s"baseline table has ${rows.size} measured rows for ${SparkEntry.queries.size} queries")
    val total = read("BASELINE.md").linesIterator
      .collectFirst { case l if l.startsWith("| **total** |") =>
        l.split("\\|")(2).trim.stripPrefix("**").stripSuffix("**").toDouble }
      .getOrElse(fail("no total row in BASELINE.md"))
    assert(math.abs(rows.sum - total) < 0.5,
      f"baseline rows sum to ${rows.sum}%.2f but the published total is $total%.2f")
  }
}
