package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query executes and returns rows on sf0.001, and
  * every SQL-oracle key actually exists in queries (contract guard for
  * the driver's correctness gate). The deep per-row verification lives
  * in the DuckDB crosscheck (tools/crosscheck.py); these are the fast
  * in-JVM invariants. */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned no rows")
    }
  }
}
