package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guard: the shapes the round harness depends on. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a matching query entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("query names are stable q-prefixed identifiers") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2}_[a-z0-9_]+")))
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("oracle SQL contains no Spark-only syntax markers") {
    // the oracle runs in DuckDB: no backticks, no Spark-only STRING cast
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("`"), s"$name oracle uses backticks")
    }
  }
}
