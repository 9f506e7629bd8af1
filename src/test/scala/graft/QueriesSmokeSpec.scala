package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared gate query runs at sf0.001 and every oracle key
  * has a matching query. Value-level correctness is the driver's DuckDB
  * compare (replicated locally by tools/check.py) — this spec guards the
  * contract shape: names resolve, plans execute, nothing returns empty
  * where the oracle expects rows. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
      // every current query is expected non-empty at sf0.001
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
