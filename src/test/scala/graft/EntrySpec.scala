package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke contract: `SparkEntry.entry` on sf0.001 must
  * return rows, and every corpus query must have resolvable plumbing.
  */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    assert(qs.size >= 68)
  }

  test("bench names are a subset of queries") {
    val missing = graft.queries.QueryCorpus.benchNames.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty)
  }
}
