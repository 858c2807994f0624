package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 and agree between `queries` and
  * `oracleSql` key sets — the invariants the driver's gate depends on. */
class QueriesSmokeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("every oracle has a query; every query has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // since r6 the full surface is oracle-paired: the last rows-only
    // holdouts (the engine-defined IVF fit) are replayed bit-exactly in
    // DuckDB (annIvfSql / annRecallSql)
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == Set.empty)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.columns.nonEmpty)
      df.count() // must not throw
    }
  }
}
