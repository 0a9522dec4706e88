package graft

import org.apache.spark.sql.functions._

/** Registry-wide sanity: every registered query plans, executes at
  * sf0.001, and keeps the column-name contract its oracle expects.
  * (Value-level correctness is the driver's DuckDB gate; here we guard
  * the structural invariants cheaply.)
  */
class QueriesSpec extends SparkSpec {

  test("registry has no duplicate ids and every query has an oracle") {
    val ids = SparkEntry.registry.map(_.id)
    assert(ids.distinct.size == ids.size)
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.id)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.id} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      // empty results are legal for some set ops, but execution must succeed
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
