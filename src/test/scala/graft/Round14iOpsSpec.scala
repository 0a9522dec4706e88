package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Round-12 batch I: graph-walk navigability recall — cross-consistency
  * with the walk's own output and the exact top-3.
  */
class Round14iOpsSpec extends SparkSpec {

  test("eval_recall_walk: universe-complete; flags replay from walk output x exact top-3") {
    val rows = VectorQueries.evalRecallWalk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10, "one row per query, none dropped")
    val walk = VectorQueries.annGraphWalk.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top3 = VectorQueries.annCosineTopk.fn(spark, sf)
      .filter(col("rn") <= 3)
      .select(col("q").cast("long"), col("c").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (q, sf0, t3, succ) =>
      assert(Seq(sf0, t3, succ).forall(v => v == 0 || v == 1))
      assert(sf0 == (if (walk(q) == q) 1 else 0), s"query $q self flag")
      assert(t3 == (if (top3.contains((q, walk(q)))) 1 else 0), s"query $q top3 flag")
      assert(succ == math.max(sf0, t3))
    }
    // at least one query must succeed, else the graph is non-navigable
    // and the walk operator's premise fails loudly here
    assert(rows.map(_._4).sum >= 1, "zero navigability — investigate the graph")
  }
}
