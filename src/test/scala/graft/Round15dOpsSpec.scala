package graft

import graft.queries.RollingQueries
import org.apache.spark.sql.functions._

/** Round-12 batch AD: pivot points — replay. */
class Round15dOpsSpec extends SparkSpec {

  test("win_pivot_points: levels replay from the previous bar; ordered S2<S1<P<R1<R2") {
    val bars = graft.queries.PipelineQueries.resampleOhlc.fn(spark, sf)
      .select("l_partkey", "day", "high", "low", "close").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val got = RollingQueries.winPivotPoints.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
        (if (r.isNullAt(2)) None
        else Some((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))))).toMap
    assert(got.size == bars.length)
    var checked = 0
    bars.groupBy(_._1).foreach { case (_, bs) =>
      val s = bs.sortBy(_._2)
      s.indices.foreach { i =>
        val key = (s(i)._1, s(i)._2)
        if (i == 0) assert(got(key).isEmpty)
        else {
          val (_, _, h, l, c) = s(i - 1)
          val p = (h + l + c) / 3.0
          val want = (p, 2.0 * p - l, 2.0 * p - h, p + (h - l), p - (h - l))
          assert(got(key).contains(want), s"key $key")
          val (pp, r1, s1, r2, s2) = want
          assert(s2 <= s1 + 1e-9 && s1 <= pp + 1e-9 &&
            pp <= r1 + 1e-9 && r1 <= r2 + 1e-9)
          checked += 1
        }
      }
    }
    assert(checked > 0)
  }
}
