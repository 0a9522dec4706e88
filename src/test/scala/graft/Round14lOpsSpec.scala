package graft

import graft.queries.SessionQueries
import org.apache.spark.sql.functions._

/** Round-12 batch L: bounce rate (over the registered sessionizer) and
  * Cohen's d — replays.
  */
class Round14lOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_bounce_rate: counts replay from the sessionizer's own output") {
    val sess = SessionQueries.sessionize.fn(spark, sf)
      .select(expr("start_us div 86400000000").as("day"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = sess.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.count(_._2 == 1).toLong)
    }.toMap
    val got = SessionQueries.eventBounceRate.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (day, (n, b, rate)) =>
      val (en, eb) = expect(day)
      assert(n == en && b == eb, s"day $day session/bounce counts")
      assert(rate == pin(b.toDouble / n.toDouble))
      assert(b <= n)
    }
  }

  test("event_cohens_d: d replays from per-user counts; sign matches mean order") {
    val users = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0) % 2, r.getLong(1)))
    def arm(a: Long) = users.filter(_._1 == a).map(_._2)
    val (x0, x1) = (arm(0), arm(1))
    val (n0, n1) = (x0.length.toDouble, x1.length.toDouble)
    val (m0, m1) = (x0.sum / n0, x1.sum / n1)
    def q(xs: Array[Long]) = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val pooled = ((q(x0) - (x0.sum.toDouble * x0.sum.toDouble) / n0) +
      (q(x1) - (x1.sum.toDouble * x1.sum.toDouble) / n1)) / (n0 + n1 - 2.0)
    val d = (m1 - m0) / math.sqrt(pooled)
    val r = SessionQueries.eventCohensD.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == n0.toLong && r.getLong(1) == n1.toLong)
    assert(r.getLong(2) == pin(m0) && r.getLong(3) == pin(m1))
    assert(r.getLong(4) == pin(d), s"d ${r.getLong(4)} vs ${pin(d)}")
    assert((d > 0) == (m1 > m0))
  }
}
