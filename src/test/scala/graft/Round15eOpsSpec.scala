package graft

import graft.queries.{ScalarQueries, SessionQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch AE: hour profile, pad scalars — replays. */
class Round15eOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_hour_profile: cells replay; hour shares sum to 1 per hour") {
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("ts").isNotNull)
      .select(hour(col("ts")).cast("long").as("hr"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byHour = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val tot = ev.length.toDouble
    val got = SessionQueries.eventHourProfile.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == cells.keySet)
    got.foreach { case ((hr, et), (n, hs, ts)) =>
      assert(n == cells((hr, et)))
      assert(hs == pin(n.toDouble / byHour(hr)))
      assert(ts == pin(n / tot))
    }
    // per-hour shares sum to ~1 on the grid (each cell floors by < 2^-30)
    byHour.keys.foreach { hr =>
      val sum = got.collect { case ((h, _), (_, hs, _)) if h == hr => hs }.sum
      assert(math.abs(sum / Grid - 1.0) < 1e-6, s"hour $hr shares")
    }
  }

  test("fn_pad: lpad preserves numeric order; rpad fixes width") {
    val rows = ScalarQueries.fnPad.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, key12, pr16) =>
      assert(key12.length == 12 && key12.endsWith(k.toString))
      assert(pr16.length == 16)
    }
    val sortedByKey = rows.sortBy(_._1).map(_._2)
    assert(sortedByKey.toSeq == sortedByKey.sorted.toSeq,
      "zero padding keeps lexicographic = numeric order")
  }
}
