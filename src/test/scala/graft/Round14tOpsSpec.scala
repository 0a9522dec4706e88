package graft

import graft.queries.{RollingQueries, SessionQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch T: next-event prediction accuracy, fractional
  * differencing — replays.
  */
class Round14tOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_next_pred: time-split argmax replay; TOTAL row is the pair-weighted mean") {
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cut = (ev.map(_._3).min + ev.map(_._3).max) / 2
    def pairs(half: Array[(Long, Long, Long, String)]) =
      half.groupBy(_._1).values.flatMap { g =>
        val s = g.sortBy(e => (e._3, e._2)).map(_._4)
        s.zip(s.drop(1))
      }.toArray
    val train = pairs(ev.filter(_._3 < cut))
    val test = pairs(ev.filter(_._3 >= cut))
    val pred = train.groupBy(_._1).view.mapValues { ps =>
      ps.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (to, n) => (-n, to) }.head._1
    }.toMap
    val expect = test.groupBy(_._1).map { case (ft, ps) =>
      ft -> ((ps.length.toLong, ps.count(p => pred.get(ft).contains(p._2)).toLong))
    }
    val rows = SessionQueries.eventNextPred.fn(spark, sf).collect()
    val got = rows.filter(_.getString(0) != "TOTAL")
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (ft, (n, hit)) =>
      val (p, gn, ghit, acc) = got(ft)
      assert(p == pred.get(ft), s"$ft pred")
      assert(gn == n && ghit == hit, s"$ft counts")
      assert(acc == pin(hit.toDouble / n.toDouble))
    }
    val tot = rows.find(_.getString(0) == "TOTAL").get
    val (tn, thit) = (expect.values.map(_._1).sum, expect.values.map(_._2).sum)
    assert(tot.getLong(2) == tn && tot.getLong(3) == thit)
    assert(tot.getLong(4) == pin(thit.toDouble / tn.toDouble))
  }

  test("win_fracdiff: 20-tap chain replays for the largest asset; FD(0) sanity") {
    val dd = 0.4
    val w = Iterator.iterate((1.0, 0)) { case (wk, k) =>
      (-wk * (dd - k) / (k + 1), k + 1)
    }.take(20).map(_._1).toArray
    // weights: alternating-sign decay after w0, absolute sum bounded
    assert(w(0) == 1.0 && w(1) == -0.4)
    assert(w.drop(1).forall(_ < 0.0)) // d in (0,1): all later taps negative
    val topKey = graft.util.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().orderBy(col("count").desc, col("l_partkey"))
      .head().getLong(0)
    val series = graft.util.Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === topKey)
      .select(col("l_shipdate"), (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"),
        col("l_extendedprice"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val got = RollingQueries.winFracdiff.fn(spark, sf)
      .filter(col("l_partkey") === topKey).orderBy("l_shipdate", "ord").collect()
    assert(got.length == series.length && series.length >= 20)
    got.zipWithIndex.foreach { case (r, i) =>
      if (i >= 19) {
        var acc = w(0) * series(i)._3
        (1 until 20).foreach(k => acc = acc + w(k) * series(i - k)._3)
        assert(r.getLong(3) == pin(acc), s"row $i")
      } else assert(r.isNullAt(3))
    }
  }
}
