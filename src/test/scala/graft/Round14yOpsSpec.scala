package graft

import graft.queries.{SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch Y: dedup threshold sweep, attribution-window sweep —
  * replays.
  */
class Round14yOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("dedup_threshold_sweep: counts replay from the registered pair frame; monotone") {
    val pairs = VectorQueries.dedupEmbedCosine.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val corpus = graft.util.Tables.embeddings(spark, sf).count().toDouble
    val got = VectorQueries.dedupThresholdSweep.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set(35L, 50L, 65L, 80L, 90L, 95L))
    Seq(35, 50, 65, 80, 90, 95).foreach { t =>
      val keep = pairs.filter(_._3 >= t.toDouble / 100.0)
      val docs = (keep.map(_._1) ++ keep.map(_._2)).distinct.length.toLong
      val (np, nd, share) = got(t.toLong)
      assert(np == keep.length && nd == docs, s"thr $t")
      assert(share == pin(docs / corpus))
    }
    // monotone: higher threshold never keeps more
    val byT = Seq(35L, 50L, 65L, 80L, 90L, 95L).map(got(_))
    assert(byT.map(_._1) == byT.map(_._1).sorted.reverse)
    assert(byT.map(_._2) == byT.map(_._2).sorted.reverse)
  }

  test("event_conv_windows: conversions replay from the shared staged frame; monotone") {
    val fu = SessionQueries.eventFunnel // forces object init order safety
    assert(fu.id == "q_event_funnel")
    val got = SessionQueries.eventConvWindows.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == Set(3600000000L, 21600000000L, 86400000000L))
    // replay from the published funnel-latency frame's own convention:
    // view->click gaps are ct - vt over the same g3; recompute directly
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val staged = ev.groupBy(e => (e._1, e._2)).values.map { g =>
      val vt = g.filter(_._4 == "view").map(_._3).sorted.headOption
      val ct = vt.flatMap(v => g.filter(e => e._4 == "click" && e._3 > v)
        .map(_._3).sorted.headOption)
      (vt, ct)
    }.toArray
    val nViews = staged.count(_._1.isDefined).toLong
    got.foreach { case (w, (gv, gc, rate)) =>
      val conv = staged.count { case (vt, ct) =>
        vt.isDefined && ct.isDefined && ct.get - vt.get <= w }.toLong
      assert(gv == nViews && gc == conv, s"win $w")
      assert(rate.contains(pin(conv.toDouble / nViews.toDouble)))
    }
    val ordered = Seq(3600000000L, 21600000000L, 86400000000L).map(got(_)._2)
    assert(ordered == ordered.sorted)
  }
}
