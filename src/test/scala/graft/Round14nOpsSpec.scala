package graft

import graft.queries.{RollingQueries, SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch N: rich-club coefficient, Kaplan–Meier session
  * survival, Chaikin money flow — replays.
  */
class Round14nOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  /** Scalar twin of Portable.pln — same fixed op order; the log2 seed only
    * picks the integer exponent and the ±1 fix-up canonicalizes it, so any
    * 1-ulp log2 gives the identical result. */
  private def plnScalar(x: Double): Double = {
    val k0 = math.floor(math.log(x) / math.log(2.0))
    val m0 = x / math.pow(2.0, k0)
    val (m, k) =
      if (m0 >= 2.0) (m0 / 2.0, k0 + 1.0)
      else if (m0 < 1.0) (m0 * 2.0, k0 - 1.0)
      else (m0, k0)
    val t = (m - 1.0) / (m + 1.0)
    val u = t * t
    val poly = Seq(23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)
      .foldLeft(1.0 / 25.0)((p, c) => p * u + 1.0 / c) * u + 1.0
    k * graft.util.Portable.Ln2 + (t * 2.0) * poly
  }

  test("graph_rich_club: phi replays from the edge list; monotone N_k") {
    val edges = VectorQueries.annKnnMutualHier.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ks = deg.values.toSet
    val got = VectorQueries.graphRichClub.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == ks)
    ks.foreach { k =>
      val nk = deg.values.count(_ > k).toLong
      val ek = edges.count { case (a, b) => deg(a) > k && deg(b) > k }.toLong
      val (gn, ge, gphi) = got(k)
      assert(gn == nk && ge == ek, s"k=$k counts")
      if (nk >= 2)
        assert(gphi.contains(pin(2.0 * ek / (nk.toDouble * (nk - 1.0)))), s"k=$k phi")
      else assert(gphi.isEmpty)
    }
    // N_k is non-increasing in k
    val sorted = ks.toSeq.sorted.map(got(_)._1)
    assert(sorted == sorted.sorted.reverse)
  }

  test("event_survival_km: n_risk/deaths replay; log-survival is the KM product") {
    val gap = 12L * 3600 * 1000000L
    val sess = SessionQueries.sessionize.fn(spark, sf)
      .select("end_us", "duration_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mend = sess.map(_._1).max
    val dd = sess.map { case (e, dur) => (dur / 60000000L, e + gap > mend) }
    val byT = dd.groupBy(_._1).view.mapValues { g =>
      (g.count(!_._2).toLong, g.count(_._2).toLong)
    }.toMap
    val got = SessionQueries.eventSurvivalKm.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .sortBy(_._1)
    assert(got.map(_._1).toSet == byT.filter(_._2._1 > 0).keySet)
    var cum = 0L
    var dead = false
    got.foreach { case (t, (nRisk, dObs, dCens, cell)) =>
      val expRisk = byT.filter(_._1 >= t).values.map(v => v._1 + v._2).sum
      assert(nRisk == expRisk, s"t=$t n_risk")
      assert((dObs, dCens) == byT(t), s"t=$t deaths/censored")
      if (nRisk > dObs) {
        // replay the portable-ln grid cell for this term
        val ratio = (nRisk - dObs).toDouble / nRisk.toDouble
        cum += pin(plnScalar(ratio))
      } else dead = true
      if (dead) assert(cell.isEmpty, s"t=$t survival hit 0")
      else assert(cell.contains(cum), s"t=$t log_surv cell")
    }
    // survival is non-increasing: cells (log S) never rise
    val cells = got.flatMap(_._2._4).toSeq
    assert(cells == cells.sorted.reverse)
  }

  test("win_cmf: multiplier in [-1,1]; cmf replays per asset-day from bars") {
    val bars = graft.queries.PipelineQueries.resampleOhlc.fn(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getTimestamp(1).getTime,
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      }
    val out = RollingQueries.winCmf.fn(spark, sf).collect()
    assert(out.length == bars.length)
    val byKey = out.map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val grouped = bars.groupBy(_._1)
    var checkedFull = 0
    grouped.foreach { case (pk, bs) =>
      val sortedBars = bs.sortBy(_._2)
      sortedBars.indices.foreach { i =>
        val window = sortedBars.slice(math.max(0, i - 19), i + 1)
        val volSum = window.map(b => BigDecimal(b._7)).sum.toDouble
        if (window.length >= 20 && volSum > 0) {
          val mfvCells = window.map { b =>
            val (_, _, _, h, l, c, v) = b
            val mfm = if (h > l) ((c - l) - (h - c)) / (h - l) else 0.0
            assert(mfm >= -1.0 && mfm <= 1.0)
            pin(mfm * v)
          }
          val cmf = (mfvCells.sum.toDouble / Grid) / volSum
          assert(byKey((pk, sortedBars(i)._2)).contains(pin(cmf)))
          checkedFull += 1
        } else assert(byKey((pk, sortedBars(i)._2)).isEmpty)
      }
    }
    assert(checkedFull > 0, "no full 20-bar window exercised")
  }
}
