package graft

import graft.queries.{CorpusStatsQueries, CurationQueries, SessionQueries}

/** Round-11 batch-5: the curation Venn histogram against a recount of the
  * registered report, DAU/WAU stickiness against a day-indexed Scala
  * replay, and the length×surprisal correlation against the five-sum
  * decimal replay over the registered surprisal frame.
  */
class Round11eOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("curation_venn: equals the recount over q_curation_report's own frame") {
    val rep = CurationQueries.curationReport.fn(spark, sf).collect()
      .map(r => (r.getLong(5), r.getLong(6))) // (reason_mask, keep)
    val n = rep.length.toLong
    val expected = rep.groupBy(_._1).map { case (mask, g) =>
      mask -> ((mask % 2, (mask / 2) % 2, (mask / 4) % 2, (mask / 8) % 2,
        g.length.toLong, math.floor(g.length.toDouble / n * Grid).toLong,
        g.map(_._2).min))
    }
    val got = CurationQueries.curationVenn.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expected)
    // the clean bucket exists and dominates; keep matches the bit rule
    assert(got.contains(0L) && got(0L)._7 == 1L)
    got.foreach { case (mask, t) =>
      assert(t._7 == (if (mask % 8 == 0) 1L else 0L), s"keep rule at mask $mask")
    }
  }

  test("event_dau_wau: sf0.001 equals the epoch-day replay") {
    val ud = graft.util.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS dnum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val dau = ud.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
    val wau = ud.flatMap { case (u, d) => (0L to 6L).map(o => (u, d + o)) }
      .distinct.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
    val expected = dau.map { case (d, a) =>
      val w = wau(d)
      d -> ((a, w, math.floor(a.toDouble / w * Grid).toLong))
    }
    val got = SessionQueries.eventDauWau.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.foreach { case (_, (a, w, _)) => assert(a <= w, "DAU never exceeds WAU") }
    assert(got.nonEmpty)
  }

  test("eval_signal_corr: equals the five-sum decimal replay over the surprisal frame") {
    val rep = CorpusStatsQueries.textUnigramLogprob.fn(spark, sf).collect()
      .map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble / Grid))
    def dsum(xs: Iterable[Double], scale: Int): Double =
      xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val n = rep.length.toDouble
    val sx = dsum(rep.map(_._1), 8); val sy = dsum(rep.map(_._2), 8)
    val sxy = dsum(rep.map(t => t._1 * t._2), 4)
    val sxx = dsum(rep.map(t => t._1 * t._1), 4)
    val syy = dsum(rep.map(t => t._2 * t._2), 4)
    val corr = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val r = CorpusStatsQueries.evalSignalCorr.fn(spark, sf).collect().head
    assert(r.getLong(0) == rep.length.toLong)
    assert(r.getLong(1) == math.floor(corr * Grid).toLong)
    // a sane corpus keeps |corr| well inside the open interval
    assert(math.abs(r.getLong(1).toDouble / Grid) < 0.9)
  }
}
