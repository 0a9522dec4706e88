package graft

import graft.queries.{AggQueries, CorpusStatsQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-13 batch F/G: word-length histogram, Simpson diversity,
  * series-gap audit, and daily Herfindahl — each against an independent
  * collected-data replay.
  */
class Round13fOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private lazy val toks: Array[(String, String)] =
    graft.ops.TextOps.explodeTokens(graft.util.Tables.documents(spark, sf))
      .join(graft.util.Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .select("source", "word").collect()
      .map(r => (r.getString(0), r.getString(1)))

  test("text_word_len_hist: per-bucket counts/types/shares replay") {
    val buckets = toks.map(_._2).groupBy(w => math.min(16, w.length))
    val tot = toks.length.toLong
    val expected = buckets.map { case (len, ws) =>
      (len, ws.length.toLong, ws.distinct.length.toLong,
        pin(ws.length.toDouble / tot.toDouble))
    }.toSet
    val got = CorpusStatsQueries.textWordLenHist.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("text_simpson: integer collision counts replay; lambda in [0,1]") {
    def simpson(ws: Seq[String]): (Long, Long, Long) = {
      val wc = ws.groupBy(identity).map(_._2.size.toLong)
      (wc.size.toLong, ws.size.toLong, wc.map(c => c * (c - 1)).sum)
    }
    val perSource = toks.groupBy(_._1).map { case (src, xs) =>
      val (nt, n, coll) = simpson(xs.map(_._2).toSeq); (src, nt, n, coll)
    }.toSeq
    val (ctNt, ctN, ctColl) = simpson(toks.map(_._2).toSeq)
    val expected = (perSource :+ ("TOTAL", ctNt, ctN, ctColl)).map {
      case (src, nt, n, coll) =>
        (src, nt, n, pin(coll.toDouble / (n.toDouble * (n - 1).toDouble)))
    }.toSet
    val got = CorpusStatsQueries.textSimpson.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    got.foreach(g => assert(g._4 >= 0 && g._4 <= Grid.toLong))
  }

  test("win_series_gaps: gap stats replay from distinct (asset, day) pairs") {
    val days = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_shipdate").cast("date").cast("string"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    def epochDay(s0: String): Long = java.time.LocalDate.parse(s0).toEpochDay
    val expected = days.groupBy(_._1).map { case (pk, xs) =>
      val ds = xs.map(x => epochDay(x._2)).sorted
      val gaps = ds.zip(ds.drop(1)).map { case (a, b) => b - a }
      val span = ds.max - ds.min + 1
      (pk, ds.length.toLong, gaps.count(_ > 1).toLong,
        if (gaps.isEmpty) None else Some(gaps.max),
        span, pin(ds.length.toDouble / span.toDouble))
    }.toSet
    val got = WindowQueries.winSeriesGaps.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0), "some asset must have calendar gaps here")
  }

  test("agg_herfindahl: naive replay within grid tolerance; bounds 1/n <= hhi <= 1") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), date_trunc("day", col("l_shipdate")).cast("string").as("d"),
        col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = rows.groupBy(_._2).map { case (d0, xs) =>
      val vols = xs.groupBy(_._1).map(_._2.map(_._3).sum).toSeq
      val tot = vols.sum
      val shares = vols.map(_ / tot)
      d0 -> ((vols.size.toLong, shares.map(x => x * x).sum, pin(shares.max)))
    }
    val got = AggQueries.aggHerfindahl.fn(spark, sf)
      .withColumn("date", col("date").cast("string")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == expected.size)
    got.foreach { case (d0, n, hhi, top) =>
      val (en, ehhi, etop) = expected(d0)
      assert(n == en)
      // portable-grid flooring loses at most one 2^-30 cell per asset
      assert(math.abs(hhi - ehhi) <= (en + 1).toDouble / Grid, s"hhi drift at $d0")
      assert(top == etop, s"top_share mismatch at $d0")
      assert(hhi >= 1.0 / en - (en + 1) / Grid && hhi <= 1.0 + 1e-12,
        "hhi must sit in [1/n, 1]")
    }
  }
}
