package graft

import graft.queries.{CorpusStatsQueries, PrepQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch Z: standardized TTR, context-fit curve — replays. */
class Round14zOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("text_sttr: windowed TTR replays; sttr bounded by 1 and below-raw on repeats") {
    val docs = graft.util.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).view.mapValues { g =>
      // the shared tokw convention: single-space split, NO trim
      val winTtrs = g.flatMap { case (_, _, text) =>
        val toks = text.split(" ", -1)
        toks.grouped(50).filter(_.length == 50).map(w => w.distinct.length.toDouble / 50.0)
      }
      val tokens = g.flatMap(_._3.split(" ", -1))
      (tokens.length.toLong, tokens.distinct.length.toLong, winTtrs)
    }.toMap
    val got = CorpusStatsQueries.textSttr.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, (nTok, nTyp, wins)) =>
      val (gt, gy, raw, nw, sttr) = got(src)
      assert(gt == nTok && gy == nTyp, s"$src raw counts")
      assert(raw == pin(nTyp.toDouble / nTok.toDouble))
      assert(nw == wins.length, s"$src window count")
      if (wins.nonEmpty) {
        val mean = wins.map(w => math.floor(w * Grid)).sum / Grid / wins.length
        assert(sttr.contains(pin(mean)), s"$src sttr")
        assert(sttr.get <= Grid.toLong) // TTR <= 1
      } else assert(sttr.isEmpty)
    }
  }

  test("prep_context_fit: fit counts replay; both shares monotone in ctx") {
    val toks = graft.util.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect()
      .map(_.getString(0).trim.split("\\s+", -1).length.toLong)
    val got = PrepQueries.prepContextFit.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(512L, 1024L, 2048L, 4096L))
    got.foreach { case (ctx, (nd, nt, fd, ft, dShare, tShare)) =>
      assert(nd == toks.length && nt == toks.sum)
      val fit = toks.filter(_ <= ctx)
      assert(fd == fit.length && ft == fit.sum, s"ctx $ctx")
      assert(dShare == pin(fit.length.toDouble / toks.length))
      assert(tShare == pin(fit.sum.toDouble / toks.sum))
      // token share always <= doc share (fitting docs are the short ones)
      assert(tShare <= dShare)
    }
    val ordered = Seq(512L, 1024L, 2048L, 4096L).map(got(_)._3)
    assert(ordered == ordered.sorted)
  }
}
