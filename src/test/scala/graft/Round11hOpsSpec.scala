package graft

import java.nio.file.Files

import graft.queries.{CorpusStatsQueries, SessionQueries}

/** Round-11 batch-8: day-of-week profile against an epoch-day replay
  * (with the chi² fold), and the Heaps growth curve on both the live
  * corpus (flat — the fixture's 31-word vocabulary saturates in decile 1,
  * which the test PINS as data truth) and a planted growing-vocabulary
  * corpus where every decile adds words.
  */
class Round11hOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  test("event_dow_profile: sf0.001 equals the epoch-day replay incl. chi2") {
    val dows = graft.util.Tables.events(spark, sf)
      .selectExpr("(unix_micros(ts) div 86400000000 + 4) % 7 AS dow")
      .collect().map(_.getLong(0))
    val byDow = dows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = dows.length.toLong
    val exp = total.toDouble / 7.0
    val chi2 = byDow.values.map { n =>
      math.floor((n - exp) * (n - exp) / exp * Grid).toLong
    }.sum.toDouble / Grid
    val got = SessionQueries.eventDowProfile.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    byDow.foreach { case (dow, n) =>
      assert(got(dow) == ((n, math.floor(n.toDouble / total * Grid).toLong, None)))
    }
    assert(got(-1L) == ((total, Grid.toLong, Some(math.floor(chi2 * Grid).toLong))))
    assert(got.size == byDow.size + 1)
  }

  test("text_vocab_growth: live corpus saturates in decile 1 (31-word vocabulary)") {
    val rows = CorpusStatsQueries.textVocabGrowth.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq)
    assert(rows.last._2 == 500L, "all docs accounted for")
    val vocab = graft.ops.TextOps.explodeTokens(
        graft.util.Tables.documents(spark, sf))
      .select("word").distinct().count()
    assert(rows.last._3 == vocab, "final cumulative vocab = corpus distinct words")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3, "both curves monotone")
    }
  }

  test("text_vocab_growth: planted growing vocabulary adds words every decile") {
    val dir = Files.createTempDirectory("graft_r11_heaps").toFile.getAbsolutePath
    // 20 docs, 2 per decile; doc i introduces word w{i} beside shared filler
    (0L until 20L).map(i => (i, s"common filler w$i", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusStatsQueries.textVocabGrowth.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // decile 1: docs 0,1 -> common, filler, w0, w1 = 4 words; each later
    // decile adds exactly its two new w{i}
    assert(rows.head == ((1L, 2L, 4L)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 - a._2 == 2L && b._3 - a._3 == 2L)
    }
    assert(rows.last == ((10L, 20L, 22L)))
  }
}
