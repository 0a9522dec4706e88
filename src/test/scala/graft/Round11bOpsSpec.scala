package graft

import java.nio.file.Files

import graft.queries.{CurationQueries, PipelineQueries, SessionQueries}

/** Round-11 batch-2 operators: encoding audit + sentence dedup on planted
  * fixtures that exercise every flag (the sf corpus is clean ASCII with no
  * cross-doc sentences, so the live tables only prove the zero path), and
  * full Scala replays at sf0.001 for the inter-arrival moments, per-user
  * mode, zone-map pruning audit, and compaction plan.
  */
class Round11bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("text_ctrl_chars: planted control/replacement/non-ascii chars hit every column") {
    val dir = Files.createTempDirectory("graft_r11_ctrl").toFile.getAbsolutePath
    val texts = Seq(
      0L -> "clean ascii text here",
      1L -> "bad\u0001ctrl\u0002chars",   // 2 C0 controls
      2L -> "dec\ufffdde fail\ufffdre",   // 2 replacement chars
      3L -> "caf\u00e9 na\u00efve r\u00e9sum\u00e9", // 4 non-ascii accents
      4L -> "tab\tand\nnewline\rok")     // whitelisted controls
    writeDocs(dir, texts.map { case (id, t) => (id, t, "en", "s") })
    val got = CurationQueries.textCtrlChars.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val len = texts.toMap.view.mapValues(_.length.toLong).toMap
    def share(nonascii: Long, id: Long) =
      math.floor((1.0 - nonascii.toDouble / len(id)) * Grid).toLong
    assert(got(0L) == ((len(0L), 0L, 0L, 0L, share(0, 0L), 0L)))
    assert(got(1L) == ((len(1L), 2L, 0L, 0L, share(0, 1L), 1L)), "C0 controls flag")
    assert(got(2L) == ((len(2L), 0L, 2L, 2L, share(2, 2L), 1L)), "U+FFFD flags")
    assert(got(3L) == ((len(3L), 0L, 0L, 4L, share(4, 3L), 0L)), "accents alone never flag")
    assert(got(4L) == ((len(4L), 0L, 0L, 0L, share(0, 4L), 0L)), "tab/LF/CR whitelisted")
  }

  test("text_ctrl_chars: sf0.001 is clean — zero flags, full ascii share") {
    val rows = CurationQueries.textCtrlChars.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(6) == 0L)
      assert(r.getLong(5) == Grid.toLong, "pure-ascii share is exactly 2^30")
    }
  }

  test("dedup_sentence: planted cross-doc sentence flags both docs, within-doc does not") {
    val dir = Files.createTempDirectory("graft_r11_sent").toFile.getAbsolutePath
    val shared = "this exact sentence is shared across two documents"
    writeDocs(dir, Seq(
      (0L, s"$shared. a unique twenty-plus character tail sentence here.", "en", "s"),
      (1L, s"another unique opening sentence of real length. $shared!", "en", "s"),
      // doc 2 repeats its own sentence twice: ndocs = 1 -> NOT cross-doc dup
      (2L, "repeated inside one document only. repeated inside one document only.", "en", "s"),
      (3L, "short. tiny. all sentences below twenty chars.", "en", "s")))
    val got = CurationQueries.dedupSentence.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(got(0L)._1 == 2L && got(0L)._2 == 1L &&
      got(0L)._3 == Some(math.floor(0.5 * Grid).toLong))
    assert(got(1L)._1 == 2L && got(1L)._2 == 1L)
    assert(got(2L) == ((2L, 0L, Some(0L))), "within-doc repetition is not cross-doc dup")
    assert(got(3L)._1 == 1L && got(3L)._2 == 0L, "short sentences filtered, one qualifies")
  }

  test("dedup_sentence: sf0.001 publishes the full universe with zero dups") {
    val n = graft.util.Tables.documents(spark, sf).filter("text IS NOT NULL").count()
    val rows = CurationQueries.dedupSentence.fn(spark, sf).collect()
    assert(rows.length.toLong == n)
    rows.foreach(r => assert(r.getLong(2) == 0L))
  }

  test("event_interarrival: sf0.001 equals the decimal-exact Scala replay") {
    val ev = graft.util.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._3)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.sliding(2).collect { case Array(a, b) => (a._3, b._4 - a._4) }
    }
    def dsum(xs: Iterable[Double], scale: Int): Double =
      xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val expected = gaps.groupBy(_._1).map { case (t, g) =>
      val v = g.map(_._2)
      val n = v.size
      val s = dsum(v.map(_.toDouble), 8)
      val sq = dsum(v.map(x => x.toDouble * x.toDouble), 4)
      val mu = s / n
      val sd = math.sqrt(math.max(0.0, (sq - s * s / n) / n))
      val burst =
        if (n >= 2 && sd + mu > 0) Some(math.floor((sd - mu) / (sd + mu) * Grid).toLong)
        else None
      t -> ((n.toLong, v.sum, v.min, v.max,
        math.floor(mu / 1000000.0 * Grid).toLong,
        if (n >= 2) Some(math.floor(sd / 1000000.0 * Grid).toLong) else None,
        burst))
    }
    val got = SessionQueries.eventInterarrival.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.forall(_._1 > 0))
  }

  test("agg_mode: sf0.001 equals the Scala recount with the deterministic tie rule") {
    val ev = graft.util.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val total = counts.map(_._2).sum
      val (t, n) = counts.minBy { case (ty, c) => (-c, ty) }
      u -> ((t, n, total, math.floor(n.toDouble / total * Grid).toLong))
    }
    val got = SessionQueries.aggModeUser.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
    assert(got.size > 10)
  }

  test("layout_pruning: sf0.001 equals the Morton zone-map replay, and prunes") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_partkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def spread(x: Long): Long =
      (0 until 31).map(i => ((x >> i) & 1L) << (2 * i)).sum
    val zs = rows.map { case (p, s) => (p, s, spread(p) | (spread(s) << 1)) }
    val zmax = zs.map(_._3).max
    val cellw = zmax / 256 + 1
    val maps = zs.groupBy(_._3 / cellw).map { case (cell, g) =>
      (cell, g.length.toLong, g.map(_._1).min, g.map(_._1).max,
        g.map(_._2).min, g.map(_._2).max)
    }.toSeq
    def audit(lo: Long, hi: Long, mn: ((Long, Long, Long, Long, Long, Long)) => Long,
        mx: ((Long, Long, Long, Long, Long, Long)) => Long): (Long, Long) = {
      val pruned = maps.filter(m => mx(m) < lo || mn(m) > hi)
      (pruned.size.toLong, pruned.map(_._2).sum)
    }
    val (ppc, psr) = audit(100, 299, _._3, _._4)
    val (spc, ssr) = audit(10, 49, _._5, _._6)
    val nRows = zs.length.toLong
    val r = PipelineQueries.layoutPruning.fn(spark, sf).collect().head
    assert(r.getLong(0) == maps.size.toLong && r.getLong(1) == nRows)
    assert(r.getLong(2) == ppc && r.getLong(3) == psr)
    assert(r.getLong(4) == math.floor(psr.toDouble / nRows * Grid).toLong)
    assert(r.getLong(5) == spc && r.getLong(6) == ssr)
    assert(r.getLong(7) == math.floor(ssr.toDouble / nRows * Grid).toLong)
    // the audit's reason to exist: the z-order layout actually skips data
    assert(psr > 0L, "partkey band must skip rows on a z-ordered layout")
  }

  test("file_compaction_plan: sf0.001 equals the manifest prefix-sum replay") {
    val m = graft.util.Tables.documents(spark, sf)
      .select("source", "lang", "n_chars").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((src, lang), b) => (src, lang, b) }
    val expected = m.groupBy(_._1).flatMap { case (_, files) =>
      val sorted = files.sortBy(_._2)
      sorted.scanLeft(("", "", 0L, 0L)) { case ((_, _, b, off), (src, lang, bytes)) =>
        (src, lang, bytes, off + b)
      }.drop(1).map { case (src, lang, bytes, off) =>
        (src, lang, bytes, off, off / 2048L)
      }
    }.toSet
    val got = PipelineQueries.fileCompactionPlan.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // bins actually aggregate: somewhere more than one file shares a bin
    val binsOf = got.groupBy(t => (t._1, t._5))
    assert(binsOf.exists(_._2.size > 1), "compaction must merge small files")
  }
}
