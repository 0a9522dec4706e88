package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.{CorpusStatsQueries, CurationQueries, SessionQueries, TextQueries}

/** Hand-computed semantics for the round-10 batch-2 operators: Flesch
  * readability on counted fixtures, Levenshtein verification against a
  * Scala DP recomputation, sequence n-gram support on a crafted stream,
  * distinct-n diversity on a pencil-and-paper corpus, and DSIR weights
  * against the closed-form log-likelihood ratios.
  */
class Round10bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r10b_$tag").toFile.getAbsolutePath

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("readability: counted fixture matches the identically-ordered Flesch arithmetic") {
    val dir = tmpDir("flesch")
    writeDocs(dir, Seq(
      // 4 words, 3 sentence runs (. ! ?), 5 vowel groups (o|o|o|ea,y)
      (0L, "Go now. Stop! Really?", "en", "s"),
      // unpunctuated: sentence count clamps at 1; 2 words, 2 vowel groups
      (1L, "zz grr", "en", "s")))
    val out = TextQueries.textReadability.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def cell(w: Long, s: Long, y: Long): Long =
      math.floor((206.835 - 1.015 * (w.toDouble / s.toDouble)
        - 84.6 * (y.toDouble / math.max(1L, w).toDouble)) * Grid).toLong
    assert(out(0L) == ((4L, 3L, 5L, cell(4, 3, 5))))
    assert(out(1L) == ((2L, 1L, 0L, cell(2, 1, 0))))
  }

  test("edit_verify: planted identical pair scores distance 0, similarity cell 2^30") {
    val dir = tmpDir("editsame")
    val t = "alpha beta gamma delta epsilon zeta"
    writeDocs(dir, Seq((0L, t, "en", "s"), (1L, t, "en", "s"),
      (2L, "completely different words here now", "en", "s")))
    val out = TextQueries.dedupEditVerify.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.contains((0L, 1L)))
    assert(out((0L, 1L)) == ((0L, t.length.toLong, Grid.toLong)))
  }

  test("edit_verify: every published distance equals a Scala DP recomputation at sf0.001") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val texts = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextQueries.dedupEditVerify.fn(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 must yield at least one LSH candidate pair")
    rows.foreach { r =>
      val (a, b) = (texts(r.getLong(0)), texts(r.getLong(1)))
      val want = lev(a, b).toLong
      assert(r.getLong(2) == want, s"pair ${r.getLong(0)},${r.getLong(1)}")
      assert(r.getLong(3) == math.max(1L, math.max(a.length, b.length).toLong))
      assert(r.getLong(4) ==
        math.floor((1.0 - r.getLong(2).toDouble / r.getLong(3).toDouble) * Grid).toLong)
    }
  }

  test("seq_ngram: repeated A>B>C stream yields exactly the three rotations, support-counted") {
    val dir = tmpDir("seq")
    val cyc = Seq("A", "B", "C")
    val rows =
      // user 1: A B C x7 (21 events, 1 min apart) -> ABC x7, BCA x6, CAB x6
      (0 until 21).map(i => (i.toLong, 1L, f"2024-01-01 00:$i%02d:00", cyc(i % 3))) ++
        // user 2: one D E F pass - support 1, filtered by the >= 5 floor
        Seq((100L, 2L, "2024-01-01 01:00:00", "D"),
          (101L, 2L, "2024-01-01 01:01:00", "E"),
          (102L, 2L, "2024-01-01 01:02:00", "F"))
    rows.map { case (e, u, t, ty) => (e, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SessionQueries.eventSeqNgram.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("A", "B", "C") -> ((7L, 1L)),
      ("B", "C", "A") -> ((6L, 1L)),
      ("C", "A", "B") -> ((6L, 1L))))
  }

  test("distinct_ngrams: pencil-and-paper ratios on one source, complete n coverage") {
    val dir = tmpDir("dng")
    writeDocs(dir, Seq((0L, "a b a b", "en", "s")))
    val out = CorpusStatsQueries.textDistinctNgrams.fn(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def cell(d: Long, t: Long) = math.floor((d.toDouble / t.toDouble) * Grid).toLong
    // unigrams a,b,a,b; bigrams "a b","b a","a b"; trigrams "a b a","b a b"
    assert(out(1L) == ((4L, 2L, cell(2, 4))))
    assert(out(2L) == ((3L, 2L, cell(2, 3))))
    assert(out(3L) == ((2L, 2L, Grid.toLong)))
  }

  test("dsir_weight: two-doc corpus matches the closed-form smoothed log ratios") {
    val dir = tmpDir("dsir")
    // en target "a a b"; fr raw-only "b c". cr: a=2 b=2 c=1; ct: a=2 b=1 c=0
    // Tt=3 Tr=5 V=3; lr(a)=ln(15/12), lr(b)=lr(c)=ln(5/6)
    writeDocs(dir, Seq((0L, "a a b", "en", "s"), (1L, "b c", "fr", "s")))
    val out = CurationQueries.mixDsirWeight.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2) / Grid))).toMap
    val lrA = math.log(1.25); val lrB = math.log(5.0 / 6.0)
    assert(out(0L)._1 == 3L && out(1L)._1 == 2L)
    assert(math.abs(out(0L)._2 - (2 * lrA + lrB) / 3) < 3e-9, s"d0=${out(0L)._2}")
    assert(math.abs(out(1L)._2 - lrB) < 3e-9, s"d1=${out(1L)._2}")
    // the target-language doc must outscore the off-target doc
    assert(out(0L)._2 > out(1L)._2)
  }

  test("dsir_weight on real documents: complete, and en-docs outscore non-en on average") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = CurationQueries.mixDsirWeight.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2) / Grid).toMap
    assert(rows.keySet == docs.keySet)
    val (en, rest) = rows.partition { case (id, _) => docs(id) == "en" }
    val meanEn = en.values.sum / en.size
    val meanRest = rest.values.sum / rest.size
    assert(meanEn > meanRest,
      s"target-slice mean $meanEn must exceed off-target mean $meanRest")
  }
}
