package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed semantics for the privacy / span-curation operators
  * (CurationQueries): planted PII matches and redaction identities,
  * and duplicated 20-token window fractions on constructed overlaps.
  */
class CurationSpec extends SparkSpec {

  private def writeFixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_fix").toString
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(q: Q, dir: String): DataFrame = q.fn(spark, dir)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pii: planted email/phone/ip are counted and redacted; clean doc hashes unchanged") {
    val dirty = "contact jane.doe@example.com or 555-123-4567 from host 10.0.0.1 today"
    val clean = "no personal information in this document at all"
    val dir = writeFixture(Seq(0L -> dirty, 1L -> clean))
    val out = run(CurationQueries.textPii, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(0L) == ((1L, 1L, 1L,
      md5hex("contact <EMAIL> or <PHONE> from host <IP> today"))))
    assert(out(1L) == ((0L, 0L, 0L, md5hex(clean))))
  }

  test("pii: email host that is an ip counts as ip not email; word-adjacent digits don't phone-match") {
    // user@10.0.0.1 — the alpha TLD requirement rejects the email match,
    // and \b after '@' admits the IP match. x555-123-4567 — no word
    // boundary before the leading digit, so no phone match.
    val dir = writeFixture(Seq(
      0L -> "mail user@10.0.0.1 now",
      1L -> "serial x555-123-4567 tag"))
    val out = run(CurationQueries.textPii, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) == ((0L, 0L, 1L)))
    assert(out(1L) == ((0L, 0L, 0L)))
  }

  test("dedup_substring: shared 25-token run marks exactly the windows inside it") {
    // S = 25 tokens. A = S (6 windows, all duplicated). B = S + 10 more
    // tokens (16 windows, the 6 inside S duplicated). C unrelated, 21
    // tokens (2 windows, none duplicated). D = 19 tokens: no window,
    // null fraction.
    val s25 = (1 to 25).map(i => f"s$i%02d").mkString(" ")
    val tail10 = (1 to 10).map(i => f"t$i%02d").mkString(" ")
    val c21 = (1 to 21).map(i => f"c$i%02d").mkString(" ")
    val d19 = (1 to 19).map(i => f"d$i%02d").mkString(" ")
    val dir = writeFixture(Seq(
      0L -> s25, 1L -> s"$s25 $tail10", 2L -> c21, 3L -> d19))
    val out = run(CurationQueries.dedupSubstring, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out(0L) == ((6L, 6L, Some(1.0))))
    assert(out(1L) == ((16L, 6L, Some(6.0 / 16.0))))
    assert(out(2L) == ((2L, 0L, Some(0.0))))
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("dedup_lines: repeated lines drop after first occurrence, order preserved") {
    // doc 0: lines A B A C B → dedup keeps A B C in order (2 removed);
    // doc 1: no newlines → identity (1 line, 0 removed, hash unchanged)
    val doc0 = "alpha one\nbeta two\nalpha one\ngamma three\nbeta two"
    val doc1 = "single line only"
    val dir = writeFixture(Seq(0L -> doc0, 1L -> doc1))
    val out = run(CurationQueries.textDedupLines, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) == ((5L, 2L, md5hex("alpha one\nbeta two\ngamma three"))))
    assert(out(1L) == ((1L, 0L, md5hex(doc1))))
  }

  test("gopher: rule metrics and the composite flag on planted pass/fail docs") {
    // doc 0: 52 alpha words incl. 'the' and 'a', mean len in [3,10] → pass.
    // doc 1: 9 words → fails the 50-word floor (metrics still emitted).
    // doc 2: 52 words but half numeric → frac_alpha 0.5 < 0.8 → fail;
    //        also a '#' symbol and a bullet line.
    val pass = "the quick brown fox jumps over a lazy dog today " +
      (1 to 42).map(i => f"word$i%03d").mkString(" ")
    val short = "the a tiny doc with only ten small words"
    val nums = "the a " + (1 to 25).map(_.toString).mkString(" ") + " " +
      (1 to 25).map(i => f"w$i%02d").mkString(" ") + "\n- bullet line # tag"
    val dir = writeFixture(Seq(0L -> pass, 1L -> short, 2L -> nums))
    val out = run(CurationQueries.textGopher, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getDouble(3), r.getBoolean(7))))
      .toMap
    assert(out(0L)._1 == 52L && out(0L)._2 == 2L && out(0L)._3 == 1.0 && out(0L)._4)
    assert(out(1L)._1 == 9L && !out(1L)._4)
    assert(!out(2L)._4 && out(2L)._3 < 0.8)
    val r2 = run(CurationQueries.textGopher, dir).filter(col("doc_id") === 2L).collect().head
    assert(r2.getDouble(5) > 0.0 && r2.getDouble(6) == 0.5)
  }

  test("pii, gopher, and line-dedup plans are shuffle-free projections") {
    // the scale contract for the map-only curation ops: no Exchange node
    // anywhere in the executed plan — the whole pass rides the scan
    val dir = writeFixture(Seq(0L -> "some text here", 1L -> "other text there"))
    for (q <- Seq(CurationQueries.textPii, CurationQueries.textGopher,
        CurationQueries.textDedupLines)) {
      val plan = run(q, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"${q.id} plan has a shuffle:\n$plan")
    }
  }

  test("dedup_substring: repetition within a single doc is not cross-doc duplication") {
    // U repeated twice inside one doc gives identical window hashes at
    // i and i+20, but count(DISTINCT doc_id) = 1 keeps them unmarked.
    val u20 = (1 to 20).map(i => f"u$i%02d").mkString(" ")
    val other = (1 to 30).map(i => f"o$i%02d").mkString(" ")
    val dir = writeFixture(Seq(0L -> s"$u20 $u20", 1L -> other))
    val out = run(CurationQueries.dedupSubstring, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) == 0L && out(1L) == 0L)
  }
}
