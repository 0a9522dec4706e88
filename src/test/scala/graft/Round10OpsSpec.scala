package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.{CorpusStatsQueries, VectorQueries}

/** Hand-computed semantics for the round-10 operators: per-source KL
  * divergence against a pencil-and-paper LM, the Gini mix gauge on
  * uniform and skewed source masses, SoftDeDup weights on a planted
  * duplicate group, LSH recall against the recomputed intersection, and
  * the norm profile on vectors with integer norms.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r10_$tag").toFile.getAbsolutePath

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("kl_source: two-source corpus matches the pencil-and-paper divergences") {
    val dir = tmpDir("kl")
    // corpus: cf(a)=2 cf(b)=2 cf(c)=1, N=5; source A="a a b", B="b c"
    writeDocs(dir, Seq((0L, "a a b", "A"), (1L, "b c", "B")))
    val out = CorpusStatsQueries.textKlSource.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2) / Grid))).toMap
    val klA = (2.0 / 3) * math.log(10.0 / 6) + (1.0 / 3) * math.log(5.0 / 6)
    val klB = 0.5 * math.log(5.0 / 4) + 0.5 * math.log(5.0 / 2)
    assert(out("A")._1 == 3L && out("B")._1 == 2L)
    assert(math.abs(out("A")._2 - klA) < 3e-9, s"A=${out("A")._2} want $klA")
    assert(math.abs(out("B")._2 - klB) < 3e-9, s"B=${out("B")._2} want $klB")
    // the smaller, rarer-vocabulary source diverges more
    assert(out("B")._2 > out("A")._2)
  }

  test("kl_source: a source distributed like the corpus scores ~0") {
    val dir = tmpDir("kl0")
    // both sources are the identical distribution -> p_s = p for both
    writeDocs(dir, Seq((0L, "a a b", "A"), (1L, "a a b", "B")))
    val out = CorpusStatsQueries.textKlSource.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2) / Grid).toMap
    out.values.foreach(v => assert(math.abs(v) < 1e-8, s"kl=$v"))
  }

  test("gini_source: uniform mass scores exactly 0, a dominant source approaches it from below 1") {
    val dirU = tmpDir("giniU")
    // three sources, 2 tokens each -> G = 0 exactly (cell 0)
    writeDocs(dirU, Seq((0L, "x y", "A"), (1L, "x y", "B"), (2L, "x y", "C")))
    val u = CorpusStatsQueries.aggGiniSource.fn(spark, dirU).collect().head
    assert(u.getLong(0) == 3L && u.getLong(1) == 6L && u.getLong(2) == 0L)

    val dirS = tmpDir("giniS")
    // counts (1, 999): G = 2*1999/(2*1000) - 3/2 = 0.499
    writeDocs(dirS, Seq((0L, "t", "A"),
      (1L, Seq.fill(999)("t").mkString(" "), "B")))
    val sk = CorpusStatsQueries.aggGiniSource.fn(spark, dirS).collect().head
    assert(sk.getLong(0) == 2L && sk.getLong(1) == 1000L)
    assert(math.abs(sk.getLong(2) / Grid - 0.499) < 1e-9)
  }

  test("dedup_weight: normalized duplicates split the unit weight, uniques keep it") {
    val dir = tmpDir("wt")
    writeDocs(dir, Seq(
      (0L, "Hello,   World!", "s"), (1L, "hello world", "s"), // same normalized
      (2L, "something else", "s"), (3L, "third text", "s")))
    val out = CorpusStatsQueries.dedupWeight.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val half = math.floor(0.5 * Grid).toLong // exactly 2^29
    assert(out(0L) == ((2L, half)) && out(1L) == ((2L, half)))
    assert(out(2L) == ((1L, Grid.toLong)) && out(3L) == ((1L, Grid.toLong)))
    // weights of a dup group sum to ~1 doc's worth
    assert(out.values.map(_._2).sum / Grid == 3.0)
  }

  test("recall_lsh equals the recomputed LSH ∩ exact-top-3 intersection at sf0.001") {
    val lsh = VectorQueries.annLsh.fn(spark, sf).select("q", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gt = VectorQueries.annCosineTopk.fn(spark, sf).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L to 9L).map { q =>
      val hits = gt.count { case (gq, gc) => gq == q && lsh((q, gc)) }
      q -> ((hits.toLong, math.floor(hits / 3.0 * Grid).toLong))
    }.toMap
    val got = VectorQueries.evalRecallLsh.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the registered 2-plane config is the ANNRecallSpec-pinned nonzero one
    assert(got.values.map(_._1).sum > 0L, "registered LSH recall must be nonzero")
  }

  test("norm_profile: integer-norm fixture publishes exact grid cells") {
    val dir = tmpDir("nrm")
    def vec(a: Double, b: Double) =
      (Array(a, b) ++ Array.fill(6)(0.0)).map(_.toFloat).toSeq
    Seq((0L, vec(3, 4), 1), (1L, vec(6, 8), 1), (2L, vec(5, 12), 2))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorQueries.embNormProfile.fn(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // label 1: norms 5 and 10 -> mean 7.5; label 2: norm 13
    assert(out(1) == ((2L, math.floor(7.5 * Grid).toLong,
      5L * Grid.toLong, 10L * Grid.toLong)))
    assert(out(2) == ((1L, 13L * Grid.toLong, 13L * Grid.toLong, 13L * Grid.toLong)))
  }

  test("centroid_drift: orthogonal halves score 0, aligned halves ~1, single-half labels drop") {
    val dir = tmpDir("drift")
    def vec(a: Double, b: Double) =
      (Array(a, b) ++ Array.fill(6)(0.0)).map(_.toFloat).toSeq
    Seq(
      (0L, vec(1, 0), 1), (1L, vec(0, 1), 1),   // halves orthogonal -> cos 0
      (2L, vec(2, 0), 2), (3L, vec(2, 0), 2),   // identical -> cos 1 exactly
      (4L, vec(1, 0), 3), (6L, vec(0, 1), 3),   // even centroid (.5,.5)
      (5L, vec(1, 1), 3),                        // odd centroid (1,1) -> cos ~1
      (8L, vec(1, 0), 4))                        // even-only label: no pair
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorQueries.embCentroidDrift.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1, 2, 3))
    assert(out(1) == ((1L, 1L, 0L)))                     // cos 0 -> cell 0
    assert(out(2) == ((1L, 1L, Grid.toLong)))            // cos 1 -> cell 2^30
    assert(out(3)._1 == 2L && out(3)._2 == 1L)
    assert(math.abs(out(3)._3 / Grid - 1.0) < 1e-9)      // colinear centroids
  }

  test("cohort_ltv: crafted two-cohort events yield the exact triangle") {
    val dir = tmpDir("ltv")
    val rows = Seq(
      // u1: cohort week 2024-01-01; purchase age 0, click-only age 1
      (1L, 1L, "2024-01-02 10:00:00", "purchase", 10.0),
      (2L, 1L, "2024-01-09 10:00:00", "click", 3.0),
      // u2: cohort week 2024-01-08; purchases at ages 0 and 1
      (3L, 2L, "2024-01-10 10:00:00", "purchase", 5.0),
      (4L, 2L, "2024-01-17 10:00:00", "purchase", 7.0))
    rows.map { case (e, u, t, ty, v) => (e, t, u, ty, v, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.SessionQueries.eventCohortLtv.fn(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val w1 = "2024-01-01 00:00:00.0"; val w2 = "2024-01-08 00:00:00.0"
    assert(out.keySet == Set((w1, 0L), (w1, 1L), (w2, 0L), (w2, 1L)))
    assert(out((w1, 0L)) == ((1L, Some(10.0))))
    assert(out((w1, 1L)) == ((1L, None))) // active but purchase-less: NULL revenue
    assert(out((w2, 0L)) == ((1L, Some(5.0))))
    assert(out((w2, 1L)) == ((1L, Some(7.0))))
  }

  test("norm_profile invariants on real embeddings: complete, ordered, positive") {
    val rows = VectorQueries.embNormProfile.fn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sum ==
      graft.util.Tables.embeddings(spark, sf).count())
    rows.foreach { case (n, mean, mn, mx) =>
      assert(n > 0 && mn > 0 && mn <= mean && mean <= mx)
    }
  }
}
