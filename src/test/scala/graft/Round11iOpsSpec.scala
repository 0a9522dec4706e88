package graft

import java.nio.file.Files

import graft.queries.CorpusStatsQueries

/** Round-11 batch-9: the per-source duplicate-rate report on a planted
  * corpus exercising both the within-source and the cross-source
  * (syndication) split, plus the clean-corpus zero path.
  */
class Round11iOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  test("mix_source_dedup_rate: planted within- and cross-source dups split correctly") {
    val dir = Files.createTempDirectory("graft_r11_srcdup").toFile.getAbsolutePath
    Seq(
      // A: keeper of a cross-source pair (doc 0 < doc 3)
      (0L, "Shared Syndicated Story!", "en", "A", 24L),
      (1L, "a thing only in source a", "en", "A", 24L),
      // A: within-source pair (2 keeper, 4 dup)
      (2L, "repeat inside source a", "en", "A", 22L),
      (4L, "Repeat, inside source A", "en", "A", 23L),
      // B: the cross-source dup of doc 0, plus a unique doc
      (3L, "shared syndicated story", "en", "B", 23L),
      (5L, "unique to source b", "en", "B", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusStatsQueries.mixSourceDedupRate.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    def rate(d: Long, n: Long) = math.floor(d.toDouble / n * Grid).toLong
    assert(got("A") == ((4L, 1L, 0L, rate(1, 4))),
      "A: one within-source dup, keeper of the cross pair is not a dup")
    assert(got("B") == ((2L, 1L, 1L, rate(1, 2))),
      "B: its dup's keeper lives in A -> cross-source")
  }

  test("lshGraphPlanes: the Scala bit-length rule equals the SQL bin-length twin") {
    val ns = Seq(0L, 1L, 49L, 50L, 99L, 100L, 500L, 2000L, 3199L, 3200L,
      20000L, 1000000L, (1L << 40))
    val fromSql = ns.map(n => spark.sql(
        s"SELECT greatest(4, length(bin($n div 50))) AS p").head().getInt(0))
    val fromScala = ns.map(graft.queries.VectorQueries.lshGraphPlanes)
    assert(fromScala == fromSql, s"$fromScala vs $fromSql")
    // the occupancy law: buckets-per-table 2^p keeps n/2^p <= ~50 once
    // n is past the floor
    ns.filter(_ >= 3200).foreach { n =>
      val p = graft.queries.VectorQueries.lshGraphPlanes(n)
      assert(n.toDouble / (1L << p) <= 50.0, s"n=$n p=$p")
    }
    assert(graft.queries.VectorQueries.lshGraphPlanes(500) == 4,
      "test-SF corpora keep the original 4 planes: published results unchanged")
  }

  test("emb_var_explained: equals the moment replay over the registered score frame") {
    val scores = graft.queries.PrepQueries.embPcaProject.fn(spark, sf)
      .select("score").collect().map(_.getDouble(0))
    def dsum(xs: Iterable[Double], scale: Int): Double =
      xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val n = scores.length.toDouble
    val sx = dsum(scores, 8); val sq = dsum(scores.map(x => x * x), 4)
    val lam1 = math.max(0.0, (sq - sx * sx / n) / n)
    val iv = graft.queries.PrepQueries.embIntrinsicDim.fn(spark, sf).collect().head
    val tv = iv.getLong(1).toDouble / Grid
    val r = graft.queries.PrepQueries.embVarExplained.fn(spark, sf).collect().head
    assert(r.getLong(0) == scores.length.toLong)
    assert(r.getLong(1) == math.floor(lam1 * Grid).toLong)
    assert(r.getLong(2) == math.floor(lam1 / tv * Grid).toLong)
    // PCA optimality: the top component explains at least as much as any
    // single dimension, and at least the uniform floor 1/d
    val topShare = iv.getLong(3).toDouble / Grid
    val ve = r.getLong(2).toDouble / Grid
    assert(ve >= topShare - 1e-9, s"ve=$ve topShare=$topShare")
    assert(ve >= 1.0 / iv.getLong(0) - 1e-9)
  }

  test("mix_source_dedup_rate: sf0.001 is duplicate-free, all rates zero") {
    val rows = CorpusStatsQueries.mixSourceDedupRate.fn(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    }
    assert(rows.map(_.getLong(1)).sum == 500L)
  }
}
