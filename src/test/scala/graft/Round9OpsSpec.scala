package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.{AggQueries, CorpusStatsQueries, PipelineQueries, SessionQueries, VectorQueries}

/** Hand-computed semantics for the round-9 operators: SCD2 dimension
  * build, Markov transitions, KMV distinct sketch, Z-order curve,
  * weighted sampling, sparse TF-IDF cosine, and kNN-graph PageRank.
  * Fixtures are written as parquet table dirs so each test drives the
  * REGISTERED query end-to-end through the real loaders.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r9_$tag").toFile.getAbsolutePath

  // ---- events fixture: user 1 runs A,A,B,A at hours 1..4 ----------------

  private lazy val eventsDir: String = {
    val dir = tmpDir("ev")
    val h = 3600L * 1000000L
    Seq(
      (1L, 1L * h, 10L, "A", 1.0, "{}"),
      (2L, 2L * h, 10L, "A", 1.0, "{}"),
      (3L, 3L * h, 10L, "B", 1.0, "{}"),
      (4L, 4L * h, 10L, "A", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_scd2: runs collapse, intervals tile, versions sequence, one open row") {
    val h = 3600L * 1000000L
    val rows = SessionQueries.scd2.fn(spark, eventsDir)
      .orderBy("version")
      .select("user_id", "event_type", "version", "valid_from_us", "valid_to_us", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(rows.toSeq === Seq(
      (10L, "A", 1L, 1L * h, 3L * h, false), // A,A collapse to one run
      (10L, "B", 2L, 3L * h, 4L * h, false),
      (10L, "A", 3L, 4L * h, -1L, true)))    // reopened state = NEW version
  }

  test("q_event_transition: counts and row-normalized probabilities") {
    val rows = SessionQueries.eventTransition.fn(spark, eventsDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // pairs: (A,A) (A,B) (B,A)
    assert(rows === Set(("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 1L, 1.0)))
  }

  // ---- KMV sketch vs exact on the real table ----------------------------

  test("q_agg_distinct_kmv: sketch fills, exact count matches, estimate in band") {
    val r = AggQueries.aggDistinctKmv.fn(spark, sf).collect().head
    val (kFilled, exact, est) = (r.getLong(0), r.getLong(2), r.getDouble(3))
    val trueDistinct = graft.util.Tables.lineitem(spark, sf)
      .select(countDistinct("l_partkey")).as[Long].collect().head
    assert(exact === trueDistinct) // no 32-bit hash collisions at this scale
    assert(kFilled === 64L)
    // k=64 gives ~13% expected relative error; 2.5 sigma band
    assert(math.abs(est - exact) / exact < 0.33, s"est=$est exact=$exact")
  }

  // ---- Z-order curve: independent Morton reimplementation ---------------

  private def morton(a: Long, b: Long): Long = {
    def spread(x0: Long): Long = {
      var x = x0 & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    spread(a) | (spread(b) << 1)
  }

  test("q_zorder_curve: zval is the Morton interleave, zcell its top byte") {
    val rows = PipelineQueries.zorderCurve.fn(spark, sf)
      .select("l_partkey", "l_suppkey", "zval", "zcell").limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, s, z, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(z === morton(p, s), s"p=$p s=$s")
      assert(c === (z >> 54))
    }
  }

  test("zorder curve: no aliasing across the full 31-bit key domain") {
    // distinct (p, s) pairs spanning the whole domain — including values
    // far beyond a 16-bit mask — must map to distinct zvals through the
    // QUERY'S OWN expression, every zval must be non-negative (sign bit
    // untouched, so curve order == long sort order), and the interleave
    // must invert cleanly against the independent JVM reimplementation.
    def unspread(z0: Long): Long = {
      var z = z0 & 0x5555555555555555L
      z = (z | (z >> 1)) & 0x3333333333333333L
      z = (z | (z >> 2)) & 0x0F0F0F0F0F0F0F0FL
      z = (z | (z >> 4)) & 0x00FF00FF00FF00FFL
      z = (z | (z >> 8)) & 0x0000FFFF0000FFFFL
      (z | (z >> 16)) & 0x7FFFFFFFL
    }
    val keys = Seq(0L, 1L, 65534L, 65535L, 65536L, 65537L, 1000000L,
      2147483646L, 2147483647L)
    val pairs = for (p <- keys; s <- keys) yield (p, s)
    val got = pairs.toDF("p", "s")
      .select(col("p"), col("s"),
        PipelineQueries.zvalExpr(col("p"), col("s")).as("z"))
      .collect()
    val zs = got.map { r =>
      val (p, s, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z >= 0L, s"sign bit set for p=$p s=$s")
      assert(z === morton(p, s), s"p=$p s=$s")
      assert(unspread(z) === p && unspread(z >> 1) === s, s"p=$p s=$s")
      z
    }
    assert(zs.distinct.length === keys.size * keys.size)
  }

  test("zorder locality: one cell bounds BOTH dimensions' high bits") {
    // cell = top 8 interleaved bits = top 4 bits of each 31-bit key: all
    // members of one cell share both keys' high nibbles by construction.
    val cells = PipelineQueries.zorderCurve.fn(spark, sf)
      .groupBy("zcell")
      .agg(countDistinct(shiftright(col("l_partkey"), 27)).as("dp"),
        countDistinct(shiftright(col("l_suppkey"), 27)).as("ds"))
      .collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(1) === 1L && r.getLong(2) === 1L,
        s"cell ${r.get(0)} spans >1 high-nibble in a dimension")
    }
  }

  test("zorder guard: a key beyond the 31-bit domain fails loudly") {
    val ex = intercept[Exception] {
      Seq((1L << 31, 5L)).toDF("p", "s")
        .select(PipelineQueries.zvalExpr(col("p"), col("s")).as("z"))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  // ---- Weighted sample: TakeOrdered selection == full-sort selection ----

  test("q_sample_weighted: top-k selection equals the exhaustively sorted rank") {
    val d01 = "/root/testdata/sf0.01" // enough docs for real weight competition
    val got = PipelineQueries.sampleWeighted.fn(spark, d01)
      .select("doc_id").as[Long].collect().toSet
    // independent full ranking: same portable recipe, driver-side sort
    val u = (graft.ops.TextOps.hash32(concat(lit("wsamp:"), col("doc_id").cast("string"))) + 0.5) /
      4294967296.0
    val base = graft.util.Tables.documents(spark, d01).filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).withColumn("u", u)
    val full = graft.util.Portable.pln(base, col("u"), "lnu")
      .select(col("doc_id"), (col("lnu") / col("n_chars")).as("rkey"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = full.sortBy { case (id, k) => (-k, id) }.take(120).map(_._1).toSet
    assert(got === want)
    assert(got.size === 120)
  }

  // ---- sparse TF-IDF cosine on a crafted corpus -------------------------

  test("q_text_tfidf_cosine: identical docs pair at ~1.0, disjoint docs never pair") {
    val dir = tmpDir("docs")
    Seq(
      (1L, "a b c d e f", "en", "s1", 11L),
      (2L, "a b c d e f", "en", "s1", 11L), // exact copy of doc 1
      (3L, "p q r s t u", "en", "s1", 11L)) // shingle-disjoint
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusStatsQueries.textTfidfCosine.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1073741824.0))
    assert(rows.length === 1)
    val (a, b, cos) = rows.head
    assert((a, b) === (1L, 2L))
    assert(cos >= 0.999 && cos <= 1.0) // identical vectors; pin may floor 1ulp
  }

  // ---- PageRank on a 4-vector complete mutual graph ---------------------

  test("q_graph_pagerank: K4 symmetry gives uniform rank 1/4, mass conserved") {
    val dir = tmpDir("emb")
    // 4 distinct vectors near a shared direction: one centroid (vec 0),
    // one cluster, top-3 = all others => complete mutual graph
    val vecs = (0 until 4).map { i =>
      val e = Array.fill(8)(1.0f)
      e(i) = 2.0f
      (i.toLong, e.toSeq, i)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = VectorQueries.graphPagerank.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1073741824.0))
    assert(rows.length === 4)
    assert(rows.forall(_._2 == 3L), "complete graph: degree 3 everywhere")
    val ranks = rows.map(_._3)
    // symmetry: every node runs the identical arithmetic => bit-equal
    assert(ranks.toSet.size === 1)
    assert(math.abs(ranks.head - 0.25) < 1e-6)
    assert(math.abs(ranks.sum - 1.0) < 1e-6, "rank mass conserved")
  }

  // ---- snapshot diff + column profile on a crafted lineitem -------------

  private lazy val lineitemDir: String = {
    val dir = tmpDir("li")
    // (orderkey, partkey, linenumber, qty, price, discount, tax, shipdate)
    Seq(
      // part 1: old last=10.0 (latest of two old obs), new last=11.0 -> update
      (1L, 1L, 1, 5.0, 9.0, 0.05, Some(0.02), "1995-01-10"),
      (2L, 1L, 1, 5.0, 10.0, 0.05, Some(0.02), "1995-06-10"),
      (3L, 1L, 1, 5.0, 11.0, 0.00, Some(0.02), "1995-08-10"),
      // part 2: same price both sides -> same
      (4L, 2L, 1, 2.0, 20.0, 0.05, Some(0.04), "1995-02-01"),
      (5L, 2L, 1, 2.0, 20.0, 0.10, None, "1995-09-01"),
      // part 3: old only -> delete
      (6L, 3L, 1, 1.0, 30.0, 0.00, Some(0.08), "1995-03-01"),
      // part 4: new-window only -> insert
      (7L, 4L, 1, 3.0, 40.0, 0.10, Some(0.08), "1995-10-01"))
      .map { case (ok, pk, ln, q, px, disc, tax, dt) =>
        (ok, pk, 1L, ln, q, px, disc, tax, "N", "O",
          java.sql.Timestamp.valueOf(dt + " 00:00:00"))
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q_snapshot_diff: latest-obs snapshots classify insert/delete/update/same") {
    val rows = PipelineQueries.snapshotDiff.fn(spark, lineitemDir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1.0 else r.getDouble(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getString(3))).toSet
    assert(rows === Set(
      (1L, 10.0, 11.0, "update"), // old side picked the LATEST old obs
      (2L, 20.0, 20.0, "same"),
      (3L, 30.0, -1.0, "delete"),
      (4L, -1.0, 40.0, "insert")))
  }

  test("q_profile_columns: nulls, distincts, ranges, and exact means per column") {
    val rows = PipelineQueries.profileColumns.fn(spark, lineitemDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    // qty: 5,5,5,2,2,1,3 -> distinct {1,2,3,5}, mean 23/7
    assert(rows("l_quantity") === ((7L, 0L, 4L, 1.0, 5.0, 23.0 / 7)))
    // discount: .05,.05,0,.05,.10,0,.10 -> distinct {0,.05,.10}
    val d = rows("l_discount")
    assert((d._1, d._2, d._3, d._4, d._5) === ((7L, 0L, 3L, 0.0, 0.10)))
    assert(math.abs(d._6 - 0.35 / 7) < 1e-12)
    // tax has ONE null: profiled, not dropped
    val t = rows("l_tax")
    assert((t._1, t._2, t._3, t._4, t._5) === ((7L, 1L, 3L, 0.02, 0.08)))
    assert(math.abs(t._6 - 0.26 / 6) < 1e-12) // mean over the 6 non-nulls
  }

  // ---- rolling median on a ramp -----------------------------------------

  test("q_win_roll_median: warm-up nulls, then the middle of each 21-row frame") {
    val dir = tmpDir("med")
    import spark.implicits._
    (1 to 25).map { i =>
      (i.toLong, 1L, 1L, 1, 1.0, i.toDouble, 0.0, Some(0.0), "N", "O",
        java.sql.Timestamp.valueOf(f"1995-01-$i%02d 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.RollingQueries.winRollMedian.fn(spark, dir)
      .orderBy("ord").select("l_extendedprice", "median_21")
      .collect().map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // price ramp 1..25: rows 1..20 below min_periods; row i >= 21 has
    // frame {i-20..i} whose (lower) median is i-10
    rows.foreach { case (px, med) =>
      if (px < 21) assert(med.isEmpty, s"px=$px")
      else assert(med.contains(px - 10), s"px=$px med=$med")
    }
  }

  // ---- k-center coreset: hand-computed farthest-first on 2D angles ------

  test("q_coreset_kcenter: picks the farthest vector each round, radii decay") {
    val dir = tmpDir("kc")
    import spark.implicits._
    def vec(x: Double, y: Double) = (Array(x, y) ++ Array.fill(6)(0.0)).map(_.toFloat).toSeq
    // v0 seed; v1 orthogonal (d=1); v2 at 45deg (d~0.293); v3 nearly
    // colinear with v0 (d~0.005)
    Seq((0L, vec(1, 0), 0), (1L, vec(0, 1), 0), (2L, vec(1, 1), 0), (3L, vec(1, 0.1), 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.VectorQueries.coresetKcenter.fn(spark, dir)
      .orderBy("pick_order")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getLong(2) / 1073741824.0))
    assert(rows.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L)) // farthest-first order
    assert(rows(0)._3 === -1.0)
    assert(math.abs(rows(1)._3 - 1.0) < 1e-9)                       // orthogonal
    assert(math.abs(rows(2)._3 - (1 - math.sqrt(0.5))) < 1e-6)      // 45 degrees
    assert(math.abs(rows(3)._3 - (1 - 1.0 / math.sqrt(1.01))) < 1e-4) // near-colinear: min dist is to v0
    // the k-center law: covering radius never increases
    val radii = rows.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q_coreset_kcenter on real embeddings: distinct picks, decaying radii") {
    val rows = graft.queries.VectorQueries.coresetKcenter.fn(spark, sf)
      .orderBy("pick_order").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getLong(2) / 1073741824.0))
    assert(rows.length === 4)
    assert(rows.map(_._1).distinct.length === 4)
    val radii = rows.drop(1).map(_._2)
    assert(radii.forall(_ > 0))
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b })
  }

  // ---- bloom prefilter invariants ---------------------------------------

  test("q_join_bloom_prefilter: no false negatives, published rate consistent") {
    val r = graft.queries.JoinQueries.joinBloomPrefilter.fn(spark, sf).collect().head
    val (nFact, nPass, nMatch, fp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nFact === graft.util.Tables.lineitem(spark, sf).count())
    assert(nPass >= nMatch, "bloom filters never drop a true match")
    assert(nPass <= nFact)
    assert(fp === (nPass - nMatch).toDouble / (nFact - nMatch))
    assert(fp >= 0.0 && fp < 0.5, s"fp=$fp — m/k mistuned for dim cardinality")
  }

  // ---- batch 4: grouping sets, knn classify, zipf, event paths ----------

  test("q_agg_grouping_sets: marginals only — no finest cells, no grand total") {
    val rows = graft.queries.AggQueries.aggGroupingSets.fn(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every row is EXACTLY one of the two marginals
    rows.foreach { case (src, lang, gid, _) =>
      assert(src.isDefined ^ lang.isDefined, s"src=$src lang=$lang")
      assert(gid === (if (src.isDefined) 1L else 2L)) // gid bit = grouped-out column
    }
    // each marginal's doc counts reconcile with plain groupBy
    val docs = graft.util.Tables.documents(spark, sf)
    val bySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(_._1.isDefined).foreach { case (src, _, _, n) =>
      assert(n === bySrc(src.get))
    }
  }

  test("q_ann_knn_classify: majority vote predicts, the odd label out is flagged") {
    val dir = tmpDir("knncls")
    import spark.implicits._
    // complete graph (one cluster, k=3 covers all others); labels 7,7,7,9:
    // v0-v2 predict 7 correctly; v3 is outvoted 3:0 -> the mislabel flag
    val vecs = (0 until 4).map { i =>
      val e = Array.fill(8)(1.0f); e(i) = 2.0f
      (i.toLong, e.toSeq, if (i == 3) 9 else 7)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.VectorQueries.annKnnClassify.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.size === 4)
    assert(rows(0L) === ((7, 7, 2L, true)))  // nbrs {7,7,9}: 2 votes for 7
    assert(rows(1L) === ((7, 7, 2L, true)))
    assert(rows(2L) === ((7, 7, 2L, true)))
    assert(rows(3L) === ((9, 7, 3L, false))) // unanimously outvoted = mislabel candidate
  }

  test("q_text_zipf: a perfect 1/rank corpus fits slope -1; n_terms honest") {
    val dir = tmpDir("zipf")
    import spark.implicits._
    // freq = 1200/rank exactly for 4 words -> ln-ln points are colinear
    val text = (Seq.fill(1200)("aa") ++ Seq.fill(600)("bb") ++
      Seq.fill(400)("cc") ++ Seq.fill(300)("dd")).mkString(" ")
    Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.CorpusStatsQueries.textZipf.fn(spark, dir).collect().head
    assert(r.getLong(0) === 4L) // fitted points, not the configured cap
    assert(math.abs(r.getLong(1) / 1073741824.0 - (-1.0)) < 1e-6)
  }

  test("q_event_path: ordered first-3 prefix, counted per user") {
    val rows = graft.queries.SessionQueries.eventPath.fn(spark, eventsDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("A>A>B", 1L))) // user 10's prefix of A,A,B,A
  }

  // ---- batch 5: interpolated quantiles, histogram, correlation ----------

  private def liRow(ok: Long, pk: Long, qty: Double, px: Double, flag: String) =
    (ok, pk, 1L, 1, qty, px, 0.0, Some(0.0), flag, "O",
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))

  private def writeLineitem(dir: String,
      rows: Seq[(Long, Long, Long, Int, Double, Double, Double, Option[Double],
        String, String, java.sql.Timestamp)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("q_quantile_cont: percentile_cont interpolation between order statistics") {
    val dir = tmpDir("qc")
    import spark.implicits._
    Seq((1L, 10L, "en", "s", 10L), (2L, 20L, "en", "s", 20L),
      (3L, 30L, "en", "s", 30L), (4L, 40L, "en", "s", 40L))
      .map { case (id, _, lang, src, nc) => (id, "x", lang, src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.CorpusQueries.quantileCont.fn(spark, dir).collect().head
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 25.0) // h=1.5: midpoint of 20,30
    // h = 3*0.9: expected computed with the SAME IEEE ops as the query
    val h = 3L * 0.9
    assert(r.getDouble(3) === 30.0 + (h - math.floor(h)) * (40L - 30L))
  }

  test("q_agg_histogram: bin assignment, counts, and shares") {
    val dir = tmpDir("hist")
    writeLineitem(dir, Seq(
      liRow(1, 1, 1, 100.0, "N"), liRow(2, 1, 1, 5100.0, "N"),
      liRow(3, 1, 1, 5200.0, "N"), liRow(4, 1, 1, 10100.0, "N")))
    val rows = graft.queries.AggQueries.aggHistogram.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows === Set((0L, 0.0, 1L, 0.25), (1L, 5000.0, 2L, 0.5), (2L, 10000.0, 1L, 0.25)))
  }

  test("q_agg_corr: perfectly linear group at 1, constant group null-guarded") {
    val dir = tmpDir("corr")
    writeLineitem(dir, Seq(
      liRow(1, 1, 1, 1000.0, "A"), liRow(2, 1, 2, 2000.0, "A"),
      liRow(3, 1, 3, 3000.0, "A"), liRow(4, 1, 4, 4000.0, "A"),
      liRow(5, 1, 5, 1000.0, "B"), liRow(6, 1, 5, 9000.0, "B"))) // constant qty
    val rows = graft.queries.AggQueries.aggCorr.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(rows("A")._1 === 4L)
    assert(math.abs(rows("A")._2.get - 1.0) < 1e-12) // y = 1000x exactly
    assert(rows("B")._2.isEmpty, "zero-variance side must NULL, not divide by 0")
  }

  // ---- batch 6: OHLC bars, drawdown, RFM, rolling correlation -----------

  test("q_resample_ohlc: first/last by ordinal, extrema, exact volume") {
    val dir = tmpDir("ohlc")
    import spark.implicits._
    // one part, two days; day-1 arrival order (by ord) is 10, 30, 20
    Seq(
      (1L, 1L, 1L, 1, 2.0, 10.0, 0.0, Some(0.0), "N", "O", "1995-03-01"),
      (2L, 1L, 1L, 1, 3.0, 30.0, 0.0, Some(0.0), "N", "O", "1995-03-01"),
      (3L, 1L, 1L, 1, 5.0, 20.0, 0.0, Some(0.0), "N", "O", "1995-03-01"),
      (4L, 1L, 1L, 1, 7.0, 40.0, 0.0, Some(0.0), "N", "O", "1995-03-02"))
      .map { case (ok, pk, sk, ln, q, px, disc, tax, rf, ls, dt) =>
        (ok, pk, sk, ln, q, px, disc, tax, rf, ls,
          java.sql.Timestamp.valueOf(dt + " 00:00:00"))
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.PipelineQueries.resampleOhlc.fn(spark, dir)
      .orderBy("day").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    assert(rows.length === 2)
    assert(rows(0) === ((10.0, 30.0, 10.0, 20.0, 10.0))) // o/h/l/c/vol day 1
    assert(rows(1) === ((40.0, 40.0, 40.0, 40.0, 7.0)))  // singleton bar
  }

  test("q_win_drawdown: running-peak drawdown, hand-computed") {
    val dir = tmpDir("dd")
    writeLineitem(dir, Seq(
      liRow(1, 1, 1, 10.0, "N"), liRow(2, 1, 1, 20.0, "N"),
      liRow(3, 1, 1, 15.0, "N"), liRow(4, 1, 1, 5.0, "N")))
    val r = graft.queries.WindowQueries.winDrawdown.fn(spark, dir).collect().head
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 20.0)          // peak
    assert(r.getDouble(3) === 5.0 / 20.0 - 1.0) // -0.75 at the trough
  }

  test("q_event_rfm: recency against corpus horizon, exact monetary, quintile") {
    val rows = graft.queries.SessionQueries.eventRfm.fn(spark, eventsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // single user, 4 events of value 1.0, last event = the horizon itself
    assert(rows.toSeq === Seq((10L, 0L, 4L, 4.0, 1L)))
  }

  test("q_win_roll_corr: defined windows bounded by |1|, warm-up nulled") {
    val rows = graft.queries.RollingQueries.winRollCorr.fn(spark, "/root/testdata/sf0.01")
      .select("roll_corr").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val defined = rows.flatten
    assert(defined.nonEmpty, "some 30-row windows must fill at sf0.01")
    assert(defined.forall(v => math.abs(v) <= 1.0 + 1e-12))
    assert(rows.count(_.isEmpty) > 0, "warm-up rows below min_periods stay null")
  }

  test("pagerank and tfidf-cosine scores are bit-identical at 1 vs 32 shuffle partitions") {
    // round-9's heaviest float paths through the same end-to-end
    // parallelism-invariance contract PipelineSpec pins for r8's: grid
    // sums make the published doubles independent of partitioning
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def run() = (
      VectorQueries.graphPagerank.fn(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      CorpusStatsQueries.textTfidfCosine.fn(spark, "/root/testdata/sf0.01").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    try {
      spark.conf.set(key, "1")
      val (p1, c1) = run()
      spark.conf.set(key, "32")
      val (p32, c32) = run()
      assert(p1 == p32) // published grid cells identical at any parallelism
      assert(c1 == c32)
    } finally spark.conf.set(key, before)
  }

  test("q_graph_pagerank invariants on real embeddings: positivity and mass") {
    val rows = VectorQueries.graphPagerank.fn(spark, sf)
      .select((col("pagerank") / 1073741824.0).as("pr")).as[Double].collect()
    assert(rows.nonEmpty)
    val n = rows.length.toDouble
    assert(rows.forall(_ >= 0.15 / n - 1e-9), "teleport floor")
    // mutual graph: in==out degree, so the damped walk conserves mass to
    // grid-flooring error (|V| + |E| floors per iteration)
    assert(math.abs(rows.sum - 1.0) < 1e-4, s"sum=${rows.sum}")
  }
}
