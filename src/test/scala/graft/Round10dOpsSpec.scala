package graft

import java.nio.file.Files

import graft.queries.{CorpusStatsQueries, CurationQueries, PipelineQueries, PrepQueries}

/** Hand-computed semantics + driver replays for the round-10 batch-4
  * operators: BPE merge-pair counts on a pencil-and-paper vocabulary and
  * against a full Scala recount at sf0.001, mixture epoch planning
  * against the exact grid arithmetic, the duplicate-cluster size
  * histogram on planted normalize-identical documents, and curriculum
  * phase assignment against a Scala replay of the integer-quartile rule.
  */
class Round10dOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_r10d_$tag").toFile.getAbsolutePath

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def docTexts(dir: String): Seq[String] =
    graft.util.Tables.documents(spark, dir).select("text").collect().map(_.getString(0)).toSeq

  test("bpe_merge_pairs: pencil-and-paper vocabulary, frequency-weighted, tie on pair") {
    val dir = tmpDir("bpe")
    // words: aab x2, ab x1, x x1 (single char: no pairs)
    writeDocs(dir, Seq((0L, "aab aab ab x", "en", "s")))
    val out = PrepQueries.bpeMergePairs.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // aab -> aa, ab (x2 each); ab -> ab (x1)  =>  ab: 3, aa: 2
    assert(out.toSeq == Seq((1L, "ab", 3L), (2L, "aa", 2L)))
  }

  test("bpe_merge_pairs: sf0.001 top-20 equals a full Scala recount") {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    docTexts(sf).foreach(_.split(" ", -1).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L))
    val pc = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2); pc(p) = pc.getOrElse(p, 0L) + c
      }
    }
    val expected = pc.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
      .zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c) }
    val got = PrepQueries.bpeMergePairs.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("mix_epochs: sf0.001 equals the exact grid arithmetic replay") {
    val src = graft.util.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split("\\s+").length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = src.values.sum
    val z = src.values.map(t => math.floor(math.sqrt(t.toDouble) * Grid).toLong)
      .sum.toDouble / Grid
    val expected = src.map { case (s, t) =>
      val raw = ((math.sqrt(t.toDouble) / z) * (2.0 * total)) / t
      val cell = math.floor(raw * Grid).toLong
      (s, t, cell, math.min(cell, 4L * 1073741824L), if (cell > 4L * 1073741824L) 1L else 0L)
    }.toSet
    val got = PipelineQueries.mixEpochs.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dedup_cluster_sizes: planted normalize-identical docs make a real histogram") {
    val dir = tmpDir("clsz")
    writeDocs(dir, Seq(
      (0L, "Hello, World!", "en", "s"),   // all three normalize to "hello world"
      (1L, "hello   world", "en", "s"),
      (2L, "HELLO WORLD.", "en", "s"),
      (3L, "something else", "en", "s"),
      (4L, "another doc", "en", "s")))
    val out = CorpusStatsQueries.dedupClusterSizes.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def share(n: Long) = math.floor(n.toDouble / 5.0 * Grid).toLong
    assert(out == Map(3L -> ((1L, 3L, share(3))), 1L -> ((2L, 2L, share(2)))))
  }

  test("dedup_cluster_sizes: duplicate-free sf0.001 collapses to the sz=1 row, share 2^30") {
    val out = CorpusStatsQueries.dedupClusterSizes.fn(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == r.getLong(2) &&
      r.getLong(3) == Grid.toLong)
  }

  test("js_source: two-source corpus matches the pencil-and-paper JS, bounded by ln 2") {
    val dir = tmpDir("js")
    // corpus: q(a)=2/5 q(b)=2/5 q(c)=1/5; A="a a b" p=(2/3,1/3); B="b c" p=(1/2,1/2)
    Seq((0L, "a a b", "en", "A", 5L), (1L, "b c", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def js(p: Map[String, Double], q: Map[String, Double]): Double = {
      val sup = q.keySet
      sup.toSeq.map { w =>
        val pw = p.getOrElse(w, 0.0); val qw = q(w); val m = 0.5 * (pw + qw)
        (if (pw > 0) 0.5 * pw * math.log(pw / m) else 0.0) + 0.5 * qw * math.log(qw / m)
      }.sum
    }
    val q = Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2)
    val expA = js(Map("a" -> 2.0 / 3, "b" -> 1.0 / 3), q)
    val expB = js(Map("b" -> 0.5, "c" -> 0.5), q)
    val out = CorpusStatsQueries.textJsSource.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2) / Grid))).toMap
    assert(out("A")._1 == 3L && out("B")._1 == 2L)
    assert(math.abs(out("A")._2 - expA) < 3e-9, s"A=${out("A")._2} want $expA")
    assert(math.abs(out("B")._2 - expB) < 3e-9, s"B=${out("B")._2} want $expB")
    out.values.foreach { case (_, v) => assert(v >= 0.0 && v <= 0.6931471805599453 + 1e-9) }
  }

  test("js_source: a source distributed like the corpus scores ~0") {
    val dir = tmpDir("js0")
    Seq((0L, "a a b", "en", "A", 5L), (1L, "a a b", "en", "B", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusStatsQueries.textJsSource.fn(spark, dir).collect()
      .map(r => r.getLong(2) / Grid)
    out.foreach(v => assert(math.abs(v) < 1e-8, s"js=$v"))
  }

  test("q_eval_map equals the average-precision recomputation from the same chain") {
    val ann = graft.queries.VectorQueries.annIvf.fn(spark, sf).select("q", "c", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gt = graft.queries.VectorQueries.annCosineTopk.fn(spark, sf).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val byQ = ann.groupBy(_._1).map { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      var cum = 0L
      val addends = sorted.map { case (_, c, rn) =>
        val rel = if (gt((q, c))) 1L else 0L
        cum += rel
        math.floor(((rel * cum).toDouble / rn) * Grid).toLong
      }
      val apn = addends.sum.toDouble / Grid
      q -> (sorted.count { case (_, c, _) => gt((q, c)) }.toLong,
        math.floor(apn / 3.0 * Grid).toLong)
    }
    val expected = (0L to 9L).map(q => q -> byQ.getOrElse(q, (0L, 0L))).toMap
    val got = graft.queries.VectorQueries.evalMap.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // perfect query: all 3 hits in order gives AP = 1 exactly (cell 2^30)
    assert(got.values.exists { case (h, ap) => h == 3L && ap == Grid.toLong },
      "fixture should contain at least one perfect query")
  }

  test("curation_report: planted corpus exercises every flag bit and the keep rule") {
    val dir = tmpDir("report")
    writeDocs(dir, Seq(
      // A/B normalize-identical: A (min id) is the keeper, B is the dup
      (0L, "Alpha, beta! gamma delta epsilon zeta eta theta", "en", "s1"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s1"),
      // C: 8x the same token -> dup-token frac 7/8 > 0.7
      (2L, "spam spam spam spam spam spam spam spam", "en", "s1"),
      // D is the benchmark source (excluded from the report universe)
      (3L, "one two three four five six seven eight", "en", "src0"),
      // E: 4 of 6 shingles overlap the benchmark -> contaminated
      (4L, "one two three four five six zzz yyy", "en", "s1"),
      // F: email address -> PII flag (redaction, still kept)
      (5L, "contact me at bob@example.com for details about stuff", "en", "s1"),
      (6L, "just a normal clean document with many distinct words", "en", "s1")))
    val got = CurationQueries.curationReport.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(!got.contains(3L), "benchmark docs are not in the report")
    assert(got(0L) == ((0L, 0L, 0L, 0L, 0L, 1L)), "keeper of the dup pair stays")
    assert(got(1L) == ((1L, 0L, 0L, 0L, 1L, 0L)), "non-keeper flagged dup")
    assert(got(2L) == ((0L, 1L, 0L, 0L, 2L, 0L)), "repetition gate")
    assert(got(4L) == ((0L, 0L, 1L, 0L, 4L, 0L)), "contamination gate")
    assert(got(5L) == ((0L, 0L, 0L, 1L, 8L, 1L)), "PII flags but keeps")
    assert(got(6L) == ((0L, 0L, 0L, 0L, 0L, 1L)), "clean doc")
  }

  test("curation_report: sf0.001 covers the train universe, keep consistent with bits") {
    val nTrain = graft.util.Tables.documents(spark, sf)
      .filter("source <> 'src0' AND text IS NOT NULL").count()
    val rows = CurationQueries.curationReport.fn(spark, sf).collect()
    assert(rows.length.toLong == nTrain)
    rows.foreach { r =>
      val (fd, fr, fc, fp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getLong(5) == fd + 2 * fr + 4 * fc + 8 * fp)
      assert(r.getLong(6) == (if (fd == 0 && fr == 0 && fc == 0) 1L else 0L))
    }
  }

  test("emb_whiten: sf0.001 equals the per-dim z-score replay with exact moments") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val d = vecs.head._2.length
    val n = vecs.size.toDouble
    // decimal-exact per-dim sums (scale 8 for e, 4 for e*e), like Exact
    def dsum(xs: Iterable[Double], scale: Int): Double =
      xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val stats = (0 until d).map { i =>
      val col = vecs.values.map(_(i))
      val s = dsum(col, 8); val sq = dsum(col.map(x => x * x), 4)
      val mu = s / n
      val sd = math.sqrt(math.max(0.0, (sq - s * s / n) / n))
      (mu, sd)
    }
    val expected = vecs.map { case (id, v) =>
      val zs = (0 until d).map { i =>
        val (mu, sd) = stats(i); if (sd > 0) (v(i) - mu) / sd else 0.0
      }
      val cell = zs.map(z => math.floor(z * z * Grid).toLong).sum
      val maxz = math.floor(zs.map(math.abs).max * Grid).toLong
      val nOut = zs.count(z => math.abs(z) > 3.0).toLong
      id -> ((cell, maxz, nOut))
    }
    val got = PrepQueries.embWhiten.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // whitened norm^2 should concentrate near d for a sane embedding table
    val meanNorm = got.values.map(_._1.toDouble / Grid).sum / got.size
    assert(meanNorm > d * 0.5 && meanNorm < d * 1.5)
  }

  test("nn_descent: sf0.001 equals the 2-hop replay from a stacked-LSH graph replay") {
    import graft.functions.DecimalDot.quantize8
    def qdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) { s += quantize8(a(i) * b(i)); i += 1 }
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue()
    }
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(qdot(v, v)) }
    // stacked-LSH (4 tables x 4 planes) bucket replay: md5 signs, the
    // DECIMAL(18,8) projection fold, sign bit -> bucket
    def signs(j: Int): Array[Double] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to 64).map { i =>
        val digest = md.digest(s"$j|$i".getBytes("UTF-8"))
        if ((digest(3) & 1) == 1) 1.0 else -1.0
      }.toArray
    }
    val allSigns = (0 until 16).map(signs)
    def proj(v: Array[Double], j: Int): Double = {
      val sg = allSigns(j)
      var acc = BigDecimal(0).setScale(8)
      (0 until 64).foreach { i =>
        acc = acc + BigDecimal(v(i) * sg(i)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      acc.toDouble
    }
    val bucketOf = vecs.map { case (id, v) =>
      id -> (0 until 4).map { t =>
        (0 until 4).map(j => if (proj(v, t * 4 + j) >= 0) 1L << j else 0L).sum
      }
    }
    val edges = vecs.keys.toSeq.flatMap { q =>
      val cands = vecs.keys.filter(c => c != q &&
        (0 until 4).exists(t => bucketOf(c)(t) == bucketOf(q)(t)))
      cands.map(c => (q, c, qdot(vecs(q), vecs(c)) / (nrm(q) * nrm(c)))).toSeq
        .sortBy { case (_, c, cos) => (-cos, c) }.take(3)
    }.toArray
    val byQ = edges.groupBy(_._1)
    val edgeSet = edges.map(e => (e._1, e._2)).toSet
    val expected = byQ.map { case (q, es) =>
      val worst = es.map(_._3).min
      val nCur = es.length.toLong
      val cands = es.flatMap { case (_, b, _) => byQ.getOrElse(b, Array.empty).map(_._2) }
        .filter(c => c != q && !edgeSet((q, c))).distinct
      val best = cands.map(c => (qdot(vecs(q), vecs(c)) / (nrm(q) * nrm(c)), c))
        .sortBy { case (cos, c) => (-cos, c) }.headOption
      val (cand, cosNew, improved) = best match {
        case None => (None, None, 0L)
        case Some((cos, c)) =>
          (Some(c), Some(math.floor(cos * Grid).toLong),
            if (nCur < 3 || cos > worst) 1L else 0L)
      }
      q -> ((cand, nCur, cosNew, math.floor(worst * Grid).toLong, improved))
    }
    val got = graft.queries.VectorQueries.annNnDescent.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, e) => assert(got(q) == e, s"q=$q got=${got(q)} want=$e") }
    // the fixture graph must leave SOMETHING to improve and something converged
    assert(got.values.exists(_._5 == 1L), "at least one improving candidate")
    assert(got.values.exists(_._5 == 0L), "at least one converged node")
  }

  test("curriculum_phase: sf0.001 equals the integer-quartile Scala replay") {
    val lens = docTexts(sf).map(_.split(" ", -1).length.toLong)
    val n = lens.length.toLong
    val cum = lens.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1).scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (v, c)) => (v, acc + c)
      }.drop(1)
    def thr(k: Long, den: Long): Long =
      cum.collectFirst { case (v, cm) if cm * den >= k * n => v }.get
    val (t1, t2, t3) = (thr(1, 4), thr(1, 2), thr(3, 4))
    val phases = lens.map(l =>
      1L + (if (l > t1) 1L else 0L) + (if (l > t2) 1L else 0L) + (if (l > t3) 1L else 0L))
    val expected = phases.zip(lens).groupBy(_._1).map { case (p, g) =>
      (p, g.length.toLong, g.map(_._2).min, g.map(_._2).max, g.map(_._2).sum)
    }.toSet
    val got = CurationQueries.curriculumPhase.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // 4 phases exist and each holds 15-35% of a 500-doc corpus
    assert(got.map(_._1) == Set(1L, 2L, 3L, 4L))
    got.foreach { case (_, nd, _, _, _) => assert(nd >= 75 && nd <= 175) }
  }
}
