package graft

import graft.ops.TextOps
import graft.queries.{CorpusQueries, SessionQueries, VectorQueries}
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-3 corpus/session operators, checked
  * against independent recomputations at sf0.001 (value-exactness vs
  * DuckDB is the driver's gate; these pin the SEMANTICS — session gap law,
  * cluster transitivity, hamming bound, quantile positions — with
  * different code paths than the queries themselves). */
class CorpusSessionSpec extends SparkSpec {

  test("q_sessionize: sessions partition the events and respect the gap law") {
    val sessions = SessionQueries.sessionize.fn(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    // complete partition: every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head.getLong(0) == nEvents)
    assert(sessions.filter(col("start_us") > col("end_us")).count() == 0)
    assert(sessions.filter(
      col("duration_us") =!= col("end_us") - col("start_us")).count() == 0)
    // gap law, checked from the per-session envelope: consecutive sessions
    // of one user must be separated by MORE than the 12h gap (else they
    // would have merged), computed here with a window over the aggregate —
    // a different path than the query's row-level lag
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_us")
    val gapUs = 12L * 3600 * 1000000L
    val viol = sessions
      .withColumn("prev_end", lag("end_us", 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_us") - col("prev_end") <= gapUs)
    assert(viol.count() == 0)
    sessions.unpersist()
  }

  test("q_dedup_cluster: labels are transitive-closure minima over the pair graph") {
    val labels = CorpusQueries.dedupCluster.fn(spark, sf).cache()
    val pairs = TextOps.minhashPairs(Tables.documents(spark, sf)).cache()
    // every edge's endpoints carry the same cluster label
    val la = labels.select(col("doc_id").as("doc_a"), col("cluster").as("ca"))
    val lb = labels.select(col("doc_id").as("doc_b"), col("cluster").as("cb"))
    assert(pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter(col("ca") =!= col("cb")).count() == 0)
    // each cluster's id is its minimum member (the keeper), and keeper
    // flags agree with that definition
    val bad = labels.groupBy("cluster").agg(min("doc_id").as("lo"))
      .filter(col("cluster") =!= col("lo"))
    assert(bad.count() == 0)
    assert(labels.filter(col("is_keeper") =!= (col("doc_id") === col("cluster")))
      .count() == 0)
    pairs.unpersist(); labels.unpersist()
  }

  test("q_dedup_simhash_pairs: hamming recomputed from signatures, bound holds") {
    val out = CorpusQueries.dedupSimhashPairs.fn(spark, sf).cache()
    assert(out.filter(col("hamming") > 2).count() == 0)
    val sig = TextOps.simhashSig64(Tables.documents(spark, sf))
    val sa = sig.select(col("doc_id").as("doc_a"), col("sim_lo").as("la"),
      col("sim_hi").as("ha"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sim_lo").as("lb"),
      col("sim_hi").as("hb"))
    val recomputed = out.join(sa, "doc_a").join(sb, "doc_b")
      .filter(expr("bit_count(la ^ lb) + bit_count(ha ^ hb)").cast("long")
        =!= col("hamming"))
    assert(recomputed.count() == 0)
    // the 64-bit signature's low half IS the 32-bit signature (same md5
    // word, same votes) — the widening strictly extends, never redefines
    val s32 = TextOps.simhashSig(Tables.documents(spark, sf))
    assert(sig.join(s32, "doc_id")
      .filter(col("sim_lo") =!= col("simhash")).count() == 0)
    out.unpersist()
  }

  test("q_dedup_simhash_pairs blocking is lossless: every hamming<=2 pair of a planted corpus survives") {
    import spark.implicits._
    // docs built to differ in 0-2 signature bits: exact copies and
    // single-word swaps of a shared base text, plus unrelated noise docs
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (Seq(
      (1L, base), (2L, base),                       // hamming 0
      (3L, base.replace("tok7", "tok7x")),           // few-bit drift
      (4L, base.replace("tok31", "tok31y")),
      (5L, "completely different words here entirely unrelated content")
    )).toDF("doc_id", "text")
    // brute-force ground truth over ALL pairs from the 64-bit signatures
    val sig = TextOps.simhashSig64(docs)
    val all = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sim_lo ^ b.sim_lo) + bit_count(a.sim_hi ^ b.sim_hi)")
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
    // run the registered query's own candidate pipeline on the fixture by
    // rebuilding it from the op (the Q closure reads parquet; here we care
    // about the blocking argument itself)
    val band = IndexedSeq("sim_lo & 65535", "shiftright(sim_lo, 16) & 65535",
      "sim_hi & 65535", "shiftright(sim_hi, 16) & 65535")
    val bandPairs = for (i <- 0 until 4; j <- i + 1 until 4) yield (i, j)
    val keys = bandPairs.zipWithIndex.map { case ((i, j), p) =>
      expr(s"$p * 4294967296 + (${band(i)}) * 65536 + (${band(j)})")
    }
    val blocked = sig.select(col("doc_id"), col("sim_lo"), col("sim_hi"),
      explode(array(keys: _*)).as("key"))
    val viaBlocking = blocked.as("a")
      .join(blocked.as("b"), col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sim_lo ^ b.sim_lo) + bit_count(a.sim_hi ^ b.sim_hi)")
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 2)
    assert(all.count() >= 2, "fixture must actually contain near-dup pairs")
    assert(all.exceptAll(viaBlocking).count() == 0, "blocking dropped a qualifying pair")
    assert(viaBlocking.exceptAll(all).count() == 0)
  }

  test("tokenBudget: null text keeps nullable ws_tokens and matches the window form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a b c d"),                  // 4 tokens
      (2L, "en", null.asInstanceOf[String]),  // null text: spends no budget
      (3L, "en", "a b"),                      // 2 tokens
      (4L, "en", "a b c d e f"),              // 6 tokens
      (5L, "de", null.asInstanceOf[String]),  // a language of ONLY null text
      (6L, "de", null.asInstanceOf[String]),  //   -> NULL running sum, drops
      (7L, "fr", "x y z")
    ).toDF("doc_id", "lang", "text")
    val budget = 15L
    val out = graft.ops.Corpus.tokenBudget(docs, budget)
      .select("doc_id", "lang", "ws_tokens", "cum_tokens")
    // oracle-shaped window form: len(split(NULL)) is NULL, sum() skips
    // null addends, nulls order last, and a NULL cumulative total fails
    // the budget predicate
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("ws_tokens").desc_nulls_last, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .withColumn("ws_tokens", when(col("text").isNotNull,
        size(split(trim(col("text")), "\\s+")).cast("long")))
      .withColumn("cum_tokens", sum("ws_tokens").over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "lang", "ws_tokens", "cum_tokens")
    assert(out.exceptAll(naive).count() == 0 && naive.exceptAll(out).count() == 0)
    // the kept null-text row reports NULL tokens (not 0) with the real
    // rows' total as its running sum; the all-null language is gone
    val r2 = out.filter(col("doc_id") === 2L).head()
    assert(r2.isNullAt(2) && r2.getLong(3) == 12L)
    assert(out.filter(col("lang") === "de").count() == 0)
  }

  test("q_text_repetition: fractions bounded, distinct <= total") {
    val r = CorpusQueries.textRepetition.fn(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_distinct") > col("n_tokens")).count() == 0)
    for (c <- Seq("dup_token_frac", "top_bigram_frac", "dup_bigram_frac"))
      assert(r.filter(col(c) < 0 || col(c) > 1).count() == 0, c)
    // hand-check one document end-to-end
    val doc = Tables.documents(spark, sf).select("doc_id", "text").head()
    val toks = doc.getString(1).split(" ").toSeq
    val expected = 1.0 - toks.distinct.size.toDouble / toks.size
    val got = r.filter(col("doc_id") === doc.getLong(0))
      .select("dup_token_frac").head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
    r.unpersist()
  }

  test("q_contamination: overlap bounded by shingle count; benchmark excluded") {
    val c = CorpusQueries.contamination.fn(spark, sf).cache()
    assert(c.filter(col("n_overlap") > col("n_shingles")).count() == 0)
    val src0Ids = Tables.documents(spark, sf).filter(col("source") === "src0")
      .select("doc_id")
    assert(c.join(src0Ids, "doc_id").count() == 0)
    c.unpersist()
  }

  test("q_sample_stratified: every kept row's bucket is below its language rate") {
    val s = CorpusQueries.sampleStratified.fn(spark, sf).cache()
    val rate = when(col("lang") === "en", 50).when(col("lang") === "de", 40)
      .when(col("lang") === "fr", 30).when(col("lang") === "es", 20).otherwise(10)
    assert(s.count() > 0)
    assert(s.filter(col("bucket") >= rate).count() == 0)
    // determinism: the same call yields the same keep set
    val again = CorpusQueries.sampleStratified.fn(spark, sf)
    assert(s.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
    s.unpersist()
  }

  test("q_quantile_group: p50 equals the sort-position value, recomputed") {
    val q = CorpusQueries.quantileGroup.fn(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().groupBy(_.getString(0))
    q.collect().foreach { row =>
      val lens = docs(row.getString(0)).map(_.getLong(1)).sorted
      assert(row.getLong(1) == lens.length)
      assert(row.getLong(2) == lens(math.ceil(0.5 * lens.length).toInt - 1), row)
      assert(row.getLong(3) == lens(math.ceil(0.9 * lens.length).toInt - 1), row)
    }
    q.unpersist()
  }

  test("q_event_funnel: stage counts are monotonically non-increasing") {
    val f = SessionQueries.eventFunnel.fn(spark, sf).cache()
    assert(f.count() > 0)
    assert(f.filter(col("n_view") > col("n_users")).count() == 0)
    assert(f.filter(col("n_click_after_view") > col("n_view")).count() == 0)
    assert(f.filter(col("n_purchase_after_click") > col("n_click_after_view")).count() == 0)
    // n_users sums to the number of distinct (user, day) pairs
    val userDays = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(f.agg(sum("n_users")).head.getLong(0) == userDays)
    f.unpersist()
  }

  test("q_dedup_keep_best: keeper is the longest member of its own cluster") {
    val kb = CorpusQueries.dedupKeepBest.fn(spark, sf).cache()
    val labels = CorpusQueries.dedupCluster.fn(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "n_chars"), "doc_id")
    // one keeper per cluster; member count and max length agree with the
    // clustering output recomputed independently
    val agg = labels.groupBy("cluster")
      .agg(count(lit(1)).as("n2"), max("n_chars").as("maxc"))
    val joined = kb.join(agg, "cluster")
    assert(joined.count() == kb.count())
    assert(joined.filter(col("n_members") =!= col("n2")).count() == 0)
    assert(joined.filter(col("keeper_chars") =!= col("maxc")).count() == 0)
    kb.unpersist()
  }

  test("q_tokens_budget: per-language cumulative totals stay within budget") {
    val b = CorpusQueries.tokensBudget.fn(spark, sf).cache()
    assert(b.count() > 0)
    assert(b.filter(col("cum_tokens") > 3000).count() == 0)
    // within each language the kept set is the prefix of the size-ordered
    // list: max cum_tokens equals the sum of kept ws_tokens
    val check = b.groupBy("lang").agg(sum("ws_tokens").as("s"), max("cum_tokens").as("m"))
    assert(check.filter(col("s") =!= col("m")).count() == 0)
    b.unpersist()
  }

  test("tokenBudgetBy: continuous metric matches the per-language sort form bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // unique double scores -> every value-run is a singleton: exactly the
    // shape that degenerates the run-histogram tokenBudget to a full sort
    val docs = (1 to 800).map { i =>
      val lang = s"l${i % 4}"
      val text = if (i % 97 == 0) null
        else (1 to (i % 17 + 1)).map(t => s"w$t").mkString(" ")
      val score = rnd.nextDouble() * 8 - 3 // negatives exercise the sign flip
      (i.toLong, lang, text, score)
    }.toDF("doc_id", "lang", "text", "score")
    val budget = 400L
    val out = graft.ops.Corpus.tokenBudgetBy(docs, "score", budget, buckets = 64)
      .select("doc_id", "lang", "ws_tokens", "cum_tokens")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = docs
      .withColumn("ws_tokens", when(col("text").isNotNull,
        size(split(trim(col("text")), "\\s+")).cast("long")))
      .withColumn("cum_tokens", sum("ws_tokens").over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "lang", "ws_tokens", "cum_tokens")
    assert(naive.count() > 0)
    assert(out.exceptAll(naive).count() == 0 && naive.exceptAll(out).count() == 0)
    // the plan must never sort a whole language by the metric: every sort
    // that orders by score is bucket-scoped (lang, _bkt, score, ...)
    val plan = graft.ops.Corpus.tokenBudgetBy(docs, "score", budget, buckets = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Sort \\[lang#\\d+ [^,]+, score#.*"),
      s"language-wide metric sort found in plan:\n${plan.take(1500)}")
  }

  test("q_minhash_jaccard_est: pair set matches LSH candidates, estimate = agree/8") {
    val est = graft.queries.TextQueries.minhashJaccardEst.fn(spark, sf).cache()
    val pairs = graft.queries.TextQueries.dedupMinhash.fn(spark, sf)
    assert(est.select("doc_a", "doc_b").exceptAll(pairs).count() == 0)
    assert(pairs.exceptAll(est.select("doc_a", "doc_b")).count() == 0)
    assert(est.filter(col("n_agree") < 0 || col("n_agree") > 8).count() == 0)
    assert(est.filter(col("jaccard_est") =!= col("n_agree").cast("double") / 8)
      .count() == 0)
    est.unpersist()
  }

  test("q_ann_lsh_probe: multi-probe recall dominates single-bucket recall") {
    // the superset law (probing adds buckets, so the best hit per query is
    // at least as good) holds per plane count — compare like-for-like at
    // q_ann_lsh_probe's 6 planes AND q_ann_lsh's 2 planes (the registered
    // configs themselves use different plane counts since r7)
    for (planes <- Seq(2, 6)) {
      val single = VectorQueries.lshSearch(spark, sf, planes, multiProbe = false)
        .filter(col("rn") === 1).select(col("q"), col("cosine").as("c1"))
      val probed = VectorQueries.lshSearch(spark, sf, planes, multiProbe = true)
        .filter(col("rn") === 1).select(col("q"), col("cosine").as("cp"))
      val j = single.join(probed, "q")
      assert(j.count() > 0)
      assert(j.filter(col("cp") < col("c1")).count() == 0, s"planes=$planes")
    }
  }

  test("CorpusPipeline.run materializes every layer with monotone row counts") {
    val root = java.nio.file.Files.createTempDirectory("graft_corpus_t").toString
    val s = CorpusPipeline.run(spark, Tables.documents(spark, sf), root)
    assert(s.bronzeRows > 0)
    assert(s.afterExact <= s.bronzeRows)
    assert(s.afterNearDup <= s.afterExact)
    assert(s.goldRows > 0)
    assert(s.goldTokens > 0)
    for (layer <- Seq("bronze/documents", "silver/deduped", "silver/quality",
        "silver/clean", "silver/redacted", "gold/training_mix",
        "gold/packed_sequences"))
      assert(new java.io.File(s"$root/$layer").exists(), layer)
    // the packed layer covers every gold doc with contiguous offsets:
    // packs × 256 bounds the token total from above, and each language's
    // last pack is the only one allowed to be partial
    assert(s.goldPacks > 0)
    val packedSeqs = spark.read.parquet(s"$root/gold/packed_sequences")
    assert(packedSeqs.count() === s.goldRows)
    val offSums = packedSeqs.groupBy("lang")
      .agg(max(col("start_off") + col("ws_tokens")).as("end"),
        sum("ws_tokens").as("tok")).collect()
    offSums.foreach(r => assert(r.getLong(1) === r.getLong(2), r.getString(0)))
    // the synthetic corpus carries no PII and no newlines: the redaction
    // and line-cleanup stages must be exact identities on it
    assert(s.piiDocs == 0L)
    // the gold mix respects the per-language budget AND contains no
    // benchmark-source (eval) documents
    val gold = spark.read.parquet(s"$root/gold/training_mix")
    assert(gold.groupBy("lang").agg(max("cum_tokens").as("m"))
      .filter(col("m") > 3000).count() == 0)
    assert(gold.filter(col("source") === "src0").count() == 0)
  }

  test("CorpusPipeline.run compaction epilogue: gold lands as one file per layer, results unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_corpus_t4").toString
    val s = CorpusPipeline.run(spark, Tables.documents(spark, sf), root,
      compactTargetBytes = Some(64L * 1024 * 1024))
    def dataFiles(dir: String) = Option(new java.io.File(s"$root/$dir").listFiles())
      .getOrElse(Array.empty)
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    // tiny fixture << 64 MiB target: each gold layer compacts to ONE file
    assert(dataFiles("gold/training_mix") == 1, "training_mix not compacted")
    assert(dataFiles("gold/packed_sequences") == 1, "packed_sequences not compacted")
    // and the compacted layers still answer exactly the pipeline's counts
    assert(spark.read.parquet(s"$root/gold/training_mix").count() == s.goldRows)
    assert(spark.read.parquet(s"$root/gold/packed_sequences").count() == s.goldRows)
  }

  test("CorpusPipeline.run line-cleans and redacts planted documents end to end") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_corpus_t3").toString
    // doc 1: PII to redact; doc 2: doc 1 with its one line repeated — the
    // line cleanup must collapse it back onto doc 1's text so exact dedup
    // removes it; doc 3: clean filler so gates have a population
    val body = (1 to 20).map(i => f"word$i%02d").mkString(" ")
    val withPii = s"reach admin@example.org or 555-867-5309 then $body"
    val raw = Seq(
      (1L, withPii, "en", "src1"),
      (2L, s"$withPii\n$withPii", "en", "src1"),
      (3L, s"other filler text $body", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val s = CorpusPipeline.run(spark, raw, root, benchSource = "srcX",
      minEntropy = None)
    // line cleanup made doc 2 identical to doc 1 -> exact dedup eats it
    assert(s.bronzeRows == 3L && s.afterExact == 2L)
    assert(s.piiDocs == 1L)
    val gold = spark.read.parquet(s"$root/gold/training_mix")
    val texts = gold.select("text").as[String].collect()
    assert(texts.exists(t => t.contains("<EMAIL>") && t.contains("<PHONE>")))
    assert(!texts.exists(t => t.contains("admin@example.org") || t.contains("555-867-5309")))
  }

  test("CorpusPipeline.run trips the corpus circuit breaker and never writes gold") {
    val root = java.nio.file.Files.createTempDirectory("graft_corpus_t2").toString
    // absurd threshold: any repetition at all is "bad" -> loss% blows past cap
    val e = intercept[IllegalStateException] {
      CorpusPipeline.run(spark, Tables.documents(spark, sf), root,
        maxDupTokenFrac = -1.0, maxTopBigramFrac = -1.0, maxLossPct = 10.0)
    }
    assert(e.getMessage.contains("circuit breaker"))
    assert(!new java.io.File(s"$root/gold/training_mix").exists())
  }

  test("q_ann_lsh: top-3 per query, candidates from the query's bucket") {
    val r = VectorQueries.annLsh.fn(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("rn") > 3).count() == 0)
    assert(r.filter(col("cosine") > 1.0 + 1e-9 || col("cosine") < -1.0 - 1e-9)
      .count() == 0)
    assert(r.filter(col("q") >= 10).count() == 0)
    r.unpersist()
  }
}
