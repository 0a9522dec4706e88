package graft

import graft.queries.{PipelineQueries, PrepQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 operators, verified by independent Scala replays: length
  * buckets against a hand-rolled next-pow2 histogram, shard manifests
  * against per-doc hash recomputation (and determinism across runs),
  * and semi-hard negatives against the triplet miner's own frame (the
  * two mining rules share one pair chain, so their outputs must be
  * mutually consistent on every anchor).
  */
class Round12OpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("pack_length_buckets: next-pow2 histogram, capacity >= tokens, buckets partition the corpus") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("lang"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bounds = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    def bucketOf(n: Long): Long = bounds.find(n <= _).getOrElse(8192L)
    val expected = docs.groupBy { case (lang, n) => (lang, bucketOf(n)) }
      .map { case ((lang, b), xs) => (lang, b, xs.size.toLong, xs.map(_._2).sum) }
      .toSet
    val got = PrepQueries.packLengthBuckets.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"bucket histogram mismatch")
    // capacity and waste are self-consistent on every row
    PrepQueries.packLengthBuckets.fn(spark, sf).collect().foreach { r =>
      val (b, nd, st, pad) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pad == nd * b)
      assert(st <= pad, "tokens cannot exceed the padded capacity")
      assert(r.getLong(5) ==
        math.floor((pad - st).toDouble / pad * Grid).toLong, "pad_waste pin")
    }
  }

  test("split_shards: complete spine, per-doc hash recomputation, determinism") {
    val rows = PipelineQueries.splitShards.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (0L until 16L), "complete shard spine")
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def shardOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard:$id".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val expected = docs.groupBy { case (id, _) => shardOf(id) }
      .map { case (s, xs) => s -> (xs.size.toLong, xs.map(_._2).sum) }
    rows.foreach { case (s, nd, nt) =>
      assert(nd == expected.get(s).map(_._1).getOrElse(0L), s"shard $s doc count")
      assert(nt == expected.get(s).map(_._2).getOrElse(0L), s"shard $s token count")
    }
    assert(rows.map(_._2).sum == docs.length, "shards partition the corpus")
    // determinism: a second run is row-identical
    val again = PipelineQueries.splitShards.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }

  test("event_funnel_time: full Scala replay of staged durations and exact quantiles") {
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .filter(col("user_id").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val staged = ev.groupBy { case (u, day, _, _) => (u, day) }.map { case (_, xs) =>
      val vt = xs.filter(_._4 == "view").map(_._3).minOption
      val ct = vt.flatMap(v => xs.filter(x => x._4 == "click" && x._3 > v).map(_._3).minOption)
      val pt = ct.flatMap(c => xs.filter(x => x._4 == "purchase" && x._3 > c).map(_._3).minOption)
      (xs.head._2, vt, ct, pt)
    }.toSeq
    def q(vals: Seq[Long], p: Double): Long = {
      val sorted = vals.sorted
      sorted(math.ceil(p * sorted.size).toInt - 1)
    }
    val expected = (
      staged.collect { case (day, Some(v), Some(c), _) => (day, "view_to_click", c - v) } ++
        staged.collect { case (day, _, Some(c), Some(p)) => (day, "click_to_purchase", p - c) })
      .groupBy { case (day, st, _) => (day, st) }
      .map { case ((day, st), xs) =>
        val ds = xs.map(_._3)
        (day, st, ds.size.toLong, q(ds, 0.5), q(ds, 0.9))
      }.toSet
    val got = graft.queries.SessionQueries.eventFunnelTime.fn(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected, s"funnel latency mismatch:\n got=$got\n exp=$expected")
    // cross-consistency with the conversion counts (shared staged frame)
    val funnel = graft.queries.SessionQueries.eventFunnel.fn(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(3), r.getLong(4))).toMap
    got.foreach { case (day, st, n, _, _) =>
      val (nClick, nPurchase) = funnel(day)
      if (st == "view_to_click") assert(n == nClick)
      else assert(n == nPurchase)
    }
  }

  test("emb_rand_proj: sign matrix + decimal dot replayed from scratch") {
    val rows = graft.queries.PrepQueries.embRandProj.fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val embs = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(rows.size == embs.length * 8, "long form: one row per (vector, j)")
    def h32(str: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    embs.take(25).foreach { case (vid, e) =>
      (1 to 8).foreach { j =>
        val sum = e.zipWithIndex.map { case (x, i0) =>
          val s = if (h32(s"rp:${i0 + 1}:$j") % 2 == 0) 1.0 else -1.0
          graft.functions.DecimalDot.quantize8(x.toDouble * s)
        }.sum
        val y = new java.math.BigDecimal(
          java.math.BigInteger.valueOf(sum), 8).doubleValue()
        assert(rows((vid, j.toLong)) == y, s"y($vid, $j) diverged from the replay")
      }
    }
  }

  test("text_langid_trigram: full Scala replay of profiles, scoring, and the confusion matrix") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      if (t == null || t.length < 3) Nil
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    // per-lang profile: top-30 trigrams by count, tie-break trigram ASC
    val prof: Map[String, Set[String]] = docs.groupBy(_._2).map { case (lang, xs) =>
      lang -> xs.flatMap(x => tris(x._3)).groupBy(identity)
        .map { case (t, os) => (t, os.size) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(30).map(_._1).toSet
    }
    val langs = docs.map(_._2).distinct.sorted
    val pred = docs.map { case (_, lang, text) =>
      val ts = tris(text).toSet
      val best = langs.map(l => (l, prof(l).count(ts.contains)))
        .maxBy { case (l, sc) => (sc, LangDesc(l)) }._1
      (lang, best)
    }
    val expected = pred.groupBy(identity).map { case ((l, p), xs) =>
      (l, p, xs.size.toLong)
    }.toSet
    val got = graft.queries.TextQueries.textLangidTrigram.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, s"confusion cells mismatch:\n got=$got\n exp=$expected")
    // the classifier must beat chance on the labeled fixture
    val correct = pred.count { case (l, p) => l == p }
    assert(correct.toDouble / pred.length > 1.0 / langs.size,
      "trigram LID no better than chance on the fixture")
  }

  /** Ordering helper: maxBy picks the HIGHEST (score, LangDesc), and
    * LangDesc inverts string order so ties resolve to the ASC-lowest
    * lang — the query's (score DESC, cand ASC) rule. */
  private case class LangDesc(l: String) extends Ordered[LangDesc] {
    def compare(that: LangDesc): Int = that.l.compareTo(this.l)
  }

  test("scan_csv: bit-exact round-trip vs the parquet originals, TakeOrdered-free map plan") {
    val orig = graft.util.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val back = graft.queries.CoreQueries.scanCsv.fn(spark, sf)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)) ==
      orig.schema.map(f => (f.name, f.dataType.typeName)),
      "explicit read schema must reproduce the parquet types")
    assert(orig.exceptAll(back).count() == 0 && back.exceptAll(orig).count() == 0,
      "CSV round-trip must be bit-exact, doubles included")
  }

  test("text_vocab_coverage: Scala replay; monotone curve; top-k plan (no vocabulary sort)") {
    val toks = graft.ops.TextOps.explodeTokens(graft.util.Tables.documents(spark, sf))
      .select("word").collect().map(_.getString(0))
    val wc = toks.groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val total = wc.map(_._2).sum
    val ranked = wc.sortBy { case (w, c) => (-c, w) }
    val expected = Seq(10, 100, 1000).map { n =>
      val covered = ranked.take(n).map(_._2).sum
      (n.toLong, wc.size.toLong, total, covered,
        math.floor(covered.toDouble / total * Grid).toLong)
    }.toSet
    val df = graft.queries.CorpusStatsQueries.textVocabCoverage.fn(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected, s"coverage mismatch:\n got=$got\n exp=$expected")
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.map(_._4) == sorted.map(_._4).sorted, "coverage must be monotone in n_top")
    // the plan must take a bounded top-k, never sort the vocabulary
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-1000 should plan as TakeOrderedAndProject")
  }

  test("mm_audio_chunks: window geometry law on every row; audio rows only; gap-free cover") {
    val rows = graft.queries.TextQueries.mmAudioChunks.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (mid, _, _, _) => mid % 3 == 1 }, "audio rows only")
    rows.groupBy(_._1).foreach { case (mid, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids are dense from 0; starts advance by the hop
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"media $mid gaps")
      sorted.foreach { case (_, cid, t0, t1) =>
        assert(t0 == cid * 1000 && t1 > t0 - 1 && t1 <= t0 + 2000,
          s"media $mid chunk $cid window law violated ($t0, $t1)")
      }
      // consecutive windows overlap or touch: full cover of [0, dur)
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, _, e0), (_, _, s1, _)) => assert(s1 <= e0, s"media $mid gap")
        case _ =>
      }
    }
  }

  test("join_asof_nearest: brute-force replay (nearest purchase, past wins ties), universe-complete") {
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2), r.getString(3)))
    val purchasesByUser = ev.filter(_._4 == "purchase")
      .groupBy(_._2).map { case (u, xs) => u -> xs.map(_._3).toSeq.sorted }
    val nonPurch = ev.filter(_._4 != "purchase")
    val got = graft.queries.JoinQueries.joinAsofNearest.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got.size == nonPurch.length, "every non-purchase event publishes a row")
    nonPurch.foreach { case (eid, u, ts, _) =>
      val expected = purchasesByUser.getOrElse(u, Seq.empty[Long]) match {
        case ps if ps.isEmpty => None
        case ps =>
          // brute force: min |dt|, past wins ties
          Some(ps.minBy(p => (math.abs(p - ts), p - ts)))
      }
      assert(got(eid)._1 == expected, s"event $eid nearest mismatch")
      assert(got(eid)._2 == expected.map(_ - ts), s"event $eid dt mismatch")
    }
    assert(got.values.exists(v => v._2.exists(_ > 0)) &&
      got.values.exists(v => v._2.exists(_ < 0)),
      "fixture should exercise both directions")
  }

  test("graph_assortativity: Newman r replayed over the collected mutual edges") {
    val edges = graft.queries.VectorQueries.annKnnMutualHier.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val xy = edges.flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m2 = xy.size.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum; val syy = xy.map(p => p._2 * p._2).sum
    val row = graft.queries.VectorQueries.graphAssortativity.fn(spark, sf).collect().head
    assert(row.getLong(0) == m2, "doubled edge count")
    val vx = m2 * sxx - sx * sx; val vy = m2 * syy - sy * sy
    if (vx > 0 && vy > 0) {
      val r = (m2 * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
      assert(row.getLong(1) == math.floor(r * Grid).toLong, "assortativity pin")
      // x/y sums are symmetric by construction on the doubled edge list
      assert(sx == sy && sxx == syy)
    } else assert(row.isNullAt(1))
  }

  test("eval_rand_proj: distortion centers on 1 (JL expectation) and covers every blocked pair") {
    val rows = graft.queries.PrepQueries.evalRandProj.fn(spark, sf).collect()
    val nPairs = {
      val byLabel = graft.util.Tables.embeddings(spark, sf)
        .groupBy("label").count().collect().map(_.getLong(1))
      byLabel.map(n => n * (n - 1) / 2).sum
    }
    assert(rows.length.toLong == nPairs, "one row per label-blocked pair")
    val ds = rows.filter(!_.isNullAt(4)).map(_.getLong(4).toDouble / Grid)
    assert(ds.nonEmpty)
    val mean = ds.sum / ds.length
    assert(mean > 0.7 && mean < 1.4,
      f"mean distortion $mean%.3f far from the JL expectation of 1")
    assert(ds.forall(_ >= 0), "squared-distance ratio cannot be negative")
  }

  test("event_conversion_ci: Wilson bounds replayed; interval brackets p_hat and the funnel counts") {
    val funnel = graft.queries.SessionQueries.eventFunnel.fn(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = graft.queries.SessionQueries.eventConversionCi.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nvF, ncF) = funnel(r.getTimestamp(0))
      assert(r.getLong(1) == nvF && r.getLong(2) == ncF,
        "counts must equal the funnel's (shared staged frame)")
      val (nv, nc) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      if (nv > 0) {
        val z2 = 1.96 * 1.96
        val p = nc / nv
        val den = 1.0 + z2 / nv
        val ctr = (p + z2 / (2.0 * nv)) / den
        val hf = 1.96 * math.sqrt(p * (1.0 - p) / nv + z2 / (4.0 * nv * nv)) / den
        assert(r.getLong(3) == math.floor(p * Grid).toLong, "p_hat pin")
        assert(r.getLong(4) == math.floor((ctr - hf) * Grid).toLong, "lo pin")
        assert(r.getLong(5) == math.floor((ctr + hf) * Grid).toLong, "hi pin")
        assert(r.getLong(4) <= r.getLong(3) && r.getLong(3) <= r.getLong(5) + 1,
          "interval must bracket the point estimate")
      } else assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("scan_schema_merge: old-generation rows read NULL in the added column; new rows keep it") {
    val rows = graft.queries.CoreQueries.scanSchemaMerge.fn(spark, sf).collect()
    val n = graft.util.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == n, "both generations read as one frame")
    rows.foreach { r =>
      if (r.getLong(0) % 2 == 0) assert(r.isNullAt(2), "old-file row must backfill NULL")
      else assert(!r.isNullAt(2), "new-file row must keep its source")
    }
  }

  test("eval_recall_int8: universe-complete; int8 recall high (quantization step is tiny vs spread)") {
    val rows = graft.queries.VectorQueries.evalRecallInt8.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (0L until 10L), "query universe")
    rows.foreach { case (_, h, rc) =>
      assert(h >= 0 && h <= 3)
      assert(rc == math.floor(h / 3.0 * Grid).toLong, "recall pin")
    }
    // int8 affine steps are ~1/255 of the per-dim range: top-3 geometry
    // should survive almost entirely on this fixture
    val mean = rows.map(_._2).sum.toDouble / (3.0 * rows.length)
    assert(mean >= 0.8, f"int8 recall@3 $mean%.2f implausibly low")
  }

  test("event_session_hist: buckets partition the registered sessionizer's output; shares sum to 1") {
    val sessions = graft.queries.SessionQueries.sessionize.fn(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(5))) // (n_events, duration_us)
    def bucketOf(n: Long): Long =
      if (n <= 1) 1L else if (n <= 2) 2L else if (n <= 4) 3L
      else if (n <= 8) 5L else if (n <= 16) 9L else 17L
    val expected = sessions.groupBy { case (n, _) => bucketOf(n) }
      .map { case (b, xs) =>
        (b, xs.size.toLong, xs.map(_._2).sum / xs.size.toLong)
      }.toSet
    val rows = graft.queries.SessionQueries.eventSessionHist.fn(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected, s"histogram mismatch:\n got=$got\n exp=$expected")
    assert(rows.map(_.getLong(1)).sum == sessions.length.toLong,
      "buckets must partition the session set")
    val shareSum = rows.map(_.getLong(2).toDouble / Grid).sum
    assert(math.abs(shareSum - 1.0) < 1e-6, s"shares sum to $shareSum")
  }

  test("emb_hard_negatives: consistent with the triplet miner on every anchor") {
    val tm = VectorQueries.embTripletMine.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(3)) None else Some(r.getLong(3)),   // pos_cos cell
        if (r.isNullAt(5)) None else Some(r.getLong(5))))  // neg_cos cell
      .toMap
    val hn = VectorQueries.embHardNegatives.fn(spark, sf).collect()
    assert(hn.length == tm.size, "both miners cover the same anchor universe")
    hn.foreach { r =>
      val vid = r.getLong(0)
      val (posTm, negTm) = tm(vid)
      val posHn = if (r.isNullAt(3)) None else Some(r.getLong(3))
      // identical hardest positive (same rule, same shared chain)
      assert(posHn == posTm, s"anchor $vid pos_cos diverged between miners")
      val snegCos = if (r.isNullAt(5)) None else Some(r.getLong(5))
      val nBand = r.getLong(6)
      (snegCos, posHn) match {
        case (Some(sc), Some(pc)) =>
          assert(sc <= pc, s"anchor $vid semi-hard must not be closer than the positive")
          assert(nBand >= 1)
          // the semi-hard is never harder than the hardest negative
          negTm.foreach(nc => assert(sc <= nc,
            s"anchor $vid semi-hard closer than the hardest negative"))
        case (Some(_), None) =>
          fail(s"anchor $vid has a semi-hard negative without a positive")
        case (None, _) => assert(nBand == 0)
      }
    }
    // the fixture actually exercises the band (some anchors have one)
    assert(hn.exists(r => !r.isNullAt(4)), "no semi-hard negatives mined at all")
  }
}
