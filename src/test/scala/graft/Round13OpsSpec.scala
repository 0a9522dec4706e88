package graft

import graft.queries.{AggQueries, CorpusStatsQueries, PipelineQueries, SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-13 operators, verified by independent Scala replays: the k-core
  * peel against a run-to-fixpoint reference, link prediction against a
  * hand-rolled wedge counter, the CDC apply against the invariant
  * apply(old, diff) ≡ new, MAD against sorted order statistics, the
  * concurrency sweep against direct interval containment, and the
  * Pareto deciles / hapax rates / PR-AUC against from-scratch folds.
  */
class Round13OpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private lazy val mutualEdges: Seq[(Long, Long)] =
    VectorQueries.annKnnMutualHier.fn(spark, sf).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("graph_kcore: replayed peel matches, and the unrolled depth reaches the fixed point") {
    val Rounds = 8 // = VectorQueries.KcoreRounds
    def degrees(es: Seq[(Long, Long)]): Map[Long, Int] =
      (es.map(_._1) ++ es.map(_._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    def surv(es: Seq[(Long, Long)]): Set[Long] =
      degrees(es).filter(_._2 >= 2).keySet
    def induced(es: Seq[(Long, Long)], s: Set[Long]): Seq[(Long, Long)] =
      es.filter(e => s(e._1) && s(e._2))
    val e0 = mutualEdges
    val nodes0 = degrees(e0).keySet
    var es = e0
    val survivors = (1 to Rounds).map { _ =>
      val s0 = surv(es); es = induced(es, s0); s0
    }
    assert(surv(es) == survivors.last,
      s"a round-${Rounds + 1} peel must be a no-op at this SF")
    val expected = nodes0.map { n =>
      val rr: Option[Int] = survivors.zipWithIndex
        .collectFirst { case (s0, i) if !s0(n) => i + 1 }
      (n, degrees(e0)(n).toLong, rr, survivors.last(n))
    }
    val got = VectorQueries.graphKcore.fn(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getBoolean(3))
    }.toSet
    assert(got == expected, "published peel rounds / core flags differ from the replay")
    assert(got.exists(_._4), "the 2-core must be nonempty on this fixture")
    assert(got.exists(!_._4), "some fringe must peel off on this fixture")
  }

  test("graph_link_predict: replayed wedge count + Jaccard matches row-for-row") {
    val adj = mutualEdges ++ mutualEdges.map(_.swap)
    val deg = adj.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
    adj.groupBy(_._2).values.foreach { lst =>
      val ns = lst.map(_._1).distinct.sorted
      for (i <- ns.indices; j <- (i + 1) until ns.length)
        cn((ns(i), ns(j))) = cn.getOrElse((ns(i), ns(j)), 0L) + 1L
    }
    val edgeSet = mutualEdges.toSet
    val expected = cn.toSeq.collect {
      case ((u, w), common) if !edgeSet((u, w)) =>
        val j = common.toDouble / (deg(u) + deg(w) - common).toDouble
        (u, w, common, deg(u), deg(w), pin(j))
    }.toSet
    val got = VectorQueries.graphLinkPredict.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "a mutual top-3 graph must have distance-2 candidates")
  }

  test("cdc_apply: apply(old, diff(old, new)) reproduces the new snapshot exactly") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_shipdate").cast("string").as("sd"),
        col("l_extendedprice"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    def snap(f: String => Boolean): Map[Long, Double] =
      rows.filter(r => f(r._2)).groupBy(_._1).map { case (k, xs) =>
        k -> xs.maxBy(x => (x._2, x._4))._3
      }
    val o = snap(_ <= "1995-07-01 00:00:00")
    val n = snap(sd => sd > "1995-07-01 00:00:00" && sd <= "1996-01-01 00:00:00")
    val got = PipelineQueries.cdcApply.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.map(g => (g._1, g._2)).toSet == n.toSet,
      "the patched snapshot must equal the independently built new snapshot")
    val ops = got.groupBy(_._3).map { case (k, v) => k -> v.size }
    assert(ops.getOrElse("insert", 0) == (n.keySet -- o.keySet).size)
    assert(ops.getOrElse("carry", 0) ==
      (o.keySet & n.keySet).count(k => o(k) == n(k)))
    assert(ops.getOrElse("update", 0) ==
      (o.keySet & n.keySet).count(k => o(k) != n(k)))
    assert(!got.exists(g => g._3 == "delete"), "deleted keys never publish")
  }

  test("agg_mad: medians and MAD replay from sorted order statistics") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s((math.ceil(s.length / 2.0) - 1).toInt)
    }
    val expected = rows.groupBy(_._1).map { case (f, xs) =>
      val vals = xs.map(_._2).toSeq
      val med = medOf(vals)
      val mad = medOf(vals.map(v => math.abs(v - med)))
      (f, vals.size.toLong, med, mad, 1.4826 * mad)
    }.toSet
    val got = AggQueries.aggMad.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("event_concurrency: direct interval containment reproduces every day's peak") {
    val dayUs = 86400000000L
    val sess = SessionQueries.sessionize.fn(spark, sf)
      .select("start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = sess.flatMap { case (s0, e0) =>
      (s0 / dayUs to e0 / dayUs).map(day =>
        (day, math.max(s0, day * dayUs), math.min(e0, (day + 1) * dayUs - 1)))
    }.groupBy(_._1).map { case (day, ivs) =>
      // peak = max containment over the day's start instants (a peak is
      // always attained at some interval start)
      val peak = ivs.map(_._2).distinct.map { t =>
        ivs.count(iv => iv._2 <= t && t <= iv._3)
      }.max
      (day, ivs.size.toLong, peak.toLong)
    }.toSet
    val got = SessionQueries.eventConcurrency.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.exists(_._3 > 1), "some day must have overlapping sessions here")
  }

  test("event_power_users: decile cut, shares and cumulative shares replay") {
    val counts = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val tu = counts.length.toLong
    val te = counts.sum
    val byUser = counts.sorted(Ordering[Long].reverse)
    // value-cohort decile: all users with count v share decile(ugt(v))
    val hist = counts.groupBy(identity).map { case (v, xs) => (v, xs.length.toLong) }
    def ugt(v: Long): Long = hist.collect { case (w, nu) if w > v => nu }.sum
    val dd = hist.toSeq.map { case (v, nu) =>
      (math.min(9L, ugt(v) * 10 / tu), nu, v * nu)
    }.groupBy(_._1).map { case (dec, xs) =>
      (dec, xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val cum = dd.toSeq.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (dec, _, ne)) => (dec, acc + ne)
    }.drop(1).toMap
    val expected = dd.map { case (dec, nu, ne) =>
      (dec, nu, ne, pin(ne.toDouble / te.toDouble), pin(cum(dec).toDouble / te.toDouble))
    }.toSet
    val got = SessionQueries.eventPowerUsers.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    assert(byUser.take(math.max(1, (tu / 10).toInt)).sum <= te)
  }

  test("text_hapax: per-source and corpus rates replay from the shared tokenizer") {
    val toks = graft.ops.TextOps.explodeTokens(graft.util.Tables.documents(spark, sf))
      .join(graft.util.Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .select("source", "word").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perSource = toks.groupBy(_._1).map { case (src, xs) =>
      val wc = xs.groupBy(_._2).map(_._2.size)
      (src, wc.size.toLong, wc.count(_ == 1).toLong)
    }
    val corpus = {
      val wc = toks.groupBy(_._2).map(_._2.size)
      ("TOTAL", wc.size.toLong, wc.count(_ == 1).toLong)
    }
    val expected = (perSource.toSeq :+ corpus).map { case (s0, nt, nh) =>
      (s0, nt, nh, pin(nh.toDouble / nt.toDouble))
    }.toSet
    val got = CorpusStatsQueries.textHapax.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("eval_pr_auc: average precision replays from the scored ranking") {
    val docs = graft.util.Tables.documents(spark, sf)
    val scored = graft.ops.TextOps.explodeTokens(docs)
      .groupBy("doc_id")
      .agg((sum(when(col("word").isin("the", "a"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("score"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("y")), "doc_id")
      .select("score", "y").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val nPos = scored.count(_._2 == 1).toLong
    val nAll = scored.length.toLong
    val groups = scored.groupBy(_._1).map { case (s0, xs) =>
      (s0, xs.count(_._2 == 1).toLong, xs.length.toLong)
    }.toSeq.sortBy(-_._1)
    var tp = 0L; var nk = 0L; var apSum = BigInt(0)
    groups.foreach { case (_, np, n) =>
      tp += np; nk += n
      if (np > 0) {
        val term = np.toDouble * (tp.toDouble / nk.toDouble)
        apSum += BigInt(math.floor(term * Grid).toLong)
      }
    }
    val ap = pin((apSum.toDouble / Grid) / nPos.toDouble)
    val row = PipelineQueries.evalPrAuc.fn(spark, sf).collect().head
    assert(row.getLong(0) == nPos && row.getLong(1) == nAll - nPos)
    assert(row.getLong(2) == ap, s"ap cell ${row.getLong(2)} != replay $ap")
    assert(row.getLong(3) == pin(nPos.toDouble / nAll.toDouble))
  }

  test("emb_dist_hist: bins partition the pair set; deterministic across runs") {
    val rows = VectorQueries.embDistHist.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9), "bin keys in [0, 9]")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per bin")
    val shareSum = rows.map(_._3).sum
    assert(math.abs(shareSum - Grid.toLong) <= rows.length,
      s"shares must sum to 1 within pin granularity, got $shareSum")
    val again = VectorQueries.embDistHist.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == again.toSet)
  }

  test("dedup_prefix: full-hash duplicate families are contained in prefix families") {
    val fullDups = CorpusStatsQueries.dedupNormalized.fn(spark, sf)
      .filter(col("n_copies") >= 2).select("keeper").collect().map(_.getLong(0)).toSet
    val prefixRows = CorpusStatsQueries.dedupPrefix.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    prefixRows.foreach { case (_, nDocs, _, nVariants) =>
      assert(nDocs >= 2 && nVariants >= 1 && nVariants <= nDocs)
    }
    // every doc that heads a >=2 full-dup family sits in some prefix family
    // (same normalize identity, prefix is a coarsening) — verify via the
    // prefix-hash frame
    val norm = graft.ops.TextOps.normalizeText(col("text"))
    val docPrefix = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.ops.TextOps.contentHash(substring(norm, 1, 64)).as("ph"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val prefixFamilies = prefixRows.map(_._1).toSet
    fullDups.foreach { keeper =>
      assert(prefixFamilies.contains(docPrefix(keeper)),
        s"full-dup family at doc $keeper missing from prefix families")
    }
  }
}
