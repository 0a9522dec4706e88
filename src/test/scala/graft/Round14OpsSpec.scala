package graft

import graft.queries.{AggQueries, CorpusQueries, RecursiveQueries, SessionQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-12 (driver numbering) batch A: independent Scala replays of the
  * new robust-stats / churn / reservoir / drawdown-duration / EWMA
  * operators. Each test recomputes the operator's semantics from raw
  * collected rows with its own code path (no shared helpers with the
  * implementation) and compares exactly.
  */
class Round14OpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private case class Li(flag: String, okey: Long, ln: Long, pkey: Long, skey: Long,
      qty: Double, px: Double, ship: java.sql.Timestamp)

  private lazy val li: Array[Li] =
    graft.util.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey").cast("long"),
        col("l_linenumber").cast("long"), col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"), col("l_shipdate").cast("timestamp"))
      .collect()
      .map(r => Li(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getTimestamp(7)))

  test("agg_trimmed_mean: kept multiset equals sort-and-slice replay per group") {
    val got = AggQueries.aggTrimmedMean.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    li.groupBy(_.flag).foreach { case (flag, rows) =>
      val sorted = rows.sortBy(r => (r.px, r.okey, r.ln, r.pkey, r.skey)).map(_.px)
      val k = (sorted.length / 20)
      val kept = sorted.slice(k, sorted.length - k)
      // exact decimal mean, same recipe as Exact.exactAvg
      val s = kept.foldLeft(java.math.BigDecimal.ZERO)((a, v) =>
        a.add(java.math.BigDecimal.valueOf(v).setScale(8, java.math.RoundingMode.HALF_UP)))
      val mean = s.doubleValue / kept.length
      val (nRows, nKept, gotMean) = got(flag)
      assert(nRows == sorted.length && nKept == kept.length,
        s"$flag trim counts differ")
      assert(gotMean == mean, s"$flag trimmed mean differs: $gotMean vs $mean")
    }
  }

  test("agg_spearman: tie-aware rho matches a midrank Pearson replay") {
    val got = AggQueries.aggSpearman.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    li.groupBy(_.flag).foreach { case (flag, rows) =>
      // scaled midrank R(v) = 2*(count below v) + count(= v) + 1
      def ranks(vs: Array[Double]): Map[Double, Long] = {
        val cnt = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val sorted = cnt.keys.toArray.sorted
        var below = 0L
        sorted.map { v => val r = 2 * below + cnt(v) + 1; below += cnt(v); v -> r }.toMap
      }
      val rx = ranks(rows.map(_.qty)); val ry = ranks(rows.map(_.px))
      var sx, sy, sxx, syy, sxy = BigInt(0)
      rows.foreach { r =>
        val a = BigInt(rx(r.qty)); val b = BigInt(ry(r.px))
        sx += a; sy += b; sxx += a * a; syy += b * b; sxy += a * b
      }
      val n = rows.length.toDouble
      val vx = n * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = n * syy.toDouble - sy.toDouble * sy.toDouble
      val rho = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(vx) * math.sqrt(vy))
      val (nRows, gotRho) = got(flag)
      assert(nRows == rows.length)
      assert(gotRho == pin(rho), s"$flag rho differs: $gotRho vs ${pin(rho)}")
      // midranks average to (n+1) — the permutation-mean invariant
      assert(sx == BigInt(rows.length) * (rows.length + 1))
    }
  }

  test("agg_cramers_v: chi2/V match a contingency-table replay; V in [0,1]") {
    val r = AggQueries.aggCramersV.fn(spark, sf).collect()(0)
    val cells = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus").count().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2).toDouble))
    val n = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // portable-grid sum replay of the chi2 fold
    val chi2 = cells.map { case (rf, ls, o) =>
      val e = (rt(rf) * ct(ls)) / n
      math.floor((((o - e) * (o - e)) / e) * Grid).toLong
    }.sum.toDouble / Grid
    val v = math.sqrt(chi2 / (n * math.min(rt.size - 1, ct.size - 1).toDouble))
    assert(r.getLong(0) == n.toLong && r.getLong(1) == rt.size && r.getLong(2) == ct.size)
    assert(r.getLong(3) == pin(chi2), s"chi2 ${r.getLong(3)} vs ${pin(chi2)}")
    assert(r.getLong(4) == pin(v))
    assert(v >= 0.0 && v <= 1.0 + 1e-12)
  }

  test("sample_reservoir: kept set is exactly the k smallest salted hashes per source") {
    def hash32(s0: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _) => (id, src, hash32(s"rsv:$id")) }
        .sortBy(t => (t._3, t._1)).take(8)
        .zipWithIndex.map { case ((id, s0, h), i) => (id, s0, h, i + 1L) }
    }.toSet
    val got = CorpusQueries.sampleReservoir.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect, "reservoir kept set differs from hash-rank replay")
    // per-source count == min(8, n_source)
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length).toMap
    got.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.size == math.min(8, bySrc(src)))
    }
  }

  test("event_churn: counts match a pair-set replay; churned + retained = active") {
    val pairs = graft.util.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000 div 7").as("w"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val maxW = byWeek.keys.max
    val got = SessionQueries.eventChurn.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == byWeek.keySet.filter(_ < maxW))
    got.foreach { case (w, (act, ret, churn, rate)) =>
      val users = byWeek(w)
      val retained = byWeek.get(w + 1).map(nx => users.count(nx.contains)).getOrElse(0)
      assert(act == users.size && ret == retained && churn == act - ret,
        s"week $w churn counts differ")
      assert(rate == pin((act - ret).toDouble / act.toDouble))
    }
  }

  test("win_drawdown_duration: islands replay per asset; zeros for never-underwater") {
    val got = WindowQueries.winDrawdownDuration.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    li.groupBy(_.pkey).foreach { case (k, rows) =>
      val seq = rows.sortBy(r => (r.ship.getTime, r.okey * 8 + r.ln)).map(_.px)
      var peak = Double.NegativeInfinity
      val under = seq.map { px => peak = math.max(peak, px); px < peak }
      // run-length encode the underwater flags
      val runs = under.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true)  => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      val (nObs, maxRun, nRuns, nUnder) = got(k)
      assert(nObs == seq.length)
      assert(maxRun == (if (runs.isEmpty) 0 else runs.max), s"asset $k max run")
      assert(nRuns == runs.length && nUnder == runs.sum, s"asset $k run stats")
    }
  }

  test("ewma_vol: fold replay on one asset; vol = sqrt(var); seed = first ret^2") {
    val out = RecursiveQueries.ewmaVol.fn(spark, sf)
      .filter(col("key") === li.head.pkey).orderBy("rn").collect()
    val seq = li.filter(_.pkey == li.head.pkey)
      .sortBy(r => (r.ship.getTime, r.okey * 8 + r.ln)).map(_.px)
    assert(out.length == seq.length)
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    var v = 0.0
    (1 until seq.length).foreach { i =>
      val ret = seq(i) / seq(i - 1) - 1.0
      if (i == 1) v = ret * ret else v = (0.94 * v) + ((1.0 - 0.94) * (ret * ret))
      assert(out(i).getDouble(2) == ret, s"row $i ret")
      assert(out(i).getDouble(3) == v, s"row $i ewma_var")
      assert(out(i).getDouble(4) == math.sqrt(v), s"row $i ewma_vol")
    }
  }

  test("eval_kappa: counts and kappa match a direct classifier replay") {
    val r = graft.queries.PipelineQueries.evalKappa.fn(spark, sf).collect()(0)
    val docs = graft.util.Tables.documents(spark, sf)
      .select("text", "lang").collect().map(x => (x.getString(0), x.getString(1)))
    var agree, tEn, pEn = 0L
    val n = docs.length.toLong
    docs.foreach { case (text, lang) =>
      val toks = text.split(" ", -1)
      val score = toks.count(w => w == "the" || w == "a").toDouble / toks.length
      val pred = if (score >= 0.02) "en" else "und"
      val truth = if (lang == "en") "en" else "und"
      if (pred == truth) agree += 1
      if (truth == "en") tEn += 1
      if (pred == "en") pEn += 1
    }
    val po = agree.toDouble / n.toDouble
    val pe = ((tEn.toDouble / n) * (pEn.toDouble / n)) +
      (((n - tEn).toDouble / n) * ((n - pEn).toDouble / n))
    val kappa = (po - pe) / (1.0 - pe)
    assert(r.getLong(0) == n && r.getLong(1) == agree &&
      r.getLong(2) == tEn && r.getLong(3) == pEn)
    assert(r.getLong(4) == pin(po) && r.getLong(5) == pin(pe))
    assert(r.getLong(6) == pin(kappa))
    // kappa <= po always; kappa < po strictly unless pe = 0
    assert(pin(kappa) <= pin(po))
  }

  test("agg_theil_source: pinned Theil within pln envelope of a math.log replay; 0 <= T <= ln k") {
    val r = graft.queries.CorpusStatsQueries.aggTheilSource.fn(spark, sf).collect()(0)
    val masses = graft.util.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(x => (x.getString(0), x.getString(1).trim.split("\\s+").length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val k = masses.size.toDouble
    val sx = masses.values.sum.toDouble
    val theil = masses.values.filter(_ > 0).map { x =>
      (x / sx) * math.log((k * x) / sx)
    }.sum
    assert(r.getLong(0) == masses.size && r.getLong(1) == sx.toLong)
    val gotT = r.getLong(2).toDouble / Grid
    assert(math.abs(gotT - theil) < 1e-6, s"theil $gotT vs $theil")
    assert(gotT >= -1e-9 && gotT <= math.log(k) + 1e-9)
  }

  test("agg_bootstrap_means (r12 rewrite): zero-row-amplification plan still matches replay totals") {
    // the full-sample replica (-1) must equal the plain group means/counts
    val full = AggQueries.aggBootstrapMeans.fn(spark, sf)
      .filter(col("replica") === -1L).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    li.groupBy(_.flag).foreach { case (flag, rows) =>
      val s = rows.map(_.px).foldLeft(java.math.BigDecimal.ZERO)((a, v) =>
        a.add(java.math.BigDecimal.valueOf(v).setScale(8, java.math.RoundingMode.HALF_UP)))
      val (nGot, mGot) = full(flag)
      assert(nGot == rows.length)
      assert(mGot == s.doubleValue / rows.length)
    }
    // every group publishes 17 replicas (or fewer only if a replica is empty)
    val counts = AggQueries.aggBootstrapMeans.fn(spark, sf)
      .groupBy("l_returnflag").count().collect().map(_.getLong(1))
    assert(counts.forall(c => c >= 1 && c <= 17))
  }
}
