package graft

import graft.queries.AggQueries
import org.apache.spark.sql.functions._

/** Round-13 finance aggregates, verified by independent naive replays
  * (double arithmetic with a 1e-9 relative tolerance — deliberately NOT
  * the exact-decimal recipe, so a recipe bug can't hide in its own
  * mirror) plus analytic invariants.
  */
class Round13bOpsSpec extends SparkSpec {

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private lazy val li: Array[(Long, String, String, Double, Double, Long)] =
    graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), date_trunc("day", col("l_shipdate")).cast("string").as("day"),
        date_trunc("month", col("l_shipdate")).cast("string").as("mon"),
        col("l_extendedprice"), col("l_quantity"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))

  test("agg_vwap: naive weighted mean replays within tolerance; bounded by price extremes") {
    val expected = li.groupBy(r => (r._1, r._2)).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._5).sum,
        xs.map(x => x._4 * x._5).sum / xs.map(_._5).sum,
        xs.map(_._4).min, xs.map(_._4).max))
    }
    val got = AggQueries.aggVwap.fn(spark, sf)
      .withColumn("date", col("date").cast("string")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.size)
    got.foreach { case (k, n, vol, vwap) =>
      val (en, evol, evwap, lo, hi) = expected(k)
      assert(n == en && approx(vol, evol) && approx(vwap, evwap), s"vwap mismatch at $k")
      assert(vwap >= lo - 1e-9 && vwap <= hi + 1e-9, "vwap must sit inside the price range")
    }
  }

  test("agg_beta_market: naive cov/var replay within tolerance; equal-weight market is well-defined") {
    // monthly mean price per asset, naive doubles
    val p = li.groupBy(r => (r._1, r._3)).map { case ((pk, m), xs) =>
      (pk, m, xs.map(_._4).sum / xs.length)
    }.toSeq
    val mkt = p.groupBy(_._2).map { case (m, xs) => m -> xs.map(_._3).sum / xs.length }
    def rets[K](series: Seq[(K, String, Double)]): Map[(K, String), Double] =
      series.groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy(_._2).sliding(2).collect {
          case Seq(a, b) => (b._1, b._2) -> (b._3 / a._3 - 1.0)
        }
      }
    val ra = rets(p.map(x => (x._1, x._2, x._3)))
    val rmSeq = mkt.toSeq.sortBy(_._1)
    val rm = rmSeq.sliding(2).collect {
      case Seq(a, b) => b._1 -> (b._2 / a._2 - 1.0)
    }.toMap
    val expected = ra.toSeq.collect {
      case ((pk, m), r) if rm.contains(m) => (pk, r, rm(m))
    }.groupBy(_._1).flatMap { case (pk, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._3).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(x => x._3 * x._2).sum; val sxx = xs.map(x => x._3 * x._3).sum
      val varm = n * sxx - sx * sx
      if (varm > 1e-18) Some(pk -> (xs.length.toLong, (n * sxy - sx * sy) / varm))
      else None
    }
    val got = AggQueries.aggBetaMarket.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.nonEmpty)
    val gmap = got.map(g => g._1 -> g).toMap
    expected.foreach { case (pk, (n, beta)) =>
      val (_, gn, gb) = gmap(pk)
      assert(gn == n, s"month count mismatch at asset $pk")
      // 1e-4: the operator quantizes returns on the 2^-24 dyadic grid
      // (portability — see the operator doc); the replay does not
      assert(gb.exists(b => approx(b, beta, 1e-4)), s"beta mismatch at asset $pk")
    }
    // sanity: betas center near 1 for an equal-weight universe member set
    val bs = got.flatMap(_._3)
    assert(bs.nonEmpty && bs.exists(b => b > 0.0), "some positive beta must exist")
  }

  test("agg_autocorr: naive Pearson of (x_t, x_{t-1}) replays within tolerance; |r| <= 1") {
    val expected = li.groupBy(_._1).flatMap { case (pk, xs) =>
      val s0 = xs.sortBy(x => (x._2, x._6)).map(_._4)
      val pairs = s0.zip(s0.drop(1)).map { case (y, x) => (x, y) } // (x_t, x_{t-1})
      val n = pairs.length.toDouble
      if (pairs.isEmpty) None else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p0 => p0._1 * p0._2).sum
        val sxx = pairs.map(p0 => p0._1 * p0._1).sum
        val syy = pairs.map(p0 => p0._2 * p0._2).sum
        val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
        val r = if (dx > 1e-12 && dy > 1e-12)
          Some((n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy))) else None
        Some(pk -> (pairs.length.toLong, r))
      }
    }
    val got = AggQueries.aggAutocorr.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.length == expected.size)
    got.foreach { case (pk, n, ac) =>
      val (en, er) = expected(pk)
      assert(n == en)
      (ac, er) match {
        case (Some(a), Some(e)) =>
          assert(approx(a, e, 1e-6), s"autocorr mismatch at $pk: $a vs $e")
          assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
        case (None, None) =>
        case other => fail(s"null-ness disagrees at $pk: $other")
      }
    }
  }

  test("agg_sortino: naive downside-deviation replay within tolerance; no-downside => NULL") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val want = rows.groupBy(_._1).map { case (pk, xs) =>
      val ex = xs.map(_._2 - 0.05)
      val n = ex.length
      val mean = ex.sum / n
      val dd = math.sqrt(ex.map(e => if (e < 0) e * e else 0.0).sum / n)
      pk -> ((n.toLong, mean, dd, if (dd > 0) Some(mean / dd * math.sqrt(365.0)) else None))
    }
    val got = graft.queries.AggQueries.aggSortino.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.length == want.size)
    got.foreach { case (pk, n, mean, dd, sr) =>
      val (en, emean, edd, esr) = want(pk)
      assert(n == en && approx(mean, emean, 1e-9) && approx(dd, edd, 1e-9))
      (sr, esr) match {
        case (Some(a), Some(b)) => assert(approx(a, b, 1e-9), s"sortino mismatch at $pk")
        case (None, None) =>
        case other => fail(s"null-ness disagrees at $pk: $other")
      }
    }
    assert(got.exists(_._5.isDefined), "some asset must have downside here")
  }

  test("agg_cvar: grid tail-mean replays exactly; ES <= worst-case mean return") {
    val Grid20 = 1048576.0
    val pinG = 1073741824.0
    val perAsset = li.groupBy(_._1).map { case (pk, xs) =>
      val s0 = xs.sortBy(x => (x._2, x._6)).map(_._4)
      val rg = s0.zip(s0.drop(1)).map { case (a, b) =>
        math.floor((b / a - 1.0) * Grid20).toLong
      }.sorted
      pk -> rg
    }
    val got = graft.queries.AggQueries.aggCvar.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val withRets = perAsset.filter(_._2.nonEmpty)
    assert(got.length == withRets.size)
    got.foreach { case (pk, n, k, es) =>
      val rg = perAsset(pk)
      assert(n == rg.length.toLong)
      val ek = math.max(1, math.ceil(0.05 * rg.length).toInt)
      assert(k == ek.toLong, s"tail size mismatch at $pk")
      val tail = rg.take(ek)
      val expEs = math.floor(
        ((tail.sum.toDouble / ek.toDouble) / Grid20) * pinG).toLong
      assert(es == expEs, s"es cell mismatch at $pk")
      // the tail mean cannot exceed the overall mean
      assert(tail.sum.toDouble / ek <= rg.sum.toDouble / rg.length + 1e-9)
    }
  }
}
