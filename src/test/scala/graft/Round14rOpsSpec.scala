package graft

import graft.queries.{AggQueries, RollingQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch R: rolling VWMA, Mood's median test, kNN reciprocity
  * — replays.
  */
class Round14rOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("win_vwma: replay for the largest asset via exact decimal sums") {
    val topKey = graft.util.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().orderBy(col("count").desc, col("l_partkey"))
      .head().getLong(0)
    val series = graft.util.Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === topKey)
      .select(col("l_shipdate"), (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"),
        col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val got = RollingQueries.winVwma.fn(spark, sf)
      .filter(col("l_partkey") === topKey)
      .orderBy("l_shipdate", "ord").collect()
    assert(got.length == series.length && series.length >= 20)
    var checked = 0
    got.zipWithIndex.foreach { case (r, i) =>
      if (i + 1 >= 20) {
        val w = series.slice(i - 19, i + 1)
        def dec(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        val pv = w.map(b => dec(b._3 * b._4)).sum.toDouble
        val v = w.map(b => dec(b._4)).sum.toDouble
        assert(r.getLong(3) == pin(pv / v), s"row $i vwma")
        // vwma inside the window's price range
        val px = w.map(_._3)
        assert(pv / v >= px.min - 1e-9 && pv / v <= px.max + 1e-9)
        checked += 1
      } else assert(r.isNullAt(3))
    }
    assert(checked > 0)
  }

  test("agg_median_test: chi2 replays from the 2x3 contingency") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = rows.map(_._2).sorted
    val med = sorted((sorted.length + 1) / 2 - 1) // lower median
    val n = rows.length.toDouble
    val aTot = rows.count(_._2 > med).toDouble
    val flags = rows.groupBy(_._1)
    val chi2 = flags.values.map { g =>
      val ng = g.length.toDouble
      val ag = g.count(_._2 > med).toDouble
      val ea = ng * aTot / n
      val eb = ng * (n - aTot) / n
      ((ag - ea) * (ag - ea)) / ea + (((ng - ag) - eb) * ((ng - ag) - eb)) / eb
    }.sum
    val r = AggQueries.aggMedianTest.fn(spark, sf).collect()(0)
    assert(r.getDouble(0) == med)
    assert(r.getLong(1) == rows.length && r.getLong(2) == aTot.toLong)
    assert(r.getLong(3) == flags.size - 1)
    // portable-grid fold truncates each of the k terms by < 2^-30
    assert(math.abs(r.getLong(4) / Grid - chi2) < 1e-6, s"chi2 ${r.getLong(4) / Grid} vs $chi2")
  }

  test("ann_ivf_balance: extrema and imbalance replay from the IVF list sizes") {
    val r = VectorQueries.annIvfBalance.fn(spark, sf).collect()(0)
    val nSeeds = r.getLong(0); val nLists = r.getLong(1); val nVecs = r.getLong(2)
    val minL = r.getLong(3); val maxL = r.getLong(4)
    // every vector lands in exactly one list
    assert(nLists >= 1 && nLists <= nSeeds)
    assert(minL >= 1 && maxL >= minL && maxL <= nVecs)
    assert(nVecs == graft.util.Tables.embeddings(spark, sf).count())
    // seed count replays from the published stride rule
    val samp = math.max(50L,
      nVecs / math.max(1L, math.ceil(math.sqrt(nVecs.toDouble)).toLong))
    val expectSeeds = graft.util.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % samp === 0).count()
    assert(nSeeds == expectSeeds)
    // imbalance = max_list / (n_vecs / n_seeds), pinned on the 2^-30 grid
    assert(r.getLong(5) == pin(maxL.toDouble * nSeeds.toDouble / nVecs.toDouble))
    assert(r.getLong(5) >= pin(1.0 * nLists / nSeeds)) // max >= mean over used lists
  }

  test("graph_reciprocity: 2*mutual/directed; bounded in (0, 1]") {
    val directed = VectorQueries.annKnnHier.fn(spark, sf).count()
    val mutual = VectorQueries.annKnnMutualHier.fn(spark, sf).count()
    val r = VectorQueries.graphReciprocity.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == directed && r.getLong(1) == mutual)
    val rec = 2.0 * mutual / directed
    assert(r.getLong(2) == pin(rec))
    assert(rec > 0.0 && rec <= 1.0)
  }
}
