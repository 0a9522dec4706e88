package graft

import graft.queries.{AggQueries, CorpusStatsQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch M: Kruskal–Wallis H, Kendall τ-b, Yule's K — replays
  * against direct single-node recomputations.
  */
class Round14mOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_kruskal: H replays from scipy-style midrank definition") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = rows.map(_._2).sorted
    // midrank per value (1-based average rank of its tie run)
    val mid = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val n = rows.length.toDouble
    val groups = rows.groupBy(_._1)
    // tie-run structure must match the query's Σ(t³−t)
    val ties = sorted.groupBy(identity).values
      .map(t => t.size.toLong).map(t => t * t * t - t).sum.toDouble
    val r = AggQueries.aggKruskal.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == groups("A").length && r.getLong(1) == groups("N").length &&
      r.getLong(2) == groups("R").length && r.getLong(3) == n.toLong)
    // the registered query folds terms in written (A, N, R) order; the
    // replay sums the same three doubles in the same order
    val tA = { val xs = groups("A").map(x => mid(x._2)); (xs.sum * xs.sum) / xs.length }
    val tN = { val xs = groups("N").map(x => mid(x._2)); (xs.sum * xs.sum) / xs.length }
    val tR = { val xs = groups("R").map(x => mid(x._2)); (xs.sum * xs.sum) / xs.length }
    val h = (12.0 / (n * (n + 1.0))) * (tA + tN + tR) - 3.0 * (n + 1.0)
    val tc = 1.0 - ties / (n * n * n - n)
    assert(math.abs(r.getLong(4) / Grid - h) < 1e-6, s"H ${r.getLong(4) / Grid} vs $h")
    assert(math.abs(r.getLong(5) / Grid - h / tc) < 1e-6)
    assert(r.getLong(5) >= r.getLong(4)) // tie correction divides by ≤ 1
  }

  test("agg_kendall: tau-b replays from brute-force pair counting") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    var conc = 0L; var disc = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val sx = math.signum(rows(j)._1 - rows(i)._1)
      val sy = math.signum(rows(j)._2 - rows(i)._2)
      if (sx * sy > 0) conc += 1 else if (sx * sy < 0) disc += 1
    }
    val nL = rows.length.toLong
    val n0 = nL * (nL - 1) / 2
    def tiePairs(xs: Seq[Double]): Long =
      xs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val tx = tiePairs(rows.map(_._1).toSeq)
    val ty = tiePairs(rows.map(_._2).toSeq)
    val tau = (conc.toDouble - disc.toDouble) /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val r = AggQueries.aggKendall.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == nL)
    assert(r.getDouble(1) == conc.toDouble && r.getDouble(2) == disc.toDouble)
    assert(r.getLong(3) == pin(tau), s"tau ${r.getLong(3)} vs ${pin(tau)}")
    assert(math.abs(tau) <= 1.0)
  }

  test("text_yule_k: TOTAL row replays from corpus-wide term counts") {
    val counts = graft.ops.TextOps.explodeTokens(
      graft.util.Tables.documents(spark, sf))
      .groupBy("word").agg(count(lit(1)).as("c")).collect()
      .map(_.getLong(1))
    val s1 = counts.sum.toDouble
    val s2 = counts.map(c => BigInt(c) * BigInt(c)).sum.toDouble
    val k = 10000.0 * (s2 - s1) / (s1 * s1)
    val out = CorpusStatsQueries.textYuleK.fn(spark, sf)
    val tot = out.filter(col("source") === "TOTAL").collect()(0)
    assert(tot.getLong(1) == s1.toLong && tot.getLong(2) == counts.length.toLong)
    assert(tot.getLong(3) == pin(k), s"K ${tot.getLong(3)} vs ${pin(k)}")
    // K is not additive: every per-source row exists and is positive here
    val bySrc = out.filter(col("source") =!= "TOTAL").collect()
    assert(bySrc.nonEmpty)
    bySrc.foreach(r => assert(r.getLong(1) >= r.getLong(2))) // tokens ≥ types
  }
}
