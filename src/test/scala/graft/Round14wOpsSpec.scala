package graft

import graft.queries.{AggQueries, CorpusStatsQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch W: covariance matrix, script mix — replays. */
class Round14wOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_cov_matrix: pairwise covariances replay; diagonal = variance; PSD-ish") {
    val cols4 = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(cols4.map(col): _*).collect()
      .map(r => cols4.indices.map(r.getDouble).toArray)
    val n = rows.length.toDouble
    def dec(x: Double, sc: Int) = BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP)
    val s = cols4.indices.map(i => rows.map(r => dec(r(i), 8)).sum.toDouble)
    val got = AggQueries.aggCovMatrix.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == 10)
    for (i <- cols4.indices; j <- i until cols4.length) {
      val q = rows.map(r => dec(r(i) * r(j), 4)).sum.toDouble
      val cov = (q - (s(i) * s(j)) / n) / (n - 1.0)
      val (gn, mi, mj, gc) = got((cols4(i), cols4(j)))
      assert(gn == rows.length)
      assert(mi == pin(s(i) / n) && mj == pin(s(j) / n), s"means $i $j")
      assert(gc == pin(cov), s"cov($i,$j) $gc vs ${pin(cov)}")
      if (i == j) assert(gc >= 0, s"variance $i nonnegative")
    }
    // Cauchy-Schwarz on the pinned cells (loose: one grid cell slack)
    for (i <- cols4.indices; j <- (i + 1) until cols4.length) {
      val vii = got((cols4(i), cols4(i)))._4 / Grid
      val vjj = got((cols4(j), cols4(j)))._4 / Grid
      val vij = got((cols4(i), cols4(j)))._4 / Grid
      assert(vij * vij <= vii * vjj * (1 + 1e-6) + 1e-9)
    }
  }

  test("text_script_mix: counts replay from character-class deletion") {
    val docs = graft.util.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).view.mapValues { g =>
      val texts = g.map(_._2)
      def cnt(t: String, p: String) = t.length - t.replaceAll(p, "").length
      (texts.map(_.length.toLong).sum,
        texts.map(t => cnt(t, "[a-zA-Z]").toLong).sum,
        texts.map(t => cnt(t, "[0-9]").toLong).sum,
        texts.map(t => cnt(t, "[ ]").toLong).sum)
    }.toMap
    val got = CorpusStatsQueries.textScriptMix.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, (tot, lat, dig, ws)) =>
      val (gt, gl, gd, gw, go, ls, os) = got(src)
      assert((gt, gl, gd, gw) == ((tot, lat, dig, ws)), s"$src counts")
      assert(go == tot - lat - dig - ws && go >= 0)
      assert(ls == pin(lat.toDouble / tot))
      assert(os == pin((tot - lat - dig - ws).toDouble / tot))
    }
  }
}
