package graft

import graft.queries.{AggQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch S: Brier decomposition, Bowley skewness — replays. */
class Round14sOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("eval_brier: pinned-score Brier replays; decomposition terms coherent") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (if (r.getString(1) == "en") 1L else 0L)).toMap
    val scores = graft.ops.TextOps.explodeTokens(
        graft.util.Tables.documents(spark, sf))
      .groupBy("doc_id")
      .agg((sum(when(col("word").isin("the", "a"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val lab = scores.map { case (id, sc) =>
      (math.floor(sc * Grid).toLong, docs(id)) }
    val n = lab.length.toDouble
    val b2 = lab.map { case (g, y) =>
      val d = BigInt(g - y * 1073741824L); d * d }.sum
    val brier = (b2.toDouble / n) / 1152921504606846976.0
    val yb = lab.map(_._2).sum / n
    val r = PipelineQueries.evalBrier.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == lab.length)
    assert(r.getLong(1) == pin(yb))
    assert(r.getLong(2) == pin(brier), s"brier ${r.getLong(2)} vs ${pin(brier)}")
    val (rel, res, unc) = (r.getLong(3) / Grid, r.getLong(4) / Grid, r.getLong(5) / Grid)
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25 + 1e-9)
    assert(r.getLong(5) == pin(yb * (1.0 - yb)))
    // Murphy identity holds approximately (binned means vs raw forecasts)
    assert(math.abs((rel - res + unc) - brier) < 0.05)
  }

  test("agg_bowley_skew: quartiles + statistic replay per flag; bounded") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = AggQueries.aggBowleySkew.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val xs = g.map(_._2).sorted
      val nL = xs.length
      def q(num: Int, den: Int) = xs(((nL * num + den - 1) / den) - 1) // ceil(n*num/den)
      val (q1, q2, q3) = (q(1, 4), q(1, 2), q(3, 4))
      val (n, g1, g2, g3, bw) = got(flag)
      assert(n == nL && g1 == q1 && g2 == q2 && g3 == q3, s"$flag quartiles")
      if (q3 > q1) {
        val b = ((q1 + q3) - 2.0 * q2) / (q3 - q1)
        assert(bw.contains(pin(b)))
        assert(b >= -1.0 - 1e-9 && b <= 1.0 + 1e-9)
      } else assert(bw.isEmpty)
    }
  }
}
