package graft

import graft.queries.AggQueries
import org.apache.spark.sql.functions._

/** Round-12 batch K: Brown–Forsythe homogeneity test — replay. */
class Round14kOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("agg_brown_forsythe: F replays from median-deviation moments; F > 0") {
    val li = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byG = li.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // median: min v with 2*cum >= n over the sorted value histogram
    def med(vs: Array[Double]): Double = {
      val h = vs.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val n = vs.length.toLong
      var cum = 0L
      h.collectFirst { case (v, c) if { cum += c; 2 * cum >= n } => v }.get
    }
    case class Mo(n: Long, s: Double, q: Double)
    val mo = byG.map { case (g, vs) =>
      val m = med(vs)
      val zs = vs.map(v => math.abs(v - m))
      def dec(x: Double, scale: Int) =
        java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP)
      val s = zs.foldLeft(java.math.BigDecimal.ZERO)((a, z) => a.add(dec(z, 8)))
      val q = zs.foldLeft(java.math.BigDecimal.ZERO)((a, z) => a.add(dec(z * z, 4)))
      g -> Mo(vs.length.toLong, s.doubleValue, q.doubleValue)
    }
    val nn = mo.values.map(_.n).sum.toDouble
    val k = mo.size.toDouble
    val sTot = {
      // pooled decimal sum, then one double cast — replay by re-summing
      // the per-group decimal sums exactly
      mo.values.map(m => java.math.BigDecimal.valueOf(m.s))
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue
    }
    def gridSum(terms: Iterable[Double]): Double =
      terms.map(t => math.floor(t * Grid).toLong).sum.toDouble / Grid
    val between = gridSum(mo.values.map { m0 =>
      val mj = m0.s / m0.n; val mAll = sTot / nn
      (m0.n / nn) * ((mj - mAll) * (mj - mAll))
    })
    val within = gridSum(mo.values.map(m0 =>
      (m0.q - (m0.s * m0.s) / m0.n) / nn))
    val fStat = ((nn - k) / (k - 1.0)) * (between / within)
    val r = AggQueries.aggBrownForsythe.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == nn.toLong && r.getLong(1) == k.toLong)
    assert(r.getLong(2) == math.floor(fStat * Grid).toLong,
      s"F ${r.getLong(2)} vs ${math.floor(fStat * Grid).toLong}")
    assert(fStat >= 0.0)
  }
}
