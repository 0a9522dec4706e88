package graft

import graft.queries.AggQueries
import org.apache.spark.sql.functions._

/** Round-12 batch AA: correlation matrix — replay. */
class Round15OpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_corr_matrix: r replays from one-pass moments; diagonal pins 1; |r| <= 1") {
    val cols4 = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(cols4.map(col): _*).collect()
      .map(r => cols4.indices.map(r.getDouble).toArray)
    val n = rows.length.toDouble
    def dec(x: Double, sc: Int) = BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP)
    val s = cols4.indices.map(i => rows.map(r => dec(r(i), 8)).sum.toDouble)
    def q(i: Int, j: Int) = rows.map(r => dec(r(i) * r(j), 4)).sum.toDouble
    val got = AggQueries.aggCorrMatrix.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.size == 10)
    for (i <- cols4.indices; j <- i until cols4.length) {
      val vi = q(i, i) - (s(i) * s(i)) / n
      val vj = q(j, j) - (s(j) * s(j)) / n
      val (gn, gc) = got((cols4(i), cols4(j)))
      assert(gn == rows.length)
      if (vi > 0 && vj > 0) {
        val r = (q(i, j) - (s(i) * s(j)) / n) / (math.sqrt(vi) * math.sqrt(vj))
        assert(gc.contains(pin(r)), s"corr($i,$j)")
        assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
        if (i == j) assert(math.abs(r - 1.0) < 1e-9)
      } else assert(gc.isEmpty)
    }
  }
}
