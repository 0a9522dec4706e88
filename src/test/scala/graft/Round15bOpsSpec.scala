package graft

import graft.queries.{AggQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch AB: partial correlation, LSH banding sweep — replays. */
class Round15bOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_partial_corr: r_xy.z replays from raw moments; symmetric in (x,y)") {
    val cols4 = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(cols4.map(col): _*).collect()
      .map(r => cols4.indices.map(r.getDouble).toArray)
    val n = rows.length.toDouble
    def dec(x: Double, sc: Int) = BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP)
    val s = cols4.indices.map(i => rows.map(r => dec(r(i), 8)).sum.toDouble)
    def q(i: Int, j: Int) = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      rows.map(r => dec(r(a) * r(b), 4)).sum.toDouble
    }
    def r(i: Int, j: Int) =
      (q(i, j) - (s(i) * s(j)) / n) /
        (math.sqrt(q(i, i) - (s(i) * s(i)) / n) * math.sqrt(q(j, j) - (s(j) * s(j)) / n))
    val got = AggQueries.aggPartialCorr.fn(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)) ->
        (if (x.isNullAt(4)) None else Some(x.getLong(4)))).toMap
    assert(got.size == 12)
    for {
      i <- cols4.indices; j <- cols4.indices if i < j
      k <- cols4.indices if k != i && k != j
    } {
      val (rxy, rxz, rzy) = (r(i, j), r(i, k), r(k, j))
      val den = (1.0 - rxz * rxz) * (1.0 - rzy * rzy)
      val want = if (den > 0) Some(pin((rxy - rxz * rzy) / math.sqrt(den))) else None
      assert(got((cols4(i), cols4(j), cols4(k))) == want, s"($i,$j|$k)")
    }
  }

  test("dedup_band_sweep: coarser banding never catches less; strict never less precise") {
    val rows = TextQueries.dedupBandSweep.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(rows.keySet == Set("8x1", "4x2", "2x4"))
    val (c8, c4, c2) = (rows("8x1"), rows("4x2"), rows("2x4"))
    // candidate sets nest: every 2x4 candidate agrees on a 4-run, hence on
    // both contained 2-runs (4x2 candidate), hence on some single slot (8x1)
    assert(c8._1 >= c4._1 && c4._1 >= c2._1)
    assert(c8._2 >= c4._2 && c4._2 >= c2._2)
    // identical n_true across rows; recall ordered with candidate nesting
    assert(c8._3 == c4._3 && c4._3 == c2._3)
    if (c8._3 > 0) {
      assert(c8._4.get >= c4._4.get && c4._4.get >= c2._4.get)
    }
    // counts bounded by universe pairs
    assert(c8._1 <= 500L * 499 / 2)
  }
}
