package graft

import graft.queries.{SessionQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch V: Garman–Klass bar volatility, A/B sample-ratio
  * mismatch — replays.
  */
class Round14vOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("win_garman_klass: per-asset sigma replays from bars within grid tolerance") {
    val bars = graft.queries.PipelineQueries.resampleOhlc.fn(spark, sf)
      .select("l_partkey", "open", "high", "low", "close").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val got = WindowQueries.winGarmanKlass.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val ln2 = 0.6931471805599453
    bars.groupBy(_._1).foreach { case (pk, bs) =>
      val terms = bs.map { case (_, o, h, l, c) =>
        assert(h >= l && h >= c && l <= c && h >= o && l <= o, s"bar sanity $pk")
        val lhl = math.log(h / l); val lco = math.log(c / o)
        0.5 * lhl * lhl - (2.0 * ln2 - 1.0) * lco * lco
      }
      val (n, cell) = got(pk)
      assert(n == bs.length)
      val mean = terms.sum / bs.length
      if (mean >= 0) {
        // pln ~1e-13/term + grid floors per term: loose envelope
        assert(cell.isDefined)
        assert(math.abs(cell.get / Grid - math.sqrt(mean)) < 1e-4,
          s"asset $pk gk ${cell.get / Grid} vs ${math.sqrt(mean)}")
      }
    }
    // single-tick days give flat bars (gk exactly 0) — but multi-tick
    // days exist, so some asset must measure strictly positive
    assert(got.values.forall(_._2.isDefined))
    assert(got.values.exists(_._2.exists(_ > 0)))
  }

  test("event_ab_srm: chi2 replays from distinct-user arm counts") {
    val users = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val n0 = users.count(_ % 2 == 0).toDouble
    val n1 = users.count(_ % 2 == 1).toDouble
    val e = (n0 + n1) / 2.0
    val chi2 = ((n0 - e) * (n0 - e)) / e + ((n1 - e) * (n1 - e)) / e
    val r = SessionQueries.eventAbSrm.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == n0.toLong && r.getLong(1) == n1.toLong)
    assert(r.getLong(2) == pin(n0 / (n0 + n1)))
    assert(r.getLong(3) == pin(chi2))
    assert(r.getInt(4) == (if (chi2 > 3.84) 1 else 0))
    // hash-based 50/50 assignment on this data should NOT trip SRM
    assert(r.getInt(4) == 0, s"SRM flagged on chi2=$chi2")
  }
}
