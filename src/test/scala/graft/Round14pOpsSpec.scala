package graft

import graft.queries.{AggQueries, ScalarQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch P: log geometric mean, int8 MSE audit, split_part /
  * regexp_extract scalars — replays.
  */
class Round14pOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("agg_gmean: log GM replays from per-group Math.log means (grid tolerance)") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = AggQueries.aggGmean.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pos = rows.filter(_._2 > 0)
    assert(got.keySet == pos.map(_._1).toSet)
    got.foreach { case (flag, (n, lgCell, nonpos)) =>
      val xs = pos.filter(_._1 == flag).map(_._2)
      assert(n == xs.length)
      assert(nonpos == rows.count(_._2 <= 0))
      val want = xs.map(math.log).sum / xs.length
      // pln ~1e-13 per value + grid floors (value-domain-many addends)
      assert(math.abs(lgCell / Grid - want) < 1e-5, s"$flag logGM")
      // GM <= AM (positive values)
      val am = xs.sum / xs.length
      assert(math.exp(lgCell / Grid) <= am * (1 + 1e-9))
    }
  }

  test("eval_int8_mse: errors bounded by half-step; mse <= max^2") {
    val rows = VectorQueries.evalInt8Mse.fn(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val n = r.getLong(1)
      val mse = r.getLong(2) / Grid
      val maxErr = r.getDouble(3)
      val halfStep = r.getLong(4) / Grid
      assert(n == 500)
      // affine rounding keeps every error within one half step (+rounding)
      assert(maxErr <= halfStep + 1e-9, s"dim ${r.getLong(0)}")
      assert(mse >= 0.0 && mse <= maxErr * maxErr + 1e-9)
    }
  }

  test("fn_split_part and fn_regexp_extract replay on sample rows") {
    val parts = graft.util.Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).take(50)
    val sp = ScalarQueries.fnSplitPart.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val re = ScalarQueries.fnRegexpExtract.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    parts.foreach { case (k, name, brand) =>
      val f2 = name.split(" ", -1).lift(1).getOrElse("")
      assert(sp(k) == f2, s"part $k split_part")
      val digits = "([0-9]+)".r.findFirstIn(brand).getOrElse("")
      assert(re(k) == digits, s"part $k regexp_extract")
    }
    assert(re.values.exists(_.nonEmpty), "no digit extracted anywhere")
  }
}
