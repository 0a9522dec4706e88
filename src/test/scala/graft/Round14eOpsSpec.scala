package graft

import graft.queries.{AggQueries, RecursiveQueries, SessionQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch E: Mann-Whitney U, Benford audit, event-type entropy,
  * Keltner channels — independent replays.
  */
class Round14eOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_mannwhitney: U and z replay from midranks; U within [0, n1*n2]") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double"), col("l_returnflag")).collect()
      .map(r => (r.getDouble(0), r.getString(1) == "R"))
    val byVal = rows.groupBy(_._1).view
      .mapValues(g => (g.count(_._2).toLong, g.length.toLong)).toMap
    val sorted = byVal.toSeq.sortBy(_._1)
    var below = 0L; var sr1 = BigInt(0); var ties = BigInt(0)
    sorted.foreach { case (_, (c1, c)) =>
      val rr = BigInt(2 * below + c + 1)
      sr1 += BigInt(c1) * rr
      ties += BigInt(c) * BigInt(c) * BigInt(c) - BigInt(c)
      below += c
    }
    val n1 = rows.count(_._2).toDouble; val n = rows.length.toDouble; val n2 = n - n1
    val u1 = sr1.toDouble / 2.0 - (n1 * (n1 + 1.0)) / 2.0
    val varU = (n1 * n2 / 12.0) * ((n + 1.0) - ties.toDouble / (n * (n - 1.0)))
    val z = (u1 - (n1 * n2) / 2.0) / math.sqrt(varU)
    val r = AggQueries.aggMannWhitney.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == n1.toLong && r.getLong(1) == n2.toLong)
    assert(r.getDouble(2) == u1, s"u1 ${r.getDouble(2)} vs $u1")
    assert(r.getLong(3) == pin(z))
    assert(u1 >= 0 && u1 <= n1 * n2, "U must lie in [0, n1*n2]")
  }

  test("agg_benford: digit shares replay; chi2 terms nonnegative; shares sum to 1") {
    val cents = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double")).collect()
      .map(r => math.round(r.getDouble(0) * 100.0))
    val exp = cents.map(_.toString.head.toString)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = cents.length.toDouble
    val got = AggQueries.aggBenford.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == exp.keySet)
    var shareSum = 0.0
    got.foreach { case (dd, (n, share, bp, chi2)) =>
      assert(n == exp(dd), s"digit $dd count")
      assert(share == pin(n / tot))
      val p = math.log10(1.0 + 1.0 / dd.toInt)
      assert(bp == pin(p))
      assert(chi2 >= 0)
      shareSum += n / tot
    }
    assert(math.abs(shareSum - 1.0) < 1e-12)
  }

  test("event_type_entropy: per-day entropy within pln envelope; bounded by ln(types)") {
    val ev = graft.util.Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
    val got = SessionQueries.eventTypeEntropy.fn(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    ev.groupBy(_._1).foreach { case (day, rows) =>
      val counts = rows.groupBy(_._2).map(_._2.length.toDouble)
      val n = rows.length.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c)).sum / n
      val (nGot, eGot) = got(day)
      assert(nGot == rows.length)
      assert(math.abs(eGot / Grid - h) < 1e-6, s"day $day entropy")
      assert(eGot / Grid <= math.log(counts.size.toDouble) + 1e-9)
    }
  }

  test("keltner: one-asset fold replay; bands bracket the midline symmetrically") {
    val first = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long")).limit(1).collect()(0).getLong(0)
    val rows = graft.util.Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === first)
      .select(col("l_extendedprice").cast("double"), col("l_tax").cast("double"),
        col("l_discount").cast("double"), col("l_shipdate").cast("timestamp").cast("long"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._4, t._5))
    val out = RecursiveQueries.keltner.fn(spark, sf)
      .filter(col("key") === first).orderBy("rn").collect()
    assert(out.length == rows.length)
    val a = 2.0 / 21.0
    var ema = 0.0; var atr = 0.0
    rows.zipWithIndex.foreach { case ((close, tax, disc, _, _), i) =>
      val high = close * (1.0 + tax); val low = close * (1.0 - disc)
      if (i == 0) { ema = close; atr = high - low }
      else {
        ema = (a * close) + ((1.0 - a) * ema)
        val pc = rows(i - 1)._1
        val tr = math.max(high - low, math.max(math.abs(high - pc), math.abs(low - pc)))
        atr = ((atr * 9.0) + tr) / 10.0
      }
      assert(out(i).getDouble(2) == ema, s"row $i ema")
      assert(out(i).getDouble(3) == atr, s"row $i atr")
      assert(out(i).getDouble(4) == ema + 2.0 * atr)
      assert(out(i).getDouble(5) == ema - 2.0 * atr)
    }
  }
}
