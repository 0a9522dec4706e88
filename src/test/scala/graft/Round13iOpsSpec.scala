package graft

import graft.queries.{JoinQueries, SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-13 batch I: filtered vector search against a brute-force
  * same-label replay, growth accounting against a first-day fold, and
  * universe turnover against an exact-spend set replay.
  */
class Round13iOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private def dec8(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP)

  private def decDot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => dec8(x * y) }
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue

  test("ann_filtered: brute-force same-label top-3 replays; pre-filter semantics hold") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val norms = vecs.map(v => v._1 -> math.sqrt(decDot(v._2, v._2))).toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (q, eq, lq) =>
      vecs.filter(c => c._1 != q && c._3 == lq)
        .map { case (c, ec, _) => (c, decDot(eq, ec) / (norms(q) * norms(c))) }
        .sortBy(x => (-x._2, x._1)).take(3).zipWithIndex
        .map { case ((c, cos), i) => (q, lq, c, cos, i + 1L) }
    }.toSet
    val got = VectorQueries.annFiltered.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got == expected, "filtered top-3 differs from the brute-force replay")
    // pre-filter: every retrieved candidate matches the query's label
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    got.foreach { case (q, l, c, _, _) =>
      assert(labelOf(q) == l && labelOf(c) == l, s"label leak at ($q, $c)")
    }
  }

  test("event_new_returning: first-day fold replays; new users sum to the user universe") {
    val pairs = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = pairs.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val expected = pairs.groupBy(_._2).map { case (d0, xs) =>
      val nNew = xs.count(x => firstDay(x._1) == d0).toLong
      (d0, xs.length.toLong, nNew, xs.length - nNew,
        pin(nNew.toDouble / xs.length.toDouble))
    }.toSet
    val got = SessionQueries.eventNewReturning.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == expected)
    assert(got.map(_._3).sum == firstDay.size.toLong,
      "every user is new exactly once")
    val day1 = got.minBy(_._1)
    assert(day1._2 == day1._3, "on the corpus's first day everyone is new")
  }

  test("join_universe_turnover: exact-spend top-10 set replay; kept + added = k") {
    val sp = graft.util.Tables.orders(spark, sf)
      .select(date_trunc("year", col("o_orderdate")).cast("string").as("p"),
        col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val uni = sp.groupBy(x => (x._1, x._2)).map { case ((p0, ck), xs) =>
      val spend = xs.map(x => dec8(x._3)).foldLeft(java.math.BigDecimal.ZERO)(_ add _)
        .doubleValue
      (p0, ck, spend)
    }.groupBy(_._1).map { case (p0, xs) =>
      p0 -> xs.toSeq.sortBy(x => (-x._3, x._2)).take(10).map(_._2).toSet
    }
    val years = uni.keys.toSeq.sorted
    val expected = years.zip(years.drop(1)).map { case (prev, cur) =>
      val kept = (uni(cur) & uni(prev)).size.toLong
      (cur, kept, uni(cur).size - kept, uni(prev).size - kept,
        pin((uni(cur).size - kept).toDouble / uni(cur).size.toDouble))
    }.toSet
    val got = JoinQueries.joinUniverseTurnover.fn(spark, sf)
      .withColumn("period", col("period").cast("string")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected, "turnover table differs from the set replay")
    got.foreach { case (_, kept, added, _, _) => assert(kept + added == 10L) }
    assert(got.nonEmpty, "consecutive periods must exist")
  }
}
