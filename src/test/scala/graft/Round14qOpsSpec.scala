package graft

import graft.queries.{AggQueries, CurationQueries, RollingQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch Q: Hodges–Lehmann pseudo-median, Ichimoku lines,
  * sentence-length profile — replays.
  */
class Round14qOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("agg_hodges_lehmann: brute-force Walsh-average median replays per flag") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = AggQueries.aggHodgesLehmann.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val xs = g.map(_._2)
      val walsh = (for {
        i <- xs.indices; j <- i until xs.length
      } yield (xs(i) + xs(j)) / 2.0).sorted
      // lower weighted median = element at ceil(W/2) (1-based), i.e. the
      // first position where 2*rank >= W
      val hl = walsh((walsh.length + 1) / 2 - 1)
      assert(got(flag) == hl, s"$flag HL ${got(flag)} vs $hl")
      // HL sits inside the data range
      assert(hl >= xs.min && hl <= xs.max)
    }
  }

  test("win_ichimoku: midlines and displacement replay for the largest asset") {
    val topKey = graft.util.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().orderBy(col("count").desc, col("l_partkey"))
      .head().getLong(0)
    val series = graft.util.Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === topKey)
      .select(col("l_shipdate"), (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"),
        col("l_extendedprice"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val px = series.map(_._3)
    def mid(i: Int, n: Int): Option[Double] =
      if (i + 1 >= n) {
        val w = px.slice(i - n + 1, i + 1)
        Some((w.max + w.min) / 2.0)
      } else None
    val got = RollingQueries.winIchimoku.fn(spark, sf)
      .filter(col("l_partkey") === topKey)
      .orderBy("l_shipdate", "ord").collect()
    assert(got.length == px.length && px.length > 26,
      s"largest asset has only ${px.length} rows")
    got.zipWithIndex.foreach { case (r, i) =>
      def cell(ix: Int): Option[Double] = if (r.isNullAt(ix)) None else Some(r.getDouble(ix))
      assert(cell(3) == mid(i, 9), s"row $i tenkan")
      assert(cell(4) == mid(i, 26), s"row $i kijun")
      val expA = if (i >= 26) (mid(i - 26, 9), mid(i - 26, 26)) match {
        case (Some(t9), Some(k26)) => Some((t9 + k26) / 2.0)
        case _ => None
      } else None
      assert(cell(5) == expA, s"row $i senkou A")
      val expB = if (i >= 26) mid(i - 26, 52) else None
      assert(cell(6) == expB, s"row $i senkou B")
    }
  }

  test("text_sentence_len: profile replays from the shared splitter") {
    val sents = graft.util.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("source", "text").collect()
      .flatMap { r =>
        r.getString(1).split("[.!?]+", -1).map(_.trim.toLowerCase)
          .filter(_.length >= 1).map(sx => (r.getString(0), sx.split("\\s+", -1).length.toLong))
      }
    val got = CurationQueries.textSentenceLen.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == sents.map(_._1).toSet)
    sents.groupBy(_._1).foreach { case (src, g) =>
      val ls = g.map(_._2).sorted
      val (n, meanCell, p50, p90) = got(src)
      assert(n == ls.length)
      assert(meanCell == pin(ls.sum.toDouble / ls.length))
      assert(p50 == ls((ls.length + 1) / 2 - 1), s"$src p50")
      assert(p90 == ls(math.ceil(ls.length * 9.0 / 10.0).toInt - 1), s"$src p90")
      assert(p50 <= p90)
    }
  }
}
