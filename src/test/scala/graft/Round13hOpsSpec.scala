package graft

import graft.queries.{AggQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-13 batch H2: PQ codebook utilization against a from-scratch
  * encode replay, and bootstrap replica means against an independent md5
  * membership + mean fold.
  */
class Round13hOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  /** The exact-decimal dot the operators publish: per-term product
    * rounded onto DECIMAL(38,8), exact integer-grid sum, one final
    * correctly-rounded double. */
  private def decDot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) =>
      java.math.BigDecimal.valueOf(x * y).setScale(8, java.math.RoundingMode.HALF_UP)
    }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue

  test("emb_pq_code_stats: from-scratch encode replay; shares partition each subspace") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val codebook = vecs.filter(_._1 < 16)
    def sub(v: Array[Double], s0: Int): Array[Double] = v.slice(s0 * 8, s0 * 8 + 8)
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    vecs.foreach { case (_, v) =>
      (0 until 8).foreach { s0 =>
        val x = sub(v, s0)
        val ssv = decDot(x, x)
        val best = codebook.map { case (code, cw) =>
          val c = sub(cw, s0)
          (ssv - 2 * decDot(x, c) + decDot(c, c), code)
        }.minBy(identity) // (dist2, code) lexicographic = dist asc, code asc
        val k = (s0.toLong, best._2)
        expected(k) = expected.getOrElse(k, 0L) + 1L
      }
    }
    val got = VectorQueries.embPqCodeStats.fn(spark, sf).collect()
      .map(r => ((r.getInt(0).toLong, r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(got.map(g => g._1 -> g._2).toMap == expected.toMap,
      "assigned-code counts differ from the encode replay")
    val n = vecs.length.toLong
    (0 until 8).foreach { s0 =>
      val rows = got.filter(_._1._1 == s0)
      assert(rows.map(_._2).sum == n, s"subspace $s0 must partition the corpus")
      rows.foreach { case ((_, _), nv, share) =>
        assert(share == pin(nv.toDouble / n.toDouble))
      }
    }
  }

  test("agg_bootstrap_means: md5 membership + mean replay; SE derivable and positive") {
    def mdHex(s0: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("string").as("ok"),
        col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).flatMap { case (flag, xs) =>
      (-1 to 15).map { b =>
        val kept =
          if (b == -1) xs
          else xs.filter(x =>
            ((java.lang.Long.parseLong(mdHex(x._2).take(8), 16) >> b) & 1) == 0)
        (flag, b.toLong) -> ((kept.length.toLong, kept.map(_._3).sum / kept.length))
      }
    }
    val got = AggQueries.aggBootstrapMeans.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.size)
    got.foreach { case (k, n, mean) =>
      val (en, emean) = expected(k)
      assert(n == en, s"replica size mismatch at $k")
      assert(math.abs(mean - emean) <= 1e-9 * math.max(1.0, math.abs(emean)),
        s"replica mean mismatch at $k")
      // a half-sample: binomial(n, 1/2) stays well inside [0.3, 0.7]·n here
      if (k._2 >= 0) {
        val full = expected((k._1, -1L))._1
        assert(n >= (0.3 * full).toLong && n <= (0.7 * full).toLong,
          s"replica $k size $n implausible for half-sampling of $full")
      }
    }
    // the bootstrap SE the reader derives: positive and finite per group
    got.groupBy(_._1._1).foreach { case (flag, xs) =>
      val ms = xs.filter(_._1._2 >= 0).map(_._3)
      val meanM = ms.sum / ms.length
      val se = math.sqrt(ms.map(m => (m - meanM) * (m - meanM)).sum / (ms.length - 1))
      assert(se > 0 && java.lang.Double.isFinite(se), s"degenerate bootstrap SE for $flag")
    }
  }
}
