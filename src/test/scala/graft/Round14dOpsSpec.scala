package graft

import graft.queries.{CorpusQueries, ScalarQueries, SessionQueries, TextQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch D: CUPED A/B adjustment, Amihud illiquidity,
  * Levenshtein scalar, subword fertility, weighted quantiles — each
  * replayed independently.
  */
class Round14dOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_ab_cuped: theta/means replay from per-user counts; adjustment preserves pooled mean") {
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id").cast("long"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mind = ev.map(_._2).min; val maxd = ev.map(_._2).max
    val mid = (mind + maxd + 1) / 2
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      (u % 2, rows.count(_._2 < mid).toLong, rows.count(_._2 >= mid).toLong)
    }.toSeq
    val n = perUser.size.toDouble
    val sx = perUser.map(_._2).sum.toDouble; val sy = perUser.map(_._3).sum.toDouble
    val sxx = perUser.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
    val sxy = perUser.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble
    val syy = perUser.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy; val cxy = n * sxy - sx * sy
    val got = SessionQueries.eventAbCuped.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == perUser.map(_._1).toSet)
    var weightedAdj = 0.0
    got.foreach { case (arm, (nu, meanPost, meanAdj, theta, varred)) =>
      val mine = perUser.filter(_._1 == arm)
      val na = mine.size.toDouble
      val mp = mine.map(_._3).sum.toDouble / na
      val ma = mp - (cxy / vx) * (mine.map(_._2).sum.toDouble / na - sx / n)
      assert(nu == mine.size && meanPost == pin(mp))
      assert(meanAdj == pin(ma), s"arm $arm adjusted mean")
      assert(theta == pin(cxy / vx) && varred == pin((cxy * cxy) / (vx * vy)))
      weightedAdj += na * ma
    }
    // CUPED preserves the pooled mean: Σ n_a·adj_a = Σ y (the adjustment
    // is mean-zero over the pooled population)
    assert(math.abs(weightedAdj - sy) < 1e-6 * math.max(1.0, sy))
  }

  test("win_amihud: grid replay per asset; illiquidity positive when any move exists") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"),
        col("l_shipdate").cast("timestamp").cast("long"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    val got = WindowQueries.winAmihud.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val seq = rs.sortBy(t => (t._4, t._5))
      val terms = seq.indices.drop(1).map { i =>
        val rg = math.floor((seq(i)._3 / seq(i - 1)._3 - 1.0) * 1048576.0)
        math.floor((((math.abs(rg) / 1048576.0) / (seq(i)._2 * seq(i)._3)) * 1000000.0) * Grid).toLong
      }
      if (terms.nonEmpty) {
        val ss = terms.sum.toDouble / Grid
        val (nGot, am) = got(k)
        assert(nGot == terms.length)
        assert(am == pin(ss / terms.length.toDouble), s"asset $k amihud")
      } else assert(!got.contains(k))
    }
  }

  test("fn_levenshtein: spot values + symmetry + zero-on-equal invariants") {
    val got = ScalarQueries.fnLevenshtein.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // independent DP replay on a sample
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val byKey = graft.util.Tables.part(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_name"), col("p_type")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    got.take(50).foreach { case (k, l, sim) =>
      val (a, b) = byKey(k)
      assert(l == lev(a, b), s"part $k lev")
      assert(sim == pin(1.0 - l.toDouble / math.max(a.length, b.length).toDouble))
    }
  }

  test("text_fertility: regex replay; fertility >= 0 and pieces >= letter-run count") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = TextQueries.textFertility.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docs.size)
    val re = "[a-z]+|[0-9]|[^a-z0-9\\s]".r
    got.take(100).foreach { case (id, pieces, ws, fert) =>
      val t = docs(id)
      val p = re.findAllIn(t.toLowerCase).length.toLong
      val w = t.trim.split("\\s+", -1).length.toLong
      assert(pieces == p, s"doc $id pieces")
      assert(ws == w, s"doc $id ws tokens")
      assert(fert == pin(p.toDouble / w.toDouble))
    }
  }

  test("quantile_weighted: thresholds replay; wp50 <= wp90; mass-majority property") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).trim.split("\\s+", -1).length.toLong))
    val got = CorpusQueries.quantileWeighted.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val byLen = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val tw = byLen.values.sum
      val sorted = byLen.toSeq.sortBy(_._1)
      def cut(num: Long, den: Long): Long = {
        var cum = 0L
        sorted.collectFirst { case (v, w) if { cum += w; den * cum >= num * tw } => v }.get
      }
      val (twGot, p50, p90) = got(src)
      assert(twGot == tw)
      assert(p50 == cut(1, 2) && p90 == cut(9, 10), s"source $src weighted cuts")
      assert(p50 <= p90)
      // mass at or below wp50 is at least half the total
      val below = sorted.takeWhile(_._1 <= p50).map(_._2).sum
      assert(2 * below >= tw)
    }
  }
}
