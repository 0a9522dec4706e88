package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Round-12 batch J: PSI drift monitor — independent replay. */
class Round14jOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("profile_psi: bins replay; shares sum to 1 per half; PSI terms match math.log replay") {
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("value").cast("double"), expr("unix_micros(ts) div 86400000000"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val mind = ev.map(_._2).min; val maxd = ev.map(_._2).max
    val mid = (mind + maxd + 1) / 2
    val h1 = ev.filter(_._2 < mid).map(_._1)
    val h2 = ev.filter(_._2 >= mid).map(_._1)
    // decile thresholds on the first half: min v with 10*cum >= i*n
    val sorted = h1.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val n = h1.length.toLong
    val ts = (1 to 9).map { i =>
      var cum = 0L
      sorted.collectFirst { case (v, c) if { cum += c; 10 * cum >= i * n } => v }.get
    }
    def bin(v: Double): Int = 1 + ts.count(v > _)
    val c1 = h1.groupBy(bin).view.mapValues(_.length.toLong).toMap
    val c2 = h2.groupBy(bin).view.mapValues(_.length.toLong).toMap
    val got = PipelineQueries.profilePsi.fn(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got.keySet == (c1.keySet ++ c2.keySet))
    var s1, s2 = 0.0
    got.foreach { case (b, (n1, n2, p1, p2, term)) =>
      assert(n1 == c1.getOrElse(b, 0L) && n2 == c2.getOrElse(b, 0L), s"bin $b counts")
      val pp1 = n1.toDouble / h1.length; val pp2 = n2.toDouble / h2.length
      assert(p1 == math.floor(pp1 * Grid).toLong && p2 == math.floor(pp2 * Grid).toLong)
      if (n1 > 0 && n2 > 0) {
        val t = (pp2 - pp1) * math.log(pp2 / pp1)
        assert(math.abs(term.get.toDouble / Grid - t) < 1e-6, s"bin $b psi term")
        assert(term.get.toDouble / Grid >= -1e-12, "a PSI term is never negative")
      } else assert(term.isEmpty, s"bin $b must publish NULL on a zero side")
      s1 += pp1; s2 += pp2
    }
    assert(math.abs(s1 - 1.0) < 1e-12 && math.abs(s2 - 1.0) < 1e-12)
  }
}
