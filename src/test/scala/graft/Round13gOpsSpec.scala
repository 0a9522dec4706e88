package graft

import graft.queries.{SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-13 batch H: A/B lift against a from-scratch conversion fold,
  * and graph modularity against its published-integer arithmetic plus
  * graph-level conservation invariants.
  */
class Round13gOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_ab_lift: counts, rates, lift and pooled z replay from raw events") {
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (uid, xs) =>
      (uid % 2, if (xs.exists(_._2 == "purchase")) 1L else 0L)
    }
    val n0 = perUser.count(_._1 == 0).toLong
    val c0 = perUser.filter(_._1 == 0).map(_._2).sum
    val n1 = perUser.count(_._1 == 1).toLong
    val c1 = perUser.filter(_._1 == 1).map(_._2).sum
    val row = SessionQueries.eventAbLift.fn(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n0, c0, n1, c1)))
    assert(row.getLong(4) == pin(c0.toDouble / n0.toDouble))
    assert(row.getLong(5) == pin(c1.toDouble / n1.toDouble))
    assert(row.getLong(6) == pin((c1.toDouble * n0.toDouble) / (n1.toDouble * c0.toDouble)))
    if (c0 + c1 > 0 && c0 + c1 < n0 + n1) {
      val pb = (c0 + c1).toDouble / (n0 + n1).toDouble
      val z = (c1.toDouble / n1.toDouble - c0.toDouble / n0.toDouble) /
        math.sqrt(pb * (1.0 - pb) * (1.0 / n0.toDouble + 1.0 / n1.toDouble))
      assert(row.getLong(7) == pin(z), s"z cell ${row.getLong(7)} != replay ${pin(z)}")
    } else assert(row.isNullAt(7),
      "z must be NULL when the pooled variance degenerates (all or none convert)")
    // parity split of a uniform assignment: arms within 20% of each other
    assert(math.abs(n0 - n1) <= (n0 + n1) / 5)
  }

  test("graph_modularity: conservation invariants + per-row arithmetic replay") {
    val edges = VectorQueries.annKnnMutualHier.fn(spark, sf).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.length.toLong
    val got = VectorQueries.graphModularity.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).sum == nodes, "every graph node sits in exactly one cluster row")
    assert(got.map(_._4).sum == 2 * m, "degree mass must sum to 2m")
    val eIn = got.map(_._3).sum
    assert(eIn <= m && eIn > 0, "intra-cluster edges in (0, m]")
    got.foreach { case (c, _, e, dsum, cell) =>
      val expect = pin(e.toDouble / m.toDouble -
        (dsum.toDouble / (2.0 * m.toDouble)) * (dsum.toDouble / (2.0 * m.toDouble)))
      assert(cell == expect, s"contribution cell mismatch at cluster $c")
    }
    val q = got.map(_._5.toDouble / Grid).sum
    assert(q > -1.0 && q < 1.0)
    assert(q > 0.0,
      "cosine clusters must explain mutual-kNN structure better than chance here")
  }
}
