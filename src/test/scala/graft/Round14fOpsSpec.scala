package graft

import graft.queries.{SessionQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch F: user-activity Gini (histogram rank-sum) and the
  * greedy graph-walk search — independent replays.
  */
class Round14fOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("event_gini_user: histogram rank-sum equals the direct sorted-rank Gini") {
    val counts = graft.util.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val sorted = counts.sorted
    val k = sorted.length.toDouble
    val sx = sorted.map(BigInt(_)).sum
    val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
    val gini = (2.0 * six.toDouble) / (k * sx.toDouble) - (k + 1.0) / k
    val r = SessionQueries.eventGiniUser.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == sorted.length && r.getLong(1) == sx.toLong)
    // the direct rank form assigns arbitrary ranks within ties, but the
    // Gini VALUE is tie-invariant (sum over a tied block of i*x is the
    // same for any within-block order) — so exact equality holds
    assert(r.getLong(2) == pin(gini), s"gini ${r.getLong(2)} vs ${pin(gini)}")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("ann_graph_walk: greedy descent replay; cosine never decreases along hops") {
    // graph + vectors
    val knn = VectorQueries.annKnnHier.fn(spark, sf)
      .select(col("q").cast("long"), col("c").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def decDot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) =>
        java.math.BigDecimal.valueOf(x * y).setScale(8, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      decDot(va, vb) / (math.sqrt(decDot(va, va)) * math.sqrt(decDot(vb, vb)))
    }
    val entry = nbrs.keys.min
    val got = VectorQueries.annGraphWalk.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (0L until 10L).filter(vecs.contains).foreach { q =>
      var node = entry; var c = cos(q, node); var hops = 0L
      val trace = scala.collection.mutable.ArrayBuffer(c)
      (1 to 6).foreach { _ =>
        val cands = (nbrs.getOrElse(node, Set.empty) + node).toSeq
          .map(n => (cos(q, n), n))
        val best = cands.minBy { case (cc, n) => (-cc, n) }
        if (best._2 != node) hops += 1
        node = best._2; c = best._1
        trace += c
      }
      val (bn, bc, nh) = got(q)
      assert(bn == node, s"query $q landing node")
      assert(bc == pin(c), s"query $q landing cosine")
      assert(nh == hops, s"query $q hop count")
      // greedy invariant: the followed cosine is non-decreasing
      assert(trace.sliding(2).forall(p => p(1) >= p(0) - 1e-12))
    }
  }
}
