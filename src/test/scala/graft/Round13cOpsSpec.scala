package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Round-13 graph operators over the mutual-kNN graph, verified by
  * independent Scala replays on the collected edge list: local clustering
  * coefficients against a brute-force per-node triangle counter, the
  * degree histogram against a direct fold, and BFS layers against a
  * run-to-fixpoint queue BFS.
  */
class Round13cOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  private lazy val edges: Seq[(Long, Long)] =
    VectorQueries.annKnnMutualHier.fn(spark, sf).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val adjacency: Map[Long, Set[Long]] =
    (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }

  test("graph_local_cc: brute-force per-node triangle count replays; cc in [0,1]") {
    val expected = adjacency.map { case (u, ns) =>
      val tri = ns.toSeq.combinations(2).count { case Seq(v, w) => adjacency(v)(w) }
      val deg = ns.size.toLong
      val cc = if (deg >= 2) Some(pin(2.0 * tri / (deg * (deg - 1)).toDouble)) else None
      u -> ((deg, tri.toLong, cc))
    }
    val got = VectorQueries.graphLocalCc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.length == expected.size)
    got.foreach { case (u, deg, tri, cc) =>
      val (ed, et, ecc) = expected(u)
      assert(deg == ed && tri == et && cc == ecc, s"mismatch at node $u")
      cc.foreach(c => assert(c >= 0L && c <= Grid.toLong))
    }
    assert(got.exists(_._3 > 0), "some triangles must exist on this fixture")
    assert(got.exists(g => g._2 >= 2 && g._3 == 0), "some open wedge must exist")
  }

  test("graph_degree_hist: direct fold replays; shares sum to 1 on the pin grid") {
    val expected = adjacency.values.map(_.size.toLong).groupBy(identity)
      .map { case (deg, xs) => deg -> xs.size.toLong }
    val tot = expected.values.sum
    val got = VectorQueries.graphDegreeHist.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    got.foreach { case (_, n, share) =>
      assert(share == pin(n.toDouble / tot.toDouble))
    }
    val shareSum = got.map(_._3).sum
    assert(math.abs(shareSum - Grid.toLong) <= got.length)
  }

  test("graph_bfs_layers: queue BFS replays; the unrolled depth reaches the component") {
    val seed = adjacency.keySet.min
    // run-to-fixpoint reference BFS
    val dist = scala.collection.mutable.Map(seed -> 0)
    var frontier = Set(seed)
    var d0 = 0
    while (frontier.nonEmpty) {
      d0 += 1
      frontier = frontier.flatMap(adjacency).filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d0)
    }
    val maxDist = dist.values.max
    val Rounds = 12 // = VectorQueries.BfsRounds
    assert(maxDist <= Rounds,
      s"fixture eccentricity $maxDist exceeds the unrolled depth - raise BfsRounds")
    val got = VectorQueries.graphBfsLayers.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getBoolean(3)))
    assert(got.length == adjacency.size)
    got.foreach { case (n, deg, dd, reached) =>
      assert(deg == adjacency(n).size.toLong)
      assert(dd == dist.get(n).filter(_ <= Rounds), s"dist mismatch at node $n")
      assert(reached == dist.contains(n), s"reached mismatch at node $n")
    }
    assert(got.exists(!_._4), "the mutual graph must have >1 component here")
    assert(got.count(_._3.contains(0)) == 1, "exactly one seed")
  }
}
