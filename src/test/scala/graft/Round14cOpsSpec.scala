package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Round-12 batch C: label-propagation communities replayed with an
  * independent in-memory propagation over the same mutual-kNN edges.
  */
class Round14cOpsSpec extends SparkSpec {

  test("graph_label_prop: 4-round min-tie propagation replay; sizes partition the node set") {
    // rebuild the mutual edge set from the registered kNN join
    val knn = VectorQueries.annKnnHier.fn(spark, sf)
      .select(col("q").cast("long"), col("c").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val du = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = du.map(_._1).distinct
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      val next = du.groupBy(_._1).map { case (node, nbrs) =>
        val counts = nbrs.map(e => lbl(e._2))
          .groupBy(identity).view.mapValues(_.size).toSeq
        // most frequent, ties to smallest label
        node -> counts.minBy { case (l, c) => (-c, l) }._1
      }
      lbl = next
    }
    val expect = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = VectorQueries.graphLabelProp.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "community sizes differ from the propagation replay")
    assert(got.values.sum == nodes.size.toLong, "communities must partition the node set")
  }
}
