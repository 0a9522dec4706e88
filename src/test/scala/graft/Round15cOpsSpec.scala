package graft

import graft.queries.{PipelineQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch AC: ECE/MCE, label conductance — replays. */
class Round15cOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("eval_ece: gap-weighted mean replays from the calibration bins; MCE >= ECE") {
    val cal = PipelineQueries.evalCalibration.fn(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    val n = cal.map(_._1).sum.toDouble
    val terms = cal.map { case (nk, _, meanScore, posRate) =>
      (nk / n) * math.abs(meanScore - posRate)
    }
    val ece = terms.map(t => math.floor(t * Grid)).sum / Grid
    val mce = cal.map { case (_, _, ms, pr) => math.abs(ms - pr) }.max
    val r = PipelineQueries.evalEce.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == pin(ece), s"ece ${r.getLong(1)} vs ${pin(ece)}")
    assert(r.getLong(2) == pin(mce))
    assert(r.getLong(2) >= r.getLong(1), "MCE bounds ECE from above")
  }

  test("graph_conductance: cut/vol replay from the mutual edge list; bounded [0,1]") {
    val edges = VectorQueries.annKnnMutualHier.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lab = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    val el = edges.map { case (a, b) => (lab(a), lab(b)) }
    val volAll = 2L * el.length
    val labels = (el.map(_._1) ++ el.map(_._2)).distinct
    val got = VectorQueries.graphConductance.fn(spark, sf).collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == labels.toSet)
    labels.foreach { l =>
      val vol = el.count(_._1 == l).toLong + el.count(_._2 == l).toLong
      val cut = el.count(e => (e._1 == l) != (e._2 == l)).toLong
      val (gv, gc, cond) = got(l)
      assert(gv == vol && gc == cut, s"label $l vol/cut")
      val mv = math.min(vol, volAll - vol)
      if (mv > 0) {
        assert(cond.contains(pin(cut.toDouble / mv)))
        assert(cut <= vol, "cut edges are incident edges")
      } else assert(cond.isEmpty)
    }
  }
}
