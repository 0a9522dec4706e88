package graft

import graft.queries.{TextQueries, VectorQueries}

/** Round-11 batch-4: the modality-mix report against a byte-level Scala
  * recount, and the recall-vs-nprobe curve against the registered
  * hier-probe search plus curve-shape invariants.
  */
class Round11dOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("mm_modality_mix: sf0.001 equals the byte-arithmetic recount") {
    val docs = graft.util.Tables.documents(spark, sf)
      .filter("text IS NOT NULL").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length.toLong))
    val byKind = docs.groupBy { case (id, _) =>
      if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
    }
    val corpusBytes = docs.map(_._2).sum
    val expected = byKind.map { case (kind, g) =>
      val bytes = g.map(_._2)
      val total = bytes.sum
      kind -> ((g.length.toLong, total, g.map(x => x._2 / 100 + 1).sum, bytes.max,
        math.floor(total.toDouble / g.length * Grid).toLong,
        math.floor(total.toDouble / corpusBytes * Grid).toLong))
    }
    val got = TextQueries.mmModalityMix.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    assert(got.keySet == Set("image", "audio", "video"))
  }

  test("eval_recall_curve: monotone in nprobe; nprobe=2 equals the registered hier-probe search") {
    val rows = VectorQueries.evalRecallCurve.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    rows.values.foreach { case (nq, _, _) => assert(nq == 10L) }
    // more probes can only add candidates: hits are monotone non-decreasing
    assert(rows(1L)._2 <= rows(2L)._2 && rows(2L)._2 <= rows(4L)._2)
    rows.foreach { case (_, (nq, h, cell)) =>
      assert(cell == math.floor(h.toDouble / (3 * nq) * Grid).toLong)
    }
    // the nprobe=2 point IS the registered q_ann_ivf_probe_hier search:
    // its hits against the exact top-3 truth must match the curve's row
    val gt = VectorQueries.annCosineTopk.fn(spark, sf).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe2 = VectorQueries.annIvfProbeHier.fn(spark, sf)
      .select("q", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(2L)._2 == probe2.count(gt).toLong)
  }
}
