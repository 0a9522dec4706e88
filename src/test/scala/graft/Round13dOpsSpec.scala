package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Round-13 ranking evals, verified by from-scratch replays of the
  * en-score ranking (same replay harness as the PR-AUC spec) plus
  * analytic invariants (KS ∈ [0,1], decile monotonicity of cum counts).
  */
class Round13dOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  /** (score, y) per doc — the ranking every eval id consumes. */
  private lazy val scored: Array[(Double, Int)] = {
    val docs = graft.util.Tables.documents(spark, sf)
    graft.ops.TextOps.explodeTokens(docs)
      .groupBy("doc_id")
      .agg((sum(when(col("word").isin("the", "a"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("score"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("y")), "doc_id")
      .select("score", "y").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
  }

  test("eval_ks: max CDF gap replays from the sorted score groups; ks in [0,1]") {
    val nPos = scored.count(_._2 == 1).toLong
    val nNeg = scored.length.toLong - nPos
    val groups = scored.groupBy(_._1).map { case (s0, xs) =>
      (s0, xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong)
    }.toSeq.sortBy(_._1)
    var cp = 0L; var cn = 0L; var num = 0L
    groups.foreach { case (_, np, nn) =>
      cp += np; cn += nn
      num = math.max(num, math.abs(cp * nNeg - cn * nPos))
    }
    val ks = pin(num.toDouble / (nPos.toDouble * nNeg.toDouble))
    val row = PipelineQueries.evalKs.fn(spark, sf).collect().head
    assert(row.getLong(0) == nPos && row.getLong(1) == nNeg)
    assert(row.getLong(2) == ks, s"ks cell ${row.getLong(2)} != replay $ks")
    assert(row.getLong(2) >= 0 && row.getLong(2) <= Grid.toLong)
    assert(row.getLong(2) > 0, "an informative score must separate the classes some")
  }

  test("eval_lift_deciles: value-cohort decile replay; lift averages to ~1 over docs") {
    val total = scored.length.toLong
    val nPos = scored.count(_._2 == 1).toLong
    val hist = scored.groupBy(_._1).map { case (s0, xs) =>
      (s0, xs.length.toLong, xs.count(_._2 == 1).toLong)
    }
    def dgt(s0: Double): Long = hist.collect { case (w, n, _) if w > s0 => n }.sum
    val expected = hist.toSeq.map { case (s0, n, np) =>
      (math.min(9L, dgt(s0) * 10 / total), n, np)
    }.groupBy(_._1).map { case (dec, xs) =>
      val nd = xs.map(_._2).sum; val np = xs.map(_._3).sum
      (dec, nd, np, pin(np.toDouble / nd.toDouble),
        pin((np.toDouble * total.toDouble) / (nd.toDouble * nPos.toDouble)))
    }.toSet
    val got = PipelineQueries.evalLiftDeciles.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == expected)
    // doc-weighted mean lift is 1 by construction (total positives over total docs)
    val wsum = got.map(g => g._2.toDouble * (g._3.toDouble * total / (g._2 * nPos.toDouble))).sum
    assert(math.abs(wsum / total - 1.0) < 1e-9)
    // structural invariants (the score may be weak on a tiny fixture,
    // so informativeness itself is NOT asserted)
    assert(got.forall(g => g._1 >= 0 && g._1 <= 9))
    assert(got.map(_._2).sum == total && got.map(_._3).sum == nPos)
  }
}
