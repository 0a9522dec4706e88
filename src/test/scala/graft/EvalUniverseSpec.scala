package graft

import org.apache.spark.sql.functions._

/** The per-query evaluation ZERO-ROW CONVENTION (DESIGN.md §5, VERDICT
  * r11 #7): every eval that scores individual queries publishes a row
  * for EVERY member of its query universe (vec_id < 10) — a query whose
  * candidate list is empty or whose candidates are all irrelevant
  * publishes score 0 (and n_hits 0 / NULL first-hit rank), never a
  * dropped row. Both engines dropping the same rows would keep the
  * oracle gate green while every downstream corpus MEAN silently biased
  * upward (the ADVICE-r9 defect class), so the contract is pinned here
  * as explicit row-count equalities the gate cannot express. */
class EvalUniverseSpec extends SparkSpec {

  private val perQueryEvals = Seq(
    "q_eval_ndcg", "q_eval_mrr", "q_eval_map",
    "q_eval_recall_lsh", "q_eval_recall_pq")

  test("every per-query eval id is universe-complete (one row per query, always)") {
    val universe = graft.util.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q")).collect().map(_.getLong(0)).toSet
    assert(universe.size == 10, s"fixture universe changed: ${universe.size}")
    perQueryEvals.foreach { id =>
      val got = SparkEntry.queries(id)(spark, sf)
        .select("q").collect().map(_.getLong(0))
      assert(got.length == universe.size,
        s"$id emitted ${got.length} rows for a ${universe.size}-query universe")
      assert(got.toSet == universe, s"$id universe mismatch: ${got.toSet}")
    }
  }

  test("corpus-level evals normalize by the full universe, not the lucky subset") {
    // the recall curve publishes n_queries = |universe| on every row —
    // the denominator is the population even when hits are missing
    val rows = SparkEntry.queries("q_eval_recall_curve")(spark, sf).collect()
    assert(rows.length == 3) // one per nprobe in {1, 2, 4}
    assert(rows.forall(_.getAs[Long]("n_queries") == 10L),
      "recall denominators must be the universe size")
  }
}
