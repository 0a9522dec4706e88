package graft.util

import org.apache.spark.sql.DataFrame

/** Pre-amplification parallelism guard (r14, VERDICT r13 #3).
  *
  * Row-explosion operators (character n-gram explodes, shingle explodes,
  * frame sampling) amplify work per input BYTE by 10²-10³×, so their wall
  * clock is set by the parallelism of the *scan* feeding them — and scan
  * parallelism is a property of the lake layout, not the plan: Spark
  * assigns one task per input split, and a parquet row group is the
  * minimum split (a single-row-group file is ONE task no matter what
  * `maxPartitionBytes` says).
  *
  * At 100 TB the corpus arrives as thousands of ~1 GB multi-row-group
  * files and the scan is already wider than the cluster — this helper is
  * a provable no-op there (the guard fires only when the scan yields
  * fewer than half the available slots). On small/badly-laid-out inputs
  * (one tiny file, a single giant row group) it redistributes the slim
  * pre-explode projection once — bytes that are ~1/amplification of the
  * work they unlock — instead of letting 1 task compute while the other
  * 31 slots idle.
  *
  * AQE cannot do this: it re-plans *shuffle* boundaries, and the problem
  * here is a stage with no shuffle in it at all.
  */
object FanOut {
  /** `spark.graft.fanout` = `auto` (default) | `off` — the A/B gate for
    * benchmarking the guard itself; `off` restores the bare scan. */
  val Key = "spark.graft.fanout"

  /** Repartition `df` to the default parallelism iff its current plan
    * yields fewer than half that many partitions. Inspecting
    * `rdd.getNumPartitions` forces physical planning but runs no job.
    * Catalyst pushes filters and column pruning THROUGH the round-robin
    * repartition (PushDownPredicates / ColumnPruning both list
    * Repartition), so scan-level pushdown is unaffected — only the
    * surviving, pruned rows are redistributed. */
  def apply(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf.get(Key, "auto") == "off") return df
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= slots) df.repartition(slots) else df
  }

  implicit class Ops(private val df: DataFrame) extends AnyVal {
    /** `df.fannedOut` — see [[FanOut.apply]]. */
    def fannedOut: DataFrame = FanOut(df)
  }
}
