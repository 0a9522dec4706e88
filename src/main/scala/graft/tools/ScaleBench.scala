package graft.tools

import graft.SparkEntry

/** Scaling-cadence runner (VERDICT r7 #8): the sf1 re-measurement
  * discipline (ScaleUp ×10 fixture, warmup + min-of-reps, wall AND
  * process CPU) as ONE committed command, so scale claims in DESIGN.md §4
  * re-measure mechanically as operators evolve instead of by hand.
  *
  * `runMain graft.tools.ScaleBench <srcDir> <scaledDir> [ids... | all]`
  *
  * - Generates `<scaledDir>` with tools.ScaleUp (×10, decorrelated
  *   replicas) iff it does not already hold a lineitem.parquet.
  * - For each query id (default: the scale-audit set below — the
  *   heaviest registered designs plus every round's new operators), runs
  *   warmup + 3 reps at BOTH scale factors and reports the minimum wall
  *   with its CPU.
  * - Prints the DESIGN.md-style markdown row per query and appends a
  *   JSON line per run to SCALE_LOCAL.jsonl at the repo root (same
  *   committed-history rationale as BENCH_LOCAL.jsonl).
  *
  * Reading the numbers (DESIGN.md §4): a perfectly LINEAR operator costs
  * 10× total CPU at 10× rows; wall below 10× is parallelism; CPU far
  * above ~13× means a super-linear design term — find it before the
  * corpus does.
  */
object ScaleBench {
  private val DefaultIds = Seq(
    "q_dedup_semantic", "q_dedup_semantic_hier", "q_ann_ivf_trained",
    "q_ann_lsh_stacked", "q_dedup_cluster", "q_dedup_keep_best",
    "q_dedup_ngram_jaccard", "q_contamination",
    "q_text_entropy", "q_text_unigram_logprob")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    // `all` = the whole registry (sorted) — the full-suite scaling audit
    val ids =
      if (args.length > 2 && args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 2) args.drop(2).toSeq
      else DefaultIds
    val reps = 3

    if (!new java.io.File(s"$dst/lineitem.parquet").exists()) {
      println(s"[scalebench] generating $dst = ScaleUp x10 of $src")
      ScaleUp.main(Array(src, dst, "10"))
    }

    val spark = graft.util.Sessions.local()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    /** (min wall s, cpu s at the min-wall rep) under the Bench/Explain
      * protocol: untimed warmup, System.gc outside the timed section. */
    def measure(id: String, dir: String): (Double, Double) = {
      val fn = SparkEntry.queries(id)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
      val runs = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      runs.minBy(_._1)
    }

    val rows = ids.map { id =>
      val (w0, c0) = measure(id, src)
      val (w1, c1) = measure(id, dst)
      println(f"| $id | $w0%.2f | $w1%.2f | ${w1 / w0}%.1f× | " +
        f"${c1 / c0}%.1f× ($c0%.1f→$c1%.1f s) |")
      (id, w0, c0, w1, c1)
    }

    val stamp = java.time.Instant.now().toString
    val json = rows.map { case (id, w0, c0, w1, c1) =>
      f"""\"$id\":{"sf01_wall":$w0%.3f,"sf01_cpu":$c0%.2f,"sf1_wall":$w1%.3f,"sf1_cpu":$c1%.2f}"""
    }.mkString(s"""{"at":"$stamp","src":"$src","dst":"$dst","queries":{""", ",", "}}")
    try {
      val root = sys.props.getOrElse("graft.repo.root", ".")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/SCALE_LOCAL.jsonl"),
        (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable => System.err.println(s"[scalebench] tee failed: $e") }
    println(json)
    spark.stop()
  }
}
