package graft.util

import org.apache.spark.sql.SparkSession

/** One place for engine tuning so Verify / Bench / tests / user code get
  * identical sessions.
  *
  * Scale rationale (targets a 1000-executor cluster; local[32] for tests):
  * - shuffle.partitions = cores locally; at cluster scale set ~2-3× total
  *   cores and let AQE coalesce — AQE is ON here for the same reason.
  * - WindowExec/SMJ buffers: Spark spills window/join buffers to disk
  *   after 4096 rows per partition — pathological for month-partitioned
  *   windows where a task legitimately holds 10⁴-10⁶ rows. We raise the
  *   in-memory threshold; executors sized for that (documented in README).
  * - UTC timezone everywhere: the reference day-normalizes tz-naive UTC
  *   (pipeline_helpers.py:213) and the DuckDB oracle agrees.
  * - nanosAsLong: testdata events.ts is parquet TIMESTAMP(NANOS); Spark 4
  *   otherwise refuses the file (Tables.events converts to µs).
  */
object Sessions {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // pandas-semantics: invalid casts coerce to null (`errors='coerce'`),
      // no runtime errors mid-pipeline (Spark 4 defaults ANSI on)
      .config("spark.sql.ansi.enabled", "false")
      // bucketed-table writes (q_join_bucketed) land in tmp, not the repo cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "4194304")
      .config("spark.sql.windowExec.buffer.spill.threshold", "2147483647")
      .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "4194304")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "2147483647")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // engine-native functions available to expr()/SQL in every session
    graft.functions.DecimalDot.register(s)
    s
  }
}
