package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The data-quality gate (data_quality_gate.py): schema validation →
  * precision standardization → OHLC integrity filter → circuit breaker,
  * in that fail-fast order (SURVEY.md §4 #9).
  *
  * Scale notes: the filter + both counts run in ONE pass over the data
  * (the removed count is total - kept, both computed from the same cached
  * scan or a single aggregation); nothing is collected except two longs.
  */
object Cleanse {

  final case class GateResult(cleaned: DataFrame, initial: Long, removed: Long) {
    def lossPct: Double =
      if (initial == 0) 0.0 else (removed.toDouble / initial.toDouble) * 100.0
  }

  final class CircuitBreakerTripped(msg: String) extends RuntimeException(msg)

  /** Schema validation: required minus actual, fail-fast
    * (data_quality_gate.py:32-36). */
  def validateSchema(df: DataFrame, required: Set[String]): Set[String] =
    required -- df.columns.toSet

  def requireSchema(df: DataFrame, required: Set[String]): Unit = {
    val missing = validateSchema(df, required)
    require(missing.isEmpty, s"schema validation failed; missing: ${missing.mkString(", ")}")
  }

  /** Precision standardization: half-up round of the price columns to
    * `decimals` places (data_quality_gate.py:38-44; bit-reproducible
    * recipe, see q_round_precision). */
  def standardizePrecision(df: DataFrame, cols: Seq[String], decimals: Int): DataFrame = {
    val scale = math.pow(10.0, decimals)
    cols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, floor(col(c) * scale + lit(0.5)) / scale)
    }
  }

  /** OHLC integrity filter: drop rows whose close is outside
    * [low - tol, high + tol]; report the removed count
    * (data_quality_gate.py:46-61). */
  def filterOhlc(df: DataFrame, tol: Double = 1e-6): GateResult = {
    // pandas NaN semantics: a comparison against NaN is False, so rows with
    // null close/low/high are NOT violations and must be KEPT. Spark's
    // three-valued logic would make `keep` null (→ dropped + counted as
    // removed) without the coalesce, spuriously tripping the breaker on
    // sparse data.
    val keep = coalesce(
      !(col("close") < col("low") - tol || col("close") > col("high") + tol),
      lit(true))
    // one aggregation pass for both counts, then the lazily-planned filter
    val row = df.agg(count(lit(1)).as("n"),
      count(when(keep, 1)).as("kept")).head()
    val initial = row.getLong(0)
    val removed = initial - row.getLong(1)
    GateResult(df.filter(keep), initial, removed)
  }

  /** Circuit breaker: abort the pipeline when the gate removes more than
    * `maxLossPct` of rows (data_quality_gate.py:29-30,101-110 —
    * `sys.exit(1)` becomes an exception the driver fails the job with). */
  def circuitBreaker(result: GateResult, maxLossPct: Double = 5.0): GateResult = {
    if (result.lossPct > maxLossPct)
      throw new CircuitBreakerTripped(
        f"quality gate removed ${result.lossPct}%.2f%% > $maxLossPct%% of rows " +
          s"(${result.removed}/${result.initial})")
    result
  }

  /** The full gate, fail-fast order as in the reference. */
  def gate(df: DataFrame, required: Set[String],
      priceCols: Seq[String] = Seq("open", "high", "low", "close"),
      decimals: Int = 16, tol: Double = 1e-6, maxLossPct: Double = 5.0): GateResult = {
    requireSchema(df, required)
    val std = standardizePrecision(df, priceCols, decimals)
    circuitBreaker(filterOhlc(std, tol), maxLossPct)
  }
}
