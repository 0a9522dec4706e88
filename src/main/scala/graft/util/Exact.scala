package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-insensitive, bit-reproducible floating aggregates.
  *
  * A plain `sum(double)` accumulates in partition order, so a Spark result
  * and a single-threaded oracle (DuckDB) differ in the last ulps — and any
  * hash-based comparison fails. Casting each addend to a fixed-scale
  * decimal makes the sum EXACT (associative, order-free); casting the exact
  * decimal back to double is correctly rounded, so every engine that
  * follows the same recipe produces the identical 64-bit value.
  *
  * This also matters at 100 TB: decimal partial aggregation keeps map-side
  * combine (partial sums are exact, merge order irrelevant), so results are
  * stable across retries, speculative tasks and AQE re-plans — pandas-level
  * reproducibility (reference sums single-threaded, e.g.
  * historical_data_etl.py:76) without giving up distributed aggregation.
  *
  * Scale 8 with precision 38 leaves 30 integer digits — a sum of 1e18
  * values of magnitude 1e12 still fits, so no overflow at any target scale.
  */
object Exact {
  private val D = DecimalType(38, 8)

  /** Exact sum of a double column, returned as double. */
  def exactSum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact mean: exact sum / count, one correctly-rounded division. */
  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  /** Sample standard deviation (ddof=1, pandas `.std()` default) from
    * exact moments. All double ops after the exact sums are single
    * correctly-rounded IEEE operations → bit-stable across engines.
    * Returns null for n<2 (DuckDB semantics; Spark's builtin gives NaN).
    */
  def exactStddevSamp(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = exactSum(c)
    val sq = sum((c * c).cast(D)).cast("double")
    when(n > 1, sqrt(greatest(lit(0.0), (sq - s * s / n) / (n - lit(1.0)))))
  }

  /** Population standard deviation (ddof=0; TA-Lib BBANDS semantics). */
  def exactStddevPop(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = exactSum(c)
    val sq = sum((c * c).cast(D)).cast("double")
    when(n > 0, sqrt(greatest(lit(0.0), (sq - s * s / n) / n)))
  }

  /** Sample variance from exact moments. */
  def exactVarSamp(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = exactSum(c)
    val sq = sum((c * c).cast(D)).cast("double")
    when(n > 1, greatest(lit(0.0), (sq - s * s / n) / (n - lit(1.0))))
  }

  /** DuckDB SQL fragments implementing the identical recipes, for the
    * oracle side of the driver's correctness gate.
    */
  object Sql {
    def sum(c: String): String = s"CAST(SUM(CAST(($c) AS DECIMAL(38,8))) AS DOUBLE)"
    def avg(c: String): String = s"(${sum(c)} / COUNT($c))"
    private def mom(c: String) =
      (s"COUNT($c)", sum(c), s"CAST(SUM(CAST((($c)*($c)) AS DECIMAL(38,8))) AS DOUBLE)")
    def stddevSamp(c: String): String = {
      val (n, s, sq) = mom(c)
      s"(CASE WHEN $n > 1 THEN sqrt(greatest(0.0, ($sq - $s*$s/$n) / ($n - 1.0))) END)"
    }
    def stddevPop(c: String): String = {
      val (n, s, sq) = mom(c)
      s"(CASE WHEN $n > 0 THEN sqrt(greatest(0.0, ($sq - $s*$s/$n) / $n)) END)"
    }
    def varSamp(c: String): String = {
      val (n, s, sq) = mom(c)
      s"(CASE WHEN $n > 1 THEN greatest(0.0, ($sq - $s*$s/$n) / ($n - 1.0)) END)"
    }
  }
}
