package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable transcendental functions.
  *
  * Why: `java.lang.Math.log` (JVM intrinsic / fdlibm) and libm `ln`
  * (DuckDB, and whatever a future engine links) agree on MOST doubles but
  * not all — measured 1-ulp disagreements on this host on ratios arising
  * in TF-IDF/BM25/PMI scores. A score computed with an engine-native log
  * is therefore not reproducible across engines, which breaks both the
  * bit-exact oracle gate here and, at 100 TB, the property that a corpus
  * scored on Spark can be incrementally re-scored or audited on another
  * engine without drift.
  *
  * `pln` (portable ln) uses ONLY operations the IEEE-754 standard requires
  * to be correctly rounded (+, −, ×, ÷) plus `floor`, `log2` (used ONLY to
  * seed an integer exponent guess, corrected exactly below, so its rounding
  * never matters) and `pow(2, k)` with integer k (exact powers of two) —
  * applied in one fixed written order. Any two IEEE engines evaluating this
  * recipe produce bit-identical results.
  *
  * Algorithm: decompose x = m·2^k with m ∈ [1, 2) (the floor(log2) guess is
  * off by at most 1 and is canonicalized by one exact ×2 / ÷2 fix-up), then
  * ln(m) = 2t·(1 + u/3 + u²/5 + … + u¹²/25) with t = (m−1)/(m+1), u = t²
  * (|t| ≤ 1/3, truncation ≤ ~1e-13), and ln(x) = k·LN2 + ln(m).
  * Absolute accuracy ~1e-13 on the score domains — a ranking score, not a
  * numerics library. PortableLnSpec pins the accuracy envelope.
  */
object Portable {

  /** The double literal closest to ln 2 — written identically here and in
    * [[plnSqlCtes]] so both engines fold the same bits. */
  val Ln2 = 0.6931471805599453

  private val OddRecips = Seq(23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)

  /** Portable natural log of a positive column (null in, null out). */
  def pln(x: Column): Column = {
    val k0 = floor(log2(x)).cast("double")
    val m0 = x / pow(lit(2.0), k0)
    val m = when(m0 >= 2.0, m0 / 2.0).when(m0 < 1.0, m0 * 2.0).otherwise(m0)
    val k = when(m0 >= 2.0, k0 + 1.0).when(m0 < 1.0, k0 - 1.0).otherwise(k0)
    val t = (m - 1.0) / (m + 1.0)
    val u = t * t
    val poly = OddRecips.foldLeft(lit(1.0 / 25.0): Column)((p, c) => p * u + 1.0 / c) * u + 1.0
    k * Ln2 + (t * 2.0) * poly
  }

  /** The same recipe as chained DuckDB CTEs: reads column `_lnx` from CTE
    * `src`, emits CTE `out` = `src` plus column `_pln`. Op order mirrors
    * [[pln]] token for token. */
  def plnSqlCtes(src: String, out: String): String = {
    val poly = OddRecips.foldLeft("(1.0 / 25.0)")((p, c) => s"($p * _u + 1.0 / $c.0)") + " * _u + 1.0"
    s"${out}_a AS (SELECT *, CAST(floor(log2(_lnx)) AS DOUBLE) AS _k0 FROM $src), " +
      s"${out}_b AS (SELECT *, _lnx / pow(2.0, _k0) AS _m0 FROM ${out}_a), " +
      s"${out}_c AS (SELECT *, " +
      "CASE WHEN _m0 >= 2.0 THEN _m0 / 2.0 WHEN _m0 < 1.0 THEN _m0 * 2.0 ELSE _m0 END AS _m, " +
      s"CASE WHEN _m0 >= 2.0 THEN _k0 + 1.0 WHEN _m0 < 1.0 THEN _k0 - 1.0 ELSE _k0 END AS _k FROM ${out}_b), " +
      s"${out}_d AS (SELECT *, (_m - 1.0) / (_m + 1.0) AS _t FROM ${out}_c), " +
      s"${out}_e AS (SELECT *, _t * _t AS _u FROM ${out}_d), " +
      s"$out AS (SELECT *, _k * $Ln2 + (_t * 2.0) * ($poly) AS _pln FROM ${out}_e)"
  }
}
