package graft.util

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Portable natural log of a positive expression (null in, null out),
    * appended to `df` as column `out`.
    *
    * Staged as named projections, NOT one nested Column: inlined, each
    * recipe step duplicates its operands' subtrees (u copies t twice,
    * every Horner step copies u, m copies m0 three times…) — a ~300×
    * expression blow-up that compiled for ~50 s and shipped MB-scale task
    * binaries when first written that way. As attribute-referencing
    * projection steps the tree is linear; CollapseProject keeps
    * multiply-referenced non-trivial aliases staged rather than
    * re-inlining them. */
  def pln(df: DataFrame, x: Column, out: String): DataFrame = {
    val staged = df.withColumn("_lnx", x)
      .withColumn("_k0", floor(log2(col("_lnx"))).cast("double"))
      .withColumn("_m0", col("_lnx") / pow(lit(2.0), col("_k0")))
      .withColumn("_m",
        when(col("_m0") >= 2.0, col("_m0") / 2.0)
          .when(col("_m0") < 1.0, col("_m0") * 2.0)
          .otherwise(col("_m0")))
      .withColumn("_k",
        when(col("_m0") >= 2.0, col("_k0") + 1.0)
          .when(col("_m0") < 1.0, col("_k0") - 1.0)
          .otherwise(col("_k0")))
      .withColumn("_t", (col("_m") - 1.0) / (col("_m") + 1.0))
      .withColumn("_u", col("_t") * col("_t"))
    val poly = OddRecips.foldLeft(lit(1.0 / 25.0): Column)((p, c) =>
      p * col("_u") + 1.0 / c) * col("_u") + 1.0
    staged.withColumn(out, col("_k") * Ln2 + (col("_t") * 2.0) * poly)
      .drop("_lnx", "_k0", "_m0", "_m", "_k", "_t", "_u")
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
