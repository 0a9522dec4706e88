package graft.ops

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The statistical data-integrity suite (unit-tests/test_data_integrity.py)
  * as Spark jobs over snapshot pairs (SURVEY.md §5). Each check reduces
  * the data to per-key aggregates / joins and collects only verdict-sized
  * results; the t-distribution CDF (p-values) runs driver-side on
  * aggregated moments via commons-math3 (ships with Spark).
  */
object Integrity {

  /** Backfill bias (test_data_integrity.py:167-184): per-asset min(date)
    * of the new snapshot must not precede the previous snapshot's.
    * Returns offending assets. */
  def backfillBias(prev: DataFrame, cur: DataFrame,
      key: String = "canonical_id", date: String = "date"): DataFrame = {
    val p = prev.groupBy(key).agg(min(date).as("prev_start"))
    val c = cur.groupBy(key).agg(min(date).as("cur_start"))
    c.join(p, key).filter(col("cur_start") < col("prev_start"))
  }

  /** Price integrity (test_data_integrity.py:186-203): count of OHLC
    * violations must be zero. */
  def ohlcViolations(df: DataFrame, tol: Double = 1e-6): Long =
    df.filter(col("close") < col("low") - tol || col("close") > col("high") + tol).count()

  /** Historical immutability / repainting (test_data_integrity.py:299-315):
    * common (asset, date) cells whose value drifted more than tol. */
  def repaintedCells(prev: DataFrame, cur: DataFrame, valueCol: String,
      keys: Seq[String] = Seq("canonical_id", "date"),
      tol: Double = 1e-9): DataFrame = {
    val p = prev.select((keys.map(col) :+ col(valueCol).as("prev_value")): _*)
    val c = cur.select((keys.map(col) :+ col(valueCol).as("cur_value")): _*)
    c.join(p, keys).filter(abs(col("cur_value") - col("prev_value")) > tol)
  }

  final case class Welch(t: Double, df: Double, p: Double)

  /** Welch t-test p-value from per-population moments (helper for
    * precision-stability and error-predictability checks,
    * test_data_integrity.py:77-94,229-264). */
  def welch(n1: Long, m1: Double, v1: Double, n2: Long, m2: Double, v2: Double): Welch = {
    val se1 = v1 / n1.toDouble
    val se2 = v2 / n2.toDouble
    val t = (m1 - m2) / math.sqrt(se1 + se2)
    val dof = ((se1 + se2) * (se1 + se2)) /
      (((se1 * se1) / (n1 - 1.0)) + ((se2 * se2) / (n2 - 1.0)))
    val p = 2.0 * (1.0 - new TDistribution(dof).cumulativeProbability(math.abs(t)))
    Welch(t, dof, p)
  }

  /** Decimal-length of a numeric value's string form (pandas
    * `.astype(str).str.split('.').str[1].str.len()`,
    * test_data_integrity.py:86). */
  def decimalLen(value: Column): Column = coalesce(
    length(element_at(split(value.cast("string"), "\\."), 2)), lit(0)).cast("double")

  /** Precision stability (test_data_integrity.py:205-227): per-asset Welch
    * t-test on decimal-length of first vs second half of the sorted
    * series; returns a DataFrame (k, t, dof, p) of assets with p < alpha.
    * Fully distributed (r4): decimal lengths, halves and moments aggregate
    * per key, then the Welch statistic AND its t-CDF p-value evaluate on
    * the executors (one commons-math3 call per moments row inside a typed
    * flatMap) — nothing reaches the driver, so the same check runs over a
    * 10⁷-key corpus-quality variant unchanged. `welch()` remains the
    * scalar path for verdict-sized callers (errorPredictability). */
  def precisionBreaks(df: DataFrame, key: String, date: String, value: Column,
      alpha: Double = 0.001, minSamples: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(date))
    val half = df
      .withColumn("dl", decimalLen(value))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(key)))
      .withColumn("second", col("rn") > col("n") / 2)
    val moments = half.groupBy(col(key).cast("string").as("k"), col("second"))
      .agg(count(lit(1)).as("n"), avg("dl").as("m"), var_samp("dl").as("v"))
      .groupBy("k").pivot("second", Seq(false, true))
      .agg(first("n").as("n"), first("m").as("m"), first("v").as("v"))
    val spark = df.sparkSession
    import spark.implicits._
    moments.flatMap { r =>
      def d(f: String): Double =
        if (r.isNullAt(r.fieldIndex(f))) Double.NaN else r.getAs[Double](f)
      def n(f: String): Long =
        if (r.isNullAt(r.fieldIndex(f))) 0L else r.getAs[Long](f)
      val (n1, m1, v1) = (n("false_n"), d("false_m"), d("false_v"))
      val (n2, m2, v2) = (n("true_n"), d("true_m"), d("true_v"))
      if (n1 + n2 < minSamples || n1 < 2 || n2 < 2 || (v1 == 0.0 && v2 == 0.0) ||
          Seq(m1, v1, m2, v2).exists(_.isNaN)) None
      else {
        val res = welch(n1, m1, v1, n2, m2, v2)
        if (res.p < alpha) Some((r.getAs[String]("k"), res.t, res.df, res.p)) else None
      }
    }.toDF("k", "t", "dof", "p")
  }

  /** Publication-lag compliance (test_data_integrity.py:266-297): stored
    * factor must equal a strict point-in-time recomputation with lagged
    * fundamentals; returns dates where |stored - pit| > tol. */
  def publicationLagViolations(stored: DataFrame, recomputed: DataFrame,
      date: String, storedCol: String, pitCol: String, tol: Double = 1e-9): DataFrame =
    stored.join(recomputed, date)
      .filter(abs(col(storedCol) - col(pitCol)) > tol)

  /** Error predictability ("trade the bug", test_data_integrity.py:229-264):
    * annualized Sharpe of flagged rows' forward returns; flags are
    * predictive when |t| significant AND sharpe > threshold. Returns None
    * when either population has < 2 samples or a null moment — welch()
    * would otherwise divide by zero / throw on a NaN dof (same guard
    * discipline as precisionBreaks). */
  def errorPredictability(df: DataFrame, flag: Column, fwdRet: Column): Option[(Welch, Double)] = {
    val m = df.agg(
      count(when(flag, fwdRet)).as("n1"), avg(when(flag, fwdRet)).as("m1"),
      var_samp(when(flag, fwdRet)).as("v1"),
      count(when(!flag, fwdRet)).as("n2"), avg(when(!flag, fwdRet)).as("m2"),
      var_samp(when(!flag, fwdRet)).as("v2"),
      stddev_samp(when(flag, fwdRet)).as("sd1")).head()
    val (n1, n2) = (m.getAs[Long]("n1"), m.getAs[Long]("n2"))
    val anyNullMoment = Seq("m1", "v1", "m2", "v2").exists(c => m.isNullAt(m.fieldIndex(c)))
    // both-variances-zero makes welch's dof 0/0 (NaN) — same guard as
    // precisionBreaks
    if (n1 < 2 || n2 < 2 || anyNullMoment ||
        (m.getAs[Double]("v1") == 0.0 && m.getAs[Double]("v2") == 0.0)) None
    else {
      val res = welch(n1, m.getAs[Double]("m1"), m.getAs[Double]("v1"),
        n2, m.getAs[Double]("m2"), m.getAs[Double]("v2"))
      val sd = m.getAs[Double]("sd1")
      val sharpe = if (sd > 0) m.getAs[Double]("m1") / sd * math.sqrt(365.0) else 0.0
      Some((res, sharpe))
    }
  }
}
