package graft.queries

import graft.Q
import graft.ops.Recursive

/** SURVEY.md §2.6 recursive indicators. The Spark side is the
  * flatMapGroups fold (ops.Recursive); the oracle replays the identical
  * recurrence as a DuckDB recursive CTE — same IEEE op sequence, so the
  * hash comparison is bit-exact with no tolerance.
  */
object RecursiveQueries {


  private val rowsCte =
    "WITH RECURSIVE rows AS MATERIALIZED (" +
      "SELECT l_partkey AS key, " +
      "row_number() OVER (PARTITION BY l_partkey ORDER BY l_shipdate, (l_orderkey*8+l_linenumber)) AS rn, " +
      "l_extendedprice AS close, " +
      "l_extendedprice * (1.0 + l_tax) AS high, " +
      "l_extendedprice * (1.0 - l_discount) AS low FROM lineitem), "

  /** RSI(14), Wilder smoothing (feature_calculation_functions.py:48-51). */
  val rsi = Q("q_rsi", "Wilder RSI(14) via sequential fold")(
    rowsCte +
      "r AS (SELECT key, rn, close, CAST(NULL AS DOUBLE) AS avg_gain, CAST(NULL AS DOUBLE) AS avg_loss " +
      "FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT n.key, n.rn, n.close, " +
      "CASE WHEN r.avg_gain IS NULL THEN greatest(n.close - r.close, 0.0) " +
      "ELSE (r.avg_gain * 13.0 + greatest(n.close - r.close, 0.0)) / 14.0 END, " +
      "CASE WHEN r.avg_loss IS NULL THEN greatest(r.close - n.close, 0.0) " +
      "ELSE (r.avg_loss * 13.0 + greatest(r.close - n.close, 0.0)) / 14.0 END " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) " +
      "SELECT key, rn, close, " +
      "CASE WHEN avg_loss IS NULL THEN NULL WHEN avg_loss = 0.0 THEN 100.0 " +
      "ELSE 100.0 - (100.0 / (1.0 + (avg_gain / avg_loss))) END AS rsi FROM r") {
    (s, d) => Recursive.rsi(s, d).toDF()
  }

  /** MACD(12,26,9) (feature_calculation_functions.py:53-60). */
  val macd = Q("q_macd", "MACD via recursive EMAs")(
    rowsCte +
      "r AS (SELECT key, rn, close, close AS ema12, close AS ema26, " +
      "CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS macd_sig, " +
      "CAST(0.0 AS DOUBLE) AS macd_hist FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT key, rn, close, ema12, ema26, macd, macd_sig, macd - macd_sig AS macd_hist FROM (" +
      "SELECT t.key, t.rn, t.close, t.ema12, t.ema26, (t.ema12 - t.ema26) AS macd, " +
      "(((2.0 / 10.0) * (t.ema12 - t.ema26)) + ((1.0 - (2.0 / 10.0)) * t.prev_sig)) AS macd_sig " +
      "FROM (SELECT n.key, n.rn, n.close, " +
      "(((2.0 / 13.0) * n.close) + ((1.0 - (2.0 / 13.0)) * r.ema12)) AS ema12, " +
      "(((2.0 / 27.0) * n.close) + ((1.0 - (2.0 / 27.0)) * r.ema26)) AS ema26, " +
      "r.macd_sig AS prev_sig " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) t) u) " +
      "SELECT key, rn, close, ema12, ema26, macd, macd_sig, macd_hist FROM r") {
    (s, d) => Recursive.macd(s, d).toDF()
  }

  /** ATR(14): Wilder-smoothed true range
    * (feature_calculation_functions.py:86-92). */
  val atr = Q("q_atr", "ATR(14) via sequential fold")(
    rowsCte +
      "r AS (SELECT key, rn, close, (high - low) AS tr, (high - low) AS atr FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT key, rn, close, tr, ((prev_atr * 13.0) + tr) / 14.0 AS atr FROM (" +
      "SELECT n.key, n.rn, n.close, " +
      "greatest(n.high - n.low, greatest(abs(n.high - r.close), abs(n.low - r.close))) AS tr, " +
      "r.atr AS prev_atr " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) t) " +
      "SELECT key, rn, tr, atr FROM r") {
    (s, d) => Recursive.atr(s, d).toDF().select("key", "rn", "tr", "atr")
  }

  /** RiskMetrics EWMA volatility, λ=0.94 (r12) — the recursive variance
    * the rolling-window stddev (q_win_roll_vol) can't express: each step
    * folds the new squared return into the running variance, so recent
    * shocks dominate and the estimate never forgets discontinuously the
    * way a fixed window does. Same flatMapGroups fold layout as RSI/ATR
    * (one shuffle on the asset key, bounded per-group history), oracle
    * replayed as a recursive CTE with the identical IEEE op sequence. */
  val ewmaVol = Q("q_ewma_vol", "RiskMetrics EWMA variance/volatility via sequential fold")(
    rowsCte +
      "r AS (SELECT key, rn, close, CAST(NULL AS DOUBLE) AS ret, " +
      "CAST(NULL AS DOUBLE) AS ewma_var FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT n.key, n.rn, n.close, (n.close / r.close - 1.0) AS ret, " +
      "CASE WHEN r.ewma_var IS NULL THEN " +
      "(n.close / r.close - 1.0) * (n.close / r.close - 1.0) " +
      // CAST: DuckDB parses bare 0.94 as DECIMAL, making (1.0 - 0.94) an
      // EXACT 0.06 — the JVM's double subtraction gives 0.06000000000000005.
      // Forcing DOUBLE reproduces the identical IEEE sequence.
      "ELSE (0.94 * r.ewma_var) + ((1.0 - CAST(0.94 AS DOUBLE)) * " +
      "((n.close / r.close - 1.0) * (n.close / r.close - 1.0))) END " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) " +
      "SELECT key, rn, ret, ewma_var, " +
      "CASE WHEN ewma_var IS NOT NULL THEN sqrt(ewma_var) END AS ewma_vol FROM r") {
    (s, d) => Recursive.ewmaVol(s, d).toDF().select("key", "rn", "ret", "ewma_var", "ewma_vol")
  }

  /** Keltner channels (r12): EMA(20) midline ± 2·ATR(10) — the two
    * registered recursions composed in one fold (ops.Recursive.keltner);
    * the oracle advances BOTH recurrences in one recursive CTE with the
    * identical IEEE op sequence (the MACD/ATR literal conventions:
    * divisions of decimal literals are double in both engines). */
  val keltner = Q("q_keltner", "Keltner channels: EMA(20) +- 2*ATR(10) via one fold")(
    rowsCte +
      "r AS (SELECT key, rn, close, high, low, close AS ema, (high - low) AS atr " +
      "FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT n.key, n.rn, n.close, n.high, n.low, " +
      "((2.0 / 21.0) * n.close) + ((1.0 - (2.0 / 21.0)) * r.ema) AS ema, " +
      "((r.atr * 9.0) + greatest(n.high - n.low, " +
      "greatest(abs(n.high - r.close), abs(n.low - r.close)))) / 10.0 AS atr " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) " +
      "SELECT key, rn, ema, atr, ema + 2.0 * atr AS upper_band, " +
      "ema - 2.0 * atr AS lower_band FROM r") {
    (s, d) => Recursive.keltner(s, d).toDF()
      .select("key", "rn", "ema", "atr", "upper_band", "lower_band")
  }

  /** ADX(14) (r12) — Wilder's average directional index, the classic
    * trend-STRENGTH gauge over the same synthesized bars: three chained
    * recursions (smoothed TR, smoothed ±DM, then ADX as a Wilder
    * smoothing of DX) advanced in ONE flatMapGroups fold
    * (ops.Recursive.adx) — the deepest recursion composition in the
    * family (Keltner chains two). The oracle replays all three
    * recurrences in one recursive CTE with the identical IEEE op
    * sequence; DI/DX are referenced as the full 100·(s/str)
    * subexpressions in BOTH engines so every intermediate bit agrees. */
  val adxQ = Q("q_adx", "ADX(14): +DI/-DI/DX/ADX via one three-recursion fold")({
    val pdi = "100.0 * (spdm / str)"
    val mdi = "100.0 * (smdm / str)"
    val dxExpr = s"CASE WHEN str > 0.0 AND ($pdi + $mdi) > 0.0 " +
      s"THEN 100.0 * abs($pdi - $mdi) / ($pdi + $mdi) ELSE 0.0 END"
    rowsCte +
      "r AS (SELECT key, rn, close, high, low, (high - low) AS str, " +
      "CAST(0.0 AS DOUBLE) AS spdm, CAST(0.0 AS DOUBLE) AS smdm, " +
      "CAST(NULL AS DOUBLE) AS adx FROM rows WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT key, rn, close, high, low, str, spdm, smdm, " +
      "CASE WHEN prev_adx IS NULL THEN dx " +
      "ELSE ((prev_adx * 13.0) + dx) / 14.0 END AS adx FROM (" +
      s"SELECT t.*, $dxExpr AS dx FROM (" +
      "SELECT n.key, n.rn, n.close, n.high, n.low, " +
      "((r.str * 13.0) + greatest(n.high - n.low, " +
      "greatest(abs(n.high - r.close), abs(n.low - r.close)))) / 14.0 AS str, " +
      "((r.spdm * 13.0) + CASE WHEN (n.high - r.high) > (r.low - n.low) " +
      "AND (n.high - r.high) > 0.0 THEN n.high - r.high ELSE 0.0 END) / 14.0 AS spdm, " +
      "((r.smdm * 13.0) + CASE WHEN (r.low - n.low) > (n.high - r.high) " +
      "AND (r.low - n.low) > 0.0 THEN r.low - n.low ELSE 0.0 END) / 14.0 AS smdm, " +
      "r.adx AS prev_adx " +
      "FROM r JOIN rows n ON n.key = r.key AND n.rn = r.rn + 1) t) u) " +
      s"SELECT key, rn, " +
      s"CASE WHEN rn > 1 AND str > 0.0 THEN $pdi END AS pdi, " +
      s"CASE WHEN rn > 1 AND str > 0.0 THEN $mdi END AS mdi, " +
      s"CASE WHEN rn > 1 THEN $dxExpr END AS dx, adx FROM r"
  }) {
    (s, d) => Recursive.adx(s, d).toDF()
  }

  val all: Seq[Q] = Seq(rsi, macd, atr, ewmaVol, keltner, adxQ)
}
