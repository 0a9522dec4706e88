package graft.ops

import graft.util.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The typed-Dataset escape hatch (SURVEY.md §2.6/§2.11): recursive
  * indicators (Wilder RSI, MACD EMAs, ATR) are sequential per-asset folds
  * that no frame window can express. `groupByKey.flatMapGroups` keeps the
  * computation distributed — one shuffle on the asset key, then a pure
  * in-memory fold per group.
  *
  * Scale: group size is bounded by an asset's history length (~10³ rows
  * for daily data), never by dataset size, so per-group sort+fold is O(h
  * log h) with tiny constant memory even at 100 TB total. Skewed assets
  * don't exist for time series (history length is uniform); if they did,
  * the fold is still single-pass.
  *
  * Determinism: rows sort by (shipdate, unique ordinal) inside the group;
  * every arithmetic step is a fixed IEEE sequence, so results are
  * bit-identical across partitionings, retries, and engines (the DuckDB
  * oracle replays the same recurrence via recursive CTE).
  *
  * EMA seeding convention: first observation seeds the EMA (pandas
  * `ewm(adjust=False)`); Wilder averages seed with the first gain/loss.
  * (TA-Lib seeds with an SMA warm-up instead — documented deviation; the
  * reference's exact numbers are TA-Lib's, its operator class is
  * "recursively smoothed indicator", which is what we replicate.)
  */
object Recursive {

  case class In(key: Long, secs: Long, ord: Long, close: Double, high: Double, low: Double)
  case class RsiRow(key: Long, rn: Long, close: Double, rsi: Option[Double])
  case class MacdRow(key: Long, rn: Long, close: Double, ema12: Double, ema26: Double,
      macd: Double, macd_sig: Double, macd_hist: Double)
  case class AtrRow(key: Long, rn: Long, tr: Double, atr: Double)

  /** Per-asset OHLC-ish series from lineitem (FIXTURES.md role mapping):
    * close = price, high/low synthesized from tax/discount. */
  def series(s: SparkSession, d: String): Dataset[In] = {
    import s.implicits._
    Tables.lineitem(s, d).select(
      col("l_partkey").as("key"),
      col("l_shipdate").cast("timestamp").cast("long").as("secs"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("ord"),
      col("l_extendedprice").as("close"),
      (col("l_extendedprice") * (lit(1.0) + col("l_tax"))).as("high"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("low")
    ).as[In]
  }

  private def sorted(it: Iterator[In]): Array[In] =
    it.toArray.sortBy(r => (r.secs, r.ord))

  /** RSI(14), Wilder smoothing: avg_t = (avg_{t-1}*13 + x_t)/14. */
  def rsi(s: SparkSession, d: String): Dataset[RsiRow] = {
    import s.implicits._
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var avgGain, avgLoss = 0.0
      var seeded = false
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) RsiRow(k, 1, r.close, None)
        else {
          val prev = rows(i - 1).close
          val gain = math.max(r.close - prev, 0.0)
          val loss = math.max(prev - r.close, 0.0)
          if (!seeded) { avgGain = gain; avgLoss = loss; seeded = true }
          else {
            avgGain = (avgGain * 13.0 + gain) / 14.0
            avgLoss = (avgLoss * 13.0 + loss) / 14.0
          }
          val v = if (avgLoss == 0.0) 100.0
                  else 100.0 - (100.0 / (1.0 + (avgGain / avgLoss)))
          RsiRow(k, i + 1, r.close, Some(v))
        }
      }
    }
  }

  /** MACD(12,26,9): fast/slow EMAs, signal EMA of the difference. */
  def macd(s: SparkSession, d: String): Dataset[MacdRow] = {
    import s.implicits._
    val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0; val a9 = 2.0 / 10.0
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var e12, e26, sig = 0.0
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) {
          e12 = r.close; e26 = r.close; sig = 0.0
          MacdRow(k, 1, r.close, e12, e26, 0.0, 0.0, 0.0)
        } else {
          e12 = (a12 * r.close) + ((1.0 - a12) * e12)
          e26 = (a26 * r.close) + ((1.0 - a26) * e26)
          val m = e12 - e26
          sig = (a9 * m) + ((1.0 - a9) * sig)
          MacdRow(k, i + 1, r.close, e12, e26, m, sig, m - sig)
        }
      }
    }
  }

  case class MomentumRow(k: String, secs: Long, rsi_14: Option[Double],
      macd: Double, macd_sig: Double, macd_hist: Double, atr_14: Double)

  /** All recursive Gold indicators — RSI(14), MACD(12,26,9), ATR(14) — in
    * ONE fold over any frame carrying (key, date, close, high, low): one
    * shuffle on the asset key, one sort per bounded group, every
    * recurrence advanced in the same pass (create_momentum_features /
    * create_volatility_features, feature_calculation_functions.py:44-93,
    * which make three separate groupby-apply passes; here the group's rows
    * are already in hand, so the extra passes would buy nothing). Joined
    * back on (key, secs) by Features.goldFeatures.
    *
    * Determinism: group rows sort by (secs, tiebreak-as-string) — like
    * `sorted()` above, a UNIQUE tiebreak makes the fold order (and every
    * recursive output) independent of partitioning even when a key carries
    * duplicate timestamps. Tiebreak order is the string order of the
    * rendered column — any deterministic total order works, it only has
    * to be stable. A null tiebreak renders as '' (sorting first), so the
    * fold never NPEs on a nullable column; note this string order can
    * differ from Features.assetWindow's native-type orderBy for NUMERIC
    * tiebreaks under duplicate timestamps ("2" > "10" as strings) — pass a
    * zero-padded rendering if the two must agree on such keys. */
  def momentum(df: org.apache.spark.sql.DataFrame, key: String, date: String,
      close: String, high: String, low: String,
      tiebreak: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(key).cast("string").as("_k"),
        col(date).cast("timestamp").cast("long").as("_secs"),
        col(close).cast("double").as("_c"),
        col(high).cast("double").as("_h"),
        col(low).cast("double").as("_l"),
        coalesce(tiebreak.cast("string"), lit("")).as("_tb"))
      .as[(String, Long, Double, Double, Double, String)]
    src.groupByKey(_._1).flatMapGroups { (k, it) =>
      val rows = it.toArray.sortBy(r => (r._2, r._6))
      val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0; val a9 = 2.0 / 10.0
      var avgGain, avgLoss = 0.0
      var seeded = false
      var e12, e26, sig, atr = 0.0
      rows.iterator.zipWithIndex.map { case (r, i) =>
        val (_, secs, c, h, l, _) = r
        if (i == 0) {
          e12 = c; e26 = c; sig = 0.0; atr = h - l
          MomentumRow(k, secs, None, 0.0, 0.0, 0.0, atr)
        } else {
          val prev = rows(i - 1)._3
          val gain = math.max(c - prev, 0.0)
          val loss = math.max(prev - c, 0.0)
          if (!seeded) { avgGain = gain; avgLoss = loss; seeded = true }
          else {
            avgGain = (avgGain * 13.0 + gain) / 14.0
            avgLoss = (avgLoss * 13.0 + loss) / 14.0
          }
          val rsi = if (avgLoss == 0.0) 100.0
                    else 100.0 - (100.0 / (1.0 + (avgGain / avgLoss)))
          e12 = (a12 * c) + ((1.0 - a12) * e12)
          e26 = (a26 * c) + ((1.0 - a26) * e26)
          val m = e12 - e26
          sig = (a9 * m) + ((1.0 - a9) * sig)
          val pc = prev
          val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
          atr = (atr * 13.0 + tr) / 14.0
          MomentumRow(k, secs, Some(rsi), m, sig, m - sig, atr)
        }
      }
    }.toDF("_k", "_secs", "rsi_14", "macd", "macd_sig", "macd_hist", "atr_14")
  }

  /** ATR(14): true range Wilder-smoothed. */
  def atr(s: SparkSession, d: String): Dataset[AtrRow] = {
    import s.implicits._
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var a = 0.0
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) {
          val tr = r.high - r.low
          a = tr
          AtrRow(k, 1, tr, a)
        } else {
          val pc = rows(i - 1).close
          val tr = math.max(r.high - r.low,
            math.max(math.abs(r.high - pc), math.abs(r.low - pc)))
          a = (a * 13.0 + tr) / 14.0
          AtrRow(k, i + 1, tr, a)
        }
      }
    }
  }

  case class KeltnerRow(key: Long, rn: Long, ema: Double, atr: Double,
      upper_band: Double, lower_band: Double)

  /** Keltner channels (r12): EMA(20) midline ± 2·ATR(10) bands — the two
    * registered recursions composed in ONE fold (EMA seeding and Wilder
    * ATR seeding conventions unchanged from macd/atr above), because the
    * group's rows are already in hand — a second pass would buy nothing.
    * Oracle replays both recurrences in one recursive CTE. */
  def keltner(s: SparkSession, d: String): Dataset[KeltnerRow] = {
    import s.implicits._
    val a = 2.0 / 21.0
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var ema, atrV = 0.0
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) { ema = r.close; atrV = r.high - r.low }
        else {
          ema = (a * r.close) + ((1.0 - a) * ema)
          val pc = rows(i - 1).close
          val tr = math.max(r.high - r.low,
            math.max(math.abs(r.high - pc), math.abs(r.low - pc)))
          atrV = ((atrV * 9.0) + tr) / 10.0
        }
        KeltnerRow(k, i + 1, ema, atrV, ema + 2.0 * atrV, ema - 2.0 * atrV)
      }
    }
  }

  case class EwmaRow(key: Long, rn: Long, ret: Option[Double],
      ewma_var: Option[Double], ewma_vol: Option[Double])

  /** RiskMetrics EWMA volatility (r12): v_t = λ·v_{t−1} + (1−λ)·r_t² with
    * λ = 0.94 over simple returns r_t = close_t/close_{t−1} − 1; the first
    * return seeds v (the same first-observation-seeds convention as the
    * EMAs above). Published per row: the return, the EWMA variance and
    * its square root — every step one fixed IEEE op sequence, replayed by
    * the oracle's recursive CTE op-for-op. */
  def ewmaVol(s: SparkSession, d: String): Dataset[EwmaRow] = {
    import s.implicits._
    val lam = 0.94
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var v = 0.0
      var seeded = false
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) EwmaRow(k, 1, None, None, None)
        else {
          val ret = r.close / rows(i - 1).close - 1.0
          if (!seeded) { v = ret * ret; seeded = true }
          else v = (lam * v) + ((1.0 - lam) * (ret * ret))
          EwmaRow(k, i + 1, Some(ret), Some(v), Some(math.sqrt(v)))
        }
      }
    }
  }

  case class AdxRow(key: Long, rn: Long, pdi: Option[Double], mdi: Option[Double],
      dx: Option[Double], adx: Option[Double])

  /** ADX(14), Wilder (r12): THREE chained recursions in one fold —
    * smoothed true range, smoothed ±directional movement (the ATR/Wilder
    * (prev·13 + x)/14 convention, seeded str = high−low / sDM = 0 at the
    * first row), then +DI/−DI = 100·sDM/sTR, DX = 100·|ΔDI|/(ΣDI) (0 when
    * both DI are 0 — no movement), and the ADX itself as a Wilder
    * smoothing OF DX (first computed DX seeds it). The first row
    * publishes NULLs (directional movement needs a prior bar). Every
    * step is one fixed IEEE op sequence; the oracle replays the full
    * three-recursion chain in one recursive CTE. */
  def adx(s: SparkSession, d: String): Dataset[AdxRow] = {
    import s.implicits._
    series(s, d).groupByKey(_.key).flatMapGroups { (k, it) =>
      val rows = sorted(it)
      var strV, spdm, smdm, adxV = 0.0
      var adxSeeded = false
      rows.iterator.zipWithIndex.map { case (r, i) =>
        if (i == 0) {
          strV = r.high - r.low; spdm = 0.0; smdm = 0.0
          AdxRow(k, 1, None, None, None, None)
        } else {
          val p = rows(i - 1)
          val tr = math.max(r.high - r.low,
            math.max(math.abs(r.high - p.close), math.abs(r.low - p.close)))
          strV = ((strV * 13.0) + tr) / 14.0
          val up = r.high - p.high
          val dn = p.low - r.low
          spdm = ((spdm * 13.0) + (if (up > dn && up > 0.0) up else 0.0)) / 14.0
          smdm = ((smdm * 13.0) + (if (dn > up && dn > 0.0) dn else 0.0)) / 14.0
          // written EXACTLY as the oracle: DI referenced as the full
          // 100·(s/str) subexpression everywhere, so the bits agree
          val dx =
            if (strV > 0.0 && (100.0 * (spdm / strV) + 100.0 * (smdm / strV)) > 0.0)
              100.0 * math.abs(100.0 * (spdm / strV) - 100.0 * (smdm / strV)) /
                (100.0 * (spdm / strV) + 100.0 * (smdm / strV))
            else 0.0
          if (!adxSeeded) { adxV = dx; adxSeeded = true }
          else adxV = ((adxV * 13.0) + dx) / 14.0
          val pdi = if (strV > 0.0) Some(100.0 * (spdm / strV)) else None
          val mdi = if (strV > 0.0) Some(100.0 * (smdm / strV)) else None
          AdxRow(k, i + 1, pdi, mdi, Some(dx), Some(adxV))
        }
      }
    }
  }
}
