package graft.queries

import graft.Q
import graft.util.{Exact, Portable}
import graft.util.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — ranking/analytic windows. The reference's core idiom
  * is `groupby(asset)[col].transform(...)` and daily cross-sections; here
  * each becomes one window shuffle on the partition key. Time-series
  * windows order by (shipdate, unique ordinal) so results are
  * deterministic under any physical row order — a correctness requirement
  * on a cluster, not just for the oracle.
  */
object WindowQueries {


  private val ord: Column = col("l_orderkey") * 8 + col("l_linenumber")
  private val ordSql = "(l_orderkey * 8 + l_linenumber)"

  /** pandas `rank(method='average')` (feature_calculation_functions.py:120):
    * average rank = rank() + (count_of_ties - 1)/2 — exact composite, no
    * tie-semantics compromise. */
  val winRankDaily = Q("q_win_rank_daily",
    "daily cross-sectional average-rank")(
    "SELECT o_orderkey, date_trunc('day', o_orderdate) AS date, o_totalprice, " +
      "(rank() OVER (PARTITION BY date_trunc('day', o_orderdate) ORDER BY o_totalprice DESC) " +
      "+ (count(*) OVER (PARTITION BY date_trunc('day', o_orderdate), o_totalprice) - 1) / 2.0) " +
      "AS mcap_rank FROM orders") {
    (s, d) =>
      val o = orders(s, d).withColumn("date", date_trunc("day", col("o_orderdate")))
      val wRank = Window.partitionBy("date").orderBy(col("o_totalprice").desc)
      val wTies = Window.partitionBy(col("date"), col("o_totalprice"))
      o.select(col("o_orderkey"), col("date"), col("o_totalprice"),
        (rank().over(wRank) + (count(lit(1)).over(wTies) - 1) / lit(2.0)).as("mcap_rank"))
  }

  /** Market dominance: value / daily total
    * (feature_calculation_functions.py:122-124) — exact-decimal window
    * sum so the share is bit-stable. */
  val winDominance = Q("q_win_dominance",
    "share of daily total")(
    "SELECT o_orderkey, date_trunc('day', o_orderdate) AS date, o_totalprice, " +
      "o_totalprice / " +
      Exact.Sql.winSum("o_totalprice", "(PARTITION BY date_trunc('day', o_orderdate))") +
      " AS dominance_pct FROM orders") {
    (s, d) =>
      val o = orders(s, d).withColumn("date", date_trunc("day", col("o_orderdate")))
      val w = Window.partitionBy("date")
      o.select(col("o_orderkey"), col("date"), col("o_totalprice"),
        (col("o_totalprice") / Exact.winSum(col("o_totalprice"), w)).as("dominance_pct"))
  }

  private def wAssetSql = s"(PARTITION BY l_partkey ORDER BY l_shipdate, $ordSql)"
  private def wAsset = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)

  /** Publication-lag enforcement: 1-row lag per asset
    * (test_data_integrity.py:104-105). */
  val winLag = Q("q_win_lag",
    "per-asset 1-row lag")(
    "SELECT l_partkey, l_shipdate, l_extendedprice, " +
      s"lag(l_extendedprice, 1) OVER $wAssetSql AS mcap_lag, " +
      s"lag(l_quantity, 1) OVER $wAssetSql AS tvl_lag, " +
      s"$ordSql AS ord FROM lineitem") {
    (s, d) => lineitem(s, d).select(
      col("l_partkey"), col("l_shipdate"), col("l_extendedprice"),
      lag("l_extendedprice", 1).over(wAsset).as("mcap_lag"),
      lag("l_quantity", 1).over(wAsset).as("tvl_lag"),
      ord.as("ord"))
  }

  /** Forward-looking target: next value / current - 1
    * (test_data_integrity.py:242). */
  val winLead = Q("q_win_lead",
    "per-asset 1-step future return")(
    "SELECT l_partkey, l_shipdate, " +
      s"(lead(l_extendedprice, 1) OVER $wAssetSql / l_extendedprice) - 1.0 AS fwd_ret, " +
      s"$ordSql AS ord FROM lineitem") {
    (s, d) => lineitem(s, d).select(
      col("l_partkey"), col("l_shipdate"),
      ((lead("l_extendedprice", 1).over(wAsset) / col("l_extendedprice")) - lit(1.0)).as("fwd_ret"),
      ord.as("ord"))
  }

  /** k-period returns, k ∈ {1,3,7} (`pct_change(k)`,
    * feature_calculation_functions.py:31-34). */
  val winPctChange = Q("q_win_pct_change",
    "multi-horizon percentage change")(
    "SELECT l_partkey, l_shipdate, " +
      s"(l_extendedprice / lag(l_extendedprice, 1) OVER $wAssetSql) - 1.0 AS ret_1, " +
      s"(l_extendedprice / lag(l_extendedprice, 3) OVER $wAssetSql) - 1.0 AS ret_3, " +
      s"(l_extendedprice / lag(l_extendedprice, 7) OVER $wAssetSql) - 1.0 AS ret_7, " +
      s"$ordSql AS ord FROM lineitem") {
    (s, d) =>
      def ret(k: Int) =
        ((col("l_extendedprice") / lag("l_extendedprice", k).over(wAsset)) - lit(1.0))
      lineitem(s, d).select(col("l_partkey"), col("l_shipdate"),
        ret(1).as("ret_1"), ret(3).as("ret_3"), ret(7).as("ret_7"), ord.as("ord"))
  }

  /** Month bucketing (`dt.to_period('M')`,
    * universe_generation_pipeline.py:153). */
  val monthTrunc = Q("q_month_trunc",
    "month bucketing + resample counts")(
    "SELECT date_trunc('month', l_shipdate) AS month, count(*) AS n, " +
      "sum(l_quantity) AS qty FROM lineitem GROUP BY 1") {
    (s, d) => lineitem(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
  }

  /** Quantile bucketing (`pd.qcut` / factor quintiles): ntile(5) of price
    * within each return-flag group, ordered with the unique ordinal so
    * bucket assignment is deterministic under ties — the cross-sectional
    * bucketing step of a factor pipeline (the HML build uses the same
    * shape with 2 buckets). Scale layout (r4): l_returnflag has ~3
    * values, so `ntile over partitionBy(flag)` is three whole-table
    * one-task sorts at fact scale. ops.Quantiles.exactNtile instead
    * histograms per (flag, price-bucket), broadcasts the per-bucket tile
    * map, and ranks only the rows of the 4 boundary buckets — same
    * output bit-for-bit, no data-sized sort (spec: QuantilesSpec). */
  val winNtile = Q("q_win_ntile", "deterministic quintile bucketing")(
    "SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, " +
      s"ntile(5) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, $ordSql) AS quintile " +
      "FROM lineitem") {
    (s, d) =>
      graft.ops.Quantiles.exactNtile(
        lineitem(s, d).select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        part = "l_returnflag", value = "l_extendedprice", ord = ord,
        tiles = 5, outCol = "quintile")
  }

  /** Cross-sectional percentile position (r8): percent_rank + cume_dist of
    * order value within its month — the continuous siblings of the
    * average-rank and ntile queries (factor pipelines publish percentile
    * scores, not just buckets). Both functions are TIE-AWARE and depend
    * only on the value multiset, so ordering by the value alone is already
    * deterministic under any physical row order; each published double is
    * one correctly-rounded division of two integers — exact on any engine,
    * no decimal detour. One window shuffle on the month key. */
  val winPctRank = Q("q_win_pct_rank", "monthly percent_rank + cume_dist")(
    "SELECT o_orderkey, date_trunc('month', o_orderdate) AS month, o_totalprice, " +
      "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume_d FROM orders " +
      "WINDOW w AS (PARTITION BY date_trunc('month', o_orderdate) ORDER BY o_totalprice)") {
    (s, d) =>
      val o = orders(s, d).withColumn("month", date_trunc("month", col("o_orderdate")))
      val w = Window.partitionBy("month").orderBy("o_totalprice")
      o.select(col("o_orderkey"), col("month"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"), cume_dist().over(w).as("cume_d"))
  }

  /** Maximum drawdown per asset (r9): running peak via an expanding-frame
    * max, drawdown = px/peak − 1 per row, per-asset minimum published —
    * the risk metric every market pipeline reports. No float sums at all:
    * max/min are exact order statistics and the drawdown is ONE
    * correctly-rounded division per row, so cross-engine exactness needs
    * no decimal detour. One shuffle on the asset key feeds the expanding
    * window AND the final aggregate. */
  val winDrawdown = Q("q_win_drawdown", "per-asset maximum drawdown from running peak")(
    "WITH r AS (SELECT l_partkey, l_extendedprice AS px, " +
      "max(l_extendedprice) OVER (PARTITION BY l_partkey " +
      s"ORDER BY l_shipdate, $ordSql ROWS UNBOUNDED PRECEDING) AS runmax FROM lineitem) " +
      "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs, max(runmax) AS peak, " +
      "min(px / runmax - 1.0) AS max_drawdown FROM r GROUP BY 1") {
    (s, d) =>
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice").as("px"),
          max("l_extendedprice").over(w).as("runmax"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).cast("long").as("n_obs"), max("runmax").as("peak"),
          min(col("px") / col("runmax") - 1.0).as("max_drawdown"))
  }

  /** Calendar-gap audit of each asset's observation series (r13) — the
    * data-quality gauge behind every resample/ffill decision (the
    * reference's publication-lag checks, test_data_integrity.py:104):
    * per asset, distinct observation days, gap count (day-diff > 1
    * between consecutive distinct days), the largest gap, the calendar
    * span, and pinned coverage = days / (span + 1). coverage ≪ 1 says
    * ffill will fabricate most of the series; max_gap bounds how stale a
    * forward-filled value can get. One distinct + one per-asset ordered
    * window — all integer day arithmetic, engine-exact. */
  val winSeriesGaps = Q("q_win_series_gaps",
    "per-asset calendar-gap audit: day count, gaps, max gap, pinned coverage")(
    "WITH dd AS (SELECT DISTINCT l_partkey, CAST(l_shipdate AS DATE) AS d FROM lineitem), " +
      "g AS (SELECT l_partkey, d, date_diff('day', " +
      "lag(d) OVER (PARTITION BY l_partkey ORDER BY d), d) AS gap FROM dd) " +
      "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days, " +
      "CAST(sum(CASE WHEN gap > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps, " +
      "CAST(max(gap) AS BIGINT) AS max_gap_days, " +
      "CAST(date_diff('day', min(d), max(d)) + 1 AS BIGINT) AS span_days, " +
      Exact.Sql.pinScoreInt(
        "CAST(count(*) AS DOUBLE) / CAST(date_diff('day', min(d), max(d)) + 1 AS DOUBLE)") +
      " AS coverage FROM g GROUP BY 1") {
    (s, d) =>
      val dd = lineitem(s, d)
        .select(col("l_partkey"), col("l_shipdate").cast("date").as("d")).distinct()
      val w = Window.partitionBy("l_partkey").orderBy("d")
      dd.withColumn("gap", datediff(col("d"), lag("d", 1).over(w)))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("gap") > 1, 1).otherwise(0)).cast("long").as("n_gaps"),
          max("gap").cast("long").as("max_gap_days"),
          (datediff(max("d"), min("d")) + 1).cast("long").as("span_days"),
          Exact.pinScoreInt(count(lit(1)).cast("double") /
            (datediff(max("d"), min("d")) + 1).cast("double")).as("coverage"))
  }

  /** Drawdown DURATION per asset (r12) — the time dimension q_win_drawdown
    * doesn't publish: how LONG the series stays underwater (px strictly
    * below its running peak), as the longest consecutive underwater run,
    * the run count, and total underwater observations. Classic
    * gaps-and-islands: island id = global ordinal − underwater-only
    * ordinal, both over the SAME (l_shipdate, ord) order, then one count
    * per island. Both windows partition on the asset key, and the second
    * runs on the FILTERED child of the first, so Catalyst reuses the one
    * hash partitioning — one shuffle total. Assets that never dip (single
    * observation / monotone peak) publish zeros via the left join onto the
    * per-asset universe instead of silently dropping. All integer counts —
    * engine-exact with no numeric detour. */
  val winDrawdownDuration = Q("q_win_drawdown_duration",
    "per-asset underwater-streak audit: longest run, run count, underwater rows")(
    "WITH r AS (SELECT l_partkey, l_extendedprice AS px, " +
      s"row_number() OVER (PARTITION BY l_partkey ORDER BY l_shipdate, $ordSql) AS rn, " +
      "max(l_extendedprice) OVER (PARTITION BY l_partkey " +
      s"ORDER BY l_shipdate, $ordSql ROWS UNBOUNDED PRECEDING) AS runmax FROM lineitem), " +
      "u AS (SELECT l_partkey, rn, rn - row_number() OVER " +
      "(PARTITION BY l_partkey ORDER BY rn) AS isl FROM r WHERE px < runmax), " +
      "runs AS (SELECT l_partkey, isl, count(*) AS len FROM u GROUP BY 1, 2), " +
      "per AS (SELECT l_partkey, max(len) AS max_run, count(*) AS n_runs, " +
      "sum(len) AS n_under FROM runs GROUP BY 1), " +
      "base AS (SELECT l_partkey, count(*) AS n_obs FROM r GROUP BY 1) " +
      "SELECT b.l_partkey, CAST(b.n_obs AS BIGINT) AS n_obs, " +
      "CAST(coalesce(p.max_run, 0) AS BIGINT) AS max_underwater_run, " +
      "CAST(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs, " +
      "CAST(coalesce(p.n_under, 0) AS BIGINT) AS n_underwater " +
      "FROM base b LEFT JOIN per p ON p.l_partkey = b.l_partkey") {
    (s, d) =>
      val wOrd = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
      val wPeak = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice").as("px"),
          row_number().over(wOrd).as("rn"),
          max("l_extendedprice").over(wPeak).as("runmax"))
      val u = r.filter(col("px") < col("runmax"))
        .select(col("l_partkey"), col("rn"),
          (col("rn") - row_number().over(
            Window.partitionBy("l_partkey").orderBy("rn"))).as("isl"))
      val per = u.groupBy("l_partkey", "isl").agg(count(lit(1)).as("len"))
        .groupBy("l_partkey")
        .agg(max("len").as("max_run"), count(lit(1)).as("n_runs"),
          sum("len").as("n_under"))
      r.groupBy("l_partkey").agg(count(lit(1)).as("n_obs"))
        .join(per, Seq("l_partkey"), "left")
        .select(col("l_partkey"), col("n_obs").cast("long").as("n_obs"),
          coalesce(col("max_run"), lit(0L)).cast("long").as("max_underwater_run"),
          coalesce(col("n_runs"), lit(0L)).cast("long").as("n_runs"),
          coalesce(col("n_under"), lit(0L)).cast("long").as("n_underwater"))
  }

  /** Parkinson range volatility per asset (r12) — the high/low estimator
    * every OHLC pipeline publishes beside close-to-close vol (5× more
    * efficient per observation because the intraday RANGE carries more
    * information than the close): σ²_P = Σ ln(h/l)² / (4·ln2·n), from the
    * same synthesized high/low the ATR reads (h = px·(1+tax), l =
    * px·(1−discount)). The per-row log is the portable recipe
    * (Portable.pln — corpus-linear, ~20 IEEE flops/row), squares fold
    * through the 2⁻³⁰ grid portable sum (order-free), and one
    * fixed-order division + √ publishes the pinned vol. ONE hash
    * aggregate on the asset key; no window, no sort. */
  val winParkinson = Q("q_win_parkinson",
    "per-asset Parkinson high/low range volatility (portable ln, pinned)")(
    "WITH r AS (SELECT l_partkey, " +
      "(l_extendedprice * (1.0 + l_tax)) / (l_extendedprice * (1.0 - l_discount)) " +
      "AS _lnx FROM lineitem), " +
      Portable.plnSqlCtes("r", "lr") + ", " +
      "f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs, " +
      graft.util.Exact.Sql.portableSum("_pln * _pln") + " AS ss FROM lr GROUP BY 1) " +
      "SELECT l_partkey, n_obs, " +
      graft.util.Exact.Sql.pinScoreInt(
        "sqrt(ss / ((4.0 * 0.6931471805599453) * CAST(n_obs AS DOUBLE)))") +
      " AS park_vol FROM f") {
    (s, d) =>
      val hi = col("l_extendedprice") * (lit(1.0) + col("l_tax"))
      val lo = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Portable.pln(
          lineitem(s, d).select(col("l_partkey"), (hi / lo).as("ratio")),
          col("ratio"), "lr")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_obs"),
          graft.util.Exact.portableSum(col("lr") * col("lr")).as("ss"))
        .select(col("l_partkey"), col("n_obs"),
          graft.util.Exact.pinScoreInt(
            sqrt(col("ss") / ((lit(4.0) * lit(Portable.Ln2)) *
              col("n_obs").cast("double")))).as("park_vol"))
  }

  /** Single-scale R/S Hurst estimate per asset (r12) — the
    * trending-vs-mean-reverting gauge: cumulative deviations from the
    * series mean, R = range of the running sum, S = population stddev,
    * H = ln(R/S)/ln(n) (H > ½ trending, < ½ mean-reverting; the classic
    * multi-scale regression fits this same statistic at several window
    * lengths — one scale is the screening form). Exactness: deviations
    * ride the dyadic 2⁻²⁰ grid (mean is division-derived, so decimal
    * casts are out — the r13 rule), the running sum is an exact BIGINT
    * prefix (order-free addition; the (shipdate, ordinal) order is
    * unique per asset, FIXTURES), S comes from exact decimal moments,
    * and both logs are the portable recipe over the ASSETS frame —
    * corpus-size-independent transcendental work. One window shuffle on
    * the asset key + two tiny pln projections. */
  val winHurst = Q("q_win_hurst",
    "per-asset single-scale R/S Hurst exponent (grid prefix, portable ln, pinned)")(
    "WITH m AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n, " +
      Exact.Sql.avg("l_extendedprice") + " AS mean, " +
      Exact.Sql.stddevPop("l_extendedprice") + " AS sd FROM lineitem GROUP BY 1), " +
      "g AS (SELECT l.l_partkey, m.n, m.sd, " +
      "CAST(sum(CAST(floor((l.l_extendedprice - m.mean) * 1048576.0) AS BIGINT)) " +
      "OVER (PARTITION BY l.l_partkey ORDER BY l.l_shipdate, " +
      s"$ordSql ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum " +
      "FROM lineitem l JOIN m ON m.l_partkey = l.l_partkey), " +
      "f AS (SELECT l_partkey, max(n) AS n, max(sd) AS sd, " +
      "(CAST(max(cum) - min(cum) AS DOUBLE)) / 1048576.0 AS rr FROM g GROUP BY 1), " +
      "p1 AS (SELECT l_partkey, n, rr, sd, rr / sd AS _lnx FROM f " +
      "WHERE n > 1 AND sd > 0 AND rr > 0), " +
      Portable.plnSqlCtes("p1", "lp1") + ", " +
      "p2 AS (SELECT l_partkey, n, rr, sd, _pln AS lrs, CAST(n AS DOUBLE) AS _lnx " +
      "FROM lp1), " +
      Portable.plnSqlCtes("p2", "lp2") + " " +
      "SELECT l_partkey, CAST(n AS BIGINT) AS n_obs, " +
      graft.util.Exact.Sql.pinScoreInt("rr / sd") + " AS r_over_s, " +
      graft.util.Exact.Sql.pinScoreInt("lrs / _pln") + " AS hurst FROM lp2") {
    (s, d) =>
      val m = lineitem(s, d).groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), Exact.exactAvg(col("l_extendedprice")).as("mean"),
          Exact.exactStddevPop(col("l_extendedprice")).as("sd"))
      val wCum = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = lineitem(s, d).join(m, "l_partkey")
        .select(col("l_partkey"), col("n"), col("sd"),
          sum(floor((col("l_extendedprice") - col("mean")) * 1048576.0).cast("long"))
            .over(wCum).as("cum"))
      val f = g.groupBy("l_partkey")
        .agg(max("n").as("n"), max("sd").as("sd"),
          ((max("cum") - min("cum")).cast("double") / 1048576.0).as("rr"))
        .filter(col("n") > 1 && col("sd") > 0 && col("rr") > 0)
      val p1 = Portable.pln(f, col("rr") / col("sd"), "lrs")
      val p2 = Portable.pln(p1, col("n").cast("double"), "ln_n")
      p2.select(col("l_partkey"), col("n").cast("long").as("n_obs"),
        graft.util.Exact.pinScoreInt(col("rr") / col("sd")).as("r_over_s"),
        graft.util.Exact.pinScoreInt(col("lrs") / col("ln_n")).as("hurst"))
  }

  /** Amihud illiquidity per asset (r12) — the price-impact gauge
    * microstructure pipelines publish beside volatility: mean of
    * |return| per unit of dollar volume, ×10⁶ (the conventional scale).
    * Returns ride the dyadic 2⁻²⁰ grid (division-derived — the
    * q_agg_cvar contract), |·| is taken on the grid value, the per-row
    * ratio is scaled BEFORE the 2⁻³⁰ portable-grid sum so tiny impacts
    * keep resolution, and one fixed-order division publishes the pinned
    * mean. One window shuffle on the asset key (the lag) + one hash
    * aggregate; single-observation assets drop (no return to measure) on
    * both engines via HAVING. */
  val winAmihud = Q("q_win_amihud",
    "per-asset Amihud illiquidity: pinned mean |grid return| per dollar volume x1e6")(
    "WITH r AS (SELECT l_partkey, l_quantity * l_extendedprice AS dvol, " +
      "CAST(floor((l_extendedprice / lag(l_extendedprice) OVER w - 1.0) * 1048576.0) " +
      "AS BIGINT) AS rg " +
      s"FROM lineitem WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, $ordSql)) " +
      "SELECT l_partkey, CAST(count(rg) AS BIGINT) AS n_rets, " +
      graft.util.Exact.Sql.pinScoreInt(
        Exact.Sql.portableSum(
          "((abs(CAST(rg AS DOUBLE)) / 1048576.0) / dvol) * 1000000.0") +
          " / CAST(count(rg) AS DOUBLE)") + " AS amihud " +
      "FROM r GROUP BY 1 HAVING count(rg) > 0") {
    (s, d) =>
      val wOrd = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
      val ret = col("l_extendedprice") / lag("l_extendedprice", 1).over(wOrd) - 1.0
      lineitem(s, d)
        .select(col("l_partkey"),
          (col("l_quantity") * col("l_extendedprice")).as("dvol"),
          floor(ret * 1048576.0).cast("long").as("rg"))
        .groupBy("l_partkey")
        .agg(count(col("rg")).as("n_rets"),
          graft.util.Exact.portableSum(
            ((abs(col("rg").cast("double")) / 1048576.0) / col("dvol")) * 1000000.0)
            .as("ss"))
        .filter(col("n_rets") > 0)
        .select(col("l_partkey"), col("n_rets"),
          graft.util.Exact.pinScoreInt(
            col("ss") / col("n_rets").cast("double")).as("amihud"))
  }

  /** Ulcer index per asset (r12) — the drawdown-DEPTH-weighted risk
    * gauge between q_win_drawdown (max depth only) and
    * q_win_drawdown_duration (time only): UI = √(Σ dd²/n) over the
    * percent drawdown dd = 100·(px/runmax − 1) of every observation, so
    * long deep underwater stretches dominate brief dips. Each dd is ONE
    * correctly-rounded division (runmax is an exact order statistic),
    * dd² folds through the 2⁻³⁰ portable grid (order-free), one
    * fixed-order divide + √ publishes pinned. Same single asset-key
    * window shuffle as the drawdown pair. */
  val winUlcer = Q("q_win_ulcer",
    "per-asset Ulcer index: pinned sqrt of mean squared percent drawdown")(
    "WITH r AS (SELECT l_partkey, " +
      "100.0 * (l_extendedprice / max(l_extendedprice) OVER (PARTITION BY l_partkey " +
      s"ORDER BY l_shipdate, $ordSql ROWS UNBOUNDED PRECEDING) - 1.0) AS dd " +
      "FROM lineitem) " +
      "SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs, " +
      graft.util.Exact.Sql.pinScoreInt(
        "sqrt(" + Exact.Sql.portableSum("dd * dd") + " / CAST(count(*) AS DOUBLE))") +
      " AS ulcer FROM r GROUP BY 1") {
    (s, d) =>
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = lit(100.0) *
        (col("l_extendedprice") / max("l_extendedprice").over(w) - 1.0)
      lineitem(s, d)
        .select(col("l_partkey"), dd.as("dd"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_obs"),
          graft.util.Exact.portableSum(col("dd") * col("dd")).as("ss"))
        .select(col("l_partkey"), col("n_obs"),
          graft.util.Exact.pinScoreInt(
            sqrt(col("ss") / col("n_obs").cast("double"))).as("ulcer"))
  }

  /** Garman–Klass volatility per asset over the REGISTERED daily OHLC
    * bars (r12) — the full-bar estimator (7.4× more efficient than
    * close-to-close, uses the bar's open/close alongside the range the
    * Parkinson gauge uses alone): per bar 0.5·ln(H/L)² − (2ln2−1)·ln(C/O)²,
    * per asset σ = √(portable-grid mean of the bar terms). Composes over
    * q_resample_ohlc's own recipe (the bar convention cannot fork);
    * TWO chained portable lns per bar — the duck CTE chain projects the
    * first pln's staging columns away before re-staging, the Spark pln
    * drops its own. Bars are order statistics + exact volume, so the
    * ratio inputs are engine-identical; terms fold on the grid (bar
    * counts are data-bounded: bars ≪ ticks). */
  val winGarmanKlass = Q("q_win_garman_klass",
    "per-asset Garman-Klass OHLC volatility over the registered daily bars")(
    "WITH bars AS (" + PipelineQueries.resampleOhlc.oracle.get + "), " +
      "r1 AS (SELECT l_partkey, day, open, close, high / low AS _lnx FROM bars), " +
      Portable.plnSqlCtes("r1", "lhl") + ", " +
      "r2 AS (SELECT l_partkey, day, _pln AS lnhl, close / open AS _lnx FROM lhl), " +
      Portable.plnSqlCtes("r2", "lco") + ", " +
      "f AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_bars, " +
      graft.util.Exact.Sql.portableSum(
        "0.5 * (lnhl * lnhl) - (2.0 * 0.6931471805599453 - 1.0) * (_pln * _pln)") +
      " AS ss FROM lco GROUP BY 1) " +
      "SELECT l_partkey, n_bars, " +
      "CASE WHEN ss >= 0 THEN " +
      graft.util.Exact.Sql.pinScoreInt("sqrt(ss / CAST(n_bars AS DOUBLE))") +
      " END AS gk_vol FROM f") {
    (s, d) =>
      val bars = PipelineQueries.resampleOhlc.fn(s, d)
      val r1 = Portable.pln(
        bars.select(col("l_partkey"), col("open"), col("close"),
          (col("high") / col("low")).as("hl")),
        col("hl"), "lnhl")
      val r2 = Portable.pln(r1, col("close") / col("open"), "lnco")
      val term = lit(0.5) * (col("lnhl") * col("lnhl")) -
        (lit(2.0) * Portable.Ln2 - 1.0) * (col("lnco") * col("lnco"))
      r2.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_bars"),
          graft.util.Exact.portableSum(term).as("ss"))
        .select(col("l_partkey"), col("n_bars"),
          when(col("ss") >= 0, graft.util.Exact.pinScoreInt(
            sqrt(col("ss") / col("n_bars").cast("double")))).as("gk_vol"))
  }

  val all: Seq[Q] = Seq(winRankDaily, winDominance, winLag, winLead, winPctChange,
    monthTrunc, winNtile, winPctRank, winDrawdown, winSeriesGaps, winDrawdownDuration,
    winParkinson, winHurst, winAmihud, winUlcer, winGarmanKlass)
}
