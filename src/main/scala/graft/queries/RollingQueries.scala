package graft.queries

import graft.Q
import graft.util.Exact
import graft.util.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — rolling-frame statistics. pandas `rolling(n)` yields
  * null until n observations (`min_periods=window`), reproduced with an
  * explicit frame-count guard. All rolling moments go through the
  * decimal-exact window sums (see Exact) so engines agree bit-for-bit.
  * One shuffle on the asset key serves every frame in a query.
  */
object RollingQueries {


  private val ord: Column = col("l_orderkey") * 8 + col("l_linenumber")
  private val ordSql = "(l_orderkey * 8 + l_linenumber)"
  private def frameSql(n: Int) =
    s"(PARTITION BY l_partkey ORDER BY l_shipdate, $ordSql ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
  private def frame(n: Int) =
    Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord).rowsBetween(-(n - 1), 0)

  /** Rolling z-score, 30-row window, with min_periods null and std>0 guard
    * (`rolling_zscore`, feature_calculation_functions.py:16-21,37-40,101-103).
    * Applied to price and volume. */
  val winRollZscore = Q("q_win_roll_zscore", "rolling 30-row z-scores")({
    val w = "w30"
    def z(c: String, out: String) =
      s"(CASE WHEN COUNT($c) OVER $w >= 30 THEN " +
        s"(CASE WHEN ${Exact.Sql.winStddevSamp(c, w)} > 0 THEN " +
        s"(($c) - ${Exact.Sql.winAvg(c, w)}) / ${Exact.Sql.winStddevSamp(c, w)} END) END) AS $out"
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, l_extendedprice, l_quantity, " +
      s"${z("l_extendedprice", "price_z30")}, ${z("l_quantity", "vol_z30")} " +
      s"FROM lineitem WINDOW w30 AS ${frameSql(30)}"
  }) {
    (s, d) =>
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      val base = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
        col("l_extendedprice"), col("l_quantity"))
      val withM = Exact.withRollingMoments(
        Exact.withRollingMoments(base, col("l_extendedprice"), w, 30, "p"),
        col("l_quantity"), w, 30, "v")
      def z(c: Column, tag: String) = {
        val std = Exact.momentsStddevSamp(tag)
        when(col(s"${tag}_n") >= 30, when(std > 0, (c - Exact.momentsAvg(tag)) / std))
      }
      withM.select(col("l_partkey"), col("l_shipdate"), col("ord"),
        col("l_extendedprice"), col("l_quantity"),
        z(col("l_extendedprice"), "p").as("price_z30"), z(col("l_quantity"), "v").as("vol_z30"))
  }

  /** Rolling 30-row stddev of 1-step returns — realized volatility
    * (feature_calculation_functions.py:82-84). The return itself is a lag
    * expression, so this composes a window inside a window frame.
    *
    * r13 portability: ret_1 is DIVISION-DERIVED, so its moments ride the
    * portable GRID (Exact.withRollingMomentsGrid), not the decimal detour
    * — a decimal cast of a division result is the documented
    * engine-unstable class (Exact.portableSum scaladoc); the grid sums
    * are BIGINT, order-free, identical on both engines by construction. */
  val winRollVol = Q("q_win_roll_vol", "rolling volatility of returns")({
    val w = "w30"
    "WITH r AS (SELECT l_partkey, l_shipdate, " + ordSql + " AS ord, " +
      "(l_extendedprice / lag(l_extendedprice, 1) OVER (PARTITION BY l_partkey " +
      s"ORDER BY l_shipdate, $ordSql)) - 1.0 AS ret_1 FROM lineitem) " +
      "SELECT l_partkey, l_shipdate, ord, ret_1, " +
      s"(CASE WHEN COUNT(ret_1) OVER $w >= 30 THEN ${Exact.Sql.winGridStddevSamp("ret_1", w)} END) " +
      "AS volatility_30 FROM r WINDOW w30 AS " +
      "(PARTITION BY l_partkey ORDER BY l_shipdate, ord ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)"
  }) {
    (s, d) =>
      val wLag = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
      val r = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
        ((col("l_extendedprice") / lag("l_extendedprice", 1).over(wLag)) - lit(1.0)).as("ret_1"))
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      Exact.withRollingMomentsGrid(r, col("ret_1"), w, 30, "r")
        .select(col("l_partkey"), col("l_shipdate"), col("ord"), col("ret_1"),
          when(col("r_n") >= 30, Exact.momentsStddevSamp("r")).as("volatility_30"))
  }

  /** Bollinger Bands 20-row: SMA ± 2·population-std (TA-Lib BBANDS uses
    * ddof=0), plus normalized width
    * (feature_calculation_functions.py:63-70). */
  val winBbands = Q("q_win_bbands", "Bollinger bands 20-row")({
    val w = "w20"
    val c = "l_extendedprice"
    val sma = Exact.Sql.winAvg(c, w)
    val std = Exact.Sql.winStddevPop(c, w)
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, l_extendedprice, " +
      s"(CASE WHEN COUNT($c) OVER $w >= 20 THEN $sma + (2.0 * $std) END) AS bb_upper, " +
      s"(CASE WHEN COUNT($c) OVER $w >= 20 THEN $sma - (2.0 * $std) END) AS bb_lower, " +
      s"(CASE WHEN COUNT($c) OVER $w >= 20 THEN ((($sma + (2.0 * $std)) - ($sma - (2.0 * $std))) / $sma) END) AS bb_width " +
      s"FROM lineitem WINDOW w20 AS ${frameSql(20)}"
  }) {
    (s, d) =>
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      val c = col("l_extendedprice")
      val base = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"), c)
      val withM = Exact.withRollingMoments(base, c, w, 20, "b")
      val sma = Exact.momentsAvg("b")
      val std = Exact.momentsStddevPop("b")
      val full = col("b_n") >= 20
      val upper = sma + (lit(2.0) * std)
      val lower = sma - (lit(2.0) * std)
      withM.select(col("l_partkey"), col("l_shipdate"), col("ord"), c,
        when(full, upper).as("bb_upper"),
        when(full, lower).as("bb_lower"),
        when(full, (upper - lower) / sma).as("bb_width"))
  }

  /** Rolling-median window length. */
  private val MedN = 21

  /** Rolling 21-row median price (r9): the robust-statistics sibling of
    * the rolling mean/z-score family — pandas `rolling(21).median()`, the
    * outlier-resistant smoother a market pipeline uses where a spike
    * would poison the SMA. Median = ORDER STATISTIC, no arithmetic on the
    * values at all, so cross-engine exactness is free: both engines sort
    * the same 21 doubles and pick element ⌈n/2⌉ (lower median,
    * percentile_disc semantics — DuckDB's windowed quantile_disc(0.5)).
    *
    * Shape: the one shuffle on the asset key that every rolling query
    * shares; per row the frame is collected and sorted — O(w log w) per
    * row with w = 21 pinned (a constant, not data-sized: state per task
    * is bounded by window × row width). At very large w the plan swaps to
    * the two-phase value-histogram rank (ops.Quantiles' layout) — for the
    * 21-row financial window the in-frame sort is both faster and
    * simpler. min_periods = window nulls the warm-up rows like every
    * rolling query here. */
  val winRollMedian = Q("q_win_roll_median", "rolling 21-row median price")(
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, l_extendedprice, " +
      s"(CASE WHEN COUNT(l_extendedprice) OVER w >= $MedN THEN " +
      s"quantile_disc(l_extendedprice, 0.5) OVER w END) AS median_$MedN " +
      s"FROM lineitem WINDOW w AS ${frameSql(MedN)}") {
    (s, d) =>
      val w = frame(MedN)
      val n = count(col("l_extendedprice")).over(w)
      // lower median: element ⌈n/2⌉ of the sorted frame (1-based)
      val med = element_at(array_sort(collect_list(col("l_extendedprice")).over(w)),
        ((n + 1) / 2).cast("int"))
      lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
          col("l_extendedprice"),
          when(n >= MedN, med).as(s"median_$MedN"))
  }

  /** Rolling 30-row price↔quantity Pearson correlation (r9): the rolling
    * sibling of q_agg_corr — the windowed co-movement signal (rolling
    * beta/hedge-ratio family). Six frame moments, then r as a fixed-order
    * IEEE expression with the min_periods null and zero-variance guards
    * every rolling query here carries. One shuffle on the asset key.
    *
    * The moments ride the prefix-difference machinery
    * (Exact.withRollingMoments/-Cross — long-backed cumulative decimals,
    * O(rows) not O(rows × frame)): the naive six DECIMAL(38) sliding
    * frames measured 21.5 s CPU at sf0.1 / 218 s at sf1 (Spark recomputes
    * sliding decimal frames from scratch per row, BigDecimal-backed);
    * the prefix form is bit-identical to the oracle's frame sums by the
    * exactness argument documented at withRollingMoments. */
  val winRollCorr = Q("q_win_roll_corr", "rolling 30-row price-quantity correlation")({
    val w = "w30"
    def s38(c: String, sc: Int) = Exact.Sql.winSum(c, w, sc)
    val n = s"CAST(COUNT(l_extendedprice) OVER $w AS DOUBLE)"
    val sx = s38("l_quantity", 8); val sy = s38("l_extendedprice", 8)
    val sxy = s38("l_quantity * l_extendedprice", 4)
    val sxx = s38("l_quantity * l_quantity", 4)
    val syy = s38("l_extendedprice * l_extendedprice", 4)
    val vx = s"($n * $sxx - $sx * $sx)"; val vy = s"($n * $syy - $sy * $sy)"
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, " +
      s"(CASE WHEN $n >= 30 AND $vx > 0 AND $vy > 0 THEN " +
      s"($n * $sxy - $sx * $sy) / (sqrt($vx) * sqrt($vy)) END) AS roll_corr " +
      s"FROM lineitem WINDOW w30 AS ${frameSql(30)}"
  }) {
    (s, d) =>
      val w = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val base = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"),
        ord.as("ord"), x, y)
      val withM = Exact.withRollingCross(
        Exact.withRollingMoments(
          Exact.withRollingMoments(base, x, w, 30, "cx"), y, w, 30, "cy"),
        x, y, w, 30, "c")
      val n = col("cy_n")
      val vx = n * col("cx_q") - col("cx_s") * col("cx_s")
      val vy = n * col("cy_q") - col("cy_s") * col("cy_s")
      withM.select(col("l_partkey"), col("l_shipdate"), col("ord"),
        when(n >= 30 && vx > 0 && vy > 0,
          (n * col("c_xy") - col("cx_s") * col("cy_s")) /
            (sqrt(vx) * sqrt(vy))).as("roll_corr"))
  }

  /** Donchian channel, 21-row (r11) — the order-statistic band family
    * beside Bollinger's moment band: rolling high/low extrema of the
    * price and their midline, pandas `rolling(21).max()/.min()`. The
    * breakout-system primitive (price above dc_high = N-period high);
    * as a data-quality lens it brackets the exact range a spike filter
    * clips to (q_agg_winsorize's rolling sibling).
    *
    * Exactness is free: min/max are ORDER STATISTICS (no arithmetic on
    * the values), the midline is one IEEE add + one dyadic halve — no
    * decimal/pin machinery needed. Same single asset-key shuffle +
    * frame as every rolling query; pandas min_periods semantics via the
    * frame-count guard. */
  val winDonchian = Q("q_win_donchian", "Donchian 21-row high/low channel + midline")({
    val c = "l_extendedprice"
    val w = "w21"
    val full = s"COUNT($c) OVER $w >= 21"
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, $c, " +
      s"(CASE WHEN $full THEN max($c) OVER $w END) AS dc_high, " +
      s"(CASE WHEN $full THEN min($c) OVER $w END) AS dc_low, " +
      s"(CASE WHEN $full THEN (max($c) OVER $w + min($c) OVER $w) / 2.0 END) AS dc_mid " +
      s"FROM lineitem WINDOW $w AS ${frameSql(21)}"
  }) {
    (s, d) =>
      val w = frame(21)
      val c = col("l_extendedprice")
      val full = count(c).over(w) >= 21
      val hi = max(c).over(w)
      val lo = min(c).over(w)
      lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"), c,
        when(full, hi).as("dc_high"),
        when(full, lo).as("dc_low"),
        when(full, (hi + lo) / 2.0).as("dc_mid"))
  }

  /** Stochastic oscillator, 14/3 (r13) — %K = 100·(C−L14)/(H14−L14), the
    * position of the current price inside its Donchian-style 14-row range,
    * plus %D = the 3-row SMA of %K (the classic signal line). Completes
    * the momentum family next to RSI (which is ratio-of-moves) and
    * Donchian (which is the raw band this normalizes against).
    *
    * Exactness: H14/L14 are order statistics; %K is ONE fixed-order IEEE
    * expression over them (both engines produce identical bits); %D is
    * the portable-GRID 3-row mean of those identical doubles
    * (Exact.winPortableAvg — %K is division-derived, so a decimal-cast
    * mean is the engine-unstable class; r13 fix per the Exact rule),
    * with a count guard for pandas min_periods and a
    * NULL when the range is flat (H14 = L14 — division-guard contract
    * of q_win_roll_zscore). Same single asset-key shuffle as every
    * rolling query; two window frames over one partitioning. */
  val winStochastic = Q("q_win_stochastic", "stochastic oscillator 14-row %K + 3-row %D")({
    val c = "l_extendedprice"
    val w14 = "w14"
    val hi = s"max($c) OVER $w14"; val lo = s"min($c) OVER $w14"
    val k = s"(CASE WHEN COUNT($c) OVER $w14 >= 14 AND $hi > $lo THEN " +
      s"100.0 * (($c) - $lo) / ($hi - $lo) END)"
    s"WITH k AS (SELECT l_partkey, l_shipdate, $ordSql AS ord, $c, $k AS pct_k " +
      s"FROM lineitem WINDOW $w14 AS ${frameSql(14)}) " +
      "SELECT l_partkey, l_shipdate, ord, pct_k, " +
      s"(CASE WHEN COUNT(pct_k) OVER w3 >= 3 THEN ${Exact.Sql.winPortableAvg("pct_k", "w3")} END) AS pct_d " +
      "FROM k WINDOW w3 AS (PARTITION BY l_partkey ORDER BY l_shipdate, ord " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
  }) {
    (s, d) =>
      val w14 = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
        .rowsBetween(-13, 0)
      val c = col("l_extendedprice")
      val hi = max(c).over(w14); val lo = min(c).over(w14)
      val k = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"), c)
        .withColumn("pct_k",
          when(count(c).over(w14) >= 14 && hi > lo,
            lit(100.0) * (c - lo) / (hi - lo)))
      val w3 = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
        .rowsBetween(-2, 0)
      k.select(col("l_partkey"), col("l_shipdate"), col("ord"), col("pct_k"),
        when(count(col("pct_k")).over(w3) >= 3,
          Exact.winPortableAvg(col("pct_k"), w3)).as("pct_d"))
  }

  /** On-balance volume (r13) — the running sum of signed volume
    * (sign of the 1-step price change × quantity), the classic
    * volume-confirms-price accumulation line and the simplest member of
    * the CUMULATIVE (unbounded-preceding) frame family, which no other
    * rolling query here exercises: every other frame is fixed-width.
    * First row of each asset contributes 0 (no prior price — pandas
    * diff() NaN → sign 0).
    *
    * Exactness: sign(Δprice) ∈ {−1,0,1} is exact on IEEE compare;
    * quantities are parts-integral doubles, so the unbounded decimal
    * running sum (Exact.winSum) is exact and engine-identical. The
    * cumulative frame costs O(rows) via Spark's running-frame window —
    * never a per-row rescan — over the same one asset-key shuffle. */
  val winObv = Q("q_win_obv", "on-balance volume cumulative signed-volume line")({
    val sgn = "(CASE WHEN lag(l_extendedprice, 1) OVER wo IS NULL THEN 0.0 " +
      "WHEN l_extendedprice > lag(l_extendedprice, 1) OVER wo THEN 1.0 " +
      "WHEN l_extendedprice < lag(l_extendedprice, 1) OVER wo THEN -1.0 ELSE 0.0 END)"
    s"WITH sv AS (SELECT l_partkey, l_shipdate, $ordSql AS ord, " +
      s"$sgn * l_quantity AS signed_vol FROM lineitem " +
      s"WINDOW wo AS (PARTITION BY l_partkey ORDER BY l_shipdate, $ordSql)) " +
      "SELECT l_partkey, l_shipdate, ord, signed_vol, " +
      Exact.Sql.winSum("signed_vol", "wc") + " AS obv FROM sv " +
      "WINDOW wc AS (PARTITION BY l_partkey ORDER BY l_shipdate, ord " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
  }) {
    (s, d) =>
      val wo = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      val prev = lag(col("l_extendedprice"), 1).over(wo)
      val sgn = when(prev.isNull, 0.0)
        .when(col("l_extendedprice") > prev, 1.0)
        .when(col("l_extendedprice") < prev, -1.0)
        .otherwise(0.0)
      val sv = lineitem(s, d)
        .select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
          col("l_extendedprice"), col("l_quantity"))
        .withColumn("signed_vol", sgn * col("l_quantity"))
      val wc = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
      sv.select(col("l_partkey"), col("l_shipdate"), col("ord"), col("signed_vol"),
        Exact.winSum(col("signed_vol"), wc).as("obv"))
  }

  /** Chaikin money flow, 20-bar (r12) — volume-weighted close-location
    * accumulation over the REGISTERED daily OHLC bars
    * (q_resample_ohlc's own recipe, spliced as a CTE — the bar
    * convention cannot fork): per bar the money-flow multiplier
    * ((C−L)−(H−C))/(H−L) ∈ [−1, 1] says where the close sat in the
    * range (flat bars contribute 0, the TA-Lib convention), scaled by
    * volume and averaged over 20 bars against total volume. CMF > 0 =
    * buying pressure confirmed by volume — the volume-confirmation
    * sibling of q_win_obv's running line, on bars instead of ticks.
    *
    * Exactness: the multiplier is one fixed-order IEEE expression over
    * order-statistic prices (identical bits on both engines); MFV =
    * multiplier × volume is division-DERIVED, so its 20-bar sum goes
    * through the windowed portable grid (floor(x·2³⁰) BIGINT frame sum —
    * winPortableSum), never a decimal cast (DESIGN §4j); bar volume is
    * an integral-valued exact sum, so its frame sum is decimal-exact
    * (winSum). One (asset, day) hash aggregate + one asset-keyed window
    * shuffle — bars-sized, strictly cheaper than the tick stream. */
  val winCmf = Q("q_win_cmf",
    "Chaikin money flow (20-bar) over the registered daily OHLC bars")({
    val mfm = "(CASE WHEN high > low THEN " +
      "((close - low) - (high - close)) / (high - low) ELSE 0.0 END)"
    "WITH bars AS (" + PipelineQueries.resampleOhlc.oracle.get + "), " +
      s"m AS (SELECT l_partkey, day, volume, $mfm * volume AS mfv FROM bars) " +
      "SELECT l_partkey, day, volume, " +
      "CASE WHEN COUNT(*) OVER w20 >= 20 AND " + Exact.Sql.winSum("volume", "w20") +
      " > 0 AND " + Exact.Sql.winSum("volume", "w20") + " < 8589934592 THEN " +
      Exact.Sql.pinScoreInt(
        Exact.Sql.winPortableSum("mfv", "w20") + " / " +
          Exact.Sql.winSum("volume", "w20")) +
      " END AS cmf FROM m " +
      "WINDOW w20 AS (PARTITION BY l_partkey ORDER BY day " +
      "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
  }) {
    (s, d) =>
      val bars = PipelineQueries.resampleOhlc.fn(s, d)
      val mfm = when(col("high") > col("low"),
        ((col("close") - col("low")) - (col("high") - col("close"))) /
          (col("high") - col("low"))).otherwise(0.0)
      val m = bars.select(col("l_partkey"), col("day"), col("volume"),
        (mfm * col("volume")).as("mfv"))
      val w20 = Window.partitionBy("l_partkey").orderBy("day").rowsBetween(-19, 0)
      val volSum = Exact.winSum(col("volume"), w20)
      // domain guard (ADVICE r12, tightened per ADVICE r13): the 20-bar
      // grid sum Σ floor(mfvᵢ·2³⁰) must fit int64. |mfv| ≤ volume (|mfm| ≤
      // 1), so Σ|addend| ≤ (Σ volume)·2³⁰ — requiring the FRAME TOTAL
      // volume < 2³³ (strict) bounds the whole frame sum below 2⁶³, not
      // just each addend (the r12 per-bar max guard left a 20·2⁶³ wrap
      // window, and its ≤ boundary itself overflowed at volume = 2³³ with
      // mfm = ±1). A pathological frame beyond that publishes NULL on
      // BOTH engines — instead of Spark wrapping the long silently while
      // DuckDB sums into HUGEINT (an engine fork on extreme input).
      // volume is a decimal-exact integral sum, so the predicate is
      // portable; volSum is one window expression reused for all three
      // roles (count gate, positivity, domain bound).
      m.select(col("l_partkey"), col("day"), col("volume"),
        when(count(lit(1)).over(w20) >= 20 && volSum > 0 &&
            volSum < 8589934592L,
          Exact.pinScoreInt(Exact.winPortableSum(col("mfv"), w20) / volSum)).as("cmf"))
  }

  /** Ichimoku lines, 9/26/52 (r12) — the four derivable components of the
    * classic cloud over the price series: tenkan (9-row Donchian
    * midline), kijun (26-row), senkou A = the (tenkan+kijun)/2 midline
    * DISPLACED 26 rows forward (published at the row it plots on — a lag
    * in frame terms), senkou B = the 52-row midline displaced 26. The
    * displacement is what the family's other bands lack: the published
    * row mixes two frame horizons, exercising lag-over-derived-window
    * composition on ONE partitioning (no second shuffle — all five
    * windows share the asset key + order).
    *
    * Exactness is the Donchian argument: extrema are order statistics,
    * midlines one IEEE add + exact dyadic halve, the lag a row
    * relocation — no decimal/pin machinery. min_periods semantics via
    * frame-count guards on every horizon. */
  val winIchimoku = Q("q_win_ichimoku",
    "Ichimoku tenkan/kijun + displaced senkou A/B over one asset partitioning")({
    val c = "l_extendedprice"
    def mid(w: String) = s"(max($c) OVER $w + min($c) OVER $w) / 2.0"
    def full(w: String, n: Int) = s"COUNT($c) OVER $w >= $n"
    "WITH lines AS (SELECT l_partkey, l_shipdate, " + ordSql + " AS ord, " +
      s"(CASE WHEN ${full("w9", 9)} THEN ${mid("w9")} END) AS tenkan, " +
      s"(CASE WHEN ${full("w26", 26)} THEN ${mid("w26")} END) AS kijun, " +
      s"(CASE WHEN ${full("w52", 52)} THEN ${mid("w52")} END) AS mid52 " +
      s"FROM lineitem WINDOW w9 AS ${frameSql(9)}, w26 AS ${frameSql(26)}, " +
      s"w52 AS ${frameSql(52)}) " +
      "SELECT l_partkey, l_shipdate, ord, tenkan, kijun, " +
      "lag((tenkan + kijun) / 2.0, 26) OVER wd AS senkou_a, " +
      "lag(mid52, 26) OVER wd AS senkou_b FROM lines " +
      "WINDOW wd AS (PARTITION BY l_partkey ORDER BY l_shipdate, ord)"
  }) {
    (s, d) =>
      val c = col("l_extendedprice")
      def mid(n: Int) = (max(c).over(frame(n)) + min(c).over(frame(n))) / 2.0
      def full(n: Int) = count(c).over(frame(n)) >= n
      val lines = lineitem(s, d).select(col("l_partkey"), col("l_shipdate"),
        ord.as("ord"),
        when(full(9), mid(9)).as("tenkan"),
        when(full(26), mid(26)).as("kijun"),
        when(full(52), mid(52)).as("mid52"))
      val wd = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), col("ord"))
      lines.select(col("l_partkey"), col("l_shipdate"), col("ord"),
        col("tenkan"), col("kijun"),
        lag((col("tenkan") + col("kijun")) / 2.0, 26).over(wd).as("senkou_a"),
        lag(col("mid52"), 26).over(wd).as("senkou_b"))
  }

  /** Volume-weighted moving average, 20-row (r12) — the rolling form of
    * q_agg_vwap's daily hash aggregate: Σ(price·qty)/Σqty over the
    * trailing window, the execution-benchmark line that discounts
    * low-volume prints a plain SMA over-weights. price·qty is an EXACT
    * 2-decimal product of raw columns (price 2dp × integral qty), so
    * BOTH frame sums ride the decimal-exact winSum — no grid needed
    * (contrast q_win_cmf, whose multiplier is division-derived); the
    * published ratio is one IEEE division, pinned. Same single asset-key
    * shuffle as every rolling query. */
  val winVwma = Q("q_win_vwma", "20-row volume-weighted moving average, pinned")({
    val w = "w20"
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, " +
      s"CASE WHEN COUNT(*) OVER $w >= 20 AND " +
      Exact.Sql.winSum("l_quantity", w) + " > 0 THEN " +
      Exact.Sql.pinScoreInt(
        Exact.Sql.winSum("l_extendedprice * l_quantity", w) + " / " +
          Exact.Sql.winSum("l_quantity", w)) +
      s" END AS vwma FROM lineitem WINDOW $w AS ${frameSql(20)}"
  }) {
    (s, d) =>
      val w = frame(20)
      val pv = Exact.winSum(col("l_extendedprice") * col("l_quantity"), w)
      val v = Exact.winSum(col("l_quantity"), w)
      lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
        when(count(lit(1)).over(w) >= 20 && v > 0,
          Exact.pinScoreInt(pv / v)).as("vwma"))
  }

  /** Fractional differencing, d = 0.4, 20-tap fixed window (r12) — the
    * López-de-Prado stationarity transform: integer differencing (d=1)
    * destroys all memory, FD(0.4) removes just enough trend to
    * stationarize while keeping long-memory signal. The binomial weights
    * w₀ = 1, w_k = −w_{k−1}·(d−k+1)/k are NOT shipped as decimal
    * literals — measured here: DuckDB's literal→DOUBLE parse is not
    * correctly rounded for 17-digit strings (-0.041600000000000005
    * parsed to -0.0416, one ulp off), a sharper form of the bare-decimal
    * literal lesson (q_ewma_vol / q_agg_benford — those literals happen
    * to parse exactly; these don't). The oracle instead carries each
    * weight as the NESTED RECURRENCE EXPRESSION itself, built from the
    * exactly-parsing literal 0.4 and small integers, so DuckDB's own
    * correctly-rounded ·,/,− reproduce the JVM's weight bits; the
    * Spark side evaluates the identical recurrence in the JVM at
    * plan-build time. The row value is the 20-term dot
    * Σ w_k·price_{t−k} as one left-to-right IEEE chain over lag taps.
    * One asset-key window shuffle; 20 lag expressions share the Sort. */
  val winFracdiff = Q("q_win_fracdiff",
    "fractional differencing FD(0.4), 20 binomial taps, pinned")({
    val dd = 0.4
    // weight k as a nested arithmetic expression (never a long literal)
    val wExpr = Iterator.iterate(("CAST(1.0 AS DOUBLE)", 0)) { case (prev, k) =>
      (s"(-($prev) * ((CAST($dd AS DOUBLE)) - $k.0) / ${k + 1}.0)", k + 1)
    }.take(20).map(_._1).toSeq
    val terms = wExpr.zipWithIndex.map { case (we, k) =>
      if (k == 0) s"($we) * l_extendedprice"
      else s"($we) * lag(l_extendedprice, $k) OVER wf"
    }
    val sum20 = terms.reduceLeft((a, b) => s"($a) + ($b)")
    s"SELECT l_partkey, l_shipdate, $ordSql AS ord, " +
      s"CASE WHEN lag(l_extendedprice, 19) OVER wf IS NOT NULL THEN " +
      Exact.Sql.pinScoreInt(sum20) + " END AS fracdiff " +
      "FROM lineitem WINDOW wf AS (PARTITION BY l_partkey " +
      s"ORDER BY l_shipdate, $ordSql)"
  }) {
    (s, d) =>
      val dd = 0.4
      val wts = Iterator.iterate((1.0, 0)) { case (wk, k) =>
        (-wk * (dd - k) / (k + 1), k + 1)
      }.take(20).map(_._1).toSeq
      val wf = Window.partitionBy("l_partkey").orderBy(col("l_shipdate"), ord)
      val px = col("l_extendedprice")
      val sum20 = wts.zipWithIndex.map { case (wk, k) =>
        if (k == 0) lit(wk) * px else lit(wk) * lag(px, k).over(wf)
      }.reduceLeft(_ + _)
      lineitem(s, d).select(col("l_partkey"), col("l_shipdate"), ord.as("ord"),
        when(lag(px, 19).over(wf).isNotNull,
          Exact.pinScoreInt(sum20)).as("fracdiff"))
  }

  /** Floor-trader pivot levels (r12) — P = (H+L+C)/3 with R1/S1 = 2P−L /
    * 2P−H and R2/S2 = P±(H−L), computed from the PREVIOUS day's
    * registered OHLC bar (q_resample_ohlc) and published on the row of
    * the day they apply to — the lag-composition contract of
    * q_win_ichimoku on the support/resistance family. Every level is a
    * fixed-order IEEE expression over lagged order statistics
    * (one non-dyadic /3.0 division — identical on both engines); first
    * bar per asset publishes NULLs. One (asset, day) aggregate + one
    * asset-keyed lag window. */
  val winPivotPoints = Q("q_win_pivot_points",
    "floor-trader pivot P/R1/S1/R2/S2 from the previous registered daily bar")(
    "WITH bars AS (" + PipelineQueries.resampleOhlc.oracle.get + "), " +
      "lb AS (SELECT l_partkey, day, " +
      "lag(high) OVER w AS ph, lag(low) OVER w AS pl, lag(close) OVER w AS pc " +
      "FROM bars WINDOW w AS (PARTITION BY l_partkey ORDER BY day)) " +
      "SELECT l_partkey, day, " +
      "(ph + pl + pc) / 3.0 AS pivot, " +
      "2.0 * ((ph + pl + pc) / 3.0) - pl AS r1, " +
      "2.0 * ((ph + pl + pc) / 3.0) - ph AS s1, " +
      "((ph + pl + pc) / 3.0) + (ph - pl) AS r2, " +
      "((ph + pl + pc) / 3.0) - (ph - pl) AS s2 FROM lb") {
    (s, d) =>
      val bars = PipelineQueries.resampleOhlc.fn(s, d)
      val w = Window.partitionBy("l_partkey").orderBy("day")
      val lb = bars.select(col("l_partkey"), col("day"),
        lag("high", 1).over(w).as("ph"),
        lag("low", 1).over(w).as("pl"),
        lag("close", 1).over(w).as("pc"))
      val p = (col("ph") + col("pl") + col("pc")) / 3.0
      lb.select(col("l_partkey"), col("day"),
        p.as("pivot"),
        (lit(2.0) * p - col("pl")).as("r1"),
        (lit(2.0) * p - col("ph")).as("s1"),
        (p + (col("ph") - col("pl"))).as("r2"),
        (p - (col("ph") - col("pl"))).as("s2"))
  }

  val all: Seq[Q] = Seq(winRollZscore, winRollVol, winBbands, winRollMedian, winRollCorr,
    winDonchian, winStochastic, winObv, winCmf, winIchimoku, winVwma, winFracdiff,
    winPivotPoints)
}
