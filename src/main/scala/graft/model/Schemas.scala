package graft.model

import org.apache.spark.sql.types._

/** Fixed per-layer schemas (SURVEY.md §1.3-1.4). The reference's schemas
  * are implicit (pandas infers) with declared required subsets enforced at
  * the quality gate; here each layer gets one explicit StructType so
  * validation is a set difference on field names (ops.Cleanse) and writers
  * can enforce layout.
  */
object Schemas {

  /** Bronze OHLCV (historical/live): one row per (asset, day)
    * (pipeline_helpers.py:251-253; historical_data/README §6). */
  val bronze: StructType = StructType(Seq(
    StructField("date", TimestampType, nullable = false),
    StructField("coin_id", StringType, nullable = false),
    StructField("ticker", StringType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType), StructField("market_cap", DoubleType),
    StructField("protocol_tvl", DoubleType), StructField("dex_volume", DoubleType),
    StructField("social_score", DoubleType), StructField("social_rank", DoubleType),
    StructField("sentiment_score", DoubleType)))

  /** Silver = Bronze + canonical id + returns (test_data_integrity.py:41). */
  val silver: StructType = StructType(
    bronze.fields ++ Seq(
      StructField("canonical_id", StringType, nullable = false),
      StructField("returns_1d", DoubleType)))

  /** Gold = Silver + derived features (FIXTURES.md §1.3). */
  val gold: StructType = StructType(
    silver.fields ++ Seq("ret_1d", "ret_3d", "ret_7d", "ret_14d", "ret_30d",
      "ret_3d_z", "ret_7d_z", "rsi_14", "macd", "macd_sig", "macd_hist",
      "bb_upper", "bb_lower", "bb_width", "volatility_30d", "atr_14",
      "vol_z30", "mcap_rank_daily", "dominance_pct")
      .map(StructField(_, DoubleType)))

  /** Derivatives snapshot (derivatives_snapshot_etl.py:79-90). */
  val derivatives: StructType = StructType(Seq(
    StructField("snapshot_date", TimestampType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("base_asset", StringType), StructField("target_asset", StringType),
    StructField("contract_type", StringType),
    StructField("last_price", DoubleType), StructField("volume_24h", DoubleType),
    StructField("funding_rate", DoubleType), StructField("open_interest", DoubleType)))

  /** Asset attributes, one row per asset (pipeline_helpers.py:136-156). */
  val attributes: StructType = StructType(Seq(
    StructField("coin_id", StringType, nullable = false),
    StructField("last_updated", TimestampType),
    StructField("rank", IntegerType),
    StructField("genesis_date", TimestampType),
    StructField("sentiment_up_pct", DoubleType),
    StructField("categories", ArrayType(StringType)),
    StructField("forks", LongType), StructField("stars", LongType),
    StructField("subscribers", LongType), StructField("total_issues", LongType),
    StructField("closed_issues", LongType), StructField("pr_contributors", LongType),
    StructField("commit_count_4w", LongType),
    StructField("tvl", DoubleType), StructField("mcap_tvl_ratio", DoubleType),
    StructField("fdv_tvl_ratio", DoubleType), StructField("ath_change_pct", DoubleType),
    StructField("circulating_supply", DoubleType),
    StructField("price_change_7d", DoubleType), StructField("price_change_30d", DoubleType),
    StructField("price_change_1y", DoubleType),
    StructField("homepage", StringType),
    StructField("standard_category", StringType)))

  /** Universe definition, relational form (exploded
    * {"YYYY-MM-01": [ids]} map, universe_generation_pipeline.py:167-171). */
  val universe: StructType = StructType(Seq(
    StructField("month", TimestampType, nullable = false),
    StructField("coin_id", StringType, nullable = false)))

  /** Required-column subsets enforced at the gate
    * (data_quality_gate.py:23; test_data_integrity.py:40-41). */
  val requiredBronze: Set[String] =
    Set("canonical_id", "date", "open", "high", "low", "close")
  val requiredSilver: Set[String] = requiredBronze ++ Set("returns_1d", "market_cap")
}
