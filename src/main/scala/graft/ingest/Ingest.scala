package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest payload normalizer (pipeline_helpers.py:107-156
  * `parse_asset_metadata` + `_extract_dev_activity` +
  * `_extract_market_metrics`): nested raw asset-metadata JSON → one flat
  * attributes row per asset.
  *
  * The reference parses dict-by-dict in Python per HTTP response; here the
  * payload schema is DECLARED once as a `StructType` and the whole corpus
  * of raw JSON strings flattens in one distributed `from_json` + `select`
  * — a single codegen'd pass, no UDF, columns pruned to what the select
  * touches. Missing keys (absent `developer_data`, empty `links.homepage`)
  * become nulls exactly like `dict.get` — `from_json` null-fills absent
  * fields and `element_at` returns null out of range.
  */
object Ingest {

  /** `developer_data` sub-document (pipeline_helpers.py:107-119). */
  val devActivitySchema: StructType = StructType(Seq(
    StructField("forks", LongType), StructField("stars", LongType),
    StructField("subscribers", LongType), StructField("total_issues", LongType),
    StructField("closed_issues", LongType),
    StructField("pull_request_contributors", LongType),
    StructField("commit_count_4_weeks", LongType)))

  /** `market_data` sub-document (pipeline_helpers.py:121-135). */
  val marketDataSchema: StructType = StructType(Seq(
    StructField("total_value_locked", DoubleType),
    StructField("mcap_to_tvl_ratio", DoubleType),
    StructField("fdv_to_tvl_ratio", DoubleType),
    StructField("ath_change_percentage",
      StructType(Seq(StructField("usd", DoubleType)))),
    StructField("circulating_supply", DoubleType),
    StructField("price_change_percentage_7d", DoubleType),
    StructField("price_change_percentage_30d", DoubleType),
    StructField("price_change_percentage_1y", DoubleType)))

  /** Whole raw payload (pipeline_helpers.py:136-156). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("last_updated", StringType),
    StructField("market_cap_rank", IntegerType),
    StructField("genesis_date", StringType),
    StructField("sentiment_votes_up_percentage", DoubleType),
    StructField("categories", ArrayType(StringType)),
    StructField("developer_data", devActivitySchema),
    StructField("market_data", marketDataSchema),
    StructField("links",
      StructType(Seq(StructField("homepage", ArrayType(StringType)))))))

  /** pandas `.normalize()`: truncate the timestamp to its day. */
  private def day(c: Column): Column = date_trunc("day", to_timestamp(c))

  /** Flatten a raw-JSON string column to the `Schemas.attributes` layout
    * (minus `standard_category`, which the taxonomy classifier assigns
    * downstream — ops.Taxonomy). One row in, one row out; rows whose JSON
    * fails to parse yield all-null attribute columns (`errors='coerce'`
    * ingest semantics), never an error mid-pipeline. */
  def parseAssetMetadata(raw: DataFrame, jsonCol: String): DataFrame = {
    val p = from_json(col(jsonCol), payloadSchema)
    raw.select(
      p.getField("id").as("coin_id"),
      day(p.getField("last_updated")).as("last_updated"),
      p.getField("market_cap_rank").as("rank"),
      day(p.getField("genesis_date")).as("genesis_date"),
      p.getField("sentiment_votes_up_percentage").as("sentiment_up_pct"),
      p.getField("categories").as("categories"),
      p.getField("developer_data").getField("forks").as("forks"),
      p.getField("developer_data").getField("stars").as("stars"),
      p.getField("developer_data").getField("subscribers").as("subscribers"),
      p.getField("developer_data").getField("total_issues").as("total_issues"),
      p.getField("developer_data").getField("closed_issues").as("closed_issues"),
      p.getField("developer_data").getField("pull_request_contributors")
        .as("pr_contributors"),
      p.getField("developer_data").getField("commit_count_4_weeks")
        .as("commit_count_4w"),
      p.getField("market_data").getField("total_value_locked").as("tvl"),
      p.getField("market_data").getField("mcap_to_tvl_ratio").as("mcap_tvl_ratio"),
      p.getField("market_data").getField("fdv_to_tvl_ratio").as("fdv_tvl_ratio"),
      p.getField("market_data").getField("ath_change_percentage").getField("usd")
        .as("ath_change_pct"),
      p.getField("market_data").getField("circulating_supply").as("circulating_supply"),
      p.getField("market_data").getField("price_change_percentage_7d")
        .as("price_change_7d"),
      p.getField("market_data").getField("price_change_percentage_30d")
        .as("price_change_30d"),
      p.getField("market_data").getField("price_change_percentage_1y")
        .as("price_change_1y"),
      // links.homepage[0] if links.homepage else None
      element_at(p.getField("links").getField("homepage"), 1).as("homepage"))
  }
}
