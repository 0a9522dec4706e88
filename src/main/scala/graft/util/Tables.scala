package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §2).
  *
  * All reads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file scan. At 100 TB the same call sites
  * work unchanged: the paths become a partitioned lake directory and Spark
  * splits files into `maxPartitionBytes`-sized tasks; nothing here assumes
  * a row count.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize one timestamp column to the published TimestampType (UTC
    * instant), whatever physical encoding the current lake writer used.
    * A 100 TB lake WILL contain mixed-writer parquet; loaders publish a
    * type contract, they do not forward whatever the last writer chose:
    *   - TIMESTAMP(NANOS) → long under `spark.sql.legacy.parquet.nanosAsLong`
    *     (set in Sessions): floor-divide to µs — the same truncation DuckDB
    *     applies on read, so oracle comparisons see identical instants.
    *     ONLY where a nanos encoding has actually been observed
    *     (`longIsNanos = true` — events.ts, the r1-r5 writer): a bare long
    *     is ambiguous (nanos? micros? epoch-days?), and decoding an
    *     unobserved encoding with the wrong unit would load silently as
    *     ~1970 instants. Elsewhere a long column fails loudly so the NEW
    *     encoding gets an explicit decision here (ADVICE r7).
    *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ: cast to
    *     TimestampType. The session timezone is pinned UTC, so the wall-clock
    *     fields are reinterpreted as the same UTC instant DuckDB reads.
    *   - timestamp[us/ms] isAdjustedToUTC=true → already TimestampType.
    * Anything else fails loudly at load instead of as a downstream analysis
    * error in whichever query touches the column first. */
  private def normTs(df: DataFrame, c: String, longIsNanos: Boolean = false): DataFrame =
    df.schema(c).dataType match {
      case LongType if longIsNanos =>
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case LongType =>
        throw new IllegalStateException(
          s"$c: raw INT64 with no known unit for this table — decide the " +
            "encoding explicitly in Tables.normTs (only events.ts has an " +
            "observed long-nanos history)")
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"$c: unsupported physical type $other — extend Tables.normTs")
    }

  def lineitem(s: SparkSession, d: String): DataFrame = normTs(table(s, d, "lineitem"), "l_shipdate")
  def orders(s: SparkSession, d: String): DataFrame   = normTs(table(s, d, "orders"), "o_orderdate")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  /** events published schema: event_id long, ts timestamp, user_id long,
    * event_type string, value double, props string (EncodingInvariantSpec
    * pins it). value/props casts are no-ops today and survive a writer
    * switching to float/large_string the way ts survived NTZ. */
  def events(s: SparkSession, d: String): DataFrame =
    normTs(table(s, d, "events"), "ts", longIsNanos = true)
      .withColumn("value", col("value").cast(DoubleType))
      .withColumn("props", col("props").cast(StringType))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fixed-cardinality dimension tables (25 nations / 5 regions at every
    * scale factor): always broadcast them so dimension joins never shuffle
    * the fact side. This is the `Series.map`-style dict-lookup join of the
    * reference (pipeline_helpers.py:249-250) done the Spark way.
    */
  def nation(s: SparkSession, d: String): DataFrame = broadcast(table(s, d, "nation"))
  def region(s: SparkSession, d: String): DataFrame = broadcast(table(s, d, "region"))
}
