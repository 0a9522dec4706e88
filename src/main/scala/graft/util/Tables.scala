package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  /** events.ts: published schema is TimestampType (UTC instant). The lake has
    * been written with different physical encodings across regenerations, so
    * the loader normalizes every one of them instead of trusting a single
    * physical type:
    *   - TIMESTAMP(NANOS) → long under `spark.sql.legacy.parquet.nanosAsLong`
    *     (set in Session): floor-divide to µs — the same truncation DuckDB
    *     applies on read, so oracle comparisons see identical instants.
    *   - timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ: cast to
    *     TimestampType. The session timezone is pinned UTC, so the wall-clock
    *     fields are reinterpreted as the same UTC instant DuckDB reads.
    *   - timestamp[us/ms] isAdjustedToUTC=true → already TimestampType.
    * A 100 TB lake WILL contain mixed-writer parquet; normalizing at the
    * loader is the invariant every downstream query relies on. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType            => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType    => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType    => raw
      case other               =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other — extend Tables.events normalization")
    }
  }
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
