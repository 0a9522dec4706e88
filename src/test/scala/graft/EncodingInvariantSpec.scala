package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables

/** Loader type-normalization invariant (VERDICT r6 #2).
  *
  * The driver regenerated /root/testdata mid-round-6 and flipped events.ts
  * from parquet TIMESTAMP(NANOS) to timestamp[us] isAdjustedToUTC=false
  * (TIMESTAMP_NTZ to Spark), silently breaking every unix_* call downstream.
  * These tests pin the loader contract so the NEXT regeneration fails here,
  * loudly, instead of inside whichever query touches the column first:
  *
  *  1. fixture round-trip — events.ts written as epoch-nanos long,
  *     TIMESTAMP_NTZ, and TIMESTAMP must all load as TimestampType with the
  *     SAME instants;
  *  2. published schemas — the loaders' output schema on the real testdata
  *     is exactly the documented one, for every table.
  */
class EncodingInvariantSpec extends SparkSpec {
  import spark.implicits._

  // one instant per row, chosen to be exact at µs so all encodings agree
  private val micros = Seq(1704067200000000L, 1704070800123456L, 1735689599999999L)

  private def writeEvents(dir: String, ts: DataFrame => DataFrame): Unit = {
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, "view", 1.5 + i, s"""{"k":$i}""") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    ts(base).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedInstants(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType, s"dir=$dir")
    df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
  }

  test("events.ts loads as TimestampType with identical instants under long-nanos, NTZ, and TZ encodings") {
    val root = Files.createTempDirectory("graft_enc").toFile.getAbsolutePath
    // TIMESTAMP (isAdjustedToUTC=true)
    writeEvents(s"$root/tz", _.withColumn("ts", timestamp_micros(col("us"))))
    // TIMESTAMP_NTZ (isAdjustedToUTC=false) — what the r6 regeneration produced
    writeEvents(s"$root/ntz", _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    // epoch-nanos long — what TIMESTAMP(NANOS) becomes under nanosAsLong
    writeEvents(s"$root/nanos", _.withColumn("ts", col("us") * 1000L))

    val expected = micros.sorted
    assert(loadedInstants(s"$root/tz") === expected)
    assert(loadedInstants(s"$root/ntz") === expected)
    assert(loadedInstants(s"$root/nanos") === expected)
  }

  test("events.ts NTZ wall-clock is reinterpreted as the same UTC instant DuckDB reads") {
    // session tz is UTC, so 2024-01-01T00:00:00 NTZ must become that instant
    val root = Files.createTempDirectory("graft_enc_wall").toFile.getAbsolutePath
    writeEvents(s"$root/ntz", _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    val first = Tables.events(spark, s"$root/ntz")
      .orderBy("event_id").select("ts").as[Timestamp].head()
    assert(first === Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("a raw INT64 date column outside events.ts fails loudly instead of decoding as nanos") {
    // only events.ts has an observed long-nanos history; a future writer
    // emitting long micros/days for l_shipdate must NOT load as ~1970
    // instants via the nanos branch (ADVICE r7) — it must throw here
    val root = Files.createTempDirectory("graft_enc_long").toFile.getAbsolutePath
    Seq((1L, 2L, 3L, 1, 1.0, 2.0, 0.1, 0.2, "N", "O", 1704067200000000L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/lineitem.parquet")
    val e = intercept[IllegalStateException] { Tables.lineitem(spark, root) }
    assert(e.getMessage.contains("no known unit"))
  }

  test("loader output schemas on the real testdata match the published contract") {
    def fieldTypes(df: DataFrame): Seq[(String, DataType)] =
      df.schema.fields.toSeq.map(f => f.name -> f.dataType)

    assert(fieldTypes(Tables.events(spark, sf)) === Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    assert(fieldTypes(Tables.orders(spark, sf)) === Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType,
      "o_orderpriority" -> StringType))
    assert(fieldTypes(Tables.lineitem(spark, sf)) === Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType))
    assert(fieldTypes(Tables.documents(spark, sf)) === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fieldTypes(Tables.embeddings(spark, sf)) === Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }
}
