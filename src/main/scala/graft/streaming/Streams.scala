package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming parity layer (SURVEY.md §2.10). The reference has
  * no true streams — its "live"/"daily" jobs are scheduled batch with an
  * idempotency check (derivatives_snapshot_etl.py:48-56). The faithful
  * Spark form is `Trigger.AvailableNow`: drain whatever new files landed,
  * checkpoint, stop — rerunnable on any schedule with exactly-once sink
  * semantics, which subsumes the reference's cache-existence check.
  *
  * Scale notes: watermark + dropDuplicates gives bounded state for the
  * dedup (the streaming analog of the snapshot-exists check); the same
  * code serves a continuous micro-batch trigger unchanged.
  */
object Streams {

  /** Incremental snapshot ingestion: new parquet files → dedup on the
    * snapshot key → append to the lake, partitioned by day. */
  def snapshotIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String,
      tsCol: String, keyCols: Seq[String]): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark(tsCol, "1 day")
      .dropDuplicates(keyCols :+ tsCol)
      .withColumn("snapshot_day", date_trunc("day", col(tsCol)))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .partitionBy("snapshot_day")
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Windowed live aggregation (the dashboard feed): per event-type
    * tumbling-window counts/sums with late-data tolerance. */
  def liveAgg(spark: SparkSession, sourceDir: String, schema: StructType,
      window_ : String, slide: String, watermark: String): DataFrame =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
}
