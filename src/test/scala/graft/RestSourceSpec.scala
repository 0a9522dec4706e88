package graft

import graft.ingest.ChunkedFetch
import graft.sources.RestFixture
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** DSv2 `graft-rest` connector (SURVEY.md §2.1 REST-source rows;
  * VERDICT r12 #6): short-name format resolution, one task per
  * page/chunk, column pruning reaching the reader, and — the contract
  * that makes the connector the reference-parity source — bit-identical
  * assembly with the ChunkedFetch RDD path over the same chunk calendar
  * and fixture payloads. */
class RestSourceSpec extends SparkSpec {

  private val daySec = 24L * 60 * 60
  private val t2018 = Timestamp.valueOf("2018-01-01 00:00:00").getTime / 1000

  test("markets mode: format resolves by short name, one partition per page, full assembly") {
    val df = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 4).option("perPage", 50)
      .load()
    assert(df.rdd.getNumPartitions == 4, "one task per page")
    assert(df.count() == 200)
    // every page contributed, ranks are the global sequence
    assert(df.select("page").distinct().count() == 4)
    val ranks = df.select("rank").orderBy("rank").collect().map(_.getInt(0)).toSeq
    assert(ranks == (1 to 200))
    // pagination-invariance: a different page split assembles the same rows
    val other = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 8).option("perPage", 25)
      .load()
    assert(other.drop("page").exceptAll(df.drop("page")).count() == 0)
    assert(df.drop("page").exceptAll(other.drop("page")).count() == 0)
  }

  test("column pruning is pushed into the reader (scan schema = selected columns)") {
    val pruned = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 2).option("perPage", 10)
      .load().select("id", "price")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    val out = scan.output.map(_.name).toSet
    assert(out == Set("id", "price"),
      s"reader must materialize only the pruned columns, got $out")
    assert(pruned.collect().length == 20)
  }

  test("range mode assembles bit-identically with the ChunkedFetch path") {
    import spark.implicits._
    val to = t2018 + 1200 * daySec
    val viaDsv2 = spark.read.format("graft-rest")
      .option("mode", "range").option("fromSec", t2018).option("toSec", to)
      .load()
    val chunks = ChunkedFetch.chunkCalendar(t2018, to)
    assert(viaDsv2.rdd.getNumPartitions == chunks.size, "one task per chunk")
    val viaRdd = ChunkedFetch.fetchPartitioned(spark, chunks,
      (ch: ChunkedFetch.Chunk) => RestFixture.rangeRows(ch))
      .toDF("ts", "close")
    val a = viaDsv2.select("ts", "close").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = viaRdd.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "DSv2 and ChunkedFetch must assemble identical rows")
    // chunk column matches the calendar each ts falls in
    val byChunk = viaDsv2.groupBy("chunk").agg(min("ts").as("lo"), max("ts").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    byChunk.zip(chunks).foreach { case ((idx, lo, hi), ch) =>
      assert(idx == ch.idx && lo == ch.fromSec && hi == ch.toSec)
    }
  }

  test("micro-batch stream: page offsets drain exactly once and resume across growth") {
    val out = java.nio.file.Files.createTempDirectory("graft_rest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rest_ckpt").toString
    def drain(pages: Int): Unit = {
      val q = spark.readStream.format("graft-rest")
        .option("mode", "markets").option("pages", pages).option("perPage", 50)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first poll: upstream exposes 4 pages -> 200 rows, equal to the batch read
    drain(4)
    val first = spark.read.parquet(out)
    assert(first.count() == 200)
    val batch = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 4).option("perPage", 50).load()
    assert(first.exceptAll(batch).count() == 0 && batch.exceptAll(first).count() == 0,
      "stream drain must equal the batch read of the same pages")
    // second poll with the SAME checkpoint: upstream grew to 6 pages ->
    // only pages 4-5 append (the live_data_pipeline polling contract)
    drain(6)
    val second = spark.read.parquet(out)
    assert(second.count() == 300, "only the new pages may append")
    assert(second.select("page").distinct().count() == 6)
    assert(second.groupBy("rank").count().filter(col("count") > 1).count() == 0,
      "no rank may be ingested twice across restarts")
    // third poll, nothing new: a no-op
    drain(6)
    assert(spark.read.parquet(out).count() == 300)
  }

  test("transient page failure recovers through per-task retry/backoff") {
    graft.sources.RestChaos.reset()
    // page 1 throws on its first 2 attempts; maxRetries=3 covers it
    val df = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 3).option("perPage", 20)
      .option("maxRetries", 3).option("backoffMs", 1)
      .option("chaosFailPage", 1).option("chaosFailCount", 2)
      .option("chaosKey", "retry-recover")
      .load()
    assert(df.count() == 60, "recovered read must assemble every page in full")
    // assert attempts IMMEDIATELY after the first action: each subsequent
    // action re-executes the reader (DataFrames re-read their source) and
    // records one more — successful — attempt on the page
    assert(graft.sources.RestChaos.attemptsFor("retry-recover", 1) == 3,
      "the injected page must have been attempted exactly failCount+1 times")
    // partial-page recovery: the failing page's rows are complete and
    // identical to an uninjected read (no duplicate/missing rows from
    // the failed attempts)
    val clean = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 3).option("perPage", 20).load()
    assert(df.exceptAll(clean).count() == 0 && clean.exceptAll(df).count() == 0)
  }

  test("retry exhaustion surfaces a named per-partition error") {
    graft.sources.RestChaos.reset()
    val e = intercept[Throwable] {
      spark.read.format("graft-rest")
        .option("mode", "markets").option("pages", 2).option("perPage", 10)
        .option("maxRetries", 1).option("backoffMs", 1)
        .option("chaosFailPage", 0).option("chaosFailCount", 99)
        .option("chaosKey", "retry-exhaust")
        .load().count()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("failed after 2 attempts"))),
      s"expected the graft-rest exhaustion error, got $e")
  }

  test("malformed payload rows are skipped, not surfaced, and accounted in the scan metric") {
    // every 5th rank arrives with a null id -> 4 of 20 rows per page drop
    val df = spark.read.format("graft-rest")
      .option("mode", "markets").option("pages", 2).option("perPage", 20)
      .option("chaosMalformedEvery", 5)
      .load()
    val rows = df.collect()
    assert(rows.length == 32, s"40 rows minus 8 malformed, got ${rows.length}")
    assert(!rows.exists(_.isNullAt(2)), "no malformed row may leak through")
    assert(df.filter(col("rank") % 5 === 0).count() == 0,
      "exactly the injected ranks must be missing")
    // the skip count is published through the DSv2 custom-metric channel
    // (visible as a scan-node SQL metric); the declared metric must exist
    import scala.jdk.CollectionConverters._
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.metrics.contains(graft.sources.RestChaos.SkipMetric),
      s"scan must declare the skip metric, has ${scan.metrics.keys}")
  }

  test("a user-supplied schema naming an unknown field fails at planning time") {
    val e = intercept[Throwable] {
      spark.read.format("graft-rest")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("price",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("definitely_not_a_field",
            org.apache.spark.sql.types.StringType))))
        .option("mode", "markets").option("pages", 1).load()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("definitely_not_a_field"))),
      s"expected a planning-time named-field error, got $e")
  }

  test("unknown mode and missing range bounds fail fast with a named error") {
    val e1 = intercept[Throwable] {
      spark.read.format("graft-rest").option("mode", "nope").load().collect()
    }
    assert(Iterator.iterate(e1)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("unknown mode"))))
    val e2 = intercept[Throwable] {
      spark.read.format("graft-rest").option("mode", "range").load().collect()
    }
    assert(Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("fromSec"))))
  }
}
