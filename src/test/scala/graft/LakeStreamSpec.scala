package graft

import graft.lake.Lake
import graft.streaming.Streams
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Lake cache semantics (mirrors unit-tests/test_caching_infrastructure.py:
  * miss → None, hit → loads, write persists) and the AvailableNow
  * streaming snapshot path. */
class LakeStreamSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_lake").toString

  test("Lake: miss returns None, write-then-read round-trips, snapshot idempotent") {
    import spark.implicits._
    val lake = new Lake(spark, tmp())
    assert(lake.readIfExists("bronze", "x").isEmpty)           // cache miss
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    lake.write(df, "bronze", "x")
    val back = lake.readIfExists("bronze", "x")                // cache hit
    assert(back.isDefined && back.get.count() == 2)

    val snap = Seq((1L, "2024-01-01")).toDF("id", "d")
    assert(lake.writeSnapshotIfAbsent(snap, "derivatives", "daily", "d", "2024-01-01"))
    assert(!lake.writeSnapshotIfAbsent(snap, "derivatives", "daily", "d", "2024-01-01"))
    assert(lake.read("derivatives", "daily").count() == 1)     // no duplicate append
  }

  test("Streams.snapshotIngest drains available data with dedup, exactly once") {
    import spark.implicits._
    val src = tmp(); val out = tmp(); val ckpt = tmp()
    val data = Seq(
      ("binance", "BTC-PERP", "2024-01-01 00:00:00"),
      ("binance", "BTC-PERP", "2024-01-01 00:00:00"), // duplicate snapshot row
      ("okx", "ETH-PERP", "2024-01-01 00:00:00"))
      .toDF("exchange", "symbol", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    data.coalesce(1).write.mode("overwrite").parquet(src)
    val q = Streams.snapshotIngest(spark, src, data.schema, ckpt, out,
      "ts", Seq("exchange", "symbol"))
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == 2) // dedup dropped the duplicate
    // re-run: AvailableNow + checkpoint = nothing new to process
    val q2 = Streams.snapshotIngest(spark, src, data.schema, ckpt, out,
      "ts", Seq("exchange", "symbol"))
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("Streams.liveAgg plans a watermarked windowed aggregation") {
    import spark.implicits._
    val src = tmp()
    val data = Seq(("click", "2024-01-01 00:00:30", 1.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    data.write.mode("overwrite").parquet(src)
    val agg = Streams.liveAgg(spark, src, data.schema, "5 minutes", "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("live_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode emits only closed windows; planning + run succeeding is the contract
    assert(spark.table("live_out").columns.contains("event_type"))
  }

  test("Streams.sessionAgg closes and emits sessions once the watermark passes") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "ts_s", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.sessionAgg(spark, src, schema, "5 minutes", "30 minutes")
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: three events within the 5-minute gap → ONE open session
    ev(Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:01:00", 2.0),
      (1L, "2024-01-01 10:02:00", 4.0))).coalesce(1).write.mode("append").parquet(src)
    drain()
    // run 2: a much later event advances the watermark far past the first
    // session's end → the first session closes and is emitted; the new
    // session stays open (nothing after it to advance the watermark)
    ev(Seq((1L, "2024-01-01 13:00:00", 8.0))).coalesce(1).write.mode("append").parquet(src)
    drain()
    val got = spark.read.parquet(out)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect()
    assert(got.length == 1)
    val (uid, start, end, n, total) = got.head
    assert(uid == 1L && n == 3L && total == 7.0)
    assert(start.toString == "2024-01-01 10:00:00.0")
    // session end = last event + gap (5 minutes past 10:02)
    assert(end.toString == "2024-01-01 10:07:00.0")
  }

  test("Streams.corpusIngest appends only unseen-content documents across runs") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val corpus = tmp() + "/corpus"
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    def drain(): Unit = {
      val q = Streams.corpusIngest(spark, src, schema, ckpt, corpus)
      q.awaitTermination()
    }
    docs(Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // in-stream dup (doc 3 repeats doc 1's content) dropped by the
    // checkpointed dropDuplicates state
    assert(spark.read.parquet(corpus).count() == 2)
    // run 2 simulates CHECKPOINT LOSS (fresh checkpoint, corpus intact):
    // dropDuplicates state is empty, so only the left-anti join against
    // the existing corpus can stop the re-delivered and duplicate docs —
    // this is the path the stream-static join exists for
    val ckpt2 = tmp()
    def drain2(): Unit = {
      val q = Streams.corpusIngest(spark, src, schema, ckpt2, corpus)
      q.awaitTermination()
    }
    docs(Seq((4L, "beta text"), (5L, "gamma text")))
      .coalesce(1).write.mode("append").parquet(src)
    drain2()
    val got = spark.read.parquet(corpus)
    assert(got.count() == 3)
    assert(got.select("text").distinct().count() == 3)
  }

  test("Streams.packIngest continues per-language offsets across batches and checkpoint loss") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val pk = tmp() + "/packed"
    def docs(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("srcT"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val b1 = Seq((1L, words(100), "en"), (2L, words(200), "en"), (3L, words(50), "de"))
    val b2 = Seq((4L, words(300), "en"))
    val b3 = Seq((5L, words(10), "de"))
    val schema = docs(Nil).schema
    def store() = spark.read.parquet(pk)
      .select("doc_id", "lang", "ws_tokens", "start_off", "pack_id", "pack_span")
      .collect().map(_.toSeq).toSet
    // batch twin over the same docs: q_pack_sequences on a documents dir
    def batchTwin(rows: Seq[(Long, String, String)]) = {
      val d = tmp()
      docs(rows).coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      graft.queries.PrepQueries.packSequences.fn(spark, d).collect().map(_.toSeq).toSet
    }
    docs(b1).coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, ckpt, pk).awaitTermination()
    assert(store() === batchTwin(b1))
    // second batch: en continues at 300, de untouched
    docs(b2).coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, ckpt, pk).awaitTermination()
    assert(store() === batchTwin(b1 ++ b2))
    // checkpoint LOSS with new data: a fresh checkpoint re-delivers all
    // files as batch 0 — the file ledger must skip the packed ones while
    // the de stream continues at offset 50 for the new file
    docs(b3).coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, tmp(), pk).awaitTermination()
    assert(store() === batchTwin(b1 ++ b2 ++ b3),
      "old files skip; the new file extends its language's stream")
  }

  test("Streams.cmSketchIngest folds stream deltas to the batch-built sketch") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val sk = tmp() + "/sketch"
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    val b1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
    val b2 = Seq((3L, "alpha delta"))
    val b3 = Seq((4L, "gamma gamma epsilon"))
    def cells(rows: Seq[(Long, String)]) =
      graft.ops.TextOps.explodeTokens(docs(rows))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .select(explode(array((0 until 4).map(i => struct(lit(i).as("i"),
          graft.ops.TextOps.cmBucket(i, col("word"), 256).as("b"))): _*)).as("ib"),
          col("n"))
        .groupBy(col("ib.i").as("i"), col("ib.b").as("b")).agg(sum("n").as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    def folded() = Streams.cmSketch(spark, sk).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    docs(b1).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, ckpt, sk).awaitTermination()
    docs(b2).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, ckpt, sk).awaitTermination()
    // the stream-folded cells equal the batch-built cells over ALL docs,
    // through the same cmBucket identity (cell-wise merge property)
    assert(folded() === cells(b1 ++ b2))
    // checkpoint LOSS with new data: a fresh checkpoint re-delivers old
    // and new files together as batch 0 — the file ledger must skip the
    // merged files (no double counting) while folding the new one
    docs(b3).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, tmp(), sk).awaitTermination()
    assert(folded() === cells(b1 ++ b2 ++ b3),
      "old files skip, the new file merges")
  }

  test("Streams.corpusIngest(normalized) dedups re-encoded variants like the batch op") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val corpus = tmp() + "/corpus"
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    // doc 2 is doc 1 re-encoded (case/punct/space); doc 3 is genuinely new
    docs(Seq((1L, "Hello,   World!"), (2L, "hello world"), (3L, "other text")))
      .coalesce(1).write.mode("append").parquet(src)
    val q = Streams.corpusIngest(spark, src, schema, ckpt, corpus, normalized = true)
    q.awaitTermination()
    val got = spark.read.parquet(corpus)
    assert(got.count() == 2)
    // the surviving TEXT set matches the batch op on the same input
    val batch = graft.ops.Corpus.exactDedup(
      docs(Seq((1L, "Hello,   World!"), (2L, "hello world"), (3L, "other text")))
        .withColumn("n_chars", length(col("text"))),
      normalized = true)
    assert(got.select("text_hash").as[String].collect().toSet ==
      batch.select(graft.ops.TextOps.contentHash(
        graft.ops.TextOps.normalizeText(col("text"))).as("h")).as[String].collect().toSet)
  }

  test("Streams.corpusIngestNearDup drops band-blocked near-dups of corpus history, keeps fresh docs") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val corpus = tmp() + "/corpus"
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    def drain(): Unit = {
      val q = Streams.corpusIngestNearDup(spark, src, schema, ckpt, corpus)
      q.awaitTermination()
    }
    val a = (1 to 20).map(i => f"a$i%02d").mkString(" ")
    val b = (1 to 20).map(i => f"b$i%02d").mkString(" ")
    val c = (1 to 20).map(i => f"c$i%02d").mkString(" ")
    docs(Seq((1L, a), (2L, b))).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert(spark.read.parquet(corpus).count() == 2)
    // run 2: doc 3 duplicates history doc 1 verbatim (8/8 agreement →
    // drop via the stream-static band join, NOT the in-batch hash state);
    // doc 4 is genuinely new → keep, and lands with its signature columns
    docs(Seq((3L, a), (4L, c))).coalesce(1).write.mode("append").parquet(src)
    drain()
    val got = spark.read.parquet(corpus)
    assert(got.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // the persisted corpus IS the reference signature artifact
    assert((0 to 7).forall(k => got.columns.contains(s"mh$k")))
    // and the batch twin agrees: doc 3 drops, doc 4 keeps, under
    // q_dedup_incremental's est >= 0.5 rule on the same new/ref split
    val agree = (0 to 7).map(k =>
      when(col(s"a.mh$k") === col(s"b.mh$k"), 1).otherwise(0)).reduce(_ + _)
    val sigAll = graft.ops.TextOps.minhashSig(
      docs(Seq((1L, a), (2L, b), (3L, a), (4L, c))))
    val est = sigAll.as("a").filter(col("a.doc_id") >= 3L)
      .crossJoin(sigAll.as("b").filter(col("b.doc_id") <= 2L))
      .select(col("a.doc_id").as("n"), (agree.cast("double") / 8).as("e"))
      .groupBy("n").agg(max("e").as("maxe"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est(3L) >= 0.5 && est(4L) < 0.5)
  }

  test("Streams.curateIngest keeps the batch-filtered set, redacted") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp() + "/curated"
    // doc 1 passes Gopher (52 words, 2 stopwords, alpha) and carries an
    // email to redact; doc 2 fails the 50-word floor; doc 3 fails the
    // alpha-fraction rule
    val passTxt = "the quick brown fox mails jane.doe@example.com from a box " +
      (1 to 42).map(i => f"word$i%03d").mkString(" ")
    val numsTxt = "the a " + (1 to 50).map(_.toString).mkString(" ")
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    docs(Seq((1L, passTxt), (2L, "too short"), (3L, numsTxt)))
      .coalesce(1).write.mode("append").parquet(src)
    val q = Streams.curateIngest(spark, src, schema, ckpt, out)
    q.awaitTermination()
    val got = spark.read.parquet(out).select("doc_id", "text")
      .as[(Long, String)].collect()
    assert(got.length == 1)
    assert(got.head._1 == 1L)
    assert(got.head._2 == passTxt.replace("jane.doe@example.com", "<EMAIL>"))
    // stream output = batch filter + redaction on the same input
    val batch = docs(Seq((1L, passTxt), (2L, "too short"), (3L, numsTxt)))
      .filter(graft.ops.TextOps.gopher(col("text")).getField("gopher_pass"))
      .select(col("doc_id"),
        graft.ops.TextOps.piiRedact(col("text")).as("text"))
      .as[(Long, String)].collect()
    assert(got.toSet == batch.toSet)
  }

  test("Streams.funnelStages carries per-user-day staged mins across runs and matches the batch funnel") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, String, String)]) =
      rows.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.funnelStages(spark, src, schema)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: user 1 views then clicks; user 2 clicks only (no view →
    // click must NOT stage); user 1 also has a click at exactly vt
    // (strictly-after rule must reject it)
    ev(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 10:05:00", "click"),
      (2L, "2024-01-01 09:00:00", "click")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // batch 2 (separate run = restart): user 1 purchases — must convert
    // against the click staged in run 1; user 2 views (too late for the
    // run-1 click, which stays unstaged under in-order arrival)
    ev(Seq(
      (1L, "2024-01-01 11:00:00", "purchase"),
      (2L, "2024-01-01 11:30:00", "view")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // consumers read the LAST emitted row per (user, day)
    val last = spark.read.parquet(out).as[Streams.FunnelStaged].collect()
      .groupBy(s => (s.user_id, s.day))
      .map { case (k, rows) =>
        k -> rows.maxBy(s => (s.vt.size + s.ct.size + s.pt.size)) }
    val day = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val u1 = last((1L, day))
    assert(u1.vt.contains(tsUs("2024-01-01 10:00:00")))
    assert(u1.ct.contains(tsUs("2024-01-01 10:05:00"))) // 10:00 click == vt rejected
    assert(u1.pt.contains(tsUs("2024-01-01 11:00:00"))) // staged across the restart
    val u2 = last((2L, day))
    assert(u2.vt.contains(tsUs("2024-01-01 11:30:00")) && u2.ct.isEmpty && u2.pt.isEmpty)

    // the batch q_event_funnel on the same events agrees at the day level:
    // 2 users, 2 views, 1 click-after-view, 1 purchase-after-click
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val batch = graft.queries.SessionQueries.eventFunnel.fn(spark, evDir)
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect()
    assert(batch.length == 1)
    assert(batch.head == ((day, 2L, 2L, 1L, 1L)))
  }

  private def tsUs(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000L

  test("Streams.funnelDaily publishes the batch q_event_funnel rollup across restarted drains") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val staged = tmp() + "/staged"
    val rollup = tmp() + "/rollup"
    def ev(rows: Seq[(Long, String, String)]) =
      rows.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.funnelDaily(spark, src, schema, ckpt, staged, rollup)
      q.awaitTermination()
    }
    // two days, three users, conversions completing across the restart
    ev(Seq(
      (1L, "2024-03-01 10:00:00", "view"),
      (1L, "2024-03-01 10:05:00", "click"),
      (2L, "2024-03-01 09:00:00", "view"),
      (3L, "2024-03-02 08:00:00", "click"))) // click with no view: never stages
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    ev(Seq(
      (1L, "2024-03-01 11:00:00", "purchase"), // completes across restart
      (2L, "2024-03-01 11:30:00", "click"),
      (3L, "2024-03-02 09:00:00", "view")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // the published rollup equals the batch operator run over the same lake
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val got = spark.read.parquet(rollup)
      .select("day", "n_users", "n_view", "n_click_after_view", "n_purchase_after_click")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect().toSet
    val batch = graft.queries.SessionQueries.eventFunnel.fn(spark, evDir)
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect().toSet
    assert(got == batch, s"stream rollup $got != batch funnel $batch")
    // and the expected conversions themselves: day 1 = 2 users / 2 views /
    // 2 clicks-after-view / 1 purchase; day 2 = 1 user, view only
    val d1 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val d2 = java.sql.Timestamp.valueOf("2024-03-02 00:00:00")
    assert(got == Set((d1, 2L, 2L, 2L, 1L), (d2, 1L, 1L, 0L, 0L)))
  }

  test("Streams.anomalyMonitor publishes the batch q_event_anomaly flags across drains") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp()
    val staged = tmp() + "/staged"; val flags = tmp() + "/flags"
    def ev(rows: Seq[(Long, String, String)]) =
      rows.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    // 7 quiet days + one 10x spike day for clicks; views flat. n matters:
    // a single outlier among n samples caps at z = (n-1)/sqrt(n) (it
    // inflates the sd it is scored against), so 5 days can never flag
    // (max 1.79) — 8 days bounds at 2.47 and the spike lands ~2.46
    def dayEvents(day: Int, clicks: Int) =
      (1 to clicks).map(i => (i.toLong, f"2024-03-0$day%d 10:${i % 60}%02d:00", "click")) ++
        Seq((99L, f"2024-03-0$day%d 11:00:00", "view"))
    val batch1 = (1 to 5).flatMap(dayEvents(_, 2))
    val batch2 = dayEvents(6, 2) ++ dayEvents(7, 2) ++ dayEvents(8, 20) // late spike
    // reference stats trained on the FULL horizon (what a production
    // monitor trains on history; here = batch parity by construction)
    val allEv = ev(batch1 ++ batch2)
    val stats = graft.queries.SessionQueries.anomalyStats(
      graft.queries.SessionQueries.dailyCounts(allEv))
    def drain(): Unit = {
      val q = Streams.anomalyMonitor(spark, src, schema, ckpt, staged, flags, stats)
      q.awaitTermination()
    }
    ev(batch1).coalesce(1).write.mode("append").parquet(src)
    drain()
    val afterFirst = spark.read.parquet(flags)
    assert(afterFirst.select("day").distinct().count() == 5) // spike not yet seen
    ev(batch2).coalesce(1).write.mode("append").parquet(src)
    drain() // restart: only the new file drains, staged partials accumulate
    // z/is_anomaly are Option: the flat-rate "view" type has sd = 0 and
    // scores NULL by contract (no usable baseline)
    val got = spark.read.parquet(flags)
      .select("event_type", "day", "n", "z", "is_anomaly")
      .as[(String, java.sql.Timestamp, Long, Option[Double], Option[Boolean])]
      .collect().toSet
    // batch twin over the same events, scored against the same stats
    val batchFlags = graft.queries.SessionQueries.anomalyScore(
        graft.queries.SessionQueries.dailyCounts(allEv), stats)
      .as[(String, java.sql.Timestamp, Long, Option[Double], Option[Boolean])]
      .collect().toSet
    assert(got == batchFlags, s"stream flags $got != batch flags $batchFlags")
    // every view row is null-scored; the spike day is the only click anomaly
    assert(got.filter(_._1 == "view").forall(r => r._4.isEmpty && r._5.isEmpty))
    val clickAnoms = got.filter(r => r._1 == "click" && r._5.contains(true))
    assert(clickAnoms.map(_._2) ==
      Set(java.sql.Timestamp.valueOf("2024-03-08 00:00:00")))
  }

  test("Streams.sessionAgg merges within-gap events across a restart and drops beyond-watermark late data") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "ts_s", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.sessionAgg(spark, src, schema, "5 minutes", "30 minutes")
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: an open session — watermark (10:02 − 30m) is far before its
    // end, nothing emits
    ev(Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:02:00", 2.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    assert(!new java.io.File(out + "/_SUCCESS").exists() ||
      spark.read.parquet(out).count() == 0)
    // run 2 (restart from the checkpoint): 10:04 is within the gap AND
    // above the carried watermark → must MERGE into the restored session
    // state; 13:00 advances the watermark to 12:30 and closes it
    ev(Seq((1L, "2024-01-01 10:04:00", 4.0), (1L, "2024-01-01 13:00:00", 8.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // run 3: 10:30 is BEYOND the watermark (12:30) → dropped, per the
    // session-window contract; 16:00 advances the watermark and closes
    // the 13:00 session, whose count must NOT include the dropped event
    ev(Seq((1L, "2024-01-01 10:30:00", 16.0), (1L, "2024-01-01 16:00:00", 32.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val got = spark.read.parquet(out)
      .select("session_start", "session_end", "n_events", "total_value")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect()
      .sortBy(_._1.getTime)
    assert(got.length == 2, s"got ${got.toSeq}")
    // cross-restart merge: one session of all three run-1/run-2 events
    assert(got(0) == ((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 10:09:00"), 3L, 7.0)))
    // the late 10:30 event appears NOWHERE: not its own session, not
    // folded into the 13:00 one
    assert(got(1) == ((java.sql.Timestamp.valueOf("2024-01-01 13:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 13:05:00"), 1L, 8.0)))
  }

  test("Streams.attributionJoin drops beyond-watermark clicks and pairs in-watermark ones across a restart") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.attributionJoin(spark, src, schema,
          watermark = "1 hour", lookback = "2 hours")
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1 advances both watermarks to ~19:00 (clicks) / 19:10 (purchases)
    ev(Seq(
      (1L, 10L, "2024-05-01 10:00:00", "click"),
      (2L, 10L, "2024-05-01 20:00:00", "click"),
      (3L, 10L, "2024-05-01 20:10:00", "purchase")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // run 2 (restart): the global watermark carried in the checkpoint is
    // min(19:00, 19:10) = 19:00. A click at 17:30 is BELOW it → dropped
    // on input (stream-stream joins late-filter against the GLOBAL
    // watermark; the lookback bound only governs state retention of rows
    // already accepted) even though it satisfies the 19:30 purchase's
    // range [17:30, 19:30]. A click at 19:15 is above it → pairs.
    ev(Seq(
      (4L, 10L, "2024-05-01 17:30:00", "click"),
      (6L, 10L, "2024-05-01 19:15:00", "click"),
      (5L, 10L, "2024-05-01 19:30:00", "purchase")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val pairs = spark.read.parquet(out)
      .select("purchase_id", "click_ts").as[(Long, java.sql.Timestamp)].collect()
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2.toString).toSet }
    // purchase 3 stays buffered across the restart (a match can still
    // arrive while the click watermark is below 20:10): run 1 pairs it
    // with 20:00, run 2's in-watermark 19:15 click joins it RETROACTIVELY
    assert(pairs(3L) == Set("2024-05-01 20:00:00.0", "2024-05-01 19:15:00.0"))
    // purchase 5: the in-watermark click only — 17:30 appears nowhere
    assert(pairs(5L) == Set("2024-05-01 19:15:00.0"), s"pairs=$pairs")
  }

  test("Streams.attributionJoin: stream-stream pairs fold to the batch last-touch across drains") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.attributionJoin(spark, src, schema)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: clicks only — they enter join state and must survive restart
    ev(Seq(
      (1L, 10L, "2024-05-01 10:00:00", "click"),
      (2L, 10L, "2024-05-01 10:05:00", "click"),
      (5L, 30L, "2024-05-01 09:00:00", "click")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // run 2: purchases — u10 in-window (both clicks), u20 clickless,
    // u30's click sits outside the 7-day lookback
    ev(Seq(
      (3L, 10L, "2024-05-01 10:10:00", "purchase"),
      (4L, 20L, "2024-05-01 09:00:00", "purchase"),
      (6L, 30L, "2024-05-10 09:00:00", "purchase")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val pairs = spark.read.parquet(out)
      .select("purchase_id", "click_ts").as[(Long, java.sql.Timestamp)].collect()
    // every in-window pair, nothing else: u10's purchase saw BOTH clicks
    assert(pairs.map(_._1).toSet == Set(3L))
    assert(pairs.length == 2)
    // fold-at-read last-touch == the batch operator's attributed rows
    val folded = pairs.groupBy(_._1)
      .map { case (p, cs) => p -> cs.map(_._2.getTime * 1000L).max }
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val batch = graft.queries.SessionQueries.eventAttribution.fn(spark, evDir)
      .select("event_id", "attr_click_us")
      .as[(Long, Option[Long])].collect()
    assert(batch.map(_._1).toSet == Set(3L, 4L, 6L), "batch keeps unattributed purchases")
    val batchAttributed = batch.collect { case (id, Some(us)) => id -> us }.toMap
    assert(folded == batchAttributed,
      s"stream last-touch $folded != batch $batchAttributed")
  }

  test("Streams.streamingEma carries per-asset state across micro-batch runs") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ticks(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("key", "secs", "value")
    val schema = ticks(Nil).schema
    def drain(): Unit = {
      // durable sink: checkpoint recovery across runs (memory sink can't)
      val q = Streams.streamingEma(spark, src, schema, span = 3)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: two assets, two ticks each
    ticks(Seq((1L, 10L, 10.0), (1L, 20L, 20.0), (2L, 10L, 100.0), (2L, 20L, 50.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    // batch 2: one more tick per asset — must continue the recurrence
    ticks(Seq((1L, 30L, 30.0), (2L, 30L, 0.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val got = spark.read.parquet(out).as[Streams.EmaOut].collect()
      .map(r => (r.key, r.secs) -> r.ema).toMap
    // reference: ewm(adjust=False), alpha = 2/(3+1) = 0.5, seeded by first value
    val a = 0.5
    assert(got((1L, 10L)) == 10.0)
    assert(got((1L, 20L)) == 10.0 + a * (20.0 - 10.0))       // 15.0
    assert(got((1L, 30L)) == 15.0 + a * (30.0 - 15.0))       // 22.5 — state crossed runs
    assert(got((2L, 10L)) == 100.0)
    assert(got((2L, 20L)) == 75.0)
    assert(got((2L, 30L)) == 37.5)
  }

  test("Streams.seqNgramStages emits boundary-spanning trigrams once; rollup equals the batch miner") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.seqNgramStages(spark, src, schema)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val cyc = Seq("A", "B", "C")
    // run 1: user 1 has only A,B (no trigram yet); user 2 a 4-event path;
    // user 3 seven A>B>C cycles (support for the >=5 floor)
    ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:01:00", "B"),
      (10L, 2L, "2024-01-01 09:00:00", "X"),
      (11L, 2L, "2024-01-01 09:01:00", "Y"),
      (12L, 2L, "2024-01-01 09:02:00", "Z"),
      (13L, 2L, "2024-01-01 09:03:00", "W")) ++
      (0 until 21).map(i =>
        (100L + i, 3L, f"2024-01-01 11:$i%02d:00", cyc(i % 3))))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val run1 = spark.read.parquet(out)
      .as[Streams.SeqTri].collect().toSeq
    // user 1 has no trigram yet; user 2 has XYZ + YZW; user 3 has 19
    assert(!run1.exists(_.user_id == 1L))
    assert(run1.count(_.user_id == 2L) == 2)
    assert(run1.count(_.user_id == 3L) == 19)
    // run 2 (restart): user 1's C,D complete A>B>C and B>C>D across the
    // checkpoint boundary — the trigrams no per-batch window could see
    ev(Seq(
      (3L, 1L, "2024-01-01 10:02:00", "C"),
      (4L, 1L, "2024-01-01 10:03:00", "D")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val staged = spark.read.parquet(out).as[Streams.SeqTri].collect().toSeq
    val u1 = staged.filter(_.user_id == 1L).map(t => (t.e1, t.e2, t.e3))
    assert(u1.sorted == Seq(("A", "B", "C"), ("B", "C", "D")))
    assert(staged.size == run1.size + 2, "run 2 emits exactly the 2 new trigrams")

    // the read-side rollup equals the batch q_event_seq_ngram on the lake
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val got = Streams.seqNgramRollup(spark.read.parquet(out))
      .as[(String, String, String, Long, Long)].collect().toSet
    val batch = graft.queries.SessionQueries.eventSeqNgram.fn(spark, evDir)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got == batch, s"stream rollup $got != batch $batch")
    // A>B>C appears 7x for user 3 plus once for user 1 across the restart
    assert(got.contains(("A", "B", "C", 8L, 2L)))
    assert(got.contains(("B", "C", "A", 6L, 1L)))
    assert(got.contains(("C", "A", "B", 6L, 1L)))
    assert(got.size == 3)
  }

  test("Streams.gapIngest emits boundary-spanning gaps once; rollup equals the batch profile") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.gapIngest(spark, src, schema)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: user 1 clicks at 10:00/10:01/10:03 (gaps 60s, 120s); its view
    // at 10:00 is a DIFFERENT key (no gap); user 2 one click (no gap yet)
    ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (2L, 1L, "2024-01-01 10:01:00", "click"),
      (3L, 1L, "2024-01-01 10:03:00", "click"),
      (4L, 1L, "2024-01-01 10:00:30", "view"),
      (5L, 2L, "2024-01-01 09:00:00", "click")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val run1 = spark.read.parquet(out).as[Streams.GapRow].collect().toSeq
    assert(run1.filter(_.user_id == 1L).map(_.gap).sorted == Seq(60000000L, 120000000L))
    assert(!run1.exists(_.user_id == 2L), "a single event has no gap")
    // run 2 (restart): user 2's second click closes the gap that SPANS the
    // checkpoint boundary; user 1 adds one more (10:03 -> 10:10)
    ev(Seq(
      (6L, 2L, "2024-01-01 09:05:00", "click"),
      (7L, 1L, "2024-01-01 10:10:00", "click")))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    val staged = spark.read.parquet(out).as[Streams.GapRow].collect().toSeq
    assert(staged.size == run1.size + 2, "run 2 emits exactly the 2 new gaps")
    assert(staged.filter(_.user_id == 2L).map(_.gap) == Seq(300000000L),
      "the boundary-spanning gap emits exactly once")

    // read-side rollup equals the batch operator on the same lake
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    val got = Streams.gapRollup(spark.read.parquet(out)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSet
    val batch = graft.queries.SessionQueries.eventInterarrival.fn(spark, evDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSet
    assert(got == batch, s"stream rollup $got != batch $batch")
    assert(got.exists(t => t._1 == "click" && t._2 == 4L))
  }

  test("Streams.packIngest: null-text docs pack no rows; their file still ledgers (no replay re-scan)") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val pk = tmp() + "/packed"
    def docs(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("srcT"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val schema = docs(Nil).schema
    // batch 1: one real doc + one null-text doc in the same file
    docs(Seq((1L, words(100), "en"), (2L, null, "en")))
      .coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, ckpt, pk).awaitTermination()
    val store1 = spark.read.parquet(pk)
    assert(store1.count() == 1, "the null-text doc must not write a pack row")
    assert(store1.filter(col("ws_tokens").isNull || col("start_off").isNull ||
      col("pack_id").isNull).count() == 0, "a pack is a token run — no null spans")
    // batch 2: a file whose EVERY doc is null-text — zero pack rows, but
    // the file must enter the sidecar ledger
    docs(Seq((3L, null, "en"), (4L, null, "de")))
      .coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, ckpt, pk).awaitTermination()
    assert(spark.read.parquet(pk).count() == 1)
    // checkpoint LOSS replay + a new doc: the all-null file re-delivers but
    // contributes nothing (ledgered); the new doc continues en at 100
    docs(Seq((5L, words(40), "en")))
      .coalesce(1).write.mode("append").parquet(src)
    Streams.packIngest(spark, src, schema, tmp(), pk).awaitTermination()
    val store3 = spark.read.parquet(pk)
    assert(store3.count() == 2, "replay must not duplicate or resurrect rows")
    val d5 = store3.filter(col("doc_id") === 5L).head()
    assert(d5.getAs[Long]("start_off") == 100L,
      "the en stream continues after the ledgered zero-pack file")
  }

  test("Streams.cmSketchIngest: an all-zero-cell file ledgers a sentinel and never re-merges on replay") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val sk = tmp() + "/sketch"
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    def folded() = Streams.cmSketch(spark, sk).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    docs(Seq((1L, "alpha beta alpha"))).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, ckpt, sk).awaitTermination()
    val after1 = folded()
    // an all-NULL-text file: split(null) explodes to zero word rows, so
    // the file contributes zero cells — only its sentinel may land
    docs(Seq((2L, null), (3L, null))).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, ckpt, sk).awaitTermination()
    assert(folded() === after1, "zero-cell file must not change the sketch")
    val sentinels = spark.read.parquet(sk).filter(col("i") === -1)
      .select("src_file").distinct().count()
    assert(sentinels == 2, "every ingested file ledgers a sentinel, cells or not")
    // checkpoint LOSS: both files re-deliver as batch 0 — the sentinel
    // ledger must skip them BOTH (without the zero-cell sentinel the null
    // file would re-scan forever); the new file still merges
    docs(Seq((4L, "beta beta"))).coalesce(1).write.mode("append").parquet(src)
    Streams.cmSketchIngest(spark, src, schema, tmp(), sk).awaitTermination()
    val expected = graft.ops.TextOps.explodeTokens(
      docs(Seq((1L, "alpha beta alpha"), (4L, "beta beta"))))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(explode(array((0 until 4).map(i => struct(lit(i).as("i"),
        graft.ops.TextOps.cmBucket(i, col("word"), 256).as("b"))): _*)).as("ib"),
        col("n"))
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b")).agg(sum("n").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded() === expected, "replayed files skip; the fresh file merges once")
  }

  test("Streams.hllIngest: stream registers equal the batch sketch; replay is idempotent with NO ledger") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val sk = tmp() + "/hll"
    def docs(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("srcT"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    val schema = docs(Nil).schema
    val b1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
    val b2 = Seq((3L, "alpha delta epsilon"))
    def streamRegs() = Streams.hllRegisters(spark, sk).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def batchRegs(rows: Seq[(Long, String)]) = {
      val d = tmp()
      docs(rows).coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      graft.queries.CorpusStatsQueries.textVocabHll.fn(spark, d).collect()
        .filter(_.getLong(0) >= 0)
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    docs(b1).coalesce(1).write.mode("append").parquet(src)
    Streams.hllIngest(spark, src, schema, ckpt, sk).awaitTermination()
    docs(b2).coalesce(1).write.mode("append").parquet(src)
    Streams.hllIngest(spark, src, schema, ckpt, sk).awaitTermination()
    assert(streamRegs() === batchRegs(b1 ++ b2),
      "stream-folded registers equal the batch operator on the union")
    // checkpoint LOSS, no new data: the whole history re-delivers as
    // batch 0 and re-appends its registers — max is idempotent, so the
    // folded sketch is UNCHANGED, with no file ledger anywhere
    Streams.hllIngest(spark, src, schema, tmp(), sk).awaitTermination()
    assert(streamRegs() === batchRegs(b1 ++ b2),
      "full-history replay must be absorbed by the max-merge algebra")
  }

  test("Lake.compact rewrites small files per leaf, preserves results, and is idempotent") {
    import spark.implicits._
    val root = tmp()
    val lake = new Lake(spark, root)
    def dataFiles(dir: String): Seq[java.io.File] = {
      val d = new java.io.File(dir)
      val here = Option(d.listFiles()).getOrElse(Array.empty).toSeq
      here.filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")) ++
        here.filter(_.isDirectory).flatMap(sd => dataFiles(sd.getPath))
    }
    val df = (1 to 500).map(i => (i.toLong, s"v$i", s"l${i % 3}")).toDF("id", "v", "lang")

    // FLAT artifact scattered over 20 small files -> 1 file, same rows
    lake.write(df.repartition(20), "gold", "mix")
    assert(dataFiles(s"$root/gold/mix").size == 20)
    val before = lake.read("gold", "mix").collect().map(_.toSeq).toSet
    val st = lake.compact("gold", "mix")
    assert(st.filesBefore == 20 && st.filesAfter == 1 && st.leavesRewritten == 1,
      s"unexpected stats: $st")
    assert(st.rowsVerified == 500)
    assert(dataFiles(s"$root/gold/mix").size == 1)
    assert(lake.read("gold", "mix").collect().map(_.toSeq).toSet === before,
      "query results must be unchanged by compaction")
    // idempotent: a second compact touches nothing
    val st2 = lake.compact("gold", "mix")
    assert(st2.leavesRewritten == 0 && st2.filesBefore == st2.filesAfter)

    // PARTITIONED artifact: each lang leaf compacts independently; the
    // partition layout (and so pruning) is preserved
    lake.write(df.repartition(10), "gold", "part", partitionBy = Seq("lang"))
    val partBefore = lake.read("gold", "part").collect().map(_.toSeq).toSet
    assert(dataFiles(s"$root/gold/part").size > 3)
    val stp = lake.compact("gold", "part")
    assert(stp.leavesRewritten == 3 && stp.filesAfter == 3, s"unexpected stats: $stp")
    val leafDirs = Option(new java.io.File(s"$root/gold/part").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(leafDirs == Set("lang=l0", "lang=l1", "lang=l2"),
      "partition directories must survive compaction")
    assert(lake.read("gold", "part").collect().map(_.toSeq).toSet === partBefore)
  }

  test("Lake.compact(clusterBy): rewritten files carry DISJOINT key ranges (zone-map-prunable)") {
    import spark.implicits._
    val root = tmp()
    val lake = new Lake(spark, root)
    // ids deliberately scattered across the input files
    val df = scala.util.Random.shuffle((1 to 4000).toList)
      .map(i => (i.toLong, s"v$i")).toDF("id", "v")
    lake.write(df.repartition(16), "gold", "cl")
    val before = lake.read("gold", "cl").collect().map(_.toSeq).toSet
    // tiny target -> several output bins, each range-clustered on id
    val st = lake.compact("gold", "cl", targetBytes = 16L * 1024, clusterBy = Seq("id"))
    assert(st.leavesRewritten == 1 && st.filesAfter > 1, s"stats: $st")
    assert(lake.read("gold", "cl").collect().map(_.toSeq).toSet === before)
    val ranges = lake.read("gold", "cl")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == st.filesAfter)
    ranges.sliding(2).foreach {
      case Array((_, hi0), (lo1, _)) =>
        assert(lo1 > hi0, s"file ranges overlap: $ranges")
      case _ =>
    }
  }

  test("Streams.dauIngest: rollup equals batch DAU/WAU; replay + compact are set-idempotent") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val pairs = tmp() + "/dau"
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp"))
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val schema = ev(Nil).schema
    // batch 1: user 1 twice on day 1 (ONE pair), user 2 once
    val b1 = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 18:00:00", "click"),
      (3L, 2L, "2024-01-01 11:00:00", "view"))
    // batch 2 (restart): user 1 AGAIN on day 1 (already in the store —
    // the set absorbs it) and on day 2; user 3 appears day 2
    val b2 = Seq(
      (4L, 1L, "2024-01-01 23:00:00", "view"),
      (5L, 1L, "2024-01-02 09:00:00", "view"),
      (6L, 3L, "2024-01-02 10:00:00", "view"))
    def rollup() = Streams.dauRollup(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def batch(rows: Seq[(Long, Long, String, String)]) = {
      val d = tmp()
      ev(rows).coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
      graft.queries.SessionQueries.eventDauWau.fn(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    ev(b1).coalesce(1).write.mode("append").parquet(src)
    Streams.dauIngest(spark, src, schema, ckpt, pairs).awaitTermination()
    assert(rollup() === batch(b1))
    ev(b2).coalesce(1).write.mode("append").parquet(src)
    Streams.dauIngest(spark, src, schema, ckpt, pairs).awaitTermination()
    val want = batch(b1 ++ b2)
    assert(rollup() === want, "restart-spanning rollup equals the batch operator")
    // checkpoint LOSS: the whole history re-delivers — duplicate pair
    // rows land, but the read-side set fold is unchanged (no ledger)
    Streams.dauIngest(spark, src, schema, tmp(), pairs).awaitTermination()
    assert(rollup() === want, "full-history replay absorbed by set union")
    val rowsBefore = spark.read.parquet(pairs).count()
    Streams.dauCompact(spark, pairs)
    assert(spark.read.parquet(pairs).count() < rowsBefore,
      "compaction reclaims the replay's duplicate rows")
    assert(rollup() === want, "compaction preserves the rollup")
  }

  test("Streams.churnRollup: weekly churn over the dau pair store equals batch q_event_churn") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val pairs = tmp() + "/dau"
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp"))
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val schema = ev(Nil).schema
    // three consecutive epoch-weeks: user 1 active in all, user 2 only
    // week 0 (churns), user 3 joins week 1 and stays
    val b1 = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 2L, "2024-01-01 11:00:00", "view"),
      (3L, 1L, "2024-01-08 10:00:00", "view"))
    val b2 = Seq(
      (4L, 3L, "2024-01-08 12:00:00", "view"),
      (5L, 1L, "2024-01-15 09:00:00", "view"),
      (6L, 3L, "2024-01-15 10:00:00", "view"))
    def churn() = Streams.churnRollup(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    ev(b1).coalesce(1).write.mode("append").parquet(src)
    Streams.dauIngest(spark, src, schema, ckpt, pairs).awaitTermination()
    ev(b2).coalesce(1).write.mode("append").parquet(src)
    Streams.dauIngest(spark, src, schema, ckpt, pairs).awaitTermination()
    val d = tmp()
    ev(b1 ++ b2).coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val batchChurn = graft.queries.SessionQueries.eventChurn.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(churn() === batchChurn,
      "stream-maintained pair store rolls up to the batch churn operator")
    // the semantics themselves: week 0 loses exactly user 2
    val byWeek = batchChurn.toSeq.sortBy(_._1)
    assert(byWeek.head._2 == 2 && byWeek.head._3 == 1 && byWeek.head._4 == 1,
      "week 0: two actives, one retained, one churned")
    // replay idempotence: a fresh-checkpoint full re-ingest changes nothing
    Streams.dauIngest(spark, src, schema, tmp(), pairs).awaitTermination()
    assert(churn() === batchChurn, "full-history replay absorbed by set union")
  }

  test("Streams.scd2Ingest: boundary-spanning runs emit once; rollup equals batch q_scd2; replay absorbed") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp()
    def ev(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "user_id", "ts", "event_type")
    val schema = ev(Nil).schema
    def drain(checkpoint: String): Unit = {
      val q = Streams.scd2Ingest(spark, src, schema)
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: user 1 view,view,click (2 runs); user 2 view (1 run)
    ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:01:00", "view"),
      (3L, 1L, "2024-01-01 10:02:00", "click"),
      (4L, 2L, "2024-01-01 09:00:00", "view")))
      .coalesce(1).write.mode("append").parquet(src)
    drain(ckpt)
    val run1 = spark.read.parquet(out).as[Streams.Scd2Change].collect().toSeq
    assert(run1.length == 3, s"run 1 must emit 3 run starts, got $run1")
    // run 2 (restart): user 1 click (SPANS the boundary - no change) then
    // view (change); user 2 view (no change)
    ev(Seq(
      (5L, 1L, "2024-01-01 10:05:00", "click"),
      (6L, 1L, "2024-01-01 10:06:00", "view"),
      (7L, 2L, "2024-01-01 09:10:00", "view")))
      .coalesce(1).write.mode("append").parquet(src)
    drain(ckpt)
    val staged = spark.read.parquet(out).as[Streams.Scd2Change].collect().toSeq
    assert(staged.length == run1.length + 1,
      "run 2 emits exactly the one new run start (the spanning run is absorbed by state)")
    // read-side rollup equals the batch operator on the same lake
    val evDir = tmp()
    spark.read.parquet(src)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$evDir/events.parquet")
    def rollup() = Streams.scd2Rollup(spark.read.parquet(out)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))).toSet
    val batch = graft.queries.SessionQueries.scd2.fn(spark, evDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))).toSet
    val want = rollup()
    assert(want === batch, s"stream rollup $want != batch $batch")
    assert(want.exists(t => t._1 == 1L && t._2 == "view" && t._3 == 3L && t._6))
    // checkpoint LOSS, layer 1: a fresh query checkpoint restarts batch
    // ids at 0, and the parquet SINK's _spark_metadata log treats them as
    // already committed - the replay lands zero duplicate files
    drain(tmp())
    assert(spark.read.parquet(out).count() == staged.length,
      "the file sink's metadata log absorbs the replayed batches")
    assert(rollup() === want, "rollup unchanged under sink-log-absorbed replay")
    // layer 2: a log-less sink (foreachBatch-style) WOULD land duplicate
    // rows - simulate by appending a verbatim copy of the store; the
    // deterministic re-extraction emits identical rows, so the read
    // side's distinct absorbs them
    val copy = spark.read.parquet(out).localCheckpoint()
    copy.write.mode("append").parquet(out + "_dup")
    copy.write.mode("append").parquet(out + "_dup")
    val dup = Streams.scd2Rollup(spark.read.parquet(out + "_dup")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))).toSet
    assert(dup === want, "duplicate change rows absorbed by determinism + distinct")
  }

  test("Streams.survivalRollup: KM over the closed-session store is the batch fold") {
    import spark.implicits._
    val src = tmp(); val ckpt = tmp(); val out = tmp() + "/sessions"
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "ts_s", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val schema = ev(Nil).schema
    def drain(): Unit = {
      val q = Streams.sessionAgg(spark, src, schema, "5 minutes", "30 minutes")
        .writeStream.format("parquet").option("path", out).outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // session A (user 1): 10:00..10:02, duration 2 min; session B (user 2):
    // one event at 09:00, duration 0; sentinel (user 9) at 13:00 advances
    // the watermark so A and B close — the sentinel's own session stays
    // open and never reaches the store (the batch-censor analogue).
    ev(Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:01:00", 1.0),
      (1L, "2024-01-01 10:02:00", 1.0), (2L, "2024-01-01 09:00:00", 1.0)))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    ev(Seq((9L, "2024-01-01 13:00:00", 1.0))).coalesce(1).write.mode("append").parquet(src)
    drain()
    val gapUs = 5L * 60 * 1000000
    val store = spark.read.parquet(out)
    assert(store.count() == 2, "A and B closed, sentinel still open")
    val got = Streams.survivalRollup(store, gapUs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // B (dur 0 min) is observed (09:00 + 5 min < A's 10:02 max end);
    // A (dur 2 min) is the newest closed session → censored. One event
    // row: t=0, n_risk=2, d_obs=1, d_cens=0, log S = ln(1/2) on the grid.
    assert(got.length == 1)
    val (t, nRisk, dObs, dCens, cell) = got.head
    assert(t == 0L && nRisk == 2L && dObs == 1L && dCens == 0L)
    val lnHalf = {
      val x = 0.5
      val k0 = math.floor(math.log(x) / math.log(2.0))
      val m0 = x / math.pow(2.0, k0)
      val (m, k) =
        if (m0 >= 2.0) (m0 / 2.0, k0 + 1.0)
        else if (m0 < 1.0) (m0 * 2.0, k0 - 1.0) else (m0, k0)
      val tt = (m - 1.0) / (m + 1.0); val u = tt * tt
      val poly = Seq(23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)
        .foldLeft(1.0 / 25.0)((p, c) => p * u + 1.0 / c) * u + 1.0
      k * graft.util.Portable.Ln2 + (tt * 2.0) * poly
    }
    assert(cell.contains(math.floor(lnHalf * 1073741824.0).toLong))
    // the rollup IS the batch fold: feeding the equivalent batch session
    // frame through survivalFromSessions gives the identical result
    val manual = Seq(
      // A: start 10:00, last event 10:02
      (tsUs("2024-01-01 10:02:00"), 120000000L),
      // B: single event 09:00
      (tsUs("2024-01-01 09:00:00"), 0L)).toDF("end_us", "duration_us")
    val batch = graft.queries.SessionQueries.survivalFromSessions(manual, gapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(batch.toSeq == got.toSeq)
  }
}
