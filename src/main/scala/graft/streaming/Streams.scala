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

  /** Streaming sessionization — the continuous twin of the batch
    * q_sessionize operator (queries/SessionQueries.scala): dynamic-gap
    * `session_window` sessions per user, closed and emitted once the
    * watermark passes a session's end. State is bounded by (open sessions ×
    * users), never by history; Spark merges overlapping session fragments
    * across micro-batches internally, so late events within the watermark
    * extend the right session exactly once. */
  def sessionAgg(spark: SparkSession, sourceDir: String, schema: StructType,
      gap: String, watermark: String): DataFrame =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("session"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming corpus ingest with exact dedup — the continuous form of
    * Corpus.exactDedup: each micro-batch of new documents is appended to
    * the corpus only if its content hash is unseen, checked two ways:
    * `dropDuplicates` on the hash removes repeats within the stream AND
    * across restarts (its state lives in the checkpoint; at real scale
    * back it with the RocksDB state store), while the per-batch left-anti
    * join against the corpus written so far covers what the checkpoint
    * cannot: bootstrap over a pre-existing corpus and recovery after
    * checkpoint loss. The hash is TextOps.contentHash — the same
    * definition the batch operator uses, so the surviving TEXT set of a
    * stream-built corpus matches a batch-built one (kept doc_ids may
    * differ: the stream keeps first arrival, the batch keeps min doc_id);
    * `normalized = true` switches BOTH to the normalizeText identity,
    * mirroring Corpus.exactDedup(normalized = true).
    * The corpus probe goes through the Hadoop FileSystem (works for
    * gs://…/s3:// lake roots, not just local disk) and keys on the
    * _SUCCESS marker so a torn first write is never mis-read as data. */
  def corpusIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, corpusDir: String,
      normalized: Boolean = false): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("text_hash", graft.ops.TextOps.contentHash(
        if (normalized) graft.ops.TextOps.normalizeText(col("text")) else col("text")))
      .dropDuplicates("text_hash")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val spark0 = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(corpusDir + "/_SUCCESS")
        val fs = marker.getFileSystem(spark0.sessionState.newHadoopConf())
        val fresh =
          if (fs.exists(marker)) {
            val seen = spark0.read.parquet(corpusDir)
              .select(col("text_hash")).distinct()
            batch.join(seen, Seq("text_hash"), "left_anti")
          } else batch
        fresh.write.mode("append").parquet(corpusDir)
      }
      .start()

  /** Streaming NEAR-dup corpus ingest — the continuous twin of
    * q_dedup_incremental (the daily-crawl keep/drop): each drained batch
    * is exact-deduped in-stream (checkpointed dropDuplicates on the
    * content hash), then near-dup-checked against the EXISTING corpus via
    * a stream-static band join on the minhash signature keys, and
    * survivors append WITH their mh0..mh7 signature columns — so the
    * corpus itself is the precomputed reference-signature artifact the
    * next batch joins against (no re-shingling of history, ever; at
    * 100 TB the static side could further prune to the signature columns
    * only, ~10³× smaller than the text). A batch doc is dropped when any
    * band-blocked corpus candidate agrees on ≥ `minAgree` of the 8
    * signature slots (4/8 ≈ Jaccard 0.5 — exactly q_dedup_incremental's
    * verdict rule); an exact dup of history agrees on 8/8 and is
    * subsumed. Candidates are band-blocked (Σ bucket_new × bucket_ref),
    * never batch×corpus. */
  def corpusIngestNearDup(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, corpusDir: String, minAgree: Int = 4): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("text_hash", graft.ops.TextOps.contentHash(col("text")))
      .dropDuplicates("text_hash")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val spark0 = batch.sparkSession
        val withSig = batch.join(graft.ops.TextOps.minhashSig(batch), "doc_id")
        val marker = new org.apache.hadoop.fs.Path(corpusDir + "/_SUCCESS")
        val fs = marker.getFileSystem(spark0.sessionState.newHadoopConf())
        val fresh =
          if (fs.exists(marker)) {
            val refSig = spark0.read.parquet(corpusDir)
              .select(col("doc_id") +: (0 to 7).map(k => col(s"mh$k")): _*)
            val cand = graft.ops.TextOps.minhashBands(withSig)
              .withColumnRenamed("doc_id", "new_id")
              .join(graft.ops.TextOps.minhashBands(refSig)
                .withColumnRenamed("doc_id", "ref_id"), Seq("band", "k1", "k2"))
              .select("new_id", "ref_id").distinct()
            val nAgree = (0 to 7).map(k =>
              when(col(s"a.mh$k") === col(s"b.mh$k"), 1).otherwise(0)).reduce(_ + _)
            val drops = cand
              .join(withSig.as("a"), col("a.doc_id") === col("new_id"))
              .join(refSig.as("b"), col("b.doc_id") === col("ref_id"))
              .filter(nAgree >= minAgree)
              .select(col("new_id").as("doc_id")).distinct()
            withSig.join(drops, Seq("doc_id"), "left_anti")
          } else withSig
        fresh.write.mode("append").parquet(corpusDir)
      }
      .start()

  final case class Tick(key: Long, secs: Long, value: Double)
  final case class EmaState(ema: Double, lastSecs: Long)
  final case class EmaOut(key: Long, secs: Long, value: Double, ema: Double)

  /** Streaming recursive EMA — the continuous form of the batch indicator
    * kernels (ops.Recursive; `ewm(adjust=False)` seeding: the first
    * observation seeds the average, feature_calculation_functions.py:54-60).
    *
    * Per-asset state (last EMA) is carried across micro-batches with
    * `flatMapGroupsWithState`, so a restarted/scheduled job continues the
    * recurrence exactly where the checkpoint left it — state is one tiny
    * case class per asset, bounded by asset count, never by history
    * length. Rows are sorted by event time inside each micro-batch (the
    * iterator's order is not guaranteed); batches are assumed to arrive in
    * time order per key, which the AvailableNow snapshot-drop layout
    * provides. Late rows (before the state's watermark) are folded in
    * arrival order — document upstream ordering if that matters.
    */
  def streamingEma(spark: SparkSession, sourceDir: String, schema: StructType,
      span: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val alpha = 2.0 / (span + 1.0)
    spark.readStream.schema(schema).parquet(sourceDir)
      .selectExpr("key", "secs", "value").as[Tick]
      .groupByKey(_.key)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var st = state.getOption
        val out = rows.toSeq.sortBy(_.secs).map { r =>
          val ema = st match {
            case None    => r.value // first observation seeds the EMA
            case Some(s) => s.ema + alpha * (r.value - s.ema)
          }
          st = Some(EmaState(ema, r.secs))
          EmaOut(r.key, r.secs, r.value, ema)
        }
        st.foreach(state.update)
        out.iterator
      }.toDF()
  }

  final case class FunnelEvent(user_id: Long, day: java.sql.Timestamp,
      ts_us: Long, event_type: String)
  final case class FunnelStaged(user_id: Long, day: java.sql.Timestamp,
      vt: Option[Long], ct: Option[Long], pt: Option[Long])

  /** Streaming ordered funnel — the continuous twin of the batch
    * q_event_funnel (queries/SessionQueries.scala): per (user_id, day),
    * the staged mins vt (first 'view'), ct (first 'click' strictly after
    * vt), pt (first 'purchase' strictly after ct), carried across
    * micro-batches with `flatMapGroupsWithState`. Column identities match
    * the batch operator's staged frame, so the day-level rollup
    * (count(vt)/count(ct)/count(pt) over the LATEST row per user-day) is
    * the batch result.
    *
    * State is one 3-field case class per active (user, day) — bounded by
    * active user-days, never by event volume. Each micro-batch folds its
    * rows in event-time order; like streamingEma, batches are assumed to
    * arrive in time order per key (the AvailableNow snapshot-drop layout
    * provides this) — an out-of-order view arriving AFTER a click was
    * already staged could not retroactively admit clicks between the two
    * view times. Every batch re-emits the group's refreshed staged row
    * (Append sink ⇒ consumers take the last row per key, the same
    * read-side contract as corpusIngest's append-only corpus). */
  def funnelStages(spark: SparkSession, sourceDir: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    spark.readStream.schema(schema).parquet(sourceDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState[FunnelStaged, FunnelStaged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case ((uid, day), rows, state) =>
        var (vt, ct, pt) = state.getOption
          .map(s => (s.vt, s.ct, s.pt)).getOrElse((None: Option[Long], None: Option[Long], None: Option[Long]))
        // time-ordered fold = the batch staged-min semantics: first view,
        // first click strictly after it, first purchase strictly after that
        rows.toSeq.sortBy(_.ts_us).foreach { e =>
          e.event_type match {
            case "view"     if vt.isEmpty                            => vt = Some(e.ts_us)
            case "click"    if ct.isEmpty && vt.exists(e.ts_us > _)  => ct = Some(e.ts_us)
            case "purchase" if pt.isEmpty && ct.exists(e.ts_us > _)  => pt = Some(e.ts_us)
            case _ =>
          }
        }
        val out = FunnelStaged(uid, day, vt, ct, pt)
        state.update(out)
        Iterator.single(out)
      }.toDF()
  }

  /** Day-level conversion rollup over funnelStages staged rows — the
    * columns q_event_funnel publishes (n_users / n_view /
    * n_click_after_view / n_purchase_after_click per day). Staged fields
    * are WRITE-ONCE (a staged min can only appear, never change value:
    * `vt`/`ct`/`pt` go None → Some(x) and stay x), so the latest row per
    * (user, day) on an append-only sink is recovered COLUMNWISE by
    * max() — no emission-order column needed, and the rollup is correct
    * over any number of re-emitted refreshes. Input may carry extra
    * columns (e.g. a batch partition key); only the funnel columns are
    * touched. */
  def funnelDailyRollup(staged: DataFrame): DataFrame =
    staged.groupBy("user_id", "day")
      .agg(max("vt").as("vt"), max("ct").as("ct"), max("pt").as("pt"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_users"), count("vt").as("n_view"),
        count("ct").as("n_click_after_view"), count("pt").as("n_purchase_after_click"))

  /** The streaming sink form of the funnel day rollup (VERDICT r7 #7):
    * each micro-batch (a) lands funnelStages' refreshed staged rows in a
    * batch-id-keyed partition (overwrite ⇒ a retried batch rewrites the
    * SAME directory — idempotent, the foreachBatch exactly-once recipe)
    * and (b) recomputes the day-level rollup over the whole staged lake
    * and publishes it atomically-ish as an overwrite. The rollup input is
    * one row per ACTIVE user-day per drained batch — bounded by user-days
    * (state-sized), never by event volume, so the per-batch recompute
    * stays cheap at any event scale; day-partitioning the staged lake
    * and pruning closed days is the documented next knob if user-day
    * cardinality itself grows unbounded. */
  def funnelDaily(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, stagedDir: String, rollupDir: String): StreamingQuery =
    funnelStages(spark, sourceDir, schema)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$stagedDir/batch=$batchId")
        funnelDailyRollup(spark.read.parquet(stagedDir))
          .write.mode("overwrite").parquet(rollupDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming event-rate anomaly MONITOR — the continuous twin of the
    * batch q_event_anomaly: each drained micro-batch (a) lands its
    * PARTIAL per-(type, day) counts in a batch-id-keyed partition
    * (overwrite ⇒ a retried batch rewrites the same directory — the
    * idempotent foreachBatch recipe), then (b) folds the staged partials
    * into total counts and publishes z-flags against the TRAINED
    * reference stats frame (`stats` — produce it with the batch recipe,
    * SessionQueries.anomalyStats, over the historical lake; sharing that
    * recipe is what makes stream and batch flags bit-identical). The
    * per-batch recompute reads partial COUNT rows, bounded by
    * types × days × batches — never raw event volume — so the monitor
    * stays cheap at any event rate; compacting closed days is the next
    * knob if the day horizon grows unbounded. */
  def anomalyMonitor(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, stagedDir: String, flagsDir: String,
      stats: DataFrame): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        graft.queries.SessionQueries.dailyCounts(batch)
          .write.mode("overwrite").parquet(s"$stagedDir/batch=$batchId")
        val totals = spark.read.parquet(stagedDir)
          .groupBy("event_type", "day").agg(sum("n").as("n"))
        graft.queries.SessionQueries.anomalyScore(totals, stats)
          .write.mode("overwrite").parquet(flagsDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming curation ingest — the continuous form of the batch
    * quality + privacy pass: documents that clear the Gopher filter
    * (TextOps.gopher, the SAME expression q_text_gopher evaluates) are
    * PII-redacted (TextOps.piiRedact, the q_text_pii identity) and
    * appended to the curated corpus. Stateless map+filter per
    * micro-batch — no streaming state at all, so the only recovery
    * surface is the file-source checkpoint; a stream-curated corpus
    * holds exactly the redaction of the batch-filtered set. */
  def curateIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, outDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .filter(col("text").isNotNull)
      .filter(graft.ops.TextOps.gopher(col("text")).getField("gopher_pass"))
      .withColumn("text", graft.ops.TextOps.piiRedact(col("text")))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Streaming count-min sketch maintenance (r9) — the continuous twin
    * of q_text_heavy_hitters' counter build: each drained micro-batch's
    * word counts fold into the persistent (i, b) counter store through
    * the SAME cell identity (TextOps.cmBucket), exploiting the sketch's
    * defining property: cell-wise ADDITION merges any two sketches, so
    * streaming state is d×w cells worth of deltas regardless of stream
    * length — no per-word state, no watermark, no ordering sensitivity.
    *
    * Exactly-once without idempotent writes: addition replayed is
    * addition doubled, so deltas are keyed by SOURCE FILE (one d×w cell
    * block per input file) and a file already in the store contributes
    * nothing on re-delivery. The file, not the micro-batch id, is the
    * ledger because the file set is deterministic across CHECKPOINT LOSS
    * while batch numbering is not: a fresh checkpoint re-delivers old
    * and new files together as batch 0, and the file ledger skips
    * exactly the already-merged files while still folding the new ones
    * (LakeStreamSpec pins this). Every fresh file ALSO writes one
    * SENTINEL row (i = −1, b = −1, cnt = 0) in the same append as its
    * cells, so a file whose text produces zero cells (all-empty docs)
    * still enters the ledger and is never re-scanned on replay (ADVICE
    * r9); [[cmSketch]] filters sentinels out. Sentinel and cells land in
    * ONE append, so the ledger can never claim a file whose cells were
    * lost. Residual window: a crash inside one append's parquet commit
    * can expose a partial delta — the commit protocol's atomicity is the
    * remaining guarantee, and a production deployment puts the delta
    * table behind a transactional format.
    *
    * The per-batch seen-file lookup is a distinct over the delta store,
    * which grows with ingested files — run [[cmCompact]] on a cadence
    * (e.g. per N batches, while ingest is quiesced): it folds all cells
    * to one row per (i, b) and keeps one sentinel per seen file, so the
    * lookup scans d×w + |files| rows regardless of history. The fold is
    * associative, so compaction commutes with ingest.
    * The queryable sketch is [[cmSketch]]: one cells-sized fold over the
    * deltas. */
  def cmSketchIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, sketchDir: String,
      d: Int = graft.queries.CorpusStatsQueries.CmD,
      w: Int = graft.queries.CorpusStatsQueries.CmW): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val spark0 = batch.sparkSession
        val withFile = batch.toDF().withColumn("src_file", input_file_name())
        val marker = new org.apache.hadoop.fs.Path(sketchDir + "/_SUCCESS")
        val fs = marker.getFileSystem(spark0.sessionState.newHadoopConf())
        val fresh =
          if (fs.exists(marker)) {
            val seen = spark0.read.parquet(sketchDir)
              .select("src_file").distinct()
            withFile.join(seen, Seq("src_file"), "left_anti")
          } else withFile
        val wc = fresh
          .select(col("src_file"), explode(graft.ops.TextOps.tokens(col("text"))).as("word"))
          .groupBy("src_file", "word").agg(count(lit(1)).as("n"))
        val cells = wc.select(col("src_file"), explode(array((0 until d).map(i =>
              struct(lit(i).as("i"),
                graft.ops.TextOps.cmBucket(i, col("word"), w).as("b"))): _*)).as("ib"),
            col("n"))
          .groupBy(col("src_file"), col("ib.i").as("i"), col("ib.b").as("b"))
          .agg(sum("n").as("cnt"))
        // one ledger sentinel per fresh file, in the SAME append as its
        // cells — a zero-cell file still enters the ledger (ADVICE r9)
        val sentinels = fresh.select("src_file").distinct()
          .select(col("src_file"), lit(-1).as("i"), lit(-1L).as("b"),
            lit(0L).as("cnt"))
        cells.unionByName(sentinels)
          .write.mode("append").parquet(sketchDir)
      }
      .start()

  /** Streaming HyperLogLog maintenance (r12) — the continuous twin of
    * q_text_vocab_hll's register build, and the count-min twin's
    * structural opposite: HLL registers merge by cell-wise MAX, and max —
    * unlike the sketch-delta ADDITION above — is IDEMPOTENT. A replayed
    * file (or an entire checkpoint-lost history re-delivered as batch 0)
    * can only re-assert register values it already asserted, never
    * inflate them, so this twin needs NO file ledger, no sentinels, no
    * seen-scan: the algebra of the state is the exactly-once mechanism.
    * That is the 100 TB lesson the pair of twins teaches — pick
    * idempotent state merges and the hardest streaming problem
    * disappears. Each drained micro-batch appends its own register rows
    * (≤ 64/batch) through the SAME cell identity as the batch operator
    * (CorpusStatsQueries.hllRho); [[hllRegisters]] folds the store by
    * max. The store grows 64 rows per batch — [[hllCompact]]-style
    * folding is just re-writing the max rows, and even that is optional
    * at any realistic cadence. */
  def hllIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, sketchDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        graft.queries.CorpusStatsQueries.hllRho(batch.toDF())
          .groupBy("bucket").agg(max("rho").as("rho"))
          .write.mode("append").parquet(sketchDir)
      }
      .start()

  /** The queryable register array: max-fold the per-batch register rows
    * over the complete 0..63 bucket spine (empty registers read 0 — the
    * batch operator's published shape, and what the estimator needs). */
  def hllRegisters(spark: SparkSession, sketchDir: String): DataFrame = {
    val m = graft.queries.CorpusStatsQueries.HllM
    spark.range(m).select(col("id").as("bucket"))
      .join(spark.read.parquet(sketchDir).groupBy("bucket").agg(max("rho").as("mr")),
        Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mr"), lit(0L)).as("r"))
  }

  /** Compact the count-min delta store: fold every cell to one row per
    * (i, b) and keep one sentinel row per seen file — the seen-file
    * lookup then scans d×w + |files| rows no matter how long the stream
    * has run. Run while ingest is quiesced (the rewrite is
    * read-then-overwrite); the fold is associative so the compacted
    * store answers [[cmSketch]] identically. */
  def cmCompact(spark: SparkSession, sketchDir: String): Unit = {
    val st = spark.read.parquet(sketchDir)
    val folded = st.filter(col("i") >= 0)
      .groupBy("i", "b").agg(sum("cnt").as("cnt"))
      .select(lit("_compacted").as("src_file"), col("i"), col("b"), col("cnt"))
    val ledger = st.select("src_file").distinct()
      .filter(col("src_file") =!= "_compacted")
      .select(col("src_file"), lit(-1).as("i"), lit(-1L).as("b"), lit(0L).as("cnt"))
    // materialize BEFORE the overwrite deletes the files being read
    val compacted = folded.unionByName(ledger).localCheckpoint()
    compacted.write.mode("overwrite").parquet(sketchDir)
  }

  /** The queryable sketch: fold the per-batch deltas to one counter per
    * cell. Point estimate for a word = min over its d cells (absent cell
    * = 0) — the q_text_heavy_hitters estimator over stream-built state. */
  def cmSketch(spark: SparkSession, sketchDir: String): DataFrame =
    spark.read.parquet(sketchDir)
      .filter(col("i") >= 0) // drop the per-file ledger sentinels
      .groupBy("i", "b").agg(sum("cnt").as("cnt"))

  /** Streaming sequence packing — the continuous twin of
    * q_pack_sequences: each drained micro-batch's docs are appended to
    * the per-language concat-and-chunk stream CONTINUING the global
    * token offset where the store left it (base = per-language
    * max(start_off + ws_tokens) of what's already packed — a
    * languages-sized aggregate, broadcast back). Inside a batch, offsets
    * come from the SAME two-phase distributed prefix as the batch
    * operator (ops.Corpus.packOffsets), in doc_id order — so when
    * arrival order respects doc_id order, the streamed packing is
    * row-identical to the batch packing of the union (LakeStreamSpec
    * pins this); under out-of-order arrival the packing is still
    * gap-free and contiguous, just in arrival order, which IS the
    * contract of an append-only training stream (a sequence once cut is
    * immutable — packing can't retroactively reorder).
    *
    * Idempotency is the file ledger (the cmSketchIngest rationale):
    * deltas carry their source file, and a re-delivered file — including
    * the full re-delivery after CHECKPOINT LOSS — contributes nothing,
    * while genuinely new files keep extending the offsets. The pack
    * store itself cannot carry sentinel rows (it IS the training data),
    * so the ledger for zero-row files lives in the `_ledger` sidecar
    * under packDir (underscore-hidden from parquet reads of the store);
    * seen = store files ∪ sidecar, and the sidecar append FOLLOWS the
    * pack append so a crash between them only costs a harmless re-scan,
    * never a duplicate pack.
    *
    * Null text is excluded BEFORE tokenizing (ADVICE r9): size(split(
    * trim(null))) is null in Spark, so a null-text doc would otherwise
    * write a row with null ws_tokens/start_off/pack_id into the packed
    * store — unlike CorpusPipeline's packing step, which drops it. The
    * doc's FILE still enters the sidecar ledger. */
  def packIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, packDir: String, packL: Int = 256): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("src_file", input_file_name())
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val spark0 = batch.sparkSession
        val conf = spark0.sessionState.newHadoopConf()
        val marker = new org.apache.hadoop.fs.Path(packDir + "/_SUCCESS")
        val fs = marker.getFileSystem(conf)
        val ledgerDir = packDir + "/_ledger"
        val ledgerMarker = new org.apache.hadoop.fs.Path(ledgerDir + "/_SUCCESS")
        val store = if (fs.exists(marker)) Some(spark0.read.parquet(packDir)) else None
        val seen = (store.map(_.select("src_file").distinct()).toSeq ++
          (if (fs.exists(ledgerMarker))
            Seq(spark0.read.parquet(ledgerDir).select("src_file").distinct())
          else Seq.empty)).reduceOption(_ unionByName _)
        val fresh = seen match {
          case Some(sn) =>
            batch.toDF().join(sn.distinct(), Seq("src_file"), "left_anti")
          case None => batch.toDF()
        }
        // the fresh FILE list is ledgered even when every row is dropped
        // by the null-text filter below (zero-pack files never re-scan)
        val freshFiles = fresh.select("src_file").distinct().localCheckpoint()
        val tok = fresh.filter(col("text").isNotNull)
          .select(col("doc_id"), col("lang"), col("src_file"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"))
        val local = graft.ops.Corpus.packOffsets(tok)
          .withColumnRenamed("start_off", "local_off")
        val withBase = store match {
          case Some(st) =>
            val base = st.groupBy("lang")
              .agg(max(col("start_off") + col("ws_tokens")).as("base_off"))
            local.join(broadcast(base), Seq("lang"), "left")
              .withColumn("start_off", coalesce(col("base_off"), lit(0L)) + col("local_off"))
          case None => local.withColumn("start_off", col("local_off"))
        }
        withBase.select(col("doc_id"), col("lang"), col("ws_tokens"), col("start_off"),
          expr(s"start_off div $packL").as("pack_id"),
          (expr(s"(start_off + ws_tokens - 1) div $packL")
            - expr(s"start_off div $packL") + 1).as("pack_span"),
          col("src_file"))
          .write.mode("append").parquet(packDir)
        // sidecar AFTER the pack append: a crash between the two costs a
        // re-scan of this batch's files, never a duplicate pack
        freshFiles.write.mode("append").parquet(ledgerDir)
      }
      .start()

  /** STREAM-STREAM attribution join (r9) — the continuous twin of
    * q_event_attribution's lookback: purchases joined to the SAME user's
    * in-window clicks as both arrive, the one Structured-Streaming
    * operator shape the twins above don't cover (two watermarked streams,
    * an equi-key plus an event-time range condition). Spark bounds the
    * click-side state buffer from the range bound + watermark — clicks
    * older than lookback + watermark below the purchase watermark are
    * evicted, so state is (active users × in-window clicks), never
    * history — exactly the state story a 100 TB/day clickstream needs.
    *
    * Emits EVERY in-window (purchase, click) pair; last-touch selection
    * is a per-purchase max over the sink (batch-queryable at read time),
    * because a stream-stream join cannot know a click is the LAST one
    * until the lookback closes — fold-at-read keeps the stream
    * incremental and exactly-once. LakeStreamSpec pins sink-folded
    * last-touch == q_event_attribution's attributed rows on the same
    * lake. Same-instant edge: the range here is time-only (≤), while the
    * batch twin's window is ROW-preceding under (ts, event_id) order — a
    * click at the purchase's exact instant attributes in batch only when
    * its event_id is lower. Identical instants are sub-microsecond rare
    * in a real stream; callers needing the batch rule bit-for-bit fold
    * with the same (ts, event_id) tie-break at read time. */
  final case class SeqEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class SeqCarry(n: Int, t1: Long, i1: Long, s1: String,
      t2: Long, i2: Long, s2: String)
  final case class SeqTri(user_id: Long, e1: String, e2: String, e3: String)

  /** Streaming 3-event sequence n-grams — the continuous twin of the
    * batch q_event_seq_ngram (queries/SessionQueries.scala): per user,
    * `flatMapGroupsWithState` carries the LAST TWO events (the minimal
    * trigram context) across micro-batches and emits every sliding
    * trigram of consecutive event types as it completes — including the
    * ones that SPAN a batch/restart boundary, which a per-batch window
    * could never see. Each emitted trigram row appears exactly once: the
    * carry holds ≤ 2 events, so every 3-window over carry ++ batch
    * contains at least one new event.
    *
    * State is one 2-slot case class per user — bounded by users, never by
    * event volume. Within a drain, rows fold in (ts_us, event_id) order
    * (the batch window's exact tie rule); like funnelStages/streamingEma,
    * batches are assumed to arrive in time order per key (the
    * AvailableNow snapshot-drop layout provides this) — a late event
    * arriving after its successors were consumed would splice into the
    * wrong position, the documented append-only contract. The support
    * aggregate lives in [[seqNgramRollup]] at read time, because support
    * counts are corpus-global and only final at read — the same
    * fold-at-read layout as attributionJoin/funnelDailyRollup. */
  def seqNgramStages(spark: SparkSession, sourceDir: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    spark.readStream.schema(schema).parquet(sourceDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull
        && col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqCarry, SeqTri](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val carried: Seq[SeqEvent] = state.getOption.toSeq.flatMap { c =>
          (if (c.n >= 2) Seq(SeqEvent(uid, c.t1, c.i1, c.s1)) else Nil) ++
            (if (c.n >= 1) Seq(SeqEvent(uid, c.t2, c.i2, c.s2)) else Nil)
        }
        val merged = carried ++ rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val tris = merged.sliding(3).filter(_.size == 3)
          .map(w => SeqTri(uid, w(0).event_type, w(1).event_type, w(2).event_type))
          .toList
        state.update(merged.takeRight(2) match {
          case Seq(a, b) => SeqCarry(2, a.ts_us, a.event_id, a.event_type,
            b.ts_us, b.event_id, b.event_type)
          case Seq(b) => SeqCarry(1, 0L, 0L, "", b.ts_us, b.event_id, b.event_type)
          case _ => SeqCarry(0, 0L, 0L, "", 0L, 0L, "")
        })
        tris.iterator
      }.toDF()
  }

  /** Read-side support rollup over seqNgramStages' append-only sink — the
    * columns q_event_seq_ngram publishes (n_occur / n_users per trigram,
    * support floor 5). Every staged row is one trigram OCCURRENCE emitted
    * exactly once, so a plain count over the sink is the batch count —
    * no latest-row selection needed (contrast funnelDailyRollup's
    * write-once staged mins). */
  def seqNgramRollup(staged: DataFrame): DataFrame =
    staged.groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_occur"), countDistinct("user_id").as("n_users"))
      .filter(col("n_occur") >= 5)

  def attributionJoin(spark: SparkSession, sourceDir: String, schema: StructType,
      watermark: String = "1 hour", lookback: String = "7 days"): DataFrame = {
    def src() = spark.readStream.schema(schema).parquet(sourceDir)
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = src().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
        col("c_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"interval $lookback"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  final case class GapCarry(ts_us: Long, event_id: Long)
  final case class GapRow(user_id: Long, event_type: String, gap: Long)

  /** Streaming twin of q_event_interarrival's GAP extraction (r11):
    * per-(user, event_type) stateful carry of the last observed event, so
    * the gap that SPANS a micro-batch or restart boundary — exactly the
    * one a per-batch window can never see — is emitted exactly once. The
    * sink is append-only gap occurrences; the published per-type profile
    * (count/sum/extrema/mean/σ/burstiness) folds at read through the
    * IDENTICAL recipe as the batch operator ([[gapRollup]] delegates to
    * SessionQueries.interarrivalStats), the fold-at-read layout of
    * seqNgramRollup.
    *
    * State is one (ts_us, event_id) pair per live (user, type) key —
    * bounded by key cardinality, never event volume. Same in-order
    * ingest contract as funnelStages/seqNgramStages: within a drain rows
    * fold in (ts_us, event_id) order; batches arrive in time order per
    * key (the AvailableNow snapshot-drop layout provides this). */
  def gapIngest(spark: SparkSession, sourceDir: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    spark.readStream.schema(schema).parquet(sourceDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull
        && col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[SeqEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[GapCarry, GapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case ((uid, et), rows, state) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val prevTs = state.getOption.map(_.ts_us).toSeq
        val ts = prevTs ++ sorted.map(_.ts_us)
        val gaps = ts.sliding(2).collect { case Seq(a, b) => GapRow(uid, et, b - a) }
          .toList
        sorted.lastOption.foreach(l => state.update(GapCarry(l.ts_us, l.event_id)))
        gaps.iterator
      }.toDF()
  }

  /** Read-side profile over gapIngest's append-only sink — column-exact
    * twin of q_event_interarrival (the shared fold makes drift
    * impossible by construction). */
  def gapRollup(staged: DataFrame): DataFrame =
    graft.queries.SessionQueries.interarrivalStats(
      staged.select(col("event_type"), col("gap")))

  /** Kaplan–Meier survival over [[sessionAgg]]'s append-only session
    * store — the SAME code object as q_event_survival_km
    * (SessionQueries.survivalFromSessions), so the censor rule and the
    * grid-cell log-survival convention cannot fork. session_window's
    * `end` is last-event + gap, so the batch frame's last-event
    * timestamp is `session_end − gap` and the duration is
    * (session_end − gap) − session_start. The store holds only CLOSED
    * sessions (append mode emits past-watermark windows), which is
    * exactly the population the batch censor rule expects: the trailing
    * still-open sessions the batch marks censored are, in the stream,
    * simply not emitted yet — and the newest closed sessions near the
    * store's max end time censor identically. */
  def survivalRollup(staged: DataFrame, gapUs: Long): DataFrame =
    graft.queries.SessionQueries.survivalFromSessions(
      staged.select(
        (unix_micros(col("session_end")) - gapUs).as("end_us"),
        (unix_micros(col("session_end")) - gapUs -
          unix_micros(col("session_start"))).as("duration_us")),
      gapUs)

  /** Streaming DAU/WAU ingestion (r13) — the continuous twin of
    * q_event_dau_wau via the hllIngest state-algebra argument: the store
    * is the SET of distinct (user_id, day) pairs, per batch appended
    * after an in-batch distinct. Set union is idempotent, so — exactly
    * like the HLL registers' cell-wise MAX — a checkpoint-lost
    * full-history replay duplicates pair ROWS but never changes the SET
    * the read side folds: no file ledger needed. Store growth is
    * bounded by active-users × days (+ duplicate rows ≤ one per
    * batch × pair, reclaimed by [[dauCompact]]). */
  def dauIngest(spark: SparkSession, sourceDir: String, schema: StructType,
      checkpoint: String, pairsDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        batch.select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("dnum"))
          .distinct()
          .write.mode("append").parquet(pairsDir)
      }
      .start()

  /** Fold the pair store to the canonical distinct set — the idempotent
    * compaction (same read-equivalence argument as [[cmCompact]]; run
    * while ingest is quiesced). */
  def dauCompact(spark: SparkSession, pairsDir: String): Unit = {
    val compacted = spark.read.parquet(pairsDir).distinct().localCheckpoint()
    compacted.write.mode("overwrite").parquet(pairsDir)
  }

  /** Read-side DAU/WAU/stickiness over the pair store — the SAME code
    * object as the batch q_event_dau_wau (SessionQueries.dauWauFromPairs),
    * not a copy; the store's duplicate rows collapse in the distinct. */
  def dauRollup(spark: SparkSession, pairsDir: String): DataFrame =
    graft.queries.SessionQueries.dauWauFromPairs(
      spark.read.parquet(pairsDir).distinct())

  /** Week-over-week churn over the SAME streaming (user, day) pair store
    * dauIngest maintains — the continuous twin of q_event_churn, and the
    * same code object as its batch rollup
    * (SessionQueries.churnFromDayPairs), so stream- and batch-computed
    * churn can never drift. The pair set's idempotent union makes the
    * read replay-proof: re-ingested days change nothing. */
  def churnRollup(spark: SparkSession, pairsDir: String): DataFrame =
    graft.queries.SessionQueries.churnFromDayPairs(
      spark.read.parquet(pairsDir).distinct())

  final case class Scd2Carry(event_type: String)
  final case class Scd2Change(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String)

  /** Streaming SCD2 change extraction (r13) — the continuous twin of
    * q_scd2's lag filter: per-user state carries the last event TYPE so
    * a state run that spans a batch/restart boundary emits its start row
    * exactly once (the gapIngest/seqNgramStages contract: per-user
    * arrival order across batches must follow event time — the same
    * assumption the batch lag makes of its sort). Emits one change row
    * per run start; [[scd2Rollup]] closes the intervals through the
    * IDENTICAL published recipe (SessionQueries.scd2FromChanges — shared
    * code, not a copy).
    *
    * Replay algebra, two layers (spec-pinned): (1) with the parquet
    * streaming sink, a checkpoint-lost replay restarts batch ids at 0
    * and the sink's _spark_metadata log treats them as committed — zero
    * duplicate files land; (2) under a log-less sink (foreachBatch),
    * change extraction is a DETERMINISTIC function of the per-user event
    * prefix, so the replay re-emits the IDENTICAL rows — duplicates, not
    * divergence — and the read side's distinct() absorbs them (the
    * dauIngest set argument, earned by determinism rather than set
    * union). State is one string per user — bounded by the user
    * universe. */
  def scd2Ingest(spark: SparkSession, sourceDir: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    spark.readStream.schema(schema).parquet(sourceDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull
        && col("event_type").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Carry, Scd2Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case (uid, rows, state) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val prev = state.getOption.map(_.event_type)
        val changes = sorted.foldLeft((List.empty[Scd2Change], prev)) {
          case ((acc, p), e) =>
            val acc2 =
              if (p.contains(e.event_type)) acc
              else Scd2Change(uid, e.event_id, e.ts_us, e.event_type) :: acc
            (acc2, Some(e.event_type))
        }._1.reverse
        sorted.lastOption.foreach(l => state.update(Scd2Carry(l.event_type)))
        changes.iterator
      }.toDF()
  }

  /** Read-side SCD2 dimension over the change-row store — the SAME code
    * object as the batch q_scd2's interval closer
    * (SessionQueries.scd2FromChanges); replay-duplicate change rows
    * collapse in the distinct. */
  def scd2Rollup(staged: DataFrame): DataFrame =
    graft.queries.SessionQueries.scd2FromChanges(
      staged.select("user_id", "event_id", "ts_us", "event_type").distinct())
}
