package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star, SURVEY.md §2.12): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run per partition so a real codec
  * (JNI/native lib) initializes once per task, not once per row.
  *
  * The decode step itself is a STUB — the container has no media codecs —
  * marked `decodeStub`, producing a deterministic fake whose shape (typed
  * output rows, per-partition batching, partition-count preservation) is
  * the real contract a production decoder drops into.
  *
  * Scale notes: binary payloads make rows wide — the pipeline repartitions
  * by byte budget, not row count (`maxPartitionBytes` governs scan tasks;
  * an explicit repartition keeps decode tasks ~128 MB). Metadata-only
  * queries never touch the payload column thanks to Parquet column
  * pruning.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Build a media table from documents (text bytes stand in for an
    * encoded payload; schema/partitioning are the real thing). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.util.Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind")
    ).as[MediaRow]
  }

  /** ??? in spirit: the codec goes here. Deterministic fake geometry from
    * the payload bytes so tests are stable. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    ((n % 64) + 16, (n % 48) + 16, (n / 100) + 1)
  }

  /** Per-partition decode + feature extraction. mapPartitions (not map) so
    * a real decoder amortizes codec init across the partition — the Scala
    * analog of a pandas-UDF batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task codec init would happen here, once
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0x7fffffffL)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, f, checksum)
      }
    }
  }

  /** Frame sampling: one output row per sampled frame index — the
    * video→frames explosion, bounded by `stride`. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF().select(col("media_id"), col("kind"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Fixed-duration chunk windows with overlap over the audio rows — the
    * time-domain sibling of [[sampleFrames]]: every audio payload becomes
    * ⌊max(dur − W, 0)/H⌋ + 1 windows of W ms at hop H (the final window
    * may be short, never empty) — the segmentation step an ASR/audio-
    * embedding pipeline runs before its model. Duration is the decode
    * stub's (1 byte ≈ 1 ms stand-in); a real demuxer replaces ONE column.
    * Map-only, explosion bounded by dur/H. */
  def chunkWindows(features: Dataset[MediaFeatures], windowMs: Long,
      hopMs: Long): DataFrame = {
    val nch = (lit(1L) + floor(greatest(col("dur_ms") - windowMs, lit(0L))
      / lit(hopMs.toDouble))).cast("long")
    features.toDF().filter(col("kind") === "audio")
      .select(col("media_id"), col("n_bytes").as("dur_ms"))
      .select(col("media_id"), col("dur_ms"),
        explode(sequence(lit(0L), nch - 1)).as("chunk_id"))
      .select(col("media_id"), col("chunk_id"),
        (col("chunk_id") * hopMs).as("t_start_ms"),
        least(col("chunk_id") * hopMs + windowMs, col("dur_ms")).as("t_end_ms"))
  }

  final case class ResizedRow(media_id: Long, kind: String, width: Int,
      height: Int, payload: Array[Byte])

  /** Resize to a bounding box, preserving aspect ratio — per-partition like
    * the decoder, so the scaler (a real image lib in production) inits once
    * per task. The stub "resampled payload" is a deterministic strided byte
    * sample of the original, sized to the output pixel count, so byte-size
    * assertions in tests exercise the real output-shrinks contract. */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task scaler init would happen here, once
      rows.map { r =>
        val (w, h, _) = decodeStub(r.payload)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // empty payload: nothing to sample (the modulo index would divide
        // by zero); geometry still reports the stub's minimum box
        val out = if (r.payload.isEmpty) Array.emptyByteArray else {
          val outLen = math.max(1, math.min(r.payload.length, ow * oh))
          val stride = math.max(1, r.payload.length / outLen)
          Array.tabulate(outLen)(i => r.payload((i * stride) % r.payload.length))
        }
        ResizedRow(r.media_id, r.kind, ow, oh, out)
      }
    }
  }

  /** Repartition by PAYLOAD byte budget, not row count: binary rows are
    * wide and skewed, so `n rows / k partitions` produces decode tasks of
    * wildly different cost. One cheap aggregate measures total payload
    * bytes; the explicit round-robin repartition then targets
    * `bytesPerPartition` per decode task (the scan side is already
    * governed by `files.maxPartitionBytes` — this covers post-shuffle
    * stages where that setting has no effect). */
  def repartitionByByteBudget(media: Dataset[MediaRow],
      bytesPerPartition: Long = 128L << 20): Dataset[MediaRow] = {
    val total = media.toDF().agg(sum(octet_length(col("payload")))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(total.toDouble / bytesPerPartition).toInt)
    media.repartition(parts)
  }
}
