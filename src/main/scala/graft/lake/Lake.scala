package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The engine-side analog of the reference's two-tier cache / data lake
  * (`DataPersistenceLayer`, pipeline_helpers.py:34-102): Parquet datasets
  * under a root path with existence checks and partitioned snapshot
  * writes.
  *
  * Design mapping (SURVEY.md §2.1):
  * - local-dir + GCS bucket two-tier → ONE lake root; on a cluster the
  *   root is `gs://…`/`s3://…` (Hadoop connector) and the "local tier" is
  *   Spark's own caching (`df.persist`) — a distributed engine gets no
  *   benefit from a per-node file copy.
  * - `get`-returns-None on miss → `readIfExists` Option.
  * - cache-set writes through both tiers → a single atomic parquet write
  *   (_SUCCESS-committed), durable for every future job.
  * - daily-snapshot idempotency check (derivatives_snapshot_etl.py:48-56)
  *   → `writeSnapshotIfAbsent` on a date partition.
  *
  * Layout: `root/<layer>/<name>/` parquet directories, optionally
  * partitioned; partition pruning then serves date-ranged reads without
  * listing the full dataset — the 100 TB path.
  */
final class Lake(spark: SparkSession, root: String) {

  private def path(parts: String*): String = (root +: parts).mkString("/")

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(layer: String, name: String): Boolean = {
    val p = path(layer, name)
    fs(p).exists(new Path(p))
  }

  /** Cache get: Some(df) if the artifact exists, else None — the caller
    * decides whether to recompute (pipeline_helpers.py:55-70). */
  def readIfExists(layer: String, name: String): Option[DataFrame] =
    if (exists(layer, name)) Some(spark.read.parquet(path(layer, name))) else None

  def read(layer: String, name: String): DataFrame =
    spark.read.parquet(path(layer, name))

  /** Cache set: overwrite the artifact (pipeline_helpers.py:72-91). */
  def write(df: DataFrame, layer: String, name: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(layer, name))
  }

  /** Idempotent daily snapshot: skip if this partition already exists
    * (derivatives_snapshot_etl.py:48-56). Returns true if written.
    * Only rows belonging to the named partition are appended — appending
    * the caller's whole frame would re-append OTHER partitions' rows on
    * every call, breaking the idempotency contract this method advertises. */
  def writeSnapshotIfAbsent(df: DataFrame, layer: String, name: String,
      partitionCol: String, partitionValue: String): Boolean = {
    val p = path(layer, name, s"$partitionCol=$partitionValue")
    if (fs(p).exists(new Path(p))) false
    else {
      df.filter(org.apache.spark.sql.functions.col(partitionCol).cast("string")
          === partitionValue)
        .write.mode(SaveMode.Append).partitionBy(partitionCol)
        .parquet(path(layer, name))
      true
    }
  }

  /** JSON artifacts (universe maps, lookup dicts;
    * pipeline_helpers.py:83-84,97-99). */
  def writeJson(df: DataFrame, layer: String, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path(layer, name))

  def readJson(layer: String, name: String): DataFrame =
    spark.read.json(path(layer, name))
}
