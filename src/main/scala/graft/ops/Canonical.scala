package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical-asset consolidation (historical_data_etl.py:59-87,179-191;
  * duplicated live_data_pipeline.py:50-78): map wrapper ids to canonical
  * ids, then merge each (canonical_id, date) group — base row is the
  * native row (coin_id == canonical_id) else the highest-mcap row; volume
  * becomes the group sum; the base row's nulls are backfilled from other
  * group members.
  *
  * Implemented as a priority window (SURVEY.md §2.4 q_agg_canonical): one
  * shuffle on (canonical_id, date), no UDAF, fully codegen-friendly.
  * Backfill uses the group max — deterministic under any row order, unlike
  * the reference's first-non-null (pandas iteration order).
  */
object Canonical {

  /** Wrapper→canonical mapping via broadcast dim + coalesce fallback
    * (`map(canonical_map).fillna(coin_id)`, historical_data_etl.py:186). */
  def canonicalize(df: DataFrame, mapping: DataFrame, idCol: String,
      fromCol: String, toCol: String): DataFrame =
    df.join(broadcast(mapping), df(idCol) === mapping(fromCol), "left")
      .withColumn("canonical_id", coalesce(mapping(toCol), df(idCol)))
      .drop(fromCol, toCol)

  /** The group merge. `backfillCols` are nullable columns to coalesce from
    * group members; `tiebreak` must be unique per row for determinism. */
  def aggregate(df: DataFrame, canonicalId: String, date: String, id: String,
      mcap: String, volume: String, backfillCols: Seq[String],
      tiebreak: Column): DataFrame = {
    val grp = Window.partitionBy(canonicalId, date)
    val priority = when(col(id) === col(canonicalId), 0).otherwise(1)
    val ordW = grp.orderBy(priority.asc, col(mcap).desc, tiebreak.asc)
    // ALL window expressions in one select: Catalyst then plans a single
    // Exchange → Sort → Window family instead of one WindowExec per
    // withColumn (same fix as the q_agg_canonical query path).
    val backfillSet = backfillCols.toSet
    val projected = df.columns.map {
      case c if backfillSet(c) => coalesce(col(c), max(c).over(grp)).as(c)
      case c => col(c)
    } :+ row_number().over(ordW).as("__rn") :+ sum(volume).over(grp).as("__vol_sum")
    df.select(projected.toIndexedSeq: _*)
      .filter(col("__rn") === 1)
      .withColumn(volume, col("__vol_sum"))
      .drop("__rn", "__vol_sum")
  }
}
