package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the testdata tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle query the driver
  * hash-compares against (see Verify.scala and SURVEY.md §7.3).
  *
  * Invariant: result column NAMES and VALUES must match the oracle exactly;
  * float results must be computed by bit-reproducible recipes (graft.util.Exact)
  * or per-row scalar expressions so hashing is stable.
  */
final case class Q(
    id: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(id: String, doc: String)(sql: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(id, fn, Some(sql), doc)

  /** For operators DuckDB can't express (driver records rows-only check). */
  def noOracle(id: String, doc: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(id, fn, None, doc)
}
