package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Building blocks for the LLM-training-data operators (SURVEY.md §2.12):
  * shingling, portable hashing, token stats. Everything is a per-row or
  * explode+aggregate expression pipeline — no UDFs, no driver loops — so
  * each op is one scan plus shuffles on (doc) or (band) keys and scales
  * linearly with corpus size.
  *
  * Hashing is md5-based (not Spark's murmur `hash()`): md5 is defined
  * identically in every engine, which makes results portable — the same
  * property that lets the DuckDB oracle agree lets a 100 TB run resume or
  * migrate engines without re-hashing the corpus.
  */
object TextOps {

  /** Whitespace tokens of a document, preserving order + multiplicity. */
  def tokens(text: Column): Column = split(text, " ")

  /** 32-bit portable hash of a string: first 8 hex digits of md5. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Explode a document into (i, word) rows, i 1-based. */
  def explodeTokens(docs: DataFrame): DataFrame =
    docs.withColumn("sp", tokens(col("text")))
      .select(col("doc_id"), posexplode(col("sp")).as(Seq("pos0", "word")))
      .withColumn("i", col("pos0") + 1).drop("pos0")

  /** Word k-shingles as (doc_id, shingle) rows, k=3. One row per window
    * position; shingle text joined with single spaces. */
  def shingles3(docs: DataFrame): DataFrame =
    docs.withColumn("sp", tokens(col("text")))
      .select(col("doc_id"), col("sp"), explode(sequence(lit(1), size(col("sp")))).as("i"))
      .filter(col("i") + 2 <= size(col("sp")))
      .select(col("doc_id"),
        concat(element_at(col("sp"), col("i")), lit(" "),
          element_at(col("sp"), col("i") + 1), lit(" "),
          element_at(col("sp"), col("i") + 2)).as("shingle"))

  /** One MinHash value: min over shingles of a seeded md5 (first 16 hex
    * chars — string min, identical in any engine). Use inside a
    * groupBy(doc_id).agg(...). */
  def minhash(seed: Int): Column =
    min(substring(md5(concat(lit(s"$seed|"), col("shingle")).cast("binary")), 1, 16))
      .as(s"mh$seed")
}
