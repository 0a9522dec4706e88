package graft.queries

import graft.Q
import graft.ops.TextOps
import graft.util.Materialize.Ops
import graft.util.Tables._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.12 north-star: privacy / span-level curation operators
  * over `documents` — PII detection + redaction and duplicated-substring
  * (copied-span) measurement. Together with the whole-doc near-dup
  * family these cover the three granularities a training-data pipeline
  * dedups at: document (minhash/simhash), section (winnow pairs), and
  * span (20-token windows here).
  *
  * Regex portability: every pattern is restricted to the syntax Java
  * regex and RE2 (the oracle engine) interpret identically — character
  * classes, bounded repetition, ASCII `\b`, alternation-free. Both
  * engines scan leftmost, non-overlapping, resuming after each match,
  * so match COUNTS and sequential replacement agree bit-for-bit.
  */
object CurationQueries {

  /** Per-document PII scan + redaction: counts of email / phone / IPv4
    * matches on the raw text, plus the md5 of the text after sequential
    * redaction (email → ip → phone, fixed order on both engines). The
    * hash pins the full redacted output without shipping the corpus
    * back. Counts are computed on the ORIGINAL text, so they are
    * independent of redaction order.
    *
    * Scale: pure map-side projection — no shuffle, no agg; the patterns
    * are foldable literals compiled once per task, and the whole row
    * stays inside one WholeStageCodegen span. A zero-PII corpus still
    * emits one row per doc (counts 0, hash of the unchanged text), so
    * the oracle exercises real values — not empty-vs-empty. */
  val textPii = Q("q_text_pii", "PII detection + redaction (email/phone/IPv4)")(
    "SELECT doc_id, " +
      s"CAST(coalesce(len(regexp_extract_all(text, '${TextOps.PiiEmail}')), 0) AS BIGINT) AS n_email, " +
      s"CAST(coalesce(len(regexp_extract_all(text, '${TextOps.PiiPhone}')), 0) AS BIGINT) AS n_phone, " +
      s"CAST(coalesce(len(regexp_extract_all(text, '${TextOps.PiiIpv4}')), 0) AS BIGINT) AS n_ip, " +
      s"md5(regexp_replace(regexp_replace(regexp_replace(text, " +
      s"'${TextOps.PiiEmail}', '<EMAIL>', 'g'), " +
      s"'${TextOps.PiiIpv4}', '<IP>', 'g'), " +
      s"'${TextOps.PiiPhone}', '<PHONE>', 'g')) AS red_hash " +
      "FROM documents") {
    (s, d) =>
      def n(pat: String) =
        // size(null) is -1 under legacy sizeOfNull: guard null text explicitly
        when(col("text").isNotNull,
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
          .otherwise(lit(0L))
      documents(s, d).select(col("doc_id"),
        n(TextOps.PiiEmail).as("n_email"),
        n(TextOps.PiiPhone).as("n_phone"),
        n(TextOps.PiiIpv4).as("n_ip"),
        md5(TextOps.piiRedact(col("text")).cast("binary")).as("red_hash"))
  }

  /** Span-level duplication measurement: hash every 20-token window of
    * every document; a window hash seen in ≥ 2 DISTINCT documents marks
    * its windows as duplicated spans. Output per doc: window count,
    * duplicated-window count, duplicated fraction (null when the doc is
    * shorter than one window). This is the "dedup at the substring
    * granularity" signal — verbatim quotes / syndicated passages inside
    * otherwise-distinct documents, which whole-doc near-dup and even
    * section-level winnow pairs under-weight.
    *
    * Scale: explode is corpus-linear (one row per token position); the
    * duplicate-window table groups on the window hash — a keyspace
    * proportional to total token count, partial-aggregated before its
    * shuffle. The dup-mark join is against a DEDUPED one-row-per-hash
    * frame, so a boilerplate window shared by a million docs joins 1:1
    * per occurrence — no quadratic candidate term at any frequency (this
    * op marks spans; it never enumerates pairs). */
  val dedupSubstring = Q("q_dedup_substring", "duplicated 20-token span fractions")(
    "WITH " + TextQueries.tokBody + ", " +
      "wins AS (SELECT doc_id, ('0x' || substr(md5(array_to_string(sp[i:i+19], ' ')), 1, 8))::BIGINT AS wh " +
      "FROM tok WHERE i + 19 <= len(sp)), " +
      "dw AS (SELECT wh, 1 AS isdup FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) >= 2), " +
      "m AS (SELECT w.doc_id, d.isdup FROM wins w LEFT JOIN dw d USING (wh)), " +
      "pd AS (SELECT doc_id, count(*) AS n_windows, " +
      "CAST(sum(coalesce(isdup, 0)) AS BIGINT) AS n_dup_windows FROM m GROUP BY 1) " +
      "SELECT d.doc_id, CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows, " +
      "CAST(coalesce(pd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows, " +
      "CASE WHEN pd.n_windows > 0 THEN " +
      "CAST(pd.n_dup_windows AS DOUBLE) / CAST(pd.n_windows AS DOUBLE) END AS dup_frac " +
      "FROM documents d LEFT JOIN pd USING (doc_id)") {
    (s, d) =>
      val W = 20
      // one row per 20-token window start; docs shorter than W emit none
      // (explode drops the empty array) and rejoin as zero-window rows
      val wins = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("sp"))
        .select(col("doc_id"),
          explode(when(size(col("sp")) >= W,
            transform(sequence(lit(1), size(col("sp")) - (W - 1)),
              i => TextOps.hash32(concat_ws(" ", slice(col("sp"), i, lit(W))))))
            .otherwise(typedLit(Array.empty[Long]))).as("wh"))
        // feeds both the distinct-doc grouping and the mark join: one scan
        .materialized(eager = false)
      val dw = wins.groupBy("wh").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).select(col("wh"), lit(1L).as("isdup"))
      val pd = wins.join(dw, Seq("wh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("isdup"), lit(0L))).as("n_dup_windows"))
      documents(s, d).select("doc_id").join(pd, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          when(col("n_windows") > 0,
            col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
            .as("dup_frac"))
  }

  val all: Seq[Q] = Seq(textPii, dedupSubstring)
}
