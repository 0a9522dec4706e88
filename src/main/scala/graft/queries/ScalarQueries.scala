package graft.queries

import graft.Q
import graft.util.Tables._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — the scalar-function surface (string/date/math/array/
  * map/json). Each is a registered single-purpose query over a small or
  * pruned input; all are per-row codegen'd expressions (no UDFs), so they
  * fuse into whatever pipeline uses them at scale.
  */
object ScalarQueries {

  /** epoch-ms → timestamp, day-normalized (pipeline_helpers.py:213). */
  val fnTsMs = Q("q_fn_ts_ms", "epoch-ms round trip + day normalize")(
    "SELECT event_id, epoch_ms(ts) AS ms, date_trunc('day', epoch_ms(epoch_ms(ts))) AS day FROM events") {
    (s, d) => events(s, d).select(col("event_id"),
      unix_millis(col("ts")).as("ms"),
      date_trunc("day", timestamp_millis(unix_millis(col("ts")))).as("day"))
  }

  /** epoch-s → timestamp, day-normalized (pipeline_helpers.py:273). */
  val fnTsS = Q("q_fn_ts_s", "epoch-seconds to timestamp")(
    "SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs, " +
      "date_trunc('day', epoch_ms(CAST(floor(epoch(ts)) AS BIGINT) * 1000)) AS day FROM events") {
    (s, d) => events(s, d).select(col("event_id"),
      unix_seconds(col("ts")).as("secs"),
      date_trunc("day", timestamp_seconds(unix_seconds(col("ts")))).as("day"))
  }

  /** ISO string ↔ timestamp round trip (pipeline_helpers.py:142-144). */
  val fnDateParse = Q("q_fn_date_parse", "format + parse date strings")(
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso, " +
      "strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS parsed FROM orders") {
    (s, d) => orders(s, d).select(col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
      to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd").as("parsed"))
  }

  /** Month-key formatting '%Y-%m-01'
    * (universe_generation_pipeline.py:170). */
  val fnDateFormat = Q("q_fn_date_format", "month-key string")(
    "SELECT DISTINCT strftime(date_trunc('month', o_orderdate), '%Y-%m-01') AS month_key FROM orders") {
    (s, d) => orders(s, d)
      .select(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-01").as("month_key"))
      .distinct()
  }

  /** Ticker normalization (historical_data_etl.py:120). */
  val fnUpper = Q("q_fn_upper", "uppercase normalize")(
    "SELECT c_custkey, upper(c_mktsegment) AS seg, upper(c_name) AS name_u FROM customer") {
    (s, d) => customer(s, d).select(col("c_custkey"),
      upper(col("c_mktsegment")).as("seg"), upper(col("c_name")).as("name_u"))
  }

  /** Scalar rounding, half-up recipe (data_quality_gate.py:43) — see
    * q_round_precision for the bit-reproducibility argument. */
  val fnRound = Q("q_fn_round", "scalar half-up round to 1dp")(
    "SELECT p_partkey, floor(p_retailprice * 10.0 + 0.5) / 10.0 AS price_1dp FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      (floor(col("p_retailprice") * lit(10.0) + lit(0.5)) / lit(10.0)).as("price_1dp"))
  }

  /** |a-b| > tol drift test (test_data_integrity.py:141-142). */
  val fnAbsDiff = Q("q_fn_abs_diff", "absolute-difference tolerance flag")(
    "SELECT l_orderkey, l_linenumber, abs(l_extendedprice - (l_quantity * 1000.0)) AS drift, " +
      "(abs(l_extendedprice - (l_quantity * 1000.0)) > 0.000000001) AS differs FROM lineitem") {
    (s, d) =>
      val drift = abs(col("l_extendedprice") - (col("l_quantity") * lit(1000.0)))
      lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        drift.as("drift"), (drift > 1e-9).as("differs"))
  }

  /** sqrt annualization factor (test_data_integrity.py:257). */
  val fnSqrt = Q("q_fn_sqrt", "square root")(
    "SELECT o_orderkey, sqrt(o_totalprice) AS root_price FROM orders") {
    (s, d) => orders(s, d).select(col("o_orderkey"), sqrt(col("o_totalprice")).as("root_price"))
  }

  /** Percentage-of-total math (data_quality_gate.py:102). */
  val fnPct = Q("q_fn_pct", "percentage of group total")(
    "SELECT l_returnflag, (CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS DOUBLE) " +
      "/ count(*)) * 100.0 AS pct_removed FROM lineitem GROUP BY 1") {
    (s, d) => lineitem(s, d).groupBy("l_returnflag")
      .agg(((count(when(col("l_discount") > 0.05, 1)).cast("double") / count(lit(1))) * 100.0)
        .as("pct_removed"))
  }

  /** Decimal-digit-count extraction (test_data_integrity.py:86):
    * string-split on '.', length of fraction. */
  val fnDecimals = Q("q_fn_decimals", "decimal-length of price strings")(
    "SELECT l_orderkey, l_linenumber, " +
      "COALESCE(length(list_extract(string_split(CAST(l_extendedprice AS VARCHAR), '.'), 2)), 0) " +
      "AS n_decimals FROM lineitem") {
    (s, d) => lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      coalesce(length(element_at(split(col("l_extendedprice").cast("string"), "\\."), 2)), lit(0))
        .as("n_decimals"))
  }

  /** Lowercased substring membership
    * (coingecko_asset_attributes_pipeline.py:100). */
  val fnContains = Q("q_fn_contains", "keyword containment flag")(
    "SELECT p_partkey, contains(lower(p_name), 'green') AS is_green FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      lower(col("p_name")).contains("green").as("is_green"))
  }

  /** Higher-order exists over an array column (`categories`,
    * coingecko_asset_attributes_pipeline.py:100). */
  val fnArrayExists = Q("q_fn_array_exists", "any-element predicate on token array")(
    "SELECT p_partkey, (len(list_filter(string_split(p_type, ' '), x -> lower(x) = 'tin')) > 0) " +
      "AS has_tin FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      exists(split(col("p_type"), " "), x => lower(x) === "tin").as("has_tin"))
  }

  /** First element of a list column (`homepage[0]`,
    * pipeline_helpers.py:154). */
  val fnArrayFirst = Q("q_fn_array_first", "first array element")(
    "SELECT p_partkey, list_extract(string_split(p_type, ' '), 1) AS first_tok FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      element_at(split(col("p_type"), " "), 1).as("first_tok"))
  }

  /** Nested JSON field extraction (pipeline_helpers.py:129-156). */
  val fnJsonGet = Q("q_fn_json_get", "json field extraction + numeric cast")(
    "SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
      "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int, " +
      "json_extract_string(props, '$.missing') AS absent FROM events") {
    (s, d) => events(s, d).select(col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_int"),
      get_json_object(col("props"), "$.missing").as("absent"))
  }

  /** Literal-map lookup with default (`Series.map` + fillna,
    * pipeline_helpers.py:250) — engine form is a broadcast join
    * (q_join_map_broadcast); this is the in-expression form. */
  val fnMapLookup = Q("q_fn_map_lookup", "inline map lookup with default")(
    "SELECT c_custkey, CASE c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'AUTOMOBILE' THEN 'A' " +
      "WHEN 'MACHINERY' THEN 'M' ELSE 'X' END AS seg_code FROM customer") {
    (s, d) =>
      val m = typedLit(Map("BUILDING" -> "B", "AUTOMOBILE" -> "A", "MACHINERY" -> "M"))
      customer(s, d).select(col("c_custkey"),
        coalesce(element_at(m, col("c_mktsegment")), lit("X")).as("seg_code"))
  }

  /** Null tests (`pd.isna`, live_data_pipeline.py:73). */
  val fnIsnull = Q("q_fn_isnull", "null flags")(
    "SELECT l_orderkey, l_linenumber, (nullif(l_tax, 0.0) IS NULL) AS tax_missing, " +
      "(nullif(l_discount, 0.0) IS NOT NULL) AS has_discount FROM lineitem") {
    (s, d) => lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      expr("nullif(l_tax, 0.0)").isNull.as("tax_missing"),
      expr("nullif(l_discount, 0.0)").isNotNull.as("has_discount"))
  }

  /** Guarded division (test_data_integrity.py:257). */
  val fnDivGuard = Q("q_fn_div_guard", "division with zero guard")(
    "SELECT l_orderkey, l_linenumber, " +
      "CASE WHEN l_discount <> 0.0 THEN l_extendedprice / l_discount ELSE 0.0 END AS ratio " +
      "FROM lineitem") {
    (s, d) => lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      when(col("l_discount") =!= 0.0, col("l_extendedprice") / col("l_discount"))
        .otherwise(0.0).as("ratio"))
  }

  /** Levenshtein edit distance (r12) — the fuzzy-match scalar entity
    * resolution and dedup-verify both lean on (q_dedup_edit_verify uses
    * the same metric over LSH candidate pairs; this is the bare scalar
    * surface): distance between each part's name and its type string,
    * plus the length-normalized similarity as a pinned cell. Both
    * engines implement the classic integer DP, so the distance needs no
    * numeric detour; codegen'd per-row, no shuffle at all. */
  val fnLevenshtein = Q("q_fn_levenshtein", "per-row edit distance + pinned similarity")(
    "SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev, " +
      graft.util.Exact.Sql.pinScoreInt(
        "1.0 - CAST(levenshtein(p_name, p_type) AS DOUBLE) / " +
          "CAST(greatest(length(p_name), length(p_type)) AS DOUBLE)") + " AS sim " +
      "FROM part") {
    (s, d) =>
      val lev = levenshtein(col("p_name"), col("p_type"))
      part(s, d).select(col("p_partkey"), lev.cast("long").as("lev"),
        graft.util.Exact.pinScoreInt(
          lit(1.0) - lev.cast("double") /
            greatest(length(col("p_name")), length(col("p_type"))).cast("double"))
          .as("sim"))
  }

  /** Delimited-field extraction (r12) — `split_part`, the log-line /
    * composite-key field accessor (both engines 1-index and return ''
    * when the index is out of range, verified). Part names are
    * space-delimited color words — extract the 2nd. */
  val fnSplitPart = Q("q_fn_split_part", "split_part field extraction (2nd field)")(
    "SELECT p_partkey, split_part(p_name, ' ', 2) AS field2 FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      split_part(col("p_name"), lit(" "), lit(2)).as("field2"))
  }

  /** Regex group extraction (r12) — the brand's numeric id out of
    * 'Brand#NN'. Pattern stays in the character-class subset where Java
    * regex (Spark) and RE2-ish (DuckDB) semantics provably agree; both
    * engines return '' on no-match for group extraction. */
  val fnRegexpExtract = Q("q_fn_regexp_extract", "regexp_extract first digit run")(
    "SELECT p_partkey, regexp_extract(p_brand, '([0-9]+)', 1) AS digits FROM part") {
    (s, d) => part(s, d).select(col("p_partkey"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("digits"))
  }

  /** Fixed-width key padding (r12) — lpad/rpad, the composite-sort-key
    * and fixed-width-export former ('Customer#000000001'-style zero
    * padding keeps lexicographic order = numeric order). Both engines
    * pad-and-truncate identically (verified by the gate). */
  val fnPad = Q("q_fn_pad", "lpad/rpad fixed-width key formation")(
    "SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key12, " +
      "rpad(o_orderpriority, 16, '.') AS pr16 FROM orders") {
    (s, d) => orders(s, d).select(col("o_orderkey"),
      lpad(col("o_orderkey").cast("string"), 12, "0").as("key12"),
      rpad(col("o_orderpriority"), 16, ".").as("pr16"))
  }

  val all: Seq[Q] = Seq(fnTsMs, fnTsS, fnDateParse, fnDateFormat, fnUpper, fnRound,
    fnAbsDiff, fnSqrt, fnPct, fnDecimals, fnContains, fnArrayExists, fnArrayFirst,
    fnJsonGet, fnMapLookup, fnIsnull, fnDivGuard, fnLevenshtein, fnSplitPart,
    fnRegexpExtract, fnPad)
}
