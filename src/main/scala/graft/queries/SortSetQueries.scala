package graft.queries

import graft.Q
import graft.util.Exact
import graft.util.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 sorts/limits/top-K and §2.8 set operations. */
object SortSetQueries {

  private val ord: Column = col("l_orderkey") * 8 + col("l_linenumber")
  private val ordSql = "(l_orderkey * 8 + l_linenumber)"

  /** Max-by: the single best row per group with all columns
    * (`sort_values().iloc[0]`, historical_data_etl.py:73) — window top-1,
    * which Spark executes with rank-limit pushdown (no full sort). */
  val sortMaxby = Q("q_sort_maxby",
    "whole-row argmax per group")(
    "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_shipdate " +
      "FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_shipdate, " +
      s"row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, $ordSql) AS rn " +
      "FROM lineitem) t WHERE rn = 1") {
    (s, d) =>
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, ord)
      lineitem(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity", "l_shipdate")
  }

  /** Multi-key sort with explicit output ordinal
    * (`sort_values(by=[id, date])`, test_data_integrity.py:237). Global
    * (unpartitioned) window — correct only for dimension-sized inputs;
    * fact-scale ordering goes through orderBy + write, not a global
    * row_number (noted for the 100 TB path). */
  val sortMulti = Q("q_sort_multi",
    "multi-key sort with global ordinal")(
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal, " +
      "row_number() OVER (ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC) AS pos " +
      "FROM supplier") {
    (s, d) =>
      val w = Window.orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)
      supplier(s, d).select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"), row_number().over(w).cast("long").as("pos"))
  }

  /** Sorted distinct id list out of the universe map
    * (historical_data_etl.py:132): flatten per-month memberships, dedupe. */
  val sortDistinct = Q("q_sort_distinct",
    "distinct ids across monthly universes")(
    "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, o_custkey, " +
      s"${Exact.Sql.avg("o_totalprice")} AS avg_mcap FROM orders GROUP BY 1, 2) " +
      "SELECT DISTINCT o_custkey FROM (SELECT m.*, row_number() OVER " +
      "(PARTITION BY month ORDER BY avg_mcap DESC, o_custkey) AS rn FROM m) WHERE rn <= 10") {
    (s, d) =>
      val m = orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"), col("o_custkey"))
        .agg(Exact.exactAvg(col("o_totalprice")).as("avg_mcap"))
      val w = Window.partitionBy("month").orderBy(col("avg_mcap").desc, col("o_custkey"))
      m.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select("o_custkey").distinct()
  }

  /** Top-30% selection per month (`nlargest(int(len*0.3))`,
    * test_data_integrity.py:119). */
  val topfrac = Q("q_topfrac",
    "top 30% of orders per month by value")(
    "SELECT month, o_orderkey, o_totalprice, rn FROM (" +
      "SELECT date_trunc('month', o_orderdate) AS month, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY date_trunc('month', o_orderdate) " +
      "ORDER BY o_totalprice DESC, o_orderkey) AS rn, " +
      "floor(count(*) OVER (PARTITION BY date_trunc('month', o_orderdate)) * 0.3) AS k " +
      "FROM orders) t WHERE rn <= k") {
    (s, d) =>
      val o = orders(s, d).withColumn("month", date_trunc("month", col("o_orderdate")))
      val w = Window.partitionBy("month")
      o.withColumn("rn",
          row_number().over(w.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
        .withColumn("k", floor(count(lit(1)).over(w) * 0.3))
        .filter(col("rn") <= col("k"))
        .select("month", "o_orderkey", "o_totalprice", "rn")
  }

  /** Key intersection between two snapshot versions
    * (test_data_integrity.py:134). */
  val intersectKeys = Q("q_intersect_keys",
    "customers active in both 1997 and 1998")(
    "SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1997 " +
      "INTERSECT " +
      "SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1998") {
    (s, d) =>
      val o = orders(s, d)
      o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1998).select("o_custkey"))
  }

  /** Schema validation as set difference (data_quality_gate.py:32-36):
    * required columns missing from the actual table schema. Metadata-level
    * in Spark; the oracle derives the same from DESCRIBE. */
  val exceptSchema = Q("q_except_schema",
    "required-minus-actual schema columns")(
    "SELECT c AS missing_col FROM (VALUES ('l_orderkey'), ('l_shipdate'), " +
      "('canonical_id'), ('market_cap')) v(c) " +
      "WHERE c NOT IN (SELECT column_name FROM (DESCRIBE lineitem)) ORDER BY 1") {
    (s, d) =>
      import s.implicits._
      val required = Seq("l_orderkey", "l_shipdate", "canonical_id", "market_cap")
      val actual = lineitem(s, d).columns.toSet
      required.filterNot(actual).sorted.toDF("missing_col")
  }

  /** Distinct normalized ticker set (coinbase_universe_pipeline.py:86). */
  val distinctTickers = Q("q_distinct_tickers",
    "distinct uppercased symbols")(
    "SELECT DISTINCT upper(p_brand) AS ticker FROM part") {
    (s, d) => part(s, d).select(upper(col("p_brand")).as("ticker")).distinct()
  }

  val all: Seq[Q] = Seq(sortMaxby, sortMulti, sortDistinct, topfrac,
    intersectKeys, exceptSchema, distinctTickers)
}
