package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q_join_bucketed's deliverable is the PHYSICAL PLAN: with broadcast
  * disabled (the fixture is tiny; a 100 TB fact side never broadcasts),
  * a join of two tables bucketed+sorted on the key must plan as a
  * sort-merge join with zero SHUFFLE Exchange and zero Sort — the bucket
  * layout proves co-location and per-file order — while the identical
  * plain-parquet join must shuffle both sides. Values are pinned equal
  * to the plain join (which is also the DuckDB oracle).
  */
class BucketedJoinSpec extends SparkSpec {

  private def planNodes(df: DataFrame, node: String): Int = {
    val plan = df.queryExecution.executedPlan.toString
    plan.sliding(node.length).count(_ == node)
  }

  test("bucketed join: zero shuffle/sort under SMJ; plain join shuffles; values equal") {
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1") // force SMJ: fact sides never broadcast
    try {
      val bucketed = graft.queries.JoinQueries.bucketedJoinFrame(spark, sf)
      // force execution so AQE finalizes the plan before we read it
      val got = bucketed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the scale claim: NO Exchange of any kind — neither shuffle nor
      // broadcast — anywhere in the final plan; the fact table never
      // leaves its executors. (Sort nodes DO remain: Spark ≥3.0 ignores
      // bucketed sortBy order at scan time — SPARK-28595 made
      // bucketedTableScan.outputOrdering legacy-off — but those sorts
      // are partition-LOCAL, zero network; the global flag must be false.)
      assert(planNodes(bucketed, "Exchange") == 0,
        s"bucketed join must not exchange:\n${bucketed.queryExecution.executedPlan}")
      assert(!bucketed.queryExecution.executedPlan.toString
          .matches("(?s).*Sort \\[[^\\]]*\\], true,.*"),
        "any residual sort must be partition-local, never global")

      val plain = graft.util.Tables.orders(spark, sf).select("o_orderkey")
        .join(graft.util.Tables.lineitem(spark, sf)
            .select("l_orderkey", "l_extendedprice"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          graft.util.Exact.exactSum(col("l_extendedprice")).as("sum_price"))
      val expected = plain.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(planNodes(plain, "Exchange hashpartitioning") >= 1,
        "the unbucketed baseline does shuffle")
      assert(got == expected, "layout changes the plan, never the values")
    } finally spark.conf.set(thresholdKey, saved)
  }
}
