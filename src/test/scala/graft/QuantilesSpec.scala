package graft

import graft.ops.Quantiles
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.Quantiles is the r4 replacement for the three low-cardinality-key
  * window plans (VERDICT r3 #1-3). These tests pin BIT-EQUALITY between
  * the two-phase histogram plans and the single-sort formulations they
  * replace, on inputs chosen to hit the edges: heavy ties (few distinct
  * values, runs straddling cut positions), groups smaller than the tile
  * count, a constant column (width == 0, everything in one bucket), and
  * bucket counts small enough that every bucket is a boundary bucket.
  */
class QuantilesSpec extends SparkSpec {

  private def randomDf(n: Int, groups: Int, distinct: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42 + n + groups + distinct)
    (1 to n).map { i =>
      (i.toLong, s"g${rnd.nextInt(groups)}", (rnd.nextInt(distinct) * 7.25) - 13.0)
    }.toDF("id", "grp", "v")
  }

  private def assertNtileMatches(n: Int, groups: Int, distinct: Int,
      tiles: Int, buckets: Int): Unit = {
    val df = randomDf(n, groups, distinct)
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val expected = df.withColumn("t", ntile(tiles).over(w).cast("long"))
    val actual = Quantiles.exactNtile(df, "grp", "v", col("id"), tiles, "t",
      buckets = buckets)
    assert(actual.count() == n)
    assert(expected.exceptAll(actual).count() == 0 &&
      actual.exceptAll(expected).count() == 0,
      s"ntile mismatch n=$n groups=$groups distinct=$distinct tiles=$tiles buckets=$buckets")
  }

  test("exactNtile == ntile window: random doubles, several shapes") {
    assertNtileMatches(n = 2000, groups = 3, distinct = 500, tiles = 5, buckets = 64)
    assertNtileMatches(n = 1000, groups = 4, distinct = 9, tiles = 5, buckets = 32)
    assertNtileMatches(n = 500, groups = 2, distinct = 500, tiles = 7, buckets = 8)
  }

  test("exactNtile: groups smaller than the tile count (rn-identity tiles)") {
    assertNtileMatches(n = 12, groups = 5, distinct = 6, tiles = 5, buckets = 16)
  }

  test("exactNtile: constant value column (width == 0, pure ordinal split)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, "g", 3.5)).toDF("id", "grp", "v")
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val expected = df.withColumn("t", ntile(4).over(w).cast("long"))
    val actual = Quantiles.exactNtile(df, "grp", "v", col("id"), 4, "t")
    assert(expected.exceptAll(actual).count() == 0 &&
      actual.exceptAll(expected).count() == 0)
  }

  test("exactNtile: null and NaN rows match the window form (nulls first, NaN last)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      val v: Option[Double] =
        if (i % 11 == 0) None
        else if (i % 13 == 0) Some(Double.NaN)
        else if (i % 17 == 0) Some(if (i % 2 == 0) 0.0 else -0.0) // SQL-equal zeros
        else Some(rnd.nextInt(40) * 3.25 - 20.0) // negatives exercise the sign flip
      (i.toLong, s"g${i % 3}", v)
    }.toDF("id", "grp", "v")
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val expected = df.withColumn("t", ntile(4).over(w).cast("long"))
    val actual = Quantiles.exactNtile(df, "grp", "v", col("id"), 4, "t", buckets = 16)
    assert(actual.count() == 500) // no row silently vanishes
    assert(expected.exceptAll(actual).count() == 0 &&
      actual.exceptAll(expected).count() == 0)
  }

  test("exactNtile: empty input") {
    import spark.implicits._
    val df = Seq.empty[(Long, String, Double)].toDF("id", "grp", "v")
    assert(Quantiles.exactNtile(df, "grp", "v", col("id"), 5, "t").count() == 0)
  }

  test("boundary branch pushes its value range to the parquet scan (and vanishes when empty)") {
    // coarse resolution forces cut positions inside occupied buckets: the
    // boundary-bucket rescan must carry a pushable l_extendedprice range
    // (parquet row-group min/max skipping at scale)
    val li = graft.util.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    val coarse = Quantiles.exactNtile(li, "l_returnflag", "l_extendedprice",
      col("l_orderkey") * 10 + col("l_linenumber"), 5, "t", buckets = 8)
    val plan = coarse.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_extendedprice"),
      s"boundary scan lost its pushed value range:\n${plan.take(2000)}")
    // at fine resolution cuts can land exactly between buckets — the
    // boundary branch must then disappear from the plan entirely (filter
    // on a false literal folds away) rather than scan anything
    val fine = graft.queries.WindowQueries.winNtile.fn(spark, sf)
    val finePlan = fine.queryExecution.executedPlan.toString
    assert(finePlan.contains("Union") ==
      finePlan.contains("GreaterThanOrEqual(l_extendedprice"),
      s"boundary branch present without a pushed range:\n${finePlan.take(2000)}")
  }

  test("groupQuantilesDisc == row_number formulation (ties included)") {
    val df = randomDf(3000, 4, 40).withColumn("v", col("v").cast("long"))
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val wOrd = Window.partitionBy("grp").orderBy("v")
    val wAll = Window.partitionBy("grp")
    val bySort = df
      .select(col("grp"), col("v"), row_number().over(wOrd).cast("long").as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .groupBy("grp")
      .agg(max("n").as("n"),
        ps.map { case (p, nm) =>
          max(when(col("rn") === ceil(lit(p) * col("n")), col("v"))).as(nm)
        }: _*)
    val byHist = Quantiles.groupQuantilesDisc(df.select("grp", "v"), "grp", "v", ps)
    assert(bySort.exceptAll(byHist).count() == 0 &&
      byHist.exceptAll(bySort).count() == 0)
  }

  /** The r13 value-histogram formulation, kept as the reference for the
    * r14 bucket rewrite: its null/NaN semantics (nulls counted in n and
    * in cumulative positions, min() skipping them; NaN ordered last) are
    * the contract the bucketed form must reproduce bit-for-bit. */
  private def discNaive(df: org.apache.spark.sql.DataFrame, group: String,
      value: String, ps: Seq[(Double, String)]) = {
    val hist = df.groupBy(group, value).agg(count(lit(1)).as("_cnt"))
    val withCum = hist
      .withColumn("_cum", sum("_cnt").over(Window.partitionBy(group).orderBy(value)))
      .withColumn("_n", sum("_cnt").over(Window.partitionBy(group)))
    val aggs = ps.map { case (p, name) =>
      min(when(col("_cum") >= ceil(lit(p) * col("_n")), col(value))).as(name)
    }
    withCum.groupBy(group).agg(max("_n").as("n"), aggs: _*)
  }

  test("bucketed groupQuantilesDisc == value-histogram form: doubles, nulls, NaN, near-unique") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val ps = Seq(0.25 -> "q1", 0.5 -> "med", 0.75 -> "q3", 1.0 -> "mx")
    // near-unique continuous values with sign changes (the agg-family shape)
    val cont = (1 to 4000).map { i =>
      (s"g${i % 3}", Option(rnd.nextDouble() * 2e5 - 1e5))
    }.toDF("grp", "v")
    // heavy ties + nulls + NaN + SQL-equal zeros
    val nasty = (1 to 1500).map { i =>
      val v: Option[Double] =
        if (i % 10 == 0) None
        else if (i % 13 == 0) Some(Double.NaN)
        else if (i % 17 == 0) Some(if (i % 2 == 0) 0.0 else -0.0)
        else Some((rnd.nextInt(12) * 5.5) - 30.0)
      (s"g${i % 4}", v)
    }.toDF("grp", "v")
    // a group whose values are ALL null (quantiles must come back null)
    val allNull = Seq(("gnull", None: Option[Double])).toDF("grp", "v")
    for (df <- Seq(cont, nasty, nasty.unionAll(allNull))) {
      val expected = discNaive(df, "grp", "v", ps)
      val actual = Quantiles.groupQuantilesDisc(df, "grp", "v", ps)
      assert(expected.exceptAll(actual).count() == 0 &&
        actual.exceptAll(expected).count() == 0,
        s"bucketed disc mismatch:\nexpected ${expected.collect().toSeq}\n" +
          s"actual ${actual.collect().toSeq}")
    }
  }

  test("exclusivePrefixSum == unpartitioned window (distinct keys, mixed signs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // distinct order keys across several binades, both signs, and zero;
    // integer weights so bit-equality is exact by construction
    val keys = (rnd.shuffle((1 to 400).toList).take(300).map(i =>
      (i - 150) * math.pow(2.0, i % 11) / 3.0) :+ 0.0).distinct
    val df = keys.zipWithIndex
      .map { case (k, i) => (k, (i % 7).toLong) }.toDF("score", "nn")
    val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("cumneg", coalesce(sum("nn").over(w), lit(0L)))
    val actual = Quantiles.exclusivePrefixSum(df, "score", "nn", "cumneg")
    assert(actual.count() == keys.size)
    assert(expected.exceptAll(actual).count() == 0 &&
      actual.exceptAll(expected).count() == 0)
    // the plan's only unpartitioned window must run over the bucket
    // HISTOGRAM (its input carries the aggregated _bsum), never over the
    // input rows — the serialize-into-one-task shape this helper replaces
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case qs: QueryStageExec => windows(qs.plan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val winExecs = windows(actual.queryExecution.executedPlan)
    val unpart = winExecs.filter(_.partitionSpec.isEmpty)
    assert(unpart.size == 1, s"expected one histogram window, got ${unpart.size}")
    assert(unpart.head.child.output.exists(_.name == "_bsum"),
      "the unpartitioned window is not over the bucket histogram")
  }
}
