package graft

import graft.queries.{AggQueries, CoreQueries, VectorQueries}

/** Round-11 batch-7: the PQ recall gauge against a direct hit recount,
  * KMV mergeability against the sketch-union law on live data, and the
  * partition-pruned scan's PLAN pinned (PartitionFilters, not
  * PushedFilters) beside value equality.
  */
class Round11gOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("eval_recall_pq: equals the hit recount from the registered PQ search") {
    val gt = VectorQueries.annCosineTopk.fn(spark, sf).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorQueries.annPq.fn(spark, sf)
      .select("q", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = pq.filter(gt).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = VectorQueries.evalRecallPq.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == (0L to 9L).toSet, "query-universe complete")
    got.foreach { case (q, h, cell) =>
      assert(h == hits.getOrElse(q, 0L))
      assert(cell == math.floor(h / 3.0 * Grid).toLong)
    }
  }

  test("agg_kmv_merge: merged row derives from sketches only and obeys the union law") {
    val rows = AggQueries.aggKmvMerge.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    val merged = rows("MERGED")
    val groups = (rows - "MERGED").values.toSeq
    assert(groups.nonEmpty)
    // union law: the merged kth hash is the k-th smallest of the sketch
    // union — never smaller than the smallest per-group kth (each group
    // sketch alone bounds its own hash space) when all sketches filled
    if (groups.forall(_._1 == 64L) && merged._1 == 64L)
      assert(merged._2 <= groups.map(_._2).max,
        "merging can only tighten or keep the kth hash vs the loosest group")
    // exact global distinct is published on the merged row and the
    // estimate lands within the standard KMV error envelope (~1/sqrt(k))
    val exact = merged._4.get.toDouble
    assert(math.abs(merged._3 - exact) / exact < 0.5,
      s"est=${merged._3} exact=$exact")
    groups.foreach { case (_, _, _, eg) => assert(eg.isEmpty) }
  }

  test("agg_kmv_merge: merged sketch equals the sketch built from raw data directly") {
    // the mergeability LAW: top-k over the union of per-group top-k sets
    // equals top-k over all distinct hashes
    val dh = graft.util.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag AS grp",
        "CAST(conv(substr(md5(CAST(CAST(l_partkey AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT) AS h")
      .collect().map(r => (r.getString(0), r.getLong(1))).distinct
    val k = 64
    val perGroup = dh.groupBy(_._1).values.flatMap(_.map(_._2).sorted.take(k)).toSeq
    val mergedKth = perGroup.distinct.sorted.take(k).max
    val directKth = dh.map(_._2).distinct.sorted.take(k).max
    assert(mergedKth == directKth, "top-k(∪ top-k) == top-k(∪)")
    val got = AggQueries.aggKmvMerge.fn(spark, sf).collect()
      .filter(_.getString(0) == "MERGED").head
    assert(got.getLong(2) == mergedKth)
  }

  test("scan_partition_pruned: plan prunes at the partition level; values equal the plain filter") {
    val pruned = CoreQueries.scanPartitionPruned.fn(spark, sf)
    val got = pruned.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"status predicate must prune partitions, not rows:\n$plan")
    assert(plan.contains("o_orderstatus#") && plan.contains("= F)"),
      "the literal partition predicate reaches the scan metadata")
    val expected = graft.util.Tables.orders(spark, sf)
      .filter("o_orderstatus = 'F'")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
