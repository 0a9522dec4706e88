package graft

import graft.queries.{PrepQueries, RollingQueries, VectorQueries}

/** Round-11 batch-3 operators, each against an independent Scala replay
  * at sf0.001: Donchian rolling extrema vs a sliding-window recount,
  * mutual-graph component sizes vs a union-find over the collected edge
  * list, and the participation-ratio intrinsic dimension vs the
  * decimal-exact variance-spectrum fold.
  */
class Round11cOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("win_donchian: sf0.001 equals the sliding min/max replay with min_periods") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_partkey AS BIGINT) AS k",
        "CAST(l_shipdate AS TIMESTAMP) AS d",
        "CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS ord",
        "l_extendedprice AS c")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val sorted = g.toSeq.sortBy(x => (x._2, x._3))
      sorted.zipWithIndex.map { case ((_, _, ord, c), i) =>
        val win = sorted.slice(math.max(0, i - 20), i + 1).map(_._4)
        val full = win.length >= 21
        (k, ord, c,
          if (full) Some(win.max) else None,
          if (full) Some(win.min) else None,
          if (full) Some((win.max + win.min) / 2.0) else None)
      }
    }.toSet
    val got = RollingQueries.winDonchian.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSet
    assert(got == expected)
    assert(got.exists(_._4.isDefined), "some asset reaches the full window")
    got.foreach { case (_, _, _, hi, lo, mid) =>
      for (h <- hi; l <- lo; m <- mid) assert(l <= m && m <= h)
    }
  }

  test("graph_cc_sizes: sf0.001 equals the union-find replay over the mutual edges") {
    val edges = VectorQueries.annKnnMutualHier.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val sizes = nodes.groupBy(find).map(_._2.length.toLong)
    val hist = sizes.groupBy(identity).map { case (sz, g) => sz -> g.size.toLong }
    val n = graft.util.Tables.embeddings(spark, sf).count()
    val singles = n - nodes.length
    val expected = (if (singles > 0) hist + (1L -> (hist.getOrElse(1L, 0L) + singles))
      else hist).toMap
    val got = VectorQueries.graphCcSizes.fn(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (sz, rs) => sz -> rs.map(_.getLong(1)).sum }
    assert(got == expected)
    assert(got.keys.exists(_ >= 2), "mutual edges form at least one real component")
    assert(got.map { case (sz, c) => sz * c }.sum == n,
      "every vector is accounted for exactly once")
  }

  test("emb_intrinsic_dim: sf0.001 equals the variance-spectrum replay") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dDim = vecs.head.length
    val n = vecs.length.toDouble
    def dsum(xs: Iterable[Double], scale: Int): Double =
      xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val vars = (0 until dDim).map { i =>
      val colv = vecs.map(_(i))
      val s = dsum(colv, 8); val sq = dsum(colv.map(x => x * x), 4)
      math.max(0.0, (sq - s * s / n) / n)
    }
    def gsum(xs: Iterable[Double]): Double =
      xs.map(x => math.floor(x * Grid).toLong).sum.toDouble / Grid
    val sv = gsum(vars); val sv2 = gsum(vars.map(v => v * v)); val mx = vars.max
    val r = PrepQueries.embIntrinsicDim.fn(spark, sf).collect().head
    assert(r.getLong(0) == dDim.toLong)
    assert(r.getLong(1) == math.floor(sv * Grid).toLong)
    assert(r.getLong(2) == math.floor(sv * sv / sv2 * Grid).toLong)
    assert(r.getLong(3) == math.floor(mx / sv * Grid).toLong)
    // a sane synthetic embedding table is near-isotropic: PR close to d
    val pr = r.getLong(2) / Grid
    assert(pr > dDim * 0.5 && pr <= dDim + 1e-9, s"PR=$pr vs d=$dDim")
  }
}
