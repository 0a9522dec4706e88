package graft

import java.nio.file.Files

import graft.queries.{PipelineQueries, VectorQueries}

/** Round-11 batch-1 operators, verified by independent Scala replays:
  * triangle counting against a hand-rolled closure over the collected
  * mutual edge list, trained-k-means inertia against per-cluster fold
  * identities, triplet mining on a planted single-cluster embedding
  * fixture with hand-computable cosines, and langid F1 against the
  * registered confusion matrix's own cells.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val Grid = 1073741824.0

  test("graph_triangles: sf0.001 equals the Scala closure over the mutual edges") {
    val edges = VectorQueries.annKnnMutualHier.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // (a, b), a < b
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nWedges = deg.values.map(d => d * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- edges
      (b2, c) <- edges if b2 == b
      if edges((a, c))
    } yield (a, b, c)).size.toLong
    val row = VectorQueries.graphTriangles.fn(spark, sf).collect().head
    assert(row.getLong(0) == deg.size.toLong, "n_nodes")
    assert(row.getLong(1) == edges.size.toLong, "n_edges")
    assert(row.getLong(2) == nWedges, "n_wedges")
    assert(row.getLong(3) == tris, "n_triangles")
    if (nWedges > 0)
      assert(row.getLong(4) ==
        math.floor(3.0 * tris / nWedges * Grid).toLong, "global_cc")
    else assert(row.isNullAt(4))
    assert(edges.nonEmpty, "fixture mutual graph should not be empty")
  }

  test("emb_kmeans_inertia: folds are internally consistent and cover the corpus") {
    val rows = VectorQueries.embKmeansInertia.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = graft.util.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == n, "every vector is assigned exactly once")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per cluster")
    rows.foreach { case (_, nv, inertia, meanDist) =>
      assert(nv > 0 && inertia >= 0L)
      // mean_dist = pin(it / n) where inertia = pin(it): the two pins of
      // the same grid-exact double can differ by at most one cell after
      // the divide
      val mdFromInertia = math.floor(inertia.toDouble / Grid / nv * Grid).toLong
      assert(math.abs(meanDist - mdFromInertia) <= 1L,
        s"mean_dist $meanDist vs $mdFromInertia")
      // cosine distance to the ASSIGNED (argmax) centroid lies in [0, 2]
      assert(meanDist <= math.ceil(2.0 * Grid).toLong)
    }
  }

  test("emb_kmeans_inertia: inertia equals the q_emb-style per-vector replay") {
    // independent replay: collect the trained centroids via the public
    // trained-IVF chain's assignment invariants — recompute each vector's
    // winning cosine in Scala with the quantized-dot identity and fold
    import graft.functions.DecimalDot.quantize8
    def qdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) { s += quantize8(a(i) * b(i)); i += 1 }
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue()
    }
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cents = VectorQueries.fitExact(
        graft.util.Tables.embeddings(spark, sf), 8, 2)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val cnrm = cents.map { case (id, c) => id -> math.sqrt(qdot(c, c)) }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(qdot(v, v)) }
    val perCluster = vecs.toSeq.map { case (vid, v) =>
      val (bestCid, bestCos) = cents.keys.toSeq.sorted.map { cid =>
        cid -> qdot(v, cents(cid)) / (nrm(vid) * cnrm(cid))
      }.maxBy { case (cid, cos) => (cos, -cid) }
      (bestCid, 1.0 - bestCos)
    }.groupBy(_._1).view.mapValues { g =>
      val it = g.map(x => math.floor(x._2 * Grid).toLong).sum.toDouble / Grid
      (g.size.toLong, math.floor(it * Grid).toLong,
        math.floor(it / g.size * Grid).toLong)
    }.toMap
    val got = VectorQueries.embKmeansInertia.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == perCluster)
  }

  test("emb_triplet_mine: planted one-cluster fixture, hand-checked pos/neg/violates") {
    val dir = Files.createTempDirectory("graft_r11_trip").toFile.getAbsolutePath
    // one cluster (only vec 0 is a seed at n < 50): four 2-dim unit-ish
    // vectors; labels: 0,1 -> A; 2,3 -> B
    // angles: v0=0deg, v1=10deg, v2=20deg, v3=90deg
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    Seq((0L, v(0), "A"), (1L, v(10), "A"), (2L, v(20), "B"), (3L, v(90), "B"))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.embTripletMine.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(6)))).toMap
    // v0: pos=v1 (10deg apart), neg=v2 (20deg) -> cos(10)>cos(20): no violation
    assert(got(0L)._1 == Some(1L) && got(0L)._2 == Some(2L) && got(0L)._3 == 0L)
    // v1: pos=v0 (10deg), neg=v2 (10deg)... cos equal? 10 vs 10 deg apart ->
    // equal cosines up to quantization; violates = (neg >= pos)
    assert(got(1L)._1 == Some(0L) && got(1L)._2 == Some(2L))
    // v2: pos=v3 (70deg apart), neg=v1 (10deg apart) -> neg closer: VIOLATES
    assert(got(2L)._1 == Some(3L) && got(2L)._2 == Some(1L) && got(2L)._3 == 1L)
    // v3: pos=v2 (70deg), neg=v1 (80deg) -> no violation
    assert(got(3L)._1 == Some(2L) && got(3L)._2 == Some(1L) && got(3L)._3 == 0L)
  }

  test("emb_triplet_mine: sf0.001 universe-complete, flags consistent with cells") {
    val n = graft.util.Tables.embeddings(spark, sf).count()
    val rows = VectorQueries.embTripletMine.fn(spark, sf).collect()
    assert(rows.length.toLong == n, "one row per vector, NULLs not drops")
    rows.foreach { r =>
      val posNull = r.isNullAt(3); val negNull = r.isNullAt(5)
      val viol = r.getLong(6)
      if (posNull || negNull) assert(viol == 0L)
      else {
        // pinned cells order-agree with the violation flag up to a shared cell
        val (p, g) = (r.getLong(3), r.getLong(5))
        if (g > p) assert(viol == 1L)
        if (g < p) assert(viol <= 1L)
      }
    }
    assert(rows.exists(_.getLong(6) == 1L) || rows.forall(_.getLong(6) == 0L))
  }

  test("eval_f1_langid: equals the recount from the registered confusion matrix") {
    val cells = PipelineQueries.langidConfusion.fn(spark, sf).collect()
      .map(r => ((if (r.getString(0) == "en") "en" else "und", r.getString(1)),
        r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.withDefaultValue(0L)
    def stats(l: String): (Long, Long, Long) = {
      val other = if (l == "en") "und" else "en"
      (cells((l, l)), cells((other, l)), cells((l, other)))
    }
    val got = PipelineQueries.evalF1Langid.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("en", "und"))
    Seq("en", "und").foreach { l =>
      val (tp, fp, fn) = stats(l)
      val r = got(l)
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn, l)
      def cellOrNull(num: Double, den: Long, idx: Int): Unit =
        if (den == 0) assert(r.isNullAt(idx))
        else assert(r.getLong(idx) == math.floor(num / den * Grid).toLong, s"$l#$idx")
      cellOrNull(tp.toDouble, tp + fp, 4)
      cellOrNull(tp.toDouble, tp + fn, 5)
      cellOrNull(2.0 * tp, 2 * tp + fp + fn, 6)
    }
  }
}
