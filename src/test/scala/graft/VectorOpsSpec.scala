package graft

import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** Lloyd k-means + assignment over array columns (the trained-centroid
  * path for IVF ANN). */
class VectorOpsSpec extends SparkSpec {

  test("VectorOps.cosine and l2sq compute known values") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(2.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    val got = df.select(
      VectorOps.cosine(col("a"), col("b")).as("cos"),
      VectorOps.l2sq(col("a"), col("b")).as("d2")).collect()
    assert(got(0).getDouble(0) == 0.0 && got(0).getDouble(1) == 2.0)
    assert(got(1).getDouble(0) == 1.0 && got(1).getDouble(1) == 1.0)
  }

  test("KMeans separates two obvious clusters and assigns consistently") {
    import spark.implicits._
    // two tight direction-clusters on the unit circle-ish: near (1,0) and (0,1)
    val pts = Seq(
      (1L, Array(1.0f, 0.00f)), (2L, Array(1.0f, 0.05f)), (3L, Array(1.0f, -0.05f)),
      (4L, Array(0.0f, 1.00f)), (5L, Array(0.05f, 1.0f)), (6L, Array(-0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    val model = VectorOps.fit(pts, "vec_id", "embedding", k = 2, iters = 3)
    assert(model.count() == 2)
    val assigned = VectorOps.assign(pts, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ids 1-3 share a cluster, ids 4-6 share the other
    assert(Set(assigned(1L), assigned(2L), assigned(3L)).size == 1)
    assert(Set(assigned(4L), assigned(5L), assigned(6L)).size == 1)
    assert(assigned(1L) != assigned(4L))
  }

  test("KMeans is deterministic under repartitioning") {
    import spark.implicits._
    val pts = (1L to 40L).map(i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    def centroidsOf(df: org.apache.spark.sql.DataFrame) =
      VectorOps.fit(df, "vec_id", "embedding", k = 3, iters = 2)
        .orderBy("cluster_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toList
    val a = centroidsOf(pts.repartition(1))
    val b = centroidsOf(pts.repartition(13))
    assert(a == b) // exact-decimal means ⇒ bit-identical across partitionings
  }

  test("trained k-means centroids drop into the IVF plan unchanged; recall >= single-probe LSH") {
    import org.apache.spark.sql.DataFrame
    val base = graft.util.Tables.embeddings(spark, sf)
    // trained path: VectorOps.fit output reshaped to the (cid, ecent,
    // ncent) centroid contract — nothing else changes
    val model = VectorOps.fit(base, "vec_id", "embedding", k = 4, iters = 3)
    val trainedCents = model
      .select(col("cluster_id").as("cid"),
        // centroids come back as array<double>; the index stores float
        // vectors (decimal_dot is typed for the embedding column's type)
        transform(col("centroid"), _.cast("float")).as("ecent"))
      .withColumn("ncent", expr("sqrt(decimal_dot(ecent, ecent))"))
    val trained = graft.queries.VectorQueries.ivfTopK(base, trainedCents)
    val seeded = graft.queries.VectorQueries.annIvf.fn(spark, sf)
    // identical search-plan shape: the join/window/aggregate operator
    // sequence must match node for node (the centroid SOURCE differs by
    // construction: parquet-filter seeds vs fitted LogicalRDD)
    def searchShape(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case n if Seq("Join", "Window", "Aggregate", "Sort")
          .exists(n.nodeName.contains) => n.nodeName
      }
    assert(searchShape(trained) == searchShape(seeded),
      s"plan shapes diverged:\n${searchShape(trained)}\nvs\n${searchShape(seeded)}")
    // retrieval quality: trained single-probe IVF must recall at least as
    // much of the exact top-3 as single-probe LSH does on this fixture
    val truth = graft.queries.VectorQueries.annCosineTopk.fn(spark, sf)
      .filter(col("rn") <= 3).select("q", "c")
    val truthN = truth.count().toDouble
    def recall(res: DataFrame): Double =
      res.select("q", "c").intersect(truth).count() / truthN
    val ivfRecall = recall(trained)
    val lshRecall = recall(graft.queries.VectorQueries.annLsh.fn(spark, sf))
    assert(ivfRecall >= lshRecall,
      s"trained IVF recall $ivfRecall below single-probe LSH $lshRecall")
  }

  test("saltedBlockJoin: hot-label skew fans out ~SALTS ways, pair set unchanged") {
    import spark.implicits._
    // 90% of rows share one label — the q_dedup_embed_cosine skew case:
    // a bare label join would push 0.9n × 0.9n pairs through ONE task
    val n = 1000
    val SALTS = 8
    val rows = (1L to n.toLong).map(i =>
      (i, if (i <= n * 9 / 10) "hot" else s"cold${i % 4}"))
    val base = rows.toDF("id", "label")
    val a = base.select(col("id").as("ida"), col("label"))
    val b = base.select(col("id").as("idb"), col("label"))
    val salted = VectorOps.saltedBlockJoin(a, b, "label", col("ida"), SALTS)

    // 1. correctness: exactly the bare equi-join's pair set, each pair once
    val bare = a.join(b, "label")
    assert(salted.count() == bare.count())
    assert(salted.select("ida", "idb").exceptAll(bare.select("ida", "idb")).count() == 0)

    // 2. skew bound: per-(label, salt) bucket join sizes — what each task
    // processes — must divide the hot label's work ~SALTS ways. hash(ida)
    // spreads A-side rows near-evenly, so the hottest bucket stays within
    // 2× of perfectly uniform fan-out (the slop absorbs hash variance).
    val buckets = salted.groupBy("label", "salt").count().collect()
    val hotTotal = buckets.filter(_.getString(0) == "hot").map(_.getLong(2)).sum
    val hotMax = buckets.filter(_.getString(0) == "hot").map(_.getLong(2)).max
    assert(buckets.filter(_.getString(0) == "hot").length == SALTS,
      "hot label must occupy all salt buckets")
    assert(hotMax <= 2L * hotTotal / SALTS,
      s"hottest bucket $hotMax exceeds 2x the uniform share ${hotTotal / SALTS}")
    // contrast with the unsalted plan: the whole hot workload in one task
    assert(hotMax * (SALTS / 2) <= hotTotal, "salting must divide the hot task")
  }

  test("assignClustersHier: stage-2 argmax is exact within the chosen super and the plan is deterministic") {
    import org.apache.spark.sql.functions.{col, expr, transform => atransform}
    val base = graft.util.Tables.embeddings(spark, sf)
    val k = 15
    val cents = graft.queries.VectorQueries.fitExact(base, k, 1)
    val all = base.select(col("vec_id").as("vid"), col("embedding").as("ev"),
      expr("sqrt(decimal_dot(embedding, embedding))").as("nv"))
    val hier = graft.queries.VectorQueries.assignClustersHier(all, cents, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.size == base.count())

    // driver replay with the same quantized arithmetic: supers = one exact
    // Lloyd step over the centroids seeded by the ceil(sqrt(k)) lowest cids,
    // membership + two-stage argmax — must match EXACTLY
    import graft.functions.DecimalDot.quantize8
    def qdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) { s += quantize8(a(i) * b(i)); i += 1 }
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue()
    }
    def nrm(a: Array[Double]): Double = math.sqrt(qdot(a, a))
    def cos(a: Array[Double], b: Array[Double]): Double = qdot(a, b) / (nrm(a) * nrm(b))
    def argmax(v: Array[Double], cs: Map[Long, Array[Double]]): Long =
      cs.toSeq.map { case (c, cv) => (c, cos(v, cv)) }.minBy { case (c, s) => (-s, c) }._1
    val centArr = cents.select(col("cid"),
        atransform(col("ecent"), _.cast("double")).as("e")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val nS = math.ceil(math.sqrt(k.toDouble)).toLong
    var supers = centArr.filter(_._1 < nS)
    val sAssign = centArr.map { case (c, v) => c -> argmax(v, supers) }
    supers = supers.map { case (sid, old) =>
      val members = centArr.collect { case (c, v) if sAssign(c) == sid => v }.toSeq
      if (members.isEmpty) sid -> old
      else sid -> Array.tabulate(old.length) { i =>
        var s = 0L
        members.foreach(m => s += quantize8(m(i)))
        new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8)
          .doubleValue() / members.size
      }
    }
    val memberOf = centArr.map { case (c, v) => c -> argmax(v, supers) }
    val vecs = base.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    val expected = vecs.map { case (vid, v) =>
      val sid = argmax(v, supers)
      vid -> argmax(v, centArr.filter { case (c, _) => memberOf(c) == sid })
    }
    assert(hier === expected)

    // determinism under repartitioning (retries / AQE re-plans)
    val hier2 = graft.queries.VectorQueries.assignClustersHier(
      all.repartition(7), cents, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier2 === hier)
  }

  test("q_dedup_semantic matches a driver-side trained SemDeDup at sf0.001") {
    // independent oracle: collect the (tiny) sf0.001 embeddings and replay
    // the registered recipe in plain Scala — k = ceil(sqrt(n)) seeds from
    // the lowest ids, 2 Lloyd iterations, argmax-cosine assignment, within-
    // cluster pairs ≥ 0.35 — using the SAME quantized arithmetic
    // (DecimalDot.quantize8 addends, exact-sum/count means), so the driver
    // result must equal the distributed plan exactly, not approximately.
    import graft.functions.DecimalDot.quantize8
    val rows = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def qdot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) { s += quantize8(a(i) * b(i)); i += 1 }
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue()
    }
    def nrm(a: Array[Double]): Double = math.sqrt(qdot(a, a))
    def cos(a: Array[Double], b: Array[Double]): Double = qdot(a, b) / (nrm(a) * nrm(b))
    def argmax(v: Array[Double], cents: Map[Long, Array[Double]]): Long =
      cents.toSeq.map { case (c, cv) => (c, cos(v, cv)) }
        .minBy { case (c, s) => (-s, c) }._1
    val ids = rows.keys.toSeq.sorted
    val k = math.ceil(math.sqrt(rows.size.toDouble)).toInt
    var cents: Map[Long, Array[Double]] =
      ids.take(k).zipWithIndex.map { case (vid, ci) => ci.toLong -> rows(vid) }.toMap
    for (_ <- 1 to 2) {
      val assign = rows.map { case (id, v) => id -> argmax(v, cents) }
      cents = cents.map { case (c, old) =>
        val members = rows.collect { case (id, v) if assign(id) == c => v }.toSeq
        if (members.isEmpty) c -> old
        else c -> Array.tabulate(old.length) { i =>
          var s = 0L
          members.foreach(m => s += quantize8(m(i)))
          new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8)
            .doubleValue() / members.size
        }
      }
    }
    val cluster = rows.map { case (id, v) => id -> argmax(v, cents) }
    val expected = (for {
      i <- ids; j <- ids if i < j && cluster(i) == cluster(j)
      c = cos(rows(i), rows(j)) if c >= 0.35
    } yield (i, j)).toSet
    val got = graft.queries.VectorQueries.dedupSemantic.fn(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"missing: ${expected -- got}; extra: ${got -- expected}")
  }

  test("q_mm_embed_pool equals the driver-side quantized mean per label") {
    import org.apache.spark.sql.functions.col
    import graft.functions.DecimalDot.quantize8
    val base = graft.util.Tables.embeddings(spark, sf)
    val rows = base.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).toArray.map(_.toDouble)))
    val expected = rows.groupBy(_._1).map { case (label, vs) =>
      val dim = vs.head._2.length
      label -> (vs.size.toLong, Array.tabulate(dim) { i =>
        var s = 0L
        vs.foreach { case (_, v) => s += quantize8(v(i)) }
        new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8)
          .doubleValue() / vs.size
      }.toSeq)
    }
    // long form (label, n_vecs, i, m) with m = the BIGINT grid cell of
    // the exact mean (r10 gate contract: no array or double column in
    // the published schema) — reassemble per label ordered by i
    val raw = graft.queries.VectorQueries.mmEmbedPool.fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = raw.groupBy(_._1).map { case (label, rs) =>
      label -> ((rs.head._2, rs.sortBy(_._3).map(_._4).toSeq))
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (label, (n, vec)) =>
      assert(got(label)._1 == n, s"label $label count")
      val want = vec.map(v => math.floor(v * 1073741824.0).toLong)
      assert(got(label)._2 == want, s"label $label pooled vector") // bit-exact
      // 1-based contiguous component index
      assert(raw.filter(_._1 == label).map(_._3).sorted.toSeq ==
        (1L to vec.length.toLong))
    }
  }

  test("assignClusters fails loudly on a vector with no valid cosine instead of emitting cid=-1") {
    // a null embedding element nulls the decimal dot, so every cosine is
    // null and the fold never beats -Infinity; the SQL oracle's SUM would
    // skip the null addend and still assign a real cid — silently
    // diverging — so the plan must throw, not absorb (ADVICE r7 medium)
    import org.apache.spark.sql.functions.expr
    val cents = spark.sql(
      "SELECT 0L AS cid, array(1.0D, 0.0D) AS ecent UNION ALL " +
        "SELECT 1L, array(0.0D, 1.0D)")
      .withColumn("ncent", expr("sqrt(decimal_dot(ecent, ecent))"))
    val bad = spark.sql(
      "SELECT 7L AS vid, array(1.0D, CAST(NULL AS DOUBLE)) AS ev")
      .withColumn("nv", expr("sqrt(decimal_dot(ev, ev))"))
    val e = intercept[Throwable] {
      graft.queries.VectorQueries.assignClusters(bad, cents).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no valid cosine")),
      s"unexpected failure: ${messages(e).mkString(" | ")}")
  }
}
