package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** Driver replays for the round-10 batch-3 vector operators: the full
  * IVF-PQ chain (assignment → residual → codebook → encoding → LUT → ADC
  * top-3) recomputed with the identical quantized arithmetic, and the
  * hubness histogram recomputed from the registered kNN edges.
  */
class Round10cOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  import graft.functions.DecimalDot.quantize8
  private def qdot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0L; var i = 0
    while (i < a.length) { s += quantize8(a(i) * b(i)); i += 1 }
    new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue()
  }

  test("ivf_pq: sf0.001 output equals the full quantized-arithmetic driver replay") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val n = vecs.size.toLong
    val samp = math.max(50L, n / math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong))
    val cids = vecs.keys.filter(_ % samp == 0).toSeq.sorted
    val norm = vecs.map { case (id, v) => id -> math.sqrt(qdot(v, v)) }
    // argmax-cosine assignment, first maximum over cid-ascending (strict >)
    val cluster = vecs.map { case (id, v) =>
      var bestC = -1L; var bestCos = Double.NegativeInfinity
      cids.foreach { c =>
        val cos = qdot(v, vecs(c)) / (norm(id) * norm(c))
        if (cos > bestCos) { bestCos = cos; bestC = c }
      }
      id -> bestC
    }
    // residuals, 8 subspaces of 8
    val sub = vecs.map { case (id, v) =>
      val r = v.indices.map(i => v(i) - vecs(cluster(id))(i)).toArray
      id -> (0 until 8).map(s => r.slice(s * 8, s * 8 + 8)).toArray
    }
    val codes = (0L until 16L).filter(sub.contains)
    // dist2(v, s, code) in the written order (ssr - 2*cx) + ssc
    def dist2(id: Long, s: Int, code: Long): Double =
      qdot(sub(id)(s), sub(id)(s)) - 2 * qdot(sub(id)(s), sub(code)(s)) +
        qdot(sub(code)(s), sub(code)(s))
    val enc = vecs.keys.map { id =>
      id -> (0 until 8).map { s =>
        codes.minBy(code => (dist2(id, s, code), code))
      }
    }.toMap
    // ADC = portableSum of the 8 LUT entries, published as the grid cell
    val expected = (0L until 5L).flatMap { q =>
      val cands = vecs.keys.filter(c => c != q && cluster(c) == cluster(q))
      val adcs = cands.map { c =>
        val cell = (0 until 8).map(s =>
          math.floor(dist2(q, s, enc(c)(s)) * Grid).toLong).sum
        (c, cell)
      }.toSeq.sortBy { case (c, cell) => (cell, c) }
      adcs.take(3).zipWithIndex.map { case ((c, cell), i) =>
        (q, c, cluster(q), cell, (i + 1).toLong)
      }
    }.toSet
    val got = VectorQueries.annIvfPq.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    assert(got.size == 15 && got.map(_._1).size == 5, "5 queries x top-3")
  }

  test("hubness: histogram equals the recomputation from the registered kNN edges") {
    val edges = VectorQueries.annKnnHier.fn(spark, sf).select("c").collect()
      .map(_.getLong(0))
    val nVecs = graft.util.Tables.embeddings(spark, sf).count()
    val inDeg = edges.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hist = inDeg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val zero = nVecs - inDeg.size
    val expected = (if (zero > 0) hist + (0L -> zero) else hist).toSet
    val got = VectorQueries.graphHubness.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == expected)
    // conservation: every edge and every vector is accounted for
    assert(got.toMap.map { case (d, nv) => d * nv }.sum == edges.length.toLong)
    assert(got.toMap.values.sum == nVecs)
  }
}
