package graft

import graft.queries.{VectorQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch G: Ulcer index, kNN label purity, label-centroid
  * similarity — independent replays.
  */
class Round14gOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("win_ulcer: grid replay per asset; ulcer >= 0 and 0 for monotone-up series") {
    val rows = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long"), col("l_extendedprice").cast("double"),
        col("l_shipdate").cast("timestamp").cast("long"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val got = WindowQueries.winUlcer.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val seq = rs.sortBy(t => (t._3, t._4)).map(_._2)
      var peak = Double.NegativeInfinity
      val terms = seq.map { px =>
        peak = math.max(peak, px)
        val dd = 100.0 * (px / peak - 1.0)
        math.floor((dd * dd) * Grid).toLong
      }
      val ss = terms.sum.toDouble / Grid
      val ulcer = math.sqrt(ss / seq.length.toDouble)
      val (n, u) = got(k)
      assert(n == seq.length)
      assert(u == pin(ulcer), s"asset $k ulcer")
      assert(u >= 0)
    }
  }

  test("graph_knn_purity: endpoint counts replay; purity in [0,1]; totals match doubled edges") {
    val knn = VectorQueries.annKnnHier.fn(spark, sf)
      .select(col("q").cast("long"), col("c").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val lab = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(e => lab(e._1)).map { case (l, es) =>
        l -> ((es.size.toLong, es.count(e => lab(e._2) == l).toLong))
      }
    val got = VectorQueries.graphKnnPurity.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (l, (ne, nsame, pur)) =>
      val (eNe, eSame) = expect(l)
      assert(ne == eNe && nsame == eSame, s"label $l counts")
      assert(pur == pin(nsame.toDouble / ne.toDouble))
      assert(pur >= 0 && pur <= Grid.toLong)
    }
    assert(got.values.map(_._1).sum == 2L * edges.size)
  }

  test("emb_label_centroid_sim: full pair matrix; cos in [-1,1]; self-consistency vs replay") {
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val labels = vecs.map(_._1).distinct.sorted
    val got = VectorQueries.embLabelCentroidSim.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == labels.size * (labels.size - 1) / 2,
      "one row per unordered label pair")
    // replay: exact-decimal per-dim means, then grid dot/norm
    val dim = vecs.head._2.length
    def mean(l: Long): Array[Double] = {
      val mine = vecs.filter(_._1 == l).map(_._2)
      (0 until dim).map { i =>
        val s = mine.foldLeft(java.math.BigDecimal.ZERO)((a, v) =>
          a.add(java.math.BigDecimal.valueOf(v(i)).setScale(8, java.math.RoundingMode.HALF_UP)))
        s.doubleValue / mine.length
      }.toArray
    }
    def gridSum(terms: Seq[Double]): Double =
      terms.map(t => math.floor(t * Grid).toLong).sum.toDouble / Grid
    val means = labels.map(l => l -> mean(l)).toMap
    for (i <- labels.indices; j <- (i + 1) until labels.length) {
      val (la, lb) = (labels(i), labels(j))
      val (ma, mb) = (means(la), means(lb))
      val dot = gridSum(ma.zip(mb).map { case (x, y) => x * y })
      val na = math.sqrt(gridSum(ma.map(x => x * x)))
      val nb = math.sqrt(gridSum(mb.map(x => x * x)))
      val c = dot / (na * nb)
      assert(got((la, lb)) == pin(c), s"pair ($la,$lb) centroid cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }
}
