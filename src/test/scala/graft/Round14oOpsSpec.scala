package graft

import graft.queries.{PrepQueries, RecursiveQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch O: ADX, Matryoshka-truncation recall, MLM masking plan
  * — replays.
  */
class Round14oOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("adx: scalar fold replays one asset; DI/DX/ADX bounded") {
    val out = RecursiveQueries.adxQ.fn(spark, sf)
      .filter(col("key") === 1L).orderBy("rn").collect()
    val series = graft.ops.Recursive.series(spark, sf)
      .filter(col("key") === 1L).collect()
      .sortBy(r => (r.secs, r.ord))
    assert(out.length == series.length && out.length > 2)
    var strV = series(0).high - series(0).low
    var spdm = 0.0; var smdm = 0.0; var adxV = 0.0; var seeded = false
    out.zipWithIndex.foreach { case (r, i) =>
      if (i == 0) assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      else {
        val c = series(i); val p = series(i - 1)
        val tr = math.max(c.high - c.low,
          math.max(math.abs(c.high - p.close), math.abs(c.low - p.close)))
        strV = ((strV * 13.0) + tr) / 14.0
        val up = c.high - p.high; val dn = p.low - c.low
        spdm = ((spdm * 13.0) + (if (up > dn && up > 0.0) up else 0.0)) / 14.0
        smdm = ((smdm * 13.0) + (if (dn > up && dn > 0.0) dn else 0.0)) / 14.0
        val dx =
          if (strV > 0.0 && (100.0 * (spdm / strV) + 100.0 * (smdm / strV)) > 0.0)
            100.0 * math.abs(100.0 * (spdm / strV) - 100.0 * (smdm / strV)) /
              (100.0 * (spdm / strV) + 100.0 * (smdm / strV))
          else 0.0
        if (!seeded) { adxV = dx; seeded = true }
        else adxV = ((adxV * 13.0) + dx) / 14.0
        assert(r.getDouble(2) == 100.0 * (spdm / strV), s"rn=${i + 1} pdi")
        assert(r.getDouble(3) == 100.0 * (smdm / strV), s"rn=${i + 1} mdi")
        assert(r.getDouble(4) == dx && r.getDouble(5) == adxV, s"rn=${i + 1} dx/adx")
        // 100·|a−b|/(a+b) ≤ 100 mathematically; IEEE rounding can land 1 ulp over
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 100.0 + 1e-9)
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 100.0 + 1e-9)
      }
    }
  }

  test("eval_recall_trunc: universe-complete; truncated search replays brute force") {
    val rows = VectorQueries.evalRecallTrunc.fn(spark, sf).collect()
    assert(rows.length == 10 && rows.map(_.getLong(0)).toSet == (0L until 10L).toSet)
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 3)
      assert(r.getLong(2) == pin(hits / 3.0))
    }
    // brute-force replay of query 0: top-3 by 8-dim cosine
    val vecs = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => BigDecimal(x * y).setScale(8,
        BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      val na = math.sqrt(a.map(x => BigDecimal(x * x).setScale(8,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      val nb = math.sqrt(b.map(x => BigDecimal(x * x).setScale(8,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      dot / (na * nb)
    }
    val q0 = vecs(0L)
    val top3 = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    val full = graft.util.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val gt0 = full.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(full(0L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    val expHits = (top3 & gt0).size.toLong
    assert(rows.find(_.getLong(0) == 0L).get.getLong(1) == expHits)
  }

  test("prep_mlm_mask: masked set replays from the portable hash; rate ~15%") {
    val docs = graft.util.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(sx: String): Long = {
      val dig = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val expect = docs.map { case (id, text) =>
      val n = text.trim.split("\\s+", -1).length
      val masked = (1 to n).count(i => h32(s"mlm:$id:$i") % 100 < 15)
      id -> ((n.toLong, masked.toLong))
    }.toMap
    val got = PrepQueries.prepMlmMask.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    var tot = 0L; var msk = 0L
    got.foreach { case (id, (n, m, rate)) =>
      val (en, em) = expect(id)
      assert(n == en && m == em, s"doc $id")
      assert(rate == pin(m.toDouble / n.toDouble))
      tot += n; msk += m
    }
    val realized = msk.toDouble / tot.toDouble
    assert(realized > 0.10 && realized < 0.20, s"corpus rate $realized")
  }
}
