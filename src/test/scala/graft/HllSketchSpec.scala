package graft

import graft.queries.CorpusStatsQueries
import org.apache.spark.sql.functions._

/** q_text_vocab_hll's two load-bearing laws, proven independently of the
  * DuckDB oracle:
  *
  * 1. REPLAY — the published 64-register array equals a from-scratch
  *    Scala recomputation (java MD5 → bucket/leading-zero rank → max),
  *    over the exact tokenizer the query uses (TextOps.explodeTokens).
  * 2. MERGEABILITY — per-source register arrays max-union into the
  *    global array. This is the property that makes the sketch a 100 TB
  *    tool: shard/day sketches merge with NO raw re-scan, and because
  *    max is idempotent, re-merging a shard twice is harmless (the
  *    exactly-once story needs no ledger at all).
  *
  * Plus an estimate sanity bound: raw HLL at m = 64 has ~1.04/√64 = 13 %
  * std error; the pinned estimate must land within 50 % of the exact
  * count on this fixture.
  */
class HllSketchSpec extends SparkSpec {

  private val M = 64
  private val RemBits = 26
  private val Grid = 1073741824.0

  private def h32(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def registersOf(words: Iterable[String]): Map[Long, Long] = {
    val regs = scala.collection.mutable.Map.empty[Long, Long]
    words.foreach { w =>
      val h = h32(w)
      val bucket = h % M
      val rem = h / M
      val rho =
        if (rem == 0) (RemBits + 1).toLong
        else RemBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs.getOrElse(bucket, 0L)) regs(bucket) = rho
    }
    regs.toMap
  }

  test("register array equals the Scala replay; per-source sketches max-union into it") {
    val tokw = graft.ops.TextOps.explodeTokens(
      graft.util.Tables.documents(spark, sf))
      .join(graft.util.Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .select("source", "word")
    val bySource = tokw.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val vocab = bySource.values.flatten.toSet

    val rows = CorpusStatsQueries.textVocabHll.fn(spark, sf).collect()
    val regRows = rows.filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(regRows.keySet == (0L until M.toLong).toSet,
      "all 64 registers publish, empty ones included")

    // 1. replay: global registers from scratch
    val expected = registersOf(vocab)
    (0L until M.toLong).foreach { b =>
      assert(regRows(b) == expected.getOrElse(b, 0L), s"register $b diverged")
    }

    // 2. mergeability: max-union of per-source sketches == global sketch
    val merged = bySource.values.map(registersOf)
      .foldLeft(Map.empty[Long, Long]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map(b =>
          b -> math.max(acc.getOrElse(b, 0L), m.getOrElse(b, 0L))).toMap
      }
    (0L until M.toLong).foreach { b =>
      assert(regRows(b) == merged.getOrElse(b, 0L),
        s"register $b: per-source max-union diverged from the global sketch")
    }

    // estimate: pin replay (incl. the linear-counting small-range branch,
    // with Portable.pln replayed op for op) + sanity bound vs exact
    val summary = rows.filter(_.getLong(0) == -1L).head
    val s = (0L until M.toLong).map(b => 1L << (RemBits + 1 - regRows(b)).toInt).sum
    val estRaw = 0.709 * (M * M).toDouble * (1L << (RemBits + 1)).toDouble / s.toDouble
    val v = (0L until M.toLong).count(b => regRows(b) == 0L)
    val est =
      if (estRaw <= 2.5 * M && v > 0) M.toDouble * pln(M.toDouble / v)
      else estRaw
    assert(summary.getLong(2) == math.floor(est * Grid).toLong, "estimate pin replay")
    assert(summary.getLong(3) == vocab.size.toLong, "exact distinct")
    assert(math.abs(est - vocab.size) / vocab.size < 0.5,
      f"estimate $est%.1f implausibly far from exact ${vocab.size}")
  }

  /** graft.util.Portable.pln replayed op for op (same constants, same
    * written order — every op correctly rounded, so bit-identical). */
  private def pln(x: Double): Double = {
    val Ln2 = 0.6931471805599453
    val k0 = math.floor(math.log(x) / math.log(2.0))
    val m0 = x / math.pow(2.0, k0)
    val (m, k) =
      if (m0 >= 2.0) (m0 / 2.0, k0 + 1.0)
      else if (m0 < 1.0) (m0 * 2.0, k0 - 1.0)
      else (m0, k0)
    val t = (m - 1.0) / (m + 1.0)
    val u = t * t
    val poly = Seq(23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)
      .foldLeft(1.0 / 25.0)((p, c) => p * u + 1.0 / c) * u + 1.0
    k * Ln2 + (t * 2.0) * poly
  }
}
