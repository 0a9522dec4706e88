package graft

import graft.queries.{PipelineQueries, PrepQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-12 operators, verified by independent Scala replays: length
  * buckets against a hand-rolled next-pow2 histogram, shard manifests
  * against per-doc hash recomputation (and determinism across runs),
  * and semi-hard negatives against the triplet miner's own frame (the
  * two mining rules share one pair chain, so their outputs must be
  * mutually consistent on every anchor).
  */
class Round12OpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("pack_length_buckets: next-pow2 histogram, capacity >= tokens, buckets partition the corpus") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("lang"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bounds = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    def bucketOf(n: Long): Long = bounds.find(n <= _).getOrElse(8192L)
    val expected = docs.groupBy { case (lang, n) => (lang, bucketOf(n)) }
      .map { case ((lang, b), xs) => (lang, b, xs.size.toLong, xs.map(_._2).sum) }
      .toSet
    val got = PrepQueries.packLengthBuckets.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"bucket histogram mismatch")
    // capacity and waste are self-consistent on every row
    PrepQueries.packLengthBuckets.fn(spark, sf).collect().foreach { r =>
      val (b, nd, st, pad) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pad == nd * b)
      assert(st <= pad, "tokens cannot exceed the padded capacity")
      assert(r.getLong(5) ==
        math.floor((pad - st).toDouble / pad * Grid).toLong, "pad_waste pin")
    }
  }

  test("split_shards: complete spine, per-doc hash recomputation, determinism") {
    val rows = PipelineQueries.splitShards.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (0L until 16L), "complete shard spine")
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def shardOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard:$id".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val expected = docs.groupBy { case (id, _) => shardOf(id) }
      .map { case (s, xs) => s -> (xs.size.toLong, xs.map(_._2).sum) }
    rows.foreach { case (s, nd, nt) =>
      assert(nd == expected.get(s).map(_._1).getOrElse(0L), s"shard $s doc count")
      assert(nt == expected.get(s).map(_._2).getOrElse(0L), s"shard $s token count")
    }
    assert(rows.map(_._2).sum == docs.length, "shards partition the corpus")
    // determinism: a second run is row-identical
    val again = PipelineQueries.splitShards.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }

  test("emb_hard_negatives: consistent with the triplet miner on every anchor") {
    val tm = VectorQueries.embTripletMine.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(3)) None else Some(r.getLong(3)),   // pos_cos cell
        if (r.isNullAt(5)) None else Some(r.getLong(5))))  // neg_cos cell
      .toMap
    val hn = VectorQueries.embHardNegatives.fn(spark, sf).collect()
    assert(hn.length == tm.size, "both miners cover the same anchor universe")
    hn.foreach { r =>
      val vid = r.getLong(0)
      val (posTm, negTm) = tm(vid)
      val posHn = if (r.isNullAt(3)) None else Some(r.getLong(3))
      // identical hardest positive (same rule, same shared chain)
      assert(posHn == posTm, s"anchor $vid pos_cos diverged between miners")
      val snegCos = if (r.isNullAt(5)) None else Some(r.getLong(5))
      val nBand = r.getLong(6)
      (snegCos, posHn) match {
        case (Some(sc), Some(pc)) =>
          assert(sc <= pc, s"anchor $vid semi-hard must not be closer than the positive")
          assert(nBand >= 1)
          // the semi-hard is never harder than the hardest negative
          negTm.foreach(nc => assert(sc <= nc,
            s"anchor $vid semi-hard closer than the hardest negative"))
        case (Some(_), None) =>
          fail(s"anchor $vid has a semi-hard negative without a positive")
        case (None, _) => assert(nBand == 0)
      }
    }
    // the fixture actually exercises the band (some anchors have one)
    assert(hn.exists(r => !r.isNullAt(4)), "no semi-hard negatives mined at all")
  }
}
