package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Round-12 batch U: MinHash-LSH dedup recall gauge — replay. */
class Round14uOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0
  private def pin(x: Double): Long = math.floor(x * Grid).toLong

  test("dedup_lsh_recall: counts replay from exact shingle Jaccard + the registered banding") {
    val docs = graft.util.Tables.documents(spark, sf)
    val uni = docs.filter(col("doc_id") < 500)
    val sh = graft.ops.TextOps.shingles3(uni).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = byDoc.keys.toSeq.sorted
    val truePairs = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = byDoc(ids(i)); b = byDoc(ids(j))
      inter = (a & b).size
      if 2 * inter >= a.size + b.size - inter && inter > 0
    } yield (ids(i), ids(j))).toSet
    val lshPairs = graft.ops.TextOps.minhashPairsFromSig(
        graft.ops.TextOps.minhashSig(docs), materialize = false)
      .filter(col("doc_a") < 500 && col("doc_b") < 500).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (truePairs & lshPairs).size.toLong
    val r = TextQueries.dedupLshRecall.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == truePairs.size && r.getLong(1) == lshPairs.size)
    assert(r.getLong(2) == caught)
    if (truePairs.nonEmpty)
      assert(r.getLong(3) == pin(caught.toDouble / truePairs.size))
    else assert(r.isNullAt(3))
    if (lshPairs.nonEmpty)
      assert(r.getLong(4) == pin(caught.toDouble / lshPairs.size))
    else assert(r.isNullAt(4))
    // a true duplicate pair shares at least one full band with prob ~1 at
    // J>=0.5 with 4 bands of 2 — recall should not collapse when truth exists
    if (truePairs.nonEmpty) assert(caught > 0)
  }
}
