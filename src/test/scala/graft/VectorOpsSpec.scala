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
}
