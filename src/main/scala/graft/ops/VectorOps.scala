package graft.ops

import graft.util.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-column operators: the trained-centroid path for IVF ANN
  * (SURVEY.md §2.12 — `q_ann_ivf` runs the same plan with seed centroids;
  * `KMeans.fit`'s output drops into its `cents` input unchanged).
  *
  * Scale shape per Lloyd iteration: corpus × broadcast(centroids)
  * assignment (k centroids are always broadcast-sized: k ≤ 10⁵ even for
  * billion-vector corpora), then one explode + groupBy(cluster, dim)
  * shuffle for the component means — cost O(corpus · k · d) compute,
  * O(corpus · d) shuffle, never corpus². The iteration count is a fixed
  * small constant (Lloyd converges fast; production ANN uses 10-25).
  *
  * Determinism: component means go through the decimal-exact sum
  * (util.Exact), so centroids are bit-identical across partitionings,
  * retries and cluster sizes — a re-run of `fit` on reshuffled data
  * reproduces the same index.
  */
object VectorOps {

  /** Cosine similarity of two array<double|float> columns as a single
    * codegen'd expression (no component shuffle). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Squared L2 distance, same shape. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => {
      val d = p.cast("double") - q.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Salted blocking self/pair join: equi-join `a` and `b` on `blockCol`
    * with a salt widening the key space SALTS-fold. The blocking key's
    * cardinality can be far below the core count (labels, shards), so a
    * bare key join caps parallelism at #keys and a hot key becomes one
    * giant task. Side A gets a deterministic salt from `saltFrom` (its
    * id), side B is replicated across all salts — every (a, b) pair meets
    * in exactly one (block, salt) bucket, so the joined SET is unchanged
    * while the hottest key's work fans out over `salts` tasks. Cost of
    * the fan-out: side B shuffles `salts`× (the replication) — the knob
    * trades B-side shuffle volume for per-task bound; raise it until the
    * hottest (block, salt) bucket fits a task comfortably.
    * Both sides hash-join after shuffling (never broadcast: at corpus
    * scale both sides are the corpus). */
  def saltedBlockJoin(a: DataFrame, b: DataFrame, blockCol: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val aS = a.withColumn("salt", pmod(hash(saltFrom), lit(salts)))
    val bS = b.withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    aS.join(bS.hint("shuffle_hash"), Seq(blockCol, "salt"))
  }

  /** Deterministic k-means (Lloyd) over an embedding column.
    *
    * @param df     (idCol, vecCol) rows; vecCol is array<float|double>
    * @param k      cluster count; seeds are the k lowest ids (deterministic
    *               — swap in k-means|| sampling at real scale if desired)
    * @param iters  Lloyd iterations
    * @return (cluster_id, centroid: array<double>) — `k` rows
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val vecs = df.select(col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    // seed: k lowest ids, renumbered 0..k-1. TopK-then-window, never
    // window-then-filter: `row_number().over(Window.orderBy(..))` on the
    // full table is a single-partition global sort of the CORPUS just to
    // take k rows; `.orderBy().limit(k)` is a distributed TakeOrdered(k),
    // and the renumbering window then runs over k rows only (the same
    // pattern as queries.VectorQueries.fitExact — VERDICT r9 #6).
    val wSeed = Window.orderBy("__id")
    var centroids = vecs
      .orderBy("__id").limit(k)
      .withColumn("__rn", row_number().over(wSeed))
      .select((col("__rn") - 1).cast("long").as("cluster_id"), col("__v").as("centroid"))
    for (_ <- 1 to iters) {
      // assignment: corpus × broadcast(centroids), argmax cosine
      val wA = Window.partitionBy("__id").orderBy(col("__cos").desc, col("cluster_id"))
      val assigned = vecs.crossJoin(broadcast(centroids))
        .withColumn("__cos", cosine(col("__v"), col("centroid")))
        .withColumn("__arn", row_number().over(wA))
        .filter(col("__arn") === 1)
        .select(col("cluster_id"), col("__id"), col("__v"))
      // update: component-wise exact mean per cluster (explode → groupBy →
      // re-assemble ordered by component index)
      val comp = assigned.select(col("cluster_id"),
        posexplode(col("__v")).as(Seq("__i", "__e")))
      val means = comp.groupBy("cluster_id", "__i")
        .agg(Exact.exactAvg(col("__e")).as("__m"))
      val rebuilt = means.groupBy("cluster_id")
        .agg(collect_list(struct(col("__i"), col("__m"))).as("__pairs"))
        .select(col("cluster_id"),
          transform(array_sort(col("__pairs")), p => p.getField("__m")).as("centroid"))
      // keep empty clusters at their previous centroid (standard Lloyd fix)
      centroids = centroids.as("old")
        .join(rebuilt.as("new"), Seq("cluster_id"), "left")
        .select(col("cluster_id"),
          coalesce(col("new.centroid"), col("old.centroid")).as("centroid"))
        .localCheckpoint() // truncate the growing lineage between iterations
    }
    centroids
  }

  /** Cluster assignment for a fitted model: (idCol, cluster_id). The probe
    * side of IVF search — identical plan to q_ann_ivf's `assign` step. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val wA = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("cluster_id"))
    df.select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
      .crossJoin(broadcast(centroids))
      .withColumn("__cos", cosine(col("__v"), col("centroid")))
      .withColumn("__arn", row_number().over(wA))
      .filter(col("__arn") === 1)
      .select(col(idCol), col("cluster_id"))
  }
}
