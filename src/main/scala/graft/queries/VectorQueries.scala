package graft.queries

import graft.Q
import graft.util.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.12 north-star: similarity search over the `embeddings`
  * table (64-dim float vectors).
  *
  * Representation: vectors are exploded to (vec_id, i, e) rows; dot
  * products are an equi-join on the component index + a decimal-exact sum
  * — fully distributed, shuffle keyed on (pair), and bit-reproducible
  * (see util.Exact). At 100 TB the same plans hold: brute force is
  * queries×corpus (use for small query sets), IVF prunes the corpus to one
  * cluster per query, LSH-style blocking comes from q_dedup_minhash's band
  * machinery.
  */
object VectorQueries {

  private val D = DecimalType(38, 8)

  /** (vec_id, label, i, e) exploded view, i 1-based, components as double. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("pos0", "e0")))
      .select(col("vec_id"), col("label"), (col("pos0") + 1).as("i"),
        col("e0").cast("double").as("e"))

  private val vecsSql =
    "WITH v AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e, " +
      "unnest(range(1, len(embedding)+1)) AS i FROM embeddings), " +
      "n AS (SELECT vec_id, sqrt(CAST(SUM(CAST(e*e AS DECIMAL(38,8))) AS DOUBLE)) AS nrm " +
      "FROM v GROUP BY 1) "

  private def norms(v: DataFrame): DataFrame =
    v.groupBy("vec_id")
      .agg(sqrt(sum((col("e") * col("e")).cast(D)).cast("double")).as("nrm"))

  private def exactDot(a: String, b: String) =
    sum((col(s"$a.e") * col(s"$b.e")).cast(D)).cast("double")

  /** Embedding near-dup detection: cosine over label-blocked pairs
    * (blocking bounds the pair count; the full-corpus path is the LSH
    * variant). */
  val dedupEmbedCosine = Q("q_dedup_embed_cosine", "label-blocked cosine near-dup pairs")(
    vecsSql +
      ", dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, " +
      "CAST(SUM(CAST(a.e * b.e AS DECIMAL(38,8))) AS DOUBLE) AS dot " +
      "FROM v a JOIN v b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id " +
      "GROUP BY 1, 2) " +
      "SELECT d.va, d.vb, d.dot / (na.nrm * nb.nrm) AS cosine FROM dots d " +
      "JOIN n na ON na.vec_id = d.va JOIN n nb ON nb.vec_id = d.vb " +
      "WHERE d.dot / (na.nrm * nb.nrm) >= 0.35") {
    (s, d) =>
      val v = vecs(s, d)
      val nr = norms(v)
      val dots = v.as("a")
        .join(v.as("b"), col("a.i") === col("b.i")
          && col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
        .agg(exactDot("a", "b").as("dot"))
      val cos = col("dot") / (col("na.nrm") * col("nb.nrm"))
      dots.join(nr.as("na"), col("na.vec_id") === col("va"))
        .join(nr.as("nb"), col("nb.vec_id") === col("vb"))
        .select(col("va"), col("vb"), cos.as("cosine"))
        .filter(col("cosine") >= 0.35)
  }

  /** Brute-force cosine top-k: a small query set (vec_id < 10) against the
    * whole corpus — the exact-baseline ANN. */
  val annCosineTopk = Q("q_ann_cosine_topk", "brute-force cosine top-5")(
    vecsSql +
      ", dots AS (SELECT a.vec_id AS q, b.vec_id AS c, " +
      "CAST(SUM(CAST(a.e * b.e AS DECIMAL(38,8))) AS DOUBLE) AS dot " +
      "FROM v a JOIN v b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id " +
      "GROUP BY 1, 2), " +
      "cosd AS (SELECT d.q, d.c, d.dot / (na.nrm * nb.nrm) AS cosine FROM dots d " +
      "JOIN n na ON na.vec_id = d.q JOIN n nb ON nb.vec_id = d.c) " +
      "SELECT q, c, cosine, rn FROM (SELECT cosd.*, " +
      "row_number() OVER (PARTITION BY q ORDER BY cosine DESC, c) AS rn FROM cosd) " +
      "WHERE rn <= 5") {
    (s, d) =>
      val v = vecs(s, d)
      val nr = norms(v)
      val dots = v.as("a").filter(col("a.vec_id") < 10)
        .join(v.as("b"), col("a.i") === col("b.i") && col("b.vec_id") =!= col("a.vec_id"))
        .groupBy(col("a.vec_id").as("q"), col("b.vec_id").as("c"))
        .agg(exactDot("a", "b").as("dot"))
      val cosd = dots.join(nr.as("na"), col("na.vec_id") === col("q"))
        .join(nr.as("nb"), col("nb.vec_id") === col("c"))
        .select(col("q"), col("c"), (col("dot") / (col("na.nrm") * col("nb.nrm"))).as("cosine"))
      val w = Window.partitionBy("q").orderBy(col("cosine").desc, col("c"))
      cosd.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 5)
  }

  /** IVF-style ANN: deterministic seed centroids (vec_id % 50 == 0),
    * assign every vector to its argmax-cosine centroid, then search only
    * the query's cluster — the corpus-pruning scale path (a trained
    * k-means drops into the same plan). */
  val annIvf = Q("q_ann_ivf", "IVF single-probe cosine top-3")(
    vecsSql +
      ", cdots AS (SELECT a.vec_id AS vid, b.vec_id AS cid, " +
      "CAST(SUM(CAST(a.e * b.e AS DECIMAL(38,8))) AS DOUBLE) AS dot " +
      "FROM v a JOIN v b ON a.i = b.i AND (b.vec_id % 50) = 0 GROUP BY 1, 2), " +
      "ccos AS (SELECT d.vid, d.cid, d.dot / (na.nrm * nb.nrm) AS cosine FROM cdots d " +
      "JOIN n na ON na.vec_id = d.vid JOIN n nb ON nb.vec_id = d.cid), " +
      "assign AS (SELECT vid, cid AS cluster FROM (SELECT ccos.*, " +
      "row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cid) AS rn FROM ccos) " +
      "WHERE rn = 1), " +
      "pairs AS (SELECT qa.vid AS q, ca.vid AS c, qa.cluster FROM assign qa " +
      "JOIN assign ca ON ca.cluster = qa.cluster AND ca.vid <> qa.vid WHERE qa.vid < 10), " +
      "pdots AS (SELECT p.q, p.c, p.cluster, " +
      "CAST(SUM(CAST(a.e * b.e AS DECIMAL(38,8))) AS DOUBLE) AS dot FROM pairs p " +
      "JOIN v a ON a.vec_id = p.q JOIN v b ON b.vec_id = p.c AND b.i = a.i " +
      "GROUP BY 1, 2, 3), " +
      "pcos AS (SELECT d.q, d.c, d.cluster, d.dot / (na.nrm * nb.nrm) AS cosine FROM pdots d " +
      "JOIN n na ON na.vec_id = d.q JOIN n nb ON nb.vec_id = d.c) " +
      "SELECT q, c, cluster, cosine, rn FROM (SELECT pcos.*, " +
      "row_number() OVER (PARTITION BY q ORDER BY cosine DESC, c) AS rn FROM pcos) " +
      "WHERE rn <= 3") {
    (s, d) =>
      val v = vecs(s, d)
      val nr = norms(v)
      def cosJoin(df: DataFrame, qc: String, cc: String) =
        df.join(nr.as("na"), col("na.vec_id") === col(qc))
          .join(nr.as("nb"), col("nb.vec_id") === col(cc))
      // centroid assignment: every vector vs every seed centroid
      val cdots = v.as("a")
        .join(v.as("b").filter(col("b.vec_id") % 50 === 0), col("a.i") === col("b.i"))
        .groupBy(col("a.vec_id").as("vid"), col("b.vec_id").as("cid"))
        .agg(exactDot("a", "b").as("dot"))
      val ccos = cosJoin(cdots, "vid", "cid")
        .select(col("vid"), col("cid"), (col("dot") / (col("na.nrm") * col("nb.nrm"))).as("cosine"))
      val wAssign = Window.partitionBy("vid").orderBy(col("cosine").desc, col("cid"))
      val assign = ccos.withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
        .select(col("vid"), col("cid").as("cluster"))
      // probe: query's cluster members only
      val pairs = assign.as("qa").filter(col("qa.vid") < 10)
        .join(assign.as("ca"), col("ca.cluster") === col("qa.cluster")
          && col("ca.vid") =!= col("qa.vid"))
        .select(col("qa.vid").as("q"), col("ca.vid").as("c"), col("qa.cluster").as("cluster"))
      val pdots = pairs
        .join(v.as("a"), col("a.vec_id") === col("q"))
        .join(v.as("b"), col("b.vec_id") === col("c") && col("b.i") === col("a.i"))
        .groupBy(col("q"), col("c"), col("cluster"))
        .agg(exactDot("a", "b").as("dot"))
      val pcos = cosJoin(pdots, "q", "c")
        .select(col("q"), col("c"), col("cluster"),
          (col("dot") / (col("na.nrm") * col("nb.nrm"))).as("cosine"))
      val w = Window.partitionBy("q").orderBy(col("cosine").desc, col("c"))
      pcos.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= 3)
  }

  val all: Seq[Q] = Seq(dedupEmbedCosine, annCosineTopk, annIvf)
}
