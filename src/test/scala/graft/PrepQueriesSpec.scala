package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.PrepQueries

/** Hand-computed semantics for the training-batch preparation operators:
  * chunk geometry on crafted token counts, packing offsets/spans on a
  * crafted per-language stream, int8 quantization round-trip bounds, and
  * the PCA power iteration recovering a planted dominant axis — plus
  * partition-order invariance for the two float-publishing ops.
  */
class PrepQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_prep_$tag").toFile.getAbsolutePath

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("srcT"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def writeVecs(dir: String, rows: Seq[(Long, Seq[Float])]): Unit =
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  // ---- q_text_chunk: crafted token counts -------------------------------

  test("q_text_chunk: window geometry (C=12, S=8) on 20/12/5-token docs") {
    val dir = tmpDir("chunk")
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq((1L, words(20), "en"), (2L, words(12), "en"), (3L, words(5), "en")))
    val got = PrepQueries.textChunk.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // 20 tokens: ceil((20-12)/8)+1 = 2 chunks — [1..12] and [9..20]
    assert(got((1L, 0L)) === ((1L, 12L, (1 to 12).map(i => s"w$i").mkString(" "))))
    assert(got((1L, 1L)) === ((9L, 12L, (9 to 20).map(i => s"w$i").mkString(" "))))
    // exactly C tokens: one chunk, full width
    assert(got((2L, 0L)) === ((1L, 12L, (1 to 12).map(i => s"w$i").mkString(" "))))
    // short doc: one chunk, short tail
    assert(got((3L, 0L)) === ((1L, 5L, (1 to 5).map(i => s"w$i").mkString(" "))))
    assert(got.size === 4)
  }

  // ---- q_pack_sequences: crafted offsets and boundary spans -------------

  test("q_pack_sequences: per-language offsets are contiguous; spans count boundary crossings") {
    val dir = tmpDir("pack")
    def words(n: Int): String = (1 to n).map(_ => "w").mkString(" ")
    // en stream: 100 + 200 + 300 tokens -> offsets 0, 100, 300
    //   doc 12: [300, 600) crosses the 512 boundary -> span 2
    // de stream independent: offset restarts at 0
    writeDocs(dir, Seq(
      (10L, words(100), "en"), (11L, words(200), "en"), (12L, words(300), "en"),
      (20L, words(300), "de")))
    val got = PrepQueries.packSequences.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(10L) === ((100L, 0L, 0L, 1L)))
    assert(got(11L) === ((200L, 100L, 0L, 2L)))   // [100,300) crosses 256
    assert(got(12L) === ((300L, 300L, 1L, 2L)))   // [300,600) crosses 512
    assert(got(20L) === ((300L, 0L, 0L, 2L)))     // own stream, crosses 256
  }

  // ---- q_pack_efficiency: every pack full except each language's last ---

  test("q_pack_efficiency: interior packs fill to 1.0; tail pack carries the residue") {
    val dir = tmpDir("packeff")
    def words(n: Int): String = (1 to n).map(_ => "w").mkString(" ")
    // en stream totals 600 tokens -> packs 0,1 full (256 each), pack 2 = 88
    writeDocs(dir, Seq(
      (10L, words(100), "en"), (11L, words(200), "en"), (12L, words(300), "en")))
    val got = PrepQueries.packEfficiency.fn(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // pack 0: docs 10 (100), 11 (partial) start/overlap; doc 11 starts at 100
    assert(got(0L) === ((2L, 2L, 256L, 1.0)))
    // pack 1: doc 11 continues, doc 12 starts at 300
    assert(got(1L) === ((2L, 1L, 256L, 1.0)))
    // pack 2: doc 12's tail -> 600 - 512 = 88 tokens
    assert(got(2L) === ((1L, 0L, 88L, 88.0 / 256.0)))
    // conservation: filled sums to the stream's token total
    assert(got.values.map(_._3).sum === 600L)
  }

  // ---- q_emb_quantize_int8: round-trip bounds and degenerate dims -------

  test("q_emb_quantize_int8: error bounded by half a step; constant dim pins code 0") {
    val dir = tmpDir("quant")
    // dim 1 spans [0,1]; dim 2 constant (mx = mn); dim 3 spans [-2,2]
    writeVecs(dir, Seq(
      (0L, Seq(0.0f, 0.5f, -2.0f)), (1L, Seq(0.25f, 0.5f, 0.0f)),
      (2L, Seq(0.75f, 0.5f, 1.0f)), (3L, Seq(1.0f, 0.5f, 2.0f))))
    val rows = PrepQueries.embQuantizeInt8.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val (mn1, mx1, hi1, maxErr1, meanErr1) = rows(1L)
    assert((mn1, mx1, hi1) === ((0L, 255L, 1L)))
    assert(maxErr1 <= (1.0 / 255.0) / 2 + 1e-12)
    assert(meanErr1 <= maxErr1)
    // constant dimension: every code 0, zero error
    assert(rows(2L) === ((0L, 0L, 0L, 0.0, 0.0)))
    val (_, _, _, maxErr3, _) = rows(3L)
    assert(maxErr3 <= (4.0 / 255.0) / 2 + 1e-12)
  }

  // ---- q_emb_pca_power: planted dominant axis ---------------------------

  test("q_emb_pca_power recovers a planted dominant axis with unit-norm loading") {
    val dir = tmpDir("pca")
    // variance 25 on axis 1, ~0.01 elsewhere: the top component is e1
    val rows = (0L until 40L).map { id =>
      val big = if (id % 2 == 0) 5.0f else -5.0f
      val tiny = (if (id % 3 == 0) 0.1f else -0.1f)
      (id, Seq(big, tiny, 0.05f * (id % 4)))
    }
    writeVecs(dir, rows)
    val got = PrepQueries.embPcaPower.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val norm = math.sqrt(got.values.map { case (_, l) => l * l }.sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loading norm $norm")
    assert(math.abs(got(1L)._2) > 0.999, "dominant axis carries the component")
    assert(math.abs(got(2L)._2) < 0.05)
    assert(math.abs(got(3L)._2) < 0.05)
  }

  // ---- q_emb_pca_project: Pythagoras on the planted axis ----------------

  test("q_emb_pca_project: planted-axis scores carry the big coordinate, residuals the rest") {
    val dir = tmpDir("pcaproj")
    val rows = (0L until 40L).map { id =>
      val big = if (id % 2 == 0) 5.0f else -5.0f
      val tiny = (if (id % 3 == 0) 0.1f else -0.1f)
      (id, Seq(big, tiny, 0.05f * (id % 4)))
    }
    writeVecs(dir, rows)
    val got = PrepQueries.embPcaProject.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.size === 40)
    got.foreach { case (id, (score, resid)) =>
      // the component is ±e1, so |score| ≈ |big − mean(big)| = 5
      assert(math.abs(math.abs(score) - 5.0) < 0.02, s"id=$id score=$score")
      assert(resid >= 0.0 && resid < 0.1, s"id=$id resid=$resid")
    }
    // even/odd rows project to opposite signs
    assert(got(0L)._1 * got(1L)._1 < 0)
  }

  // ---- partition-order invariance for the float publishers --------------

  test("pca and quantize are bit-identical under 1 vs 32 input partitions") {
    val dir1 = tmpDir("inv1"); val dir32 = tmpDir("inv32")
    val rows = (0L until 64L).map { id =>
      (id, (0 until 8).map(j => ((id * 7 + j * 13) % 17).toFloat / 17f - 0.5f))
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir1/embeddings.parquet")
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
      .repartition(32).write.mode("overwrite").parquet(s"$dir32/embeddings.parquet")
    for (q <- Seq(PrepQueries.embPcaPower, PrepQueries.embPcaProject,
        PrepQueries.embQuantizeInt8)) {
      val a = q.fn(spark, dir1).collect().map(_.toSeq).toSet
      val b = q.fn(spark, dir32).collect().map(_.toSeq).toSet
      assert(a === b, q.id)
    }
  }
}
