package graft

import graft.util.Materialize
import org.apache.spark.sql.functions._

/** The materialization-strategy gate (ADVICE r4/r5 medium): identical
  * results under every strategy, correct cache-residue behavior for the
  * default, and loud failure on a misconfigured reliable checkpoint.
  * CacheHygieneSpec separately enforces the empty-CacheManager invariant
  * for the whole query registry under the default. */
class MaterializeSpec extends SparkSpec {

  private def withStrategy[T](s: String)(body: => T): T = {
    spark.conf.set(Materialize.Key, s)
    try body finally spark.conf.unset(Materialize.Key)
  }

  private def minhashPairsSorted(d: String) =
    graft.ops.TextOps.minhashPairs(graft.util.Tables.documents(spark, d))
      .orderBy("doc_a", "doc_b").collect().toSeq

  // declared FIRST: the equality test below installs a checkpoint dir on
  // the shared context, after which the no-dir path can't be exercised
  test("checkpoint strategy without a dir fails loudly; unknown strategy rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      withStrategy("checkpoint") {
        intercept[IllegalStateException](Materialize(df))
      }
    }
    withStrategy("bogus") {
      intercept[IllegalArgumentException](Materialize(df))
    }
  }

  test("all four strategies produce identical candidate pairs") {
    val base = minhashPairsSorted(sf)
    assert(base.nonEmpty)
    for (s <- Seq("none", "persist", "checkpoint")) {
      if (s == "checkpoint")
        spark.conf.set(Materialize.DirKey,
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
      val got = withStrategy(s)(minhashPairsSorted(sf))
      assert(got == base, s"strategy $s diverged")
      if (s == "persist") spark.sharedState.cacheManager.clearCache()
    }
  }

  test("default strategy leaves no CacheManager residue; persist does (caller-managed)") {
    assert(minhashPairsSorted(sf).nonEmpty)
    assert(spark.sharedState.cacheManager.isEmpty, "default left cached blocks")
    withStrategy("persist") {
      assert(minhashPairsSorted(sf).nonEmpty)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "persist strategy should keep lineage-bearing cached frames")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("iterative clustering converges under the persist strategy too (lineage kept)") {
    withStrategy("persist") {
      val labels = graft.ops.Corpus.clusterLabels(graft.util.Tables.documents(spark, sf))
      assert(labels.count() > 0)
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
