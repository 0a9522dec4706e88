package graft

import graft.lake.Lake
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end compaction story (VERDICT r12 #5): the PLAN → EXECUTE →
  * RE-VERIFY chain on one lake layer — q_file_compaction_plan's
  * first-fit bin rule derived from the layer's REAL file manifest,
  * Lake.compact executing exactly that plan, then the two properties a
  * rewrite-on-write cache must preserve (pipeline_helpers.py:72-91):
  * partition pruning still prunes, and every query result is unchanged.
  */
class CompactionEpilogueSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_compact").toString

  private def dataFiles(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    here.filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")) ++
      here.filter(_.isDirectory).flatMap(dataFiles)
  }

  test("plan from the file manifest == compact()'s execution; pruning and results survive") {
    import spark.implicits._
    val root = tmp()
    val lake = new Lake(spark, root)

    // a date-partitioned gold layer left as small files by incremental
    // writes: 3 date partitions × 8 files each
    val df = (1 to 3000).map { i =>
      (i.toLong, s"doc$i", f"2024-01-${i % 3 + 1}%02d")
    }.toDF("id", "text", "dt")
    val p = s"$root/gold/docs"
    (0 until 8).foreach { s =>
      df.filter(col("id") % 8 === s).repartition(1)
        .write.mode("append").partitionBy("dt").parquet(p)
    }
    val leaf = (d: String) => new java.io.File(s"$p/dt=$d")
    assert(Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .forall(d => dataFiles(leaf(d)).size == 8), "fixture must be fragmented")

    // PLAN: q_file_compaction_plan's rule (never split a file; a leaf
    // needs ceil(bytes/target) bins) applied to the REAL manifest
    val target = 512L * 1024
    val plan = Seq("2024-01-01", "2024-01-02", "2024-01-03").map { d =>
      val bytes = dataFiles(leaf(d)).map(_.length).sum
      d -> math.max(1L, math.ceil(bytes.toDouble / target).toLong)
    }.toMap
    assert(plan.values.forall(_ == 1L), "tiny fixture should plan 1 bin per leaf")

    val before = lake.read("gold", "docs").collect().map(_.toSeq).toSet
    val aggBefore = lake.read("gold", "docs").groupBy("dt")
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(_.toSeq).toSet

    // EXECUTE: compact() must realize exactly the planned manifest
    val st = lake.compact("gold", "docs", targetBytes = target)
    assert(st.leavesRewritten == 3, s"stats: $st")
    assert(st.filesAfter == plan.values.sum, s"executed manifest != plan: $st vs $plan")
    plan.foreach { case (d, bins) =>
      assert(dataFiles(leaf(d)).size == bins, s"leaf $d not at its planned bin count")
    }

    // RE-VERIFY 1: partition pruning still prunes — a dt-filtered read
    // touches only that partition's (compacted) files
    val touched = lake.read("gold", "docs").filter(col("dt") === "2024-01-02")
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("dt=2024-01-02")),
      s"pruned read escaped its partition: ${touched.mkString(",")}")
    assert(touched.length == plan("2024-01-02").toInt,
      "pruned read must touch exactly the partition's compacted files")

    // RE-VERIFY 2: identical results, row-level and aggregate-level
    assert(lake.read("gold", "docs").collect().map(_.toSeq).toSet === before,
      "row set changed across compaction")
    assert(lake.read("gold", "docs").groupBy("dt")
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(_.toSeq).toSet === aggBefore,
      "aggregate results changed across compaction")
  }
}
