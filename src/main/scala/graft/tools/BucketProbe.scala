package graft.tools

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Dev probe: LSH-graph bucket occupancy + candidate-pair counts at a
  * given SF dir — the quantities the q_ann_nn_descent scale argument
  * rests on (candidates = Σ_t Σ_b |bucket|²). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.local()
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val n = e.count()
    val planes = VectorQueries.lshGraphPlanes(n)
    println(s"n=$n planes=$planes buckets/table=${1 << planes}")
    val projCols = (0 until 4 * planes).map(j =>
      expr(VectorQueries.lshProjExpr(j)).as(s"pj$j"))
    val withProj = e.select(Seq(col("vec_id"), col("embedding")) ++ projCols: _*)
    val tableCols = (0 until 4).map { t =>
      val bucket = (0 until planes).map { j =>
        when(col(s"pj${t * planes + j}") >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("t"), bucket.cast("long").as("bucket"))
    }
    val buck = withProj
      .select(col("vec_id"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val occ = buck.groupBy("t", "bucket").agg(count(lit(1)).as("m"))
    occ.agg(count(lit(1)).as("nonempty"), max("m").as("max_occ"),
        sum(col("m") * (col("m") - 1)).as("pairs"),
        expr("sum(m*m)").as("sum_sq"))
      .show(false)
    occ.orderBy(col("m").desc).show(10, false)
    spark.stop()
  }
}
