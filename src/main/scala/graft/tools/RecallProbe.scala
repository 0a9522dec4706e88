package graft.tools

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local("8")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val exact = VectorQueries.annCosineTopk.fn(spark, d)
      .filter(col("rn") <= 3).select("q", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact top-3 pairs: ${exact.size}")
    for ((name, df) <- Seq(
        "ivf" -> VectorQueries.annIvf.fn(spark, d),
        "lsh" -> VectorQueries.annLsh.fn(spark, d),
        "lsh_probe" -> VectorQueries.annLshProbe.fn(spark, d))) {
      val got = df.filter(col("rn") <= 3).select("q", "c")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = got.intersect(exact).size
      println(f"$name%-10s hits=$hit/${exact.size} recall=${hit.toDouble / exact.size}%.4f")
    }
    for (planes <- Seq(2, 3, 4, 6); probe <- Seq(false, true)) {
      val got = VectorQueries.lshSearch(spark, d, planes, probe)
        .filter(col("rn") <= 3).select("q", "c")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = got.intersect(exact).size
      println(f"lsh planes=$planes probe=$probe hits=$hit/${exact.size}")
    }
    spark.stop()
  }
}
