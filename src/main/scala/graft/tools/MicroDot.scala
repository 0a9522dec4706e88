package graft.tools

import org.apache.spark.sql.functions._

/** Dev microbench: native decimal_dot vs the HOF recipe on 500k pairs. */
object MicroDot {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local()
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("ib"), col("embedding").as("b")))
      .persist()
    println("pairs: " + pairs.count())
    val hof = graft.queries.VectorQueries.dotExprHof("a", "b")
    def time(tag: String, exprStr: String): Unit = (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      pairs.select(expr(exprStr).as("d")).write.format("noop").mode("overwrite").save()
      println(f"$tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("hof", hof)
    time("native", "decimal_dot(a, b)")
    spark.stop()
  }
}
