package graft.tools
import org.apache.spark.sql.functions._
object CandProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local()
    for (d <- args) {
      val df = graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, d)
      println(s"[candprobe] $d pairs=${df.count()}")
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val shd = graft.ops.TextOps.shingles3(docs).distinct()
      println(s"[candprobe] $d distinct (doc,shingle)=${shd.count()}")
    }
    spark.stop()
  }
}
