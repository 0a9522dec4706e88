package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev utility: deterministically scale the driver testdata by an integer
  * factor for scaling-exponent measurements (DESIGN.md "sf1 scaling run").
  * `runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]`
  *
  * Each replica i shifts every entity key by i × (max+1), so the result
  * models SCALE-OUT — factor× more assets/users/documents/vectors with
  * unchanged per-entity history length and per-key group sizes — not
  * fatter groups. Content columns are decorrelated per replica where a
  * verbatim copy would manufacture quadratic work the real corpus doesn't
  * have: document text is word-permuted (seeded by doc_id × replica, via
  * an md5 sort key) so replicas share no shingles, and embedding replicas
  * get a per-replica component sign pattern (within-replica geometry
  * intact, cross-replica cosines decorrelated) with labels shifted so the
  * blocking-key cardinality grows with the corpus, as it does in a real
  * sharded collection. Tiny fixed-cardinality dims (nation, region) copy
  * as-is at every scale factor, like TPC-H.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.util.Sessions.local()

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    /** Union `factor` copies, shifting each long key column by a per-copy
      * multiple of (its max + 1); `xform` decorrelates content columns. */
    def replicate(name: String, keyCols: Seq[String],
        xform: (Int, DataFrame) => DataFrame = (_, d) => d): Unit = {
      val df = read(name)
      val steps = keyCols.map { c =>
        c -> (df.agg(max(col(c)).cast("long")).head.getLong(0) + 1L)
      }
      val out = (0 until factor).map { i =>
        val shifted = steps.foldLeft(df) { case (acc, (c, step)) =>
          acc.withColumn(c, (col(c) + lit(i * step)).cast(df.schema(c).dataType))
        }
        xform(i, shifted)
      }.reduce(_ unionByName _)
      write(out, name)
      println(s"[scaleup] $name: ${df.count()} -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (i, df) =>
      if (i == 0) df
      else df.withColumn("text",
        // deterministic word permutation per (doc, replica): sort words by
        // an md5 of (word, position, doc_id, i) — replicas share almost no
        // 3-gram shingles, so dedup work scales with real corpus size
        // instead of exploding on manufactured near-duplicates
        array_join(transform(array_sort(expr(
          s"""transform(split(text, ' '), (w, p) ->
              struct(md5(concat(w, '|', p, '|', doc_id, '|', $i)) AS k, w AS w))""")),
          s => s.getField("w")), " ")))
    replicate("embeddings", Seq("vec_id"), (i, df) =>
      if (i == 0) df
      else df
        .withColumn("embedding", expr(
          s"""transform(embedding, (e, p) ->
              CAST(CASE WHEN pmod(hash(concat($i, '|', p)), 2) = 1
                   THEN -e ELSE e END AS FLOAT))"""))
        .withColumn("label", (col("label") + lit(i * 10000)).cast("int")))
    Seq("nation", "region").foreach(n => write(read(n), n))
    println(s"[scaleup] wrote factor-$factor testdata to $dst")
    spark.stop()
  }
}
