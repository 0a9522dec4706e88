package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query ids — dev-only filter;
    // the driver always calls with two args and dumps everything]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = graft.util.Sessions.local()
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json FIRST (r12): the driver's compare needs it to score
    // ANY query, so writing it after the dump loop meant a mid-run JVM
    // death (OOM, wall-clock kill) zeroed the whole round's correctness
    // instead of keeping the queries already dumped. It is cheap,
    // depends on nothing the loop computes, and a partial dump with the
    // full oracle map degrades to per-query misses, not an empty record.
    writeOracleJson(outDir)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val total = todo.size
    var done = 0
    todo.foreach { case (name, fn) =>
      // Remove any previous dump FIRST: a failed query must never leave a
      // stale (previous-run) parquet behind for the oracle compare to
      // pass green on.
      val dest = Paths.get(s"$outDir/$name")
      def rmrf(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
      rmrf(dest)
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(dest.toString)
        done += 1
        System.err.println(s"[verify] $done/$total $name ok")
      } catch { case e: Throwable =>
        rmrf(dest)
        done += 1
        System.err.println(s"[verify] $done/$total $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }

  private def writeOracleJson(outDir: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
