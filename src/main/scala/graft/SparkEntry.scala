package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as one `Q`
  * (Spark query + DuckDB oracle) collected from the `graft.queries.*`
  * modules. The driver runs `graft.Verify` to dump results at sf0.01 and
  * hash-compares each against its oracle.
  */
object SparkEntry {
  import graft.queries._

  lazy val registry: Seq[Q] = {
    val qs = CoreQueries.all ++ FilterQueries.all ++ JoinQueries.all ++ AggQueries.all ++
      WindowQueries.all ++ RollingQueries.all ++ RecursiveQueries.all ++ SortSetQueries.all ++
      ScalarQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      CorpusQueries.all ++ SessionQueries.all ++ CorpusStatsQueries.all ++ CurationQueries.all ++
      PipelineQueries.all ++ PrepQueries.all
    val dup = qs.groupBy(_.id).collect { case (id, g) if g.size > 1 => id }
    require(dup.isEmpty, s"duplicate query ids: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature shape: point-in-time monthly top-N universe
    * (universe_generation_pipeline.py:144-171). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.winRankFirst.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.id -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.id -> _)).toMap
}
