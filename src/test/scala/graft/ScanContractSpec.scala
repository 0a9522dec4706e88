package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.functions._

/** Scan-shape contracts for the two §2.1/§2.2 claims the scaladoc makes
  * but (before r12) no spec enforced: predicate PUSHDOWN reaches the
  * parquet scan (PushedFilters — row-group min/max skipping at the
  * source, the difference between reading a date slice and reading the
  * lake) and column PRUNING reaches the scan (ReadSchema — a 4-column
  * projection must not deserialize the other columns). Partition-level
  * pruning has its own pin (Round11gOpsSpec: PartitionFilters); these
  * cover the ordinary unpartitioned scans everything else reads. */
class ScanContractSpec extends SparkSpec {

  private def scanLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")

  test("q_filter_date_range: the shipdate bound lands in PushedFilters") {
    val scan = scanLine(CoreQueries.filterDateRange.fn(spark, sf))
    assert(scan.contains("PushedFilters:"), s"no scan node found:\n$scan")
    assert(scan.contains("GreaterThanOrEqual(l_shipdate"),
      s"date bound not pushed to the scan:\n$scan")
  }

  test("q_project_select: ReadSchema carries ONLY the projected columns") {
    val df = CoreQueries.projectSelect.fn(spark, sf)
    val scan = scanLine(df)
    val m = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(scan)
    assert(m.isDefined, s"no ReadSchema on the scan:\n$scan")
    val readCols = m.get.group(1).split(",").map(_.split(":")(0).trim).toSet
    assert(readCols == Set("p_partkey", "p_name", "p_type", "p_size"),
      s"scan reads more than the projection: $readCols")
  }

  test("q_scan_csv read-back: the explicit schema prunes columns at the CSV scan too") {
    val pruned = CoreQueries.scanCsv.fn(spark, sf).select("o_orderkey", "o_orderstatus")
    val scan = scanLine(pruned)
    val m = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(scan)
    assert(m.isDefined, s"no ReadSchema on the csv scan:\n$scan")
    val readCols = m.get.group(1).split(",").map(_.split(":")(0).trim).toSet
    assert(readCols == Set("o_orderkey", "o_orderstatus"),
      s"csv scan reads more than the projection: $readCols")
  }
}
