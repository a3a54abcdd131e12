package graft

import graft.sources.Partitioned
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpec {

  test("date filter reaches the scan as a partition filter and prunes files") {
    // the agg also performs the (idempotent) partitioned write
    val agg = Partitioned.prunedDailyAgg(spark, sf).cache()
    assert(agg.count() > 0)

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.get

    val pruned = scanOf(Partitioned.prunedRead(spark))
    assert(pruned.metadata("PartitionFilters").contains("event_date"),
      s"no partition filter:\n${pruned.metadata}")

    // pruning is real: the filtered scan reads strictly fewer files than the
    // unfiltered one, and exactly the 7 in-range dates survive
    val full = scanOf(spark.read.parquet(Partitioned.location(spark).toString))
    assert(pruned.inputRDDs().head.partitions.nonEmpty)
    val prunedFiles = Partitioned.prunedRead(spark).select(input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(Partitioned.location(spark).toString)
      .select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles, s"pruned=$prunedFiles all=$allFiles")
    val dates = Partitioned.prunedRead(spark).select("event_date").distinct().count()
    assert(dates == 7, s"expected 7 partition dates, got $dates")
    assert(full.metadata.contains("Location"))
    agg.unpersist()
  }
}
