package graft.sources

import graft.Tables
import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout + partition-pruned scans — the other half
  * of the pre-organized-storage story next to [[Bucketed]]: at 100 TB a time
  * filter must select DIRECTORIES, not scan-and-discard rows. The events
  * table is written once partitioned by `event_date`; a 7-of-30-day query
  * then reads only those 7 partition directories (the scan's
  * PartitionFilters — asserted by PartitionedSpec, which also checks the
  * pruned scan reads strictly fewer files than the full one).
  *
  * The registered query re-aggregates the pruned read; the oracle recomputes
  * the same result straight off the raw events table, so the partitioned
  * layout is proven to be an execution detail, not a semantic one.
  */
object Partitioned {
  val FromDate = "2024-01-08"
  val ToDate = "2024-01-14"

  def location(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_events_by_date")

  private def writePartitionedEvents(spark: SparkSession, dir: String): Unit =
    Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date")
      .mode("overwrite").parquet(location(spark).toString)

  /** location → source dir it was last written from. Rewriting on EVERY
    * invocation (the pre-r5 behavior) made the registered query benchmark the
    * overwrite more than the pruned read, and a concurrent reader could
    * observe the location mid-overwrite (ADVICE r4). The layout is an index:
    * write once per (location, source dir) — the quantizerCache pattern — and
    * rewrite only when a different source dir targets the same location
    * (concurrent first calls serialize on [[WriteOnce]]'s per-key lock, kept
    * OUTSIDE the map's own bin locks per ADVICE r5).
    */
  private def ensurePartitionedEvents(spark: SparkSession, dir: String): Unit =
    WriteOnce.ensure(location(spark).toString, dir)(writePartitionedEvents(spark, dir))

  /** The pruned read, exposed separately so the spec can inspect the plan. */
  def prunedRead(spark: SparkSession): DataFrame =
    spark.read.parquet(location(spark).toString)
      .filter(col("event_date") >= lit(FromDate).cast("date") &&
        col("event_date") <= lit(ToDate).cast("date"))

  def prunedDailyAgg(spark: SparkSession, dir: String): DataFrame = {
    ensurePartitionedEvents(spark, dir)
    prunedRead(spark)
      .groupBy("event_date", "event_type")
      .agg(count(lit(1)).as("n_events"),
        r6(sum(floor(col("value") * 1e6 + 0.5).cast("long")).cast("double") / 1e6).as("sum_value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_partitioned_scan" -> ((s, d) =>
      prunedDailyAgg(s, d).orderBy("event_date", "event_type"))
  )

  def oracles: Map[String, String] = Map(
    "events_partitioned_scan" ->
      s"""SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS n_events,
         |       ${sqlR6("CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6")} AS sum_value
         |FROM events
         |WHERE CAST(ts AS DATE) >= DATE '$FromDate' AND CAST(ts AS DATE) <= DATE '$ToDate'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
