package graft.sources

import graft.Tables
import graft.functions.Num._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered (Morton-interleaved) layout — the MULTI-dimensional file-skipping
  * shape that completes the pre-organized-storage set: [[Bucketed]] co-locates
  * joins, [[Partitioned]] prunes directories, [[RangeLayout]] makes ONE
  * column's footer stats tight, and z-ordering makes the stats of SEVERAL
  * columns simultaneously tight by sorting on the bit-interleave of their
  * quantized ranks. A file then covers a small RECTANGLE in (user, time)
  * space instead of a thin full-width stripe, so a scan filtered on both
  * dimensions skips every file whose bounding box misses the query box —
  * the mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * The z-key is pure layout: it never appears in results, and the registered
  * query's oracle recomputes the same aggregate from the RAW events table.
  * ZOrderSpec quantifies the win on the fixture: for a (user-range ∧
  * time-range) predicate, strictly fewer z-ordered files intersect the query
  * box than ts-range-sorted files (whose user bounds are all full-width).
  *
  * At 100 TB the knobs change, not the shape: more bits per dimension,
  * file count from a size target, and composition with date partitioning
  * (partition coarse, z-order within each partition).
  */
object ZOrder {
  val NumFiles = 8

  /** Bits per dimension in the Morton key. 4+4 matters here: the top
    * log2(NumFiles) bits of the key decide the file splits, and with too many
    * bits on one dimension those top bits are all that dimension's — the
    * "z-order" degenerates to a 1-D sort at file granularity (the first cut
    * used 8 day-bits and produced exactly that: file splits on day bits only,
    * no user segmentation, measured worse than the plain range layout). With
    * 4 bits each the key's high bits ALTERNATE (day₃ user₃ day₂ user₂ …), so
    * 8 files split day in half, user in half, day in quarters — genuine
    * rectangles. Production z-ordering gets the same balance by quantizing
    * every dimension to equal-cardinality RANKS from column stats.
    */
  val Bits = 4

  /** Epoch day of 2024-01-01 — the fixed quantization origin (a layout
    * constant, so the key needs no data-dependent statistics pass; prod
    * derives the origin/scale from table stats instead).
    */
  val EpochDayOrigin = 19723L

  def location(spark: SparkSession) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_events_zorder")

  /** Spread a 4-bit value's bits to even positions of an 8-bit value (the
    * classic magic-number dilation), all exact integer ops.
    */
  private def spread4(c: Column): Column = {
    val m1 = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33L))
    (m1.bitwiseOR(shiftleft(m1, 1))).bitwiseAND(lit(0x55L))
  }

  /** Morton key of (user_id mod 16, 2-day bucket since [[EpochDayOrigin]]):
    * user bits on even positions, day bits on odd.
    */
  private[graft] def mortonKey: Column = {
    val bUser = pmod(col("user_id"), lit(1L << Bits))
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long") - EpochDayOrigin
    val bDay = pmod(floor(day / 2).cast("long"), lit(1L << Bits))
    spread4(bUser).bitwiseOR(shiftleft(spread4(bDay), 1))
  }

  private def writeZOrdered(spark: SparkSession, dir: String): Unit =
    Tables.events(spark, dir)
      .withColumn("zkey", mortonKey)
      .repartitionByRange(NumFiles, col("zkey"))
      .sortWithinPartitions("zkey", "event_id")
      .drop("zkey")
      .write.mode("overwrite").parquet(location(spark).toString)

  def ensureZOrdered(spark: SparkSession, dir: String): Unit =
    WriteOnce.ensure(location(spark).toString, dir)(writeZOrdered(spark, dir))

  /** Per-file bounding boxes over BOTH predicate dimensions. */
  def fileStats(spark: SparkSession, dir: String): DataFrame = {
    ensureZOrdered(spark, dir)
    spark.read.parquet(location(spark).toString)
      .select(input_file_name().as("file"), col("user_id"), col("ts"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
  }

  /** The 2-D query-box predicate the spec and the registered query share: a
    * low-user slice over the first week — selective on BOTH interleaved
    * dimensions, so files outside either half of the key space skip.
    */
  val FromUser = 0L
  val ToUser = 3L
  val FromTs = "2024-01-01 00:00:00"
  val ToTs = "2024-01-09 00:00:00"

  private def boxFilter(df: DataFrame): DataFrame =
    df.filter(col("user_id") >= FromUser && col("user_id") <= ToUser &&
      col("ts") >= lit(FromTs).cast("timestamp") && col("ts") < lit(ToTs).cast("timestamp"))

  /** Aggregate over the 2-D box off the z-ordered layout; the oracle
    * recomputes it from the raw table — the layout is execution detail.
    */
  def zorderBoxAgg(spark: SparkSession, dir: String): DataFrame = {
    ensureZOrdered(spark, dir)
    boxFilter(spark.read.parquet(location(spark).toString))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        r6(sum(floor(col("value") * 1e6 + 0.5).cast("long")).cast("double") / 1e6).as("sum_value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_zorder_scan" -> ((s, d) =>
      zorderBoxAgg(s, d).orderBy("user_id", "event_type"))
  )

  def oracles: Map[String, String] = Map(
    "events_zorder_scan" ->
      s"""SELECT user_id, event_type, count(*) AS n_events,
         |       ${sqlR6("CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6")} AS sum_value
         |FROM events
         |WHERE user_id >= $FromUser AND user_id <= $ToUser
         |  AND ts >= TIMESTAMP '$FromTs' AND ts < TIMESTAMP '$ToTs'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
