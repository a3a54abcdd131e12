package graft.sources

import graft.Tables
import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed tables + co-located joins — the pre-shuffle strategy for joins
  * that recur on the same key at 100 TB: write both sides bucketed (and
  * sorted) by the join key once, and every subsequent join on that key is
  * exchange-free (SortMergeJoin reads bucket i of each side directly; no
  * shuffle stage exists in the plan — BucketedSpec asserts exactly that).
  *
  * The registered query materializes per-user event aggregates and a user
  * dimension as two 8-bucket tables, joins them bucket-to-bucket, and
  * re-aggregates — the oracle recomputes the same result with plain SQL, so
  * correctness is checked end to end while the bucketed layout is what the
  * engine actually executes. `DROP TABLE IF EXISTS` first: the driver and
  * bench run each query repeatedly, so the write must be idempotent.
  */
object Bucketed {
  val NumBuckets = 8

  /** Drop the catalog entry AND its physical location: the in-memory catalog
    * forgets tables between sessions while the warehouse directory persists,
    * so a catalog-only drop leaves saveAsTable failing with
    * LOCATION_ALREADY_EXISTS on the next session's first run.
    */
  private def dropBucketedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Per-user event rollup and a user dimension, both bucketed by user_id. */
  private def writeBucketedPair(spark: SparkSession, dir: String): Unit = {
    dropBucketedTable(spark, "graft_events_by_user")
    dropBucketedTable(spark, "graft_user_dim")
    val ev = Tables.events(spark, dir)
    ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sv_micros"))
      .write.bucketBy(NumBuckets, "user_id").sortBy("user_id")
      .format("parquet").mode("overwrite").saveAsTable("graft_events_by_user")
    ev.groupBy("user_id")
      .agg(min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
      .write.bucketBy(NumBuckets, "user_id").sortBy("user_id")
      .format("parquet").mode("overwrite").saveAsTable("graft_user_dim")
  }

  /** The co-located join over the two bucketed tables (no Exchange in the
    * physical plan — asserted by BucketedSpec). Exposed separately so the
    * spec can inspect exactly this join's plan.
    */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("graft_events_by_user")
      .join(spark.table("graft_user_dim"), "user_id")

  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    writeBucketedPair(spark, dir)
    bucketedJoin(spark)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_user_types"),
        r6(sum(col("sv_micros")).cast("double") / 1e6).as("sum_value"),
        min(col("first_seen")).as("earliest"), max(col("last_seen")).as("latest"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_bucketed_join" -> ((s, d) => bucketedJoinAgg(s, d).orderBy("event_type"))
  )

  def oracles: Map[String, String] = Map(
    // same semantics straight off the events table: the bucketed layout is an
    // execution detail, not a semantic one
    "events_bucketed_join" ->
      s"""WITH by_user AS (
         |  SELECT user_id, event_type, count(*) AS n_events,
         |         sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS sv_micros
         |  FROM events GROUP BY 1, 2
         |), dim AS (
         |  SELECT user_id, min(ts) AS first_seen, max(ts) AS last_seen FROM events GROUP BY 1
         |)
         |SELECT b.event_type, count(*) AS n_user_types,
         |       ${sqlR6("CAST(sum(b.sv_micros) AS DOUBLE) / 1e6")} AS sum_value,
         |       min(d.first_seen) AS earliest, max(d.last_seen) AS latest
         |FROM by_user b JOIN dim d ON d.user_id = b.user_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
