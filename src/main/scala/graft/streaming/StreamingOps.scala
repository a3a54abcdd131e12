package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming wrappers over the batch aggregation operators
  * (SURVEY.md §7.5 — streaming is an extension, not reference parity: all
  * reference inputs are finite tensors).
  *
  * The transforms are written against a plain DataFrame so the SAME code path
  * serves `spark.read` (batch) and `spark.readStream` (incremental): Spark
  * plans them as batch aggs or stateful streaming aggs respectively. Tested via
  * MemoryStream in StreamingSpec — the batch result is the oracle.
  *
  * Scale: tumbling windows + watermark bound state linearly in (#keys ×
  * #open windows); session windows merge state per key. Both shuffle on
  * (window, key) — the natural streaming partitioning.
  */
object StreamingOps {

  /** Tumbling 1-hour aggregate; on a stream, late data beyond 2h is dropped. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("ws"), col("event_type"), col("n_events"))

  /** Session windows with a 30-minute gap, per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))
}
