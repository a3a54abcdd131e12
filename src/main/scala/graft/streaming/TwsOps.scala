package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running aggregate held as a typed ValueState. */
case class RunningAgg(n: Long, value_micros: Long)

/** One output row per (user, micro-batch): totals INCLUDING all prior batches. */
case class UserRunning(user_id: Long, n_events: Long, value_micros: Long)

/** `transformWithState` — Spark 4's arbitrary-state processor API (the
  * successor of flatMapGroupsWithState used by [[StatefulOps]]): explicit
  * named state (`ValueState`/`ListState`/`MapState`), TTL, timers, and the
  * RocksDB state store. Demonstrated as a per-user running aggregate whose
  * `RunningAgg` survives across micro-batches (TwsSpec drives two
  * MemoryStream batches and asserts the totals accumulate).
  *
  * Scale: state per key is two longs in RocksDB — the store spills to disk,
  * so total state is bounded by disk not heap; TTL (here NONE) is the
  * eviction contract for unbounded key spaces.
  */
class RunningStatsProcessor extends StatefulProcessor[Long, WmEvent, UserRunning] {
  @transient private var agg: ValueState[RunningAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[RunningAgg]("agg", Encoders.product[RunningAgg], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[WmEvent],
      timerValues: TimerValues): Iterator[UserRunning] = {
    val prev = if (agg.exists()) agg.get() else RunningAgg(0L, 0L)
    var n = prev.n
    var micros = prev.value_micros
    rows.foreach { e =>
      n += 1L
      micros += math.floor(e.value * 1e6 + 0.5).toLong // exact money-sum pattern
    }
    agg.update(RunningAgg(n, micros))
    Iterator.single(UserRunning(user, n, micros))
  }
}

object TwsOps {
  /** Running per-user stats over a (possibly streaming) events frame. */
  def runningUserStats(events: DataFrame): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"), col("ts"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[WmEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
