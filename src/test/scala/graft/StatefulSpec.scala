package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The flatMapGroupsWithState sessionizer: state continuity across
  * micro-batches, timeout-driven closing, and agreement with the batch twins.
  */
class StatefulSpec extends SparkSpec {

  test("batch handler emits exactly the non-final sessions of the typed sessionizer") {
    val closed = StatefulOps.closedSessions(spark, sf)
      .select("user_id", "session_seq", "n_events", "session_start", "session_end", "session_value")
    val all = graft.operators.TypedOps.sessionStatsTyped(spark, sf)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val expected = all
      .withColumn("max_seq", max(col("session_seq")).over(w))
      .filter(col("session_seq") < col("max_seq"))
      .select("user_id", "session_seq", "n_events", "session_start", "session_end", "session_value")
    assert(closed.count() > 0)
    assert(closed.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(closed).count() == 0)
  }

  test("a session spanning a micro-batch boundary is continued, not split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, minutes: Long, user: Long = 1L) =
      graft.streaming.WmEvent(user, id, new Timestamp(base + minutes * 60000L),
        (base + minutes * 60000L) * 1000L, 1.0)

    val stream = MemoryStream[graft.streaming.WmEvent]
    val out = StatefulOps.statefulSessions(stream.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stateful_out").start()

    // batch 1: two events 10 min apart (one open session)
    stream.addData(Seq(ev(1, 0), ev(2, 10)))
    q.processAllAvailable()
    // batch 2: +10 min (continues the SAME session), then a 100-min gap event
    // that closes it, plus a far-future event advancing the watermark past
    // the second session's timeout
    stream.addData(Seq(ev(3, 20), ev(4, 120), ev(5, 2000, user = 2L)))
    q.processAllAvailable()
    stream.addData(Seq(ev(6, 4000, user = 2L)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("stateful_out")
      .select("user_id", "session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1, session 1 = events 1+2+3 (batch boundary did NOT split it)
    assert(rows.contains((1L, 1L, 3L)), s"got $rows")
    // user 1, session 2 (event 4) closed by the event-time timeout once the
    // watermark (max ts - 2h) passed its gap deadline
    assert(rows.contains((1L, 2L, 1L)), s"got $rows")
  }

  test("session numbering continues after a timeout closes a session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, minutes: Long, user: Long = 1L) =
      graft.streaming.WmEvent(user, id, new Timestamp(base + minutes * 60000L),
        (base + minutes * 60000L) * 1000L, 1.0)

    val stream = MemoryStream[graft.streaming.WmEvent]
    val q = StatefulOps.statefulSessions(stream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("stateful_seq_out").start()

    // batch 1: user 1 opens session 1; user 2's far-future event advances the
    // watermark (max ts − 2h) far past user 1's gap deadline
    stream.addData(Seq(ev(1, 0), ev(2, 2000, user = 2L)))
    q.processAllAvailable()
    // batch 2: the timeout fires for user 1 (closes session 1, leaves the
    // seq-carrying sentinel)
    stream.addData(Seq(ev(3, 2005, user = 2L)))
    q.processAllAvailable()
    // batch 3: user 1 returns (above the watermark) — must get session_seq 2,
    // not restart at 1 and collide with the already-emitted key
    stream.addData(Seq(ev(4, 1900)))
    q.processAllAvailable()
    // batch 4: advance the watermark so user 1's second session times out too
    stream.addData(Seq(ev(5, 6000, user = 2L)))
    q.processAllAvailable()
    stream.addData(Seq(ev(6, 6005, user = 2L)))
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("stateful_seq_out")
      .filter(col("user_id") === 1L)
      .select("session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u1 == Set((1L, 1L), (2L, 1L)), s"got $u1")
  }

  test("streaming AvailableNow run over the events file emits only real sessions") {
    val sink = "stateful_file_out"
    spark.catalog.dropTempView(sink)
    val q = StatefulOps.statefulSessions(graft.Tables.eventsStream(spark, sf))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val emitted = spark.table(sink)
      .select("user_id", "session_seq", "n_events", "session_start", "session_end", "session_value")
    val all = graft.operators.TypedOps.sessionStatsTyped(spark, sf)
      .select("user_id", "session_seq", "n_events", "session_start", "session_end", "session_value")
    // every emitted session is a true session of the batch walk (closed set
    // may differ by the timeout batch, so subset — not equality — is asserted)
    assert(emitted.count() > 0)
    assert(emitted.exceptAll(all).count() == 0)
  }
}
