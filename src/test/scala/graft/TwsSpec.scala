package graft

import graft.streaming.TwsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** transformWithState: named ValueState must accumulate across micro-batches
  * (requires the RocksDB state store provider, set only for this query).
  */
class TwsSpec extends SparkSpec {

  test("batch form of the processor equals the per-user aggregate") {
    import org.apache.spark.sql.functions._
    val out = TwsOps.runningUserStatsBatch(spark, sf)
    val expected = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("value_micros"))
    val joined = out.alias("o").join(expected.alias("e"), "user_id")
      .filter(col("o.n_events") =!= col("e.n_events") ||
        col("o.value_micros") =!= col("e.value_micros"))
    assert(out.count() > 0)
    assert(out.count() == expected.count())
    assert(joined.count() == 0)
  }

  test("ListState last-K merges out-of-order arrivals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, v: Double) =
      graft.streaming.WmEvent(user, id, new Timestamp(base + id * 1000L),
        (base + id * 1000L) * 1000L, v)

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[graft.streaming.WmEvent]
      val q = TwsOps.userRecent(stream.toDF())
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_recent_out").start()

      // batch 1: events 10, 20, 30 for user 1 → last-3 = (30, 20, 10)
      stream.addData(Seq(ev(10, 1, 1.0), ev(20, 1, 2.0), ev(30, 1, 3.0)))
      q.processAllAvailable()
      // batch 2: 40 (newer) and 15 (OLDER than the buffered 20/30) — the
      // merged last-3 must be (40, 30, 20): 15 is outranked, 10 evicted
      stream.addData(Seq(ev(40, 1, 4.0), ev(15, 1, 1.5)))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws_recent_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      // update mode emits per batch; keep the final batch's rows = the ones
      // whose event ids include 40
      val finalRanks = rows.filter(_._3 == 40L)
      assert(finalRanks.nonEmpty)
      val byRank = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).toSet }
      assert(byRank(1).contains(40L))
      // rank-2/3 rows of the final batch are 30 and 20 ((1,3,20) can only
      // come from batch 2 — batch 1's rank 3 was event 10)
      assert(rows.contains((1L, 2, 30L)) && rows.contains((1L, 3, 20L)),
        s"got ${rows.mkString(",")}")
      // the out-of-order event 15 never outranks the buffered 20/30
      assert(!rows.exists(_._3 == 15L), s"got ${rows.mkString(",")}")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState per-type counts accumulate point-wise across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[graft.streaming.TypedEvent]
      val q = TwsOps.userTypeCounts(stream.toDF())
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_counts_out").start()

      stream.addData(Seq((1L, "click"), (1L, "click"), (1L, "view"), (2L, "view"))
        .map(t => graft.streaming.TypedEvent(t._1, t._2)))
      q.processAllAvailable()
      // batch 2 touches ONLY user 1's clicks: its count continues from 2,
      // and user 1's view count (untouched) is not re-emitted
      stream.addData(Seq(graft.streaming.TypedEvent(1L, "click")))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws_counts_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.contains((1L, "click", 2L)) && rows.contains((1L, "click", 3L)),
        s"got ${rows.mkString(",")}")
      assert(rows.count { case (u, t, _) => u == 1L && t == "view" } == 1)
      assert(rows.contains((2L, "view", 1L)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers close idle sessions and session numbering survives the timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(user: Long, minute: Long, id: Long) = {
      val ms = base + minute * 60000L
      graft.streaming.WmEvent(user, id, new Timestamp(ms), ms * 1000L, 1.0)
    }

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[graft.streaming.WmEvent]
      val q = TwsOps.timedSessions(stream.toDF())
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_sessions_out").start()

      def batch(evs: graft.streaming.WmEvent*): Unit = {
        stream.addData(evs); q.processAllAvailable()
      }
      // user 1: two events 10 min apart → one open session, timer at t=40min
      batch(ev(1, 0, 1), ev(1, 10, 2))
      // user 2 at t=400 advances the watermark to 280min AFTER this batch...
      batch(ev(2, 400, 3))
      // ...so THIS batch's timer sweep (wm = 280 ≥ 40) closes user 1's session
      batch(ev(2, 410, 4))
      // user 1 returns at t=420: the lingering sentinel must continue seq → 2
      batch(ev(1, 420, 5))
      // two watermark pushes: wm = 480 ≥ the new timer (420 + 30 = 450)...
      batch(ev(2, 600, 6))
      // ...fires user 1's second close in this batch
      batch(ev(2, 610, 7))
      q.stop()

      val u1 = spark.table("tws_sessions_out").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(1), r.getLong(2)))  // (session_seq, n_events)
        .sorted
      assert(u1.toSeq == Seq((1L, 2L), (2L, 1L)),
        s"expected timer-closed sessions (1,2),(2,1) for user 1, got ${u1.mkString(",")}")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("running per-user totals accumulate across micro-batches via ValueState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, v: Double) =
      graft.streaming.WmEvent(user, id, new Timestamp(base + id * 1000L),
        (base + id * 1000L) * 1000L, v)

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[graft.streaming.WmEvent]
      val q = TwsOps.runningUserStats(stream.toDF())
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()

      stream.addData(Seq(ev(1, 1, 1.5), ev(2, 1, 2.25), ev(3, 2, 10.0)))
      q.processAllAvailable()
      stream.addData(Seq(ev(4, 1, 0.25), ev(5, 2, 5.0), ev(6, 3, 7.0)))
      q.processAllAvailable()
      q.stop()

      // update mode: one row per (user, batch); the LAST row per user holds
      // the cross-batch running total
      val rows = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val last = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(last(1L) == ((1L, 3L, 4000000L)), s"got ${last(1L)}")   // 1.5+2.25+0.25
      assert(last(2L) == ((2L, 2L, 15000000L)), s"got ${last(2L)}")  // 10+5
      assert(last(3L) == ((3L, 1L, 7000000L)), s"got ${last(3L)}")
      // batch 1 emitted the partial totals, proving per-batch emission too
      assert(rows.contains((1L, 2L, 3750000L)), s"got ${rows.mkString(",")}")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
